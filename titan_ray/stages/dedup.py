"""Exact near-read deduplication (reference: read_data_to_check.r:121-143 —
optional removal of near-duplicate stations, earlier provider wins).

Transcript semantics: normalize text (lower, collapse whitespace), hash,
co-locate candidates by hash bucket (one shuffle over a SMALL key), then
keep the first row per identical normalized text under the stable order
(conv_id, turn_idx, ts). Bucketing by hash rather than by full text keeps
group count bounded (num_buckets) instead of one group per distinct text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

NORM_RE = r"\s+"


def _normalize(series: pd.Series) -> pd.Series:
    return series.str.lower().str.replace(NORM_RE, " ", regex=True).str.strip()


def add_dedup_bucket(batch: pa.Table, num_buckets: int = 256) -> pa.Table:
    text = batch["text"].to_pandas()
    norm = _normalize(text.astype("string")).fillna("")
    hv = pd.util.hash_array(norm.to_numpy(dtype=object))
    return batch.append_column("_dd_bucket", pa.array((hv % num_buckets).astype(np.int32)))


def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
    norm = _normalize(df["text"].astype("string")).fillna("")
    df = df.assign(_norm=norm)
    df = df.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort", na_position="last")
    # empty/null texts are never "duplicates" of each other — the metadata
    # check owns them (reference dedups on value+position, not on missing).
    dup = df.duplicated(subset="_norm", keep="first") & (df["_norm"] != "")
    return df.loc[~dup].drop(columns=["_norm", "_dd_bucket"])


def dedup_exact(ds, num_buckets: int = 256):
    """Dataset-level exact dedup: bucket-by-hash shuffle + keep-first."""
    ds = ds.map_batches(lambda b: add_dedup_bucket(b, num_buckets), batch_format="pyarrow")
    return ds.groupby("_dd_bucket").map_groups(dedup_bucket, batch_format="pandas")
