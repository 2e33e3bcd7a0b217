"""Custom join operators Ray Data lacks: as-of join and range join.

The reference has no relational joins (SURVEY.md §2.4) — these are the
"custom operator" additions the graft brief calls for, built as
compositions of map_batches + one co-partitioning shuffle:

1. Both sides are bucketed by hash(by-key) — ONE narrow-keyed shuffle each,
   tagged with a side column and unioned so a single groupby co-locates
   matching keys.
2. Inside each bucket group the kernel sorts both sides and resolves
   matches vectorized (np.searchsorted per as-of; interval difference for
   range) — no Python loop over rows.

Partitioning assumption (documented per brief): all rows of one `by` key
fit in one bucket group. Keys are users/conversations (bounded cardinality
per key); for pathological hot keys, pre-aggregate or salt upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _typed_empty(df: pd.DataFrame, right_cols: tuple[str, ...]) -> pd.DataFrame:
    """Schema-stable empty result (avoids Ray's empty-RefBundle schema
    mismatch warnings): left columns with their dtypes + r_<col> columns."""
    cols = {c: pd.Series(dtype=df[c].dtype) for c in df.columns if c not in ("_side", "_b")}
    for c in right_cols:
        cols[f"r_{c}"] = pd.Series(dtype=df[c].dtype)
    return pd.DataFrame(cols)


def _bucketed_union(left, right, by: str, num_buckets: int):
    """Tag sides, bucket by hash(by), union — one narrow shuffle feeds the
    per-bucket kernel."""
    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch[by].to_numpy(zero_copy_only=False)
            b = (pd.util.hash_array(np.ascontiguousarray(key)) % num_buckets).astype(np.int32)
            batch = batch.append_column("_side", pa.array(np.full(batch.num_rows, side, dtype=np.int8)))
            return batch.append_column("_b", pa.array(b))

        return fn

    lds = left.map_batches(tag(0), batch_format="pyarrow")
    rds = right.map_batches(tag(1), batch_format="pyarrow")
    return lds.union(rds)


def asof_join(left, right, by: str, on: str, value_cols: tuple[str, ...],
              num_buckets: int = 64, direction: str = "backward",
              tiebreak: str | None = None):
    """INNER as-of join: every LEFT row that has a RIGHT row of the same
    `by` key with right.on <= left.on (direction="backward"; "forward" =
    earliest right.on >= left.on) gets the closest such row's `value_cols`
    as r_<col>; unmatched left rows are dropped (DuckDB `ASOF JOIN`
    semantics — the oracle the driver checks).

    Ties on equal right-side (by, on): pass ``tiebreak`` (a right column,
    e.g. an event id) to pick the max-tiebreak row deterministically
    (backward; min for forward) regardless of group arrival order. Without
    it, unique (by, on) on the right is a documented precondition of the
    SQL-checked queries — DuckDB ASOF picks an arbitrary tied row, so parity
    is only defined when there are no ties (round-2 advice item 4)."""
    assert direction in ("backward", "forward")
    sort_cols = [on] if tiebreak is None else [on, tiebreak]

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_parts = []
        for _, g in df.groupby(by, sort=False):
            l = g[g["_side"] == 0]
            r = g[g["_side"] == 1].sort_values(sort_cols, kind="mergesort")
            if len(l) == 0 or len(r) == 0:
                continue
            ron = r[on].to_numpy()
            lon = l[on].to_numpy()
            if direction == "backward":
                matched = np.searchsorted(ron, lon, side="right") - 1
            else:
                pos = np.searchsorted(ron, lon, side="left")
                matched = np.where(pos < len(ron), pos, -1)
            hit = matched >= 0
            if not hit.any():
                continue
            part = pd.DataFrame(
                {c: l[c].to_numpy()[hit] for c in l.columns if c not in ("_side", "_b")}
            )
            for c in value_cols:
                part[f"r_{c}"] = r[c].to_numpy()[matched[hit]]
            out_parts.append(part)
        if not out_parts:
            return _typed_empty(df, value_cols)
        return pd.concat(out_parts, ignore_index=True)

    ds = _bucketed_union(left, right, by, num_buckets)
    return ds.groupby("_b").map_groups(per_bucket, batch_format="pandas")


def range_join(left, right, by: str, on: str, lo, hi, right_cols: tuple[str, ...],
               num_buckets: int = 64, max_matches_per_row: int = 1000):
    """Emit (left row, right row) pairs of the same `by` key with
    right.on - left.on in [lo, hi]. Equivalent SQL: inner join with
    `r.on BETWEEN l.on + lo AND l.on + hi`.

    Fan-out guard: a left row matching more than `max_matches_per_row`
    right rows raises (interval too wide for the key density) — explicit,
    not silent truncation."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_parts = []
        for _, g in df.groupby(by, sort=False):
            l = g[g["_side"] == 0]
            r = g[g["_side"] == 1].sort_values(on, kind="mergesort")
            if len(l) == 0 or len(r) == 0:
                continue
            ron = r[on].to_numpy()
            lon = l[on].to_numpy()
            starts = np.searchsorted(ron, lon + lo, side="left")
            ends = np.searchsorted(ron, lon + hi, side="right")
            counts = ends - starts
            if counts.max(initial=0) > max_matches_per_row:
                raise ValueError(
                    f"range_join fan-out {int(counts.max())} exceeds "
                    f"max_matches_per_row={max_matches_per_row}"
                )
            total = int(counts.sum())
            if total == 0:
                continue
            from ..functions.strings import multi_arange

            li = np.repeat(np.arange(len(l)), counts)
            ri = multi_arange(starts, counts)
            part = pd.DataFrame(
                {c: l[c].to_numpy()[li] for c in l.columns if c not in ("_side", "_b")}
            )
            for c in right_cols:
                part[f"r_{c}"] = r[c].to_numpy()[ri]
            out_parts.append(part)
        if not out_parts:
            return _typed_empty(df, right_cols)
        return pd.concat(out_parts, ignore_index=True)

    ds = _bucketed_union(left, right, by, num_buckets)
    return ds.groupby("_b").map_groups(per_bucket, batch_format="pandas")
