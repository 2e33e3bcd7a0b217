"""Document-table operator analogs — SQL-oracle-checkable projections of the
QC battery onto the driver's `documents` table (SURVEY.md §5.5).

Each function takes ``sf_dir`` and returns a Dataset/DataFrame whose column
names match the DuckDB oracle in ``__ray_entry__.oracle_sql`` exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.features import _TOKEN_PATTERN, token_count
from ..functions.strings import char_class_counts, string_view


def _read(sf_dir: str, columns: list[str]):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _chars(batch: pa.Table) -> np.ndarray:
    data, offsets, _ = string_view(batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"])
    n_bytes = (offsets[1:] - offsets[:-1]).astype(np.int64)
    cont = (data & np.uint8(0xC0)) == np.uint8(0x80)
    csum = np.concatenate([[0], np.cumsum(cont)])
    return (n_bytes - (csum[offsets[1:]] - csum[offsets[:-1]])).astype(np.int64)


def doc_length_stats(sf_dir: str):
    """Per-language doc count + total chars (final_decision summary analog,
    reference: final_decision.r:12-47)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, ["text", "lang"])

    def add_len(batch: pa.Table) -> pa.Table:
        return batch.append_column("nc", pa.array(_chars(batch)))

    ds = ds.map_batches(add_len, batch_format="pyarrow")
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"), Sum("nc", alias_name="sum_chars"))


def doc_token_counts(sf_dir: str):
    """BPE-ish token count per doc (text-analysis op; vectorized re2)."""
    ds = _read(sf_dir, ["doc_id", "text"])

    def tok(batch: pa.Table) -> pa.Table:
        t = token_count(batch["text"].combine_chunks())
        return pa.table({"doc_id": batch["doc_id"], "token_count": pa.array(t.astype(np.int64))})

    return ds.map_batches(tok, batch_format="pyarrow")


def doc_char_classes(sf_dir: str):
    """Per-doc digit/alpha counts (quality-score features)."""
    ds = _read(sf_dir, ["doc_id", "text"])

    def cls(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        data, offsets, _ = string_view(text)
        c = char_class_counts(data, offsets)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_digit": pa.array(c["digit"]),
                "n_alpha": pa.array(c["alpha"]),
            }
        )

    return ds.map_batches(cls, batch_format="pyarrow")


def doc_quality_filter(sf_dir: str, lo: int = 20, hi: int = 2000, min_tokens: int = 5):
    """Metadata/plausibility analog over documents: keep docs with char length
    in [lo, hi] and >= min_tokens tokens (reference: metadata_check.r:20-34 +
    plausibility_test.r:7-11 range semantics)."""
    ds = _read(sf_dir, ["doc_id", "text"])

    def filt(batch: pa.Table) -> pa.Table:
        nc = _chars(batch)
        tk = token_count(batch["text"].combine_chunks())
        ok = (nc >= lo) & (nc <= hi) & (tk >= min_tokens)
        return pa.table({"doc_id": batch["doc_id"].combine_chunks().filter(pa.array(ok))})

    return ds.map_batches(filt, batch_format="pyarrow")


def doc_pattern_flag(sf_dir: str, pattern: str = "vector|stream"):
    """Blacklist semi-join analog: docs whose text matches the pattern
    (reference: read_data_to_check.r:212-222 sourceId membership)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, ["doc_id", "text"])

    def filt(batch: pa.Table) -> pa.Table:
        hit = pc.fill_null(pc.match_substring_regex(batch["text"], pattern), False)
        return pa.table({"doc_id": batch["doc_id"].combine_chunks().filter(hit.combine_chunks() if isinstance(hit, pa.ChunkedArray) else hit)})

    return ds.map_batches(filt, batch_format="pyarrow")


def doc_scrub(sf_dir: str):
    """PII/toxicity scrub over documents (rr_windcorr analog), via the same
    vectorized pyarrow-re2 chain as the flagship ScrubStage (round-1 verdict
    hygiene: the pandas str.replace path looped Python re per row)."""
    import pyarrow.compute as pc

    from ..functions.scrub import SCRUB_RULES

    ds = _read(sf_dir, ["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        out = batch["text"]
        for _name, pat, repl in SCRUB_RULES:
            out = pc.replace_substring_regex(out, pat, repl)
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        return pa.table({"doc_id": batch["doc_id"], "text_scrubbed": out})

    return ds.map_batches(scrub, batch_format="pyarrow")


def dedup_exact_docs(sf_dir: str, num_buckets: int = 64):
    """Exact dedup keep-first (min doc_id) per normalized text + copy count
    (reference: read_data_to_check.r:121-143 earlier-provider-wins)."""
    import pandas as pd

    ds = _read(sf_dir, ["doc_id", "text"])

    def bucketize(batch: pa.Table) -> pa.Table:
        norm = (
            batch["text"].to_pandas().astype("string").str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
        ).fillna("")
        hv = pd.util.hash_array(norm.to_numpy(dtype=object))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "_norm": pa.Array.from_pandas(norm, type=pa.string()),
                "_b": pa.array((hv % num_buckets).astype(np.int32)),
            }
        )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_norm", sort=False)["doc_id"].agg(["min", "count"]).reset_index()
        return pd.DataFrame({"doc_id": g["min"].astype(np.int64), "n_copies": g["count"].astype(np.int64)})

    ds = ds.map_batches(bucketize, batch_format="pyarrow")
    return ds.groupby("_b").map_groups(agg, batch_format="pandas")


def doc_langid(sf_dir: str):
    """Language-ID over documents (text-analysis op, SURVEY.md §2.2 spatconv
    analog). DuckDB-checkable: the quantized trigram table is persisted as
    parquet and the oracle replays the stride-4 hash -> table join -> argmax
    -> softmax scoring in SQL (langid_sql); conf rounded half-away to match
    DuckDB round()."""
    from ..functions import langid
    from ..stages.ann import round_half_away

    ds = _read(sf_dir, ["doc_id", "text"])

    def det(batch: pa.Table) -> pa.Table:
        langs, conf = langid.detect(batch["text"].combine_chunks())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(list(langs), type=pa.string()),
                "lang_conf": pa.array(round_half_away(conf, 6)),
            }
        )

    return ds.map_batches(det, batch_format="pyarrow")


def langid_sql() -> str:
    """DuckDB oracle for doc_langid: replay detect() exactly — stride-4
    trigram windows over the first 512 windows, the FNV-style rolling hash in
    HUGEINT mod-2^64 arithmetic, int16 table join, per-doc mean log-prob
    ((int_sum / 8.0) / n, the engine's op order), argmax with lang-ascending
    tie-break (numpy argmax = first index over the sorted LANGS), softmax
    confidence 1/sum(exp(mlp - max)) (exp(0) == 1 exactly at the argmax)."""
    from ..functions import langid

    path = langid.TABLE_PARQUET
    T = 1 << 64
    M = 1099511628211
    C1 = (1469598103934665603 * M) % T  # SEED*MULT mod 2^64, precomputed
    h = (
        f"CAST(((((CAST({C1} AS HUGEINT) + ascii(substring(text, w + 1, 1))) % {T}) * {M} "
        f"+ ascii(substring(text, w + 2, 1))) % {T} * {M} "
        f"+ ascii(substring(text, w + 3, 1))) % {T} % 65536 AS BIGINT)"
    )
    return (
        f"WITH t AS (SELECT bucket, lang, q FROM read_parquet('{path}')), "
        "d AS (SELECT doc_id, text FROM documents), "
        "pos AS (SELECT doc_id, text, "
        "unnest(generate_series(0, least(strlen(text) - 3, 511), 4)) AS w "
        "FROM d WHERE text IS NOT NULL AND strlen(text) >= 3), "
        f"hw AS (SELECT doc_id, {h} AS bucket FROM pos), "
        "sc AS (SELECT doc_id, count(*) AS n FROM hw GROUP BY doc_id), "
        "sums AS (SELECT hw.doc_id, t.lang, sum(t.q) AS sq FROM hw "
        "JOIN t ON t.bucket = hw.bucket GROUP BY hw.doc_id, t.lang), "
        "m AS (SELECT s.doc_id, s.lang, (CAST(s.sq AS DOUBLE) / 8.0) / sc.n AS mlp "
        "FROM sums s JOIN sc ON sc.doc_id = s.doc_id), "
        "mm AS (SELECT doc_id, max(mlp) AS mx FROM m GROUP BY doc_id), "
        "zs AS (SELECT m.doc_id, sum(exp(m.mlp - mm.mx)) AS z FROM m "
        "JOIN mm ON mm.doc_id = m.doc_id GROUP BY m.doc_id), "
        "best AS (SELECT doc_id, lang FROM (SELECT doc_id, lang, "
        "row_number() OVER (PARTITION BY doc_id ORDER BY mlp DESC, lang ASC) AS rn "
        "FROM m) WHERE rn = 1) "
        "SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred, "
        "coalesce(round(1.0 / zs.z, 6), 0.0) AS lang_conf "
        "FROM d LEFT JOIN best b ON b.doc_id = d.doc_id "
        "LEFT JOIN zs ON zs.doc_id = d.doc_id"
    )


def doc_quality_scores(sf_dir: str):
    """Quality-score vector per document (graft brief: length/punct ratios):
    byte-class ratios + token count, rounded half-away-from-zero to 6 so the
    DuckDB oracle (integer counts -> identical doubles -> same rounding)
    hash-matches."""
    from ..functions.strings import char_class_counts, string_view
    from ..functions.features import token_count
    from ..stages.ann import round_half_away

    ds = _read(sf_dir, ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        texts = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        data, offsets, _ = string_view(texts)
        cls = char_class_counts(data, offsets)
        n_bytes = (offsets[1:] - offsets[:-1]).astype(np.int64)
        denom = np.maximum(n_bytes, 1).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_bytes),
                "alpha_ratio": pa.array(round_half_away(cls["alpha"] / denom, 6)),
                "digit_ratio": pa.array(round_half_away(cls["digit"] / denom, 6)),
                "punct_ratio": pa.array(round_half_away(cls["punct"] / denom, 6)),
                "space_ratio": pa.array(round_half_away(cls["space"] / denom, 6)),
                "token_count": pa.array(token_count(texts).astype(np.int64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def doc_stopword_ratio(sf_dir: str):
    """Stopword ratio per document (graft brief: quality scoring): fraction
    of whitespace tokens that are English stopwords — engine counts via one
    padded substring scan per stopword (pyarrow re2-free count_substring);
    the DuckDB oracle replays it with replace()-difference counting (both
    count NON-OVERLAPPING occurrences left-to-right, so they agree)."""
    from ..functions.features import STOPWORDS, stopword_ratio
    from ..functions.strings import string_view, word_counts
    from ..stages.ann import round_half_away

    ds = _read(sf_dir, ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        texts = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        data, offsets, _ = string_view(texts)
        n_words = word_counts(data, offsets)
        ratio = stopword_ratio(texts, n_words.astype(np.int32))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words.astype(np.int64)),
                "stopword_ratio": pa.array(round_half_away(ratio, 6)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def stopword_sql() -> str:
    """DuckDB oracle for doc_stopword_ratio."""
    from ..functions.features import STOPWORDS

    terms = " + ".join(
        f"(strlen(p) - strlen(replace(p, ' {w} ', ''))) / {len(w) + 2}"
        for w in STOPWORDS
    )
    return (
        "WITH b AS (SELECT doc_id, concat(' ', lower(text), ' ') AS p, "
        "CAST(length(regexp_extract_all(trim(text), '\\S+')) AS BIGINT) AS n_words "
        "FROM documents) "
        f"SELECT doc_id, n_words, round(CAST({terms} AS DOUBLE) / greatest(n_words, 1), 6) "
        "AS stopword_ratio FROM b"
    )
