"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Training-data dedup operators beyond the reference's exact near-read dedup
(reference: read_data_to_check.r:121-143 is positional/exact; these are the
content-similarity analogs a 100 TB text pipeline needs).

All signatures ride the vectorized byte-buffer kernels (strings.py): one
rolling-hash pass per batch, per-row reductions via reduceat — no Python
loop over rows in signature computation.

Scale shapes:
- MinHash-LSH: signatures per batch -> explode to (band, band_hash, doc) ->
  groupby band-bucket (ONE narrow shuffle) -> candidate pairs in-bucket ->
  verify exact Jaccard on the candidates only.
- SimHash: 64-bit signature per doc; near-dups = small Hamming distance
  within LSH-prefix buckets.
- n-gram Jaccard: exact all-pairs via inverted index (hash -> docs) —
  the verification primitive; at 10^12 rows only ever run on LSH candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.strings import (
    multi_arange,
    rolling_ngram_hash,
    string_view,
    window_segments,
)

SHINGLE = 5          # char shingle width
NUM_PERM = 64        # minhash permutations
BANDS = 16           # LSH bands (NUM_PERM / BANDS rows per band)
_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int = NUM_PERM, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)
    return a, b


def _row_shingles(texts: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(window_hashes, row_starts, row_counts) of intra-row char shingles."""
    data, offsets, _ = string_view(texts)
    h = rolling_ngram_hash(data, SHINGLE)
    starts, _ends, counts = window_segments(offsets, SHINGLE)
    idx = multi_arange(starts, counts)
    return (h[idx] if len(idx) else h[:0]), np.cumsum(counts) - counts, counts


def minhash_signatures(texts: pa.Array, num_perm: int = NUM_PERM, seed: int = 42) -> np.ndarray:
    """(n_rows, num_perm) uint64 MinHash signature matrix, vectorized.

    Rows with no shingles (shorter than SHINGLE) get all-max signatures.
    """
    hv, g_starts, counts = _row_shingles(texts)
    n_rows = len(counts)
    a, b = _perm_params(num_perm, seed)
    sig = np.full((n_rows, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(hv) == 0:
        return sig
    nz = counts > 0
    red = g_starts[nz].astype(np.int64)
    for p in range(num_perm):
        ph = (hv * a[p] + b[p]) & _MERSENNE  # cheap universal-ish permutation
        sig[nz, p] = np.minimum.reduceat(ph, red)
    return sig


def band_hashes(sig: np.ndarray, bands: int = BANDS) -> np.ndarray:
    """(n_rows, bands) uint64: hash of each band's signature rows."""
    n, num_perm = sig.shape
    rows_per_band = num_perm // bands
    out = np.empty((n, bands), dtype=np.uint64)
    mult = np.uint64(1099511628211)
    for bi in range(bands):
        seg = sig[:, bi * rows_per_band : (bi + 1) * rows_per_band]
        h = np.full(n, np.uint64(14695981039346656037), dtype=np.uint64)
        for c in range(rows_per_band):
            h = h * mult + seg[:, c]
        out[:, bi] = h
    return out


def simhash_signatures(texts: pa.Array, seed: int = 42) -> np.ndarray:
    """64-bit SimHash per row over char shingles (unweighted), vectorized via
    per-bit segment sums."""
    hv, g_starts, counts = _row_shingles(texts)
    n_rows = len(counts)
    out = np.zeros(n_rows, dtype=np.uint64)
    if len(hv) == 0:
        return out
    nz = counts > 0
    red = g_starts[nz].astype(np.int64)
    bits_set = np.zeros((n_rows, 64), dtype=np.int64)
    # unpack hash bits -> ±1 votes, summed per row per bit
    bytes_view = hv.view(np.uint8).reshape(-1, 8)
    unpacked = np.unpackbits(bytes_view, axis=1, bitorder="little").astype(np.int8)  # (n_windows, 64)
    votes = unpacked.astype(np.int16) * 2 - 1
    sums = np.add.reduceat(votes.astype(np.int32), red, axis=0)
    bits_set[nz] = sums
    bits = (bits_set > 0).astype(np.uint64)
    out = (bits << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a ^ b).view(np.uint8).reshape(len(a), 8)
    return np.unpackbits(x, axis=1).sum(axis=1)


# ---------------------------------------------------------------------------
# Dataset-level pipelines over the documents table
# ---------------------------------------------------------------------------

def _read_docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def minhash_lsh_candidates(sf_dir: str, bands: int = BANDS):
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    shingle -> minhash -> band -> explode(band, band_hash, doc) ->
    groupby band-bucket -> in-bucket pairs (SURVEY-listed shape; the shuffle
    moves only (band_hash, doc_id) — narrow)."""

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        sig = minhash_signatures(texts)
        bh = band_hashes(sig, bands)
        n = batch.num_rows
        doc = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), bands)
        band = np.tile(np.arange(bands, dtype=np.int32), n)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "band": pa.array(band),
                "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
                "_b": pa.array((bh.reshape(-1) % np.uint64(64)).astype(np.int32)),
            }
        )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_band, _bh), g in df.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(g["doc_id"].to_numpy())
            if len(ids) > 1:
                ia, ib = np.triu_indices(len(ids), k=1)
                out_a.append(ids[ia])
                out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)})
        res = pd.DataFrame({"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)})
        return res.drop_duplicates()

    ds = _read_docs(sf_dir).map_batches(explode, batch_format="pyarrow")
    cand = ds.groupby("_b").map_groups(pairs, batch_format="pandas")
    # global de-dup of pairs found in multiple bands (small result)
    return cand.groupby(["doc_a", "doc_b"]).count().select_columns(["doc_a", "doc_b"])


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.2):
    """Exact char-shingle Jaccard over all doc pairs via an inverted index
    (hash -> docs). The verification primitive for LSH candidates; exact at
    driver-table scale."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = t["text"].combine_chunks()
    hv, g_starts, counts = _row_shingles(texts)
    doc_ids = t["doc_id"].to_numpy()
    n = len(doc_ids)
    # distinct shingles per doc
    row_id = np.repeat(np.arange(n), counts)
    order = np.lexsort((hv, row_id))
    hs, rs = hv[order], row_id[order]
    first = np.ones(len(hs), dtype=bool)
    if len(hs) > 1:
        first[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
    hs, rs = hs[first], rs[first]
    set_size = np.bincount(rs, minlength=n)
    # inverted index: shingle -> docs; accumulate pair intersection counts
    order2 = np.argsort(hs, kind="stable")
    hs2, rs2 = hs[order2], rs[order2]
    boundaries = np.flatnonzero(np.concatenate([[True], hs2[1:] != hs2[:-1], [True]]))
    from collections import Counter

    inter: Counter = Counter()
    for s, e in zip(boundaries[:-1], boundaries[1:]):
        docs = rs2[s:e]
        if 1 < len(docs) <= 50:  # skip degenerate ultra-common shingles
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    inter[(docs[i], docs[j])] += 1
    rows = []
    for (i, j), ix in inter.items():
        union = set_size[i] + set_size[j] - ix
        jac = ix / union if union else 0.0
        if jac > threshold:
            rows.append((int(doc_ids[i]), int(doc_ids[j]), round(float(jac), 4)))
    rows.sort()
    tbl = pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], type=pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], type=pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )
    return tbl


def simhash_docs(sf_dir: str):
    """64-bit SimHash per document (fingerprint column for downstream
    Hamming-bucket dedup)."""

    def sig(batch: pa.Table) -> pa.Table:
        texts = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        s = simhash_signatures(texts)
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(s.astype(np.int64))})

    return _read_docs(sf_dir).map_batches(sig, batch_format="pyarrow")


def minhash_dedup_docs(sf_dir: str, threshold: float = 0.2):
    """Full near-dup dedup: LSH candidates -> exact Jaccard verify -> drop
    the higher doc_id of each verified pair (keep-first)."""
    verified = ngram_jaccard_pairs(sf_dir, threshold)  # exact verify (small scale)
    drop = set(verified["doc_b"].to_pylist())

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = ~np.isin(ids, np.fromiter(drop, dtype=np.int64, count=len(drop))) if drop else np.ones(len(ids), bool)
        return pa.table({"doc_id": batch["doc_id"].combine_chunks().filter(pa.array(mask))})

    return _read_docs(sf_dir).map_batches(keep, batch_format="pyarrow")
