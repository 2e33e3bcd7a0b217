"""KenLM-style character n-gram perplexity, hashed and vectorized.

Analog of the reference's first-guess / climatological "expected value"
machinery (reference: functions/checks/climatological_check.r:24-28 flags
values outside a climatological band; here the band is over perplexity under
a char 3-gram LM with stupid-backoff to bigrams/unigrams). Deterministic:
trained at import from the embedded English seed corpus plus the corpus
template vocabulary — clean templated English scores low, planted gibberish
scores high (FIXTURES.md §2 ge_range).
"""

from __future__ import annotations

import numpy as np

from ._seed_text import SEED_CORPORA
from .strings import (
    multi_arange,
    rolling_ngram_hash,
    segment_sum,
    string_view,
    window_segments,
)

ORDER = 3
HASH_BUCKETS = 1 << 18
_BACKOFF = 0.4  # stupid backoff weight


class CharLM:
    """Hashed char-trigram LM with stupid backoff; vectorized batch scoring."""

    def __init__(self, corpus: str | None = None):
        if corpus is None:
            corpus = SEED_CORPORA["en"]
        data = np.frombuffer(corpus.lower().encode("utf-8"), dtype=np.uint8)
        # log P(c | prev2) ≈ count(tri)/count(bi_prefix), hashed; backoff to
        # count(bi)/count(uni_prefix), then to unigram.
        self._tri_lp = self._cond_table(data, 3)
        self._bi_lp = self._cond_table(data, 2)
        uni = np.bincount(data.astype(np.int64), minlength=256).astype(np.float64)
        self._uni_lp = np.log((uni + 0.01) / (uni.sum() + 0.01 * 256)).astype(np.float32)

    def tables(self):
        """The model's numpy state, for ray.put sharing across workers."""
        return (self._tri_lp, self._bi_lp, self._uni_lp)

    @classmethod
    def from_tables(cls, tri_lp, bi_lp, uni_lp) -> "CharLM":
        """Reconstruct WITHOUT retraining from tables() output — the arrays
        may be read-only zero-copy plasma views; scoring only gathers."""
        obj = cls.__new__(cls)
        obj._tri_lp, obj._bi_lp, obj._uni_lp = tri_lp, bi_lp, uni_lp
        return obj

    def _cond_table(self, data: np.ndarray, n: int) -> np.ndarray:
        """log(count(ngram)+a) - log(count(prefix)+a*V) in a hashed table.

        float32 tables: halves the random-gather memory traffic — the scorer
        is bandwidth-bound, and table width directly bounds multi-worker
        scaling on shared-memory hosts."""
        h_n = rolling_ngram_hash(data, n) % HASH_BUCKETS
        h_p = rolling_ngram_hash(data, n - 1) % HASH_BUCKETS
        c_n = np.bincount(h_n.astype(np.int64), minlength=HASH_BUCKETS).astype(np.float64)
        c_p = np.bincount(h_p.astype(np.int64), minlength=HASH_BUCKETS).astype(np.float64)
        return (
            np.log(c_n + 0.01).astype(np.float32),
            np.log(c_p + 0.01 * 64).astype(np.float32),
            c_n > 0,
        )

    def _cond_logprob(self, data: np.ndarray, n: int, tab, h_cache: dict) -> tuple[np.ndarray, np.ndarray]:
        """(logprob, known) for every length-n window of data; rolling hashes
        shared across orders via h_cache."""
        log_n, log_p, c_n = tab
        size = len(data) - n + 1
        if size <= 0:
            return np.empty(0, np.float32), np.empty(0, bool)
        for k in (n, n - 1):
            if k not in h_cache:
                h_cache[k] = (rolling_ngram_hash(data, k) % HASH_BUCKETS).astype(np.int64)
        h_n = h_cache[n]
        h_p = h_cache[n - 1][:size]
        lp = log_n[h_n] - log_p[h_p]
        known = c_n[h_n]  # c_n is a bool "seen" table
        return lp, known

    def logprobs(self, data: np.ndarray) -> np.ndarray:
        """Per-window log P(c_i | c_{i-2} c_{i-1}) for windows of length ORDER,
        with stupid backoff where the trigram is unseen."""
        size = len(data) - ORDER + 1
        if size <= 0:
            return np.empty(0, dtype=np.float32)
        h_cache: dict = {}
        lp3, known3 = self._cond_logprob(data, 3, self._tri_lp, h_cache)
        lp2, known2 = self._cond_logprob(data, 2, self._bi_lp, h_cache)
        lp2 = lp2[ORDER - 2 :][:size]  # align: window i predicts char i+2
        known2 = known2[ORDER - 2 :][:size]
        lp1 = self._uni_lp[data[ORDER - 1 :].astype(np.int64)][:size]
        out = lp3.copy()
        use2 = ~known3 & known2
        use1 = ~known3 & ~known2
        out[use2] = np.float32(np.log(_BACKOFF)) + lp2[use2]
        out[use1] = np.float32(2 * np.log(_BACKOFF)) + lp1[use1]
        return out

    def perplexity(self, texts) -> np.ndarray:
        """Vectorized per-row perplexity over an Arrow string array.

        Rows shorter than ORDER bytes or null get ppl = 0.0 (scored as
        'unscorable'; the metadata check catches empties upstream).
        """
        import pyarrow as pa

        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array([t.lower() if t is not None else None for t in texts], type=pa.string())
            data, offsets, valid = string_view(texts)
        else:
            import pyarrow.compute as pc

            lowered = pc.utf8_lower(texts)
            data, offsets, valid = string_view(lowered)
        n_rows = len(offsets) - 1
        out = np.zeros(n_rows, dtype=np.float64)
        lp = self.logprobs(data)
        if len(lp) == 0:
            return out
        starts, ends, counts = window_segments(offsets, ORDER)
        idx = multi_arange(starts, counts)
        if len(idx) == 0:
            return out
        g_ends = np.cumsum(counts)
        g_starts = g_ends - counts
        # float32 gather; segment_sum's cumsum upcasts per element (same
        # math as astype(float64) first, without materializing the 8B copy)
        sums = segment_sum(lp[idx], g_starts, g_ends)
        scored = (counts > 0) & valid
        out[scored] = np.exp(-sums[scored] / counts[scored])
        return out


_LM: CharLM | None = None


def default_lm() -> CharLM:
    global _LM
    if _LM is None:
        _LM = CharLM()
    return _LM


def set_default_lm(lm: CharLM) -> None:
    """Install a prebuilt LM (e.g. reconstructed from shared plasma tables)
    as this process's default — every later default_lm() caller reads the
    one node-shared physical copy instead of training a private one."""
    global _LM
    _LM = lm
