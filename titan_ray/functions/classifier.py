"""Model-based quality filter: a deterministically-trained logistic
regression over byte-class / token features.

The DCLM / fastText-classifier analog of the reference's climatological
range check (reference: functions/checks/climatological_check.r flags
values outside a learned band; here the "band" is a learned separating
hyperplane between clean seed English and deterministic gibberish).

Everything is reproducible from the embedded seed text: positives are the
seed sentences; negatives are digit/punct floods, space-stripped walls of
text, and char-atomized shrapnel built with a fixed-seed Generator. Training is full-batch gradient descent in float64 —
bit-identical across runs and machines that implement IEEE-754.

SQL parity: the per-doc logit uses ONLY IEEE-exact ops (integer counts →
one double division per ratio → literal-weight multiply-adds in a fixed
association order), so DuckDB replays it bit-for-bit; weights are rounded
to 6 decimals and the ROUNDED values are used on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._seed_text import SEED_CORPORA
from .features import token_count
from .strings import char_class_counts, string_view

# feature order is part of the contract (SQL replays it positionally):
# [alpha_ratio, digit_ratio, punct_ratio, space_ratio, space_ratio^2,
#  token_density, token_density^2] — the quadratic terms let the linear
# model learn a BAND (too little and too much whitespace / tokenization are
# both junk), and every term stays an IEEE-exact product of exact ratios.
N_FEATURES = 7


def doc_features(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """(n, 7) float64 feature matrix; every entry is an IEEE-exact ratio of
    integer counts (replayable in SQL as CAST(c AS DOUBLE)/greatest(n,1)).

    punct is defined as n_bytes - alpha - digit - space (i.e. non-ascii
    counts as punct) to match the byte-class SQL used by the driver oracle
    — identical to char_class_counts' punct on pure-ASCII text."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    data, offsets, _ = string_view(texts)
    cls = char_class_counts(data, offsets)
    n_bytes = (offsets[1:] - offsets[:-1]).astype(np.int64)
    denom = np.maximum(n_bytes, 1).astype(np.float64)
    punct = n_bytes - cls["alpha"] - cls["digit"] - cls["space"]
    tc = token_count(texts).astype(np.float64)
    s = cls["space"] / denom
    t = tc / denom  # tokens per byte: length-invariant tokenization density
    return np.stack(
        [cls["alpha"] / denom, cls["digit"] / denom, punct / denom,
         s, s * s, t, t * t],
        axis=1,
    )


def _training_set() -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (X, y): seed sentences vs feature-distinguishable junk."""
    rng = np.random.default_rng(20260817)
    pos: list[str] = []
    for corpus in SEED_CORPORA.values():
        pos.extend(s.strip() for s in corpus.split(".") if len(s.strip()) >= 20)
    neg: list[str] = []
    for s in pos:
        n = len(s)
        # digit/punct flood: serialized-id / markup boilerplate shape
        junk = rng.choice(
            np.frombuffer(b"0123456789!!##$$%%//==", dtype=np.uint8), size=n
        )
        neg.append(bytes(junk).decode("latin-1"))
        # wall-of-text: spaces stripped => zero space ratio, one giant token
        neg.append(s.replace(" ", ""))
        # token shrapnel: every char spaced out => space ratio ~0.5,
        # token count exploding relative to length
        neg.append(" ".join(s.replace(" ", "")))
    texts = pa.array(pos + neg, type=pa.string())
    X = doc_features(texts)
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    return X, y


def train_weights(iters: int = 5000, lr: float = 5.0) -> np.ndarray:
    """Full-batch logistic-regression GD; returns [bias, w1..w7] rounded to
    6 decimals (the rounded values ARE the model — both the engine scorer
    and the SQL oracle consume them verbatim)."""
    X, y = _training_set()
    Xb = np.concatenate([np.ones((len(X), 1)), X], axis=1)
    w = np.zeros(Xb.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        w -= lr * (Xb.T @ (p - y)) / len(y)
    return np.round(w, 6)


_WEIGHTS: np.ndarray | None = None


def weights() -> np.ndarray:
    global _WEIGHTS
    if _WEIGHTS is None:
        _WEIGHTS = train_weights()
    return _WEIGHTS


def logits(texts: pa.Array | pa.ChunkedArray, w: np.ndarray | None = None) -> np.ndarray:
    """Per-doc logit in the FIXED association order the SQL replays:
    w0 then + w_j*f_j left to right for j = 1..7."""
    if w is None:
        w = weights()
    F = doc_features(texts)
    out = np.full(len(F), w[0])
    for j in range(N_FEATURES):
        out = out + w[j + 1] * F[:, j]
    return out


def logit_sql(table: str = "documents", token_pattern: str | None = None) -> str:
    """DuckDB replay of ``logits`` (bit-exact: same counts, same division,
    same literal weights, same left-to-right association)."""
    if token_pattern is None:
        from .features import _TOKEN_PATTERN

        token_pattern = _TOKEN_PATTERN
    w = weights()
    lit = [repr(float(v)) for v in w]
    return (
        "WITH c AS (SELECT doc_id, greatest(strlen(text), 1) AS nb, "
        "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS na, "
        "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS nd, "
        "CAST(length(regexp_replace(text, '[^ \t\n\r]', '', 'g')) AS BIGINT) AS ns, "
        f"CAST(length(regexp_extract_all(text, '{token_pattern}')) AS BIGINT) AS tc, "
        "strlen(text) AS raw_nb "
        f"FROM {table}), "
        "r AS (SELECT doc_id, CAST(na AS DOUBLE) / nb AS fa, "
        "CAST(nd AS DOUBLE) / nb AS fd, "
        "CAST(raw_nb - na - nd - ns AS DOUBLE) / nb AS fp, "
        "CAST(ns AS DOUBLE) / nb AS fs, "
        "CAST(tc AS DOUBLE) / nb AS ft FROM c) "
        f"SELECT doc_id, {lit[0]} "
        f"+ {lit[1]} * fa + {lit[2]} * fd + {lit[3]} * fp + {lit[4]} * fs "
        f"+ {lit[5]} * (fs * fs) + {lit[6]} * ft + {lit[7]} * (ft * ft) "
        "AS logit FROM r"
    )
