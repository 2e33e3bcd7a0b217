"""Vectorized dict lookups over Arrow/numpy categorical columns.

Round-2 verdict item 5: hot stages carried O(n)-Python per-row dict
comprehensions (``[mapping.get(r, d) for r in roles]``) inside otherwise
pure-numpy kernels. The fix everywhere: dictionary-encode the column ONCE
per batch (Arrow C++), build the lookup table over the (tiny) unique set in
Python, gather per-row values with one fancy-index.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def encode(col, fill: str = "") -> tuple[np.ndarray, list]:
    """(codes int64[n], uniques list) of an Arrow string column; nulls map to
    ``fill``. Codes index into uniques."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.dictionary_encode(pc.fill_null(col, fill))
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, enc.dictionary.to_pylist()


def lut(codes: np.ndarray, uniq: list, mapping: dict, default, dtype=np.float64) -> np.ndarray:
    """Per-row scalar values: mapping.get(uniq[code], default)."""
    table = np.asarray([mapping.get(u, default) for u in uniq], dtype=dtype)
    return table[codes] if len(table) else np.empty(0, dtype=dtype)


def lut_pair(codes: np.ndarray, uniq: list, mapping: dict, default: tuple) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (a, b) value pairs: mapping.get(uniq[code], default)."""
    table = np.asarray([mapping.get(u, default) for u in uniq], dtype=np.float64)
    if not len(table):
        e = np.empty(0, dtype=np.float64)
        return e, e
    return table[codes, 0], table[codes, 1]
