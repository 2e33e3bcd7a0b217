"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with sidecar metadata columns; the
decode/resize/feature kernels are actor-pool map_batches stages. The decode
libraries are NOT in this container, so the codec boundary is stubbed behind
a deterministic fake (or NotImplementedError for the real-codec path) — the
Ray-side plumbing (schema, batch sizing for large blobs, actor signature,
output layout) is real and tested (graft brief: multimodal columns).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # "image" | "audio" | "video"
        ("payload", pa.binary()),       # opaque encoded bytes
        ("width", pa.int32()),          # declared metadata (0 if unknown)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table (no real codecs in this container)."""
    rng = np.random.default_rng(seed)
    kinds = np.asarray(["image", "audio", "video"], dtype=object)[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(list(kinds), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(rng.integers(16, 4096, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 4096, n).astype(np.int32)),
            "duration_ms": pa.array(rng.integers(0, 60_000, n).astype(np.int32)),
        }
    )


class MediaDecodeStage:
    """Actor-pool decode/feature stage.

    Real deployment: __init__ loads the codec/model once per actor; __call__
    decodes each payload and emits features. Here the codec is stubbed: with
    ``fake=True`` (default) a deterministic digest stands in for the decoded
    feature vector; ``fake=False`` raises NotImplementedError at the exact
    seam where a real decoder (PIL/ffmpeg/torchaudio) would be invoked.

    Large-blob batch sizing: callers must pass a SMALL batch_size (payload ×
    batch_size × concurrency bounds worker heap — SURVEY.md §4 memory row).
    """

    def __init__(self, feature_dim: int = 8, fake: bool = True):
        self.feature_dim = feature_dim
        self.fake = fake

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real media decoding requires codec libraries not present in "
                "this container; run with fake=True for the plumbing path"
            )
        # deterministic digest-as-features: stable across runs/processes
        arr = np.frombuffer(payload, dtype=np.uint8)
        chunks = np.array_split(arr.astype(np.float64), self.feature_dim)
        return np.asarray([c.mean() if len(c) else 0.0 for c in chunks])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = np.stack([self._decode(p, k) for p, k in zip(payloads, kinds)])
        n_bytes = np.asarray([len(p) for p in payloads], dtype=np.int64)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array(n_bytes),
                "features": pa.array(list(feats), type=pa.list_(pa.float64())),
            }
        )


def media_features(table: pa.Table | None = None, batch_size: int = 16, concurrency=(1, 4)):
    """Dataset pipeline: media table -> decode actor pool -> feature rows.

    batch_size is deliberately small: payload blobs are large, and
    batch_size × concurrency × payload must fit each worker's heap.
    """
    import ray.data as rd

    if table is None:
        table = synth_media_table()
    ds = rd.from_arrow(table)
    return ds.map_batches(
        MediaDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


MEDIA_ROOT = "/tmp/titan_ray_media"


def ensure_media_table(sf_dir: str, rows_per_sf: int = 6400) -> str:
    """Materialize (once) a file-backed media table for this scale factor —
    the driver tables carry no binary payloads, so the deterministic fake
    table is PERSISTED and then consumed through the real read path."""
    import os
    import re

    import pyarrow.parquet as pq

    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    sf = float(m.group(1)) if m else 0.001
    out = os.path.join(MEDIA_ROOT, f"sf{sf:g}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        n = max(64, int(rows_per_sf * sf * 100))
        table = synth_media_table(n)
        shards = max(1, n // 256)
        bounds = [int(i * n / shards) for i in range(shards + 1)]
        for i in range(shards):
            pq.write_table(
                table.slice(bounds[i], bounds[i + 1] - bounds[i]),
                os.path.join(out, f"part-{i:05d}.parquet"),
            )
        with open(marker, "w") as f:
            f.write(f"n={n}\n")
    return out


def media_features_query(sf_dir: str, batch_size: int = 16, concurrency=(1, 4)):
    """Driver query (round-1 verdict fix: used to consume an in-process
    table): parquet read -> actor-pool decode -> feature rows. The codec is
    the documented fake digest; the Ray plumbing (file read, small batches
    for large blobs, actor pool) is the real path."""
    import ray.data as rd

    path = ensure_media_table(sf_dir)
    ds = rd.read_parquet(path)
    return ds.map_batches(
        MediaDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
