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
    MEDIA_VERSION = "v2"
    out = os.path.join(MEDIA_ROOT, f"sf{sf:g}")
    marker = os.path.join(out, "_SUCCESS")
    n = max(64, int(rows_per_sf * sf * 100))
    stamp = f"{MEDIA_VERSION} n={n}"
    if not (os.path.exists(marker) and open(marker).read().strip() == stamp):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        table = synth_media_table(n)
        shards = max(1, n // 256)
        bounds = [int(i * n / shards) for i in range(shards + 1)]
        for i in range(shards):
            pq.write_table(
                table.slice(bounds[i], bounds[i + 1] - bounds[i]),
                os.path.join(out, f"part-{i:05d}.parquet"),
            )
        with open(marker, "w") as f:
            f.write(stamp + "\n")
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


class MediaResizeStage:
    """Actor-pool resize stage (graft brief: decode / feature-extract /
    resize / frame-sample as actor-pool stages). The pixel transform sits
    behind the same stubbed codec seam as decode; the REAL parts are the
    Ray plumbing and the metadata algebra: target-box fit preserving aspect
    ratio, payload passthrough, small batches for large blobs."""

    def __init__(self, max_w: int = 256, max_h: int = 256, fake: bool = True):
        self.max_w, self.max_h, self.fake = max_w, max_h, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real pixel resampling requires codec libraries not in this container"
            )
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, np.minimum(self.max_w / np.maximum(w, 1), self.max_h / np.maximum(h, 1)))
        out = pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": batch["payload"],  # codec-stub: bytes pass through
                "width": pa.array(np.floor(w * scale).astype(np.int32)),
                "height": pa.array(np.floor(h * scale).astype(np.int32)),
                "duration_ms": batch["duration_ms"],
            }
        )
        return out


class FrameSampleStage:
    """Actor-pool frame sampler for video rows: emit n_frames evenly spaced
    'frames' per video (deterministic byte slices of the payload stand in
    for decoded frames); non-video rows pass through as a single frame.
    Fan-out stage: one input row -> n_frames output rows."""

    def __init__(self, n_frames: int = 4, frame_bytes: int = 256):
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, fidx, ts_ms, frames = [], [], [], [], []
        payloads = batch["payload"].to_pylist()
        for mid, kind, dur, p in zip(
            batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
            batch["duration_ms"].to_pylist(), payloads,
        ):
            n = self.n_frames if kind == "video" else 1
            for j in range(n):
                off = (j * max(len(p) - self.frame_bytes, 0)) // max(n - 1, 1) if n > 1 else 0
                ids.append(mid)
                kinds.append(kind)
                fidx.append(j)
                ts_ms.append((j * dur) // max(n - 1, 1) if n > 1 else 0)
                frames.append(p[off : off + self.frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "kind": pa.array(kinds, type=pa.string()),
                "frame_idx": pa.array(fidx, type=pa.int32()),
                "frame_ts_ms": pa.array(ts_ms, type=pa.int64()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def media_pipeline(table: pa.Table | None = None, batch_size: int = 16, concurrency=(1, 4)):
    """Full multimodal chain: resize -> frame-sample -> decode/features —
    three actor-pool stages over binary payloads, small batches throughout."""
    import ray.data as rd

    if table is None:
        table = synth_media_table()
    ds = rd.from_arrow(table)
    ds = ds.map_batches(MediaResizeStage, batch_format="pyarrow",
                        batch_size=batch_size, concurrency=concurrency)
    ds = ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                        batch_size=batch_size, concurrency=concurrency)

    def frame_features(batch: pa.Table) -> pa.Table:
        stage = MediaDecodeStage(feature_dim=8)
        feats = [stage._decode(p, k) for p, k in zip(batch["frame"].to_pylist(), batch["kind"].to_pylist())]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "frame_idx": batch["frame_idx"],
                "features": pa.array([list(f) for f in feats], type=pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(frame_features, batch_format="pyarrow", batch_size=batch_size)
