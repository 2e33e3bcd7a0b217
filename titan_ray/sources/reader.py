"""Transcript source: multi-provider read, per-role affine rescale,
imputation, output projection (reference: functions/IO/read_data_to_check.r
+ read_dem.r + write_output.r recast).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import INPUT_SCHEMA


def _metadata_free_schema(path: str):
    """Schema of ``path`` with file-level metadata stripped, or None.

    Parquet written by pandas carries a ``b'pandas'`` metadata blob whose
    presence makes ``hash(schema)`` raise, which in turn makes every Ray read
    task log ``Failed to hash the schemas (for deduplication)`` and defeats
    schema dedup across blocks. Stripping metadata up front keeps block
    schemas hashable (and the bench log clean) without touching the data."""
    import glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            return None
        path = files[0]
    try:
        s = pq.read_schema(path)
    except Exception:
        return None
    return s.remove_metadata() if s.metadata else None


def read_parquet_clean(paths, columns: list[str] | None = None, **kwargs):
    """`ray.data.read_parquet` with hashable (metadata-free) block schemas."""
    import ray.data as rd

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    if "schema" not in kwargs:
        sch = _metadata_free_schema(first)
        if sch is not None:
            if columns is not None:
                # the fragment reader builds tables against this schema AFTER
                # column projection, so it must cover exactly the projection
                sch = pa.schema([sch.field(c) for c in columns if c in sch.names])
            kwargs["schema"] = sch
    return rd.read_parquet(paths, columns=columns, **kwargs)


def read_transcripts(paths: str | list[str], columns: list[str] | None = None, **kwargs):
    """Union of provider directories/files (reference:
    read_data_to_check.r:174-206 rbinds providers; Ray's read_parquet over a
    path list IS the union — no driver-side concat)."""
    return read_parquet_clean(paths, columns=columns, **kwargs)


def affine_rescale_qscore(batch: pa.Table, role_affine: dict[str, tuple[float, float]]) -> pa.Table:
    """Per-role ``offset + cfact * qscore`` (reference:
    read_data_to_check.r:83-84 applies offset+cfact*value per provider file;
    role is the provider analog). Identity for roles not listed."""
    if not role_affine:
        return batch
    from ..functions.lut import encode, lut_pair

    codes, uniq = encode(batch["role"])
    q = batch["qscore"].to_numpy(zero_copy_only=False).astype(np.float64)
    off, fac = lut_pair(codes, uniq, role_affine, (0.0, 1.0))
    out = off + fac * q
    i = batch.column_names.index("qscore")
    return batch.set_column(i, "qscore", [pa.array(out)])


def impute_defaults(batch: pa.Table, role_default: str | None = None, tool_default: str = "") -> pa.Table:
    """Fill missing optional metadata BEFORE the metadata check so rows that
    only lacked it are not flagged (reference: read_dem.r:44-58 fills missing
    station elevation from the DEM and un-flags rows that only lacked
    elevation). conv_id/text stay un-imputed — those are identity, not
    metadata."""
    if role_default is not None and "role" in batch.column_names:
        i = batch.column_names.index("role")
        batch = batch.set_column(i, "role", [pc.coalesce(batch["role"], pa.scalar(role_default))])
    if "tool" in batch.column_names:
        i = batch.column_names.index("tool")
        batch = batch.set_column(i, "tool", [pc.coalesce(batch["tool"], pa.scalar(tool_default))])
    return batch


OUTPUT_ORDER_FIRST = [f.name for f in INPUT_SCHEMA] + [
    "lang", "lang_conf", "ppl", "qscore", "n_chars", "n_words", "rep_ratio",
    "dqcflag", "keep", "sctpog", "corep", "text_scrubbed",
]


def project_output(batch: pa.Table) -> pa.Table:
    """Stable output column order: input columns first (original order),
    passthrough extras next, derived columns last (reference:
    write_output.r:36-63 re-assembles columns in original input order and
    appends prid/dqc)."""
    known = [c for c in OUTPUT_ORDER_FIRST if c in batch.column_names]
    extras = [c for c in batch.column_names if c not in known]
    # passthrough extras keep their relative input order, before derived cols
    input_cols = [c for c in known if c in {f.name for f in INPUT_SCHEMA}]
    derived = [c for c in known if c not in input_cols]
    return batch.select(input_cols + extras + derived)


# ---------------------------------------------------------------------------
# Non-parquet providers (reference: read_data_to_check.r dispatches per
# provider file format before the rbind union; here each format becomes a
# Ray Datasource and the union stays lazy/streaming)
# ---------------------------------------------------------------------------

def _cast_to_schema(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project + cast a provider batch onto the canonical schema. Missing
    columns become typed nulls; string->timestamp casts accept ISO text
    (what CSV/JSONL carry for `ts`)."""
    cols = []
    for f in schema:
        if f.name in batch.column_names:
            col = batch[f.name]
            if col.type != f.type:
                col = pc.cast(col, f.type)
        else:
            col = pa.nulls(batch.num_rows, type=f.type)
        cols.append(col)
    return pa.table(cols, schema=schema)


def read_csv_transcripts(paths, schema: pa.Schema | None = None, **kwargs):
    """CSV provider files as a Dataset with the canonical schema.

    Scale note: CSV blocks are parsed by pyarrow's multithreaded reader
    inside each read task; the cast is a per-batch map, no shuffle."""
    import ray.data as rd

    sch = schema or INPUT_SCHEMA
    ds = rd.read_csv(paths, **kwargs)
    return ds.map_batches(lambda b: _cast_to_schema(b, sch), batch_format="pyarrow")


def read_jsonl_transcripts(paths, schema: pa.Schema | None = None, **kwargs):
    """Newline-delimited JSON provider files (ray.data.read_json reads
    JSONL via the pyarrow JSON reader), cast to the canonical schema."""
    import ray.data as rd

    sch = schema or INPUT_SCHEMA
    ds = rd.read_json(paths, **kwargs)
    return ds.map_batches(lambda b: _cast_to_schema(b, sch), batch_format="pyarrow")


def read_providers(specs, schema: pa.Schema | None = None, columns: list[str] | None = None):
    """Heterogeneous provider union: ``specs`` is a list of (path, format)
    with format in {parquet, csv, jsonl} (or None => by extension).
    Each provider reads with its own Datasource, every batch is cast onto
    ONE canonical schema, and `Dataset.union` concatenates lazily — the
    multi-format analog of read_data_to_check.r:174-206's rbind. Column
    pruning happens at the read for parquet and at the cast for csv/jsonl."""
    sch = schema or INPUT_SCHEMA
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns if c in sch.names])
    parts = []
    for spec in specs:
        path, fmt = spec if isinstance(spec, (list, tuple)) else (spec, None)
        if fmt is None:
            ext = str(path).rsplit(".", 1)[-1].lower()
            fmt = {"csv": "csv", "jsonl": "jsonl", "json": "jsonl"}.get(ext, "parquet")
        if fmt == "csv":
            parts.append(read_csv_transcripts(path, schema=sch))
        elif fmt == "jsonl":
            parts.append(read_jsonl_transcripts(path, schema=sch))
        else:
            ds = read_parquet_clean(path, columns=list(sch.names))
            parts.append(ds.map_batches(lambda b, s=sch: _cast_to_schema(b, s), batch_format="pyarrow"))
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out
