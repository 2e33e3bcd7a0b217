"""Fault tolerance: Ray task retries re-execute stages idempotently.

The reference aborts on any error (misc_util.r:3-11 boom()); the engine
leans on Ray's task retry + lineage re-execution (SURVEY.md §4). A
transient failure is injected into a map_batches stage (filesystem marker
=> fails exactly once globally) and the pipeline must complete with output
identical to a clean run — no dropped or duplicated rows."""

import tempfile

import numpy as np
import pyarrow as pa

RETRY = {"retry_exceptions": True, "max_retries": 3}


def _make_flaky(marker: str):
    def fn(batch: pa.Table) -> pa.Table:
        import os

        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("failed once")
            raise RuntimeError("injected transient failure")
        return batch.append_column("touched", pa.array(np.ones(batch.num_rows, dtype=bool)))

    return fn


def test_flaky_stage_retries_to_success(ray_session):
    import ray.data as rd

    from titan_ray.corpus import generate_corpus

    t = generate_corpus(600, seed=21, mega=False)
    marker = tempfile.mktemp(prefix="titan_flaky_")
    ds = rd.from_arrow(t).repartition(4)
    out = ds.map_batches(
        _make_flaky(marker), batch_format="pyarrow", **RETRY
    ).to_pandas()
    assert len(out) == t.num_rows
    assert out["touched"].all()


def test_flaky_stage_inside_qc_pipeline(ray_session):
    """Inject the flaky stage mid-flagship: the full battery still matches
    the serial oracle (retries don't duplicate or drop rows)."""
    import ray.data as rd

    from titan_ray.config import QCConfig
    from titan_ray.corpus import generate_corpus
    from titan_ray.oracle.serial import oracle_qc
    from titan_ray.pipelines.qc import build_qc_pipeline

    t = generate_corpus(900, seed=22, mega=False)
    cfg = QCConfig(dedup=True)
    marker = tempfile.mktemp(prefix="titan_flaky_")
    ds = rd.from_arrow(t).repartition(5).map_batches(
        _make_flaky(marker), batch_format="pyarrow", **RETRY
    ).map_batches(lambda b: b.drop_columns(["touched"]), batch_format="pyarrow")
    eng = build_qc_pipeline(ds, cfg).to_pandas().sort_values(
        ["conv_id", "turn_idx"], na_position="last"
    ).reset_index(drop=True)
    ora = oracle_qc(t, cfg).sort_values(
        ["conv_id", "turn_idx"], na_position="last"
    ).reset_index(drop=True)
    assert len(eng) == len(ora)
    assert (eng["dqcflag"].to_numpy() == ora["dqcflag"].to_numpy()).all()
