"""Benchmark harness (driver contract).

Default: run the headline transcript-QC pipeline + operator queries over
$GRAFT_SF_DIR (default /root/testdata/sf0.1) at num_cpus=$RAY_GRAFT_CPUS
(default 32) and print ONE JSON line.

--scaling: run the headline pipeline twice in FRESH processes at num_cpus=8
and num_cpus=32 on the same input (the sandbox stand-in for N vs 4N nodes,
BASELINE.json north_rule) and report both throughputs + efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# silence the C++ core_worker chatter (e.g. the actor-restart-args note) so
# the bench log of record ends at the JSON line
os.environ.setdefault("RAY_BACKEND_LOG_LEVEL", "fatal")


def _sf() -> float:
    import re

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    return float(m.group(1)) if m else 0.1


def _wait_for_quiet_box(max_wait_s: int = 480, load_ok: float = 2.0) -> None:
    """Wait (bounded) for residual system load to decay before timing.

    This VM shows ±25–30% run-to-run noise when a bench starts while the
    1-min load average is still high from a previous job (pytest, the
    oracle gate, a prior Ray session tearing down). The round-2 run of
    record landed in exactly that regime. Cheap insurance: poll
    /proc/loadavg and start only once 1-min load < ``load_ok`` or after
    ``max_wait_s``, whichever comes first. Disable with GRAFT_NO_COOLDOWN=1.
    """
    if os.environ.get("GRAFT_NO_COOLDOWN"):
        return
    deadline = time.monotonic() + max_wait_s
    while time.monotonic() < deadline:
        try:
            with open("/proc/loadavg") as f:
                load1 = float(f.read().split()[0])
        except (OSError, ValueError):
            return
        if load1 < load_ok:
            return
        time.sleep(10)


def _quiet_init(num_cpus: int) -> None:
    """ray.init with a clean log tail: no worker-log forwarding (the
    'Failed to hash the schemas' lines are upstream log-dedup noise emitted
    from worker processes) and ray.data driver loggers at ERROR (the
    empty-block-after-Sort RefBundle schema warnings are cosmetic — empty
    partitions of Ray's own sort, not engine blocks)."""
    import logging

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR", log_to_driver=False)
    for name in ("ray.data", "ray"):
        logging.getLogger(name).setLevel(logging.ERROR)
    # Ray Data registers fresh per-dataset loggers at execution start that
    # bypass the parent level — suppress everything below ERROR process-wide
    # (bench output is the single JSON print; nothing legitimate is lost)
    logging.disable(logging.WARNING)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def run_bench() -> dict:
    if not os.path.isdir(SF_DIR) and not os.environ.get("GRAFT_HEADLINE_ONLY"):
        raise SystemExit(f"GRAFT_SF_DIR does not exist: {SF_DIR}")
    import ray

    _wait_for_quiet_box()
    _quiet_init(NUM_CPUS)

    from titan_ray.config import QCConfig
    from titan_ray.corpus import corpus_path_for_sf
    from titan_ray.pipelines.qc import build_qc_pipeline
    from titan_ray.pipelines import docqc, events
    from titan_ray.stages import ann
    import ray.data as rd

    sf = _sf()
    corpus = corpus_path_for_sf(sf)  # generated once, cached with _SUCCESS
    # warm the page cache so we measure compute+shuffle, not first disk read
    rd.read_parquet(corpus).count()

    n_turns = rd.read_parquet(corpus).count()
    out_dir = "/tmp/titan_ray_bench_out"
    shutil.rmtree(out_dir, ignore_errors=True)

    timings: dict[str, float] = {}

    cfg = QCConfig(dedup=True, scorer_concurrency=(max(1, NUM_CPUS // 4), NUM_CPUS))
    runs = []
    # 4 runs by default: run 1 is cold (actor pools, imports), the best of
    # the rest is the steady state; this box's ±25% noise makes min-of-2
    # land on a bad regime too often (the round-2 record did exactly that),
    # and a fully cold session (first bench after boot) was still decaying
    # at run 3 (36.5/27.2/23.4 s) — all runs stay in the reported array
    n_runs = int(os.environ.get("GRAFT_BENCH_RUNS", "4"))
    for attempt in range(n_runs):  # 2nd run = steady state (actors warm, store warm)
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = rd.read_parquet(corpus)
        build_qc_pipeline(ds, cfg, num_buckets=max(64, NUM_CPUS * 4)).write_parquet(out_dir)
        runs.append(time.perf_counter() - t0)
    headline = min(runs)
    timings["qc_transcripts"] = round(headline, 3)
    timings["qc_transcripts_runs"] = [round(r, 3) for r in runs]

    def timed(name: str, fn):
        t = time.perf_counter()
        res = fn(SF_DIR)
        # consume: Datasets are lazy — count() executes the full plan
        n = res.count() if hasattr(res, "count") and not hasattr(res, "iloc") else len(res)
        timings[name] = round(time.perf_counter() - t, 3)
        return n

    if not os.environ.get("GRAFT_HEADLINE_ONLY"):
        timed("doc_token_counts", docqc.doc_token_counts)
        timed("doc_scrub", docqc.doc_scrub)
        timed("dedup_exact_docs", docqc.dedup_exact_docs)
        timed("events_hourly", events.events_hourly)
        timed("events_buddy", events.events_buddy)
        timed("ann_topk", ann.ann_topk)

    result = {
        "metric": "qc_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    # Scaling is measured at a LARGER corpus than the default bench sf so the
    # per-stage fixed latencies (pool spin-up, shuffle coordination) amortize
    # — the regime a real N- vs 4N-node cluster operates in (each node holds
    # >> seconds of work). Same input for both levels.
    scaling_dir = os.environ.get("GRAFT_SCALING_SF_DIR", "/root/testdata/sf0.4")

    def sub(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=scaling_dir,
                   GRAFT_HEADLINE_ONLY="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    # GRAFT_SCALE_LEVELS="4,8,16,32" widens the two-point measurement to a
    # full same-session curve (hi level first, so late-arriving external
    # load hits the cheap legs), with the no-Ray DRAM probe alongside as the
    # hardware denominator — this is the command that produced the
    # BASELINE.md round-5 scaling table.
    levels_env = os.environ.get("GRAFT_SCALE_LEVELS", "")
    levels = sorted({int(x) for x in levels_env.split(",") if x} | {lo, hi})
    probe = {n: _probe_calls_per_sec(n) for n in levels}
    res = {n: sub(n) for n in sorted(levels, reverse=True)}
    eff = (res[lo]["value"] / res[hi]["value"]) / (hi / lo)
    hw_x = round(probe[hi] / probe[lo], 3)
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": res[lo]["value"],
        "sec_hi": res[hi]["value"],
        "turns_per_sec_lo": res[lo]["turns_per_sec"],
        "turns_per_sec_hi": res[hi]["turns_per_sec"],
        "sf": res[hi]["sf"],
        # hardware context: the same-session plain-multiprocessing scorer
        # probe's lo->hi speedup (the box's own ceiling for this kernel) and
        # the engine's speedup as a fraction of it
        "hw_ceiling_x": hw_x,
        "efficiency_vs_hw": round((res[lo]["value"] / res[hi]["value"]) / hw_x, 3),
    }
    if len(levels) > 2:
        out["curve"] = {
            str(n): {"sec": res[n]["value"], "turns_per_sec": res[n]["turns_per_sec"],
                     "runs": res[n]["queries"]["qc_transcripts_runs"],
                     "probe_calls_per_sec": probe[n]}
            for n in levels
        }
        out["pair_efficiency"] = {
            f"{a}->{b}": round((res[a]["value"] / res[b]["value"]) / (b / a), 3)
            for a, b in zip(levels, levels[1:])
        }
    return out


def _probe_calls_per_sec(n: int) -> float:
    """Aggregate throughput of the no-Ray scorer-kernel probe at n plain
    multiprocessing workers (warm run measured)."""
    import multiprocessing as mp

    with mp.Pool(n) as p:
        p.map(_probe_work, range(n))  # warm: imports + table training
        t0 = time.perf_counter()
        p.map(_probe_work, range(n))
        wall = time.perf_counter() - t0
    return round(n * _PROBE_CALLS / wall, 2)


def run_stats() -> None:
    """Print the flagship pipeline's ds.stats() operator breakdown at
    NUM_CPUS over GRAFT_SF_DIR's corpus — the per-operator tuning loop."""
    import ray

    _quiet_init(NUM_CPUS)
    import ray.data as rd

    from titan_ray.config import QCConfig
    from titan_ray.corpus import corpus_path_for_sf
    from titan_ray.pipelines.qc import build_qc_pipeline

    corpus = corpus_path_for_sf(_sf())
    cfg = QCConfig(dedup=True, scorer_concurrency=(max(1, NUM_CPUS // 4), NUM_CPUS))
    ds = build_qc_pipeline(rd.read_parquet(corpus), cfg, num_buckets=max(64, NUM_CPUS * 4))
    out = "/tmp/titan_ray_stats_out"
    shutil.rmtree(out, ignore_errors=True)
    ds.write_parquet(out)
    print(ds.stats())
    ray.shutdown()


STAGES = ("read", "dedup", "scorer", "rowwise", "conv", "scrub", "write")


def run_stage(stage: str) -> dict:
    """Time ONE stage pipeline at NUM_CPUS (internal helper for --stages;
    fresh process per call so levels don't share a Ray session).

    Semantics per stage (NOT uniformly cumulative — the table compares each
    row's lo-vs-hi SCALING, not absolute seconds across rows):
    read/dedup/scrub/write are ISOLATED pipelines over the raw corpus;
    scorer/rowwise/conv are cumulative prefixes WITHOUT the dedup stage
    (dedup's scaling is measured by its own row)."""
    import ray

    _quiet_init(NUM_CPUS)
    import ray.data as rd
    from functools import partial

    from titan_ray.config import QCConfig
    from titan_ray.corpus import corpus_path_for_sf
    from titan_ray.pipelines.qc import ScoreChain
    from titan_ray.stages.conv import run_conv_checks_arrow
    from titan_ray.stages.dedup import dedup_exact
    from titan_ray.stages.rowwise import metadata_check, seed_lists
    from titan_ray.stages.scorer import Scorer
    from titan_ray.stages.scrub_stage import ScrubStage

    sf = _sf()
    corpus = corpus_path_for_sf(sf)
    rd.read_parquet(corpus).count()  # warm page cache
    cfg = QCConfig(dedup=True, scorer_concurrency=(max(1, NUM_CPUS // 4), NUM_CPUS),
                   batch_size=int(os.environ.get("GRAFT_BATCH", QCConfig.batch_size)))

    def build(ds):
        if stage == "read":
            return ds
        if stage == "dedup":
            return dedup_exact(ds)
        if stage == "scrub":
            return ds.map_batches(ScrubStage, batch_format="pyarrow",
                                  batch_size=cfg.batch_size, concurrency=cfg.scorer_concurrency)
        if stage == "write":
            return ds
        if stage == "scorer":
            # the scorer kernel alone (attribution row; production runs it
            # inside the fused ScoreChain actor below)
            from titan_ray.stages.scorer import shared_model_refs

            return ds.map_batches(Scorer, batch_format="pyarrow", batch_size=cfg.batch_size,
                                  fn_constructor_kwargs={"model_refs": shared_model_refs()},
                                  concurrency=(max(1, NUM_CPUS // 4), NUM_CPUS))
        # production operator shape: seed/meta task maps fuse INTO the
        # ScoreChain actor pool (scorer + affine + plaus + clim + salt in
        # one __call__ — round-4 fold)
        for fn in (seed_lists, metadata_check):
            ds = ds.map_batches(partial(fn, cfg=cfg), batch_format="pyarrow", batch_size=cfg.batch_size)
        ds = ds.map_batches(ScoreChain,
                            fn_constructor_kwargs={"cfg": cfg, "num_buckets": max(64, NUM_CPUS * 4)},
                            batch_format="pyarrow", batch_size=cfg.batch_size,
                            concurrency=(max(1, NUM_CPUS // 4), NUM_CPUS))
        if stage == "rowwise":
            return ds
        ds = ds.groupby("bucket").map_groups(partial(run_conv_checks_arrow, cfg=cfg),
                                             batch_format="pyarrow")
        return ds  # stage == "conv"

    runs = []
    for _ in range(2):  # 2nd run = steady state
        t0 = time.perf_counter()
        ds = build(rd.read_parquet(corpus))
        if stage == "write":
            out = "/tmp/titan_ray_stage_out"
            shutil.rmtree(out, ignore_errors=True)
            ds.write_parquet(out)
        else:
            ds.count()
        runs.append(time.perf_counter() - t0)
    ray.shutdown()
    return {"stage": stage, "num_cpus": NUM_CPUS, "sec": round(min(runs), 3)}


def run_stages() -> dict:
    """Per-stage scaling table: every stage-prefix pipeline at lo vs hi
    num_cpus in fresh processes (round-2 verdict item: show WHICH stage
    bounds the whole-pipeline scaling, with the DRAM probe alongside)."""
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    sf_dir = os.environ.get("GRAFT_SCALING_SF_DIR", SF_DIR)

    def sub(stage: str, ncpu: int) -> float:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir,
                   GRAFT_STAGE=stage)
        out = subprocess.run([sys.executable, os.path.abspath(__file__), "--stage-run"],
                             env=env, capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])["sec"]

    table = {}
    for stage in STAGES:
        s_lo, s_hi = sub(stage, lo), sub(stage, hi)
        table[stage] = {
            "sec_lo": s_lo, "sec_hi": s_hi,
            "efficiency": round((s_lo / s_hi) / (hi / lo), 3),
        }
    return {"metric": "per_stage_scaling", "num_cpus_lo": lo, "num_cpus_hi": hi,
            "sf_dir": sf_dir, "stages": table}


def run_bandwidth_probe() -> dict:
    """Hardware control experiment: scale the scorer kernel with PLAIN
    multiprocessing (no Ray) at 1 / lo / hi processes. On a single host,
    vCPUs share one memory subsystem — this measures the DRAM ceiling that
    bounds ANY implementation of the bandwidth-bound scorer stage, giving
    the denominator for hardware-relative scaling efficiency. On a real
    N- vs 4N-node cluster each node adds bandwidth and this ceiling lifts."""
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    thr1, thr_lo, thr_hi = (_probe_calls_per_sec(n) for n in (1, lo, hi))
    return {
        "metric": "bandwidth_ceiling",
        "value": round(thr_hi / thr_lo, 3),
        "unit": "x_speedup_lo_to_hi",
        "calls_per_sec": {"1": round(thr1, 1), str(lo): round(thr_lo, 1), str(hi): round(thr_hi, 1)},
        "note": "plain multiprocessing, no Ray — the hardware max for the scorer stage",
    }


_PROBE_CALLS = 6


def _probe_work(_i):
    import titan_ray  # noqa: F401  (tune_malloc)
    from titan_ray.corpus import generate_corpus
    from titan_ray.functions.features import compute_core_features

    t = generate_corpus(8192, seed=1, mega=False)
    texts = t["text"].combine_chunks()[:4096]
    compute_core_features(texts[:100])
    for _ in range(_PROBE_CALLS):
        compute_core_features(texts)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--bandwidth-probe" in sys.argv:
        print(json.dumps(run_bandwidth_probe()))
    elif "--stages" in sys.argv:
        print(json.dumps(run_stages()))
    elif "--stats" in sys.argv:
        run_stats()
    elif "--stage-run" in sys.argv:
        print(json.dumps(run_stage(os.environ.get("GRAFT_STAGE", "read"))))
    else:
        print(json.dumps(run_bench()))
