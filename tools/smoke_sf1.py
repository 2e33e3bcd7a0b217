"""sf1.0 smoke for the round-3/4 operators (round-3 verdict item 9).

Runs embedding_kmeans / semantic_dedup / doc_top_tfidf / doc_token_shards
plus the round-4 ops (doc_dup_spans / doc_lm_fluency / doc_hash_split)
once at 10x the bench corpus scale and records wall time + driver peak RSS,
confirming the driver-side-small-state claims hold (k x d centroid ints,
vocabulary-sized df table, O(n_buckets) shard offsets): driver memory must
stay flat while data grows 10x.

Input: a deterministic 10x blow-up of the sf0.1 documents/embeddings tables
(doc/vec ids offset per copy; texts get a per-copy tag word so the corpus
isn't a degenerate 10x duplicate; embeddings get seeded unit-scale noise).
Cached under /tmp/titan_ray_smoke/sf1.0.

Usage (exclusive box): python tools/smoke_sf1.py
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SMOKE_DIR = "/tmp/titan_ray_smoke/sf1.0"
SRC_DIR = "/root/testdata/sf0.1"
COPIES = 10
SMOKE_VERSION = "v3"  # v3: + part/supplier/region (FK-audit closure); v2: + events/relational


def ensure_tables() -> str:
    marker = os.path.join(SMOKE_DIR, "_SUCCESS")
    if os.path.exists(marker) and open(marker).read().strip() == SMOKE_VERSION:
        return SMOKE_DIR
    os.makedirs(SMOKE_DIR, exist_ok=True)
    docs = pq.read_table(f"{SRC_DIR}/documents.parquet")
    n = docs.num_rows
    parts = []
    for c in range(COPIES):
        ids = pa.array(docs["doc_id"].to_numpy(zero_copy_only=False) + c * n, type=pa.int64())
        texts = pa.array([f"{t} copytag{c}" for t in docs["text"].to_pylist()])
        t = docs.set_column(docs.column_names.index("doc_id"), "doc_id", ids)
        parts.append(t.set_column(t.column_names.index("text"), "text", texts))
    pq.write_table(pa.concat_tables(parts), f"{SMOKE_DIR}/documents.parquet")

    emb = pq.read_table(f"{SRC_DIR}/embeddings.parquet")
    m = emb.num_rows
    col = emb["embedding"].combine_chunks() if isinstance(emb["embedding"], pa.ChunkedArray) else emb["embedding"]
    mat = col.flatten().to_numpy(zero_copy_only=False).reshape(m, -1)
    rng = np.random.default_rng(42)
    parts = []
    for c in range(COPIES):
        ids = pa.array(emb["vec_id"].to_numpy(zero_copy_only=False) + c * m, type=pa.int64())
        pert = mat + (rng.normal(0, 0.02, mat.shape) if c else 0.0)
        t = emb.set_column(emb.column_names.index("vec_id"), "vec_id", ids)
        t = t.set_column(
            t.column_names.index("embedding"), "embedding",
            pa.array(list(pert.astype(mat.dtype)), type=col.type),
        )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{SMOKE_DIR}/embeddings.parquet")

    # events + relational tables: id-space offset per copy (per-user /
    # per-order structure preserved, key spaces disjoint across copies)
    def blow_up(name: str, offsets: dict[str, int]) -> None:
        src = pq.read_table(f"{SRC_DIR}/{name}.parquet")
        parts = []
        for c in range(COPIES):
            t = src
            for col, base in offsets.items():
                vals = t[col].to_numpy(zero_copy_only=False) + c * base
                t = t.set_column(t.column_names.index(col), col,
                                 pa.array(vals, type=src[col].type))
            parts.append(t)
        pq.write_table(pa.concat_tables(parts), f"{SMOKE_DIR}/{name}.parquet")

    ev = pq.read_table(f"{SRC_DIR}/events.parquet", columns=["event_id", "user_id"])
    n_ev = int(ev["event_id"].to_numpy(zero_copy_only=False).max()) + 1
    n_us = int(ev["user_id"].to_numpy(zero_copy_only=False).max()) + 1
    ok = int(pq.read_table(f"{SRC_DIR}/orders.parquet", columns=["o_orderkey"])["o_orderkey"].to_numpy(zero_copy_only=False).max()) + 1
    ck = int(pq.read_table(f"{SRC_DIR}/customer.parquet", columns=["c_custkey"])["c_custkey"].to_numpy(zero_copy_only=False).max()) + 1
    blow_up("events", {"event_id": n_ev, "user_id": n_us})
    blow_up("lineitem", {"l_orderkey": ok})
    blow_up("orders", {"o_orderkey": ok, "o_custkey": ck})
    blow_up("customer", {"c_custkey": ck})
    # small dimensions copied as-is: blown-up fact copies keep their
    # part/supplier/nation/region keys, so every FK edge stays closed
    for name in ("nation", "region", "part", "supplier"):
        pq.write_table(pq.read_table(f"{SRC_DIR}/{name}.parquet"),
                       f"{SMOKE_DIR}/{name}.parquet")
    with open(marker, "w") as f:
        f.write(SMOKE_VERSION + "\n")
    return SMOKE_DIR


def _consume(res) -> int:
    import pandas as pd

    if hasattr(res, "count") and not isinstance(res, (pa.Table, pd.DataFrame)):
        return res.count()
    return len(res)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sf_dir = ensure_tables()

    from titan_ray.pipelines import docqc, events, relational
    from titan_ray.stages import bpe, cluster, graph, multimodal, neardup

    ops = {
        "embedding_kmeans": cluster.embedding_kmeans,
        "semantic_dedup": cluster.semantic_dedup,
        "doc_top_tfidf": docqc.doc_top_tfidf,
        "doc_token_shards": docqc.doc_token_shards,
        # round-4 session ops: two-shuffle substring-dup signal, bigram-LM
        # broadcast bound, stateless hash split
        "doc_dup_spans": neardup.doc_dup_spans,
        "doc_lm_fluency": docqc.doc_lm_fluency,
        "doc_hash_split": docqc.doc_hash_split,
        # round-5: the join-fan-out-risk operators (round-4 verdict item 7)
        "events_asof": events.events_asof,
        "events_range": events.events_range,
        "tpch_revenue_by_nation": relational.tpch_revenue_by_nation,
        # round-5 session ops: threshold-broadcast quota, heavy hitters,
        # perplexity terciles (LM pipeline + hash_join + bounded histogram)
        "doc_source_quota": docqc.doc_source_quota,
        "events_topk_users": events.events_topk_users,
        "doc_ppl_buckets": docqc.doc_ppl_buckets,
        # round-5: PQ codebook train+assign and the ADC compressed scans
        "embedding_pq": cluster.embedding_pq,
        "ann_topk_pq": cluster.ann_topk_pq,
        "ann_topk_ivfpq": cluster.ann_topk_ivfpq,
        # round-5 closing session ops: dominance frontier, itemset pairs,
        # windowed COUNT DISTINCT, ordered path histogram — all claim
        # catalogue-/frontier-sized driver state; verify flat RSS at 10x
        "doc_skyline": docqc.doc_skyline,
        "events_cooccurrence": events.events_cooccurrence,
        "events_window_distinct": events.events_window_distinct,
        "events_top_paths": events.events_top_paths,
        # final-session ops: interval-union coverage (per-user cummax kernel),
        # simhash Hamming-ball pairs (band-bucket exchange + pair dedup)
        "events_interval_coverage": events.events_interval_coverage,
        "simhash_neardup_pairs": neardup.simhash_neardup_pairs,
        # closing batch: islands, semi-join, Q13/Q17, second moment, checksum
        "events_streaks": events.events_streaks,
        "tpch_order_priority": relational.tpch_order_priority,
        "tpch_cust_order_dist": relational.tpch_cust_order_dist,
        "tpch_small_qty_revenue": relational.tpch_small_qty_revenue,
        "doc_simpson_diversity": docqc.doc_simpson_diversity,
        "doc_compression_ratio": docqc.doc_compression_ratio,
        "corpus_checksum": docqc.corpus_checksum,
        # final: shared-scan multi-selection + dependent selection — driver
        # state is (targets x 257)-sized histograms, must stay flat at 10x
        "events_value_quartiles": events.events_value_quartiles,
        "events_value_mad": events.events_value_mad,
        # continuation batch: CUSUM recurrence (two grouped scans per
        # bucket), rank-transform Spearman (histogram-CDF driver state),
        # Gram power iteration (2,080-row driver matrix). doc_cosine_pairs
        # runs with max_df matched to this corpus's degenerate 41-word
        # vocabulary: pair work is sum_w C(df_w, 2), so on a corpus where
        # EVERY word is corpus-hot the prune is the operator (the DIMSUM
        # premise is a long-tail vocabulary); embedding_dbscan is excluded
        # like embedding_neardup — its exact eps-graph is the brute
        # baseline whose documented scale path is LSH/IVF blocking.
        "events_cusum_alarms": events.events_cusum_alarms,
        "doc_spearman": docqc.doc_spearman,
        "embedding_power_iteration": cluster.embedding_power_iteration,
        "doc_cosine_pairs": lambda sf: docqc.doc_cosine_pairs(sf, max_df=10_000),
        # closing session: k-core peel (edge-sized shrinking joins), sliding
        # median (O(rows x k) window scratch), FULL OUTER reconcile (two
        # narrow sides, one exchange), chi-squared grid (enum-sized driver
        # state), collocation lift (vocabulary-sized merges + margin joins)
        "graph_kcore": graph.graph_kcore,
        "events_window_median": events.events_window_median,
        "doc_embedding_reconcile": docqc.doc_embedding_reconcile,
        "doc_chi2_independence": docqc.doc_chi2_independence,
        "doc_collocations": docqc.doc_collocations,
        "doc_mix_interleave": docqc.doc_mix_interleave,
        # late closing ops: Boruvka forest (component coarsening over the
        # shared candidate artifact), greedy cooldown chains (pointer-jump
        # rounds), histogram-CDF percent rank, associative hull merges
        "graph_mst": graph.graph_mst,
        "events_throttle": events.events_throttle,
        "doc_percent_rank": docqc.doc_percent_rank,
        "doc_hull_points": docqc.doc_hull_points,
        # final closing ops: K-counter dictionary scan, symmetric-difference
        # filter audit, FK anti-join suite, limb-accumulated OLS moments
        "doc_term_hits": docqc.doc_term_hits,
        "doc_filter_disagreement": docqc.doc_filter_disagreement,
        "tpch_fk_audit": relational.tpch_fk_audit,
        "events_ols_slope": events.events_ols_slope,
        # continuation session: BPE trainer (k vocabulary-sized rounds,
        # driver state = <=num_buckets candidate rows per round) and the
        # encode join (narrow co-partitioned word-hash stream)
        "doc_bpe_merges": bpe.doc_bpe_merges,
        "doc_bpe_encode": bpe.doc_bpe_encode,
        "media_image_dhash": multimodal.media_image_dhash,
        "doc_quality_auc": docqc.doc_quality_auc,
        "events_ewma": events.events_ewma,
        # cross-split leakage: both gram sides corpus-scale, ONE bucket
        # exchange, per-doc groupby — driver holds nothing
        "doc_split_leakage": docqc.doc_split_leakage,
        # greedy set cover: k corpus passes, driver folds <= num_blocks
        # top-1 rows per round, covered set bounded by k x grams-per-doc
        "doc_set_cover": docqc.doc_set_cover,
        # sorted-neighborhood blocking: the global sort IS the exchange;
        # boundary fold <= num_batches narrow records
        "neardup_sorted_neighbors": neardup.neardup_sorted_neighbors,
        # fractional-epoch replication: pure fan-out, no exchange
        "doc_epoch_mix": docqc.doc_epoch_mix,
        # lang-pair vocabulary Jaccard: vocabulary-sized exchange only
        "lang_vocab_jaccard": docqc.lang_vocab_jaccard,
        # next-fit packing: narrow sort + two block passes; driver holds
        # num_blocks x (C+1) transfer tables
        "doc_pack_bins": docqc.doc_pack_bins,
        # full corpus-build composition: text never crosses the wire
        "doc_pretrain_build": docqc.doc_pretrain_build,
    }
    only = set(sys.argv[1:])
    if only:
        ops = {k: v for k, v in ops.items() if k in only}
    out = {}
    for name, fn in ops.items():
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024  # MiB
        t0 = time.perf_counter()
        rows = _consume(fn(sf_dir))
        sec = time.perf_counter() - t0
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        out[name] = {"rows": int(rows), "sec": round(sec, 2),
                     "driver_rss_mib_before": int(rss0), "driver_rss_mib_after": int(rss1)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"metric": "sf1_smoke", "sf_dir": sf_dir, "ops": out}))
    ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
