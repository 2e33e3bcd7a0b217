"""Distributed PageRank over the near-duplicate candidate graph — the
canonical ITERATIVE distributed algorithm (join + aggregate per round),
expressed Ray-Data-first and bit-replayable in SQL.

Graph: the persisted LSH candidate pairs (stages/neardup.ensure_candidates
— the same artifact the exact-Jaccard oracle reads), symmetrized. Rank of
a doc in this graph = centrality inside its duplicate neighbourhood: high
rank marks template/boilerplate hubs that near-dup many documents — a
drop-priority signal pairwise dedup doesn't expose (reference analog: the
duplicate_check neighbourhood in read_data_to_check.r:121-143 flags pairs;
this ranks the whole neighbourhood structure).

Exactness: damped power iteration in scaled-integer arithmetic — rank is
int nano-units (R = 1e9), each round is
    r'(v) = floor(0.15 * R) + (850 * Σ_{u→v} floor(r(u) / deg(u))) // 1000
— floor divisions and integer sums only, so any partial/merge order gives
the identical result and the DuckDB twin (the K rounds unrolled as chained
CTEs over the same parquet) hash-matches bit-for-bit.

Scale shape: the honest PageRank loop — the static edge list (with
out-degree folded in once) is co-partitioned with the node-sized rank
table via ONE hash_join per round, contributions collapse in a groupby(dst)
sum, and each round's rank table is materialized node-sized state. K rounds
= K join+aggregate exchanges; nothing is ever driver-sized. int64 bound:
contributions sum to <= R * in_deg(v) * 850 — promote R down or the sums to
HUGEINT-style split accumulation past in-degrees of ~1e7.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PR_R = 1_000_000_000          # rank scale (nano-units)
PR_DAMP_NUM = 850             # damping 0.85 as the rational 850/1000
PR_BASE = (1000 - PR_DAMP_NUM) * PR_R // 1000
PR_ITERS = 5


def doc_pagerank(sf_dir: str, iters: int = PR_ITERS, num_buckets: int = 64):
    """(doc_id, rank_nano) for every node of the symmetrized candidate
    graph after ``iters`` damped integer power-iteration rounds."""
    import pyarrow.parquet as pq

    from .neardup import ensure_candidates

    return pagerank_from_pairs(pq.read_table(ensure_candidates(sf_dir)),
                               iters=iters, num_buckets=num_buckets)


def pagerank_from_pairs(pairs: pa.Table, iters: int = PR_ITERS, num_buckets: int = 64):
    """PageRank kernel over an undirected pair list (doc_a, doc_b)."""
    import ray.data as rd

    from .joins import hash_join

    a = pairs["doc_a"].to_numpy(zero_copy_only=False)
    b = pairs["doc_b"].to_numpy(zero_copy_only=False)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    uniq, counts = np.unique(src, return_counts=True)
    deg = np.repeat(counts, counts)   # out-degree folded into the edge list
    edges = rd.from_arrow(pa.table(
        {"s": pa.array(src), "d": pa.array(dst), "deg": pa.array(deg.astype(np.int64))}
    ))
    ranks = rd.from_arrow(pa.table(
        {"s": pa.array(uniq), "r": pa.array(np.full(len(uniq), PR_R, dtype=np.int64))}
    ))

    def contrib(batch: pa.Table) -> pa.Table:
        c = batch["r_r"].to_numpy(zero_copy_only=False) // batch["deg"].to_numpy(zero_copy_only=False)
        return pa.table({"d": batch["d"], "c": pa.array(c)})

    def finish(batch: pa.Table) -> pa.Table:
        s = batch["sum(c)"].to_numpy(zero_copy_only=False)
        r = PR_BASE + (PR_DAMP_NUM * s) // 1000
        return pa.table({"s": batch["d"], "r": pa.array(r.astype(np.int64))})

    for _ in range(iters):
        joined = hash_join(edges, ranks, on="s", right_cols=("r",), num_buckets=num_buckets)
        ranks = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("d")
            .sum("c")
            .map_batches(finish, batch_format="pyarrow")
            .materialize()   # node-sized state per round, never driver-sized
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["s"], "rank_nano": batch["r"]})

    return ranks.map_batches(rename, batch_format="pyarrow")


def pagerank_sql(sf: float = 0.01, iters: int = PR_ITERS) -> str:
    """DuckDB replay: the K rounds unrolled as chained CTEs over the same
    persisted candidate parquet (neardup_sql convention)."""
    from .neardup import candidates_path

    path = candidates_path(sf)
    ctes = [
        f"pairs AS (SELECT doc_a, doc_b FROM read_parquet('{path}'))",
        "edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs "
        "UNION ALL SELECT doc_b, doc_a FROM pairs)",
        "deg AS (SELECT s, count(*) AS deg FROM edges GROUP BY s)",
        f"r0 AS (SELECT s AS v, CAST({PR_R} AS HUGEINT) AS r FROM deg)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"r{k} AS (SELECT e.d AS v, "
            f"{PR_BASE} + ({PR_DAMP_NUM} * sum(r{k-1}.r // deg.deg)) // 1000 AS r "
            f"FROM edges e JOIN deg USING (s) JOIN r{k-1} ON r{k-1}.v = e.s "
            "GROUP BY e.d)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT v AS doc_id, CAST(r AS BIGINT) AS rank_nano FROM r{iters}"
    )
