"""Graph-operator throughput microbench: connected components +
PageRank over a deterministic synthetic graph at 10^6-node scale.

The dup-clustering contract query (`payload_dup_clusters`) proves
correctness at corpus scale; THIS bench runs the same operators
(ops/graph.py — the production code, not a bench rewrite) on a graph
three orders of magnitude larger, with an exact distributed
ground-truth check:

* nodes 0..N-1 are partitioned into fixed blocks of ``S`` nodes;
* every non-root node gets one tree edge to a pseudo-random EARLIER
  node in its own block (xxhash64-derived, pure Catalyst — the graph
  is generated distributed, never on the driver);
* every 7th block is a CHAIN (node i → i-1): diameter S-1, the
  worst case plain min-propagation would need S-1 rounds for and the
  pointer-jumping step closes in O(log S);
* a quarter of the nodes add one extra intra-block edge (cycles).

Ground truth is closed-form — component(node) = block root
(node - node % S) — so verification is a full distributed compare
(count of mismatching labels, must be 0), not a sample.

PageRank runs ``pr_iters`` iterations on the same edge set; its
invariant (Σrank = 1 exactly, preserved by dangling redistribution)
is asserted to 1e-6.

At 10^10 nodes the same plans hold: generation is embarrassingly
parallel, every CC round is an equi-join + groupBy-min on the node
key, and per-round lineage truncation keeps plans O(1) deep.
"""
from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOCK = 16          # nodes per component block
CHAIN_EVERY = 7     # every 7th block is a worst-case chain
EXTRA_MOD = 4       # 1/4 of nodes add a cycle edge


def synth_graph(spark: SparkSession, n_nodes: int,
                partitions: int = 32) -> DataFrame:
    """Deterministic (src, dst) edge list, generated executor-side with
    pure Catalyst expressions (xxhash64) — no driver data, no Python."""
    nodes = spark.range(0, n_nodes, 1, partitions).withColumn(
        "base", F.col("id") - (F.col("id") % F.lit(BLOCK)))
    non_root = nodes.where(F.col("id") > F.col("base"))
    chain_block = (F.col("base") / BLOCK).cast("long") % CHAIN_EVERY == 0
    tree = non_root.select(
        F.col("id").alias("src"),
        F.when(chain_block, F.col("id") - 1)
        .otherwise(F.col("base") + F.pmod(F.xxhash64("id"),
                                          F.col("id") - F.col("base")))
        .alias("dst"))
    extra = (
        non_root.where(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(EXTRA_MOD)) == 0)
        .select(F.col("id").alias("src"),
                (F.col("base") + F.pmod(F.xxhash64("id", F.lit(2)),
                                        F.col("id") - F.col("base"))).alias("dst"))
    )
    # self-edges for block roots: CC derives its node set from edges,
    # and a truncated final block (n_nodes % BLOCK == 1) would
    # otherwise leave its root edgeless — silently absent from the
    # output and from the ground-truth compare
    roots = nodes.where(F.col("id") == F.col("base")).select(
        F.col("id").alias("src"), F.col("id").alias("dst"))
    return tree.union(extra).union(roots)


def run_bench(spark: SparkSession, n_nodes: int = 1_000_000,
              pr_iters: int = 3, partitions: int = 32) -> dict:
    from cianparser_spark.ops.graph import connected_components, pagerank

    edges = synth_graph(spark, n_nodes, partitions).persist()
    n_edges = edges.count()

    t0 = time.time()
    comp = connected_components(edges)
    n_labeled = comp.count()
    mismatches = comp.where(
        F.col("component") != F.col("node") - (F.col("node") % F.lit(BLOCK))
    ).count()
    cc_wall = time.time() - t0
    assert n_labeled == n_nodes, (
        f"CC lost nodes: {n_labeled} labeled of {n_nodes}")

    t0 = time.time()
    ranks = pagerank(edges, iters=pr_iters)
    rank_sum = ranks.agg(F.sum("rank")).collect()[0][0]
    pr_wall = time.time() - t0
    edges.unpersist()

    assert mismatches == 0, f"CC produced {mismatches} wrong labels"
    assert abs(rank_sum - 1.0) < 1e-6, f"PageRank mass leaked: {rank_sum}"
    return {
        "n_nodes": n_nodes,
        "n_edges": int(n_edges),
        "cc_wall_s": round(cc_wall, 2),
        "cc_nodes_per_sec": round(n_nodes / cc_wall),
        "cc_mismatches": int(mismatches),
        "pr_iters": pr_iters,
        "pr_wall_s": round(pr_wall, 2),
        "pr_node_iters_per_sec": round(n_nodes * pr_iters / pr_wall),
        "pr_rank_sum": rank_sum,
    }


def main() -> None:
    import argparse
    import json

    from cianparser_spark.engine.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--pr-iters", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark(app_name="bench_graph", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    out = run_bench(spark, n_nodes=args.nodes, pr_iters=args.pr_iters,
                    partitions=args.cpus)
    print(json.dumps({"cpus": args.cpus, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
