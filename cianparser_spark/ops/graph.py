"""Distributed graph operators over the crawl corpus.

A web-scale crawl is a graph workload twice over: the *link graph*
(list pages → offer pages → breadcrumbs back) drives prioritization,
and the *duplicate graph* (images equal under phash, captions equal
under normalization) drives payload dedup.  The reference walks both
implicitly — its seen-set loop (cianparser/base_list.py:74-104) is a
sequential union-find over first-seen offer ids — so these are the
reference's semantics re-expressed as the two canonical distributed
graph algorithms:

* ``connected_components`` — iterative min-label propagation with a
  pointer-jumping (path-halving) step, so rounds are O(log n) instead
  of O(diameter).  Everything is equi-joins + groupBy-min: shuffles on
  the node key only, no driver-side data, one scalar convergence
  count per round.  Lineage is truncated per round with an eager
  ``localCheckpoint`` (on a real cluster: checkpoint to the job's
  reliable scratch so a lost executor replays one round, not all).
* ``dup_clusters`` — builds the duplicate graph in its *hub-contracted*
  form: per equality key (phash, caption, …) each row gets ONE edge to
  the group minimum, so the edge count is linear in rows (never
  quadratic in group size — a 10^6-image duplicate cluster is 10^6
  edges, not 10^12) and the contracted component diameter is ≤ 2×keys,
  making CC converge in 2-3 rounds regardless of data size.
* ``pagerank`` — fixed-iteration damped PageRank with dangling-mass
  redistribution.  Per iteration: one shuffle (groupBy dst) plus a
  broadcast of the 1-row dangling aggregate; ranks/degrees stay
  co-partitioned on the node key across iterations.

At 10^10 URLs / 10^9 images these plans are shuffle-bound on the node
key with uniform hash partitioning; skewed in-degree (a hub page every
list page links) only concentrates a *sum* (map-side partial
aggregation absorbs it), never a join fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Safety valve, not a tuning knob: the duplicate graph converges in
# 2-3 rounds; a general graph in O(log n).  50 rounds ≈ n=2^50 nodes.
_MAX_CC_ROUNDS = 50


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.union(rev).where(F.col("src").isNotNull() & F.col("dst").isNotNull()).distinct()


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """Connected components of the undirected graph given by ``edges``.

    Returns (node, component) where ``component`` is the minimum node
    id in the component under the id column's natural ordering (for
    zero-padded string ids like ``img00000042`` that coincides with
    numeric order).

    Algorithm: min-label propagation + pointer jumping.  Each round
      1. every node takes the min of its own label and its neighbors'
         labels (equi-join edges⋈labels, groupBy-min — one shuffle);
      2. every node replaces its label by its *label's* label
         (labels⋈labels self-join — path halving, the step that turns
         O(diameter) rounds into O(log n));
      3. a single scalar count of changed labels decides convergence
         (one tiny driver value per round, never row data).

    Two scale refinements, both fixpoint-preserving: the symmetrized
    edge table is cached hash-partitioned on the join key (only the
    label side shuffles per round), and after round 1 only CHANGED
    labels emit messages — min aggregation is monotone, so a label
    already broadcast and unchanged has been incorporated by every
    neighbor; each decrease re-triggers a broadcast, so the fixpoint
    (all neighbors label-equal, every label self-rooted by the jump
    step) is exactly the per-component minimum.
    """
    # materialize the symmetrized edge set ONCE, hash-partitioned on
    # the join key and CACHED (not checkpointed: the InMemoryRelation
    # keeps its outputPartitioning, so every round's edges⋈labels join
    # shuffles only the label side — the edge table never moves again;
    # on a real cluster this is the bucketed/pre-partitioned edge
    # table)
    und = _symmetrize(edges, src, dst).repartition("dst").persist()
    und.count()
    nodes = und.select(F.col("src").alias("node")).distinct()
    lbl = nodes.withColumn("label", F.col("node")).localCheckpoint(eager=True)

    # active-set propagation: min-label aggregation is monotone, so a
    # node whose label did not change since its last broadcast has
    # nothing new to tell its neighbors — only CHANGED labels emit
    # messages (round 1: everyone).  Shuffle volume collapses after the
    # first rounds while the fixpoint stays identical.
    active = lbl
    for _ in range(_MAX_CC_ROUNDS):
        nbr_min = (
            und.join(active.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src").agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "node")
        )
        stepped = (
            lbl.join(nbr_min, "node", "left")
            .select("node", F.col("label").alias("old_label"),
                    F.least("label", "nbr_label").alias("label"))
        )
        jump = lbl.select(F.col("node").alias("jnode"),
                          F.col("label").alias("jlabel"))
        # carry the round-start label through so convergence is a
        # cheap scan of the materialized result, not an extra join
        new_lbl = (
            stepped.join(jump, stepped["label"] == jump["jnode"], "left")
            .select("node",
                    F.least("label", "jlabel").alias("label"),
                    (F.least("label", "jlabel") != F.col("old_label"))
                    .alias("changed"))
            .localCheckpoint(eager=True)
        )
        changed = new_lbl.where("changed").count()
        lbl = new_lbl.select("node", "label")
        active = new_lbl.where("changed").select("node", "label")
        if changed == 0:
            break
    und.unpersist()
    return lbl.select("node", F.col("label").alias("component"))


def dup_clusters(images: DataFrame, id_col: str = "image_id",
                 keys: tuple[str, ...] = ("phash", "caption")) -> DataFrame:
    """Duplicate clustering: two images are duplicates if they agree on
    ANY of ``keys`` (exact phash match OR exact caption match by
    default), and clusters are the transitive closure — an image
    bridging a phash group and a caption group merges both.

    Mirrors the reference's first-seen dedup semantics
    (cianparser/base_list.py:74-104) lifted from one key to a key
    *union*: the cluster id is the minimum image id, i.e. the row the
    reference's sequential loop would have kept.

    Edge construction is hub-contracted (row → per-key group minimum),
    so edges are linear in rows and the contracted graph's diameter is
    bounded by the number of keys — CC converges in 2-3 rounds at any
    scale.  Returns (``id_col``, cluster_id) for every input row.
    """
    # self-edges first: every row appears in the output even when all
    # its keys are NULL (a null key matches nothing — null phash means
    # "no hash", not "equal to every other missing hash")
    edges = images.select(F.col(id_col).alias("src"),
                          F.col(id_col).alias("dst"))
    for key in keys:
        keyed = images.where(F.col(key).isNotNull())
        roots = keyed.groupBy(key).agg(F.min(id_col).alias("dst"))
        edges = edges.union(
            keyed.join(roots, key).select(F.col(id_col).alias("src"), "dst"))
    return (
        connected_components(edges)
        .select(F.col("node").alias(id_col),
                F.col("component").alias("cluster_id"))
    )


def pagerank(edges: DataFrame, iters: int = 5, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Damped PageRank over the directed graph, ``iters`` fixed
    iterations from a uniform start, dangling mass redistributed
    uniformly each iteration (the standard formulation, Page et al.
    1999).  Returns (node, rank) with Σrank = 1 preserved exactly.

    Plan shape per iteration: contribs = edges ⋈ ranks ⋈ out-degree,
    groupBy(dst) sum — a single shuffle on the node key (degrees and
    ranks stay co-partitioned); the dangling-rank total is a 1-row
    aggregate cross-joined back (broadcast, no collect).  The node
    count is materialized once up front (one scalar).  Lineage is cut
    per iteration with an eager localCheckpoint, so the plan stays
    O(1) deep regardless of ``iters``.
    """
    # materialized once, hash-partitioned on the per-iteration join key
    # and cached so the edge side of contribs never re-shuffles (same
    # rationale as connected_components' partitioned edge cache)
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct().repartition("src").persist())
    e.count()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(
        F.count("*").cast("double").alias("odeg")).withColumnRenamed("src", "node")
    # ranks carries the STATIC out-degree through every iteration, so
    # the per-iteration plan is ONE shuffle join (edges ⋈ ranks) + one
    # co-keyed left join — the degree join happens once, here, and the
    # dangling aggregate becomes a scan of the materialized frame
    # instead of a join
    ranks = (
        nodes.join(outdeg, "node", "left")
        .localCheckpoint(eager=True)
    )
    n = ranks.count()
    if n == 0:
        e.unpersist()
        return ranks.select("node", F.lit(0.0).alias("rank"))
    ranks = ranks.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)

    for _ in range(iters):
        dangling = (
            ranks.where(F.col("odeg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        )
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .where(F.col("odeg").isNotNull())
            .select("dst", (F.col("rank") / F.col("odeg")).alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            ranks.select("node", "odeg").join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node", "odeg",
                (F.lit((1.0 - damping) / n)
                 + F.lit(damping) * (F.coalesce(F.col("contrib"), F.lit(0.0))
                                     + F.col("dang") / F.lit(float(n)))
                 ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return ranks.select("node", "rank")
