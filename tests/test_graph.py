"""ops/graph.py: connected components, dup clustering, PageRank.

Oracles here are tiny pure-Python twins (BFS / dense-matrix power
iteration); the driver-visible DuckDB oracles (recursive CTE, unrolled
SQL PageRank) live in __spark_entry__.py.
"""

import numpy as np
import pytest

from cianparser_spark.ops import graph


def _cc_bfs(edges):
    """Sequential union of BFS trees — the trivially-correct twin."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, out = set(), {}
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        root = min(comp)
        for u in comp:
            out[u] = root
    return out


@pytest.mark.parametrize("edges", [
    # chain of 17 — worst case for plain min-propagation (diameter 16);
    # pointer jumping must close it well inside _MAX_CC_ROUNDS
    [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(16)],
    # two cliques + a bridge + an isolated self-loop
    [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"),
     ("c", "x"), ("q", "q")],
    # star with reversed edge directions (symmetrization)
    [(f"leaf{i}", "hub") for i in range(10)],
])
def test_connected_components_vs_bfs(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"]
           for r in graph.connected_components(df).collect()}
    assert got == _cc_bfs(edges)


def test_dup_clusters_bridges_keys(spark):
    # i1/i2 share a phash; i2/i3 share a caption -> one cluster of 3.
    rows = [
        ("i1", 10, "cap_a"), ("i2", 10, "cap_b"), ("i3", 11, "cap_b"),
        ("i4", 12, "cap_c"),                       # singleton
        ("i5", 13, "cap_d"), ("i6", 13, "cap_d"),  # pair on both keys
    ]
    df = spark.createDataFrame(rows, ["image_id", "phash", "caption"])
    got = {r["image_id"]: r["cluster_id"]
           for r in graph.dup_clusters(df).collect()}
    assert got == {"i1": "i1", "i2": "i1", "i3": "i1",
                   "i4": "i4", "i5": "i5", "i6": "i5"}


def _pagerank_dense(edges, iters=5, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = {u: 0 for u in nodes}
    for a, _ in edges:
        out[a] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dang = sum(r[idx[u]] for u in nodes if out[u] == 0)
        for a, b in edges:
            nxt[idx[b]] += r[idx[a]] / out[a]
        r = (1.0 - d) / n + d * (nxt + dang / n)
    return dict(zip(nodes, r))


def test_pagerank_vs_dense(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "c")]  # d dangling-free, e absent; c is the hub
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, iters=5).collect()}
    want = _pagerank_dense(edges)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_mass(spark):
    # b has no outlinks: its rank must be redistributed, sum stays 1.
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, iters=3).collect()}
    want = _pagerank_dense([("a", "b")], iters=3)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_bench_graph_small(spark):
    """The microbench's closed-form ground truth holds at small scale
    (chain blocks + random-tree blocks + cycle edges)."""
    from cianparser_spark.bench_graph import run_bench

    out = run_bench(spark, n_nodes=2048, pr_iters=2, partitions=8)
    assert out["cc_mismatches"] == 0
    assert abs(out["pr_rank_sum"] - 1.0) < 1e-9
    assert out["n_edges"] > 2048  # tree edges + cycle extras


def test_tile_stats_matches_sequential(spark, tmp_run_dir):
    from cianparser_spark.corpus import imaging, webgen
    from cianparser_spark.engine import payload
    from cianparser_spark.ops.multimodal import tile_grid, tile_stats

    n = 24
    images = payload.build_images_table(
        spark, tmp_run_dir + "/images.parquet", n=n, partitions=2)
    got = {(r["image_id"], r["tile_y"], r["tile_x"]):
           (r["mean_luma"], r["std_luma"])
           for r in tile_stats(images, tile=32).collect()}
    want = {}
    for i in range(n):
        row = webgen.image_row(i)
        px = imaging.decode(row["bytes"], row["fmt"])
        for t in tile_grid(px, 32):
            want[(row["image_id"], t["tile_y"], t["tile_x"])] = (
                t["mean_luma"], t["std_luma"])
    assert got == want  # float64 numpy both sides: bit-identical


def test_dup_clusters_null_keys_do_not_match(spark):
    """NULL keys mean "value missing", never "equal to other missing
    values": two images with null phash and distinct captions stay
    separate clusters, and a row with ALL keys null still appears in
    the output (as its own singleton)."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("phash", T.LongType(), True),
        T.StructField("caption", T.StringType(), True),
    ])
    rows = [("i1", None, "cap_a"), ("i2", None, "cap_b"),
            ("i3", None, None), ("i4", 5, "cap_a")]
    df = spark.createDataFrame(rows, schema)
    got = {r["image_id"]: r["cluster_id"]
           for r in graph.dup_clusters(df).collect()}
    assert got == {"i1": "i1", "i2": "i2", "i3": "i3", "i4": "i1"}
