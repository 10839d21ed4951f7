"""Unit tests for operators/graph.pagerank — the fixed-iteration,
integer-pico-rank PageRank. A pure-Python reference implements the SAME
quantized recurrence, so equality is exact (no tolerances)."""

import math

from pyspark.sql import functions as F

from liq_stream_spark.operators.graph import SCALE, pagerank


def _ref_pagerank(n_nodes, edges, n_iters=3, damping=0.85):
    """The quantized recurrence in plain Python: BIGINT pico-ranks,
    floor(x + 0.5) half-up quantization — mirrors graph.pagerank."""
    m = float(10**SCALE)
    tele = math.floor((1.0 - damping) / float(n_nodes) * m + 0.5)
    r = {i: math.floor(1.0 / float(n_nodes) * m + 0.5) for i in range(n_nodes)}
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    for _ in range(n_iters):
        mass = {i: 0 for i in range(n_nodes)}
        for s, d in edges:
            mass[d] += math.floor(r[s] / deg[s] + 0.5)
        r = {
            i: math.floor(tele + damping * mass[i] + 0.5)
            for i in range(n_nodes)
        }
    return {i: r[i] / m for i in range(n_nodes)}


def _run(spark, n_nodes, edges, **kw):
    nodes = spark.createDataFrame(
        [(i,) for i in range(n_nodes)], "node_id long"
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(spark, nodes, e, **kw)
    return {r["node_id"]: (r["out_deg"], r["pr"]) for r in out.collect()}


def test_matches_python_reference_exactly(spark):
    edges = [(0, 1), (1, 0), (2, 1), (2, 0), (3, 2)]
    got = _run(spark, 5, edges)
    want = _ref_pagerank(5, edges)
    for i in range(5):
        assert got[i][1] == want[i], f"node {i}: {got[i][1]} != {want[i]}"
    # out-degrees: node 2 has 2, node 4 none
    assert got[2][0] == 2 and got[4][0] == 0


def test_isolated_node_settles_at_teleport_floor(spark):
    got = _run(spark, 4, [(0, 1), (1, 0)])
    # nodes 2,3 have no in-edges: pr = quantize(teleport)
    m = float(10**SCALE)
    tele = math.floor((1.0 - 0.85) / 4.0 * m + 0.5)
    assert got[2][1] == math.floor(tele + 0.5) / m
    assert got[3][1] == got[2][1]
    # the 2-cycle holds more mass than the teleport floor
    assert got[0][1] > got[2][1]


def test_rank_ordering_follows_in_link_mass(spark):
    # star: everyone points at node 0
    edges = [(i, 0) for i in range(1, 6)]
    got = _run(spark, 6, edges)
    assert all(got[0][1] > got[i][1] for i in range(1, 6))


def test_deterministic_under_repartition(spark):
    edges = [(i, (i * 7) % 9) for i in range(9) if i != (i * 7) % 9]
    nodes = spark.createDataFrame([(i,) for i in range(9)], "node_id long")
    e1 = spark.createDataFrame(edges, "src long, dst long")
    a = {
        r["node_id"]: r["pr"]
        for r in pagerank(spark, nodes, e1).collect()
    }
    b = {
        r["node_id"]: r["pr"]
        for r in pagerank(
            spark, nodes.repartition(7), e1.repartition(5)
        ).collect()
    }
    assert a == b


def test_empty_graph(spark):
    nodes = spark.createDataFrame([], "node_id long")
    e = spark.createDataFrame([], "src long, dst long")
    assert pagerank(spark, nodes, e).count() == 0


def test_open_graph_edges_to_unknown_vertices_are_dropped(spark):
    """ADVICE r5 (graph.py open-graph mass loss): an edge whose dst is
    not in `nodes` used to inflate its source's out-degree while its
    contribution silently vanished at the rank-update join — diluting
    the sibling edges. Closing the graph up front means the result is
    IDENTICAL to running on the pre-filtered edge list, and duplicate
    node rows don't multiply-count teleport mass."""
    nodes = spark.createDataFrame(
        [(0,), (1,), (2,), (2,)], "node_id long"  # dup vertex row
    )
    open_edges = spark.createDataFrame(
        # (0->99) dangles off the vertex set; (98->1) has unknown src
        [(0, 1), (0, 99), (1, 2), (2, 0), (98, 1)],
        "src long, dst long",
    )
    closed_edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    got = {
        r["node_id"]: (r["out_deg"], r["pr"])
        for r in pagerank(spark, nodes, open_edges).collect()
    }
    want = {
        r["node_id"]: (r["out_deg"], r["pr"])
        for r in pagerank(
            spark, nodes.distinct(), closed_edges
        ).collect()
    }
    assert got == want
    assert got[0][0] == 1  # 0->99 no longer counted in out_deg


def test_triangle_counts_on_known_graph(spark):
    from liq_stream_spark.operators.graph import triangle_counts

    # K4 on {0,1,2,3} (4 triangles, each vertex in 3) + pendant edge 3-4
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node_id"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # node 4 closes none


def test_triangle_counts_no_triangles(spark):
    from liq_stream_spark.operators.graph import triangle_counts

    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "id_a long, id_b long")
    assert triangle_counts(e).count() == 0


def test_large_graph_regime_bit_exact(spark):
    """r14: the edge-pin style is keyed on the vertex count vs the
    session broadcast threshold (small -> lazy checkpoint, AQE
    broadcasts the rank side; large -> repartition+sort+persist so the
    per-round SMJ streams the cache exchange- and sort-free). Forcing
    the large regime by disabling auto-broadcast must walk the exact
    same pico-rank vector."""
    edges = [(0, 1), (1, 0), (2, 1), (2, 0), (3, 2), (4, 0), (0, 4)]
    want = _run(spark, 6, edges)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = _run(spark, 6, edges)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert got == want
