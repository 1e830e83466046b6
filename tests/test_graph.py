"""PageRank / TextRank tests: pure-Python reference equality, dangling-mass
conservation, symmetric-graph sanity."""

from eva_opentargets_spark.operators.graph import bigram_graph, pagerank, textrank

E_SCHEMA = "src string, dst string, weight double"


def _py_pagerank(edges, n_iter=3, d=0.85):
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for s, t, w in edges:
            contrib[t] += pr[s] * w / outw[s]
        dmass = sum(pr[v] for v in nodes if v not in outw)
        pr = {v: (1 - d) / n + d * (contrib[v] + dmass / n) for v in nodes}
    return {v: round(p, 6) for v, p in pr.items()}


def test_pagerank_matches_python_reference_with_dangling(spark):
    edges = [
        ("a", "b", 1.0),
        ("a", "c", 2.0),
        ("b", "c", 1.0),
        ("c", "d", 1.0),  # d is dangling: no out-edges
        ("e", "a", 1.0),  # e has no in-edges
    ]
    df = spark.createDataFrame(edges, E_SCHEMA)
    got = {r.node: r.rank for r in pagerank(df, n_iter=3).collect()}
    assert got == _py_pagerank(edges, n_iter=3)
    # mass conserved (dangling redistributed, not dropped)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_textrank_ranks_hub_word_highest(spark):
    """A word adjacent to everything outranks peripheral words."""
    rows = [
        (1, "hub alpha hub beta hub gamma hub delta"),
        (2, "alpha hub epsilon hub zeta"),
        (3, "unrelated pair"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ranks = {r.node: r.rank for r in textrank(docs).collect()}
    assert max(ranks, key=ranks.get) == "hub"
    # symmetric graph with no isolated nodes still conserves mass
    assert abs(sum(ranks.values()) - 1.0) < 1e-4


def test_bigram_graph_is_symmetric_weighted(spark):
    docs = spark.createDataFrame(
        [(1, "x y x y"), (2, "y x")], "doc_id long, text string"
    )
    w = {(r.src, r.dst): r.weight for r in bigram_graph(docs).collect()}
    # adjacencies: x-y x3 (doc1: xy, yx, xy), y-x x1 (doc2) -> 4 each way
    assert w == {("x", "y"): 4.0, ("y", "x"): 4.0}
