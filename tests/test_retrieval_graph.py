"""BM25/TF-IDF retrieval (kgloom/ops/retrieval.py) and graph analytics
(kgloom/ops/graph.py) — each checked against a straightforward pure-
Python reference implementation on small corpora/graphs."""

import math

import pytest

from kgloom.ops.graph import degree_summary, pagerank
from kgloom.ops.retrieval import bm25_scores, bm25_topk, tf_idf

DOCS = [
    (0, "spark join merge"),
    (1, "spark spark spark filter"),
    (2, "window sort window"),
    (3, "join join join join merge spark"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bm25(query, k1=1.2, b=0.75):
    """Reference BM25 (Lucene idf variant) over DOCS."""
    toks = [d[1].split(" ") for d in DOCS]
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks) / n
    scores = {}
    for term in sorted(set(query.split(" "))):
        df = sum(1 for t in toks if term in t)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for (doc_id, _), t in zip(DOCS, toks):
            tf = t.count(term)
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            scores[doc_id] = scores.get(doc_id, 0.0) + s
    return scores


def test_bm25_matches_reference(docs):
    got = {r.doc_id: r.score for r in
           bm25_scores(docs, "spark join").collect()}
    want = _py_bm25("spark join")
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-12)


def test_bm25_duplicate_query_terms_count_once(docs):
    a = {r.doc_id: r.score for r in
         bm25_scores(docs, "spark spark").collect()}
    b = {r.doc_id: r.score for r in bm25_scores(docs, "spark").collect()}
    assert a == b


def test_bm25_topk_order_and_tiebreak(docs):
    rows = bm25_topk(docs, "join", k=2).collect()
    want = sorted(_py_bm25("join").items(),
                  key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r.doc_id,) for r in rows] == [(d,) for d, _ in want]


def test_bm25_empty_query_raises(docs):
    with pytest.raises(ValueError):
        bm25_scores(docs, "   ")


def test_tf_idf(docs):
    rows = tf_idf(docs, terms=["spark", "window"]).collect()
    got = {(r.doc_id, r.term): (r.tf, r.df, r.tfidf) for r in rows}
    # 'spark' appears in docs 0,1,3 (df=3); 'window' only in 2 (df=1)
    assert got[(1, "spark")][0] == 3 and got[(1, "spark")][1] == 3
    assert got[(1, "spark")][2] == pytest.approx(3 * math.log(4 / 3))
    assert got[(2, "window")] == (2, 1, pytest.approx(2 * math.log(4.0)))
    assert (0, "merge") not in got  # restricted postings


EDGES = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]


def _py_pagerank(edges, d=0.85, iters=5):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += rank[s] / out[s]
        dangling = sum(rank[v] for v in nodes if v not in out)
        rank = {v: (1 - d) / n + d * (contrib[v] + dangling / n)
                for v in nodes}
    return rank


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_pagerank_matches_reference(edges):
    got = {r.node: r.rank for r in pagerank(edges).collect()}
    want = _py_pagerank(EDGES)
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_mass_conserved(spark):
    # 'c' is dangling; without redistribution total rank would decay
    e = spark.createDataFrame([("a", "c"), ("b", "c")],
                              "src string, dst string")
    got = {r.node: r.rank for r in pagerank(e, iterations=3).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    want = _py_pagerank([("a", "c"), ("b", "c")], iters=3)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_uniform_on_cycle(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")],
                              "src string, dst string")
    got = [r.rank for r in pagerank(e, iterations=4).collect()]
    assert all(x == pytest.approx(1 / 3, abs=1e-12) for x in got)


def test_degree_summary(edges):
    got = {r.node: (r.out_degree, r.in_degree)
           for r in degree_summary(edges).collect()}
    assert got == {"a": (2, 2), "b": (1, 1), "c": (1, 2), "d": (1, 0)}


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------

def _py_triangles(edges):
    """Brute-force per-node triangle counts over the induced undirected
    simple graph."""
    import itertools
    adj = {}
    for s, t in edges:
        if s == t:
            continue
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    counts = {v: 0 for v in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return counts


def test_triangle_count_matches_bruteforce(spark):
    from kgloom.ops.graph import triangle_count
    # two triangles sharing edge (a,b), a pendant, an isolated edge,
    # a duplicate edge, a reversed duplicate, and a self-loop
    raw = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "b"),
           ("d", "e"), ("x", "y"), ("b", "a"), ("a", "b"), ("e", "e")]
    e = spark.createDataFrame(raw, "src string, dst string")
    got = {r.node: r.n_triangles for r in triangle_count(e).collect()}
    assert got == _py_triangles(raw)
    # every graph node appears, zero-triangle ones included
    assert got["x"] == 0 and got["e"] == 0


def test_triangle_count_complete_graph(spark):
    from kgloom.ops.graph import triangle_count
    # K6: every node is in C(5,2) = 10 triangles (heavy tie-breaking:
    # all degrees equal, so orientation falls back to the name order)
    nodes = [f"n{i}" for i in range(6)]
    raw = [(a, b) for a in nodes for b in nodes if a < b]
    e = spark.createDataFrame(raw, "src string, dst string")
    got = {r.node: r.n_triangles for r in triangle_count(e).collect()}
    assert got == {n: 10 for n in nodes}


def test_triangle_count_triangle_free(spark):
    from kgloom.ops.graph import triangle_count
    # C4 (square) has no triangles
    raw = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    e = spark.createDataFrame(raw, "src string, dst string")
    got = {r.node: r.n_triangles for r in triangle_count(e).collect()}
    assert got == {v: 0 for v in "abcd"}


def test_shortest_paths_vs_dijkstra(spark):
    """Weighted SSSP (kgloom/ops/graph.py shortest_paths) against a
    driver-side Dijkstra on a random sparse digraph."""
    import heapq
    import random

    from kgloom.ops.graph import shortest_paths
    rng = random.Random(20260820)
    n = 120
    edges = {(f"n{rng.randrange(n)}", f"n{rng.randrange(n)}"):
             rng.randrange(1, 10) for _ in range(420)}
    edges = [(a, b, w) for (a, b), w in edges.items() if a != b]
    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))

    def dijkstra(srcs):
        dist = {s: 0 for s in srcs}
        pq = [(0, s) for s in srcs]
        heapq.heapify(pq)
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, float("inf")):
                continue
            for v, w in adj.get(u, []):
                if d + w < dist.get(v, float("inf")):
                    dist[v] = d + w
                    heapq.heappush(pq, (d + w, v))
        return dist

    srcs = ["n0", "n7"]
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    s = spark.createDataFrame([(x,) for x in srcs], "node string")
    got = {r.node: r.dist for r in
           shortest_paths(e, s, weight="w", max_rounds=50).collect()}
    assert got == dijkstra(srcs)


def test_shortest_paths_hop_distance_matches_bfs(spark):
    from kgloom.ops.graph import bfs_levels, shortest_paths
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("x", "y")]
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([("a",)], "node string")
    sp = {r.node: r.dist for r in
          shortest_paths(e, s, directed=False).collect()}
    bf = {r.node: r.level for r in
          bfs_levels(e, s, directed=False).collect()}
    assert sp == bf
    assert "x" not in sp  # unreachable nodes are absent


def test_shortest_paths_early_stop_and_parallel_edges(spark):
    from kgloom.ops.graph import shortest_paths
    # parallel edges collapse to the cheapest; max_rounds generous
    edges = [("a", "b", 5), ("a", "b", 2), ("b", "c", 1)]
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    s = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.dist for r in
           shortest_paths(e, s, weight="w", max_rounds=99).collect()}
    assert got == {"a": 0, "b": 2, "c": 3}


def test_reach_synopsis_exact_below_k(spark):
    """Chain a->b->c->d, x->y: with k far above every ball size the
    synopsis is complete and est == true ball size exactly."""
    from kgloom.ops.graph import reach_synopsis
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.est for r in
           reach_synopsis(e, radius=2, k=64).collect()}
    assert got == {"a": 3.0, "b": 3.0, "c": 2.0, "d": 1.0,
                   "x": 2.0, "y": 1.0}


def test_reach_synopsis_equals_true_ball_kmv(spark):
    """Mergeability: the folded synopsis must equal the KMV synopsis
    of the TRUE ball — checked on a random digraph with balls larger
    than k by replaying md5 arithmetic on driver-side reachability."""
    import hashlib
    import random

    from kgloom.ops.graph import reach_synopsis
    rng = random.Random(20260820)
    n, k, radius = 80, 8, 3
    edges = list({(f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
                  for _ in range(240)})
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)

    def ball(v, r):
        seen, frontier = {v}, {v}
        for _ in range(r):
            frontier = {u for x in frontier
                        for u in adj.get(x, ())} - seen
            seen |= frontier
        return seen

    def frac(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16) / 16**15

    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: (r.n_minima, r.est) for r in
           reach_synopsis(e, radius=radius, k=k).collect()}
    big = 0
    for v, (n_min, est) in got.items():
        fs = sorted(frac(x) for x in ball(v, radius))
        if len(fs) < k:
            assert (n_min, est) == (len(fs), float(len(fs))), v
        else:
            big += 1
            assert n_min == k and abs(est - (k - 1) / fs[k - 1]) < 1e-9, v
    assert big > 10  # the estimator branch was genuinely exercised
