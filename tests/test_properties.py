"""Property-based invariants (hypothesis) for the round-4 training
ops: structural guarantees that must hold on ANY input, not just the
unit-test fixtures.  Strategies are kept small (Spark job per example
is expensive); hypothesis still explores the shrink-relevant corners
(empty-ish graphs, self-loops, duplicate triples, literal objects)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ENT = st.sampled_from(["<a>", "<b>", "<c>", "<d>", "<e>"])
PRED = st.sampled_from(["<p>", "<q>"])
OBJ = st.sampled_from(["<a>", "<b>", "<c>", '"lit1"', '"lit2"'])

_settings = settings(max_examples=12, deadline=None,
                     suppress_health_check=[
                         HealthCheck.function_scoped_fixture])


@given(st.lists(st.tuples(ENT, PRED, OBJ), min_size=1, max_size=12))
@_settings
def test_negative_samples_invariants(spark, rows):
    from kgloom.ops.negatives import entity_index, negative_samples
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj string")
    ents = {r.entity: r.idx for r in entity_index(triples).collect()}
    # vocabulary: dense 0..n-1, subjects + IRI objects only
    want = {s for s, _, _ in rows} | {
        o for _, _, o in rows if not o.startswith('"')}
    assert set(ents) == want
    assert sorted(ents.values()) == list(range(len(want)))
    out = negative_samples(triples, n_neg=2).collect()
    distinct = {(s, p, o) for s, p, o in rows}
    assert len(out) == 2 * len(distinct)
    for r in out:
        assert r.neg_obj in ents            # drawn from the vocabulary
        assert r.is_positive == ((r.subj, r.pred, r.neg_obj) in distinct)


@given(st.lists(st.tuples(ENT, ENT), min_size=1, max_size=10))
@_settings
def test_random_walk_steps_are_edges(spark, pairs):
    from kgloom.ops.graph import random_walks
    edges = spark.createDataFrame(pairs, "src string, dst string")
    und = {(a, b) for a, b in pairs if a != b}
    und |= {(b, a) for a, b in und}
    if not und:
        return  # only self-loops: no graph, nothing to walk
    out = random_walks(edges, n_walks=1, walk_len=2)
    rows = sorted(map(tuple, out.collect()),
                  key=lambda t: (t[0], t[1], t[2]))
    walks = {}
    for (start, w, step, node) in rows:
        walks.setdefault((start, w), {})[step] = node
    nodes = {a for a, _ in und}
    assert {s for (s, _) in walks} == nodes   # a walk from every node
    for (start, _), path in walks.items():
        assert path[0] == start
        for i in range(1, max(path) + 1):
            assert (path[i - 1], path[i]) in und   # every hop an edge


@given(st.lists(st.tuples(ENT, ENT), min_size=1, max_size=10),
       st.integers(min_value=1, max_value=3))
@_settings
def test_k_core_is_maximal_and_sound(spark, pairs, k):
    from kgloom.ops.graph import k_core
    edges = spark.createDataFrame(pairs, "src string, dst string")
    got = {r.node: r.degree for r in k_core(edges, k=k).collect()}
    # soundness: every surviving node keeps degree >= k INSIDE the core
    und = {(a, b) for a, b in pairs if a != b}
    und |= {(b, a) for a, b in und}
    for n, d in got.items():
        nbrs = {b for (a, b) in und if a == n and b in got}
        assert len(nbrs) == d >= k
    # maximality vs the reference peel
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
    alive = set(adj)
    while True:
        drop = {n for n in alive
                if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    assert set(got) == alive


@given(st.lists(st.tuples(ENT, PRED, OBJ), min_size=1, max_size=12),
       st.permutations(["<a>", "<b>", "<c>", "<d>", "<e>"]))
@_settings
def test_wl_isomorphism_invariance(spark, rows, perm):
    """WL colors are a pure function of structure + literal leaves:
    renaming every IRI node by a permutation maps each node's color to
    the renamed node unchanged (color0 is uniform over resources), so
    the color HISTOGRAM of any graph is isomorphism-invariant —
    including under self-loops, duplicate edges (deduped first: the
    op's documented triple-set precondition), and literal objects."""
    from kgloom.ops.canonical import wl_colors
    f = dict(zip(["<a>", "<b>", "<c>", "<d>", "<e>"], perm))
    rows = sorted(set(rows))
    ren = [(f[s], p, o if o.startswith('"') else f[o])
           for s, p, o in rows]
    ddl = "subj string, pred string, obj string"
    c1 = {r.node: r.color for r in wl_colors(
        spark.createDataFrame(rows, ddl), iterations=2).collect()}
    c2 = {r.node: r.color for r in wl_colors(
        spark.createDataFrame(ren, ddl), iterations=2).collect()}
    for n, col in c1.items():
        mapped = n if n.startswith('"') else f[n]
        assert c2[mapped] == col, (n, mapped)
