"""Graph analytics over the KG edge table: degree-ordered triangle
counting (`kg_triangles`) and fixed-iteration PageRank (`kg_pagerank`)
— semantics pinned on hand-built graphs with known answers."""

import numpy as np
import pandas as pd
import pytest


def _edges_ds(pairs):
    import ray

    df = pd.DataFrame(pairs, columns=["src_id", "dst_id"])
    df["predicate"] = "p"
    df["weight"] = 1
    return ray.data.from_pandas(df)


def test_kg_triangles_k4_plus_pendant(ray_session):
    """K4 on {a,b,c,d} has 4 triangles, every K4 node in exactly 3;
    a pendant edge (d,e) adds none.  Directed duplicates / reverse edges /
    self-loops must not change the undirected count."""
    from nlp_series_relation_extraction_ray.pipelines.kg import kg_triangles

    k4 = [(u, v) for i, u in enumerate("abcd") for v in "abcd"[i + 1:]]
    noisy = k4 + [("b", "a"), ("c", "a"), ("e", "d"), ("a", "a")]
    got = (
        kg_triangles(_edges_ds(noisy))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"node": list("abcd"), "n_triangles": [3, 3, 3, 3]}
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_kg_triangles_two_components(ray_session):
    """Two disjoint triangles count independently; a square (4-cycle,
    no chord) contributes nothing."""
    from nlp_series_relation_extraction_ray.pipelines.kg import kg_triangles

    edges = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"),
             ("p", "q"), ("q", "r"), ("r", "s"), ("s", "p")]
    got = kg_triangles(_edges_ds(edges)).to_pandas()
    counts = dict(zip(got["node"], got["n_triangles"].astype(int)))
    assert counts == {n: 1 for n in "abcxyz"}


def _pagerank_reference(edges, damping, n_iter):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj = sorted(set(edges))
    outdeg = np.zeros(n)
    for u, _ in adj:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for u, v in adj:
            contrib[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        dangling = r[outdeg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return dict(zip(nodes, r))


@pytest.mark.parametrize("dense_threshold", [100_000, 0])
def test_kg_pagerank_matches_dense_reference(ray_session, dense_threshold):
    """Distributed fixed-iteration PageRank equals the dense power
    iteration (same damping/iterations/dangling handling) to float
    precision, on a graph with a hub, a dangling node, and a cycle —
    for BOTH physical plans (dense broadcast and shuffle-join fallback,
    forced via dense_threshold=0)."""
    from nlp_series_relation_extraction_ray.pipelines.kg import kg_pagerank

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("c", "d"),  # d is dangling (no out-edges)
             ("e", "a"), ("e", "c"), ("a", "b")]  # duplicate edge ignored
    got = kg_pagerank(
        _edges_ds(edges), damping=0.85, n_iter=5,
        dense_threshold=dense_threshold,
    ).to_pandas()
    want = _pagerank_reference(edges, 0.85, 5)
    assert set(got["node"]) == set(want)
    for _, row in got.iterrows():
        assert row["rank"] == pytest.approx(want[row["node"]], abs=1e-9)
    # ranks remain a distribution (mass conservation incl. dangling)
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-9)


def test_kg_pagerank_uniform_on_symmetric_cycle(ray_session):
    """On a directed cycle every node must keep exactly rank 1/n."""
    from nlp_series_relation_extraction_ray.pipelines.kg import kg_pagerank

    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    got = kg_pagerank(_edges_ds(cyc), n_iter=4).to_pandas()
    assert np.allclose(got["rank"], 0.25, atol=1e-12)


def test_kg_triangles_distributed_path_matches_local(ray_session):
    """small_edge_limit=0 forces the 6-stage distributed plan; it must be
    value-identical to the size-gated driver-local fast path."""
    from nlp_series_relation_extraction_ray.pipelines.kg import kg_triangles

    k4 = [(u, v) for i, u in enumerate("abcd") for v in "abcd"[i + 1:]]
    edges = k4 + [("e", "d"), ("x", "y"), ("y", "z"), ("x", "z")]
    local = kg_triangles(_edges_ds(edges)).to_pandas()
    dist = kg_triangles(_edges_ds(edges), small_edge_limit=0).to_pandas()
    key = lambda df: df.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(local), key(dist[local.columns]))


@pytest.mark.parametrize("small_edge_limit", [2_000_000, 0])
def test_kg_kcore_known_graph(ray_session, small_edge_limit):
    """K4 {a,b,c,d} is a 3-core; a triangle {d,e,f} hanging off it is a
    2-core; a pendant chain g-h off node a is the 1-core fringe.
    Self-loops and duplicate/reversed edges must not change anything.
    Both physical plans (driver-local peel and distributed phase peeling,
    forced via small_edge_limit=0) agree."""
    from nlp_series_relation_extraction_ray.pipelines.kg import kg_kcore

    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"),                      # K4
             ("d", "e"), ("e", "f"), ("f", "d"),  # triangle at d
             ("a", "g"), ("g", "h"),          # pendant chain
             ("b", "a"), ("a", "a")]          # reverse dup + self-loop
    got = kg_kcore(
        _edges_ds(edges), small_edge_limit=small_edge_limit
    ).to_pandas().set_index("entity_id")["core"].to_dict()
    want = {"a": 3, "b": 3, "c": 3, "d": 3, "e": 2, "f": 2, "g": 1, "h": 1}
    assert got == want


def test_kg_kcore_check_all_true(ray_session):
    """The boolean gate verdicts are all TRUE on the known graph."""
    from nlp_series_relation_extraction_ray.pipelines.kg import (
        kg_kcore_check,
    )

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e")]
    out = kg_kcore_check(_edges_ds(edges))
    assert len(out) == 5
    assert out["core_match"].all()
    assert bool(out["count_ok"].all())
