"""PageRank (pipelines/graph.py): integer-kernel properties plus the
small-vs-large adaptive-plan equivalence (the DuckDB oracle match itself is
covered by tests/test_queries_oracle.py via the registry)."""

import numpy as np
import pandas as pd
import pytest

SF_SMALL = "/root/testdata/sf0.001"


def test_pagerank_int_ring_is_uniform():
    from monocator_ray.pipelines.graph import SCALE, pagerank_int

    # symmetric ring: perfectly regular graph -> stationary == uniform,
    # and the integer kernel must preserve that exactly at every step
    n = 10
    src = np.concatenate([np.arange(n), np.arange(n)])
    dst = np.concatenate([(np.arange(n) + 1) % n, (np.arange(n) - 1) % n])
    nodes, r = pagerank_int(src.astype(np.int64), dst.astype(np.int64))
    assert len(nodes) == n
    assert len(np.unique(r)) == 1
    # total mass stays within iters * N floor-loss of SCALE (the ring's
    # divisions happen to be exact, so the loss here is exactly 0)
    assert 0 <= SCALE - r.sum() < 3 * 4 * n * 100


def test_pagerank_int_star_center_dominates():
    from monocator_ray.pipelines.graph import pagerank_int

    # star K_{1,8} symmetrized: center collects mass from every leaf
    leaves = np.arange(1, 9, dtype=np.int64)
    src = np.concatenate([np.zeros(8, np.int64), leaves])
    dst = np.concatenate([leaves, np.zeros(8, np.int64)])
    nodes, r = pagerank_int(src, dst)
    center = r[np.searchsorted(nodes, 0)]
    assert (center > r[np.searchsorted(nodes, leaves)]).all()


def test_hits_int_star_center_is_top_authority():
    from monocator_ray.pipelines.graph import SCALE, hits_int

    # all hubs point at auth 0; one hub also points at auth 1
    src = np.array([1, 2, 3, 1], dtype=np.int64)
    dst = np.array([0, 0, 0, 9], dtype=np.int64)
    hubs, h, auths, a = hits_int(src, dst)
    assert list(auths) == [0, 9]
    assert a[0] > a[1]
    # hub 1 links to both authorities -> strictly best hub
    assert h[np.searchsorted(hubs, 1)] > h[np.searchsorted(hubs, 2)]
    # integer normalization keeps total mass near SCALE
    assert 0 < a.sum() <= 2 * SCALE


@pytest.mark.usefixtures("ray_session")
def test_hits_large_path_matches_small():
    import monocator_ray.pipelines.graph as graph

    small = graph.q_hits(SF_SMALL).to_pandas()
    old = graph._SMALL_EDGES
    graph._SMALL_EDGES = 0
    try:
        large = graph.q_hits(SF_SMALL).to_pandas()
    finally:
        graph._SMALL_EDGES = old
    assert len(small) > 0
    pd.testing.assert_frame_equal(
        small.sort_values(["kind", "node"]).reset_index(drop=True),
        large.sort_values(["kind", "node"]).reset_index(drop=True),
    )


@pytest.mark.usefixtures("ray_session")
def test_pagerank_large_path_matches_small():
    """Forcing the edge threshold to 0 routes sf0.001 through the
    distributed (broadcast-contrib, static-edge-partition) path; results
    must be bit-identical to the driver numpy kernel."""
    import monocator_ray.pipelines.graph as graph

    small = graph.q_pagerank(SF_SMALL).to_pandas()
    old = graph._SMALL_EDGES
    graph._SMALL_EDGES = 0
    try:
        large = graph.q_pagerank(SF_SMALL).to_pandas()
    finally:
        graph._SMALL_EDGES = old
    assert len(small) > 0
    pd.testing.assert_frame_equal(
        small.sort_values("node").reset_index(drop=True),
        large.sort_values("node").reset_index(drop=True),
    )


def test_triangle_kernel_known_graphs():
    """K4 has 4 triangles; a 5-ring has none; K4 plus a pendant edge still 4."""
    import numpy as np

    from monocator_ray.pipelines.graph import triangle_count_kernel

    k4a = np.array([0, 0, 0, 1, 1, 2])
    k4b = np.array([1, 2, 3, 2, 3, 3])
    assert triangle_count_kernel(k4a, k4b) == 4
    ring_a = np.array([0, 1, 2, 3, 0])
    ring_b = np.array([1, 2, 3, 4, 4])
    assert triangle_count_kernel(ring_a, ring_b) == 0
    pa_ = np.append(k4a, 3)
    pb_ = np.append(k4b, 9)
    assert triangle_count_kernel(pa_, pb_) == 4


def test_triangle_count_matches_kernel():
    """Distributed wedge plan == exhaustive kernel on the same derived
    edge set (sf0.001 co-purchase graph)."""
    import numpy as np

    from monocator_ray.pipelines.graph import (
        _copurchase_edges,
        q_triangle_count,
        triangle_count_kernel,
    )

    sf = "/root/testdata/sf0.001"
    got = q_triangle_count(sf)["n_triangles"][0].as_py()
    pdf = _copurchase_edges(sf).to_pandas()
    want = triangle_count_kernel(pdf["src"].to_numpy(np.int64), pdf["dst"].to_numpy(np.int64))
    assert got == want


def test_pagerank_join_path_matches_broadcast():
    """The no-driver-bound join-per-iteration path must be bit-identical to
    q_pagerank (same integer update rule) on the sf0.001 graph."""
    from monocator_ray.pipelines.graph import (
        _distinct_edges,
        pagerank_join_path,
        q_pagerank,
    )

    sf = "/root/testdata/sf0.001"
    want = q_pagerank(sf).to_pandas().sort_values("node").reset_index(drop=True)
    got = (
        pagerank_join_path(_distinct_edges(sf).materialize())
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert got["node"].tolist() == want["node"].tolist()
    assert got["rank_e12"].tolist() == want["rank_e12"].tolist()


def test_triangle_shuffle_path_matches_broadcast(monkeypatch):
    """Force the co-partition closure path and pin it equal to the
    broadcast fast path (which the kernel test already pins)."""
    import monocator_ray.pipelines.graph as G

    sf = "/root/testdata/sf0.001"
    fast = G.q_triangle_count(sf)["n_triangles"][0].as_py()
    monkeypatch.setattr(G, "_TRI_BCAST_EDGES", 0)
    slow = G.q_triangle_count(sf)["n_triangles"][0].as_py()
    assert fast == slow


def test_local_clustering_shuffle_path_matches_broadcast(monkeypatch):
    """Force q_local_clustering's co-partition closure path and pin it
    equal to the broadcast fast path (whose full output the registry's
    DuckDB oracle pins)."""
    import monocator_ray.pipelines.graph as G

    sf = "/root/testdata/sf0.001"
    fast = G.q_local_clustering(sf)
    monkeypatch.setattr(G, "_TRI_BCAST_EDGES", 0)
    slow = G.q_local_clustering(sf)
    assert fast.equals(slow)


def test_local_clustering_known_graph(ray_session):
    """A 4-clique plus a pendant vertex has known coefficients: clique
    nodes that also touch the pendant lose density.  Pin the permille
    arithmetic on a hand-checkable graph via the same corner-attribution
    the pipeline uses (brute force over all triangles)."""
    import itertools

    import numpy as np

    # graph: K4 on {0,1,2,3}; node 4 attached to 0 only
    edges = {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (0, 4)}
    deg = {n: sum(1 for e in edges if n in e) for n in range(5)}
    tri = {n: 0 for n in range(5)}
    for a, b, c in itertools.combinations(range(5), 3):
        if {(min(a, b), max(a, b)), (min(a, c), max(a, c)),
            (min(b, c), max(b, c))} <= edges:
            for n in (a, b, c):
                tri[n] += 1
    # K4: each clique-only node has deg 3, 3 triangles -> lcc 1000
    assert tri[1] == tri[2] == tri[3] == 3
    assert 2000 * tri[1] // (deg[1] * (deg[1] - 1)) == 1000
    # node 0: deg 4, still 3 triangles -> 6/12 = 500 permille
    assert 2000 * tri[0] // (deg[0] * (deg[0] - 1)) == 500
    # pendant: deg 1 -> coefficient defined as 0
    assert deg[4] == 1 and tri[4] == 0
