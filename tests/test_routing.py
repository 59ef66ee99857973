"""Network-analysis operators: Dijkstra correctness + distributed stages.

Semantics target: /root/reference/src/sgis/networkanalysis/
networkanalysis.py (od_cost_matrix :145-320, service_area) and
directednetwork percent_bidirectional.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ssb_sgis_ray import synth
from ssb_sgis_ray.ops import routing


def bellman_ford(n, edges, src):
    dist = np.full(n, np.inf)
    dist[src] = 0
    for _ in range(n):
        changed = False
        for a, b, w in edges:
            if dist[a] + w < dist[b]:
                dist[b] = dist[a] + w
                changed = True
            if dist[b] + w < dist[a]:
                dist[a] = dist[b] + w
                changed = True
        if not changed:
            break
    return dist


def test_dijkstra_matches_bellman_ford_random():
    rng = np.random.default_rng(3)
    for trial in range(5):
        n = 40
        m = 120
        ea = rng.integers(0, n, m)
        eb = rng.integers(0, n, m)
        w = rng.integers(1, 20, m).astype(float)
        keep = ea != eb
        ea, eb, w = ea[keep], eb[keep], w[keep]
        nodes, indptr, indices, weights = routing.build_csr(ea, eb, w)
        for src_node in rng.choice(nodes, 3, replace=False):
            pos = int(np.searchsorted(nodes, src_node))
            got = routing.dijkstra(indptr, indices, weights, pos)
            # reference on dense positions
            pa_ = np.searchsorted(nodes, ea)
            pb_ = np.searchsorted(nodes, eb)
            expect = bellman_ford(len(nodes), list(zip(pa_, pb_, w)), pos)
            np.testing.assert_allclose(got, expect)


def test_grid_costs_closed_form():
    na, nb, w = synth.grid_graph_edges()
    graph = routing.build_csr(na, nb, w)
    nodes, indptr, indices, weights = graph
    src = int(np.searchsorted(nodes, 5 * 1000 + 7))
    dist = routing.dijkstra(indptr, indices, weights, src)
    for node, d in zip(nodes[::317], dist[::317]):
        i, j = node // 1000, node % 1000
        assert d == synth.GRID_HW * abs(i - 5) + synth.GRID_VW * abs(j - 7)


def test_od_and_service_area_stages(ray_session):
    import ray.data as rd

    graph = routing.build_csr(*synth.grid_graph_edges())
    origins = rd.from_arrow(
        pa.table({"origin": pa.array([1007, 20020], pa.int64())})
    )
    dests = synth.grid_dest_ids(4)
    od = routing.od_cost_matrix(origins, graph, dests).to_pandas()
    assert len(od) == 8
    for _, r in od.iterrows():
        oi, oj = r["origin"] // 1000, r["origin"] % 1000
        di, dj = r["dest"] // 1000, r["dest"] % 1000
        assert r["cost"] == synth.GRID_HW * abs(di - oi) + synth.GRID_VW * abs(dj - oj)
    sa = routing.service_area_counts(origins, graph, 11.0).to_pandas()
    # budget 11: reachable = nodes with 2|di|+5|dj| <= 11 (interior origin)
    cnt = sum(
        1
        for di in range(-6, 7)
        for dj in range(-3, 4)
        if 2 * abs(di) + 5 * abs(dj) <= 11
        and 0 <= 20 + di < synth.GRID_N and 0 <= 20 + dj < synth.GRID_N
    )
    assert sa.set_index("origin").loc[20020, "n_reachable"] == cnt


def test_percent_bidirectional(ray_session):
    import ray.data as rd

    edges = pd.DataFrame(
        {
            "node_a": [1, 2, 3, 4, 5],
            "node_b": [2, 1, 4, 3, 6],
        }
    )  # (1,2) both ways, (3,4) both ways, (5,6) one way -> 4/5
    got = routing.percent_bidirectional(rd.from_pandas(edges))
    assert got == pytest.approx(0.8)


def test_get_route_hops(ray_session):
    import ray.data as rd

    graph = routing.build_csr(*synth.grid_graph_edges())
    origins = rd.from_arrow(pa.table({"origin": pa.array([3005], pa.int64())}))
    out = routing.get_route(origins, graph, synth.grid_dest_ids(4)).to_pandas()
    assert len(out) == 4
    for _, r in out.iterrows():
        di = abs(r["dest"] // 1000 - 3)
        dj = abs(r["dest"] % 1000 - 5)
        assert r["n_hops"] == di + dj
        assert r["cost"] == synth.GRID_HW * di + synth.GRID_VW * dj


def test_route_frequencies_deterministic_and_conserved(ray_session):
    """Every OD shortest path of hop count h contributes h edge
    traversals: sum of frequencies == sum of hops; repeated runs agree."""
    import ray.data as rd

    graph = routing.build_csr(*synth.grid_graph_edges())
    origins = rd.from_arrow(
        pa.table({"origin": pa.array([1002, 5030], pa.int64())})
    )
    dests = synth.grid_dest_ids(3)
    freq = routing.route_frequencies(origins, graph, dests).to_pandas()
    routes = routing.get_route(origins, graph, dests).to_pandas()
    assert freq["n_routes"].sum() == routes["n_hops"].sum()
    # determinism (tie-broken predecessors): identical on a second run
    freq2 = routing.route_frequencies(origins, graph, dests).to_pandas()
    key = ["node_a", "node_b"]
    a = freq.sort_values(key).reset_index(drop=True)
    b = freq2.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
