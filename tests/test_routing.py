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


def test_k_routes_parallel_paths(ray_session):
    """On the disjoint parallel-paths fixture, route k must be exactly the
    k-th cheapest path (drop_middle_percent=100 kills the used path's
    middle edge each round, _get_route.py:168-183)."""
    import ray.data as rd

    s = np.array([5, 12], dtype=np.int64)
    graph = routing.build_csr(*synth.k_routes_graph_edges(s), directed=True)
    od = rd.from_arrow(
        pa.table(
            {
                "origin": pa.array(synth.KR_ORIGIN_BASE + s, pa.int64()),
                "dest": pa.array(synth.KR_DEST_BASE + s, pa.int64()),
            }
        )
    )
    out = routing.get_k_routes(od, graph, k=4, drop_middle_percent=100).to_pandas()
    assert len(out) == 8
    for sk in s:
        costs = np.sort(31 + np.arange(synth.KR_PATHS) + 10 * ((sk + 3 * np.arange(synth.KR_PATHS)) % 7))
        sub = out[out["origin"] == synth.KR_ORIGIN_BASE + sk].sort_values("k")
        assert list(sub["cost"]) == [float(c) for c in costs[:4]]
        assert (sub["n_hops"] == 3).all()


def test_k_routes_short_route_keeps_end_edges(ray_session):
    """A 2-edge route with drop=100 keeps 1 edge each end -> nothing is
    deleted and every k repeats the same route (reference behavior when
    the middle slice is empty)."""
    import ray.data as rd

    na = np.array([1, 2], dtype=np.int64)
    nb = np.array([2, 3], dtype=np.int64)
    w = np.array([1.0, 1.0])
    graph = routing.build_csr(na, nb, w, directed=True)
    od = rd.from_arrow(
        pa.table({"origin": pa.array([1], pa.int64()),
                  "dest": pa.array([3], pa.int64())})
    )
    out = routing.get_k_routes(od, graph, k=3, drop_middle_percent=100).to_pandas()
    assert len(out) == 3
    assert (out["cost"] == 2.0).all()


def test_tsp_convex_position_is_hull_order():
    """Shuffled circle points: the 2-opt-refined tour must be the ring
    order (a non-crossing Hamiltonian cycle on convex-position points is
    the hull cycle)."""
    rng = np.random.default_rng(7)
    for n in (5, 9, 12):
        th = np.sort(rng.uniform(0, 2 * np.pi, n))
        xy = np.stack([np.cos(th), np.sin(th)], axis=1) * 50
        perm = rng.permutation(n)
        order = routing.tsp_order(xy[perm])
        ring = perm[order]  # positions on the circle, in tour order
        pos = int(np.nonzero(ring == 0)[0][0])
        rot = np.concatenate([ring[pos:], ring[:pos]])
        if len(rot) > 2 and rot[1] > rot[-1]:
            rot = np.concatenate([rot[:1], rot[1:][::-1]])
        assert list(rot) == list(range(n))


def test_tsp_near_optimal_and_valid():
    """Random points: tour is a permutation and within 5% of brute-force
    optimal at n=7 (2-opt rarely sticks at a bad local optimum there)."""
    from itertools import permutations

    rng = np.random.default_rng(3)
    xy = rng.uniform(0, 100, (7, 2))

    def cyc_len(order):
        p = xy[np.asarray(order)]
        q = np.roll(p, -1, axis=0)
        return float(np.hypot(q[:, 0] - p[:, 0], q[:, 1] - p[:, 1]).sum())

    best = min(cyc_len((0,) + p) for p in permutations(range(1, 7)))
    order = routing.tsp_order(xy)
    assert sorted(order) == list(range(7))
    assert cyc_len(order) <= best * 1.05 + 1e-9

    path = routing.tsp_order(xy, return_to_start=False)
    assert sorted(path) == list(range(7))


def test_connector_weights_rules():
    """_points.py:41-61 conversions: zero by default, distance x
    multiplier for meters, d / (16.666667 * kmh) for minutes, and the
    two knobs are mutually exclusive."""
    d = np.array([0.0, 100.0, 250.0])
    np.testing.assert_array_equal(routing.connector_weights(d), [0, 0, 0])
    np.testing.assert_allclose(
        routing.connector_weights(d, nodedist_multiplier=2.0), d * 2.0
    )
    np.testing.assert_allclose(
        routing.connector_weights(d, nodedist_kmh=50.0),
        d / (16.666667 * 50.0),
    )
    with pytest.raises(ValueError):
        routing.connector_weights(d, nodedist_multiplier=1.0, nodedist_kmh=50.0)


def test_split_lines_closed_form_and_no_split_differs(ray_session):
    """split_lines=True: points connect at the projection foot, so the
    O->D cost on the isolated-segment fixture is exactly h + |a-b| + g;
    the endpoint-connection (no-split) path yields different costs on
    the same fixture (it must route via a segment endpoint)."""
    import ray.data as rd

    s = np.arange(1, 9, dtype=np.int64)
    (na, nb, ax, ay, bx, by, w), (o_id, ox, oy), (d_id, dx, dy) = (
        synth.split_lines_fixture(s)
    )
    na2, nb2, w2, nid, nx, ny = routing.split_edges_at_points(
        na, nb, ax, ay, bx, by, w,
        np.concatenate([ox, dx]), np.concatenate([oy, dy]),
        search_tolerance=250.0,
    )
    # piece weights conserve the total original weight
    np.testing.assert_allclose(w2.sum(), w.sum(), rtol=1e-12)

    def run(graph_edges, tol):
        a_, b_, w_, nid_, nx_, ny_ = graph_edges
        graph = routing.build_csr(a_, b_, w_, directed=False)
        ids = np.concatenate([na, nb, nid_])
        xs = np.concatenate([ax, bx, nx_])
        ys = np.concatenate([ay, by, ny_])
        order = np.argsort(ids)
        pos = np.searchsorted(ids[order], graph[0])
        node_xy = (xs[order][pos], ys[order][pos])
        origins = rd.from_arrow(pa.table(
            {"origin": pa.array(o_id, pa.int64()),
             "px": pa.array(ox), "py": pa.array(oy)}))
        dest_points = np.stack([d_id.astype(np.float64), dx, dy], axis=1)
        out = routing.od_cost_matrix_points(
            origins, graph, node_xy, dest_points,
            search_tolerance=tol, nodedist_multiplier=1.0,
        ).to_pandas()
        return out[out.origin % 1_000_000 == out.dest % 1_000_000] \
            .sort_values("origin")["cost"].to_numpy()

    split_cost = run((na2, nb2, w2, nid, nx, ny), 250.0)
    expected = (10 + s % 5) + np.abs(
        (100 + 100 * (s % 7)) - (150 + 90 * (s % 9))
    ) + (5 + s % 4)
    np.testing.assert_allclose(split_cost, expected.astype(float), atol=1e-6)
    # without splitting, points must reach a segment ENDPOINT: tolerance
    # 250 loses mid-segment points entirely (the reference's motivation
    # for split_lines); a huge tolerance connects them but via endpoints,
    # giving wrong costs on every supplier
    assert len(run((na, nb, w, np.empty(0, np.int64),
                    np.empty(0), np.empty(0)), 250.0)) < len(split_cost)
    nosplit_cost = run(
        (na, nb, w, np.empty(0, np.int64), np.empty(0), np.empty(0)),
        1200.0,
    )
    assert len(nosplit_cost) == len(split_cost)
    assert (np.abs(nosplit_cost - split_cost) > 1.0).all()


def test_close_network_holes_distributed_matches_broadcast(
        ray_session, monkeypatch):
    """Force NODE_BROADCAST_LIMIT=0: the cell-co-partitioned fallback must
    return exactly the broadcast plan's hole edges — same nearest choice,
    same (distance, node_key) tiebreak, both deadends_only modes
    (r4 verdict #3)."""
    import ray.data as rd

    from ssb_sgis_ray.geo import wkb as W
    from ssb_sgis_ray.ops import network as net_ops

    rng = np.random.default_rng(5)
    rows_id, rows_wkb = [], []
    # 40 collinear segment pairs with varying gaps; some close, some not
    for k in range(40):
        y = 300.0 * k
        gap = float(rng.integers(2, 200))
        rows_id += [2 * k, 2 * k + 1]
        rows_wkb += [
            W.encode_linestring(np.array([[0.0, y], [1000.0, y]])),
            W.encode_linestring(
                np.array([[1000.0 + gap, y], [2000.0 + gap, y]])),
        ]
    lines = rd.from_arrow(pa.table({
        "line_id": pa.array(rows_id, pa.int64()),
        "geometry_wkb": pa.array(rows_wkb, pa.binary()),
    })).repartition(4)

    for dm in (False, True):
        want = net_ops.close_network_holes(
            lines, "line_id", tolerance=4.0, max_distance=150.0,
            max_angle=90.0, deadends_only=dm,
        ).to_pandas().sort_values("from_node").reset_index(drop=True)
        monkeypatch.setattr(net_ops, "NODE_BROADCAST_LIMIT", 0)
        got = net_ops.close_network_holes(
            lines, "line_id", tolerance=4.0, max_distance=150.0,
            max_angle=90.0, deadends_only=dm,
        ).to_pandas().sort_values("from_node").reset_index(drop=True)
        monkeypatch.setattr(net_ops, "NODE_BROADCAST_LIMIT", 5_000_000)
        assert len(want) > 0
        pd.testing.assert_frame_equal(got[want.columns], want)
