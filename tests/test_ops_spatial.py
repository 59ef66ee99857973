"""Operator tests on sf0.001 against brute-force numpy oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ssb_sgis_ray import synth
from ssb_sgis_ray.geo import kernels, wkb
from ssb_sgis_ray.ops import dissolve as dis
from ssb_sgis_ray.ops import knn as knn_ops
from ssb_sgis_ray.ops import spatial

SF = "/root/testdata/sf0.001"


def customers_ds():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"]).map_batches(
        synth.add_customer_points, batch_format="pyarrow"
    )


def suppliers_table() -> pa.Table:
    t = pq.read_table(f"{SF}/supplier.parquet", columns=["s_suppkey"])
    return synth.add_supplier_diamonds(t)


def oracle_pip_pairs():
    """Brute-force (custkey, suppkey) pairs: |dx|+|dy| <= r (int math)."""
    c = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"]).to_pandas()
    s = pq.read_table(f"{SF}/supplier.parquet", columns=["s_suppkey"]).to_pandas()
    px, py = synth.customer_points(c["c_custkey"].to_numpy())
    sx, sy, r = synth.supplier_diamonds(s["s_suppkey"].to_numpy())
    pairs = set()
    for i in range(len(px)):
        inside = np.abs(px[i] - sx) + np.abs(py[i] - sy) <= r
        for j in np.nonzero(inside)[0]:
            pairs.add((int(c["c_custkey"][i]), int(s["s_suppkey"][j])))
    return pairs


def test_sfilter_semi_anti_split(ray_session):
    sup = suppliers_table()
    oracle = oracle_pip_pairs()
    matched_keys = {a for a, _ in oracle}

    semi = spatial.sfilter(customers_ds(), sup, mode="semi").to_pandas()
    assert set(semi["c_custkey"]) == matched_keys
    assert not semi["c_custkey"].duplicated().any()  # dedup like np.unique

    anti = spatial.sfilter(customers_ds(), sup, mode="anti").to_pandas()
    all_keys = set(
        pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"])["c_custkey"].to_pylist()
    )
    assert set(anti["c_custkey"]) == all_keys - matched_keys

    split = spatial.sfilter(customers_ds(), sup, mode="split").to_pandas()
    assert set(split.loc[split["matched"], "c_custkey"]) == matched_keys
    assert len(split) == len(all_keys)


def test_sjoin_pairs_broadcast(ray_session):
    sup = suppliers_table()
    got = spatial.sjoin_pairs(customers_ds(), sup, right_cols=["s_suppkey"]).to_pandas()
    assert set(zip(got["c_custkey"], got["s_suppkey"])) == oracle_pip_pairs()


def test_sjoin_cell_partitioned_matches_broadcast(ray_session):
    import ray.data as rd

    sup_ds = rd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey"]).map_batches(
        synth.add_supplier_diamonds, batch_format="pyarrow"
    )
    got = spatial.sjoin_cell_partitioned(
        customers_ds(), sup_ds, res=7, left_id="c_custkey", right_id="s_suppkey"
    ).to_pandas()
    assert set(zip(got["left_id"], got["right_id"])) == oracle_pip_pairs()
    # a pair may appear at most once (points live in exactly one cell)
    assert not got.duplicated().any()


def test_knn_broadcast_and_cells_match_bruteforce(ray_session):
    c = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"]).to_pandas()
    s = pq.read_table(f"{SF}/supplier.parquet", columns=["s_suppkey"]).to_pandas()
    px, py = synth.customer_points(c["c_custkey"].to_numpy())
    sx, sy, _ = synth.supplier_diamonds(s["s_suppkey"].to_numpy())
    k = 3
    # oracle: per customer, k smallest (dist2, suppkey)
    expect = []
    for i in range(len(px)):
        d2 = (px[i] - sx) ** 2 + (py[i] - sy) ** 2
        order = np.lexsort((s["s_suppkey"].to_numpy(), d2))[:k]
        for rank, j in enumerate(order, 1):
            expect.append((int(c["c_custkey"][i]), int(s["s_suppkey"][j]), int(d2[j]), rank))
    expect = sorted(expect)

    neighbors = {
        "id": s["s_suppkey"].to_numpy().astype(np.int64),
        "x": sx.astype(np.float64),
        "y": sy.astype(np.float64),
    }
    got = knn_ops.knn_broadcast(customers_ds(), neighbors, k=k, id_col="c_custkey").to_pandas()
    got_t = sorted(zip(got["c_custkey"], got["neighbor_id"], got["dist2"], got["knn_rank"]))
    assert [tuple(map(int, t)) for t in got_t] == expect

    got2 = knn_ops.knn_cells(
        customers_ds(), neighbors, k=k, id_col="c_custkey", cell=2000.0
    ).to_pandas()
    got2_t = sorted(zip(got2["c_custkey"], got2["neighbor_id"], got2["dist2"], got2["knn_rank"]))
    assert [tuple(map(int, t)) for t in got2_t] == expect


def test_knn_strict_raises(ray_session):
    with pytest.raises(ValueError):
        knn_ops.KnnBroadcast.__init__(
            object.__new__(knn_ops.KnnBroadcast),
            neighbors_ref=__import__("ray").put(
                {"id": np.array([1]), "x": np.array([0.0]), "y": np.array([0.0])}
            ),
            k=5,
            id_col="x",
            strict=True,
        )


def test_tile_assignment_and_cover(ray_session):
    ds = customers_ds().map_batches(
        lambda b: spatial.assign_point_tiles(b, synth.TILE), batch_format="pyarrow"
    )
    df = ds.to_pandas()
    assert (df["tile_x"] == df["px"] // synth.TILE).all()
    assert (df["ssb_id"] == df["tile_x"].astype(str) + "_" + df["tile_y"].astype(str)).all()

    # covering set of part boxes: each tile the bbox overlaps, half-open
    import ray.data as rd

    parts = rd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey"]).map_batches(
        synth.add_part_boxes, batch_format="pyarrow"
    )
    cov = parts.map_batches(
        lambda b: spatial.cover_tiles_flatmap(b, synth.TILE, "p_partkey"),
        batch_format="pyarrow",
    ).to_pandas()
    p = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey"]).to_pandas()
    minx, miny, maxx, maxy = synth.part_boxes(p["p_partkey"].to_numpy())
    expect = set()
    for i in range(len(p)):
        for tx in range(minx[i] // synth.TILE, (maxx[i] - 1) // synth.TILE + 1):
            for ty in range(miny[i] // synth.TILE, (maxy[i] - 1) // synth.TILE + 1):
                expect.add((int(p["p_partkey"][i]), tx, ty))
    assert set(zip(cov["p_partkey"], cov["tile_x"], cov["tile_y"])) == expect


def test_cluster_labels_and_union_area(ray_session):
    """Cluster supplier diamonds; verify labels vs union-find oracle and
    union area vs an independent scanline integration."""
    sup = suppliers_table()
    pairs = dis.self_intersect_pairs(sup, "s_suppkey")
    ids = sup["s_suppkey"].to_numpy()
    labels = dis.union_find_labels(ids, pairs)

    # oracle: diamonds intersect iff |dx|+|dy| <= r1+r2 (L1 Minkowski)
    sx, sy, r = synth.supplier_diamonds(ids)
    import itertools

    adj = {int(i): set() for i in ids}
    for a, b in itertools.combinations(range(len(ids)), 2):
        if abs(sx[a] - sx[b]) + abs(sy[a] - sy[b]) <= r[a] + r[b]:
            adj[int(ids[a])].add(int(ids[b]))
            adj[int(ids[b])].add(int(ids[a]))
    # connected components by BFS
    seen, comp_of = set(), {}
    for start in sorted(adj):
        if start in seen:
            continue
        comp = [start]
        seen.add(start)
        queue = [start]
        while queue:
            u = queue.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    comp.append(v)
                    queue.append(v)
        lab = min(comp)
        for u in comp:
            comp_of[u] = lab
    expect_labels = np.array([comp_of[int(i)] for i in ids])
    np.testing.assert_array_equal(labels, expect_labels)

    # union area per cluster vs scanline oracle (0.5-step trapezoid is
    # exact for 45°-edged diamonds with integer vertices)
    df = pd.DataFrame({"s_suppkey": ids, "label": labels})
    for lab in np.unique(labels):
        members = df.loc[df["label"] == lab, "s_suppkey"].to_numpy()
        sel = np.isin(ids, members)
        g = pd.DataFrame(
            {"geometry_wkb": synth.diamond_wkb(sx[sel], sy[sel], r[sel])}
        )
        got_area = dis.union_area_of_group(g)
        exp_area = _diamond_union_area_scanline(sx[sel], sy[sel], r[sel])
        assert got_area == pytest.approx(exp_area, rel=1e-9)


def _diamond_union_area_scanline(sx, sy, r, step=0.5):
    y0 = float((sy - r).min())
    y1 = float((sy + r).max())
    ys = np.arange(y0, y1 + step, step)
    lengths = np.zeros(len(ys))
    for k, y in enumerate(ys):
        half = r - np.abs(y - sy)
        ok = half >= 0
        if not ok.any():
            continue
        lo = (sx - half)[ok]
        hi = (sx + half)[ok]
        order = np.argsort(lo)
        lo, hi = lo[order], hi[order]
        total, cur_lo, cur_hi = 0.0, lo[0], hi[0]
        for i in range(1, len(lo)):
            if lo[i] <= cur_hi:
                cur_hi = max(cur_hi, hi[i])
            else:
                total += cur_hi - cur_lo
                cur_lo, cur_hi = lo[i], hi[i]
        total += cur_hi - cur_lo
        lengths[k] = total
    return float(np.trapz(lengths, dx=step))


def test_label_propagation_matches_union_find(ray_session):
    import ray.data as rd

    sup = suppliers_table()
    pairs = dis.self_intersect_pairs(sup, "s_suppkey")
    ids = sup["s_suppkey"].to_numpy()
    expect = dis.union_find_labels(ids, pairs)
    if len(pairs) == 0:
        return
    pairs_ds = rd.from_pandas(pairs)
    got = dis.label_propagation(pairs_ds).to_pandas()
    got_map = dict(zip(got["node"], got["label"]))
    for i, v in enumerate(ids):
        if int(v) in got_map:
            assert got_map[int(v)] == expect[i]
