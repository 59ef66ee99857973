"""Tests for breadth operators: geometry types, buffers, painter, sessions."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ssb_sgis_ray import synth
from ssb_sgis_ray.geo import kernels, wkb
from ssb_sgis_ray.ops import dissolve as dis
from ssb_sgis_ray.ops import geometry as geom_ops
from ssb_sgis_ray.ops import relational as rel

SF = "/root/testdata/sf0.001"


def test_add_geom_type_families():
    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "geometry_wkb": pa.array(
                [
                    wkb.encode_points(np.array([1.0]), np.array([2.0]))[0],
                    wkb.encode_linestring(np.array([[0, 0], [1, 1.0]])),
                    wkb.encode_polygon(
                        [np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0.0]])]
                    ),
                    wkb.encode_multipoint(np.array([[0, 0], [1, 1.0]])),
                ],
                pa.binary(),
            ),
        }
    )
    out = geom_ops.add_geom_type(t)
    assert out["geom_family"].to_pylist() == ["point", "line", "polygon", "point"]


def test_explode_multipoints():
    t = pa.table(
        {
            "id": pa.array([7, 8], pa.int64()),
            "geometry_wkb": pa.array(
                [
                    wkb.encode_multipoint(np.array([[0, 0], [1, 1], [2, 2.0]])),
                    wkb.encode_points(np.array([9.0]), np.array([9.0]))[0],
                ],
                pa.binary(),
            ),
        }
    )
    out = geom_ops.explode_multipoints(t, "id").to_pandas()
    assert len(out) == 4
    assert out[out["id"] == 7]["part_no"].tolist() == [0, 1, 2]
    assert out[out["id"] == 8]["x"].tolist() == [9.0]


def test_buff_points_area_close_to_circle():
    out = geom_ops.buff_points(np.array([10.0]), np.array([20.0]), 5.0, resolution=50)
    pg = wkb.decode_polygons(out)
    area = kernels.polygon_areas(pg)[0]
    assert area == pytest.approx(np.pi * 25.0, rel=1e-3)  # 200-gon ≈ circle
    b = kernels.polygon_bounds(pg)[0]
    np.testing.assert_allclose(b, [5, 15, 15, 25], atol=1e-9)


def test_size_ranks_ties_by_id():
    t = pa.table({"sid": pa.array([5, 1, 3], pa.int64())})
    area = np.array([10.0, 10.0, 99.0])
    out = geom_ops.size_ranks(t, area, "sid").to_pandas().set_index("sid")
    assert out.loc[3, "size_rank"] == 1
    assert out.loc[1, "size_rank"] == 2  # tie -> smaller id first
    assert out.loc[5, "size_rank"] == 3


def test_update_geometries_conserves_union_area():
    """Painter kept-areas must sum exactly to the union area."""
    import pyarrow.parquet as pq

    from ssb_sgis_ray.queries import q_poly_clusters, q_update_geometries

    kept = q_update_geometries(SF).to_pandas()
    sup = synth.add_supplier_diamonds(
        pq.read_table(f"{SF}/supplier.parquet", columns=["s_suppkey"])
    )
    g = pd.DataFrame({"geometry_wkb": sup["geometry_wkb"].to_pylist()})
    union_area = dis.union_area_of_group(g)
    assert kept["kept_area_i"].sum() == pytest.approx(union_area, abs=1.0)
    # every row keeps at most its own area, at least zero
    pg = wkb.decode_polygons(sup["geometry_wkb"])
    own = kernels.polygon_areas(pg)
    ids = sup["s_suppkey"].to_numpy()
    km = dict(zip(kept["s_suppkey"], kept["kept_area_i"]))
    for i, sid in enumerate(ids):
        assert 0 <= km[int(sid)] <= own[i] + 1e-6


def test_sessionize_user_kernel():
    base = 1_700_000_000_000_000
    g = pd.DataFrame(
        {
            "user_id": [42] * 5,
            "ts_us": [
                base,
                base + 60_000_000,  # +1 min, same session
                base + 3_000_000_000,  # +50 min from prev -> new session
                base + 3_060_000_000,
                base + 10_000_000_000,  # big gap -> third session
            ],
        }
    )
    out = rel.sessionize_user(g)
    assert out["session_no"].tolist() == [1, 2, 3]
    assert out["n_events"].tolist() == [2, 2, 1]
    assert out.loc[0, "start_us"] == base
    assert out.loc[0, "end_us"] == base + 60_000_000


def test_within_distance_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from ssb_sgis_ray.queries import _supplier_neighbors, customers

    nb = _supplier_neighbors(SF)
    got = geom_ops.within_distance_pairs(
        customers(SF), nb, distance=3000.0, id_col="c_custkey"
    ).to_pandas()
    c = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"]).to_pandas()
    px, py = synth.customer_points(c["c_custkey"].to_numpy())
    expect = set()
    for i in range(len(px)):
        d2 = (px[i] - nb["x"]) ** 2 + (py[i] - nb["y"]) ** 2
        for j in np.nonzero(d2 <= 9_000_000)[0]:
            expect.add((int(c["c_custkey"][i]), int(nb["id"][j])))
    assert set(zip(got["c_custkey"], got["neighbor_id"])) == expect


def test_salted_join_equals_unsalted(ray_session):
    from ssb_sgis_ray.ops import spatial
    from ssb_sgis_ray.queries import lineitems, nations_ds

    plain = spatial.sjoin_cell_partitioned(
        lineitems(SF), nations_ds(SF), res=9, left_id="l_key", right_id="n_nationkey"
    ).to_pandas()
    salted = spatial.sjoin_cell_partitioned(
        lineitems(SF), nations_ds(SF), res=9, left_id="l_key", right_id="n_nationkey",
        salt_threshold=500, n_salts=8,
    ).to_pandas()
    assert set(zip(plain["left_id"], plain["right_id"])) == set(
        zip(salted["left_id"], salted["right_id"])
    )
    assert len(plain) == len(salted)  # no duplicates introduced
