"""Expression-layer kernels (SURVEY §2.9): representative_point,
extract_unique_points, shortest_line/nearest_points, force_2d, reverse,
and the distributed line_merge."""

import numpy as np
import pyarrow as pa

from ssb_sgis_ray.geo import kernels, wkb
from ssb_sgis_ray.ops import geometry as geom_ops


def _poly(rings):
    return wkb.encode_polygon([np.asarray(r, float) for r in rings])


def _pg(*blobs):
    return wkb.decode_polygons(np.array(list(blobs), dtype=object))


def test_representative_point_scanline_cases():
    lshape = _poly([[(0, 0), (10, 0), (10, 6), (4, 6), (4, 10), (0, 10), (0, 0)]])
    holed = _poly(
        [
            [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
            [(2, 2), (2, 8), (8, 8), (8, 2), (2, 2)],
        ]
    )
    box = _poly([[(0, 0), (4, 0), (4, 2), (0, 2), (0, 0)]])
    rx, ry = kernels.representative_points(_pg(lshape, holed, box))
    assert (rx[0], ry[0]) == (5.0, 5.0)
    # midline y=5 runs through the hole: intervals [0,2] and [8,10], tie
    # broken leftmost -> (1, 5)
    assert (rx[1], ry[1]) == (1.0, 5.0)
    assert (rx[2], ry[2]) == (2.0, 1.0)


def test_representative_point_vertex_hit_rule():
    # hexagon with vertices AT the bbox midline y=5: scanline must drop to
    # (5 + max_below)/2 = 2.5; crossings there: x=-1 (left edge) and x=5
    hexa = _poly([[(0, 0), (4, 0), (6, 5), (4, 10), (0, 10), (-2, 5), (0, 0)]])
    rx, ry = kernels.representative_points(_pg(hexa))
    assert ry[0] == 2.5
    assert rx[0] == 2.0
    # and the point is inside
    ring = np.array([(0, 0), (4, 0), (6, 5), (4, 10), (0, 10), (-2, 5), (0, 0)], float)
    assert kernels.points_in_one_polygon(rx, ry, [ring]).all()


def test_representative_point_always_inside_random():
    rng = np.random.default_rng(7)
    blobs = []
    rings = []
    for _ in range(50):
        x0, y0 = rng.integers(0, 100, 2)
        w, h = rng.integers(4, 40, 2)
        x1 = x0 + rng.integers(1, w)
        y1 = y0 + rng.integers(1, h)
        ring = [
            (x0, y0), (x0 + w, y0), (x0 + w, y1), (x1, y1),
            (x1, y0 + h), (x0, y0 + h), (x0, y0),
        ]
        blobs.append(_poly([ring]))
        rings.append(np.asarray(ring, float))
    rx, ry = kernels.representative_points(_pg(*blobs))
    for i in range(len(blobs)):
        assert kernels.points_in_one_polygon(rx[i : i + 1], ry[i : i + 1], [rings[i]]).all()


def test_unique_vertex_stats_dedups_parts_and_closures():
    seg = np.array([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], float)
    two_parts = wkb.encode_multipolygon([[seg], [seg]])
    st = kernels.unique_vertex_stats(_pg(two_parts))
    assert st["n_raw"][0] == 10
    assert st["n_unique"][0] == 4
    assert st["x_sum"][0] == 8.0
    assert st["y_sum"][0] == 8.0


def test_boundary_shortest_lines_points_on_boundary():
    a = _poly([[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]])
    b = _poly([[(14, 3), (20, 3), (20, 7), (14, 7), (14, 3)]])
    c = _poly([[(13, 14), (21, 14), (21, 20), (13, 20), (13, 14)]])  # corner gap
    pga = _pg(a, a)
    pgb = _pg(b, c)
    d2, cpa, cpb = kernels.boundary_shortest_lines(pga, pgb)
    assert d2[0] == 16.0  # x gap 4
    assert d2[1] == 3 * 3 + 4 * 4  # corner (10,10) to (13,14)
    # achieving pair actually realizes the distance
    for i in range(2):
        got = ((cpa[i] - cpb[i]) ** 2).sum()
        assert abs(got - d2[i]) < 1e-9
    assert tuple(cpa[1]) == (10.0, 10.0)
    assert tuple(cpb[1]) == (13.0, 14.0)


def test_boundary_shortest_lines_intersecting_and_contained():
    big = _poly([[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]])
    inner = _poly([[(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]])
    overlap = _poly([[(8, 8), (15, 8), (15, 15), (8, 15), (8, 8)]])
    d2, _, _ = kernels.boundary_shortest_lines(_pg(big, big), _pg(inner, overlap))
    assert d2[0] == 0.0  # containment
    assert d2[1] == 0.0  # overlap


def test_force_2d_strips_z_and_m():
    # ISO Z point, EWKB-Z linestring, ISO ZM polygon
    p3 = b"\x01" + np.array([1001], "<u4").tobytes() + np.array([3.0, 4.0, 9.0], "<f8").tobytes()
    ls = (
        b"\x01"
        + np.array([0x80000002, 2], "<u4").tobytes()
        + np.array([0, 0, 5, 1, 2, 7], "<f8").tobytes()
    )
    ring_zm = np.array(
        [(0, 0, 1, 2), (4, 0, 1, 2), (4, 4, 1, 2), (0, 0, 1, 2)], float
    )
    pz = (
        b"\x01"
        + np.array([3003, 1, 4], "<u4").tobytes()
        + np.ascontiguousarray(ring_zm, "<f8").tobytes()
    )
    out = wkb.force_2d(np.array([p3, ls, pz], dtype=object))
    pts = wkb.decode_points(out[:1])
    assert (pts.x[0], pts.y[0]) == (3.0, 4.0)
    la = wkb.decode_lines(out[1:2])
    assert la.coords.tolist() == [[0, 0], [1, 2]]
    pg = wkb.decode_polygons(out[2:3])
    assert pg.coords.tolist() == [[0, 0], [4, 0], [4, 4], [0, 0]]
    # 2-D passthrough is byte-identical
    p2 = wkb.encode_points(np.array([3.0]), np.array([4.0]))
    assert wkb.force_2d(p2)[0] == p2[0]


def test_reverse_lines_involution():
    t = pa.table(
        {
            "geometry_wkb": pa.array(
                [
                    wkb.encode_linestring(np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 4.0]])),
                    wkb.encode_multilinestring(
                        [np.array([[5.0, 5.0], [6.0, 6.0]]), np.array([[7.0, 8.0], [9.0, 9.0]])]
                    ),
                ],
                pa.binary(),
            )
        }
    )
    once = geom_ops.reverse_lines(t)
    la = wkb.decode_lines(once["geometry_wkb"])
    assert la.coords[0].tolist() == [3.0, 4.0]
    twice = geom_ops.reverse_lines(once)
    assert twice["geometry_wkb"].to_pylist() == t["geometry_wkb"].to_pylist()


def _segments_table(segs):
    x1, y1, x2, y2 = (np.array([s[i] for s in segs], float) for i in range(4))
    return pa.table(
        {
            "seg_id": pa.array(np.arange(1, len(segs) + 1), pa.int64()),
            "geometry_wkb": wkb.encode_segments_arrow(x1, y1, x2, y2),
        }
    )


def test_line_merge_paths_junctions_rings(ray_session):
    import ray.data as rd

    from ssb_sgis_ray.ops import network as net_ops

    segs = [
        # chain of 3 (shuffled order, mixed directions)
        (4, 0, 8, 0), (0, 0, 4, 0), (12, 0, 8, 0),
        # junction: 3 segments meeting at (50, 50) stay unmerged
        (50, 50, 60, 50), (50, 50, 50, 60), (40, 40, 50, 50),
        # closed ring of 3
        (100, 100, 110, 100), (110, 100, 100, 110), (100, 110, 100, 100),
        # isolated segment
        (200, 0, 210, 0),
    ]
    out = (
        net_ops.line_merge(rd.from_arrow(_segments_table(segs)), id_col="seg_id", tolerance=1.0)
        .to_pandas()
        .sort_values("merge_label")
        .reset_index(drop=True)
    )
    assert len(out) == 1 + 3 + 1 + 1
    chain = out[out["n_points"] == 4].iloc[0]
    assert (chain["start_x"], chain["end_x"]) == (0.0, 12.0)
    ring = out[(out["start_x"] == out["end_x"]) & (out["n_points"] == 4)]
    assert len(ring) == 1  # closed ring reports start == end, 3+1 points
    singles = out[out["n_points"] == 2]
    assert len(singles) == 4  # 3 junction legs + 1 isolated


def test_resize_area_matches_naive_reference():
    from ssb_sgis_ray.codecs.resize import _area_weights, resize_area

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (7, 10, 3), dtype=np.uint8)

    def naive_float(img, oh, ow):
        h, w = img.shape[:2]
        sy, sx = h / oh, w / ow
        out = np.zeros((oh, ow, img.shape[2]))
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(img.shape[2])
                tot = 0.0
                for y in range(h):
                    for x in range(w):
                        dy = max(0.0, min((i + 1) * sy, y + 1) - max(i * sy, y))
                        dx = max(0.0, min((j + 1) * sx, x + 1) - max(j * sx, x))
                        acc += dy * dx * img[y, x]
                        tot += dy * dx
                out[i, j] = acc / tot
        return out

    for oh, ow in [(3, 5), (7, 10), (14, 20), (2, 2), (5, 3)]:
        wy = _area_weights(img.shape[0], oh)
        wx = _area_weights(img.shape[1], ow)
        f = img.astype(np.float64)
        mine = np.einsum(
            "iwc,jw->ijc", (wy @ f.reshape(7, -1)).reshape(oh, 10, -1), wx
        )
        assert np.allclose(mine, naive_float(img, oh, ow), atol=1e-9)
        # weights are row-stochastic: constant images stay constant
        const = resize_area(np.full((7, 10), 77, np.uint8), oh, ow)
        assert (const == 77).all()
    # exact 2x2 block mean on even dims
    img2 = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    r = resize_area(img2, 2, 2)
    exp = np.clip(
        np.rint(img2.reshape(2, 2, 2, 2).transpose(0, 2, 1, 3).reshape(2, 2, 4).mean(-1)),
        0, 255,
    ).astype(np.uint8)
    assert np.array_equal(r, exp)
