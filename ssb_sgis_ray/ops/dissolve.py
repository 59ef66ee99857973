"""buffer-dissolve-explode and polygon clustering.

Reproduces the reference's cluster-first dissolve plan
(``dissexp_by_cluster`` — /root/reference/src/sgis/geopandas_tools/
buffer_dissolve_explode.py:209-300 — "many times faster if there are many
non-overlapping geometries") and ``get_polygon_clusters``
(polygon_operations.py:31-188: sjoin(self,self) pairs → connected
components → cluster label), plus ``update_geometries``' painter's
algorithm (duplicates.py:15-127) as the per-cluster serial kernel.

Distributed plan:
1. self-join pairs per cell (sjoin_cell_partitioned or broadcast);
2. connected components over the pair table — iterative min-label
   propagation expressed as repeated ``groupby(node).min(label)`` rounds
   (converges in O(cluster diameter) rounds; diamond/buffer clusters are
   shallow). A driver-side union-find shortcut is used when the pair table
   is provably small (< ``UNION_FIND_LIMIT`` pairs) — the common case
   after per-cell pre-aggregation, and exactly the situation the
   reference's networkx call handles in one process;
3. ``groupby(cluster).map_groups(painter_union)`` — per-cluster serial
   union with the deterministic sort order the reference requires
   (area desc, then row id; SURVEY.md §2.13).

The union of one cluster is represented as its disjoint painter pieces
(convex members in ⇒ convex pieces out), so union AREA is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..geo import kernels, wkb
from ..geo.strtree import STRtree

UNION_FIND_LIMIT = 5_000_000  # pairs; above this use distributed label prop


def self_intersect_pairs(table: pa.Table, id_col: str) -> pd.DataFrame:
    """All (id_a, id_b) pairs of intersecting polygons (a < b), one table.

    Single-table helper for small/medium sides (used per cell at scale).
    """
    pg = wkb.decode_polygons(table["geometry_wkb"])
    b = kernels.polygon_bounds(pg)
    tree = STRtree(b)
    qi, pi = tree.query_bbox(b)
    mask = qi < pi  # dedupe + drop self-pairs
    qi, pi = qi[mask], pi[mask]
    if len(qi):
        keep = kernels.polygons_intersect_pairs(pg, pg, qi, pi)
        qi, pi = qi[keep], pi[keep]
    ids = table[id_col].to_numpy(zero_copy_only=False)
    return pd.DataFrame({"id_a": ids[qi], "id_b": ids[pi]})


def union_find_labels(ids: np.ndarray, pairs: pd.DataFrame) -> np.ndarray:
    """Connected-component label per id (label = min id in component)."""
    index = {int(v): i for i, v in enumerate(ids)}
    parent = np.arange(len(ids))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in zip(pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()):
        ra, rb = find(index[int(a)]), find(index[int(b)])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(len(ids))])
    # canonical label: min id in component (order-independent, deterministic)
    lab = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(lab, roots, ids.astype(np.int64))
    return lab[roots]


def label_propagation(pairs_ds, max_rounds: int = 50):
    """Distributed connected components: min-label propagation rounds.

    pairs_ds: Dataset of (id_a, id_b). Returns Dataset (node, label).
    Each round: every node adopts the min label among itself and its
    neighbors (groupby(node).min). Converges when a round changes nothing.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    # edge list both directions + self edges
    def explode(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        node = np.concatenate([a, b])
        peer = np.concatenate([b, a])
        return pa.table({"node": pa.array(node, pa.int64()), "peer": pa.array(peer, pa.int64())})

    edges = pairs_ds.map_batches(explode, batch_format="pyarrow").materialize()
    # label(n) = n initially; each round label(n) = min(label(n), label(peers))
    labels = edges.groupby("node").aggregate(Min("peer", alias_name="label")).materialize()

    def join_round(labels):
        # peer labels: edges ⋈ labels on peer -> (node, peer_label)
        lab_tbl = labels.to_pandas()
        lab_map = dict(zip(lab_tbl["node"], lab_tbl["label"]))

        def relabel(batch: pa.Table) -> pa.Table:
            node = batch["node"].to_numpy(zero_copy_only=False)
            peer = batch["peer"].to_numpy(zero_copy_only=False)
            pl = np.array([lab_map.get(int(p), int(p)) for p in peer], dtype=np.int64)
            nl = np.array([lab_map.get(int(nd), int(nd)) for nd in node], dtype=np.int64)
            return pa.table(
                {"node": pa.array(node, pa.int64()),
                 "cand": pa.array(np.minimum(pl, nl), pa.int64())}
            )

        return edges.map_batches(relabel, batch_format="pyarrow").groupby("node").aggregate(
            Min("cand", alias_name="label")
        ).materialize()

    prev = None
    for _ in range(max_rounds):
        labels = join_round(labels)
        cur = labels.to_pandas().sort_values("node").reset_index(drop=True)
        if prev is not None and cur.equals(prev):
            break
        prev = cur
    return labels


def rect_painter_union(boxes: np.ndarray) -> np.ndarray:
    """Union of axis-aligned boxes as disjoint boxes (vectorized painter).

    Boxes are inserted area-desc; each new box keeps only the parts not
    covered by already-kept pieces (subtract_rect_from_rects is interval
    math over the whole piece set at once).
    """
    if len(boxes) == 0:
        return boxes.reshape(0, 4)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    order = np.lexsort((np.arange(len(boxes)), -areas))
    pieces = np.empty((0, 4), dtype=np.float64)
    for i in order:
        mine = boxes[i : i + 1]
        for p in pieces:
            mine = kernels.subtract_rect_from_rects(mine, p)
            if len(mine) == 0:
                break
        if len(mine):
            pieces = np.concatenate([pieces, mine], axis=0)
    return pieces


def _rings_as_uv_rects(rings: list[np.ndarray]) -> np.ndarray | None:
    """If every ring is an L1 diamond, return their axis-rect bboxes in the
    45°-rotated frame (u=x+y, v=x−y); else None. Rect areas in uv-space are
    exactly 2× the xy areas (|det J| = 2)."""
    boxes = np.empty((len(rings), 4), dtype=np.float64)
    for i, ring in enumerate(rings):
        if len(ring) != 5:
            return None
        u = ring[:, 0] + ring[:, 1]
        v = ring[:, 0] - ring[:, 1]
        u0, u1, v0, v1 = u.min(), u.max(), v.min(), v.max()
        on_corner = ((u == u0) | (u == u1)) & ((v == v0) | (v == v1))
        area_uv = 0.5 * abs(np.sum(u[:-1] * v[1:] - u[1:] * v[:-1]))
        if not (on_corner.all() and area_uv == (u1 - u0) * (v1 - v0) and area_uv > 0):
            return None
        boxes[i] = [u0, v0, u1, v1]
    return boxes


def _rings_as_xy_rects(rings: list[np.ndarray]) -> np.ndarray | None:
    boxes = np.empty((len(rings), 4), dtype=np.float64)
    for i, ring in enumerate(rings):
        if len(ring) != 5:
            return None
        x, y = ring[:, 0], ring[:, 1]
        x0, x1, y0, y1 = x.min(), x.max(), y.min(), y.max()
        on_corner = ((x == x0) | (x == x1)) & ((y == y0) | (y == y1))
        area = kernels.ring_area(ring)
        if not (on_corner.all() and area == (x1 - x0) * (y1 - y0) and area > 0):
            return None
        boxes[i] = [x0, y0, x1, y1]
    return boxes


def painter_union_pieces(rings: list[np.ndarray], areas: np.ndarray) -> list[np.ndarray]:
    """Union of convex rings as disjoint pieces (painter's algorithm).

    Deterministic order: area desc (ties by input position) — the
    reference's update_geometries sort (duplicates.py:67-76). Row i keeps
    geometry minus the union of all earlier (= larger) rows; the kept
    pieces of every row partition the union.
    """
    order = np.lexsort((np.arange(len(rings)), -areas))
    pieces: list[np.ndarray] = []
    for i in order:
        mine = [rings[i]]
        for p in pieces:
            nxt = []
            for m in mine:
                nxt.extend(kernels.convex_difference_pieces(m, p))
            mine = nxt
            if not mine:
                break
        pieces.extend(mine)
    return pieces


def union_pieces_and_area(rings: list[np.ndarray], areas: np.ndarray):
    """(pieces, union_area) — fast rect/diamond paths, generic fallback."""
    xyr = _rings_as_xy_rects(rings)
    if xyr is not None:
        boxes = rect_painter_union(xyr)
        area = float(((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])).sum())
        return list(kernels.rects_to_rings(boxes)), area
    uvr = _rings_as_uv_rects(rings)
    if uvr is not None:
        boxes = rect_painter_union(uvr)
        area = float(((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])).sum()) / 2.0
        # map uv rects back to xy quads: x=(u+v)/2, y=(u−v)/2
        uv_rings = kernels.rects_to_rings(boxes)
        out = []
        for r in uv_rings:
            xy = np.stack([(r[:, 0] + r[:, 1]) / 2.0, (r[:, 0] - r[:, 1]) / 2.0], axis=1)
            out.append(xy)
        return out, area
    pieces = painter_union_pieces(rings, areas)
    return pieces, float(sum(kernels.ring_area(p) for p in pieces))


def union_area_of_group(g: pd.DataFrame) -> float:
    """Exact union area of one group of convex polygons."""
    pg = wkb.decode_polygons(g["geometry_wkb"].to_numpy())
    rings = [
        pg.coords[pg.ring_offsets[pg.poly_offsets[pg.geom_offsets[i]]] :
                  pg.ring_offsets[pg.poly_offsets[pg.geom_offsets[i]] + 1]]
        for i in range(len(pg))
    ]
    areas = kernels.polygon_areas(pg)
    _, area = union_pieces_and_area(rings, areas)
    return area


def dissolve_groups(grouped_ds, by: list[str]):
    """groupby(by).map_groups dissolve: union area + count per group.

    Output: by columns + n_members + union_area (float) + geometry_wkb of
    the disjoint union pieces as a MULTIPOLYGON.
    """

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        pg = wkb.decode_polygons(g["geometry_wkb"].to_numpy())
        rings = [
            pg.coords[pg.ring_offsets[pg.poly_offsets[pg.geom_offsets[i]]] :
                      pg.ring_offsets[pg.poly_offsets[pg.geom_offsets[i]] + 1]]
            for i in range(len(pg))
        ]
        areas = kernels.polygon_areas(pg)
        pieces, area = union_pieces_and_area(rings, areas)
        out = {c: [g[c].iloc[0]] for c in by}
        out["n_members"] = [len(g)]
        out["union_area"] = [area]
        out["geometry_wkb"] = [
            wkb.encode_multipolygon([[p] for p in pieces]) if pieces else None
        ]
        return pd.DataFrame(out)

    return grouped_ds.groupby(by[0] if len(by) == 1 else by).map_groups(
        agg, batch_format="pandas"
    )
