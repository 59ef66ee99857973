"""clean_overlay — spatial set operations between two polygon datasets.

Reproduces the semantics of the reference's flagship operator
(/root/reference/src/sgis/geopandas_tools/overlay.py:31-151, core
``_shapely_pd_overlay``:199-257):

* ``how`` ∈ {intersection, union, identity, symmetric_difference,
  difference, update};
* candidate pairs via STRtree 'intersects' query (overlay.py:210-211);
* per-``how`` vectorized geometry math; difference groups pairs by left
  row and subtracts the union of matched right geoms (overlay.py:399-423);
* unmatched left rows ride through difference/union legs
  (``_add_indices_from_left``:384-385); unmatched right rows join union/
  symmetric_difference with right columns (``_add_from_right``:388-396);
* suffixes ``_1``/``_2`` applied ONLY to columns present in both inputs
  (``_add_suffix_left``:372-381), skipped for difference/update;
* geometry column last; null/empty geometries dropped (overlay.py:241-255).

Engine plan (broadcast right side): the right table is ``ray.put`` once;
an actor pool decodes it + builds the STRtree in ``__init__``; each batch
of the left side is processed vectorized-per-pair. Geometry math is
tiered: axis-aligned rect×rect pairs use pure interval math; hole-free
convex×convex pairs use the Sutherland–Hodgman / convex-complement
kernels; everything else (concave, holed, multi-part — the general case
the reference gets from GEOS) goes through the scanline boolean engine
in geo/booleans.py, which emits polygons-with-holes.

Unsupported: grid_size snapping (the integer-exact world needs none).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..geo import booleans, kernels, wkb
from ..geo.strtree import STRtree

HOWS = ("intersection", "union", "identity", "symmetric_difference", "difference", "update")


def _rings_of_row(pg: wkb.PolygonArray, row: int) -> list[np.ndarray]:
    out = []
    for q in range(pg.geom_offsets[row], pg.geom_offsets[row + 1]):
        r0 = pg.poly_offsets[q]
        out.append(pg.coords[pg.ring_offsets[r0] : pg.ring_offsets[r0 + 1]])
    return out


def _pieces_to_wkb(pieces: list[np.ndarray]) -> bytes | None:
    pieces = [p for p in pieces if kernels.ring_area(p) > 0]
    if not pieces:
        return None
    if len(pieces) == 1:
        return wkb.encode_polygon([pieces[0]])
    return wkb.encode_multipolygon([[p] for p in pieces])


def _polys_to_wkb(polys: list[list[np.ndarray]]) -> bytes | None:
    """booleans.py output ([ [shell, holes...], ... ]) -> WKB."""
    polys = [p for p in polys if p and abs(kernels.ring_area(p[0])) > 0]
    if not polys:
        return None
    if len(polys) == 1:
        return wkb.encode_polygon(polys[0])
    return wkb.encode_multipolygon(polys)


def _row_passthrough_wkb(pg: wkb.PolygonArray, row: int) -> bytes | None:
    """Re-encode a row with EVERY ring of every part (shells + holes).

    Pass-through rows (no intersecting right row) must keep interior holes,
    matching the reference's GEOS behavior where untouched geometries ride
    through difference/identity/update unchanged (overlay.py:384-385)."""
    polys = []
    for q in range(pg.geom_offsets[row], pg.geom_offsets[row + 1]):
        r0, r1 = pg.poly_offsets[q], pg.poly_offsets[q + 1]
        polys.append(
            [pg.coords[pg.ring_offsets[r] : pg.ring_offsets[r + 1]]
             for r in range(r0, r1)]
        )
    return _polys_to_wkb(polys)


def _row_fastpath(pg: wkb.PolygonArray, row: int) -> bool:
    """True when every part is a hole-free convex single ring (eligible
    for the Sutherland–Hodgman / convex-complement kernels)."""
    for q in range(pg.geom_offsets[row], pg.geom_offsets[row + 1]):
        r0, r1 = pg.poly_offsets[q], pg.poly_offsets[q + 1]
        if r1 - r0 != 1:
            return False
        ring = pg.coords[pg.ring_offsets[r0] : pg.ring_offsets[r0 + 1]]
        if not kernels.is_convex_ring(ring):
            return False
    return True


def _subtract_all(subject_rings: list[np.ndarray], clip_rings: list[np.ndarray]) -> list[np.ndarray]:
    """subject − union(clips): successive convex-complement subtraction.

    Fast path for convex clip rings only (callers route holed/concave
    operands through booleans.boolean_polygons). Pieces stay convex, so
    chained subtraction is exact and the resulting pieces are disjoint.
    """
    pieces = list(subject_rings)
    for clip in clip_rings:
        nxt: list[np.ndarray] = []
        for p in pieces:
            nxt.extend(kernels.convex_difference_pieces(p, clip))
        pieces = nxt
        if not pieces:
            break
    return pieces


def snap_polygon_coords(pg: wkb.PolygonArray, grid_size: float) -> wkb.PolygonArray:
    """GEOS-style grid_size snapping (clean_overlay's ``grid_size`` arg):
    every coordinate rounds to the nearest multiple of grid_size BEFORE
    the geometry math, so near-coincident boundaries become exactly
    coincident (the reference forwards this to shapely's overlay)."""
    snapped = np.round(pg.coords / grid_size) * grid_size
    return wkb.PolygonArray(
        coords=snapped,
        ring_offsets=pg.ring_offsets,
        poly_offsets=pg.poly_offsets,
        geom_offsets=pg.geom_offsets,
    )


class OverlayActor:
    """Actor-pool stage computing one ``how`` of clean_overlay per batch."""

    def __init__(self, right_ref, how: str, lsuffix="_1", rsuffix="_2",
                 emit: str = "geometry", grid_size: float | None = None):
        if how not in HOWS:
            raise ValueError(f"how must be one of {HOWS}, got {how!r}")
        if emit == "area" and how not in ("intersection",):
            raise ValueError("emit='area' is an intersection-only pushdown")
        # emit="area": projection pushdown — skip WKB encode and emit a
        # piece_area column instead of geometry (for area-only consumers)
        self.emit = emit
        self.grid_size = grid_size
        right: pa.Table = ray.get(right_ref)
        self.right = right
        self.how = how
        self.lsuffix = lsuffix
        self.rsuffix = rsuffix
        self.rpg = wkb.decode_polygons(right["geometry_wkb"])
        if grid_size is not None:
            self.rpg = snap_polygon_coords(self.rpg, grid_size)
        self.rbounds = kernels.polygon_bounds(self.rpg)
        self.tree = STRtree(self.rbounds)
        self.right_cols = [c for c in right.column_names if c != "geometry_wkb"]
        # rectangle fast path: axis-aligned boxes stay boxes under clip and
        # subtract, so rect×rect pairs use pure interval math (vectorized)
        self.r_is_rect = kernels.detect_axis_rects(self.rpg)
        # rectilinear fast path: ANY axis-parallel polygon (L-shapes, holed
        # boxes) decomposes once into disjoint rects; pair math stays
        # vectorized interval arithmetic
        self.r_rects, self.r_offs, self.r_rlin = kernels.decompose_rectilinear(self.rpg)

    # -- column plumbing ---------------------------------------------------
    def _suffix_plan(self, left_cols: list[str], with_suffix: bool):
        both = set(left_cols) & set(self.right_cols)
        if not with_suffix:
            both = set()
        lmap = {c: (c + self.lsuffix if c in both else c) for c in left_cols}
        rmap = {c: (c + self.rsuffix if c in both else c) for c in self.right_cols}
        return lmap, rmap

    def _emit(self, left: pa.Table, li: np.ndarray, ri: np.ndarray | None,
              geoms, with_suffix: bool, area_col: bool = False):
        left_cols = [c for c in left.column_names if c != "geometry_wkb"]
        lmap, rmap = self._suffix_plan(left_cols, with_suffix)
        lt = left.take(pa.array(li, pa.int64()))
        if area_col and (ri is None or (ri >= 0).all()):
            # hot area path: stay zero-copy Arrow end to end (the pandas
            # block-manager copies dominated the 27.8M-row bench output)
            cols = {lmap[c]: lt[c] for c in left_cols}
            if ri is not None:
                rt = self.right.take(pa.array(ri, pa.int64()))
                for c in self.right_cols:
                    cols[rmap[c]] = rt[c]
            cols["piece_area"] = pa.array(np.asarray(geoms, np.float64),
                                          pa.float64())
            return pa.table(cols)
        data = {}
        for c in left_cols:
            data[lmap[c]] = lt[c].to_pandas()
        if ri is not None:
            rt = self.right.take(pa.array(np.where(ri < 0, 0, ri), pa.int64()))
            for c in self.right_cols:
                col = rt[c].to_pandas()
                col[ri < 0] = None
                data[rmap[c]] = col
        df = pd.DataFrame(data)
        if area_col:
            df["piece_area"] = geoms  # float areas, no geometry payload
        else:
            df["geometry_wkb"] = geoms  # geometry last, as the reference does
        return df

    # -- geometry legs -----------------------------------------------------
    def _pairs(self, lpg: wkb.PolygonArray, l_is_rect: np.ndarray,
               l_rlin: np.ndarray | None = None):
        lb = kernels.polygon_bounds(lpg)
        qi, pi = self.tree.query_bbox(lb)
        if len(qi):
            # rect×rect: bbox overlap IS the exact boundary-inclusive
            # intersects test — skip the generic refine for those pairs.
            # rlin×rlin pairs also skip the (per-pair python) refine: the
            # downstream legs are insensitive to false candidates — the
            # vectorized area filter drops empty intersections, and
            # subtracting a non-overlapping clip is a no-op.
            both_rect = l_is_rect[qi] & self.r_is_rect[pi]
            skip = both_rect
            if l_rlin is not None:
                skip = skip | (l_rlin[qi] & self.r_rlin[pi])
            gi = np.nonzero(~skip)[0]
            keep = np.ones(len(qi), dtype=bool)
            if len(gi):
                keep[gi] = kernels.polygons_intersect_pairs(
                    lpg, self.rpg, qi[gi], pi[gi]
                )
            qi, pi = qi[keep], pi[keep]
        return qi, pi

    def _intersection_leg(self, left, lpg, qi, pi, l_is_rect, lbounds,
                          with_suffix=True, l_decomp=None) -> pd.DataFrame:
        both_rect = l_is_rect[qi] & self.r_is_rect[pi] if len(qi) else np.zeros(0, bool)
        if l_decomp is None:
            l_decomp = kernels.decompose_rectilinear(lpg)
        l_rects, l_offs, l_rlin = l_decomp

        # vectorized rect×rect leg: interval math (+WKB encode only when
        # geometry output is requested)
        ri_idx = np.nonzero(both_rect)[0]
        boxes, ok = kernels.rect_intersection_boxes(
            lbounds[qi[ri_idx]], self.rbounds[pi[ri_idx]]
        ) if len(ri_idx) else (np.empty((0, 4)), np.zeros(0, bool))
        rect_li = qi[ri_idx][ok]
        rect_ri = pi[ri_idx][ok]
        rect_boxes = boxes[ok]
        area_only = self.emit == "area"
        if area_only:
            rect_geom: list = []
            rect_area = (rect_boxes[:, 2] - rect_boxes[:, 0]) * (
                rect_boxes[:, 3] - rect_boxes[:, 1]
            )
        else:
            rect_geom = wkb.encode_boxes_arrow(rect_boxes).to_pylist()

        # rectilinear×rectilinear leg: vectorized disjoint-rect interval math
        both_rlin = (
            l_rlin[qi] & self.r_rlin[pi] & ~both_rect if len(qi) else np.zeros(0, bool)
        )
        rl_idx = np.nonzero(both_rlin)[0]
        rl_li, rl_ri, rl_area, rl_geom = (
            np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0), [],
        )
        if len(rl_idx):
            areas = kernels.rect_sets_inter_areas(
                l_rects, l_offs, qi[rl_idx], self.r_rects, self.r_offs, pi[rl_idx]
            )
            pos = areas > 0
            rl_li, rl_ri, rl_area = qi[rl_idx][pos], pi[rl_idx][pos], areas[pos]
            if not area_only:
                for lrow, rrow in zip(rl_li, rl_ri):
                    boxes = kernels.rect_sets_inter_boxes(
                        l_rects, l_offs, int(lrow), self.r_rects, self.r_offs, int(rrow)
                    )
                    rl_geom.append(_pieces_to_wkb(list(kernels.rects_to_rings(boxes))))

        # generic leg (python per pair) for everything else
        out_li, out_ri, out_geom, out_area = [], [], [], []
        for k in np.nonzero(~both_rect & ~both_rlin)[0]:
            l_row, r_row = int(qi[k]), int(pi[k])
            if _row_fastpath(lpg, l_row) and _row_fastpath(self.rpg, r_row):
                # hole-free convex×convex: Sutherland–Hodgman per ring pair
                srings = _rings_of_row(lpg, l_row)
                crings = _rings_of_row(self.rpg, r_row)
                pieces = []
                for s in srings:
                    for c in crings:
                        clipped = kernels.clip_ring_convex(s, c)
                        if kernels.ring_area(clipped) > 0:
                            pieces.append(clipped)
                if not pieces:
                    continue
                area = sum(kernels.ring_area(p) for p in pieces)
                geom = None if area_only else _pieces_to_wkb(pieces)
            else:
                # general case: concave / holed / multi-part operands
                s_r, s_h = booleans.ringset_of_row(lpg, l_row)
                c_r, c_h = booleans.ringset_of_row(self.rpg, r_row)
                if area_only:
                    area = booleans.boolean_area(s_r, c_r, "intersection", s_h, c_h)
                    if area <= 0:
                        continue
                    geom = None
                else:
                    polys = booleans.boolean_polygons(s_r, c_r, "intersection", s_h, c_h)
                    geom = _polys_to_wkb(polys)
                    if geom is None:
                        continue
                    area = 0.0
            out_li.append(qi[k])
            out_ri.append(pi[k])
            if area_only:
                out_area.append(area)
            else:
                out_geom.append(geom)
        li = np.concatenate([rect_li, rl_li, np.array(out_li, np.int64)])
        ri = np.concatenate([rect_ri, rl_ri, np.array(out_ri, np.int64)])
        if area_only:
            areas = np.concatenate([rect_area, rl_area, np.array(out_area, np.float64)])
            return self._emit(left, li.astype(np.int64), ri.astype(np.int64),
                              areas, with_suffix, area_col=True)
        return self._emit(left, li.astype(np.int64), ri.astype(np.int64),
                          rect_geom + rl_geom + out_geom, with_suffix)

    def _difference_leg(self, left, lpg, qi, pi, l_is_rect, lbounds,
                        with_suffix=False, l_decomp=None) -> pd.DataFrame:
        n = len(lpg)
        if l_decomp is None:
            l_decomp = kernels.decompose_rectilinear(lpg)
        l_rects, l_offs, l_rlin = l_decomp
        out_li, out_geom = [], []
        # group matched right rows per left row (overlay.py:399-423 agg)
        by_left: dict[int, list[int]] = {}
        for k in range(len(qi)):
            by_left.setdefault(int(qi[k]), []).append(int(pi[k]))
        for i in range(n):
            if i not in by_left:
                g = _row_passthrough_wkb(lpg, i)  # untouched rows, holes kept
            elif l_rlin[i] and self.r_rlin[by_left[i]].all():
                # rectilinear subject − rectilinear clips: stay in interval
                # math; the remainder is always disjoint axis-aligned boxes
                rects = l_rects[l_offs[i] : l_offs[i + 1]]
                for r in by_left[i]:
                    for cb in self.r_rects[self.r_offs[r] : self.r_offs[r + 1]]:
                        rects = kernels.subtract_rect_from_rects(rects, cb)
                        if len(rects) == 0:
                            break
                    if len(rects) == 0:
                        break
                g = _pieces_to_wkb(list(kernels.rects_to_rings(rects))) if len(rects) else None
            elif _row_fastpath(lpg, i) and all(
                _row_fastpath(self.rpg, r) for r in by_left[i]
            ):
                clips = []
                for r in by_left[i]:
                    clips.extend(_rings_of_row(self.rpg, r))
                g = _pieces_to_wkb(_subtract_all(_rings_of_row(lpg, i), clips))
            else:
                s_r, s_h = booleans.ringset_of_row(lpg, i)
                c_r, c_h = [], []
                for r in by_left[i]:
                    rr, hh = booleans.ringset_of_row(self.rpg, r)
                    c_r.extend(rr)
                    c_h.extend(hh)
                # winding rule makes in_B the union of ALL clips at once
                g = _polys_to_wkb(
                    booleans.boolean_polygons(s_r, c_r, "difference", s_h, c_h)
                )
            if g is not None:
                out_li.append(i)
                out_geom.append(g)
        return self._emit(left, np.array(out_li, np.int64), None, out_geom, with_suffix)

    # -- main --------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        lpg = wkb.decode_polygons(batch["geometry_wkb"])
        if self.grid_size is not None:
            lpg = snap_polygon_coords(lpg, self.grid_size)
        l_is_rect = kernels.detect_axis_rects(lpg)
        lbounds = kernels.polygon_bounds(lpg)
        l_decomp = kernels.decompose_rectilinear(lpg)
        qi, pi = self._pairs(lpg, l_is_rect, l_rlin=l_decomp[2])
        how = self.how
        if how == "intersection":
            return self._intersection_leg(batch, lpg, qi, pi, l_is_rect, lbounds,
                                          l_decomp=l_decomp)
        if how == "difference":
            return self._difference_leg(batch, lpg, qi, pi, l_is_rect, lbounds,
                                        l_decomp=l_decomp)
        if how == "identity":
            # intersection + left difference legs (overlay.py:310-317)
            a = self._intersection_leg(batch, lpg, qi, pi, l_is_rect, lbounds,
                                       l_decomp=l_decomp)
            b = self._difference_leg(batch, lpg, qi, pi, l_is_rect, lbounds,
                                     with_suffix=True, l_decomp=l_decomp)
            return pd.concat([a, b], ignore_index=True)[list(a.columns)]
        if how == "update":
            # difference of left by right, then all right rows appended
            # (overlay.py:260-263)
            a = self._difference_leg(batch, lpg, qi, pi, l_is_rect, lbounds,
                                     l_decomp=l_decomp)
            return a
        raise NotImplementedError(
            f"how={how!r} needs the distributed right-leg plan (union/symdiff "
            "are composed at the Dataset level in clean_overlay())"
        )


class RightPairsEmitter:
    """Stage for the mirrored right leg of union/symmetric_difference
    (overlay.py:426-454 ``_shapely_diffclip_right``): emits one row per
    matching pair carrying (right_row, left exterior ring) so a
    ``groupby(right_id)`` can subtract the union of ALL matching left
    geometries from each right geometry — global state the per-batch
    actor cannot see."""

    def __init__(self, right_ref):
        self.idx_state = None
        self.right_ref = right_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.idx_state is None:
            right: pa.Table = ray.get(self.right_ref)
            rpg = wkb.decode_polygons(right["geometry_wkb"])
            self.idx_state = (
                right, rpg, STRtree(kernels.polygon_bounds(rpg)),
                kernels.detect_axis_rects(rpg),
            )
        right, rpg, tree, r_is_rect = self.idx_state
        lpg = wkb.decode_polygons(batch["geometry_wkb"])
        l_is_rect = kernels.detect_axis_rects(lpg)
        lb = kernels.polygon_bounds(lpg)
        qi, pi = tree.query_bbox(lb)
        if len(qi):
            # rect×rect: bbox overlap IS the exact test — skip generic refine
            both_rect = l_is_rect[qi] & r_is_rect[pi]
            keep = np.ones(len(qi), dtype=bool)
            gi = np.nonzero(~both_rect)[0]
            if len(gi):
                keep[gi] = kernels.polygons_intersect_pairs(lpg, rpg, qi[gi], pi[gi])
            qi, pi = qi[keep], pi[keep]
        left_geom = batch["geometry_wkb"].take(pa.array(qi, pa.int64()))
        return pa.table(
            {
                "right_row": pa.array(pi.astype(np.int64), pa.int64()),
                "left_geom": left_geom,
            }
        )


def _right_diff_kernel(right_table: pa.Table):
    """Group kernel: right row − union(matching left geoms)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        row = int(g["right_row"].iloc[0])
        rpg = wkb.decode_polygons(right_table["geometry_wkb"].slice(row, 1))
        lpg = wkb.decode_polygons(g["left_geom"].to_numpy())
        # rectilinear fast path: subject and all clips axis-parallel ->
        # disjoint-rect interval math (covers plain rects, L-shapes, holes)
        s_rects, s_offs, s_rlin = kernels.decompose_rectilinear(rpg)
        c_rects, c_offs, c_rlin = kernels.decompose_rectilinear(lpg)
        if s_rlin[0] and c_rlin.all():
            rects = s_rects[s_offs[0] : s_offs[1]]
            for cb in c_rects:
                rects = kernels.subtract_rect_from_rects(rects, cb)
                if len(rects) == 0:
                    break
            gwkb = (_pieces_to_wkb(list(kernels.rects_to_rings(rects)))
                    if len(rects) else None)
        elif _row_fastpath(rpg, 0) and all(
            _row_fastpath(lpg, i) for i in range(len(lpg))
        ):
            subject = _rings_of_row(rpg, 0)
            clips = []
            for i in range(len(lpg)):
                clips.extend(_rings_of_row(lpg, i))
            gwkb = _pieces_to_wkb(_subtract_all(subject, clips))
        else:
            s_r, s_h = booleans.ringset_of_row(rpg, 0)
            c_r, c_h = [], []
            for i in range(len(lpg)):
                rr, hh = booleans.ringset_of_row(lpg, i)
                c_r.extend(rr)
                c_h.extend(hh)
            gwkb = _polys_to_wkb(
                booleans.boolean_polygons(s_r, c_r, "difference", s_h, c_h)
            )
        out = {c: [right_table[c][row].as_py()] for c in right_table.column_names
               if c != "geometry_wkb"}
        out["geometry_wkb"] = [gwkb]
        df = pd.DataFrame(out)
        return df[df["geometry_wkb"].notna()]

    return fn


def overlay_union_legs(
    left,
    right_table: pa.Table,
    how: str = "union",
    concurrency: int | tuple = (1, 8),
    batch_size: int = 512,
):
    """union / symmetric_difference / update via composed legs.

    union = intersection ⊎ left-difference ⊎ right-difference legs;
    symmetric_difference drops the intersection leg; update = left
    difference ⊎ untouched right rows (overlay.py:260-307). The
    right-difference leg shuffles (right_id, matching left geom) pairs and
    subtracts per right row in ``groupby(right_id).map_groups`` — the only
    leg that needs global match state. Arbitrary (concave/holed) operands
    are handled by the boolean engine. Returns a Dataset whose rows carry a
    ``leg`` column ('inter' | 'left' | 'right') plus the suffixed columns
    of the participating sides (absent side columns are null).
    """
    if how not in ("union", "symmetric_difference", "update"):
        raise ValueError(how)
    ref = ray.put(right_table)

    left_cols = [c for c in left.schema().names if c != "geometry_wkb"]
    right_cols = [c for c in right_table.column_names if c != "geometry_wkb"]
    both = set(left_cols) & set(right_cols)
    lmap = {c: (c + "_1" if c in both else c) for c in left_cols}
    rmap = {c: (c + "_2" if c in both else c) for c in right_cols}
    all_cols = (
        [lmap[c] for c in left_cols]
        + [rmap[c] for c in right_cols if rmap[c] not in set(lmap.values())]
        + ["leg", "geometry_wkb"]
    )

    def norm(leg_name: str, rename: dict):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.rename(columns=rename)
            df["leg"] = leg_name
            for c in all_cols:
                if c not in df.columns:
                    df[c] = None
            return df[all_cols]

        return fn

    legs = []
    if how == "union":
        inter = left.map_batches(
            OverlayActor,
            fn_constructor_kwargs={"right_ref": ref, "how": "intersection"},
            batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
        ).map_batches(norm("inter", {}), batch_format="pandas")
        legs.append(inter)
    ldiff = left.map_batches(
        OverlayActor,
        fn_constructor_kwargs={"right_ref": ref, "how": "difference"},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    ).map_batches(norm("left", lmap), batch_format="pandas")
    legs.append(ldiff)
    if how in ("union", "symmetric_difference"):
        pairs = left.map_batches(
            RightPairsEmitter,
            fn_constructor_kwargs={"right_ref": ref},
            batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
        ).materialize()  # consumed twice: grouped subtraction + matched-id scan
        rdiff = pairs.groupby("right_row").map_groups(
            _right_diff_kernel(right_table), batch_format="pandas"
        ).map_batches(norm("right", rmap), batch_format="pandas")
        legs.append(rdiff)
        # unmatched right rows ride through with original geometry
        matched = set()
        for b in pairs.select_columns(["right_row"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            matched.update(b["right_row"].to_pylist())
        unmatched_rows = [i for i in range(len(right_table)) if i not in matched]
        if unmatched_rows:
            import ray.data as rd

            um = right_table.take(pa.array(unmatched_rows, pa.int64())).to_pandas()
            legs.append(rd.from_pandas(norm("right", rmap)(um)))
    if how == "update":
        import ray.data as rd

        um = right_table.to_pandas()
        legs.append(rd.from_pandas(norm("right", rmap)(um)))
    out = legs[0]
    for l in legs[1:]:
        out = out.union(l)
    return out


def clean_overlay(
    left,
    right_table: pa.Table,
    how: str = "intersection",
    concurrency: int | tuple = (1, 8),
    batch_size: int = 512,
    emit: str = "geometry",
    left_crs: str | None = None,
    grid_size: float | None = None,
):
    """Dataset-level clean_overlay (broadcast right side).

    Default batch_size is small: overlay output fans out (one row per
    intersecting pair), so small input batches keep the actor pool busy in
    parallel and bound per-batch output size.

    For union/symmetric_difference the unmatched-right leg (right rows with
    no intersection at all, overlay.py:388-396) requires knowing global
    match state of the right side; with a broadcast right table this is
    computed by an extra semi-join pass and appended as a driver-side
    (small) table union.
    """
    if how not in HOWS:
        raise ValueError(f"how must be one of {HOWS}")
    from ..geo import crs as crs_mod

    crs_mod.check_crs_pair(left_crs, right_table)  # overlay.py:83-84 guard
    ref = ray.put(right_table)
    if how in ("intersection", "difference", "identity"):
        return left.map_batches(
            OverlayActor,
            fn_constructor_kwargs={"right_ref": ref, "how": how, "emit": emit,
                                   "grid_size": grid_size},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    raise NotImplementedError(
        "union/symmetric_difference/update compose intersection+difference "
        "legs with a right-side match pass; use overlay_union_area() or the "
        "per-how legs for now"
    )
