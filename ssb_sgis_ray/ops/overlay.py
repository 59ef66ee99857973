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

from ..pool import default_pool

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


class RightGeoms:
    """Decoded right-side geometry index: polygons + STRtree + the rect /
    rectilinear fast-path state. Built once per broadcast actor OR once per
    cell group in the co-partitioned plan — the same tiered math runs over
    either."""

    def __init__(self, right: pa.Table, grid_size: float | None = None):
        self.table = right
        self.rpg = wkb.decode_polygons(right["geometry_wkb"])
        if grid_size is not None:
            self.rpg = snap_polygon_coords(self.rpg, grid_size)
        self.rbounds = kernels.polygon_bounds(self.rpg)
        self.tree = STRtree(self.rbounds)
        self.cols = [c for c in right.column_names if c != "geometry_wkb"]
        # rectangle fast path: axis-aligned boxes stay boxes under clip and
        # subtract, so rect×rect pairs use pure interval math (vectorized)
        self.r_is_rect = kernels.detect_axis_rects(self.rpg)
        # rectilinear fast path: ANY axis-parallel polygon (L-shapes, holed
        # boxes) decomposes once into disjoint rects; pair math stays
        # vectorized interval arithmetic
        self.r_rects, self.r_offs, self.r_rlin = kernels.decompose_rectilinear(self.rpg)


def _as_right_geoms(obj, grid_size: float | None = None) -> RightGeoms:
    """Accept a prebuilt RightGeoms OR a raw Arrow table.

    Broadcast call sites ray.put the PREBUILT index so the decode +
    STRtree + rect-decomposition work happens once on the driver instead
    of once per actor (at sf0.1/150k rights that build costs ~9 s — with
    a ~28-actor pool it was ~250 s of redundant CPU and the whole pass-1
    ramp-up of overlay_union)."""
    return obj if isinstance(obj, RightGeoms) else RightGeoms(obj, grid_size)


def find_candidate_pairs(lpg: wkb.PolygonArray, l_is_rect: np.ndarray,
                         R: RightGeoms, l_rlin: np.ndarray | None = None):
    """STRtree bbox query + exact refine -> (left rows, right rows).

    rect×rect pairs skip the refine (bbox overlap IS the boundary-inclusive
    intersects test); rlin×rlin pairs skip it too — downstream legs are
    insensitive to false candidates (vectorized area filters drop empty
    intersections, subtracting a non-overlapping clip is a no-op)."""
    lb = kernels.polygon_bounds(lpg)
    qi, pi = R.tree.query_bbox(lb)
    if len(qi):
        both_rect = l_is_rect[qi] & R.r_is_rect[pi]
        skip = both_rect
        if l_rlin is not None:
            skip = skip | (l_rlin[qi] & R.r_rlin[pi])
        gi = np.nonzero(~skip)[0]
        keep = np.ones(len(qi), dtype=bool)
        if len(gi):
            keep[gi] = kernels.polygons_intersect_pairs(lpg, R.rpg, qi[gi], pi[gi])
        qi, pi = qi[keep], pi[keep]
    return qi, pi


def intersection_pieces(lpg: wkb.PolygonArray, lbounds: np.ndarray,
                        l_decomp, l_is_rect: np.ndarray, R: RightGeoms,
                        qi: np.ndarray, pi: np.ndarray, area_only: bool):
    """Tiered per-pair intersection math (rect interval → rectilinear
    decomposition → Sutherland–Hodgman convex → scanline boolean engine).

    Returns (li, ri, areas | None, geoms | None) — the geometry core of
    the intersection leg, shared by the broadcast actor and the per-cell
    co-partitioned kernel."""
    both_rect = l_is_rect[qi] & R.r_is_rect[pi] if len(qi) else np.zeros(0, bool)
    l_rects, l_offs, l_rlin = l_decomp

    # vectorized rect×rect leg: interval math (+WKB encode only when
    # geometry output is requested)
    ri_idx = np.nonzero(both_rect)[0]
    boxes, ok = kernels.rect_intersection_boxes(
        lbounds[qi[ri_idx]], R.rbounds[pi[ri_idx]]
    ) if len(ri_idx) else (np.empty((0, 4)), np.zeros(0, bool))
    rect_li = qi[ri_idx][ok]
    rect_ri = pi[ri_idx][ok]
    rect_boxes = boxes[ok]
    if area_only:
        rect_geom: list = []
        rect_area = (rect_boxes[:, 2] - rect_boxes[:, 0]) * (
            rect_boxes[:, 3] - rect_boxes[:, 1]
        )
    else:
        rect_area = np.zeros(0)
        rect_geom = wkb.encode_boxes_arrow(rect_boxes).to_pylist()

    # rectilinear×rectilinear leg: vectorized disjoint-rect interval math
    both_rlin = (
        l_rlin[qi] & R.r_rlin[pi] & ~both_rect if len(qi) else np.zeros(0, bool)
    )
    rl_idx = np.nonzero(both_rlin)[0]
    rl_li, rl_ri, rl_area, rl_geom = (
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0), [],
    )
    if len(rl_idx):
        areas = kernels.rect_sets_inter_areas(
            l_rects, l_offs, qi[rl_idx], R.r_rects, R.r_offs, pi[rl_idx]
        )
        pos = areas > 0
        rl_li, rl_ri, rl_area = qi[rl_idx][pos], pi[rl_idx][pos], areas[pos]
        if not area_only:
            for lrow, rrow in zip(rl_li, rl_ri):
                boxes = kernels.rect_sets_inter_boxes(
                    l_rects, l_offs, int(lrow), R.r_rects, R.r_offs, int(rrow)
                )
                rl_geom.append(_pieces_to_wkb(list(kernels.rects_to_rings(boxes))))

    # generic leg (python per pair) for everything else
    out_li, out_ri, out_geom, out_area = [], [], [], []
    for k in np.nonzero(~both_rect & ~both_rlin)[0]:
        l_row, r_row = int(qi[k]), int(pi[k])
        if _row_fastpath(lpg, l_row) and _row_fastpath(R.rpg, r_row):
            # hole-free convex×convex: Sutherland–Hodgman per ring pair
            srings = _rings_of_row(lpg, l_row)
            crings = _rings_of_row(R.rpg, r_row)
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
            c_r, c_h = booleans.ringset_of_row(R.rpg, r_row)
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
    li = np.concatenate([rect_li, rl_li, np.array(out_li, np.int64)]).astype(np.int64)
    ri = np.concatenate([rect_ri, rl_ri, np.array(out_ri, np.int64)]).astype(np.int64)
    if area_only:
        areas = np.concatenate([rect_area, rl_area, np.array(out_area, np.float64)])
        return li, ri, areas, None
    return li, ri, None, rect_geom + rl_geom + out_geom


def subtract_union_wkb(spg: wkb.PolygonArray, srow: int,
                       cpg: wkb.PolygonArray, crows) -> bytes | None:
    """One subject row − union(clip rows) -> WKB | None (fully covered).

    Tiered: rectilinear interval math → convex-complement chain → scanline
    boolean engine (winding rule unions all clips in one pass). Shared by
    the broadcast right-diff kernel and the co-partitioned difference."""
    crows = [int(r) for r in crows]
    if not crows:
        return _row_passthrough_wkb(spg, srow)
    # covers short-circuit: a single-rect clip whose bounds cover the
    # subject bbox erases the row (geometry ⊆ bbox) — skip all tiers
    sb = kernels.polygon_bounds(spg)[srow]
    cb = kernels.polygon_bounds(cpg)[crows]
    c_is_rect = kernels.detect_axis_rects(cpg)[crows]
    if bool(np.any(
        c_is_rect
        & (cb[:, 0] <= sb[0]) & (cb[:, 1] <= sb[1])
        & (cb[:, 2] >= sb[2]) & (cb[:, 3] >= sb[3])
    )):
        return None
    s_rects, s_offs, s_rlin = kernels.decompose_rectilinear(spg)
    c_rects, c_offs, c_rlin = kernels.decompose_rectilinear(cpg)
    if s_rlin[srow] and c_rlin[crows].all():
        rects = s_rects[s_offs[srow] : s_offs[srow + 1]]
        for r in crows:
            for cb in c_rects[c_offs[r] : c_offs[r + 1]]:
                rects = kernels.subtract_rect_from_rects(rects, cb)
                if len(rects) == 0:
                    break
            if len(rects) == 0:
                break
        return (_pieces_to_wkb(list(kernels.rects_to_rings(rects)))
                if len(rects) else None)
    if _row_fastpath(spg, srow) and all(_row_fastpath(cpg, r) for r in crows):
        clips = []
        for r in crows:
            clips.extend(_rings_of_row(cpg, r))
        return _pieces_to_wkb(_subtract_all(_rings_of_row(spg, srow), clips))
    s_r, s_h = booleans.ringset_of_row(spg, srow)
    c_r, c_h = [], []
    for r in crows:
        rr, hh = booleans.ringset_of_row(cpg, r)
        c_r.extend(rr)
        c_h.extend(hh)
    return _polys_to_wkb(booleans.boolean_polygons(s_r, c_r, "difference", s_h, c_h))


class OverlayActor:
    """Actor-pool stage computing one ``how`` of clean_overlay per batch."""

    def __init__(self, right_ref=None, how: str = "intersection",
                 lsuffix="_1", rsuffix="_2",
                 emit: str = "geometry", grid_size: float | None = None,
                 right_table: pa.Table | None = None):
        if how not in HOWS:
            raise ValueError(f"how must be one of {HOWS}, got {how!r}")
        if emit == "area" and how not in ("intersection",):
            raise ValueError("emit='area' is an intersection-only pushdown")
        # emit="area": projection pushdown — skip WKB encode and emit a
        # piece_area column instead of geometry (for area-only consumers)
        self.emit = emit
        self.grid_size = grid_size
        right = right_table if right_table is not None else ray.get(right_ref)
        self.R = _as_right_geoms(right, grid_size)
        right = self.R.table
        self.right = right
        self.how = how
        self.lsuffix = lsuffix
        self.rsuffix = rsuffix
        self.rpg = self.R.rpg
        self.rbounds = self.R.rbounds
        self.tree = self.R.tree
        self.right_cols = self.R.cols
        self.r_is_rect = self.R.r_is_rect
        self.r_rects, self.r_offs, self.r_rlin = (
            self.R.r_rects, self.R.r_offs, self.R.r_rlin
        )

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
        return find_candidate_pairs(lpg, l_is_rect, self.R, l_rlin)

    def _intersection_leg(self, left, lpg, qi, pi, l_is_rect, lbounds,
                          with_suffix=True, l_decomp=None) -> pd.DataFrame:
        if l_decomp is None:
            l_decomp = kernels.decompose_rectilinear(lpg)
        area_only = self.emit == "area"
        li, ri, areas, geoms = intersection_pieces(
            lpg, lbounds, l_decomp, l_is_rect, self.R, qi, pi, area_only
        )
        if area_only:
            return self._emit(left, li, ri, areas, with_suffix, area_col=True)
        return self._emit(left, li, ri, geoms, with_suffix)

    def _difference_leg(self, left, lpg, qi, pi, l_is_rect, lbounds,
                        with_suffix=False, l_decomp=None) -> pd.DataFrame:
        n = len(lpg)
        if l_decomp is None:
            l_decomp = kernels.decompose_rectilinear(lpg)
        l_rects, l_offs, l_rlin = l_decomp
        out_li, out_geom = [], []
        # vectorized areas pre-pass: the Klee/boolean area kernel computes
        # each left's remaining area far faster than the per-clip geometry
        # subtraction (covers short-circuit included). A row whose
        # remainder area is 0 emits no geometry — in the dense synth mix
        # that is ~97% of matched lefts, so the expensive geometry loop
        # only runs for true survivors. Exactness: areas are >= 0.5 in the
        # integer/half-integer world, so the 1e-6 cut can't drop a real
        # remainder; a float-residue false survivor just runs the loop and
        # produces None as before.
        dead: set[int] = set()
        if len(qi):
            d = difference_areas(lpg, self.R, qi, pi, l_decomp)
            zero = np.nonzero(d <= 1e-6)[0]
            matched = np.unique(qi)
            dead = set(np.intersect1d(zero, matched).tolist())
            if dead:
                alive = ~np.isin(qi, list(dead))
                qi, pi = qi[alive], pi[alive]
        # group matched right rows per left row (overlay.py:399-423 agg)
        by_left: dict[int, list[int]] = {}
        for k in range(len(qi)):
            by_left.setdefault(int(qi[k]), []).append(int(pi[k]))
        for i in range(n):
            if i in dead:
                continue
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
            R = _as_right_geoms(ray.get(self.right_ref))
            self.idx_state = (R.table, R.rpg, R.tree, R.r_is_rect)
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
        gwkb = subtract_union_wkb(rpg, 0, lpg, range(len(lpg)))
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
    concurrency: int | tuple | None = None,
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
    concurrency = default_pool(concurrency)
    # prebuilt index shared by all three actor pools below (see
    # _as_right_geoms on why this is built once on the driver)
    ref = ray.put(RightGeoms(right_table))

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

    # explicit per-column Arrow types: every leg emits the SAME schema
    # (absent side columns become typed nulls, not arrow null-type columns —
    # schema-unstable RefBundles defeat the streaming executor's fusion)
    ltypes = dict(zip(left.schema().names, left.schema().types))
    target_types: dict[str, pa.DataType] = {}
    for c in left_cols:
        target_types[lmap[c]] = ltypes[c]
    for c in right_cols:
        target_types.setdefault(rmap[c], right_table.schema.field(c).type)
    target_types["leg"] = pa.string()
    target_types["geometry_wkb"] = pa.binary()

    def norm(leg_name: str, rename: dict):
        def fn(df: pd.DataFrame) -> pa.Table:
            df = df.rename(columns=rename)
            arrays = []
            for c in all_cols:
                if c == "leg":
                    arrays.append(pa.array([leg_name] * len(df), pa.string()))
                elif c in df.columns:
                    arrays.append(
                        pa.Array.from_pandas(df[c], type=target_types[c])
                    )
                else:
                    arrays.append(pa.nulls(len(df), target_types[c]))
            return pa.table(dict(zip(all_cols, arrays)))

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
        import ray.data as rd
        from ray.data.aggregate import Count

        pairs = left.map_batches(
            RightPairsEmitter,
            fn_constructor_kwargs={"right_ref": ref},
            batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
        ).materialize()  # consumed twice: grouped subtraction + matched-id scan
        rdiff = pairs.groupby("right_row").map_groups(
            _right_diff_kernel(right_table), batch_format="pandas"
        ).map_batches(norm("right", rmap), batch_format="pandas")
        legs.append(rdiff)
        # unmatched right rows ride through with original geometry —
        # distributed anti-join on right_row (no driver-side id set)
        right_rows = rd.from_arrow(
            right_table.append_column(
                "right_row", pa.array(np.arange(len(right_table)), pa.int64())
            )
        )
        if pairs.count() == 0:
            legs.append(
                right_rows.drop_columns(["right_row"])
                .map_batches(norm("right", rmap), batch_format="pandas")
            )
        else:
            matched_ids = (
                pairs.select_columns(["right_row"])
                .groupby("right_row")
                .aggregate(Count(alias_name="__m"))
            )
            # anti-join: matched right_row ids are bounded by the (already
            # broadcast-bounded) right table, so a broadcast membership
            # filter replaces the hash-join exchange (ops/lookup.py)
            from .lookup import membership_filter

            um = membership_filter(
                right_rows, matched_ids, "right_row", anti=True,
            ).map_batches(
                lambda b: b.drop_columns(["right_row"]),
                batch_format="pyarrow",
            )
            legs.append(um.map_batches(norm("right", rmap), batch_format="pandas"))
    if how == "update":
        import ray.data as rd

        # ALL right rows ride through unchanged (overlay.py:260-263) — as a
        # streamed Dataset, not a driver-side pandas materialization
        legs.append(
            rd.from_arrow(right_table).map_batches(
                norm("right", rmap), batch_format="pandas"
            )
        )
    out = legs[0]
    for l in legs[1:]:
        out = out.union(l)
    return out


def clean_overlay(
    left,
    right_table: pa.Table,
    how: str = "intersection",
    concurrency: int | tuple | None = None,
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
    concurrency = default_pool(concurrency)
    from ..geo import crs as crs_mod

    crs_mod.check_crs_pair(left_crs, right_table)  # overlay.py:83-84 guard
    ref = ray.put(RightGeoms(right_table, grid_size))
    if how in ("intersection", "difference", "identity"):
        return left.map_batches(
            OverlayActor,
            fn_constructor_kwargs={"right_ref": ref, "how": how, "emit": emit,
                                   "grid_size": grid_size},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    # union / symmetric_difference / update: composed legs (the reference
    # accepts all six hows through one call, overlay.py:70-81); the internal
    # 'leg' marker is dropped so the surface matches the other hows
    return overlay_union_legs(
        left, right_table, how=how, concurrency=concurrency,
        batch_size=batch_size,
    ).drop_columns(["leg"])


# ---------------------------------------------------------------------------
# Cell co-partitioned overlay (both sides LARGE) — the shuffle plan.
#
# The broadcast plan above assumes the right side fits the object store as
# one Arrow table. When both sides are big, this plan instead co-partitions
# the two datasets by covering grid cell (the reference's own gridloop
# pattern, /root/reference/src/sgis/geopandas_tools/bounds.py:16-173, made
# distributed): each polygon is replicated to every cell its bbox overlaps,
# a groupby(cell) co-groups both sides, and pairs are deduplicated WITHOUT
# a second shuffle by the anchor-cell rule (a pair is emitted only by the
# cell containing the min-corner of the two bboxes' intersection — exactly
# the rule proven by self_intersect_pairs_ds, ops/dissolve.py:77-140).
# ---------------------------------------------------------------------------


def _tag_overlay_side(batch: pa.Table, res: int, id_col: str, side: int) -> pa.Table:
    """One side -> (cell, side, oid, minx, miny, geometry_wkb) cover rows."""
    from ..geo import cells

    pg = wkb.decode_polygons(batch["geometry_wkb"])
    b = kernels.polygon_bounds(pg)
    # +1e-9: footprints are closed sets — a bbox whose max edge lies exactly
    # on a cell boundary can still touch the next cell (same padding as
    # _tag_polys_with_cells / self_intersect_pairs_ds)
    rows, cell = cells.cover_bbox(b[:, 0], b[:, 1], b[:, 2] + 1e-9, b[:, 3] + 1e-9, res)
    take = pa.array(rows, pa.int64())
    return pa.table(
        {
            "cell": pa.array(cell, pa.int64()),
            "side": pa.array(np.full(len(rows), side, dtype=np.int8)),
            "oid": batch[id_col].take(take).cast(pa.int64()),
            "minx": pa.array(b[rows, 0], pa.float64()),
            "miny": pa.array(b[rows, 1], pa.float64()),
            "geometry_wkb": batch["geometry_wkb"].take(take),
        }
    )


def _cell_overlay_kernel(how: str, emit: str, res: int):
    """Per-cell group kernel: STRtree pairs + anchor dedup + tiered math."""
    from ..geo import cells

    area_only = emit == "area"

    def empty_frame():
        if how == "intersection":
            cols = {
                "left_id": pa.array([], pa.int64()),
                "right_id": pa.array([], pa.int64()),
            }
            if area_only:
                cols["piece_area"] = pa.array([], pa.float64())
            else:
                cols["geometry_wkb"] = pa.array([], pa.binary())
            return pa.table(cols)
        # typed Arrow empty: pandas object-column empties defeat Ray's
        # block size estimator (a noisy np.vectorize error per block) and
        # can ride along schema-less into downstream joins
        return pa.table(
            {
                "left_id": pa.array([], pa.int64()),
                "right_id": pa.array([], pa.int64()),
                "left_geom": pa.array([], pa.binary()),
                "right_geom": pa.array([], pa.binary()),
            }
        )

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0]
        r = g[g["side"] == 1]
        if len(l) == 0 or len(r) == 0:
            return empty_frame()
        lpg = wkb.decode_polygons(l["geometry_wkb"].to_numpy())
        R = RightGeoms(
            pa.table({"geometry_wkb": pa.array(list(r["geometry_wkb"]), pa.binary())})
        )
        l_is_rect = kernels.detect_axis_rects(lpg)
        l_decomp = kernels.decompose_rectilinear(lpg)
        qi, pi = find_candidate_pairs(lpg, l_is_rect, R, l_decomp[2])
        if len(qi) == 0:
            return empty_frame()
        # anchor-cell dedup: only the cell containing the min-corner of the
        # two bboxes' intersection emits the pair (exactly one such cell is
        # in both covers). Anchor is a pure function of the bboxes, so
        # even unrefined rect/rlin candidates dedup consistently.
        ax = np.maximum(l["minx"].to_numpy()[qi], r["minx"].to_numpy()[pi])
        ay = np.maximum(l["miny"].to_numpy()[qi], r["miny"].to_numpy()[pi])
        anchor = cells.xy_to_cell(ax, ay, res)
        m = anchor == int(g["cell"].iloc[0])
        qi, pi = qi[m], pi[m]
        if len(qi) == 0:
            return empty_frame()
        lids = l["oid"].to_numpy().astype(np.int64)
        rids = r["oid"].to_numpy().astype(np.int64)
        if how == "intersection":
            lbounds = kernels.polygon_bounds(lpg)
            li, ri, areas, geoms = intersection_pieces(
                lpg, lbounds, l_decomp, l_is_rect, R, qi, pi, area_only
            )
            # zero-copy Arrow emit: pandas block-manager copies dominate
            # multi-million-row cell outputs (same lesson as the broadcast
            # actor's area path)
            cols = {
                "left_id": pa.array(lids[li], pa.int64()),
                "right_id": pa.array(rids[ri], pa.int64()),
            }
            if area_only:
                cols["piece_area"] = pa.array(areas, pa.float64())
            else:
                cols["geometry_wkb"] = pa.array(geoms, pa.binary())
            return pa.table(cols)
        # difference: emit matched pairs with BOTH geometries; the actual
        # subtraction needs the union of ALL matching rights per left row,
        # which may live in different cells -> second stage groupby(left_id).
        # Arrow binary columns (not pandas object) so the big pair
        # exchange ships typed buffers, not pickled object arrays.
        return pa.table(
            {
                "left_id": pa.array(lids[qi], pa.int64()),
                "right_id": pa.array(rids[pi], pa.int64()),
                "left_geom": pa.array(
                    l["geometry_wkb"].to_numpy()[qi].tolist(), pa.binary()
                ),
                "right_geom": pa.array(
                    r["geometry_wkb"].to_numpy()[pi].tolist(), pa.binary()
                ),
            }
        )

    return per_cell


def overlay_pairs_cell(
    left_ds,
    right_ds,
    left_id: str,
    right_id: str,
    res: int = 7,
    emit: str = "area",
    skew_report_dir: str | None = None,
):
    """Co-partitioned large×large intersection: (left_id, right_id, piece).

    Both sides are Datasets — neither is broadcast. The shuffle carries
    only (cell, id, bbox-min, geometry); attribute columns are the
    caller's to hash-join back by id, keeping the all-to-all exchange
    narrow. Result rows are identical to the broadcast
    ``clean_overlay(how='intersection')`` path on the same inputs.
    """
    lt = left_ds.map_batches(
        lambda b: _tag_overlay_side(b, res, left_id, 0), batch_format="pyarrow"
    )
    rt = right_ds.map_batches(
        lambda b: _tag_overlay_side(b, res, right_id, 1), batch_format="pyarrow"
    )
    both = lt.union(rt)
    if skew_report_dir is not None:
        # straggler telemetry (state.skew): per-cell histogram summary so
        # the cell res / salting threshold is tuned from evidence
        from ..state import skew as skew_mod

        skew_mod.record_cell_skew(
            skew_report_dir,
            skew_mod.cell_skew_summary(
                both, stage=f"overlay_pairs_cell(res={res}, emit={emit})"))
    return (
        both
        .groupby("cell")
        .map_groups(_cell_overlay_kernel("intersection", emit, res),
                    batch_format="pandas")
    )


# survivor count below which the filtered left side is broadcast whole
# (a geometry row is ~100-200 B; 200k rows ≈ tens of MB in the object
# store — the documented broadcast budget used by the other small-side
# plans). Above it the cell co-partitioned pair plan takes over.
DIFF_SURVIVOR_BROADCAST_LIMIT = 200_000


def _broadcast_survivor_pairs(left_small_ds, right_ds, left_id: str,
                              right_id: str):
    """Matched (left_id, left_geom, right_id, right_geom) pair rows via
    ONE streaming pass over the right table against a broadcast survivor
    index — no second cell exchange, no pair-table shuffle.

    The survivor set is tiny after the area pre-filter (~3% of matched
    lefts in dense-coverage data), so the STRtree over their bboxes is
    built ONCE on the driver and ``ray.put`` whole (the prebuilt-index
    pattern from the RightGeoms broadcast). Exactness: difference
    semantics ignore non-intersecting partners — subtracting geometry
    disjoint from the subject is a no-op — so the bbox-overlap candidate
    set (a superset of the cell kernel's refined matches) yields an
    IDENTICAL remainder for every left, and survivors with no bbox
    overlap at all emit no row and pass through the join-back unchanged,
    exactly like the cell plan's unmatched rows.
    """
    lt = pa.concat_tables(ray.get(left_small_ds.to_arrow_refs()))
    lpg = wkb.decode_polygons(lt["geometry_wkb"])
    tree = STRtree(kernels.polygon_bounds(lpg))
    lids = lt[left_id].to_numpy(zero_copy_only=False).astype(np.int64)
    lgeom = lt["geometry_wkb"].to_numpy(zero_copy_only=False)
    ref = ray.put((tree, lids, lgeom))

    class MatchSurvivors:
        def __init__(self):
            self.tree, self.lids, self.lgeom = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            rpg = wkb.decode_polygons(batch["geometry_wkb"])
            qi, ii = self.tree.query_bbox(kernels.polygon_bounds(rpg))
            take = pa.array(qi, pa.int64())
            return pa.table(
                {
                    "left_id": pa.array(self.lids[ii], pa.int64()),
                    "left_geom": pa.array(self.lgeom[ii], pa.binary()),
                    "right_id": batch[right_id].take(take).cast(pa.int64()),
                    "right_geom": batch["geometry_wkb"].take(take),
                }
            )

    return right_ds.map_batches(
        MatchSurvivors, batch_format="pyarrow",
        concurrency=default_pool(), batch_size=8192,
    )


def overlay_difference_cell(
    left_ds,
    right_ds,
    left_id: str,
    right_id: str,
    res: int = 7,
    num_partitions: int | None = None,
    pairs=None,
):
    """Co-partitioned large×large difference: left rows minus the union of
    every intersecting right row.

    Three fully-distributed stages:
    1. cell co-group emits matched (left_id, right_id, left_geom,
       right_geom) pairs with anchor-cell dedup (skipped when a
       precomputed ``pairs`` Dataset is passed — clean_overlay_cell shares
       ONE cell exchange across legs);
    2. ``groupby(left_id)`` subtracts the union of all matched rights from
       each left geometry (tiered math, holes preserved);
    3. hash left-outer join back to ``left_ds``: unmatched rows pass
       through with their original geometry, fully-covered rows drop.
    """
    import pyarrow.compute as pc

    from .dissolve import default_join_partitions

    if pairs is None:
        # survivor pre-filter: a NARROW per-cell area pass (the verified
        # union-cell math) finds which lefts have any remainder at all;
        # only those enter the pair/geometry path. In dense-coverage data
        # ~97% of matched lefts are fully covered, and the pair table the
        # full path would shuffle is 28M geometry-laden rows at sf0.1 —
        # pruning it to survivors removes the dominant exchange. The
        # survivor rule reproduces the old semantics exactly: remainder
        # area > 0 (areas are >= 0.5 in the integer/half-integer world),
        # or a zero-area left that was never matched (pass-through).
        survivors = _diff_survivor_ids(left_ds, right_ds, left_id, right_id, res)
        from .lookup import membership_filter

        left_ds = membership_filter(
            left_ds, survivors, left_id, small_key="left_id",
        ).materialize()
        if left_ds.count() <= DIFF_SURVIVOR_BROADCAST_LIMIT:
            # few survivors: broadcast them, stream the rights ONCE —
            # the second cell exchange and the pair shuffle disappear
            pairs = _broadcast_survivor_pairs(
                left_ds, right_ds, left_id, right_id
            )
        else:
            lt = left_ds.map_batches(
                lambda b: _tag_overlay_side(b, res, left_id, 0),
                batch_format="pyarrow",
            )
            rt = right_ds.map_batches(
                lambda b: _tag_overlay_side(b, res, right_id, 1),
                batch_format="pyarrow",
            )
            pairs = (
                lt.union(rt)
                .groupby("cell")
                .map_groups(_cell_overlay_kernel("difference", "geometry", res),
                            batch_format="pandas")
            )

    def diff_group(g: pd.DataFrame) -> pd.DataFrame:
        spg = wkb.decode_polygons(
            np.asarray([g["left_geom"].iloc[0]], dtype=object)
        )
        cpg = wkb.decode_polygons(g["right_geom"].to_numpy())
        gwkb = subtract_union_wkb(spg, 0, cpg, range(len(cpg)))
        # keep the fully-covered (None) row: the join-back must distinguish
        # "matched and consumed" from "never matched" (pass-through).
        # has_diff is the match marker — Ray's join drops the right_on key
        # column, and diff_geom alone is null for covered rows.
        return pd.DataFrame(
            {"__lid": [int(g["left_id"].iloc[0])], "diff_geom": [gwkb],
             "has_diff": [np.int64(1)]}
        )

    # an empty hash partition leaves map_groups emitting a 0-row block with
    # an EMPTY schema (no columns at all); Dataset.join then can't find
    # __lid in that block's partition. map_batches skips 0-row blocks, so a
    # schema-fix stage never sees them — repartition instead: the block
    # coalesce (no hash exchange) merges empties into typed blocks.
    rem = pairs.groupby("left_id").map_groups(
        diff_group, batch_format="pandas"
    ).repartition(default_join_partitions(num_partitions)).materialize()
    if rem.count() == 0:  # no intersecting pair anywhere: left unchanged
        return left_ds
    joined = left_ds.join(
        rem,
        join_type="left_outer",
        num_partitions=default_join_partitions(num_partitions),
        on=(left_id,),
        right_on=("__lid",),
    )

    def finish(b: pa.Table) -> pa.Table:
        # a matched row carries diff_geom (possibly null = fully covered);
        # an unmatched row passes through with its original geometry.
        is_match = pc.is_valid(b["has_diff"])
        geom = pc.if_else(is_match, b["diff_geom"], b["geometry_wkb"])
        keep = pc.or_(pc.invert(is_match), pc.is_valid(b["diff_geom"]))
        out = b.drop_columns(
            [c for c in ("__lid", "diff_geom", "has_diff", "geometry_wkb")
             if c in b.column_names]
        )
        out = out.append_column("geometry_wkb", geom)
        return out.filter(keep)

    return joined.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Area-only union/symdiff legs — projection pushdown for area consumers
# ---------------------------------------------------------------------------


def overlay_union_leg_areas(
    left,
    right_table: pa.Table,
    how: str = "union",
    concurrency: int | tuple | None = None,
    batch_size: int = 128,
    left_table: pa.Table | None = None,
):
    """(leg, area_i) rows of the union/symmetric_difference composition —
    the area-only pushdown of overlay_union_legs, as TWO shuffle-free
    broadcast passes:

      pass 1 (stream LEFT, broadcast right): intersection-piece partial
        sums (union only) + left-remainder partial sums per batch
      pass 2 (stream RIGHT, broadcast left): right-remainder areas via
        the same ``difference_areas`` kernel with the roles flipped —
        each right row subtracts the union of its matched lefts;
        unmatched rights pass through at full area, so no join and no
        global match-state exchange is needed at all

    The previous plan shipped one row per (left piece, clip rect) — 28M
    rows at sf0.1 — through a groupby(super) sort and a left_outer join
    for the unmatched-right leg; under one composed streaming execution
    that Sort alone ran 69 s and the end-to-end wall was 120-250 s.
    The two-pass form does the identical per-row math in two actor-pool
    scans (~15 s each at sf0.1/32 CPUs) with only (leg, area_i) partial
    rows leaving any worker.

    Envelope: BOTH sides must fit the object store as broadcast tables
    (the reference's clean_overlay materializes both frames too,
    overlay.py:199-257); overlay_union_leg_areas_cell is the co-
    partitioned large×large fallback.

    batch_size default is 128, measured not guessed: with ~1,400 matched
    rights per left row, per-batch candidate/piece temporaries past
    glibc's 32 MB DEFAULT_MMAP_THRESHOLD_MAX page-fault on first touch;
    smaller batches keep them heap-reusable."""
    import ray.data as rd

    concurrency = default_pool(concurrency)

    if how not in ("union", "symmetric_difference"):
        raise ValueError(how)
    ref = ray.put(RightGeoms(right_table))
    if left_table is None:
        # the broadcast envelope already bounds the left side; collecting
        # it once on the driver is the same cost class as the right_table
        # argument the caller built. Pass 1 then streams from the collected
        # blocks instead of re-executing the caller's left pipeline.
        blocks = [t for t in ray.get(left.to_arrow_refs()) if t.num_rows]
        left_table = (
            pa.concat_tables(blocks, promote_options="default")
            if blocks
            else pa.table({"geometry_wkb": pa.array([], pa.binary())})
        )
        left = rd.from_arrow(left_table.select(["geometry_wkb"])).repartition(
            max(int(np.ceil(len(left_table) / batch_size)), 1)
        )
    left_legs = left.map_batches(
        UnionAreaLegsActor,
        fn_constructor_kwargs={"right_ref": ref, "how": how},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
    lref = ray.put(RightGeoms(left_table.select(["geometry_wkb"])))
    right_leg = (
        rd.from_arrow(right_table.select(["geometry_wkb"]))
        .repartition(max(int(np.ceil(len(right_table) / 2048)), 1))
        .map_batches(
            ReverseDiffAreaActor,
            fn_constructor_kwargs={"left_ref": lref},
            batch_format="pyarrow", batch_size=512, concurrency=concurrency,
        )
    )
    return left_legs.union(right_leg)


class ReverseDiffAreaActor:
    """Pass-2 stage of overlay_union_leg_areas: per-batch partial sum of
    (right row − union(matched left geometries)) areas, computed by
    ``difference_areas`` with the broadcast/stream roles flipped.
    Pass-through (unmatched) right rows contribute their full area —
    the unmatched-right leg of the union composition with no join."""

    def __init__(self, left_ref):
        self.L = _as_right_geoms(ray.get(left_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        rpg = wkb.decode_polygons(batch["geometry_wkb"])
        r_is_rect = kernels.detect_axis_rects(rpg)
        r_decomp = kernels.decompose_rectilinear(rpg)
        qi, pi = find_candidate_pairs(rpg, r_is_rect, self.L, r_decomp[2])
        d = difference_areas(rpg, self.L, qi, pi, r_decomp)
        pos = d > 0
        total = int(np.round(d[pos]).astype(np.int64).sum()) if pos.any() else 0
        return pa.table(
            {
                "leg": pa.array(["right"], pa.string()),
                "area_i": pa.array([total], pa.int64()),
            }
        )


def difference_areas(lpg: wkb.PolygonArray, R: RightGeoms,
                     qi: np.ndarray, pi: np.ndarray, l_decomp) -> np.ndarray:
    """AREA of (left row − union(matched rights)) per left row, incl.
    pass-through rows (full polygon area). Rectilinear rows use the Klee
    cover sweep; everything else the boolean engine's area pass."""
    n = len(lpg)
    l_rects, l_offs, l_rlin = l_decomp
    areas = kernels.polygon_areas(lpg)  # pass-through default
    if len(qi) == 0:
        return areas
    # vectorized pre-pass: a plain axis-rect right whose bounds cover the
    # left row's bounds erases the row entirely (areas[i] = 0, no sweep).
    # In the synthetic mix rights are km-scale boxes vs m-scale parts, so
    # this skips the Klee loop for most rows — exact, not approximate.
    lb = kernels.polygon_bounds(lpg)
    covers = (
        R.r_is_rect[pi]
        & (R.rbounds[pi, 0] <= lb[qi, 0]) & (R.rbounds[pi, 1] <= lb[qi, 1])
        & (R.rbounds[pi, 2] >= lb[qi, 2]) & (R.rbounds[pi, 3] >= lb[qi, 3])
    )
    if covers.any():
        dead = np.unique(qi[covers])
        areas[dead] = 0.0
        alive = ~np.isin(qi, dead)
        qi, pi = qi[alive], pi[alive]
        if len(qi) == 0:
            return areas
    order = np.argsort(qi, kind="stable")
    qs, ps = qi[order], pi[order]
    starts = np.nonzero(np.concatenate([[True], qs[1:] != qs[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(qs)]])
    for g_i in range(len(starts)):
        i = int(qs[starts[g_i]])
        rights = ps[starts[g_i] : ends[g_i]]
        if l_rlin[i] and R.r_rlin[rights].all():
            # gather all clip rects of the matched rights
            cnt = (R.r_offs[rights + 1] - R.r_offs[rights]).astype(np.int64)
            T = int(cnt.sum())
            rep = np.repeat(np.arange(len(rights)), cnt)
            base = np.concatenate([[0], np.cumsum(cnt)])[:-1]
            ridx = np.repeat(R.r_offs[rights], cnt) + (
                np.arange(T) - np.repeat(base, cnt)
            )
            crects = R.r_rects[ridx]
            area = 0.0
            for t in range(l_offs[i], l_offs[i + 1]):
                sb = l_rects[t]
                cx0 = np.maximum(crects[:, 0], sb[0])
                cy0 = np.maximum(crects[:, 1], sb[1])
                cx1 = np.minimum(crects[:, 2], sb[2])
                cy1 = np.minimum(crects[:, 3], sb[3])
                m = (cx1 > cx0) & (cy1 > cy0)
                cov = (
                    kernels.rects_union_area(
                        np.stack([cx0[m], cy0[m], cx1[m], cy1[m]], axis=1)
                    )
                    if m.any()
                    else 0.0
                )
                area += (sb[2] - sb[0]) * (sb[3] - sb[1]) - cov
            areas[i] = area
        else:
            s_r, s_h = booleans.ringset_of_row(lpg, i)
            c_r, c_h = [], []
            for r in rights:
                rr, hh = booleans.ringset_of_row(R.rpg, int(r))
                c_r.extend(rr)
                c_h.extend(hh)
            areas[i] = booleans.boolean_area(s_r, c_r, "difference", s_h, c_h)
    return areas


class UnionAreaLegsActor:
    """Pass-1 stage of overlay_union_leg_areas: one broadcast scan of the
    left side emitting per-batch PARTIAL SUMS for the intersection leg
    (union only) and the left-remainder leg. Candidate pairs are computed
    once per batch and shared by both legs; per-piece int64 rounding
    happens before the sum, matching the SQL oracle's round-then-sum
    exactly. Output is schema-stable (leg, area_i) — the right leg comes
    from ReverseDiffAreaActor's flipped pass, not from pair rows."""

    def __init__(self, right_ref, how: str = "union"):
        self.R = _as_right_geoms(ray.get(right_ref))
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        R = self.R
        lpg = wkb.decode_polygons(batch["geometry_wkb"])
        l_is_rect = kernels.detect_axis_rects(lpg)
        l_decomp = kernels.decompose_rectilinear(lpg)
        lbounds = kernels.polygon_bounds(lpg)
        qi, pi = find_candidate_pairs(lpg, l_is_rect, R, l_decomp[2])

        legs: list[str] = []
        areas: list[int] = []
        if self.how == "union":
            _, _, iareas, _ = intersection_pieces(
                lpg, lbounds, l_decomp, l_is_rect, R, qi, pi, area_only=True
            )
            if len(iareas):
                legs.append("inter")
                areas.append(int(np.round(iareas).astype(np.int64).sum()))

        dareas = difference_areas(lpg, R, qi, pi, l_decomp)
        pos = dareas > 0
        if pos.any():
            legs.append("left")
            areas.append(int(np.round(dareas[pos]).astype(np.int64).sum()))

        return pa.table(
            {
                "leg": pa.array(legs, pa.string()),
                "area_i": pa.array(areas, pa.int64()),
            }
        )


def overlay_intersection_auto(
    left_ds,
    right_ds,
    left_id: str,
    right_id: str,
    right_table: pa.Table | None = None,
    broadcast_limit: int = 50_000,
    res: int = 10,
    emit: str = "area",
):
    """Plan-choosing intersection entry: broadcast vs cell co-partition.

    The engine's two intersection plans produce identical rows but cross
    over in cost: the broadcast plan wins while the right side fits one
    object-store table and per-batch STRtree queries stay cheap; the cell
    co-group plan wins once the right side is large (sf0.1: 91 s
    broadcast vs 8 s cell for the same 27.8M output rows). This entry
    dispatches on the right side's row count — the same size heuristic
    the reference applies in write_municipality_data
    (io/write_municipality_data.py:182-195, len<10_000 -> overlay else
    looping clip) — and normalizes BOTH plans to the narrow
    ``(left_id, right_id, piece_area)`` schema; attribute columns are the
    caller's to hash-join back by id.
    """
    if right_table is None:
        right_table = _materialize_small(right_ds, broadcast_limit)
    if right_table is not None and right_table.num_rows <= broadcast_limit:
        out = clean_overlay(left_ds, right_table, how="intersection", emit=emit)

        def narrow(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "left_id": b[left_id].cast(pa.int64()),
                    "right_id": b[right_id].cast(pa.int64()),
                    "piece_area": b["piece_area"],
                }
            )

        return out.map_batches(narrow, batch_format="pyarrow")
    return overlay_pairs_cell(
        left_ds, right_ds, left_id, right_id, res=res, emit=emit
    )


def _materialize_small(ds, limit: int) -> pa.Table | None:
    """Return ``ds`` as one Arrow table iff it has <= limit rows, else
    None — probes the count first so a large right side is never pulled
    to the driver."""
    if isinstance(ds, pa.Table):
        return ds
    # limit-probe: the streaming executor short-circuits after limit+1
    # rows, so a LARGE side costs a truncated execution — never a full
    # count pass or an object-store materialization of the big side
    if ds.limit(limit + 1).count() > limit:
        return None
    import pyarrow as _pa

    tbls = [_pa.Table.from_batches([b]) if not isinstance(b, _pa.Table) else b
            for b in ds.iter_batches(batch_format="pyarrow", batch_size=65536)]
    return _pa.concat_tables(tbls) if tbls else None


# ---------------------------------------------------------------------------
# clean_clip — clip by a (small, broadcast) mask, make valid, drop empties
# ---------------------------------------------------------------------------


class CleanClipActor:
    """clean_clip (general.py:513-560): clip every left row by the mask
    union, make the result valid, drop empty/NaN geometries.

    The mask table (small side — a municipality polygon, a study area) is
    broadcast once with ``ray.put`` and dissolved to one valid ringset per
    actor in ``__init__``; left rows stream through as Arrow batches.
    Fast paths: bbox-disjoint rows drop without geometry math; when the
    mask union is a single axis-aligned rectangle, rect rows clip by
    interval math and fully-inside rows pass their WKB through unchanged.
    Everything else (concave/holed mask or row) runs the scanline boolean
    engine, whose output is valid by construction — the reference's
    make_valid + remove-empty postpass is therefore implicit."""

    def __init__(self, mask_ref, id_col: str = "id"):
        mask: pa.Table = (
            mask_ref if isinstance(mask_ref, pa.Table) else ray.get(mask_ref)
        )
        self.id_col = id_col
        mpg = wkb.decode_polygons(mask["geometry_wkb"])
        rings, holes = [], []
        for row in range(len(mpg)):
            rr, hh = booleans.ringset_of_row(mpg, row)
            rings.extend(rr)
            holes.extend(hh)
        # dissolve overlapping mask parts once (winding union -> valid)
        polys = booleans.union_all([(rings, holes)])
        self.m_rings = [r for p in polys for r in p]
        self.m_holes = [i > 0 for p in polys for i, _ in enumerate(p)]
        xs = np.concatenate([r[:, 0] for r in self.m_rings])
        ys = np.concatenate([r[:, 1] for r in self.m_rings])
        self.m_bbox = (xs.min(), ys.min(), xs.max(), ys.max())
        self.m_is_rect = (
            len(polys) == 1
            and len(polys[0]) == 1
            and _ring_is_axis_rect(polys[0][0])
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        pg = wkb.decode_polygons(batch["geometry_wkb"])
        bounds = kernels.polygon_bounds(pg)
        is_rect = kernels.detect_axis_rects(pg)
        mx0, my0, mx1, my1 = self.m_bbox
        cand = np.nonzero(
            (bounds[:, 0] < mx1) & (bounds[:, 2] > mx0)
            & (bounds[:, 1] < my1) & (bounds[:, 3] > my0)
        )[0]
        keep_idx: list[int] = []
        geoms: list[bytes] = []
        areas: list[float] = []
        for row in cand:
            row = int(row)
            b = bounds[row]
            if self.m_is_rect:
                inside = (
                    b[0] >= mx0 and b[1] >= my0 and b[2] <= mx1 and b[3] <= my1
                )
                if inside:
                    s_r, s_h = booleans.ringset_of_row(pg, row)
                    keep_idx.append(row)
                    geoms.append(_polys_to_wkb(_group_rings(s_r, s_h)))
                    areas.append(booleans.ringset_area(s_r, s_h))
                    continue
                if is_rect[row]:
                    x0, y0 = max(b[0], mx0), max(b[1], my0)
                    x1, y1 = min(b[2], mx1), min(b[3], my1)
                    if x1 > x0 and y1 > y0:
                        keep_idx.append(row)
                        geoms.append(_pieces_to_wkb([np.array(
                            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
                        )]))
                        areas.append((x1 - x0) * (y1 - y0))
                    continue
            s_r, s_h = booleans.ringset_of_row(pg, row)
            polys = booleans.boolean_polygons(
                s_r, self.m_rings, "intersection", s_h, self.m_holes
            )
            g = _polys_to_wkb(polys)
            if g is None:
                continue
            keep_idx.append(row)
            geoms.append(g)
            areas.append(sum(booleans.ringset_area(p, [False] + [True] * (len(p) - 1))
                             for p in polys))
        ids = batch[self.id_col].take(pa.array(keep_idx, pa.int64()))
        return pa.table(
            {
                self.id_col: ids,
                "geometry_wkb": pa.array(geoms, pa.binary()),
                "clip_area": pa.array(np.asarray(areas, np.float64), pa.float64()),
            }
        )


def _ring_is_axis_rect(ring: np.ndarray) -> bool:
    """One closed ring an axis-aligned rectangle? (5 points, every point
    on a bbox corner, positive area)."""
    if len(ring) != 5:
        return False
    x0, y0 = ring[:, 0].min(), ring[:, 1].min()
    x1, y1 = ring[:, 0].max(), ring[:, 1].max()
    if x1 <= x0 or y1 <= y0:
        return False
    on_corner = (
        ((ring[:, 0] == x0) | (ring[:, 0] == x1))
        & ((ring[:, 1] == y0) | (ring[:, 1] == y1))
    ).all()
    return bool(on_corner)


def _group_rings(rings, holes):
    """Flat (rings, hole_flags) -> [[shell, holes...], ...] preserving the
    WKB shell-then-holes order."""
    polys: list[list[np.ndarray]] = []
    for r, h in zip(rings, holes):
        if h and polys:
            polys[-1].append(r)
        else:
            polys.append([r])
    return polys


def clean_clip(
    left,
    mask_table: pa.Table,
    id_col: str = "id",
    concurrency: int | tuple | None = None,
    batch_size: int = 2048,
):
    """Dataset-level clean_clip: broadcast-mask actor pool over streaming
    left batches. Returns (id_col, geometry_wkb, clip_area) rows with
    empty results dropped (the reference's dropna/not-is_empty filter)."""
    concurrency = default_pool(concurrency)
    ref = ray.put(mask_table)
    return left.map_batches(
        CleanClipActor,
        fn_constructor_kwargs={"mask_ref": ref, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def clean_overlay_cell(
    left_ds,
    right_ds,
    left_id: str,
    right_id: str,
    how: str = "intersection",
    res: int = 10,
):
    """All six clean_overlay hows on the cell co-partitioned plan — BOTH
    sides stream as Datasets, nothing is broadcast (the large×large
    counterpart of :func:`clean_overlay`, reference overlay.py:70-81).

    Output is the id-centric surface ``(left_id, right_id, geometry_wkb)``
    with the id of the absent side null (difference/remainder legs carry
    only one side, like the reference's suffixed NaN columns); attribute
    columns re-join by id, keeping the all-to-all exchanges narrow.

    Compositions (disjoint cell tiling makes every leg additive):
    intersection = pair pieces; difference = left minus union-of-rights;
    identity = intersection ⊎ difference; union adds the mirrored right
    remainder; symmetric_difference = both remainders; update = left
    remainder ⊎ right rows unchanged.
    """
    if how not in HOWS:
        raise ValueError(f"how must be one of {HOWS}")

    def norm_pairs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "left_id": b["left_id"].cast(pa.int64()),
                "right_id": b["right_id"].cast(pa.int64()),
                "geometry_wkb": b["geometry_wkb"],
            }
        )

    def norm_one_side(id_col: str, is_left: bool):
        def fn(b: pa.Table) -> pa.Table:
            n = len(b)
            ids = b[id_col].cast(pa.int64())
            nulls = pa.nulls(n, pa.int64())
            return pa.table(
                {
                    "left_id": ids if is_left else nulls,
                    "right_id": nulls if is_left else ids,
                    "geometry_wkb": b["geometry_wkb"],
                }
            )

        return fn

    # single-leg hows: one cell exchange, no pair sharing needed
    if how == "intersection":
        return overlay_pairs_cell(
            left_ds, right_ds, left_id, right_id, res=res, emit="geometry"
        ).map_batches(norm_pairs, batch_format="pyarrow")
    if how == "difference":
        return overlay_difference_cell(
            left_ds, right_ds, left_id, right_id, res=res
        ).map_batches(norm_one_side(left_id, True), batch_format="pyarrow")

    # multi-leg hows: run the EXPENSIVE cell co-group ONCE and derive every
    # leg from the materialized pair table (one row per matched pair with
    # both geometries) — the naive composition re-shuffled both full
    # datasets once per leg. Tradeoff: the pair table lives in the object
    # store (spillable) instead of being recomputed.
    pairs = cell_pair_table(left_ds, right_ds, left_id, right_id, res)

    def inter_from_pairs(b: pd.DataFrame) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {
                    "left_id": pa.array([], pa.int64()),
                    "right_id": pa.array([], pa.int64()),
                    "geometry_wkb": pa.array([], pa.binary()),
                }
            )
        lpg = wkb.decode_polygons(b["left_geom"].to_numpy())
        R = RightGeoms(
            pa.table({"geometry_wkb": pa.array(list(b["right_geom"]), pa.binary())})
        )
        idx = np.arange(len(lpg))
        li, ri, _, geoms = intersection_pieces(
            lpg,
            kernels.polygon_bounds(lpg),
            kernels.decompose_rectilinear(lpg),
            kernels.detect_axis_rects(lpg),
            R,
            idx,
            idx,
            area_only=False,
        )
        lids = b["left_id"].to_numpy().astype(np.int64)
        rids = b["right_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "left_id": pa.array(lids[li], pa.int64()),
                "right_id": pa.array(rids[ri], pa.int64()),
                "geometry_wkb": pa.array(geoms, pa.binary()),
            }
        )

    def inter():
        return pairs.map_batches(inter_from_pairs, batch_format="pandas")

    def ldiff():
        return overlay_difference_cell(
            left_ds, right_ds, left_id, right_id, res=res, pairs=pairs
        ).map_batches(norm_one_side(left_id, True), batch_format="pyarrow")

    def rdiff():
        return overlay_difference_cell(
            right_ds, left_ds, right_id, left_id, res=res,
            pairs=swap_pair_table(pairs),
        ).map_batches(norm_one_side(right_id, False), batch_format="pyarrow")

    if how == "identity":
        return inter().union(ldiff())
    if how == "union":
        return inter().union(ldiff()).union(rdiff())
    if how == "symmetric_difference":
        return ldiff().union(rdiff())
    # update: left remainder + every right row unchanged (overlay.py:260-263)
    return ldiff().union(
        right_ds.map_batches(norm_one_side(right_id, False), batch_format="pyarrow")
    )


def cell_pair_table(left_ds, right_ds, left_id: str, right_id: str, res: int):
    """ONE cell co-group exchange -> materialized matched-pair table
    (left_id, right_id, left_geom, right_geom), anchor-cell deduped.
    Every multi-leg cell-plan consumer derives its legs from this."""
    lt = left_ds.map_batches(
        lambda b: _tag_overlay_side(b, res, left_id, 0), batch_format="pyarrow"
    )
    rt = right_ds.map_batches(
        lambda b: _tag_overlay_side(b, res, right_id, 1), batch_format="pyarrow"
    )
    return (
        lt.union(rt)
        .groupby("cell")
        .map_groups(_cell_overlay_kernel("difference", "geometry", res),
                    batch_format="pandas")
        .materialize()
    )


def swap_pair_table(pairs):
    """Mirror a pair table (cheap column rename, no shuffle) so the
    difference machinery can run right-minus-lefts."""

    def fn(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "left_id": b["right_id"],
                "right_id": b["left_id"],
                "left_geom": b["right_geom"],
                "right_geom": b["left_geom"],
            }
        )

    return pairs.map_batches(fn, batch_format="pyarrow")


def overlay_union_leg_areas_cell(
    left_ds,
    right_ds,
    left_id: str,
    right_id: str,
    how: str = "union",
    res: int = 10,
):
    """(leg, area_i) partials of the union/symmetric_difference composition
    with BOTH sides streaming as Datasets — the cell co-partitioned
    counterpart of ``overlay_union_leg_areas`` (no broadcast anywhere).

    ONE cell co-group exchange computes ALL legs: cells tile the plane
    disjointly, so area(row − union(partners)) = sum over covered cells
    of area((row ∩ cell) − union(partners in that cell)) — the subject is
    clipped to the cell rect; partners need no clipping because
    subtracting geometry outside the subject is a no-op. The intersection
    leg anchor-cell-dedups pairs inside the same kernel. Every earlier
    plan re-shuffled the matched-pair table (28M rows at sf0.1) at least
    once more; ANY 28M-row exchange costs 57-78 s on this host even for
    a narrow int64 groupby, so the one tagged-cover exchange (~rows x
    cells-covered, geometry carried once per covered cell) is the whole
    shuffle budget. Emits <= 3 partial rows per cell; finish with
    ``relational.sum_by_small_key``.
    """
    if how not in ("union", "symmetric_difference"):
        raise ValueError(how)
    lt = left_ds.map_batches(
        lambda b: _tag_overlay_side(b, res, left_id, 0), batch_format="pyarrow"
    )
    rt = right_ds.map_batches(
        lambda b: _tag_overlay_side(b, res, right_id, 1), batch_format="pyarrow"
    )
    return (
        lt.union(rt)
        .groupby("cell")
        .map_groups(_cell_union_areas_kernel(how, res), batch_format="pandas")
    )


def _clip_rows_to_rect_wkb(pg: wkb.PolygonArray, rect: np.ndarray,
                           rlin: np.ndarray, rects: np.ndarray,
                           offs: np.ndarray) -> list[bytes | None]:
    """Clip every row of ``pg`` to an axis rect -> WKB per row (None when
    the clipped result is empty). Rectilinear rows clip by interval math
    on their rect decomposition; general rings by convex (Sutherland-
    Hodgman) clipping, shell/hole structure preserved (intersection with
    a convex region keeps holes inside their shells)."""
    rect_ring = np.array(
        [[rect[0], rect[1]], [rect[2], rect[1]], [rect[2], rect[3]],
         [rect[0], rect[3]], [rect[0], rect[1]]], dtype=np.float64
    )
    out: list[bytes | None] = []
    for i in range(len(pg)):
        if rlin[i]:
            rs = rects[offs[i]:offs[i + 1]]
            x0 = np.maximum(rs[:, 0], rect[0])
            y0 = np.maximum(rs[:, 1], rect[1])
            x1 = np.minimum(rs[:, 2], rect[2])
            y1 = np.minimum(rs[:, 3], rect[3])
            m = (x1 > x0) & (y1 > y0)
            if not m.any():
                out.append(None)
                continue
            out.append(_pieces_to_wkb(
                list(kernels.rects_to_rings(
                    np.stack([x0[m], y0[m], x1[m], y1[m]], axis=1)
                ))
            ))
            continue
        polys = []
        for q in range(pg.geom_offsets[i], pg.geom_offsets[i + 1]):
            r0, r1 = pg.poly_offsets[q], pg.poly_offsets[q + 1]
            shell = kernels.clip_ring_convex(
                pg.coords[pg.ring_offsets[r0]:pg.ring_offsets[r0 + 1]],
                rect_ring,
            )
            if len(shell) < 4 or abs(kernels.ring_area(shell)) == 0:
                continue
            rings = [shell]
            for r in range(r0 + 1, r1):
                h = kernels.clip_ring_convex(
                    pg.coords[pg.ring_offsets[r]:pg.ring_offsets[r + 1]],
                    rect_ring,
                )
                if len(h) >= 4 and abs(kernels.ring_area(h)) > 0:
                    rings.append(h)
            polys.append(rings)
        out.append(_polys_to_wkb(polys) if polys else None)
    return out


def _cell_union_areas_kernel(how: str, res: int):
    """Per-cell kernel for the union/symmetric_difference AREA legs: up to
    three (leg, area_i) partial rows per cell, no downstream exchange."""
    from ..geo import cells

    def empty():
        return pa.table(
            {"leg": pa.array([], pa.string()), "area_i": pa.array([], pa.int64())}
        )

    def rem_partial(spg, sb, s_rlin, s_rects, s_offs, rect, other_R):
        """sum of area((row ∩ rect) − union(candidate partners))."""
        cw = _clip_rows_to_rect_wkb(spg, rect, s_rlin, s_rects, s_offs)
        keep = np.array([w is not None for w in cw], dtype=bool)
        if not keep.any():
            return 0
        spg_c = wkb.decode_polygons(
            np.asarray([w for w in cw if w is not None], dtype=object)
        )
        if other_R is None:
            return int(np.round(kernels.polygon_areas(spg_c)).sum())
        decomp = kernels.decompose_rectilinear(spg_c)
        qi, pi = find_candidate_pairs(
            spg_c, kernels.detect_axis_rects(spg_c), other_R, decomp[2]
        )
        d = difference_areas(spg_c, other_R, qi, pi, decomp)
        return int(np.round(d).sum())

    def per_cell(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return empty()
        cell_id = np.asarray([int(g["cell"].iloc[0])], dtype=np.int64)
        rect = cells.cell_bounds(cell_id)[0].copy()
        # cover_bbox clamps out-of-domain geometry to the edge cells, so
        # the edge cells' clip rects must extend to the exterior or that
        # area silently vanishes from the partition (found by the
        # cell-clip additivity Hypothesis test). Large-finite, not inf:
        # Sutherland-Hodgman intersections with inf produce NaN.
        cx, cy, rr = cells.cell_to_xy(cell_id)
        lim = (1 << res) - 1
        big = np.float64(1e12)
        if int(cx[0]) == 0:
            rect[0] = -big
        if int(cy[0]) == 0:
            rect[1] = -big
        if int(cx[0]) == lim:
            rect[2] = big
        if int(cy[0]) == lim:
            rect[3] = big
        l = g[g["side"] == 0]
        r = g[g["side"] == 1]
        legs: list[str] = []
        areas: list[int] = []
        lpg = (wkb.decode_polygons(l["geometry_wkb"].to_numpy())
               if len(l) else None)
        rpg = (wkb.decode_polygons(r["geometry_wkb"].to_numpy())
               if len(r) else None)
        L = (RightGeoms(pa.table({"geometry_wkb": pa.array(
            list(l["geometry_wkb"]), pa.binary())})) if len(l) else None)
        R = (RightGeoms(pa.table({"geometry_wkb": pa.array(
            list(r["geometry_wkb"]), pa.binary())})) if len(r) else None)
        if how == "union" and lpg is not None and rpg is not None:
            l_is_rect = kernels.detect_axis_rects(lpg)
            l_decomp = kernels.decompose_rectilinear(lpg)
            qi, pi = find_candidate_pairs(lpg, l_is_rect, R, l_decomp[2])
            if len(qi):
                # anchor-cell dedup: pairwise piece areas are emitted by
                # exactly one cell (the one containing the min-corner of
                # the bbox intersection)
                ax = np.maximum(l["minx"].to_numpy()[qi], r["minx"].to_numpy()[pi])
                ay = np.maximum(l["miny"].to_numpy()[qi], r["miny"].to_numpy()[pi])
                m = cells.xy_to_cell(ax, ay, res) == int(cell_id[0])
                qi, pi = qi[m], pi[m]
            if len(qi):
                lb = kernels.polygon_bounds(lpg)
                _, _, pareas, _ = intersection_pieces(
                    lpg, lb, l_decomp, l_is_rect, R, qi, pi, True
                )
                legs.append("inter")
                areas.append(int(np.round(np.asarray(pareas)).sum()))
        if lpg is not None:
            s_rects, s_offs, s_rlin = kernels.decompose_rectilinear(lpg)
            legs.append("left")
            areas.append(rem_partial(lpg, None, s_rlin, s_rects, s_offs, rect, R))
        if rpg is not None:
            s_rects, s_offs, s_rlin = kernels.decompose_rectilinear(rpg)
            legs.append("right")
            areas.append(rem_partial(rpg, None, s_rlin, s_rects, s_offs, rect, L))
        if not legs:
            return empty()
        return pa.table(
            {"leg": pa.array(legs, pa.string()),
             "area_i": pa.array(areas, pa.int64())}
        )

    return per_cell


def _tag_survivor_side(batch: pa.Table, res: int, id_col: str, side: int) -> pa.Table:
    """_tag_overlay_side plus (maxx, maxy, rect): the survivor kernel's
    covered-cell fast path needs full bboxes and the axis-rect flag."""
    from ..geo import cells

    pg = wkb.decode_polygons(batch["geometry_wkb"])
    b = kernels.polygon_bounds(pg)
    is_rect = kernels.detect_axis_rects(pg)
    rows, cell = cells.cover_bbox(b[:, 0], b[:, 1], b[:, 2] + 1e-9, b[:, 3] + 1e-9, res)
    take = pa.array(rows, pa.int64())
    return pa.table(
        {
            "cell": pa.array(cell, pa.int64()),
            "side": pa.array(np.full(len(rows), side, dtype=np.int8)),
            "oid": batch[id_col].take(take).cast(pa.int64()),
            "minx": pa.array(b[rows, 0], pa.float64()),
            "miny": pa.array(b[rows, 1], pa.float64()),
            "maxx": pa.array(b[rows, 2], pa.float64()),
            "maxy": pa.array(b[rows, 3], pa.float64()),
            "rect": pa.array(is_rect[rows].astype(np.int8)),
            "geometry_wkb": batch["geometry_wkb"].take(take),
        }
    )


def _diff_survivor_ids(left_ds, right_ds, left_id: str, right_id: str, res: int):
    """Narrow per-cell area pass -> Dataset of left ids with a non-empty
    difference remainder (plus zero-area never-matched pass-throughs).

    Emits one (left_id, rem, clip, matched) row per (left, cell) — the
    cell-clipped remainder area (the Hypothesis-verified union-cell
    math), the clipped area itself, and whether the left had any matched
    pair candidate in the cell (computed on the UNCLIPPED geometry with
    the same candidate test as the pair kernel, so max-over-cells equals
    membership in the pair table). One narrow int64-keyed groupby sums
    the partials; no geometry ever leaves the cell kernel.

    Covered-cell fast path: if some axis-rect right's bbox contains the
    whole cell rect, every left's cell-clipped remainder is 0 (clip ⊆
    cell ⊆ right), every left is matched (rect×rect candidacy is
    boundary-inclusive bbox overlap, and the tag's 1e-9 pad only admits
    exact boundary touches in the engine's half-integer coordinate
    world), and rect lefts' clip areas are closed-form interval
    overlaps — no decode, no per-cell STRtree, no scanline. In
    dense-coverage data nearly every interior cell takes this path.
    """
    from ..geo import cells
    from ray.data.aggregate import Max, Sum

    def per_cell(g: pd.DataFrame) -> pa.Table:
        l = g[g["side"] == 0]
        if not len(l):
            return pa.table(
                {"left_id": pa.array([], pa.int64()),
                 "rem": pa.array([], pa.float64()),
                 "clip": pa.array([], pa.float64()),
                 "matched": pa.array([], pa.int64())}
            )
        r = g[g["side"] == 1]
        cell_id = np.asarray([int(g["cell"].iloc[0])], dtype=np.int64)
        rect = cells.cell_bounds(cell_id)[0].copy()
        cx, cy, _ = cells.cell_to_xy(cell_id)
        lim = (1 << res) - 1
        big = np.float64(1e12)
        if int(cx[0]) == 0:
            rect[0] = -big
        if int(cy[0]) == 0:
            rect[1] = -big
        if int(cx[0]) == lim:
            rect[2] = big
        if int(cy[0]) == lim:
            rect[3] = big
        lids = l["oid"].to_numpy().astype(np.int64)
        n = len(l)

        covered = False
        if len(r):
            rr = r["rect"].to_numpy() == 1
            if rr.any():
                covered = bool(np.any(
                    rr
                    & (r["minx"].to_numpy() <= rect[0])
                    & (r["miny"].to_numpy() <= rect[1])
                    & (r["maxx"].to_numpy() >= rect[2])
                    & (r["maxy"].to_numpy() >= rect[3])
                ))
        if covered:
            clip_a = np.zeros(n, dtype=np.float64)
            matched = np.ones(n, dtype=np.int64)
            l_rect = l["rect"].to_numpy() == 1
            w = np.minimum(l["maxx"].to_numpy(), rect[2]) - np.maximum(
                l["minx"].to_numpy(), rect[0]
            )
            h = np.minimum(l["maxy"].to_numpy(), rect[3]) - np.maximum(
                l["miny"].to_numpy(), rect[1]
            )
            ov = np.maximum(w, 0.0) * np.maximum(h, 0.0)
            clip_a[l_rect] = ov[l_rect]
            sub = ~l_rect
            if sub.any():
                # exact path for the (rare) non-rect lefts: their clip
                # area and candidate test need real geometry
                lpg = wkb.decode_polygons(l["geometry_wkb"].to_numpy()[sub])
                R = RightGeoms(pa.table(
                    {"geometry_wkb": pa.array(list(r["geometry_wkb"]), pa.binary())}
                ))
                dec = kernels.decompose_rectilinear(lpg)
                qi_f, _pi_f = find_candidate_pairs(
                    lpg, kernels.detect_axis_rects(lpg), R, dec[2]
                )
                m_sub = np.zeros(len(lpg), dtype=np.int64)
                m_sub[np.unique(qi_f)] = 1
                matched[sub] = m_sub
                cw = _clip_rows_to_rect_wkb(lpg, rect, dec[2], dec[0], dec[1])
                keep = np.array([x is not None for x in cw], dtype=bool)
                c_sub = np.zeros(len(lpg), dtype=np.float64)
                if keep.any():
                    spg_c = wkb.decode_polygons(
                        np.asarray([x for x in cw if x is not None], dtype=object)
                    )
                    c_sub[keep] = kernels.polygon_areas(spg_c)
                clip_a[sub] = c_sub
            return pa.table(
                {"left_id": pa.array(lids, pa.int64()),
                 "rem": pa.array(np.zeros(n), pa.float64()),
                 "clip": pa.array(clip_a, pa.float64()),
                 "matched": pa.array(matched, pa.int64())}
            )

        lpg = wkb.decode_polygons(l["geometry_wkb"].to_numpy())
        matched = np.zeros(n, dtype=np.int64)
        R = None
        if len(r):
            R = RightGeoms(pa.table(
                {"geometry_wkb": pa.array(list(r["geometry_wkb"]), pa.binary())}
            ))
            l_decomp_full = kernels.decompose_rectilinear(lpg)
            qi_f, _pi_f = find_candidate_pairs(
                lpg, kernels.detect_axis_rects(lpg), R, l_decomp_full[2]
            )
            matched[np.unique(qi_f)] = 1
        s_rects, s_offs, s_rlin = kernels.decompose_rectilinear(lpg)
        cw = _clip_rows_to_rect_wkb(lpg, rect, s_rlin, s_rects, s_offs)
        keep = np.array([w is not None for w in cw], dtype=bool)
        clip_a = np.zeros(n, dtype=np.float64)
        rem = np.zeros(n, dtype=np.float64)
        if keep.any():
            spg_c = wkb.decode_polygons(
                np.asarray([w for w in cw if w is not None], dtype=object)
            )
            areas_c = kernels.polygon_areas(spg_c)
            clip_a[keep] = areas_c
            if R is None:
                rem[keep] = areas_c
            else:
                decomp_c = kernels.decompose_rectilinear(spg_c)
                qi, pi = find_candidate_pairs(
                    spg_c, kernels.detect_axis_rects(spg_c), R, decomp_c[2]
                )
                rem[keep] = difference_areas(spg_c, R, qi, pi, decomp_c)
        return pa.table(
            {"left_id": pa.array(lids, pa.int64()),
             "rem": pa.array(rem, pa.float64()),
             "clip": pa.array(clip_a, pa.float64()),
             "matched": pa.array(matched, pa.int64())}
        )

    lt = left_ds.map_batches(
        lambda b: _tag_survivor_side(b, res, left_id, 0), batch_format="pyarrow"
    )
    rt = right_ds.map_batches(
        lambda b: _tag_survivor_side(b, res, right_id, 1), batch_format="pyarrow"
    )
    totals = (
        lt.union(rt)
        .groupby("cell")
        .map_groups(per_cell, batch_format="pandas")
        .groupby("left_id")
        .aggregate(Sum(on="rem", alias_name="rem_sum"),
                   Sum(on="clip", alias_name="clip_sum"),
                   Max(on="matched", alias_name="matched_max"))
    )

    def pick(b: pa.Table) -> pa.Table:
        rs = b["rem_sum"].to_numpy(zero_copy_only=False)
        cs = b["clip_sum"].to_numpy(zero_copy_only=False)
        mm = b["matched_max"].to_numpy(zero_copy_only=False)
        keep = (rs > 1e-6) | ((cs <= 1e-6) & (mm == 0))
        return pa.table(
            {"left_id": b["left_id"].filter(pa.array(keep)).cast(pa.int64())}
        )

    return totals.map_batches(pick, batch_format="pyarrow")
