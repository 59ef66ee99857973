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
of the left side is processed vectorized-per-pair. Geometry math uses the
convex kernels (Sutherland–Hodgman intersection; convex-complement
difference decomposition) — right-side geometries must be convex (boxes,
diamonds, tiles, grid cells); concave right sides raise. The pieces
produced by successive convex subtraction remain convex (each piece is an
intersection of half-planes with the original subject), so difference
chains are exact.

Unsupported in round 1: concave right operands, grid_size snapping.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..geo import kernels, wkb
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


def _subtract_all(subject_rings: list[np.ndarray], clip_rings: list[np.ndarray]) -> list[np.ndarray]:
    """subject − union(clips): successive convex-complement subtraction.

    Each clip ring must be convex. Pieces stay convex throughout, so
    chained subtraction is exact and the resulting pieces are disjoint.
    """
    pieces = list(subject_rings)
    for clip in clip_rings:
        if not kernels.is_convex_ring(clip):
            raise NotImplementedError("concave right-side geometry in difference")
        nxt: list[np.ndarray] = []
        for p in pieces:
            nxt.extend(kernels.convex_difference_pieces(p, clip))
        pieces = nxt
        if not pieces:
            break
    return pieces


class OverlayActor:
    """Actor-pool stage computing one ``how`` of clean_overlay per batch."""

    def __init__(self, right_ref, how: str, lsuffix="_1", rsuffix="_2",
                 emit: str = "geometry"):
        if how not in HOWS:
            raise ValueError(f"how must be one of {HOWS}, got {how!r}")
        # emit="area": projection pushdown — skip WKB encode and emit a
        # piece_area column instead of geometry (for area-only consumers)
        self.emit = emit
        right: pa.Table = ray.get(right_ref)
        self.right = right
        self.how = how
        self.lsuffix = lsuffix
        self.rsuffix = rsuffix
        self.rpg = wkb.decode_polygons(right["geometry_wkb"])
        self.rbounds = kernels.polygon_bounds(self.rpg)
        self.tree = STRtree(self.rbounds)
        self.right_cols = [c for c in right.column_names if c != "geometry_wkb"]
        # rectangle fast path: axis-aligned boxes stay boxes under clip and
        # subtract, so rect×rect pairs use pure interval math (vectorized)
        self.r_is_rect = kernels.detect_axis_rects(self.rpg)

    # -- column plumbing ---------------------------------------------------
    def _suffix_plan(self, left_cols: list[str], with_suffix: bool):
        both = set(left_cols) & set(self.right_cols)
        if not with_suffix:
            both = set()
        lmap = {c: (c + self.lsuffix if c in both else c) for c in left_cols}
        rmap = {c: (c + self.rsuffix if c in both else c) for c in self.right_cols}
        return lmap, rmap

    def _emit(self, left: pa.Table, li: np.ndarray, ri: np.ndarray | None,
              geoms, with_suffix: bool, area_col: bool = False) -> pd.DataFrame:
        left_cols = [c for c in left.column_names if c != "geometry_wkb"]
        lmap, rmap = self._suffix_plan(left_cols, with_suffix)
        data = {}
        lt = left.take(pa.array(li, pa.int64()))
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
    def _pairs(self, lpg: wkb.PolygonArray, l_is_rect: np.ndarray):
        lb = kernels.polygon_bounds(lpg)
        qi, pi = self.tree.query_bbox(lb)
        if len(qi):
            # rect×rect: bbox overlap IS the exact boundary-inclusive
            # intersects test — skip the generic refine for those pairs
            both_rect = l_is_rect[qi] & self.r_is_rect[pi]
            gi = np.nonzero(~both_rect)[0]
            keep = np.ones(len(qi), dtype=bool)
            if len(gi):
                keep[gi] = kernels.polygons_intersect_pairs(
                    lpg, self.rpg, qi[gi], pi[gi]
                )
            qi, pi = qi[keep], pi[keep]
        return qi, pi

    def _intersection_leg(self, left, lpg, qi, pi, l_is_rect, lbounds,
                          with_suffix=True) -> pd.DataFrame:
        both_rect = l_is_rect[qi] & self.r_is_rect[pi] if len(qi) else np.zeros(0, bool)

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

        # generic leg (python per pair) for everything else
        out_li, out_ri, out_geom, out_area = [], [], [], []
        for k in np.nonzero(~both_rect)[0]:
            srings = _rings_of_row(lpg, int(qi[k]))
            crings = _rings_of_row(self.rpg, int(pi[k]))
            pieces = []
            for s in srings:
                for c in crings:
                    if not kernels.is_convex_ring(c):
                        raise NotImplementedError("concave right geometry")
                    clipped = kernels.clip_ring_convex(s, c)
                    if kernels.ring_area(clipped) > 0:
                        pieces.append(clipped)
            if not pieces:
                continue
            out_li.append(qi[k])
            out_ri.append(pi[k])
            if area_only:
                out_area.append(sum(kernels.ring_area(p) for p in pieces))
            else:
                out_geom.append(_pieces_to_wkb(pieces))
        li = np.concatenate([rect_li, np.array(out_li, np.int64)])
        ri = np.concatenate([rect_ri, np.array(out_ri, np.int64)])
        if area_only:
            areas = np.concatenate([rect_area, np.array(out_area, np.float64)])
            return self._emit(left, li.astype(np.int64), ri.astype(np.int64),
                              areas, with_suffix, area_col=True)
        return self._emit(left, li.astype(np.int64), ri.astype(np.int64),
                          rect_geom + out_geom, with_suffix)

    def _difference_leg(self, left, lpg, qi, pi, l_is_rect, lbounds,
                        with_suffix=False) -> pd.DataFrame:
        n = len(lpg)
        out_li, out_geom = [], []
        # group matched right rows per left row (overlay.py:399-423 agg)
        by_left: dict[int, list[int]] = {}
        for k in range(len(qi)):
            by_left.setdefault(int(qi[k]), []).append(int(pi[k]))
        for i in range(n):
            if i not in by_left:
                g = _pieces_to_wkb(_rings_of_row(lpg, i))  # untouched rows
            elif l_is_rect[i] and self.r_is_rect[by_left[i]].all():
                # rect subject − rect clips: stay in interval math; the
                # remainder is always a set of disjoint axis-aligned boxes
                rects = lbounds[i : i + 1]
                for r in by_left[i]:
                    rects = kernels.subtract_rect_from_rects(rects, self.rbounds[r])
                    if len(rects) == 0:
                        break
                g = _pieces_to_wkb(list(kernels.rects_to_rings(rects))) if len(rects) else None
            else:
                clips = []
                for r in by_left[i]:
                    clips.extend(_rings_of_row(self.rpg, r))
                g = _pieces_to_wkb(_subtract_all(_rings_of_row(lpg, i), clips))
            if g is not None:
                out_li.append(i)
                out_geom.append(g)
        return self._emit(left, np.array(out_li, np.int64), None, out_geom, with_suffix)

    # -- main --------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        lpg = wkb.decode_polygons(batch["geometry_wkb"])
        l_is_rect = kernels.detect_axis_rects(lpg)
        lbounds = kernels.polygon_bounds(lpg)
        qi, pi = self._pairs(lpg, l_is_rect)
        how = self.how
        if how == "intersection":
            return self._intersection_leg(batch, lpg, qi, pi, l_is_rect, lbounds)
        if how == "difference":
            return self._difference_leg(batch, lpg, qi, pi, l_is_rect, lbounds)
        if how == "identity":
            # intersection + left difference legs (overlay.py:310-317)
            a = self._intersection_leg(batch, lpg, qi, pi, l_is_rect, lbounds)
            b = self._difference_leg(batch, lpg, qi, pi, l_is_rect, lbounds,
                                     with_suffix=True)
            return pd.concat([a, b], ignore_index=True)[list(a.columns)]
        if how == "update":
            # difference of left by right, then all right rows appended
            # (overlay.py:260-263)
            a = self._difference_leg(batch, lpg, qi, pi, l_is_rect, lbounds)
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
        # rect fast path: subject and all clips axis-aligned -> interval math
        if kernels.detect_axis_rects(rpg)[0] and kernels.detect_axis_rects(lpg).all():
            rects = kernels.polygon_bounds(rpg)[:1]
            for cb in kernels.polygon_bounds(lpg):
                rects = kernels.subtract_rect_from_rects(rects, cb)
                if len(rects) == 0:
                    break
            gwkb = (_pieces_to_wkb(list(kernels.rects_to_rings(rects)))
                    if len(rects) else None)
        else:
            subject = _rings_of_row(rpg, 0)
            clips = []
            for i in range(len(lpg)):
                clips.extend(_rings_of_row(lpg, i))
            gwkb = _pieces_to_wkb(_subtract_all(subject, clips))
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
    leg that needs global match state. Left geometries must be convex for
    the right-leg subtraction. Returns a Dataset whose rows carry a
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
    ref = ray.put(right_table)
    if how in ("intersection", "difference", "identity"):
        return left.map_batches(
            OverlayActor,
            fn_constructor_kwargs={"right_ref": ref, "how": how, "emit": emit},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    raise NotImplementedError(
        "union/symmetric_difference/update compose intersection+difference "
        "legs with a right-side match pass; use overlay_union_area() or the "
        "per-how legs for now"
    )
