"""Bounded Voronoi cells by successive half-plane clipping.

The reference uses shapely.voronoi_polygons inside its centerline/
sliver machinery; neither shapely nor scipy.spatial is available here,
so each cell is computed directly from its definition: cell(i) is the
bbox clipped by the perpendicular-bisector half-plane toward p_i for
every (relevant) neighbor j. Half-plane clipping of a convex ring is
the existing Sutherland–Hodgman kernel, so cells are exact convex
polygons and partition the bbox by construction.

Complexity: O(k) clips per point with k candidate neighbors. The
candidate set can be pruned to grid-cell neighbors (a point farther
than twice the current cell radius cannot contribute a face); the
all-pairs form used below is for the bounded per-group/per-batch case —
at scale Voronoi runs per spatial cell with halo, like map_tiles.
"""

from __future__ import annotations

import numpy as np

from . import kernels


def voronoi_cells(px: np.ndarray, py: np.ndarray,
                  bounds: tuple[float, float, float, float],
                  prune: bool = True) -> list[np.ndarray]:
    """Voronoi cell ring per input point, clipped to ``bounds``.

    Returns a list of closed CCW rings (possibly empty arrays for
    duplicate points, which own no area).
    """
    minx, miny, maxx, maxy = bounds
    bbox = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
        dtype=np.float64,
    )
    n = len(px)
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    cells: list[np.ndarray] = []
    for i in range(n):
        # duplicate sites: only the first owns the cell
        dup = np.nonzero((px[:i] == px[i]) & (py[:i] == py[i]))[0]
        if len(dup):
            cells.append(np.empty((0, 2)))
            continue
        ring = bbox
        dx = px - px[i]
        dy = py - py[i]
        d2 = dx * dx + dy * dy
        order = np.argsort(d2, kind="stable")  # near neighbors clip most
        for j in order:
            if j == i or d2[j] == 0.0:
                continue
            if prune and len(ring) > 0:
                # a neighbor farther than the farthest cell vertex from
                # p_i (times 2) cannot cut the current cell
                vx = ring[:, 0] - px[i]
                vy = ring[:, 1] - py[i]
                r2 = (vx * vx + vy * vy).max()
                if d2[j] > 4.0 * r2:
                    break  # d2 is sorted ascending: no later j can cut
            mx = 0.5 * (px[i] + px[j])
            my = 0.5 * (py[i] + py[j])
            # half-plane {q: (q-m)·(p_j-p_i) <= 0}; _clip_halfplane keeps
            # the left side of c1->c2, so choose the perpendicular
            # direction that puts p_i on the left
            c1 = (mx, my)
            c2 = (mx - dy[j], my + dx[j])
            side_i = (c2[0] - c1[0]) * (py[i] - c1[1]) - (c2[1] - c1[1]) * (
                px[i] - c1[0]
            )
            if side_i < 0:
                c1, c2 = c2, c1
            ring = kernels._clip_halfplane(ring, c1, c2)
            if len(ring) == 0:
                break
        cells.append(ring)
    return cells
