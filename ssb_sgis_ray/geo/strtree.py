"""STR-packed R-tree (numpy, bulk-loaded) for per-partition spatial joins.

A from-scratch implementation of the Sort-Tile-Recursive packing of
Leutenegger et al. (1997) — the same bulk-load strategy GEOS's STRtree
(used pervasively in the reference, e.g. /root/reference/src/sgis/
geopandas_tools/sfilter.py:51-59, overlay.py:210-211) uses. Built ONCE per
actor / per partition group inside stateful stages; queried per batch.

Query returns candidate pairs by bbox overlap; callers refine with the
exact predicate kernels (PIP winding / polygon intersects).
"""

from __future__ import annotations

import math

import numpy as np

NODE_CAP = 16


class STRtree:
    """Bulk-loaded static R-tree over item bboxes.

    boxes: (n, 4) float64 (minx, miny, maxx, maxy).
    """

    def __init__(self, boxes: np.ndarray):
        boxes = np.asarray(boxes, dtype=np.float64)
        self.n = len(boxes)
        self.item_boxes = boxes
        if self.n == 0:
            self.levels: list[tuple[np.ndarray, np.ndarray]] = []
            return
        # STR packing: sort by cx into vertical slices, sort each by cy
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        n_leaves = math.ceil(self.n / NODE_CAP)
        n_slices = math.ceil(math.sqrt(n_leaves))
        order = np.argsort(cx, kind="stable")
        slice_size = math.ceil(self.n / n_slices)
        perm = np.empty(self.n, dtype=np.int64)
        pos = 0
        for s in range(0, self.n, slice_size):
            sl = order[s : s + slice_size]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            perm[pos : pos + len(sl)] = sl
            pos += len(sl)
        self.perm = perm  # leaf-order permutation of item indices
        sorted_boxes = boxes[perm]

        # build levels bottom-up; each level: (node_boxes, child_start_idx)
        self.levels = []
        cur = sorted_boxes
        while len(cur) > 1:
            n_nodes = math.ceil(len(cur) / NODE_CAP)
            node_boxes = np.empty((n_nodes, 4), dtype=np.float64)
            starts = np.arange(n_nodes, dtype=np.int64) * NODE_CAP
            for i in range(n_nodes):
                ch = cur[i * NODE_CAP : (i + 1) * NODE_CAP]
                node_boxes[i, 0] = ch[:, 0].min()
                node_boxes[i, 1] = ch[:, 1].min()
                node_boxes[i, 2] = ch[:, 2].max()
                node_boxes[i, 3] = ch[:, 3].max()
            self.levels.append((node_boxes, starts))
            cur = node_boxes
        # levels[0] = leaf-group level (children are items), last = root level
        # column-split contiguous copies: descent math gathers 1-D arrays
        # instead of slicing (T,4) gathers — strided column reads are ~4×
        # the memory traffic on this host and dominate fan-out-heavy joins
        self._leaf_cols = tuple(
            np.ascontiguousarray(sorted_boxes[:, k]) for k in range(4)
        )
        self._level_cols = [
            tuple(np.ascontiguousarray(nb[:, k]) for k in range(4))
            for nb, _ in self.levels
        ]

    def query_bbox(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Candidate (query_idx, item_idx) pairs whose bboxes overlap.

        Vectorized breadth-first descent: maintains frontier (query, node)
        pairs per level, expanding each surviving node into its children.
        All hot-path arithmetic runs on contiguous 1-D column arrays.
        """
        qboxes = np.asarray(qboxes, dtype=np.float64)
        nq = len(qboxes)
        if self.n == 0 or nq == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        if not self.levels:
            # single item
            m = _overlaps(qboxes, self.item_boxes[0])
            qi = np.nonzero(m)[0]
            return qi, np.zeros(len(qi), dtype=np.int64)
        qx0 = np.ascontiguousarray(qboxes[:, 0])
        qy0 = np.ascontiguousarray(qboxes[:, 1])
        qx1 = np.ascontiguousarray(qboxes[:, 2])
        qy1 = np.ascontiguousarray(qboxes[:, 3])

        # start at the top level
        top_boxes, _ = self.levels[-1]
        q_idx = np.repeat(np.arange(nq), len(top_boxes))
        n_idx = np.tile(np.arange(len(top_boxes)), nq)
        mask = _overlaps_pairs(qboxes[q_idx], top_boxes[n_idx])
        q_idx, n_idx = q_idx[mask], n_idx[mask]

        for lvl in range(len(self.levels) - 1, -1, -1):
            if len(n_idx) == 0:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
            _, starts = self.levels[lvl]
            cx0, cy0, cx1, cy1 = (
                self._level_cols[lvl - 1] if lvl > 0 else self._leaf_cols
            )
            n_children = len(cx0)
            # expand each (q, node) into its children
            c0 = starts[n_idx]
            c1 = np.minimum(c0 + NODE_CAP, n_children)
            counts = c1 - c0
            total = int(counts.sum())
            rep_q = np.repeat(q_idx, counts)
            base = np.concatenate(([0], np.cumsum(counts)[:-1]))
            within = np.arange(total) - np.repeat(base, counts)
            child_idx = np.repeat(c0, counts) + within
            mask = (
                (qx0[rep_q] <= cx1[child_idx])
                & (qx1[rep_q] >= cx0[child_idx])
                & (qy0[rep_q] <= cy1[child_idx])
                & (qy1[rep_q] >= cy0[child_idx])
            )
            q_idx, n_idx = rep_q[mask], child_idx[mask]
        # n_idx are leaf-order item positions -> original indices
        return q_idx, self.perm[n_idx]


def _overlaps(qboxes: np.ndarray, box: np.ndarray) -> np.ndarray:
    return (
        (qboxes[:, 0] <= box[2])
        & (qboxes[:, 2] >= box[0])
        & (qboxes[:, 1] <= box[3])
        & (qboxes[:, 3] >= box[1])
    )


def _overlaps_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (
        (a[:, 0] <= b[:, 2])
        & (a[:, 2] >= b[:, 0])
        & (a[:, 1] <= b[:, 3])
        & (a[:, 3] >= b[:, 1])
    )
