"""BBoxIndex — uniform-bin bounding-box index (STRtree-lite).

Replaces the rtree/STRtree candidate queries the reference performs per
tile (``poly.sindex.intersection``, reference overlay.py:258-260;
``strtree`` pruning, base.py:446-472).  Built ONCE per map_batches actor
over the broadcast polygon layer; queried per cell/tile bbox.

Pure numpy: a coarse uniform grid of bins; each bin stores the ids of the
geometries whose bbox overlaps it.  ``query`` unions the bins under the
probe rect then exact-filters on bbox overlap.
"""

from __future__ import annotations

import numpy as np


class BBoxIndex:
    def __init__(self, bboxes: np.ndarray, nbins: int = 64):
        """``bboxes``: (N, 4) array of [xmin, ymin, xmax, ymax]."""
        self.bboxes = np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
        n = len(self.bboxes)
        if n == 0:
            self.x0 = self.y0 = 0.0
            self.bw = self.bh = 1.0
            self.nx = self.ny = 1
            self.bins = [np.empty(0, dtype=np.int64)]
            return
        self.x0 = float(self.bboxes[:, 0].min())
        self.y0 = float(self.bboxes[:, 1].min())
        x1 = float(self.bboxes[:, 2].max())
        y1 = float(self.bboxes[:, 3].max())
        self.nx = self.ny = max(1, min(nbins, int(np.sqrt(n)) + 1))
        self.bw = max((x1 - self.x0) / self.nx, 1e-12)
        self.bh = max((y1 - self.y0) / self.ny, 1e-12)
        bx0 = np.clip(((self.bboxes[:, 0] - self.x0) / self.bw).astype(np.int64), 0, self.nx - 1)
        bx1 = np.clip(((self.bboxes[:, 2] - self.x0) / self.bw).astype(np.int64), 0, self.nx - 1)
        by0 = np.clip(((self.bboxes[:, 1] - self.y0) / self.bh).astype(np.int64), 0, self.ny - 1)
        by1 = np.clip(((self.bboxes[:, 3] - self.y0) / self.bh).astype(np.int64), 0, self.ny - 1)
        buckets: list[list[int]] = [[] for _ in range(self.nx * self.ny)]
        for i in range(n):
            for by in range(by0[i], by1[i] + 1):
                base = by * self.nx
                for bx in range(bx0[i], bx1[i] + 1):
                    buckets[base + bx].append(i)
        self.bins = [np.asarray(b, dtype=np.int64) for b in buckets]

    def query(self, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
        """Ids of geometries whose bbox overlaps the probe rect (sorted, unique)."""
        bx0 = min(max(int((xmin - self.x0) / self.bw), 0), self.nx - 1)
        bx1 = min(max(int((xmax - self.x0) / self.bw), 0), self.nx - 1)
        by0 = min(max(int((ymin - self.y0) / self.bh), 0), self.ny - 1)
        by1 = min(max(int((ymax - self.y0) / self.bh), 0), self.ny - 1)
        parts = [
            self.bins[by * self.nx + bx]
            for by in range(by0, by1 + 1)
            for bx in range(bx0, bx1 + 1)
        ]
        cand = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        if len(cand) == 0:
            return cand
        b = self.bboxes[cand]
        hit = (b[:, 0] <= xmax) & (b[:, 2] >= xmin) & (b[:, 1] <= ymax) & (b[:, 3] >= ymin)
        return cand[hit]
