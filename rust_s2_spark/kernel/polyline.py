"""Polyline: geodesic vertex chain with distances, interpolation, bounds,
simplification and a Region interface for the coverer.

The reference has no polyline type (its edge kernels live in edgeutil.rs);
this composes those same kernels — interpolate / project / distance
(edgeutil.rs:41-227), RectBounder (rect_bounder.rs) — into the chain-level
API a user of a spatial engine expects, plus RegionCoverer compatibility
(a curve intersects a cell iff an edge crosses it or a vertex lies inside;
it never contains a cell).
"""

from __future__ import annotations

import math

import numpy as np

from . import edgeutil
from .pip import CROSS, EdgeCrosser, RectBounder, expand_for_subregions
from .region import Rect

__all__ = ["Polyline"]


class Polyline:
    """Open geodesic chain of unit vertices ((n, 3) array, n >= 2)."""

    def __init__(self, vertices: np.ndarray):
        self.vertices = np.asarray(vertices, dtype=float)
        if len(self.vertices) < 2:
            raise ValueError("polyline needs at least 2 vertices")

    @staticmethod
    def from_latlngs(latlngs_deg) -> "Polyline":
        pts = []
        for lat, lng in latlngs_deg:
            la, ln = math.radians(lat), math.radians(lng)
            pts.append(
                [math.cos(la) * math.cos(ln), math.cos(la) * math.sin(ln), math.sin(la)]
            )
        return Polyline(np.array(pts))

    def num_edges(self) -> int:
        return len(self.vertices) - 1

    def _edge_lengths(self) -> np.ndarray:
        a = self.vertices[:-1]
        b = self.vertices[1:]
        cross = np.linalg.norm(np.cross(a, b), axis=1)
        dot = np.sum(a * b, axis=1)
        return np.arctan2(cross, dot)

    def length(self) -> float:
        """Total arc length in radians."""
        return float(self._edge_lengths().sum())

    def interpolate(self, t: float) -> np.ndarray:
        """Point at fraction t in [0, 1] of the total length (clamped);
        per-edge interpolation uses the exact slerp kernel
        (edgeutil.rs:41-60)."""
        if t <= 0.0:
            return self.vertices[0].copy()
        if t >= 1.0:
            return self.vertices[-1].copy()
        lens = self._edge_lengths()
        target = t * float(lens.sum())
        acc = 0.0
        for k, el in enumerate(lens):
            if acc + el >= target or k == len(lens) - 1:
                frac = 0.0 if el == 0 else (target - acc) / el
                return edgeutil.interpolate(
                    min(max(frac, 0.0), 1.0), self.vertices[k], self.vertices[k + 1]
                )
            acc += el
        return self.vertices[-1].copy()

    def project(self, p: np.ndarray) -> tuple[np.ndarray, int]:
        """(closest point on the chain, edge index) (edgeutil.rs:62-80)."""
        p = np.asarray(p, dtype=float)
        best, best_d2, best_k = None, np.inf, -1
        for k in range(self.num_edges()):
            q = edgeutil.closest_point_on_segment(
                p[None, :], self.vertices[k], self.vertices[k + 1]
            )[0]
            d = q - p
            d2 = float(d @ d)
            if d2 < best_d2:
                best, best_d2, best_k = q, d2, k
        return best, best_k

    def distance_rad(self, p: np.ndarray) -> float:
        """Angle from p to the nearest point of the chain."""
        p = np.asarray(p, dtype=float)[None, :]
        best = np.inf
        for k in range(self.num_edges()):
            d = float(
                edgeutil.distance_from_segment(p, self.vertices[k], self.vertices[k + 1])[0]
            )
            best = min(best, d)
        return best

    def simplify(self, tolerance_rad: float) -> "Polyline":
        from .simplify import simplify_points

        idx = simplify_points(self.vertices, tolerance_rad)
        return Polyline(self.vertices[idx].copy())

    # -- Region interface (coverer compatibility) --

    def rect_bound(self) -> Rect:
        bounder = RectBounder()
        for v in self.vertices:
            bounder.add_point(v)
        return bounder.get_bound()

    def cell_union_bound(self) -> list[int]:
        b = expand_for_subregions(self.rect_bound())
        return b.cell_union_bound()

    def contains_cell(self, cell) -> bool:
        return False  # a curve has no interior

    def intersects_cell(self, cell) -> bool:
        for v in self.vertices:
            if cell.contains_point(v):
                return True
        cv = cell.vertices()
        for k in range(4):
            crosser = EdgeCrosser(cv[k], cv[(k + 1) & 3])
            crosser.restart_at(self.vertices[0])
            for i in range(1, len(self.vertices)):
                if crosser.chain_crossing_sign(self.vertices[i]) >= 0:
                    return True
        return False
