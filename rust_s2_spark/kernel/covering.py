"""CellUnion normalize/denormalize/from_range + RegionCoverer.

Parity: /root/reference/src/s2/cellunion.rs:50-194 (normalize, denormalize,
from_range, membership), region.rs:118-543 (coverer: candidates, priority
queue, normalize_covering).  Coverings are deterministic (region.rs:686-688),
which lets the engine use them as join keys.

Runs per query *region* (regions are few — broadcast side of spatial joins),
so a heapq port is the right altitude; the per-document side never touches
this code.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np

from .constants import MAX_LEVEL
from . import hierarchy as h
from .region import Cell

__all__ = ["CellUnion", "RegionCoverer"]


def _contains(a: int, b: int) -> bool:
    return bool(h.contains(np.uint64(a), np.uint64(b)))


def _level(cid: int) -> int:
    return int(h.level(np.uint64(cid)))


class CellUnion:
    """Sorted, normalized list of CellIDs (cellunion.rs:36)."""

    def __init__(self, ids):
        self.ids = [int(i) for i in ids]

    @staticmethod
    def from_range(begin: int, end: int) -> "CellUnion":
        """Leaf range [begin, end) -> minimal tiling (cellunion.rs:50-58)."""
        out = []
        cur = int(h.max_tile(np.uint64(begin), np.uint64(end)))
        while cur != end:
            out.append(cur)
            cur = int(h.max_tile(h.next_cell(np.uint64(cur)), np.uint64(end)))
        return CellUnion(out)

    def normalize(self) -> None:
        """Sort unsigned; drop contained; collapse 4 siblings -> parent,
        cascading (cellunion.rs:61-127)."""
        ids = sorted(int(np.uint64(i)) for i in self.ids)
        out: list[int] = []
        for ci in ids:
            if out and _contains(out[-1], ci):
                continue
            while out and _contains(ci, out[-1]):
                out.pop()
            while len(out) >= 3:
                a, b, c = out[-3], out[-2], out[-1]
                if (a ^ b ^ c) != ci:
                    break
                # exact sibling test (cellunion.rs:101-113)
                mask = int(h.lsb(np.uint64(ci))) << 1
                mask = ~(mask + (mask << 1)) & ((1 << 64) - 1)
                want = ci & mask
                if (
                    (a & mask) != want
                    or (b & mask) != want
                    or (c & mask) != want
                    or bool(h.is_face(np.uint64(ci)))
                ):
                    break
                out.pop()
                out.pop()
                out.pop()
                ci = int(h.immediate_parent(np.uint64(ci)))
            out.append(ci)
        self.ids = out

    def denormalize(self, min_level: int, level_mod: int) -> None:
        """Re-expand so levels satisfy min_level/level_mod (cellunion.rs:160-184)."""
        out: list[int] = []
        for cid in self.ids:
            lvl = _level(cid)
            new_level = max(lvl, min_level)
            if level_mod > 1:
                new_level += (MAX_LEVEL - (new_level - min_level)) % level_mod
                new_level = min(new_level, MAX_LEVEL)
            if new_level == lvl:
                out.append(cid)
            else:
                cur = int(h.child_begin_at_level(np.uint64(cid), new_level))
                end = int(h.child_end_at_level(np.uint64(cid), new_level))
                while cur != end:
                    out.append(cur)
                    cur = int(h.next_cell(np.uint64(cur)))
        self.ids = out

    def contains_cellid(self, cid: int) -> bool:
        """Binary search on the normalized set (cellunion.rs:144-153)."""
        import bisect

        v = self.ids
        i = bisect.bisect_right(v, int(cid))
        if i < len(v) and int(h.range_min(np.uint64(v[i]))) <= cid:
            return True
        return i != 0 and int(h.range_max(np.uint64(v[i - 1]))) >= cid

    def intersects_cellid(self, cid: int) -> bool:
        """cellunion.rs:131-141."""
        import bisect

        v = self.ids
        i = bisect.bisect_right(v, int(cid))
        if i < len(v) and int(h.range_min(np.uint64(v[i]))) <= int(
            h.range_max(np.uint64(cid))
        ):
            return True
        return i != 0 and int(h.range_max(np.uint64(v[i - 1]))) >= int(
            h.range_min(np.uint64(cid))
        )

    def contains_points(self, cids: np.ndarray) -> np.ndarray:
        """Vectorized membership for leaf-id arrays: np.searchsorted on the
        sorted covering (replaces ShapeIndex locate, SURVEY §2.5)."""
        v = np.array(self.ids, dtype=np.uint64)
        if len(v) == 0:
            return np.zeros(len(cids), dtype=bool)
        cids = np.asarray(cids, dtype=np.uint64)
        i = np.searchsorted(v, cids, side="right")
        right_ok = np.zeros(len(cids), dtype=bool)
        m = i < len(v)
        right_ok[m] = h.range_min(v[i[m]]) <= cids[m]
        left_ok = np.zeros(len(cids), dtype=bool)
        m2 = i > 0
        left_ok[m2] = h.range_max(v[i[m2] - 1]) >= cids[m2]
        return right_ok | left_ok

    def leaf_cells_covered(self) -> int:
        return sum(1 << ((MAX_LEVEL - _level(c)) << 1) for c in self.ids)

    def cap_bound(self):
        """Bounding cap: area-weighted centroid axis, expanded to enclose
        every cell's own cap bound (cellunion.rs:197-233)."""
        from .constants import AVG_AREA
        from .region import Cap
        from . import hilbert

        if not self.ids:
            return Cap.empty()
        centroid = np.zeros(3)
        for ci in self.ids:
            u = np.uint64(ci)
            area = AVG_AREA.value(int(_level(ci)))
            x, y, z = hilbert.cellid_to_xyz(u)
            centroid += area * np.array([float(x), float(y), float(z)])
        n = np.linalg.norm(centroid)
        if n == 0:
            centroid = np.array([1.0, 0.0, 0.0])
        else:
            centroid /= n
        cap = Cap(centroid, 0.0)
        for ci in self.ids:
            cap = cap.add_cap(Cell(ci).cap_bound())
        return cap

    def rect_bound(self):
        """Union of per-cell rect bounds (cellunion.rs:236-243)."""
        from .pip import _rect_union
        from .region import Rect

        b = Rect.empty()
        for ci in self.ids:
            b = _rect_union(b, Cell(ci).rect_bound())
        return b


@dataclass(order=True)
class _Candidate:
    priority: int
    seq: int  # deterministic FIFO tie-break
    cid: int = field(compare=False)
    cell: Cell = field(compare=False)
    terminal: bool = field(compare=False, default=False)
    children: list = field(compare=False, default_factory=list)
    num_terminals: int = field(compare=False, default=0)


class RegionCoverer:
    """Best-first covering refinement (region.rs:118-424).

    region must expose intersects_cell(Cell), contains_cell(Cell),
    cell_union_bound() -> list[int] (Cap, Rect, Cell, and pip.Loop do).
    """

    def __init__(
        self,
        min_level: int = 0,
        max_level: int = MAX_LEVEL,
        level_mod: int = 1,
        max_cells: int = 8,
    ):
        self.min_level = max(0, min(MAX_LEVEL, min_level))
        self.max_level = max(0, min(MAX_LEVEL, max_level))
        self.level_mod = max(1, min(3, level_mod))
        self.max_cells = max_cells

    # -- candidate machinery (region.rs:172-273) --

    def _new_candidate(self, region, cell: Cell, interior: bool):
        if not region.intersects_cell(cell):
            return None
        level = cell.level
        terminal = False
        if level >= self.min_level:
            if interior:
                if region.contains_cell(cell):
                    terminal = True
                elif level + self.level_mod > self.max_level:
                    return None
            elif level + self.level_mod > self.max_level or region.contains_cell(cell):
                terminal = True
        return _Candidate(priority=0, seq=0, cid=cell.id, cell=cell, terminal=terminal)

    def _expand_children(self, region, cand: _Candidate, cell: Cell, num_levels: int, interior: bool) -> int:
        num_levels -= 1
        num_terminals = 0
        cur = int(h.child_begin_at_level(np.uint64(cell.id), cell.level + 1))
        end = int(h.child_end_at_level(np.uint64(cell.id), cell.level + 1))
        while cur != end:
            child_cell = Cell(cur)
            if num_levels > 0:
                if region.intersects_cell(child_cell):
                    num_terminals += self._expand_children(
                        region, cand, child_cell, num_levels, interior
                    )
            else:
                child = self._new_candidate(region, child_cell, interior)
                if child is not None:
                    if child.terminal:
                        num_terminals += 1
                    cand.children.append(child)
            cur = int(h.next_cell(np.uint64(cur)))
        return num_terminals

    def _add_candidate(self, region, cand: _Candidate, state, interior: bool) -> None:
        result, pq = state
        if cand.terminal:
            result.append(cand.cid)
            return
        level = cand.cell.level
        num_levels = 1 if level < self.min_level else self.level_mod
        num_terminals = self._expand_children(region, cand, cand.cell, num_levels, interior)
        max_children_shift = self.level_mod * 2
        if not cand.children:
            return
        if (
            not interior
            and num_terminals == (1 << max_children_shift)
            and level >= self.min_level
        ):
            # All children terminal: emit the parent instead (region.rs:248-258).
            cand.terminal = True
            self._add_candidate(region, cand, state, interior)
            return
        # Priority: largest cell, fewest children, fewest terminals (region.rs:263-272).
        cand.priority = (
            ((level << max_children_shift) + len(cand.children)) << max_children_shift
        ) + num_terminals
        cand.num_terminals = num_terminals
        cand.seq = len(pq) + len(result)  # deterministic tie-break
        heapq.heappush(pq, cand)

    def _adjust_level(self, level: int) -> int:
        if self.level_mod > 1 and level > self.min_level:
            level -= (level - self.min_level) % self.level_mod
        return level

    def _adjust_cell_levels(self, cells: list[int]) -> list[int]:
        # region.rs:279-310
        if self.level_mod == 1:
            return cells
        out: list[int] = []
        for ci in cells:
            level = _level(ci)
            new_level = self._adjust_level(level)
            cur = int(h.parent(np.uint64(ci), new_level)) if new_level != level else ci
            if out and _contains(out[-1], cur):
                continue
            while out and _contains(cur, out[-1]):
                out.pop()
            out.append(cur)
        return out

    def _initial_candidates(self, region, state, interior: bool) -> None:
        # region.rs:313-330
        temp = RegionCoverer(
            min_level=0,
            max_level=self.max_level,
            level_mod=1,
            max_cells=min(self.max_cells, 4),
        )
        cells = temp.fast_covering(region).ids
        cells = self._adjust_cell_levels(cells)
        for ci in cells:
            cand = self._new_candidate(region, Cell(ci), interior)
            if cand is not None:
                self._add_candidate(region, cand, state, interior)

    def _covering_internal(self, region, interior: bool) -> list[int]:
        # region.rs:346-380
        result: list[int] = []
        pq: list[_Candidate] = []
        state = (result, pq)
        self._initial_candidates(region, state, interior)
        while pq and (not interior or len(result) < self.max_cells):
            cand = heapq.heappop(pq)
            if (
                interior
                or cand.cell.level < self.min_level
                or len(cand.children) == 1
                or len(result) + len(pq) + len(cand.children) <= self.max_cells
            ):
                for child in cand.children:
                    if not interior or len(result) < self.max_cells:
                        self._add_candidate(region, child, state, interior)
            else:
                cand.terminal = True
                self._add_candidate(region, cand, state, interior)
        return result

    # -- public API (region.rs:400-441, 469-476, 498-543) --

    def cellunion(self, region) -> CellUnion:
        cu = CellUnion(self._covering_internal(region, interior=False))
        cu.normalize()
        return cu

    def interior_cellunion(self, region) -> CellUnion:
        cu = CellUnion(self._covering_internal(region, interior=True))
        cu.normalize()
        return cu

    def covering(self, region) -> CellUnion:
        cu = self.cellunion(region)
        cu.denormalize(self.min_level, self.level_mod)
        return cu

    def interior_covering(self, region) -> CellUnion:
        cu = self.interior_cellunion(region)
        cu.denormalize(self.min_level, self.level_mod)
        return cu

    def fast_covering(self, region) -> CellUnion:
        cu = CellUnion(region.cell_union_bound())
        self._normalize_covering(cu)
        return cu

    def _normalize_covering(self, covering: CellUnion) -> None:
        # region.rs:498-543
        if self.max_level < MAX_LEVEL or self.level_mod > 1:
            ids = []
            for ci in covering.ids:
                level = _level(ci)
                new_level = self._adjust_level(min(level, self.max_level))
                ids.append(
                    int(h.parent(np.uint64(ci), new_level)) if new_level != level else ci
                )
            covering.ids = ids
        covering.normalize()
        while len(covering.ids) > self.max_cells:
            best_index = -1
            best_level = -1
            v = covering.ids
            for i in range(len(v) - 1):
                lvl = int(h.common_ancestor_level(np.uint64(v[i]), np.uint64(v[i + 1])))
                if lvl < 0:
                    continue
                lvl = self._adjust_level(lvl)
                if lvl > best_level:
                    best_level = lvl
                    best_index = i
            if best_level < self.min_level:
                break
            v[best_index] = int(h.parent(np.uint64(v[best_index]), best_level))
            covering.normalize()
        if self.min_level > 0 or self.level_mod > 1:
            covering.denormalize(self.min_level, self.level_mod)
