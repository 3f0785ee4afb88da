"""S2 constants (public S2 geometry semantics; parity with /root/reference/src/s2/cellid.rs:58-70,
stuv.rs:239, metric.rs:56-110).

All values are dictated by the published S2 cell decomposition: 6 cube faces, a
level-30 Hilbert curve per face, 64-bit cell ids = 3 face bits + 61 position bits.
"""

from __future__ import annotations

import math

import numpy as np

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL  # 2**30 leaf cells per face edge
MAX_SIZE_I32 = MAX_SIZE
NUM_FACES = 6
LOOKUP_BITS = 4
SWAP_MASK = 0x01
INVERT_MASK = 0x02
MAX_SI_TI = 1 << (MAX_LEVEL + 1)

WRAP_OFFSET = np.uint64(NUM_FACES) << np.uint64(POS_BITS)

DBL_EPSILON = float(np.finfo(np.float64).eps)  # 2.220446049250313e-16

U64_ONE = np.uint64(1)
U64_TWO = np.uint64(2)


def lsb_for_level(level: int) -> int:
    """Lowest-set-bit value for a cell at ``level`` (cellid.rs:87-89 semantics)."""
    return 1 << (2 * (MAX_LEVEL - level))


# ---------------------------------------------------------------------------
# Metrics (metric.rs:56-110).  dim=1 length metrics, dim=2 area metrics.
# value(level) = deriv * 2**(-dim*level)
# ---------------------------------------------------------------------------


class Metric:
    """Projection metric: min/max/avg of a cell dimension as a function of level.

    Parity: /root/reference/src/s2/metric.rs:112-170.
    """

    def __init__(self, dim: int, deriv: float):
        self.dim = dim
        self.deriv = deriv

    def value(self, level: int) -> float:
        return math.ldexp(self.deriv, -self.dim * level)

    def min_level(self, val: float) -> int:
        """Minimum level such that the metric is at most val."""
        if val <= 0:
            return MAX_LEVEL
        level = -(math.frexp(val / self.deriv)[1] - 1) // self.dim
        return max(0, min(MAX_LEVEL, level))

    def max_level(self, val: float) -> int:
        """Maximum level such that the metric is at least val."""
        if val <= 0:
            return MAX_LEVEL
        level = math.frexp(self.deriv / val)[1] - 1
        if self.dim == 2:
            level //= 2
        return max(0, min(MAX_LEVEL, level))

    def closest_level(self, val: float) -> int:
        factor = math.sqrt(2) if self.dim == 1 else 2.0
        return self.min_level(factor * val)


# Quadratic projection metric constants (metric.rs:56-110).
MIN_ANGLE_SPAN = Metric(1, 4.0 / 3)
MAX_ANGLE_SPAN = Metric(1, 1.704897179199218452)
AVG_ANGLE_SPAN = Metric(1, math.pi / 2)

MIN_WIDTH = Metric(1, 2 * math.sqrt(2) / 3)
MAX_WIDTH = Metric(1, MAX_ANGLE_SPAN.deriv)
AVG_WIDTH = Metric(1, 1.434523672886099389)

MIN_EDGE = Metric(1, 2 * math.sqrt(2) / 3)
MAX_EDGE = Metric(1, MAX_ANGLE_SPAN.deriv)
AVG_EDGE = Metric(1, 1.459213746386106062)

MIN_DIAG = Metric(1, 8 * math.sqrt(2) / 9)
MAX_DIAG = Metric(1, 2.438654594434021032)
AVG_DIAG = Metric(1, 2.060422738998471683)

MIN_AREA = Metric(2, 8 * math.sqrt(2) / 9)
MAX_AREA = Metric(2, 2.635799256963161491)
AVG_AREA = Metric(2, 4 * math.pi / 6)

MAX_EDGE_ASPECT = 1.442615274452682920
MAX_DIAG_ASPECT = math.sqrt(3)
