"""tools/fuzz_kernel.py is the extended-seed bug-hunter (it found the
full-sphere vectorize and complementary-overlap overlay bugs); keep its
families importable and passing on a few seeds so the tool never rots."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from fuzz_kernel import FAMILIES  # noqa: E402


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_fuzz_family_smoke(family):
    fn = FAMILIES[family]
    for seed in range(3):
        fn(np.random.default_rng(seed))
