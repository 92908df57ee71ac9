"""Bit-identical twin of the reference test suite's random data generators.

The reference's toy datasets are drawn from ``std::mt19937 gen; gen.seed(3)``
through libstdc++'s ``std::normal_distribution`` (Marsaglia polar method over
``generate_canonical<double, 53>``) — see
/root/reference/tests/lib/albatross/test/test_utils.h:23-59.  This module
reproduces that byte stream exactly:

* ``np.random.RandomState(seed)`` uses MT19937 with the Knuth init_genrand
  seeding — the same as ``std::mt19937::seed`` — and ``randint(0, 2**32)``
  consumes exactly one 32-bit draw per element (validated against g++:
  first draws for seed 3 are 2365658986, 303761048, 3041471737, …);
* ``generate_canonical`` for a 32-bit engine and 53-bit doubles consumes two
  draws: (d0 + d1·2³²) / 2⁶⁴;
* the polar method returns y·mult first and caches x·mult.

Validated against a local g++ run of the exact reference expression
(`std::normal_distribution<>{0., 0.1}` after seed 3): the first 30 draws
match to the last ulp (see test_reference_parity.py::test_rng_twin_matches_gcc).
"""

from __future__ import annotations

import math

import numpy as np


class LibstdcppMt19937Normal:
    """std::mt19937 + libstdc++ std::normal_distribution twin."""

    def __init__(self, seed: int, mean: float = 0.0, stddev: float = 1.0):
        self._rs = np.random.RandomState(seed)
        self.mean = mean
        self.stddev = stddev
        self._saved = None

    def _u32(self) -> int:
        return int(self._rs.randint(0, 2**32))

    def _canonical(self) -> float:
        d0 = self._u32()
        d1 = self._u32()
        return (d0 + d1 * 2.0**32) / 2.0**64

    def __call__(self) -> float:
        if self._saved is not None:
            ret, self._saved = self._saved, None
        else:
            while True:
                x = 2.0 * self._canonical() - 1.0
                y = 2.0 * self._canonical() - 1.0
                r2 = x * x + y * y
                if not (r2 > 1.0 or r2 == 0.0):
                    break
            mult = math.sqrt(-2.0 * math.log(r2) / r2)
            self._saved = x * mult
            ret = y * mult
        return ret * self.stddev + self.mean

    def draws(self, n: int) -> np.ndarray:
        return np.asarray([self() for _ in range(n)])


def make_toy_linear_data(a=5.0, b=1.0, sigma=0.1, n=10):
    """Twin of test_utils.h:42-59 — features 0..n-1, targets a + b·x + ε
    with the exact reference noise stream (seed 3)."""
    d = LibstdcppMt19937Normal(3, 0.0, sigma)
    x = np.arange(n, dtype=np.float64)
    y = a + b * x + d.draws(n)
    return x, y


def make_toy_sine_data(a=5.0, b=10.0, sigma=0.1, n=10):
    """Twin of test_utils.h:23-40 — targets a·sin(b·x) + ε (seed 3)."""
    d = LibstdcppMt19937Normal(3, 0.0, sigma)
    x = np.arange(n, dtype=np.float64)
    y = a * np.sin(x * b) + d.draws(n)
    return x, y


# First 30 draws of std::normal_distribution<>{0., 0.1} after
# std::mt19937::seed(3), printed by g++ 12 (-O2) on this machine from the
# exact reference expression — the validation golden for the twin above.
GCC_NORMAL_GOLDENS_SEED3_SIGMA01 = np.asarray([
    0.01841281968535001,
    -0.10059551609090672,
    -0.034198035589195173,
    -0.0044724137304382365,
    0.027844091455381977,
    -0.058089399858103907,
    -0.015151489262227369,
    -0.11474341817543735,
    -0.061100003648205586,
    -0.11895173859892083,
    0.087226547579217356,
    -0.0015541759156237156,
    0.11666820150708253,
    -0.21586105022380897,
    0.075620445207913917,
    -0.16904987635163682,
    -0.034879409857873904,
    -0.17295147098237451,
    0.069631160273919898,
    0.056496170666392148,
    0.047986142028609596,
    -0.029594452488413643,
    -0.042030926447039922,
    -0.085961377456742136,
    -0.040791451388939984,
    0.12475784324341771,
    -0.18293836884211181,
    -0.15965176742749282,
    0.069031205174517538,
    0.092812246114005431,
])
