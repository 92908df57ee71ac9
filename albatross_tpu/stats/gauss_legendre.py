"""Gauss–Legendre quadrature nodes/weights
(/root/reference/include/albatross/src/stats/gauss_legendre.hpp).

Delegates to numpy's Golub–Welsch implementation (host-side setup code —
quadrature nodes are static data for any downstream jitted integrand).
"""

from __future__ import annotations

import numpy as np


def gauss_legendre_points(n: int, lo: float = -1.0, hi: float = 1.0):
    nodes, weights = np.polynomial.legendre.leggauss(int(n))
    scale = 0.5 * (hi - lo)
    return scale * (nodes + 1.0) + lo, weights * scale
