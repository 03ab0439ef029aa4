"""Gauss-Lobatto-Legendre (GLL) nodes/weights and polynomial evaluation.

The reference ships symbolically pre-generated constant tables
(model/modules/helpers/TransformMatrices.h: get_gll_points/get_gll_weights
for sizes 1-9, coefs_to_gll_lower).  Here the same quantities are *derived*:

* GLL nodes on [-1/2, 1/2] are the roots of (1-x^2) P'_{n-1}(x) mapped from
  [-1, 1], weights w_i = 2/(n(n-1) P_{n-1}(x_i)^2) normalized to sum to 1.
* ``coefs_to_gll_lower`` for two output points is simply the Vandermonde of
  the monomial basis at x = -1/2 and +1/2 (verified against the reference's
  tables, TransformMatrices.h:1132-1144).

Everything is computed in float64 numpy at trace/setup time.
"""

from __future__ import annotations

import numpy as np
from numpy.polynomial import legendre as npleg

__all__ = [
    "gll_points",
    "gll_weights",
    "coefs_to_gll_matrix",
    "gauss_legendre_points_weights",
]


def _gll_nodes_unit(n: int) -> np.ndarray:
    """GLL nodes on [-1, 1] for n points (n >= 2)."""
    if n == 1:
        return np.array([0.0])
    # Interior nodes: roots of P'_{n-1}.
    c = np.zeros(n)
    c[n - 1] = 1.0
    dcoef = npleg.legder(c)
    interior = npleg.legroots(dcoef)
    return np.concatenate(([-1.0], np.sort(interior), [1.0]))


def gll_points(n: int) -> np.ndarray:
    """GLL point locations on the cell-normalized domain [-1/2, 1/2]
    (reference TransformMatrices.h get_gll_points, e.g. :650-657 for n=5)."""
    return 0.5 * _gll_nodes_unit(n)


def gll_weights(n: int) -> np.ndarray:
    """GLL weights normalized to sum to 1
    (reference TransformMatrices.h get_gll_weights, e.g. :659-666 for n=5)."""
    if n == 1:
        return np.array([1.0])
    x = _gll_nodes_unit(n)
    c = np.zeros(n)
    c[n - 1] = 1.0
    Pn1 = npleg.legval(x, c)
    w = 2.0 / (n * (n - 1) * Pn1**2)
    return w / w.sum()


def coefs_to_gll_matrix(ord: int, npts: int = 2) -> np.ndarray:
    """Matrix mapping ``ord`` monomial poly coefs -> values at ``npts`` GLL
    points on [-1/2, 1/2].  For npts=2 this evaluates the polynomial at the
    cell edges x = -1/2, +1/2 (reference coefs_to_gll_lower,
    TransformMatrices.h:1132-1144).

    Returns shape (ord, npts): rslt[s, i] = x_i ** s.
    """
    x = gll_points(npts)
    return np.array([[xi**s for xi in x] for s in range(ord)])


def gauss_legendre_points_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre quadrature on [0, 1] with weights summing to 1.

    The thermal test case uses the 3-point rule with points/weights given on
    [0, 1] (reference dynamics_euler_stratified_wenofv.h:1344-1355).
    """
    x, w = npleg.leggauss(n)
    return 0.5 * (x + 1.0), 0.5 * w
