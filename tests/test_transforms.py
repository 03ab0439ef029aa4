"""Transform-matrix library validated against analytic polynomials
(reference model/modules/helpers/TransformMatrices.h is 6763 lines of
generated tables; ours are derived and tested here)."""

import numpy as np
import pytest

from miniweatherml_tpu.ops.gll import gll_points
from miniweatherml_tpu.ops.transforms import (cell_avg_of_monomials,
                                              coefs_to_deriv, coefs_to_gll,
                                              coefs_to_prim, gll_to_coefs,
                                              sten_to_coefs, sten_to_gll)


@pytest.mark.parametrize("ord_", [3, 5, 7, 9])
def test_sten_to_coefs_reconstructs_polynomials(ord_):
    """Cell averages of any poly of degree < ord must map back to its exact
    coefficients."""
    rng = np.random.default_rng(ord_)
    coefs = rng.normal(size=ord_)
    hs = (ord_ - 1) // 2
    A = cell_avg_of_monomials(tuple(range(-hs, hs + 1)))
    sten = A @ coefs              # exact cell averages
    back = sten_to_coefs(ord_) @ sten
    np.testing.assert_allclose(back, coefs, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("ord_", [2, 3, 5, 7])
def test_gll_roundtrip(ord_):
    rng = np.random.default_rng(ord_)
    coefs = rng.normal(size=ord_)
    vals = coefs_to_gll(ord_) @ coefs
    # evaluate independently
    x = gll_points(ord_)
    expect = sum(c * x**j for j, c in enumerate(coefs))
    np.testing.assert_allclose(vals, expect, rtol=1e-12)
    back = gll_to_coefs(ord_) @ vals
    np.testing.assert_allclose(back, coefs, rtol=1e-8, atol=1e-10)


def test_sten_to_gll_composition():
    ord_ = 5
    rng = np.random.default_rng(0)
    coefs = rng.normal(size=ord_)
    hs = 2
    A = cell_avg_of_monomials(tuple(range(-hs, hs + 1)))
    sten = A @ coefs
    edge_vals = sten_to_gll(ord_, 2) @ sten   # values at x = -1/2, +1/2
    expect = [sum(c * x**j for j, c in enumerate(coefs)) for x in (-0.5, 0.5)]
    np.testing.assert_allclose(edge_vals, expect, rtol=1e-9, atol=1e-10)


def test_deriv_and_prim_are_inverse():
    ord_ = 6
    rng = np.random.default_rng(1)
    coefs = rng.normal(size=ord_)
    d = coefs_to_deriv(ord_) @ coefs
    # derivative of x^3 term: 3x^2 etc.
    expect = np.array([(j + 1) * coefs[j + 1] for j in range(ord_ - 1)] + [0.0])
    np.testing.assert_allclose(d, expect, rtol=1e-12)
    # antiderivative of the derivative recovers coefs (modulo constant)
    p = coefs_to_prim(ord_) @ d
    np.testing.assert_allclose(p[1:ord_], coefs[1:], rtol=1e-12)
