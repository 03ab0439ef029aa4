"""WENO machinery vs the reference's closed-form tables and math properties.

The constants compared against are spot checks transcribed from
reference WenoLimiter_recon.h / TransformMatrices.h (cited per test).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from miniweatherml_tpu.ops.gll import (coefs_to_gll_matrix,
                                       gauss_legendre_points_weights,
                                       gll_points, gll_weights)
from miniweatherml_tpu.ops.weno import (_tv_quadratic_form, reconstruct_edges,
                                        sten_to_coefs_matrix, weno_matrices)


def test_gll_points_weights_match_reference_tables():
    # reference TransformMatrices.h:650-666 (n=5), :4113-4138 (n=9)
    p5 = gll_points(5)
    np.testing.assert_allclose(
        p5, [-0.5, -0.32732683535398857, 0.0, 0.32732683535398857, 0.5],
        atol=1e-14)
    w5 = gll_weights(5)
    np.testing.assert_allclose(
        w5, [0.05, 0.2722222222222222, 0.35555555555555556,
             0.2722222222222222, 0.05], atol=1e-14)
    p9 = gll_points(9)
    np.testing.assert_allclose(p9[1], -0.44987899770573007865, atol=1e-13)
    w9 = gll_weights(9)
    np.testing.assert_allclose(w9[0], 1.0 / 72.0, atol=1e-14)
    for n in (2, 3, 5, 7, 9):
        assert abs(gll_weights(n).sum() - 1.0) < 1e-14


def test_gauss_legendre_3pt_matches_reference():
    # reference dynamics_euler_stratified_wenofv.h:1349-1355
    p, w = gauss_legendre_points_weights(3)
    np.testing.assert_allclose(
        p, [0.112701665379258311, 0.5, 0.887298334620741688], atol=1e-14)
    np.testing.assert_allclose(
        w, [0.277777777777777778, 0.444444444444444444,
            0.277777777777777778], atol=1e-14)


def test_coefs_to_gll_lower_matches_reference():
    # reference TransformMatrices.h:1132-1144 (ord 5, 2 points)
    m = coefs_to_gll_matrix(5, 2)
    expect = np.array([[1, 1], [-0.5, 0.5], [0.25, 0.25],
                       [-0.125, 0.125], [0.0625, 0.0625]])
    np.testing.assert_allclose(m, expect, atol=1e-15)


def test_sten_to_coefs_matches_reference_formulas():
    # coefs3_shift2 (WenoLimiter_recon.h:91-96): offsets (-1, 0, 1)
    m = sten_to_coefs_matrix((-1, 0, 1))
    expect = np.array([
        [-1 / 24, 26 / 24, -1 / 24],
        [-0.5, 0.0, 0.5],
        [0.5, -1.0, 0.5],
    ])
    np.testing.assert_allclose(m, expect, atol=1e-14)
    # coefs2_shift1 (WenoLimiter_recon.h:72-76): offsets (-1, 0)
    m2 = sten_to_coefs_matrix((-1, 0))
    np.testing.assert_allclose(m2, [[0.0, 1.0], [-1.0, 1.0]], atol=1e-14)
    # coefs5_shift3 row 0 (WenoLimiter_recon.h:156): offsets (-2..2)
    m5 = sten_to_coefs_matrix((-2, -1, 0, 1, 2))
    np.testing.assert_allclose(
        m5[0],
        [0.0046875, -0.0604166666666667, 1.1114583333333333,
         -0.0604166666666667, 0.0046875], atol=1e-13)


def test_tv_quadratic_form_matches_reference_polynomials():
    # reference WenoLimiter_recon.h:37-56
    rng = np.random.default_rng(0)

    def ref_tv(a):
        a = np.concatenate([a, np.zeros(9 - len(a))])
        return (a[1]*a[1] + 4.333333333333333*a[2]*a[2] + 0.5*a[1]*a[3]
                + 39.1125*a[3]*a[3] + 4.2*a[2]*a[4]
                + 625.8357142857143*a[4]*a[4])

    for n in (2, 3, 4, 5):
        Q = _tv_quadratic_form(n)
        for _ in range(5):
            a = rng.standard_normal(n)
            np.testing.assert_allclose(a @ Q @ a, ref_tv(a), rtol=1e-12)


@pytest.mark.parametrize("ord", [3, 5, 7, 9])
def test_weno_exact_on_low_degree_polynomials(ord):
    """All candidate polynomials (low + high order) fit a degree <= deg_low
    polynomial exactly, so any convex weight blend must reproduce its edge
    values to machine precision -- a strong check on every matrix."""
    mats = weno_matrices(ord)
    hs = (ord - 1) // 2
    deg = 1 if ord == 3 else 2  # low sub-stencils are 2-pt (linear) / 3-pt
    rng = np.random.default_rng(1)
    coefs = rng.standard_normal(deg + 1)

    def cell_avg(d):
        return sum(c * (((d + 0.5) ** (j + 1) - (d - 0.5) ** (j + 1)) / (j + 1))
                   for j, c in enumerate(coefs))

    sten = np.array([cell_avg(d) for d in range(-hs, hs + 1)])
    edges = np.asarray(reconstruct_edges(jnp.asarray(sten[None], jnp.float64),
                                         mats))[0]
    exact = [sum(c * x ** j for j, c in enumerate(coefs)) for x in (-0.5, 0.5)]
    np.testing.assert_allclose(edges, exact, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("ord", [3, 5, 7, 9])
def test_weno_converges_on_smooth_function(ord):
    """Edge-reconstruction error for sin(x) must drop fast under refinement
    (the WENO weights approach the ideal weights on smooth data)."""
    mats = weno_matrices(ord)
    hs = (ord - 1) // 2

    def err(h):
        x0 = 0.37
        d = np.arange(-hs, hs + 1)
        # exact cell averages of sin over cells of width h centered x0 + d*h
        lo = x0 + (d - 0.5) * h
        hi = x0 + (d + 0.5) * h
        sten = (np.cos(lo) - np.cos(hi)) / h
        edges = np.asarray(
            reconstruct_edges(jnp.asarray(sten[None], jnp.float64), mats))[0]
        exact = np.sin([x0 - 0.5 * h, x0 + 0.5 * h])
        return np.abs(edges - exact).max()

    e1, e2 = err(0.1), err(0.05)
    # Convergence until the ideal-weight pollution floor (the reference's
    # fixed idl_H/idl_L ratios bound how far the low-order candidates are
    # suppressed on smooth data; ~1e-8 for ord 5 at these h).
    assert e2 < max(e1 / 6.0, 3e-8)
    assert e1 < 1e-4


@pytest.mark.parametrize("ord", [3, 5, 7, 9])
def test_weno_constant_exact_and_step_nonoscillatory(ord):
    mats = weno_matrices(ord)
    hs = (ord - 1) // 2
    const = np.full(ord, 3.25)
    e = np.asarray(reconstruct_edges(jnp.asarray(const[None], jnp.float64), mats))[0]
    np.testing.assert_allclose(e, [3.25, 3.25], rtol=1e-13)

    # Step function: reconstruction must stay within data bounds (ENO property).
    step = np.where(np.arange(-hs, hs + 1) < 0, 0.0, 1.0)
    e = np.asarray(reconstruct_edges(jnp.asarray(step[None], jnp.float64), mats))[0]
    assert e.min() >= -1e-8 and e.max() <= 1.0 + 1e-8


def test_weno5_matches_reference_scalar_pipeline():
    """End-to-end check of one ord-5 reconstruction against a direct
    transcription-free reimplementation of the reference pipeline
    (WenoLimiter.h:68-93) using our derived matrices independently."""
    mats = weno_matrices(5)
    rng = np.random.default_rng(2)
    s = rng.standard_normal(5)

    # reference-style scalar computation
    ML = sten_to_coefs_matrix((-2, -1, 0))
    MC = sten_to_coefs_matrix((-1, 0, 1))
    MR = sten_to_coefs_matrix((0, 1, 2))
    MH = sten_to_coefs_matrix((-2, -1, 0, 1, 2))
    cL, cC, cR = ML @ s[:3], MC @ s[1:4], MR @ s[2:]
    cH = MH @ s
    Q3, Q5 = _tv_quadratic_form(3), _tv_quadratic_form(5)
    tv = np.array([cL @ Q3 @ cL, cC @ Q3 @ cC, cR @ Q3 @ cR, cH @ Q5 @ cH])
    idl = np.array([1.0, 2.0, 1.0, 1e3]); idl /= idl.sum()
    tv = tv / tv.sum()
    w = idl / (tv * tv + 1e-20); w /= w.sum()
    blend = w[3] * cH
    blend[:3] += w[0] * cL + w[1] * cC + w[2] * cR
    P = np.array([[x ** j for j in range(5)] for x in (-0.5, 0.5)])
    expect = P @ blend

    got = np.asarray(reconstruct_edges(jnp.asarray(s[None], jnp.float64), mats))[0]
    np.testing.assert_allclose(got, expect, rtol=1e-12)
