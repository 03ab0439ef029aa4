"""Fusion-friendly WENO reconstruction from shifted slices.

The dense formulation (ops/weno.py) materializes an ``ord``-wide stencil
stack -- ``ord`` full copies of the grid -- and contracts it with einsums.
That is a clean oracle but HBM-heavy: the stencil stack is written and
re-read several times per direction.

This module evaluates the same math as pure elementwise arithmetic over
``ord`` *shifted views* of the padded input:

  TV_k   = sum_{ij} G_k[i,j] * shift_i * shift_j     (sparse symmetric sum)
  w_k    = convexify(idl_k / (convexify(TV)_k^2 + 1e-20))
  edge_e = sum_k w_k * sum_i E_k[e,i] * shift_i

No stencil array is ever materialized: XLA fuses the shifted reads, the
multiply-adds, and the weight normalization into one pass over the grid, so
the whole limiter costs ~1 read + 2 writes of the field per direction
instead of ~ord reads/writes.  This is the production path; ops/weno.py
remains the golden oracle (tests assert bitwise-level agreement).

Derivation and weight pipeline are identical to ops/weno.py (reference
model/modules/helpers/WenoLimiter.h:68-93, WenoLimiter_recon.h:30-204).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .weno import WenoMatrices

__all__ = ["reconstruct_edges_shifted"]


@lru_cache(maxsize=None)
def _sparse_terms(ord_: int, mats_key: int):
    """Precompute sparse (i, j, coef) TV terms and (i, coef) edge terms."""
    # mats_key is id(mats) -- WenoMatrices are lru_cached per order, so this
    # is stable; recompute from the canonical tables instead of holding refs.
    from .weno import weno_matrices

    mats = weno_matrices(ord_)
    K = mats.G.shape[0]
    tv_terms = []
    for k in range(K):
        G = mats.G[k]
        terms = []
        for i in range(ord_):
            for j in range(i, ord_):
                c = G[i, j] if i == j else G[i, j] + G[j, i]
                if abs(c) > 1e-14 * max(1.0, abs(G).max()):
                    terms.append((i, j, float(c)))
        tv_terms.append(tuple(terms))
    edge_terms = []
    for k in range(K):
        per_edge = []
        for e in range(2):
            row = [(i, float(mats.E[k, e, i])) for i in range(ord_)
                   if abs(mats.E[k, e, i]) > 1e-14]
            per_edge.append(tuple(row))
        edge_terms.append(tuple(per_edge))
    return tuple(tv_terms), tuple(edge_terms), tuple(float(v) for v in mats.idl)


@lru_cache(maxsize=None)
def _opt_terms(ord_: int):
    """Reduced-operation formulation of the same limiter (used by the Pallas
    kernels; agrees with the reference algebra to floating-point rounding):

    * TV_k as a sum of squared linear forms: G_k is PSD (it is M^T Q M with
      Q a Gram matrix of derivative integrals), so an eigendecomposition
      gives TV_k = sum_m (g_km . s)^2 with rank(G_k) = taps-1 forms --
      cheaper than the dense quadratic form for 3-tap sub-stencils.
    * The two convexify normalizations fold into one: with T = sum TV,
      w_k = idl_k / ((TV_k/T)^2 + eps) = idl_k T^2 / (TV_k^2 + eps T^2),
      and the common T^2 cancels in the final normalization, so
      w'_k = idl_k / (TV_k^2 + eps T^2 + tiny) needs no first normalize.
    * For ord 3/5 the high-order edge form is EXACTLY the classic optimal
      convex combination of the low-order edge forms (gamma = (0.3,0.6,0.1)
      etc.), so the 5-tap edge form is never evaluated: the high-order
      weight is folded into the low-order blend coefficients.

    Returns (tv_factors, edge_terms, gamma, idl):
      tv_factors: per k, tuple of linear forms, each a tuple of (i, coef)
      edge_terms: per k (low only if gamma is not None), per edge,
                  tuple of (i, coef)
      gamma: (2, K-1) ndarray or None (ord 7/9: no exact decomposition)
      idl: convexified ideal weights
    """
    from .weno import weno_matrices

    mats = weno_matrices(ord_)
    K = mats.G.shape[0]
    tv_factors = []
    for k in range(K):
        G = mats.G[k]
        w, V = np.linalg.eigh(G)
        forms = []
        for m in range(len(w)):
            if w[m] > 1e-12 * w.max():
                g = np.sqrt(w[m]) * V[:, m]
                forms.append(tuple((i, float(g[i])) for i in range(ord_)
                                   if abs(g[i]) > 1e-14))
        tv_factors.append(tuple(forms))

    gamma = None
    if ord_ in (3, 5):
        gam = np.empty((2, K - 1))
        for e in range(2):
            A = np.stack([mats.E[k, e] for k in range(K - 1)], axis=1)
            g, _, _, _ = np.linalg.lstsq(A, mats.E[K - 1, e], rcond=None)
            assert np.abs(A @ g - mats.E[K - 1, e]).max() < 1e-12
            gam[e] = g
        gamma = gam
        ks = range(K - 1)
    else:
        ks = range(K)
    edge_terms = []
    for k in ks:
        per_edge = []
        for e in range(2):
            row = [(i, float(mats.E[k, e, i])) for i in range(ord_)
                   if abs(mats.E[k, e, i]) > 1e-14]
            per_edge.append(tuple(row))
        edge_terms.append(tuple(per_edge))
    return (tuple(tv_factors), tuple(edge_terms), gamma,
            tuple(float(v) for v in mats.idl))


@lru_cache(maxsize=None)
def _high_symforms(ord_: int):
    """Even/odd eigenforms of the high-order TV quadratic form.

    G_high is persymmetric (the TV integral is symmetric about the cell
    center), so its eigenvectors split into even/odd-symmetric families:
    TV_high = sum_e (ev_e . P)^2 + sum_o (od_o . M)^2 evaluated on the
    pair sums P_i = s_i + s_{n-1-i} (plus the center sample) and pair
    diffs M_i = s_i - s_{n-1-i} -- about half the multiply-adds of the
    dense per-eigenvector forms.

    Returns (even, odd): even entries are (pair coefs..., center coef),
    odd entries are (pair coefs...).
    """
    from .weno import weno_matrices

    G = np.asarray(weno_matrices(ord_).G[-1], float)
    n = G.shape[0]
    J = np.eye(n)[::-1]
    assert np.abs(J @ G @ J - G).max() <= 1e-12 * np.abs(G).max()
    h = n // 2
    # Diagonalize within the even/odd symmetry-adapted subspaces directly:
    # JGJ = G means G block-diagonalizes exactly in these orthonormal
    # bases, so every eigenform is purely even or purely odd by
    # construction -- exact for any persymmetric G including (near-)
    # degenerate spectra (no tolerance-based classification).
    Be = np.zeros((n, h + n % 2))
    Bo = np.zeros((n, h))
    for i in range(h):
        Be[i, i] = Be[n - 1 - i, i] = 1.0 / np.sqrt(2.0)
        Bo[i, i] = 1.0 / np.sqrt(2.0)
        Bo[n - 1 - i, i] = -1.0 / np.sqrt(2.0)
    if n % 2:
        Be[h, h] = 1.0
    blocks = []
    for B in (Be, Bo):
        Gs = B.T @ G @ B
        w, U = np.linalg.eigh((Gs + Gs.T) / 2.0)
        blocks.append((B, w, U))
    wmax = max(b[1].max(initial=0.0) for b in blocks)
    even, odd = [], []
    for out, (B, w, U) in zip((even, odd), blocks):
        for i in range(len(w)):
            if w[i] <= 1e-12 * wmax:
                continue
            out.append(B @ U[:, i] * np.sqrt(w[i]))
    ev = tuple(tuple([float(v[i]) for i in range(h)] + [float(v[h])])
               for v in even)
    od = tuple(tuple(float(v[i]) for i in range(h)) for v in odd)
    return ev, od


def reconstruct_edges_shifted(padded, axis: int, n_out: int,
                              mats: WenoMatrices, cutoff: float = 0.0):
    """WENO-limited left/right edge values from a padded array.

    Args:
      padded: input with >= (ord-1)/2 halo cells on each side of ``axis``
        (so shifted window ``i`` starting at offset ``i`` is valid).
      axis: stencil axis (negative indexing ok).
      n_out: number of output cells along ``axis``.
      mats: WenoMatrices for this order.
      cutoff: optional low-order weight cutoff (reference default 0).

    Returns:
      (left, right): two arrays shaped like the input with ``axis`` length
      ``n_out`` -- the limited values at each cell's minus/plus face.
    """
    ord_ = mats.ord
    tv_terms, edge_terms, idl = _sparse_terms(ord_, 0)
    dt = padded.dtype

    def sh(i):
        idx = [slice(None)] * padded.ndim
        idx[axis] = slice(i, i + n_out)
        return padded[tuple(idx)]

    shifts = [sh(i) for i in range(ord_)]

    # TV_k as sparse quadratic forms over the shifts.
    tvs = []
    for terms in tv_terms:
        acc = None
        for i, j, c in terms:
            t = jnp.asarray(c, dt) * shifts[i] * shifts[j]
            acc = t if acc is None else acc + t
        tvs.append(acc)

    eps = jnp.asarray(1e-20, dt)

    def convexify(vals):
        tot = vals[0]
        for v in vals[1:]:
            tot = tot + v
        inv = jnp.where(tot > eps, 1.0 / jnp.where(tot > eps, tot, 1.0), 1.0)
        return [v * inv for v in vals]

    tvs = convexify(tvs)
    ws = [jnp.asarray(idl_k, dt) / (tv * tv + eps)
          for idl_k, tv in zip(idl, tvs)]
    ws = convexify(ws)
    if cutoff > 0.0:
        co = jnp.asarray(cutoff, dt)
        ws = [jnp.where(w > co, w, 0.0) for w in ws[:-1]] + [ws[-1]]
        ws = convexify(ws)

    edges = []
    for e in range(2):
        acc = None
        for k, w in enumerate(ws):
            ek = None
            for i, c in edge_terms[k][e]:
                t = jnp.asarray(c, dt) * shifts[i]
                ek = t if ek is None else ek + t
            t = w * ek
            acc = t if acc is None else acc + t
        edges.append(acc)
    return edges[0], edges[1]
