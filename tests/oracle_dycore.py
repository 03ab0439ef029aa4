"""Independent NumPy oracle of the reference dycore step.

A straight-line, numpy-only re-implementation of the reference
``Dynamics_Euler_Stratified_WenoFV`` step written directly from the
reference's behavior (model/modules/dynamics_euler_stratified_wenofv.h) as
an EXTERNAL golden anchor for the production JAX dycore:

  * WENO matrices are re-derived here by floating-point linear solves and
    numpy polynomial calculus -- a different derivation path from the
    library's exact-rational one (miniweatherml_tpu/ops/weno.py), so a bug
    in either derivation breaks the cross-check.
  * The weight pipeline follows the reference's WenoLimiter<5> operation
    order exactly (WenoLimiter.h:68-93: TV -> convexify -> idl/(w^2+1e-20)
    -> convexify -> cutoff -> convexify) -- not the library's fused
    normalization.
  * Halo fill, reconstruction, edge BCs, Riemann, FCT, tendency, and
    SSPRK3 are written from the reference loops (dynamics...h:100-552,
    :749-1085), not from the library's vectorized formulation.
  * Conversions coupler<->dynamics follow dynamics...h:1891-2015.

Only used by tests (tests/test_oracle.py) -- this module is oracle code,
deliberately simple and slow.
"""

from __future__ import annotations

import numpy as np

ORD = 5      # default order; WenoOracle(ord_=...) covers 3/5/7/9
IDR, IDU, IDV, IDW, IDT = 0, 1, 2, 3, 4
BC_PERIODIC, BC_OPEN, BC_WALL = 0, 1, 2
CS = 350.0  # frozen acoustic speed (dynamics...h:402)


# ----------------------------------------------------------------------
# WENO machinery, re-derived with float linear algebra
# ----------------------------------------------------------------------
def _sten_to_coefs(offsets):
    """Map cell averages at integer ``offsets`` (cell width 1, centers at
    the offsets relative to the target cell) to polynomial coefficients
    a_s of p(x) = sum a_s x^s such that the cell averages of p match.

    Average of x^s over [c-1/2, c+1/2] = ((c+1/2)^{s+1}-(c-1/2)^{s+1})/(s+1).
    """
    n = len(offsets)
    A = np.empty((n, n))
    for r, c in enumerate(offsets):
        for s in range(n):
            A[r, s] = ((c + 0.5) ** (s + 1) - (c - 0.5) ** (s + 1)) / (s + 1)
    return np.linalg.inv(A)


def _tv_quadratic(n):
    """Q with TV(a) = a^T Q a = sum_{m>=1} int_{-1/2}^{1/2} (p^(m))^2 dx
    (the reference's generated TV() polynomials, WenoLimiter_recon.h:30-70),
    built with numpy polynomial calculus."""
    Q = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            acc = 0.0
            for m in range(1, n):
                pi = np.polynomial.Polynomial([0.0] * i + [1.0]).deriv(m)
                pj = np.polynomial.Polynomial([0.0] * j + [1.0]).deriv(m)
                prod = (pi * pj).integ()
                acc += prod(0.5) - prod(-0.5)
            Q[i, j] = acc
    return Q


def _convexify(ws):
    tot = sum(ws)
    if tot > 1e-20:
        return [w / tot for w in ws]
    return ws


class WenoOracle:
    """Reference WenoLimiter<ord> + coefs_to_gll (WenoLimiter.h:13-46
    for ord 3, :52-93 for ord 5, :96-141 for ord 7, :144-193 for ord 9;
    coefs_to_gll for the 2-point case = evaluation of the basis at
    x = -1/2, +1/2).

    Low sub-stencils per the reference templates: ord 3 uses two 2-point
    stencils (coefs2_shift1/2); ord 5/7/9 use three 3-point stencils
    centered on the middle cell (ord 7/9 do NOT widen the sub-stencils --
    WenoLimiter.h:113-116, :161-164).  idl defaults: (1,1,5e2) ord 3,
    (1,2,1,1e3) ord 5, (1,2,1,1e5) ord 7, (1,2,1,1e8) ord 9."""

    def __init__(self, cutoff=0.0, ord_=ORD):
        self.cutoff = cutoff
        self.ord = ord_
        h = (ord_ - 1) // 2
        if ord_ == 3:
            lows = [(-1, 0), (0, 1)]
            idl = [1.0, 1.0, 5.0e2]
        elif ord_ == 5:
            lows = [(-2, -1, 0), (-1, 0, 1), (0, 1, 2)]
            idl = [1.0, 2.0, 1.0, 1.0e3]
        elif ord_ in (7, 9):
            lows = [(-2, -1, 0), (-1, 0, 1), (0, 1, 2)]
            idl = [1.0, 2.0, 1.0, 1.0e5 if ord_ == 7 else 1.0e8]
        else:
            raise ValueError(f"unsupported order {ord_}")
        self.m = len(lows[0])             # low sub-stencil size
        # sub-stencil j covers stencil indices (h + off) for off in lows[j]
        self.low_idx = [tuple(h + off for off in offs) for offs in lows]
        self.lowM = [_sten_to_coefs(offs) for offs in lows]
        self.M_H = _sten_to_coefs(tuple(range(-h, h + 1)))
        self.Qlow = _tv_quadratic(self.m)
        self.QH = _tv_quadratic(ord_)
        idl = np.array(idl)
        self.idl = idl / idl.sum()
        # coefs -> values at x = -1/2 (left edge), +1/2 (right edge)
        self.P = np.array([[(-0.5) ** s for s in range(ord_)],
                           [(+0.5) ** s for s in range(ord_)]])

    def limited_coefs(self, sten):
        """``sten``: (..., ord) cell averages -> (..., ord) limited coefs,
        reference operation order (WenoLimiter.h compute_limited_coefs)."""
        cls = [sten[..., list(idx)] @ M.T
               for idx, M in zip(self.low_idx, self.lowM)]
        cH = sten[..., :] @ self.M_H.T
        ws = [np.einsum("...i,ij,...j->...", c, self.Qlow, c) for c in cls]
        ws.append(np.einsum("...i,ij,...j->...", cH, self.QH, cH))

        def convexify(ws):
            tot = sum(ws)
            sel = tot > 1e-20
            return [np.where(sel, w / np.where(sel, tot, 1.0), w)
                    for w in ws]

        ws = convexify(ws)
        ws = [i / (w * w + 1e-20) for i, w in zip(self.idl, ws)]
        ws = convexify(ws)
        if self.cutoff > 0:
            ws = ([np.where(w <= self.cutoff, 0.0, w) for w in ws[:-1]]
                  + ws[-1:])
            ws = convexify(ws)
        out = cH * ws[-1][..., None]
        for c, w in zip(cls, ws[:-1]):
            out[..., :self.m] += c * w[..., None]
        return out

    def gll(self, sten):
        """(..., ord) stencil -> (gll_left, gll_right) per cell
        (reconstruct_gll_values, dynamics...h:556-571)."""
        coefs = self.limited_coefs(sten)
        vals = coefs @ self.P.T
        return vals[..., 0], vals[..., 1]


# ----------------------------------------------------------------------
# step pieces (reference dynamics...h)
# ----------------------------------------------------------------------
def _fill_halos(arr, axis, bc, hp, zero_var=None):
    """Reference halo_exchange BC fill on a global array (:749-827):
    periodic wrap, or edge replication with the wall-normal var zeroed."""
    n = arr.shape[axis]
    lo = [slice(None)] * arr.ndim
    hi = [slice(None)] * arr.ndim
    if bc == BC_PERIODIC:
        lo[axis] = slice(n - hp, n)
        hi[axis] = slice(0, hp)
        lo_sl, hi_sl = arr[tuple(lo)], arr[tuple(hi)]
    else:
        lo[axis] = slice(0, 1)
        hi[axis] = slice(n - 1, n)
        reps = [1] * arr.ndim
        reps[axis] = hp
        lo_sl = np.tile(arr[tuple(lo)], reps)
        hi_sl = np.tile(arr[tuple(hi)], reps)
        if zero_var is not None and bc == BC_WALL:
            lo_sl = lo_sl.copy()
            hi_sl = hi_sl.copy()
            lo_sl[zero_var] = 0.0
            hi_sl[zero_var] = 0.0
    return np.concatenate([lo_sl, arr, hi_sl], axis=axis)


def _stencils(padded, axis, n, ord_=ORD):
    """(..., n+2*hs on axis) -> (..., n, ord) windows."""
    sl = []
    for s in range(ord_):
        idx = [slice(None)] * padded.ndim
        idx[axis] = slice(s, s + n)
        sl.append(padded[tuple(idx)])
    return np.stack(sl, axis=-1)


def oracle_tendencies(weno, s, tr, hy, grid, consts, dt):
    """One reference compute_tendencies (dynamics...h:204-552).

    ``s``: (5, nens, nz, ny, nx) dyn state; ``tr``: (ntr, ...).
    ``hy`` = (hy_dens_cells, hy_dens_theta_cells, hy_dens_edges,
    hy_dens_theta_edges) with shapes (nens, nz) / (nens, nz+1).
    Returns (state_tend, tracers_tend).
    """
    hyc, hyt, hye, hyte = hy
    nens, nz, ny, nx = s.shape[1:]
    ntr = tr.shape[0]
    sim2d = ny == 1
    dx, dy, dz = grid["dx"], grid["dy"], grid["dz"]
    C0, gamma = consts["C0"], consts["gamma"]
    hyc_c = hyc[:, :, None, None]
    hyt_c = hyt[:, :, None, None]

    # de-densitize (:248-255)
    full_r = s[IDR] + hyc_c
    prim = np.concatenate([s[IDR:IDU], s[IDU:IDT] / full_r,
                           s[IDT:IDT + 1], tr / full_r])

    hp = (weno.ord - 1) // 2 + 1   # one ghost cell's recon is also needed

    def limits(axis, n, bc, normal_id, hy_r, hy_t):
        """Reconstruct both edge limits for one direction; returns
        (L, R) with the face axis length n+1 -- state limits re-densitized
        and hydrostatics re-added (:271-388), then edge BCs (:1005-1085)."""
        padded = _fill_halos(prim, axis, bc, hp,
                             zero_var=normal_id if bc == BC_WALL else None)
        sten = _stencils(padded, axis, n + 2, weno.ord)
        gl, gr = weno.gll(sten)   # per cell: left/right edge values
        # face f: L from cell f-1's right edge, R from cell f's left edge
        idxL = [slice(None)] * gl.ndim
        idxR = [slice(None)] * gl.ndim
        idxL[axis] = slice(0, n + 1)
        idxR[axis] = slice(1, n + 2)
        L = gr[tuple(idxL)].copy()
        R = gl[tuple(idxR)].copy()
        # re-add backgrounds / densities at the faces
        rL = L[IDR] + hy_r
        rR = R[IDR] + hy_r
        L[IDR] = rL
        R[IDR] = rR
        for v in (IDU, IDV, IDW):
            L[v] *= rL
            R[v] *= rR
        L[IDT] += hy_t
        R[IDT] += hy_t
        L[5:] *= rL[None]
        R[5:] *= rR[None]
        # physical edge BCs on the limits (:1005-1085)
        if bc != BC_PERIODIC:
            lo = [slice(None)] * L.ndim
            hi = [slice(None)] * L.ndim
            lo[axis] = 0
            hi[axis] = n
            L[tuple(lo)] = R[tuple(lo)]
            R[tuple(hi)] = L[tuple(hi)]
            if bc == BC_WALL:
                L[(normal_id,) + tuple(lo)[1:]] = 0.0
                R[(normal_id,) + tuple(lo)[1:]] = 0.0
                L[(normal_id,) + tuple(hi)[1:]] = 0.0
                R[(normal_id,) + tuple(hi)[1:]] = 0.0
        return L, R

    def riemann(L, R, normal_id):
        """Acoustic + advective upwind fluxes (:395-485)."""
        ruL, ruR = L[normal_id], R[normal_id]
        rtL, rtR = L[IDT], R[IDT]
        pL = C0 * rtL ** gamma
        pR = C0 * rtR ** gamma
        w1 = 0.5 * (pR - CS * ruR)
        w2 = 0.5 * (pL + CS * ruL)
        p_upw = w1 + w2
        ru_upw = (w2 - w1) / CS
        useL = (ruL + ruR) > 0
        q = np.where(useL[None], L, R)
        r_upw = q[IDR]
        sf = np.empty_like(L[:5])
        sf[IDR] = ru_upw
        for v in (IDU, IDV, IDW, IDT):
            sf[v] = ru_upw * q[v] / r_upw
        sf[normal_id] += p_upw
        tf = ru_upw * q[5:] / r_upw
        return sf, tf

    hye_f = hye[:, :, None, None]      # (nens, nz+1, 1, 1)
    hyte_f = hyte[:, :, None, None]
    Lx, Rx = limits(-1, nx, consts["bc_x"], IDU, hyc_c, hyt_c)
    SFx, TFx = riemann(Lx, Rx, IDU)
    Lz, Rz = limits(-3, nz, consts["bc_z"], IDW, hye_f, hyte_f)
    SFz, TFz = riemann(Lz, Rz, IDW)
    if sim2d:
        SFy = np.zeros((5, nens, nz, ny + 1, nx))
        TFy = np.zeros((ntr, nens, nz, ny + 1, nx))
    else:
        Ly, Ry = limits(-2, ny, consts["bc_y"], IDV, hyc_c, hyt_c)
        SFy, TFy = riemann(Ly, Ry, IDV)

    # FCT (:498-516): per-cell scale, applied to outgoing faces
    positive = consts["positive"]
    for t in range(ntr):
        if not positive[t]:
            continue
        avail = np.maximum(tr[t], 0.0) * dx * dy * dz
        fo = (np.maximum(TFx[t, :, :, :, 1:], 0.0)
              - np.minimum(TFx[t, :, :, :, :-1], 0.0)) / dx
        fo = fo + (np.maximum(TFz[t, :, 1:], 0.0)
                   - np.minimum(TFz[t, :, :-1], 0.0)) / dz
        fo = fo + (np.maximum(TFy[t, :, :, 1:], 0.0)
                   - np.minimum(TFy[t, :, :, :-1], 0.0)) / dy
        mass_out = fo * dt * dx * dy * dz
        need = mass_out > avail
        mult = np.where(need, avail / np.where(need, mass_out, 1.0), 1.0)

        def scale(F, axis):
            # face f scaled by cell f-1's mult where F>0, cell f's where F<0
            shp = list(mult.shape)
            shp[axis] = 1
            one = np.ones(shp)
            m_left = np.concatenate([one, mult], axis=axis)
            m_right = np.concatenate([mult, one], axis=axis)
            return F * np.where(F > 0, m_left, np.where(F < 0, m_right, 1.0))

        TFx[t] = scale(TFx[t], -1)
        TFz[t] = scale(TFz[t], -3)
        if not sim2d:
            TFy[t] = scale(TFy[t], -2)

    # tendencies = -flux divergence + sources (:519-551)
    st = (-(SFx[..., 1:] - SFx[..., :-1]) / dx
          - (SFz[:, :, 1:] - SFz[:, :, :-1]) / dz
          - (SFy[:, :, :, 1:] - SFy[:, :, :, :-1]) / dy)
    tt = (-(TFx[..., 1:] - TFx[..., :-1]) / dx
          - (TFz[:, :, 1:] - TFz[:, :, :-1]) / dz
          - (TFy[:, :, :, 1:] - TFy[:, :, :, :-1]) / dy)
    if consts.get("enable_gravity", True):
        st[IDW] -= consts["grav"] * full_r
    fcor = consts.get("fcor", 0.0)
    if fcor != 0.0:
        st[IDU] += fcor * s[IDV]
        st[IDV] -= fcor * s[IDU]
    if sim2d:
        st[IDV] = 0.0
    # immersed-boundary relaxation blending (dynamics...h:534-550):
    # tendencies blend toward -min(1, dt/tau) * state / dt with
    # tau = 1e3 dt, weighted by the immersed proportion per cell
    prop = consts.get("immersed_proportion", None)
    if prop is not None and consts.get("use_immersed_boundaries", False):
        fac = -min(1.0, dt / (1.0e3 * dt)) / dt
        st = prop[None] * (fac * s) + (1.0 - prop[None]) * st
    return st, tt


def oracle_step(weno, s, tr, hy, grid, consts, dt):
    """One SSPRK3 step with the reference coefficients and per-stage
    positive-tracer clamp (dynamics...h:117-174)."""
    positive = np.asarray(consts["positive"], bool)[:, None, None, None, None]

    def clamp(t):
        return np.where(positive, np.maximum(t, 0.0), t)

    st, tt = oracle_tendencies(weno, s, tr, hy, grid, consts, dt)
    s1 = s + dt * st
    t1 = clamp(tr + dt * tt)
    st, tt = oracle_tendencies(weno, s1, t1, hy, grid, consts, dt / 4.0)
    s2 = 0.75 * s + 0.25 * s1 + 0.25 * dt * st
    t2 = clamp(0.75 * tr + 0.25 * t1 + 0.25 * dt * tt)
    st, tt = oracle_tendencies(weno, s2, t2, hy, grid, consts, 2.0 * dt / 3.0)
    s3 = s / 3.0 + 2.0 / 3.0 * s2 + 2.0 / 3.0 * dt * st
    t3 = clamp(tr / 3.0 + 2.0 / 3.0 * t2 + 2.0 / 3.0 * dt * tt)
    return s3, t3


def oracle_coupler_to_dynamics(fields, tracer_names, adds_mass, idWV, hy,
                               consts):
    """Reference convert_coupler_to_dynamics (dynamics...h:1955-2015)."""
    hyc, hyt = hy[0][:, :, None, None], hy[1][:, :, None, None]
    rho_d = fields["density_dry"]
    u, v, w = fields["uvel"], fields["vvel"], fields["wvel"]
    temp = fields["temp"]
    trs = np.stack([fields[n] for n in tracer_names])
    rho_v = trs[idWV]
    press = rho_d * consts["R_d"] * temp + rho_v * consts["R_v"] * temp
    rho = rho_d + sum(trs[t] for t in range(len(tracer_names))
                      if adds_mass[t])
    theta = (press / consts["C0"]) ** (1.0 / consts["gamma"]) / rho
    s = np.stack([rho - hyc, rho * u, rho * v, rho * w, rho * theta - hyt])
    return s, trs


def oracle_dynamics_to_coupler(s, tr, tracer_names, adds_mass, idWV, hy,
                               consts):
    """Reference convert_dynamics_to_coupler (dynamics...h:1891-1951)."""
    hyc, hyt = hy[0][:, :, None, None], hy[1][:, :, None, None]
    rho = s[IDR] + hyc
    u, v, w = s[IDU] / rho, s[IDV] / rho, s[IDW] / rho
    theta = (s[IDT] + hyt) / rho
    press = consts["C0"] * (rho * theta) ** consts["gamma"]
    rho_d = rho - sum(tr[t] for t in range(len(tracer_names))
                      if adds_mass[t])
    temp = press / (rho_d * consts["R_d"] + tr[idWV] * consts["R_v"])
    out = {"density_dry": rho_d, "uvel": u, "vvel": v, "wvel": w,
           "temp": temp}
    for t, n in enumerate(tracer_names):
        out[n] = tr[t]
    return out
