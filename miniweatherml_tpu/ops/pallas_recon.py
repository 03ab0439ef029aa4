"""Pallas TPU megakernel: fused WENO reconstruction + Riemann per direction.

The XLA formulation of the direction-flux pipeline (dycore/euler.py
_direction_fluxes) is HBM-bound: the compiler materializes the WENO
smoothness indicators, weights, edge values, and face limits, giving
~190 GB of HBM traffic per dycore step (measured by cost analysis at
512x512x64).  This kernel keeps the entire pipeline for a tile of columns
resident in VMEM: one read of the padded primitive variables, all WENO +
upwind-Riemann arithmetic on-chip, one write of the face fluxes.

Design (per direction):
  * the stencil axis is kept WHOLE inside each block (no overlapping
    blocks needed -- the grid tiles only the perpendicular dims),
  * all ``nvar = 5 + ntracers`` variables ride in the block so the Riemann
    coupling (acoustic upwind of pressure/normal momentum + advective
    upwind of the rest, dynamics...h:395-485) happens in-register,
  * the hydrostatic background columns enter as small side inputs.

Matches Dycore._direction_fluxes bit-for-bit in exact arithmetic (tested
against the XLA path); used when ``Dycore(riemann_impl="pallas")``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .weno import WenoMatrices
from .weno_fused import _opt_terms, _sparse_terms

__all__ = ["direction_fluxes_pallas", "direction_fluxes_pallas_sub"]

IDR, IDU, IDV, IDW, IDT = 0, 1, 2, 3, 4
NUM_STATE = 5
_CS = 350.0  # frozen acoustic speed (dynamics...h:402)


def _roll(x, shift, axis, interpret):
    """Circular rotation toward higher indices (``jnp.roll`` convention).

    On TPU this is ``pltpu.roll`` -- verified bitwise-equal to the jnp
    convention on-chip (roll path vs concat path, BASELINE.md round-3
    A/B).  ``pltpu.roll`` has no interpret-mode evaluation rule, so
    interpret-mode runs (CPU tests) use ``jnp.roll`` directly; the two
    agree element-for-element, keeping the production roll path under
    automated parity coverage."""
    if interpret:
        return jnp.roll(x, shift, axis)
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, shift, axis)


def _weno_edges_block(x, n_out, ord_, tv_terms, edge_terms, idl, cutoff,
                      axis=None, fast_weights=False, shifts=None):
    """WENO edges on a block along ``axis`` (default: last).

    Same math as ops/weno_fused.reconstruct_edges_shifted, expressed on the
    in-VMEM block.  ``fast_weights`` computes the nonlinear weight
    normalizations with the VPU's approximate reciprocal (the weights are
    a smoothness heuristic; edge values shift by O(1e-5) relative).
    """
    dt = (x if shifts is None else shifts[0]).dtype

    if fast_weights and dt == jnp.float32:
        # the approximate reciprocal is an f32 VPU op; f64 runs fall back
        from jax.experimental import pallas as pl

        def recip(v):
            return pl.reciprocal(v, approx=True)
    else:
        def recip(v):
            return 1.0 / v

    if shifts is None:
        axis = x.ndim - 1 if axis is None else axis

        def sh(i):
            return jax.lax.slice_in_dim(x, i, i + n_out, axis=axis)

        shifts = [sh(i) for i in range(ord_)]

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
        inv = jnp.where(tot > eps, recip(jnp.where(tot > eps, tot, 1.0)), 1.0)
        return [v * inv for v in vals]

    tvs = convexify(tvs)
    ws = [jnp.asarray(ik, dt) * recip(tv * tv + eps)
          for ik, tv in zip(idl, tvs)]
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


def _weno_edges_block_opt(x, n_out, ord_, axis=None, fast_weights=False,
                          shifts=None):
    """Reduced-operation WENO edges (see weno_fused._opt_terms): factored
    squared-form TVs, single fused weight normalization, and (ord 3/5) the
    high-order candidate folded into the low-order edge blend via the exact
    optimal weights.  Weights agree with the reference algebra to rounding
    (~1e-7 relative in f32); edge values likewise.

    ``shifts``: optionally supply the ord_ shifted windows directly
    (e.g. circular lane rolls of an aligned block for periodic axes)
    instead of slicing ``x``."""
    dt = (x if shifts is None else shifts[0]).dtype
    tv_factors, edge_terms, gamma, idl = _opt_terms(ord_)

    if fast_weights and dt == jnp.float32:
        from jax.experimental import pallas as pl

        def recip(v):
            return pl.reciprocal(v, approx=True)
    else:
        def recip(v):
            return 1.0 / v

    if shifts is None:
        axis = x.ndim - 1 if axis is None else axis

        def sh(i):
            return jax.lax.slice_in_dim(x, i, i + n_out, axis=axis)

        shifts = [sh(i) for i in range(ord_)]

    def linform(terms):
        acc = None
        for i, c in terms:
            t = jnp.asarray(c, dt) * shifts[i]
            acc = t if acc is None else acc + t
        return acc

    def high_tv_sym():
        # persymmetric high-order TV on pair sums/diffs (weno_fused.
        # _high_symforms): halves the linear-form multiply-adds.
        from .weno_fused import _high_symforms

        ev_forms, od_forms = _high_symforms(ord_)
        h = ord_ // 2
        P = [shifts[i] + shifts[ord_ - 1 - i] for i in range(h)]
        M = [shifts[i] - shifts[ord_ - 1 - i] for i in range(h)]
        th = None
        for coefs in ev_forms:
            f = jnp.asarray(coefs[-1], dt) * shifts[h]
            for c, p in zip(coefs[:-1], P):
                f = f + jnp.asarray(c, dt) * p
            th = f * f if th is None else th + f * f
        for coefs in od_forms:
            f = None
            for c, m in zip(coefs, M):
                t = jnp.asarray(c, dt) * m
                f = t if f is None else f + t
            th = th + f * f
        return th

    if ord_ == 5:
        # Jiang-Shu factorization of the 3-tap sub-stencil TVs (exactly the
        # reference's G_k = 13/12 d d^T + 1/4 f f^T) built on shared first
        # differences: ~30% fewer limiter flops than the generic
        # eigenvector forms, identical values up to rounding.
        s = shifts
        c1312 = jnp.asarray(13.0 / 12.0, dt)
        c14 = jnp.asarray(0.25, dt)
        two = jnp.asarray(2.0, dt)
        e0 = s[0] - s[1]
        e1 = s[2] - s[1]
        e2 = s[2] - s[3]
        e3 = s[4] - s[3]
        d0 = e0 + e1             # s0 - 2 s1 + s2
        d1 = e1 + e2             # -(s1 - 2 s2 + s3); sign dies in square
        d2 = e2 + e3             # s2 - 2 s3 + s4
        m13 = e2 - e1            # s1 - s3
        f0 = d0 + two * e1       # s0 - 4 s1 + 3 s2
        f2 = d2 + two * e2       # 3 s2 - 4 s3 + s4
        tvs = [c1312 * (d0 * d0) + c14 * (f0 * f0),
               c1312 * (d1 * d1) + c14 * (m13 * m13),
               c1312 * (d2 * d2) + c14 * (f2 * f2),
               high_tv_sym()]
    else:
        tvs = []
        for forms in tv_factors[:-1]:
            acc = None
            for terms in forms:
                f = linform(terms)
                t = f * f
                acc = t if acc is None else acc + t
            tvs.append(acc)
        tvs.append(high_tv_sym())

    T = tvs[0]
    for tv in tvs[1:]:
        T = T + tv
    eps = jnp.asarray(1e-20, dt)
    tiny = jnp.asarray(1e-300 if dt == jnp.float64 else 1e-35, dt)
    e2 = eps * (T * T) + tiny
    ws = [jnp.asarray(ik, dt) * recip(tv * tv + e2)
          for ik, tv in zip(idl, tvs)]
    tot = ws[0]
    for w in ws[1:]:
        tot = tot + w
    inv = recip(tot)

    edges = []
    for e in range(2):
        acc = None
        for k, terms in enumerate(edge_terms):
            if gamma is not None:
                c = (ws[k] + jnp.asarray(gamma[e, k], dt) * ws[-1]) * inv
            else:
                c = ws[k] * inv
            t = c * linform(terms[e])
            acc = t if acc is None else acc + t
        edges.append(acc)
    return edges[0], edges[1]


def _weno_edges(x, n_out, ord_, tv_terms, edge_terms, idl, cutoff, axis=None,
                fast_weights=False, opt=True, shifts=None):
    """Dispatch: reduced-operation algebra when available (cutoff 0, the
    reference default), otherwise the reference-ordered algebra."""
    if opt and cutoff == 0.0:
        return _weno_edges_block_opt(x, n_out, ord_, axis=axis,
                                     fast_weights=fast_weights,
                                     shifts=shifts)
    return _weno_edges_block(x, n_out, ord_, tv_terms, edge_terms, idl,
                             cutoff, axis=axis, fast_weights=fast_weights,
                             shifts=shifts)



def _self_halo(xb, hs, self_bc, normal_id, axis):
    """Build the halo in-kernel from the block's OWN edges -- valid when the
    whole (unsharded) stencil axis rides in the block: periodic halos ARE
    the wrapped interior cells; wall/open halos are edge replication with
    the wall-normal variable zeroed (reference dynamics...h:749-827).  No
    strip inputs, no HBM strip traffic."""
    nd = xb.ndim
    ax = axis % nd
    n = xb.shape[ax]
    if self_bc == 0:                      # periodic: wrap
        lo = jax.lax.slice_in_dim(xb, n - hs, n, axis=ax)
        hi = jax.lax.slice_in_dim(xb, 0, hs, axis=ax)
    else:                                 # wall/open: replicate edges
        e0 = jax.lax.slice_in_dim(xb, 0, 1, axis=ax)
        e1 = jax.lax.slice_in_dim(xb, n - 1, n, axis=ax)
        shape = list(xb.shape)
        shape[ax] = hs
        lo = jnp.broadcast_to(e0, shape)
        hi = jnp.broadcast_to(e1, shape)
        if self_bc == 1:                  # wall: zero the normal velocity
            vid = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), 0)
            lo = jnp.where(vid == normal_id, 0.0, lo)
            hi = jnp.where(vid == normal_id, 0.0, hi)
    return jnp.concatenate([lo, xb, hi], axis=ax)


def _kernel(bc_ref, p_ref, lo_ref, hi_ref, hyr_ref, hyt_ref, *rest, n, ord_,
            tv_terms, edge_terms, idl, cutoff, normal_id, ntracers, C0,
            gamma, fast_weights=False, opt=True, local_edges=False,
            div_scale=None, self_bc=None, use_roll=False, aligned_tf=False,
            has_acc=False, interpret=False):
    """Lane-stencil variant: unpadded prim (nvar, Bt, n) with the stencil on
    the last (lane) axis -- the natural layout for the x direction -- plus
    halo strips assembled in VMEM (the full-array HBM pad copy never
    exists).  ``bc_ref`` is an SMEM (2,) int32: [bc_lo, bc_hi] boundary
    modes (0 none, 1 wall, 2 open) applied at global faces 0 / n in-kernel.

    ``local_edges`` (unsharded axes): reconstruct exactly ``n`` cells --
    lane-aligned vector widths -- and take the two exterior face limits by
    wrapping in-block.  Valid because for periodic single-device axes the
    halo cells ARE the wrapped interior cells (bitwise-identical windows),
    and for wall/open the exterior limits are overwritten by the BC rules
    (reference dynamics...h:1005-1081) regardless.  Strips are hs wide.
    Sharded/chunked axes use local_edges=False with hp-wide strips (the
    halo cells there belong to a neighbor and must be reconstructed).

    ``has_acc``: the first entry of ``rest`` is a running state-tendency
    accumulator (same block as the state output, HBM-aliased to it via
    input_output_aliases); the kernel ADDS its divergence contribution,
    so the per-direction state tendencies never exist as separate HBM
    buffers (the single-chip HBM-fit lever for the 1024^2-class grids,
    and the fused form of the s_tend = SFx+SFz+SFy glue adds)."""
    if has_acc:
        acc_ref, sf_ref, tf_ref, *more = rest
    else:
        acc_ref = None
        sf_ref, tf_ref, *more = rest
    fo_ref = more[0] if more else None
    hs_ = (ord_ - 1) // 2
    if use_roll and self_bc == 0 and div_scale is not None:
        # Periodic whole-axis fast path: every operation stays on the
        # ALIGNED n-wide block -- the shifted stencil windows are circular
        # lane rotations of p itself (periodic wrap == roll), the face
        # pairing is one more roll, and the state divergence closes the
        # ring with a final roll.  Avoids the (n + 2 hs)-wide concat
        # buffer whose every window is vreg-misaligned (the lane kernel's
        # ~57%-of-VPU-peak tax, BASELINE.md roofline).
        p = p_ref[...]
        ax_l = p.ndim - 1
        # pltpu.roll requires non-negative shifts; (hs - i) mod n is the
        # same circular rotation
        shifts = [p if i == hs_ else _roll(p, (hs_ - i) % n, ax_l, interpret)
                  for i in range(ord_)]
        gll_l, gll_r = _weno_edges(None, n, ord_, tv_terms, edge_terms,
                                   idl, cutoff, fast_weights=fast_weights,
                                   opt=opt, shifts=shifts)
        # face f (0..n-1): L from cell f-1's right edge (wraps), R from
        # cell f's left edge; face n duplicates face 0 (same stencil).
        L = _roll(gll_r, 1, gll_r.ndim - 1, interpret)
        R = gll_l
        _riemann_block(L, R,
                       jax.lax.slice_in_dim(hyr_ref[...], 0, n, axis=-1),
                       jax.lax.slice_in_dim(hyt_ref[...], 0, n, axis=-1),
                       sf_ref, tf_ref, normal_id, ntracers, C0, gamma,
                       div_scale=div_scale, face_axis=-1, fo_ref=fo_ref,
                       periodic_roll=True, aligned_tf=aligned_tf,
                       acc_ref=acc_ref, interpret=interpret)
        return
    if self_bc is not None:
        x = _self_halo(p_ref[...], hs_, self_bc, normal_id, -1)
    else:
        x = jnp.concatenate([lo_ref[...], p_ref[...], hi_ref[...]], axis=-1)
    nd = x.ndim
    if local_edges:
        gll_l, gll_r = _weno_edges(x, n, ord_, tv_terms, edge_terms,
                                   idl, cutoff, fast_weights=fast_weights,
                                   opt=opt)
        L = jnp.concatenate(
            [jax.lax.slice_in_dim(gll_r, n - 1, n, axis=nd - 1), gll_r],
            axis=-1)
        R = jnp.concatenate(
            [gll_l, jax.lax.slice_in_dim(gll_l, 0, 1, axis=nd - 1)],
            axis=-1)
    else:
        gll_l, gll_r = _weno_edges(x, n + 2, ord_, tv_terms, edge_terms,
                                   idl, cutoff, fast_weights=fast_weights,
                                   opt=opt)
        L = jax.lax.slice_in_dim(gll_r, 0, n + 1, axis=nd - 1)
        R = jax.lax.slice_in_dim(gll_l, 1, n + 2, axis=nd - 1)
    L, R = _apply_bc_limits(L, R, bc_ref[0], bc_ref[1], n, normal_id, -1)
    _riemann_block(L, R, hyr_ref[...], hyt_ref[...], sf_ref, tf_ref,
                   normal_id, ntracers, C0, gamma, div_scale=div_scale,
                   face_axis=-1, fo_ref=fo_ref, acc_ref=acc_ref)



def _compiler_params(allow_input_fusion):
    """Shared CompilerParams: input fusion (the measured +3.3 Mcellups
    round-2 lever) plus an opt-in bounds-check bypass for A/B runs
    (MWML_PALLAS_NOBOUNDS=1; all block indexing here is static)."""
    import os

    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(
        allow_input_fusion=allow_input_fusion,
        disable_bounds_checks=os.environ.get("MWML_PALLAS_NOBOUNDS",
                                             "0") == "1")

def direction_fluxes_pallas(prim, lo, hi, hy_r_faces, hy_t_faces, n: int,
                            mats: WenoMatrices, cutoff: float,
                            normal_id: int, C0: float, gamma: float,
                            block_rows: int = 16, fast_weights: bool = False,
                            opt: bool = True, bc=(0, 0),
                            div_scale: float | None = None,
                            self_bc: int | None = None,
                            emit_fo: bool = False,
                            aligned_tf: bool = False,
                            acc=None):
    """Fused recon+Riemann over the LAST axis.

    Args:
      prim: (nvar, B, n) de-densitized prims WITHOUT halos, the stencil
        axis last (callers transpose y/z directions into this layout).
      lo / hi: (nvar, B, hp) halo strips (hp = hs + 1) -- wrap slices,
        BC edge slabs, or ring-exchange strips; the kernel concatenates
        them in VMEM so no padded HBM copy is ever built.
      hy_r_faces / hy_t_faces: (B, n+1) hydrostatic background (density /
        rho*theta) at the faces of each row.
      n: number of interior cells along the direction.
      normal_id: index of the normal-momentum variable (IDU/IDV/IDW).

    ``acc`` (requires div_scale): a (5, B, n) running state-tendency
    accumulator; the kernel adds its divergence contribution and the
    accumulator's HBM buffer is donated to the state output
    (input_output_aliases), so chaining directions x->z->y keeps ONE
    state-tendency buffer live instead of three plus XLA add temps.

    Returns:
      (state_flux (5, B, n+1), tracer_flux (ntracers, B, n+1)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nvar, B, nn = prim.shape
    ntracers = nvar - NUM_STATE
    ord_ = mats.ord
    hs = (ord_ - 1) // 2
    if self_bc is not None:
        # whole-axis unsharded: the kernel builds its own halos from the
        # block's edges (static BC mode); no strip inputs at all.
        assert lo is None and hi is None
        local_edges = True
        hp = 0
    else:
        local_edges = lo.shape[-1] == hs      # hs-wide strips: in-block edges
        hp = hs if local_edges else hs + 1
        assert lo.shape[-1] == hp and hi.shape[-1] == hp, (lo.shape, ord_)
    assert nn == n, (prim.shape, n)
    tv_terms, edge_terms, idl = _sparse_terms(ord_, 0)

    Bt = min(block_rows, B)
    # Scoped-VMEM fit guard: the 16-row default was tuned for the 8-var
    # Kessler stack.  The kernel's scoped VMEM (input + output blocks +
    # Mosaic temp stack) grows with nvar * n * Bt; the measured envelope
    # is 8 vars x 1024 lanes x 16 rows (fits) while 14 vars x 1024 x 16
    # (the P3 chain at the 1024^2-class grid) exceeds the 16M scoped
    # limit by 0.5%.  Halve rows until back inside the envelope.
    while Bt > 1 and nvar * n * Bt > 140_000:
        Bt = (Bt + 1) // 2
    grid = (math.ceil(B / Bt),)
    n_s_out = n if div_scale is not None else n + 1

    # Aligned-roll fast path for periodic whole-axis blocks; MWML_X_ROLL=0
    # disables.  Interpret-mode runs (CPU tests) take the same branch with
    # the jnp.roll shim (_roll), so the production TPU path is what the
    # parity tests exercise.
    import os
    interpret = jax.devices()[0].platform != "tpu"
    use_roll = (self_bc == 0 and div_scale is not None
                and os.environ.get("MWML_X_ROLL", "1") == "1")
    # n-wide aligned tracer-flux output (see _riemann_block): only valid
    # on the periodic roll path.  Callers detect which form came back by
    # the returned last-dim (n vs n+1).
    aligned_tf = aligned_tf and use_roll and not emit_fo
    n_t_out = n if aligned_tf else n + 1
    has_acc = acc is not None
    if has_acc:
        assert div_scale is not None and acc.shape == (NUM_STATE, B, n)
    kernel = functools.partial(
        _kernel, n=n, ord_=ord_, tv_terms=tv_terms, edge_terms=edge_terms,
        idl=idl, cutoff=cutoff, normal_id=normal_id, ntracers=ntracers,
        C0=C0, gamma=gamma, fast_weights=fast_weights, opt=opt,
        local_edges=local_edges, div_scale=div_scale, self_bc=self_bc,
        use_roll=use_roll, aligned_tf=aligned_tf, has_acc=has_acc,
        interpret=interpret)
    if self_bc is not None:
        base = kernel

        def kernel(bc_r, p_r, hyr_r, hyt_r, *out_refs):
            return base(bc_r, p_r, None, None, hyr_r, hyt_r, *out_refs)

    bc_arr = jnp.stack([jnp.asarray(bc[0], jnp.int32),
                        jnp.asarray(bc[1], jnp.int32)])
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((nvar, Bt, n), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [bc_arr, prim]
    if self_bc is None:
        in_specs += [
            pl.BlockSpec((nvar, Bt, hp), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nvar, Bt, hp), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [lo, hi]
    in_specs += [
        pl.BlockSpec((Bt, n + 1), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Bt, n + 1), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands += [hy_r_faces, hy_t_faces]
    aliases = {}
    if has_acc:
        in_specs.append(pl.BlockSpec((NUM_STATE, Bt, n),
                                     lambda b: (0, b, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(acc)
        aliases[len(operands) - 1] = 0  # donate acc's HBM to the state out
    out_specs = [
        pl.BlockSpec((NUM_STATE, Bt, n_s_out), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((max(ntracers, 1), Bt, n_t_out), lambda b: (0, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((NUM_STATE, B, n_s_out), prim.dtype),
        jax.ShapeDtypeStruct((max(ntracers, 1), B, n_t_out), prim.dtype),
    ]
    if emit_fo:
        assert div_scale is not None and ntracers
        out_specs.append(pl.BlockSpec((ntracers, Bt, n), lambda b: (0, b, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((ntracers, B, n), prim.dtype))
    # let XLA fuse input producers (the de-densitize pass, broadcasts)
    # into the kernel's input reads instead of materializing them; the
    # donated accumulator must NOT be fused (its buffer aliases the out).
    fuse = [False] + [True] * (len(in_specs) - 1)
    if has_acc:
        fuse[-1] = False
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        compiler_params=_compiler_params(fuse),
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        # Pallas has no native CPU lowering; tests run interpreted.
        interpret=interpret,
    )(*operands)
    if emit_fo:
        sf, tf, fo = out
        return sf, tf[:ntracers], fo
    sf, tf = out
    return sf, tf[:ntracers]


def _kernel_sub(bc_ref, p_ref, lo_ref, hi_ref, hyr_ref, hyt_ref, *rest, n,
                ord_, tv_terms, edge_terms, idl, cutoff, normal_id, ntracers,
                C0, gamma, fast_weights=False, opt=True, nchunk=1,
                local_edges=False, div_scale=None, self_bc=None,
                has_acc=False, has_rk=False, has_b1=False, grav_f=0.0,
                fcor_f=0.0):
    """Sublane-stencil variant: unpadded block (nvar, R, n, L) with the
    stencil on axis -2 (TPU sublanes for the minor pair) -- the natural
    layout for the y and z directions, avoiding any transpose -- plus
    hp-wide halo strips (nvar, R, hp, L) assembled in VMEM.  hy refs are
    (R, F, 1) blocks with F in {1, n+1} broadcasting over faces/lanes.
    ``bc_ref`` as in _kernel.

    ``nchunk > 1``: the R axis interleaves ``nchunk`` stencil chunks per
    physical row (rows-major, chunks minor), each with its own neighbor
    strips; the physical boundary faces exist only in the first/last
    chunk, so the BC modes are gated on the chunk index of this block
    (requires row blocks of 1).  ``has_acc`` as in _kernel.

    ``has_rk``: the final-direction SSPRK3 stage update runs in-kernel
    (coef SMEM (3,) = [c0, c1, c*dt] plus base-state blocks b0 [, b1]):
    the state output becomes c0*b0 [+ c1*b1] + cdt*(acc + div + src)
    with gravity/Coriolis sources (grav_f / fcor_f statics) computed from
    the prim block -- so the stage's XLA-side state-sized add temps and
    the tendency's HBM round-trip disappear (the 1024^2x100 HBM lever).
    Requires has_acc + div_scale (the y kernel closes the x->z->y chain).
    """
    from jax.experimental import pallas as pl

    if has_acc:
        acc_ref, *rest = rest
    else:
        acc_ref = None
    rk = None
    if has_rk:
        coef_ref, b0_ref, *rest = rest
        b1_ref = None
        if has_b1:
            b1_ref, *rest = rest
        # gravity + Coriolis sources (dynamics...h:524-527), cell-local
        # from the prim block: rho = rho' + hy_dens (the y/x hy blocks are
        # cell profiles, F == 1)
        src = None
        if grav_f != 0.0 or fcor_f != 0.0:
            p = p_ref[...]
            rho = p[IDR] + hyr_ref[...]
            zero = jnp.zeros_like(rho)
            su = sv = zero
            sw = -grav_f * rho if grav_f != 0.0 else zero
            if fcor_f != 0.0:
                su = fcor_f * (rho * p[IDV])
                sv = -fcor_f * (rho * p[IDU])
            src = jnp.stack([zero, su, sv, sw, zero])
        rk = (coef_ref, b0_ref, b1_ref, src)
    sf_ref, tf_ref, *more = rest
    fo_ref = more[0] if more else None
    hs_ = (ord_ - 1) // 2
    if self_bc is not None:
        x = _self_halo(p_ref[...], hs_, self_bc, normal_id, -2)
    else:
        x = jnp.concatenate([lo_ref[...], p_ref[...], hi_ref[...]], axis=-2)
    nd = x.ndim
    if local_edges:
        gll_l, gll_r = _weno_edges(x, n, ord_, tv_terms, edge_terms,
                                   idl, cutoff, axis=nd - 2,
                                   fast_weights=fast_weights, opt=opt)
        L = jnp.concatenate(
            [jax.lax.slice_in_dim(gll_r, n - 1, n, axis=nd - 2), gll_r],
            axis=nd - 2)
        R = jnp.concatenate(
            [gll_l, jax.lax.slice_in_dim(gll_l, 0, 1, axis=nd - 2)],
            axis=nd - 2)
    else:
        gll_l, gll_r = _weno_edges(x, n + 2, ord_, tv_terms, edge_terms,
                                   idl, cutoff, axis=nd - 2,
                                   fast_weights=fast_weights, opt=opt)
        L = jax.lax.slice_in_dim(gll_r, 0, n + 1, axis=nd - 2)
        R = jax.lax.slice_in_dim(gll_l, 1, n + 2, axis=nd - 2)
    bc_lo, bc_hi = bc_ref[0], bc_ref[1]
    if nchunk > 1:
        c = pl.program_id(0) % nchunk
        bc_lo = jnp.where(c == 0, bc_lo, 0)
        bc_hi = jnp.where(c == nchunk - 1, bc_hi, 0)
    L, R = _apply_bc_limits(L, R, bc_lo, bc_hi, n, normal_id, -2)
    _riemann_block(L, R, hyr_ref[...], hyt_ref[...], sf_ref, tf_ref,
                   normal_id, ntracers, C0, gamma, div_scale=div_scale,
                   face_axis=-2, fo_ref=fo_ref, acc_ref=acc_ref, rk=rk)


def _apply_bc_limits(L, R, bc_lo, bc_hi, n, normal_id, face_axis):
    """Physical-boundary overwrite of the face limits INSIDE the kernel
    (the reference's edge_exchange BC section, dynamics...h:1005-1081;
    mirrors euler._apply_edge_bcs): at the low/high global boundary face the
    exterior limit copies the interior one, and a wall zeroes the normal
    momentum on both sides.

    ``bc_lo`` / ``bc_hi`` are traced int32 scalars (SMEM): 0 = interior
    shard (no-op), 1 = wall, 2 = open.  Scalars (not Python statics) so the
    same compiled kernel serves every shard under shard_map -- boundary
    shards pass 1/2, interior shards 0.
    """
    fdim = face_axis % L.ndim
    idx = jax.lax.broadcasted_iota(jnp.int32, L.shape[1:], fdim - 1)
    at_lo = (idx == 0) & (bc_lo > 0)
    at_hi = (idx == n) & (bc_hi > 0)
    L2 = jnp.where(at_lo[None], R, L)
    R2 = jnp.where(at_hi[None], L, R)
    wall = ((idx == 0) & (bc_lo == 1)) | ((idx == n) & (bc_hi == 1))
    # var-axis iota select instead of .at[normal_id].set (scatter has no
    # Mosaic lowering)
    vid = jax.lax.broadcasted_iota(jnp.int32,
                                   (L.shape[0],) + (1,) * (L.ndim - 1), 0)
    kill = (vid == normal_id) & wall[None]
    L2 = jnp.where(kill, 0.0, L2)
    R2 = jnp.where(kill, 0.0, R2)
    return L2, R2


def _riemann_block(L, R, hyr, hyt, sf_ref, tf_ref, normal_id, ntracers, C0,
                   gamma, div_scale=None, face_axis=-1, fo_ref=None,
                   periodic_roll=False, aligned_tf=False, acc_ref=None,
                   rk=None, interpret=False):
    """Shared upwind Riemann on face limits (dynamics...h:395-474); hy
    arrays broadcast against the per-var face blocks.

    ``div_scale`` (1/dx): emit the STATE divergence contribution
    ``(F[f] - F[f+1]) / dx`` per cell instead of the n+1 face fluxes --
    the state fluxes are never FCT-limited (only tracers are,
    dynamics...h:498-516), so their face round-trip through HBM can be
    skipped entirely.  Tracer fluxes always stay faces (FCT couples the
    three directions outside the kernel).

    ``fo_ref``: optional per-cell tracer OUTFLOW partial for FCT,
    (max(F[f+1], 0) - min(F[f], 0)) * div_scale -- emitted here because
    the faces are already in VMEM, so the FCT mult can later be computed
    from aligned cell-shaped arrays instead of re-slicing the (n+1)-lane
    face arrays in HBM (dynamics...h:500-508)."""
    rL = L[IDR] + hyr
    rR = R[IDR] + hyr
    ruL = L[normal_id] * rL
    ruR = R[normal_id] * rR
    rtL = L[IDT] + hyt
    rtR = R[IDT] + hyt
    pL = C0 * rtL ** gamma
    pR = C0 * rtR ** gamma
    w1 = 0.5 * (pR - _CS * ruR)
    w2 = 0.5 * (pL + _CS * ruL)
    p_upw = w1 + w2
    ru_upw = (w2 - w1) / _CS
    useL = (ruL + ruR) > 0.0
    r_upw = jnp.where(useL, rL, rR)
    adv = ru_upw / r_upw
    fU = adv * jnp.where(useL, L[IDU] * rL, R[IDU] * rR)
    fV = adv * jnp.where(useL, L[IDV] * rL, R[IDV] * rR)
    fW = adv * jnp.where(useL, L[IDW] * rL, R[IDW] * rR)
    fT = adv * jnp.where(useL, rtL, rtR)
    flux = [ru_upw, fU, fV, fW, fT]
    flux[normal_id] = flux[normal_id] + p_upw
    sflux = jnp.stack(flux)
    if periodic_roll:
        # faces are n-wide (aligned); face i+1 of cell i is the next face,
        # wrapping -- one circular roll closes the divergence ring
        fa = sflux.ndim - 1
        nl = sflux.shape[fa]
        contrib = (sflux - _roll(sflux, nl - 1, fa, interpret)) * div_scale
        sf_ref[...] = contrib if acc_ref is None else acc_ref[...] + contrib
        if ntracers:
            trL = jax.lax.slice_in_dim(L, NUM_STATE, NUM_STATE + ntracers,
                                       axis=0)
            trR = jax.lax.slice_in_dim(R, NUM_STATE, NUM_STATE + ntracers,
                                       axis=0)
            tflux = adv * jnp.where(useL, trL * rL, trR * rR)
            if aligned_tf:
                # n-wide ALIGNED left-face fluxes (face i of cell i); the
                # consumer reconstructs cell n-1's right face (the
                # periodic seam, = face 0's pre-scale value) itself, so
                # every downstream FCT/divergence op runs on vreg-aligned
                # n-lane tiles instead of (n+1)-padded ones.
                tf_ref[...] = tflux
            else:
                # the (n+1)-face output duplicates face 0 at face n
                # (periodic seam; the reference also keeps both copies,
                # euler.py note)
                tf_ref[...] = jnp.concatenate(
                    [tflux, jax.lax.slice_in_dim(tflux, 0, 1, axis=fa)],
                    axis=fa)
            if fo_ref is not None:
                b = _roll(tflux, nl - 1, fa, interpret)
                fo_ref[...] = (jnp.maximum(b, 0.0)
                               - jnp.minimum(tflux, 0.0)) * div_scale
        return
    if div_scale is None:
        sf_ref[...] = sflux
    else:
        fa = face_axis % sflux.ndim
        nf = sflux.shape[fa]
        a = jax.lax.slice_in_dim(sflux, 0, nf - 1, axis=fa)
        b = jax.lax.slice_in_dim(sflux, 1, nf, axis=fa)
        contrib = (a - b) * div_scale
        st = contrib if acc_ref is None else acc_ref[...] + contrib
        if rk is not None:
            # in-kernel SSPRK3 stage update (mirrors euler._ssprk3's
            # operation order: (c0*b0 [+ c1*b1]) + cdt*s_tend)
            coef_ref, b0_ref, b1_ref, src = rk
            if src is not None:
                st = st + src
            out = coef_ref[0] * b0_ref[...]
            if b1_ref is not None:
                out = out + coef_ref[1] * b1_ref[...]
            st = out + coef_ref[2] * st
        sf_ref[...] = st
    if ntracers:
        trL = jax.lax.slice_in_dim(L, NUM_STATE, NUM_STATE + ntracers, axis=0)
        trR = jax.lax.slice_in_dim(R, NUM_STATE, NUM_STATE + ntracers, axis=0)
        tflux = adv * jnp.where(useL, trL * rL, trR * rR)
        tf_ref[...] = tflux
        if fo_ref is not None:
            fa = face_axis % tflux.ndim
            nf = tflux.shape[fa]
            a = jax.lax.slice_in_dim(tflux, 0, nf - 1, axis=fa)
            b = jax.lax.slice_in_dim(tflux, 1, nf, axis=fa)
            fo_ref[...] = (jnp.maximum(b, 0.0)
                           - jnp.minimum(a, 0.0)) * div_scale


def direction_fluxes_pallas_sub(prim, lo, hi, hy_r, hy_t, n: int,
                                mats: WenoMatrices, cutoff: float,
                                normal_id: int, C0: float, gamma: float,
                                row_block: int = 1, lane_block: int = 128,
                                fast_weights: bool = False, opt: bool = True,
                                bc=(0, 0), nchunk: int = 1,
                                div_scale: float | None = None,
                                self_bc: int | None = None,
                                emit_fo: bool = False,
                                acc=None, rk=None):
    """Fused recon+Riemann with the stencil on axis -2.

    Args:
      prim: (nvar, R, n, L) WITHOUT halos -- R rows (e.g. nens*nz for y,
        nens for z), n the stencil axis, L the minor lanes axis (x, or
        y*x for z).
      lo / hi: (nvar, R, hp, L) halo strips, concatenated in VMEM.
      hy_r / hy_t: (R, F) with F = 1 (constant along the stencil axis, the
        x/y case) or F = n + 1 (per-face profiles, the z case).
      nchunk: R interleaves this many stencil chunks per physical row
        (chunks minor), each with its own neighbor strips; BC modes apply
        only in the first/last chunk.  Callers chunk a long stencil axis
        (VMEM cap) and stitch the per-chunk faces back
        (euler._direction_fluxes_pallas).

    ``acc`` (requires div_scale): (5, R, n, L) running state-tendency
    accumulator, added in-kernel and HBM-aliased to the state output
    (see direction_fluxes_pallas).

    ``rk`` (requires acc): (coefs, b0, b1, grav, fcor) -- coefs a (3,)
    f32 [c0, c1, c*dt], b0/b1 (5, R, n, L) base-state stacks (b1 None
    for stage 1) -- the state output becomes the SSPRK3 stage update
    c0*b0 [+ c1*b1] + cdt*(s_tend + gravity/Coriolis sources) instead of
    the tendency, eliminating the stage's state-sized XLA add temps
    (euler._ssprk3; the 1024^2x100 single-chip HBM-fit lever).

    Returns (state_flux (5, R, n+1, L), tracer_flux (nt, R, n+1, L)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nvar, Rr, nn, Ll = prim.shape
    ntracers = nvar - NUM_STATE
    ord_ = mats.ord
    hs = (ord_ - 1) // 2
    if self_bc is not None:
        # whole-axis unsharded: in-kernel halos from the block's own edges
        assert lo is None and hi is None and nchunk == 1
        local_edges = True
        hp = hs
    else:
        local_edges = lo.shape[2] == hs       # hs-wide strips: in-block edges
        hp = hs if local_edges else hs + 1
        assert lo.shape[2] == hp and hi.shape[2] == hp
    Np = n + 2 * hp
    assert nn == n
    assert not (local_edges and nchunk > 1), \
        "chunked axes need neighbor-cell reconstructions (hp-wide strips)"
    tv_terms, edge_terms, idl = _sparse_terms(ord_, 0)
    F = hy_r.shape[1]
    hy3 = hy_r.reshape(Rr, F, 1)
    hyt3 = hy_t.reshape(Rr, F, 1)

    Rt = 1 if nchunk > 1 else min(row_block, Rr)
    n_s_out = n if div_scale is not None else n + 1
    # Working set scales with Np*Lt: cap so the Mosaic temp stack stays
    # inside the 16 MB VMEM (empirically ~24k Np*lanes at nvar=8 f32;
    # MWML_PALLAS_BUDGET overrides for experiments).
    import os
    _budget_cells = int(os.environ.get("MWML_PALLAS_BUDGET", 24000))
    budget = max(128, (_budget_cells // Np) // 128 * 128)
    Lt = min(lane_block, Ll, budget)
    grid = (math.ceil(Rr / Rt), math.ceil(Ll / Lt))

    has_acc = acc is not None
    if has_acc:
        assert div_scale is not None and acc.shape == (NUM_STATE, Rr, n, Ll)
    has_rk = rk is not None
    has_b1 = has_rk and rk[2] is not None
    grav_f = fcor_f = 0.0
    if has_rk:
        assert has_acc, "rk update requires the accumulator chain"
        coefs, b0, b1, grav_f, fcor_f = rk
        assert b0.shape == (NUM_STATE, Rr, n, Ll)
    kernel = functools.partial(
        _kernel_sub, n=n, ord_=ord_, tv_terms=tv_terms,
        edge_terms=edge_terms, idl=idl, cutoff=cutoff, normal_id=normal_id,
        ntracers=ntracers, C0=C0, gamma=gamma, fast_weights=fast_weights,
        opt=opt, nchunk=nchunk, local_edges=local_edges,
        div_scale=div_scale, self_bc=self_bc, has_acc=has_acc,
        has_rk=has_rk, has_b1=has_b1, grav_f=float(grav_f),
        fcor_f=float(fcor_f))
    if self_bc is not None:
        base = kernel

        def kernel(bc_r, p_r, hyr_r, hyt_r, *out_refs):
            return base(bc_r, p_r, None, None, hyr_r, hyt_r, *out_refs)

    bc_arr = jnp.stack([jnp.asarray(bc[0], jnp.int32),
                        jnp.asarray(bc[1], jnp.int32)])
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((nvar, Rt, n, Lt), lambda r, l: (0, r, 0, l),
                     memory_space=pltpu.VMEM),
    ]
    operands = [bc_arr, prim]
    if self_bc is None:
        in_specs += [
            pl.BlockSpec((nvar, Rt, hp, Lt), lambda r, l: (0, r, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nvar, Rt, hp, Lt), lambda r, l: (0, r, 0, l),
                         memory_space=pltpu.VMEM),
        ]
        operands += [lo, hi]
    in_specs += [
        pl.BlockSpec((Rt, F, 1), lambda r, l: (r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Rt, F, 1), lambda r, l: (r, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands += [hy3, hyt3]
    aliases = {}
    if has_acc:
        in_specs.append(pl.BlockSpec((NUM_STATE, Rt, n, Lt),
                                     lambda r, l: (0, r, 0, l),
                                     memory_space=pltpu.VMEM))
        operands.append(acc)
        aliases[len(operands) - 1] = 0
    if has_rk:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(coefs, prim.dtype))
        for b in ((b0, b1) if has_b1 else (b0,)):
            in_specs.append(pl.BlockSpec((NUM_STATE, Rt, n, Lt),
                                         lambda r, l: (0, r, 0, l),
                                         memory_space=pltpu.VMEM))
            operands.append(b)
    out_specs = [
        pl.BlockSpec((NUM_STATE, Rt, n_s_out, Lt),
                     lambda r, l: (0, r, 0, l), memory_space=pltpu.VMEM),
        pl.BlockSpec((max(ntracers, 1), Rt, n + 1, Lt),
                     lambda r, l: (0, r, 0, l), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((NUM_STATE, Rr, n_s_out, Ll), prim.dtype),
        jax.ShapeDtypeStruct((max(ntracers, 1), Rr, n + 1, Ll),
                             prim.dtype),
    ]
    if emit_fo:
        assert div_scale is not None and ntracers
        out_specs.append(pl.BlockSpec((ntracers, Rt, n, Lt),
                                      lambda r, l: (0, r, 0, l),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((ntracers, Rr, n, Ll),
                                              prim.dtype))
    fuse = [False] + [True] * (len(in_specs) - 1)
    if has_acc:
        # donated accumulator: never fuse its producer (its buffer aliases
        # the state output); it sits right after the hy operands
        acc_pos = len(operands) - 1 - (3 if has_b1 else 2 if has_rk else 0)
        fuse[acc_pos] = False
    if has_rk:
        fuse[acc_pos + 1] = False  # SMEM coefs
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        compiler_params=_compiler_params(fuse),
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=jax.devices()[0].platform != "tpu",
    )(*operands)
    if emit_fo:
        sf, tf, fo = out
        return sf, tf[:ntracers], fo
    sf, tf = out
    return sf, tf[:ntracers]


def _fct_scale_div_kernel(f_ref, m_ref, *rest, n, dxi, axis, first,
                          has_rk=False, has_b1=False, tdim=1):
    """Scaled tracer-flux divergence for one direction: the FCT face
    scaling (dynamics...h:509-516, each face scaled by the upwind cell's
    multiplier -- cell f-1 where F > 0, cell f where F < 0, 1 at the
    domain edge) fused with the flux divergence, accumulating onto the
    previous directions' tendency.  Reads each array exactly once; no
    scaled-face array ever reaches HBM (the XLA formulation pays ~2.4x
    this traffic re-slicing the (n+1)-lane face arrays).

    The tracer axis rides the GRID (one tracer per grid step, selected
    by ``pl.program_id(tdim)``): Mosaic does NOT reuse its scoped stack
    across Python-unrolled loop iterations, so both the vectorized and
    the unrolled-loop forms measured 17.03-29.25M stacks on
    tracer-heavy blocks (limit 16M, round-5 queues 2-5) while a single
    tracer's ~12 n-sized temps are ~6M.

    ``has_rk`` (final direction only): the SSPRK3 tracer stage update +
    per-tracer positivity clamp run in the epilogue -- out =
    clamp(c0*tr0 [+ c1*tr1] + cdt*t_tend) with coefs an SMEM (3,) and
    the clamp mask an SMEM (ntr,) int32 indexed by the tracer grid dim
    (euler._ssprk3's clamp; kills the stage's tracer-sized XLA add
    temps the same way the state-side rk epilogue does)."""
    from jax.experimental import pallas as pl

    if first:
        tprev_ref = None
    else:
        tprev_ref, *rest = rest
    coef_ref = pos_ref = tr0_ref = tr1_ref = None
    if has_rk:
        coef_ref, pos_ref, tr0_ref, *rest = rest
        if has_b1:
            tr1_ref, *rest = rest
    (out_ref,) = rest
    F = f_ref[0]
    m = m_ref[0]
    nd = F.ndim
    ax = axis % nd
    Flo = jax.lax.slice_in_dim(F, 0, n, axis=ax)
    Fhi = jax.lax.slice_in_dim(F, 1, n + 1, axis=ax)
    one_shape = list(m.shape)
    one_shape[ax] = 1
    one = jnp.ones(one_shape, m.dtype)
    m_prev = jnp.concatenate(
        [one, jax.lax.slice_in_dim(m, 0, n - 1, axis=ax)], axis=ax)
    m_next = jnp.concatenate(
        [jax.lax.slice_in_dim(m, 1, n, axis=ax), one], axis=ax)
    fs_lo = Flo * jnp.where(Flo > 0, m_prev,
                            jnp.where(Flo < 0, m, 1.0))
    fs_hi = Fhi * jnp.where(Fhi > 0, m,
                            jnp.where(Fhi < 0, m_next, 1.0))
    acc = (fs_lo - fs_hi) * dxi
    if tprev_ref is not None:
        acc = tprev_ref[0] + acc
    if has_rk:
        v = coef_ref[0] * tr0_ref[0]
        if tr1_ref is not None:
            v = v + coef_ref[1] * tr1_ref[0]
        v = v + coef_ref[2] * acc
        t = pl.program_id(tdim)
        acc = jnp.where(pos_ref[t] > 0, jnp.maximum(v, 0.0), v)
    out_ref[0] = acc


def fct_scale_div_pallas(F, mult, t_prev, n: int, dxi: float,
                         block_rows: int = 256, rk=None):
    """Lane variant: F (ntr, B, n+1) faces, mult (ntr, B, n) FCT
    multipliers, t_prev (ntr, B, n) running tendency or None (donated to
    the output when given, so ONE tracer-tendency buffer chains through
    the three directions).  Returns (ntr, B, n) = t_prev - d(F_scaled)/dx,
    or the in-kernel tracer stage update when ``rk`` is given
    (final direction; rk = (coefs, tr0, tr1|None, positive), see
    _fct_scale_div_kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntr, B, nf = F.shape
    assert nf == n + 1 and mult.shape == (ntr, B, n)
    first = t_prev is None
    # Scoped-VMEM fit: one tracer per grid step, so ~12 live Bt x (n+1)
    # f32 temps per step must stay inside Mosaic's 16M stack (both the
    # vectorized and unrolled-tracer-loop forms measured 17-29M stacks
    # on tracer-heavy blocks, round-5 queues 2-5 -- Mosaic does not
    # reuse stack across unrolled iterations).
    fit = max(8, (8_000_000 // ((n + 1) * 4 * 12)) // 8 * 8)
    Bt = min(block_rows, B, fit)
    grid = (math.ceil(B / Bt), ntr)
    has_rk = rk is not None
    has_b1 = has_rk and rk[2] is not None
    kernel = functools.partial(_fct_scale_div_kernel, n=n, dxi=dxi,
                               axis=-1, first=first, has_rk=has_rk,
                               has_b1=has_b1, tdim=1)
    in_specs = [
        pl.BlockSpec((1, Bt, n + 1), lambda b, t: (t, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bt, n), lambda b, t: (t, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [F, mult]
    # F / t_prev producers are reshapes of kernel outputs (free to fuse);
    # mult's producer is the whole multiplier computation -- fusing it
    # would RE-run that chain inside every consumer kernel, so keep it
    # materialized.
    fuse = [True, False]
    aliases = {}
    if not first:
        in_specs.append(pl.BlockSpec((1, Bt, n), lambda b, t: (t, b, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(t_prev)
        fuse.append(False)  # donated: never fuse its producer
        aliases[len(operands) - 1] = 0
    if has_rk:
        coefs, tr0, tr1, pos = rk
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(coefs, F.dtype))
        fuse.append(False)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(np.asarray(pos, np.int32)))
        fuse.append(False)
        for b in ((tr0, tr1) if has_b1 else (tr0,)):
            in_specs.append(pl.BlockSpec((1, Bt, n),
                                         lambda b_, t_: (t_, b_, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(b.reshape(ntr, B, n))
            fuse.append(True)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        compiler_params=_compiler_params(fuse),
        out_specs=pl.BlockSpec((1, Bt, n), lambda b, t: (t, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntr, B, n), F.dtype),
        input_output_aliases=aliases,
        interpret=jax.devices()[0].platform != "tpu",
    )(*operands)


def fct_scale_div_pallas_sub(F, mult, t_prev, n: int, dxi: float,
                             lane_block: int = 256, rk=None):
    """Sublane variant: F (ntr, R, n+1, L), mult/t_prev (ntr, R, n, L);
    the direction axis (-2) stays whole per block.  ``t_prev`` is donated
    to the output; ``rk`` as in fct_scale_div_pallas (tr bases reshaped
    to the block layout by the caller)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntr, R, nf, Ll = F.shape
    assert nf == n + 1 and mult.shape == (ntr, R, n, Ll)
    first = t_prev is None
    # keep the VMEM working set modest: ~12 live (n+1) x Lt f32 temps
    # per grid step (one tracer per step, same budget reasoning as the
    # lane variant); lane blocks must stay 128-aligned (Mosaic last-dim
    # constraint)
    budget = max(128, (8_000_000 // ((n + 1) * 4 * 12)) // 128 * 128)
    Lt = min(lane_block, Ll, budget)
    grid = (R, math.ceil(Ll / Lt), ntr)
    has_rk = rk is not None
    has_b1 = has_rk and rk[2] is not None
    kernel = functools.partial(_fct_scale_div_kernel, n=n, dxi=dxi,
                               axis=-2, first=first, has_rk=has_rk,
                               has_b1=has_b1, tdim=2)
    in_specs = [
        pl.BlockSpec((1, 1, n + 1, Lt), lambda r, l, t: (t, r, 0, l),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n, Lt), lambda r, l, t: (t, r, 0, l),
                     memory_space=pltpu.VMEM),
    ]
    operands = [F, mult]
    fuse = [True, False]      # see fct_scale_div_pallas: never re-run mult
    aliases = {}
    if not first:
        in_specs.append(pl.BlockSpec((1, 1, n, Lt),
                                     lambda r, l, t: (t, r, 0, l),
                                     memory_space=pltpu.VMEM))
        operands.append(t_prev)
        fuse.append(False)  # donated: never fuse its producer
        aliases[len(operands) - 1] = 0
    if has_rk:
        coefs, tr0, tr1, pos = rk
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(coefs, F.dtype))
        fuse.append(False)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(np.asarray(pos, np.int32)))
        fuse.append(False)
        for b in ((tr0, tr1) if has_b1 else (tr0,)):
            in_specs.append(pl.BlockSpec((1, 1, n, Lt),
                                         lambda r, l, t: (t, r, 0, l),
                                         memory_space=pltpu.VMEM))
            operands.append(b.reshape(ntr, R, n, Ll))
            fuse.append(True)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        compiler_params=_compiler_params(fuse),
        out_specs=pl.BlockSpec((1, 1, n, Lt), lambda r, l, t: (t, r, 0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntr, R, n, Ll), F.dtype),
        input_output_aliases=aliases,
        interpret=jax.devices()[0].platform != "tpu",
    )(*operands)
