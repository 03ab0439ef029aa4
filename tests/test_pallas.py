"""Pallas fused recon+Riemann megakernel vs the XLA path (interpret mode on
CPU; the same comparison runs on real TPU hardware via bench/verify)."""

import jax
import numpy as np
import pytest

from miniweatherml_tpu.dycore.euler import Dycore
from tests.test_dycore import _setup


@pytest.mark.parametrize("case,nx,ny,nz", [
    ("thermal", 24, 1, 12),          # 2-D: x periodic, z wall
    pytest.param("supercell", 16, 8, 10,      # 3-D: x/y periodic, z wall
                 marks=pytest.mark.xslow),
])
@pytest.mark.slow
def test_pallas_step_matches_xla(case, nx, ny, nz):
    """opt_algebra=False reproduces the XLA path's exact operation order, so
    the comparison pins the Pallas plumbing at near-bitwise tolerance."""
    st, dy_x, _ = _setup(case, nx=nx, ny=ny, nz=nz,
                         xlen=40000.0, ylen=40000.0, zlen=10000.0)
    dy_p = Dycore(ord=5, riemann_impl="pallas", opt_algebra=False)
    dt = dy_x.compute_time_step(st)
    out_x = jax.jit(lambda s: dy_x.time_step(s, dt))(st)
    out_p = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "vvel", "wvel", "temp",
                 "water_vapor"):
        np.testing.assert_allclose(
            np.asarray(out_p[name]), np.asarray(out_x[name]),
            rtol=1e-9, atol=1e-11, err_msg=name)


@pytest.mark.slow
@pytest.mark.xslow
def test_pallas_x_roll_matches_concat_path(monkeypatch):
    """The periodic whole-axis x kernel has two formulations: the aligned
    circular-roll fast path (the TPU production default; jnp.roll shim in
    interpret mode) and the halo-concat path (MWML_X_ROLL=0, also the form
    sharded axes use).  They must agree to rounding -- the roll A/B was
    verified bitwise on-chip (BASELINE.md round-3); this keeps both under
    CPU coverage.  (xslow: the roll path itself is exercised by every
    interpret-mode pallas test since it became the default branch; this
    cross-check of the two formulations is belt-and-braces.)"""
    st, dy_x, _ = _setup("thermal", nx=24, ny=1, nz=12)
    dy_p = Dycore(ord=5, riemann_impl="pallas", opt_algebra=False)
    dt = dy_x.compute_time_step(st)
    out_roll = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    monkeypatch.setenv("MWML_X_ROLL", "0")
    jax.clear_caches()  # env is read at trace time
    out_cat = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "wvel", "temp", "water_vapor"):
        np.testing.assert_allclose(
            np.asarray(out_roll[name]), np.asarray(out_cat[name]),
            rtol=1e-12, atol=1e-14, err_msg=name)


@pytest.mark.slow
@pytest.mark.xslow
def test_pallas_opt_algebra_close_to_reference_order():
    """The reduced-operation limiter algebra (opt_algebra=True, the default)
    produces the same weights up to floating-point rounding; after one f64
    step the fields stay within ~1e-10 relative of the reference-ordered
    algebra (the residual is weight rounding amplified through the step)."""
    st, dy_x, _ = _setup("supercell", nx=16, ny=8, nz=10,
                         xlen=40000.0, ylen=40000.0, zlen=10000.0)
    dy_p = Dycore(ord=5, riemann_impl="pallas", opt_algebra=True)
    dt = dy_x.compute_time_step(st)
    out_x = jax.jit(lambda s: dy_x.time_step(s, dt))(st)
    out_p = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "wvel", "temp", "water_vapor"):
        a = np.asarray(out_x[name])
        scale = np.abs(a).max() + 1e-300
        np.testing.assert_allclose(np.asarray(out_p[name]) / scale,
                                   a / scale, rtol=0, atol=1e-9,
                                   err_msg=name)


@pytest.mark.slow
def test_pallas_multi_step_stays_valid():
    st, dy_x, _ = _setup("thermal", nx=24, ny=1, nz=12)
    dy_p = Dycore(ord=5, riemann_impl="pallas")
    dt = dy_p.compute_time_step(st)
    step = jax.jit(lambda s: dy_p.time_step(s, dt))
    for _ in range(3):
        st = step(st)
    assert st.validate() == {}


@pytest.mark.xslow
def test_pallas_fast_weights_close_to_exact():
    """fast_weights (approx reciprocal in weight normalization) stays within
    loose tolerance of the exact path (bit-identical on real TPU; interpret
    mode emulates the approximation)."""
    st, _, _ = _setup("thermal", nx=24, ny=1, nz=12, dtype="float32")
    dy_e = Dycore(ord=5, riemann_impl="pallas")
    dy_f = Dycore(ord=5, riemann_impl="pallas", fast_weights=True)
    dt = dy_e.compute_time_step(st)
    out_e = jax.jit(lambda s: dy_e.time_step(s, dt))(st)
    out_f = jax.jit(lambda s: dy_f.time_step(s, dt))(st)
    # Interpret mode emulates the approximate reciprocal much more
    # coarsely than the hardware (on the real chip the supercell step was
    # bit-identical); this guards the plumbing, not the precision.
    for name in ("uvel", "wvel", "temp"):
        a = np.asarray(out_e[name])
        np.testing.assert_allclose(np.asarray(out_f[name]), a,
                                   rtol=0.05, atol=0.05, err_msg=name)
    assert out_f.validate() == {}


@pytest.mark.slow
@pytest.mark.parametrize("bc", [(0, 0), (1, 1), (2, 2)])
def test_pallas_chunked_y_matches_whole_axis(bc):
    """The overlapped-chunk sublane path (long stencil axes over the VMEM
    cap) reproduces the whole-axis kernel bitwise: each chunk sees the same
    stencil inputs, _stitch_chunk_faces drops the duplicated chunk-boundary
    faces, and the physical BC modes apply only in the first/last chunk."""
    import jax.numpy as jnp

    import miniweatherml_tpu.dycore.euler as E
    from miniweatherml_tpu.ops.pallas_recon import direction_fluxes_pallas_sub
    from miniweatherml_tpu.ops.weno import weno_matrices

    rng = np.random.default_rng(3)
    nvar, R, n, L = 8, 6, 48, 16
    hp = 3
    Np = n + 2 * hp
    padded = jnp.asarray(rng.normal(size=(nvar, R, Np, L)) * 0.01 + 1.0)
    prim = padded[:, :, hp:hp + n]
    lo, hi = padded[:, :, :hp], padded[:, :, hp + n:]
    hyr = jnp.asarray(np.abs(rng.normal(size=(R, 1))) + 1.0)
    hyt = jnp.asarray(np.abs(rng.normal(size=(R, 1))) + 300.0)
    mats = weno_matrices(5)
    C0, gamma = 27.562941, 1.4
    SF1, TF1 = direction_fluxes_pallas_sub(
        prim, lo, hi, hyr, hyt, n, mats, 0.0, 2, C0, gamma, bc=bc)

    cn, C = 12, 4
    resh = prim.reshape(nvar, R * C, cn, L)
    los = [lo] + [jax.lax.slice_in_dim(prim, c * cn - hp, c * cn, axis=2)
                  for c in range(1, C)]
    his = [jax.lax.slice_in_dim(prim, (c + 1) * cn, (c + 1) * cn + hp,
                                axis=2) for c in range(C - 1)] + [hi]
    lo_c = jnp.stack(los, axis=2).reshape(nvar, R * C, hp, L)
    hi_c = jnp.stack(his, axis=2).reshape(nvar, R * C, hp, L)
    hyr_c = jnp.broadcast_to(hyr[:, None], (R, C, 1)).reshape(-1, 1)
    hyt_c = jnp.broadcast_to(hyt[:, None], (R, C, 1)).reshape(-1, 1)
    SFc, TFc = direction_fluxes_pallas_sub(
        resh, lo_c, hi_c, hyr_c, hyt_c, cn, mats, 0.0, 2, C0, gamma,
        bc=bc, nchunk=C)
    SFs = E._stitch_chunk_faces(SFc, 1, R, C, cn, L)[:, 0]
    TFs = E._stitch_chunk_faces(TFc, 1, R, C, cn, L)[:, 0]
    np.testing.assert_array_equal(np.asarray(SFs), np.asarray(SF1))
    np.testing.assert_array_equal(np.asarray(TFs), np.asarray(TF1))


@pytest.mark.slow
@pytest.mark.xslow
def test_pallas_chunked_y_in_dycore_step():
    """End-to-end: a ny large enough to take the chunked branch (forced by
    shrinking the chunk ceiling) matches the XLA path."""
    import miniweatherml_tpu.dycore.euler as E

    st, dy_x, _ = _setup("supercell", nx=16, ny=48, nz=10,
                         xlen=40000.0, ylen=40000.0, zlen=10000.0)
    dt = dy_x.compute_time_step(st)
    out_x = jax.jit(lambda s: dy_x.time_step(s, dt))(st)
    orig_cap, orig_cs = E._SUB_WHOLE_NP_CAP, E._chunk_size
    try:
        # ny=48 -> Np=54 would take the whole-axis branch; force chunks.
        E._SUB_WHOLE_NP_CAP = 16
        E._chunk_size = lambda n: 12 if n == 48 else orig_cs(n)
        dy_c = Dycore(ord=5, riemann_impl="pallas", opt_algebra=False)
        out_c = jax.jit(lambda s: dy_c.time_step(s, dt))(st)
    finally:
        E._SUB_WHOLE_NP_CAP, E._chunk_size = orig_cap, orig_cs
    for name in ("density_dry", "uvel", "vvel", "wvel", "temp",
                 "water_vapor"):
        np.testing.assert_allclose(
            np.asarray(out_c[name]), np.asarray(out_x[name]),
            rtol=1e-9, atol=1e-11, err_msg=name)


@pytest.mark.slow
def test_pallas_dir_seq_matches_default(monkeypatch):
    """MWML_DIR_SEQ=1 (the HBM-limit x->z->y sequencing that fits the
    1024^2-class community-benchmark grid on one chip) only changes the
    execution schedule: the barrier-ordered sum of the per-direction
    state divergences must reproduce the default path bitwise."""
    st, dy_x, _ = _setup("supercell", nx=16, ny=8, nz=10,
                         xlen=40000.0, ylen=40000.0, zlen=10000.0)
    dy_p = Dycore(ord=5, riemann_impl="pallas", opt_algebra=False)
    dt = dy_x.compute_time_step(st)
    monkeypatch.setenv("MWML_DIR_SEQ", "0")
    out_def = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    monkeypatch.setenv("MWML_DIR_SEQ", "1")
    jax.clear_caches()  # env is read at trace time
    out_seq = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "vvel", "wvel", "temp",
                 "water_vapor"):
        np.testing.assert_allclose(
            np.asarray(out_seq[name]), np.asarray(out_def[name]),
            rtol=1e-12, atol=1e-14, err_msg=name)


def test_tracer_div_seq_matches_default(monkeypatch):
    """MWML_TR_SEQ=1 (barrier-sequenced per-direction tracer-divergence
    accumulation on the XLA fct path -- the tracer-side 1024^2x100
    HBM-fit lever that replaced the kfct kernels) is a pure scheduling
    constraint: same adds, same order, so it must be bitwise."""
    st, dy_x, _ = _setup("supercell", nx=16, ny=8, nz=10,
                         xlen=40000.0, ylen=40000.0, zlen=10000.0)
    dy_p = Dycore(ord=5, riemann_impl="pallas", opt_algebra=False)
    dt = dy_x.compute_time_step(st)
    monkeypatch.setenv("MWML_TR_SEQ", "0")
    out_def = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    monkeypatch.setenv("MWML_TR_SEQ", "1")
    jax.clear_caches()  # env is read at trace time
    out_seq = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "vvel", "wvel", "temp",
                 "water_vapor", "cloud_liquid", "precip_liquid"):
        np.testing.assert_array_equal(
            np.asarray(out_seq[name]), np.asarray(out_def[name]),
            err_msg=f"tr-seq must be bitwise: {name}")


def test_pallas_div_acc_and_prim_split_match_default(monkeypatch):
    """MWML_DIV_ACC=1 (in-kernel x->z->y state-divergence accumulation
    with the accumulator HBM-aliased to the kernel output) and
    MWML_PRIM_SPLIT=1 (direction-local prim assembly) -- the round-5
    1024^2x100 HBM-fit levers -- reproduce the default path.  Split is a
    pure re-association of concat/reshape (bitwise); the acc adds run in
    strict f32 in-kernel where the XLA-add form may fuse with excess
    precision, so the combined bound is a few-ulp rtol."""
    st, dy_x, _ = _setup("supercell", nx=16, ny=8, nz=10,
                         xlen=40000.0, ylen=40000.0, zlen=10000.0)
    dy_p = Dycore(ord=5, riemann_impl="pallas", opt_algebra=False)
    dt = dy_x.compute_time_step(st)
    monkeypatch.setenv("MWML_DIV_ACC", "0")
    monkeypatch.setenv("MWML_PRIM_SPLIT", "0")
    out_def = jax.jit(lambda s: dy_p.time_step(s, dt))(st)

    monkeypatch.setenv("MWML_DIV_ACC", "0")
    monkeypatch.setenv("MWML_PRIM_SPLIT", "1")
    jax.clear_caches()  # env is read at trace time
    out_split = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "wvel", "temp", "water_vapor"):
        np.testing.assert_array_equal(
            np.asarray(out_split[name]), np.asarray(out_def[name]),
            err_msg=f"prim-split must be bitwise: {name}")

    monkeypatch.setenv("MWML_DIV_ACC", "1")
    monkeypatch.setenv("MWML_PRIM_SPLIT", "1")
    jax.clear_caches()
    out_acc = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "vvel", "wvel", "temp",
                 "water_vapor"):
        np.testing.assert_allclose(
            np.asarray(out_acc[name]), np.asarray(out_def[name]),
            rtol=1e-5, atol=1e-7, err_msg=name)


@pytest.mark.slow
def test_pallas_kernel_fct_matches_default(monkeypatch):
    """MWML_FCT_PALLAS=1 (megakernels emit per-cell FCT outflow partials;
    scale+divergence runs in fused kernels, ops/pallas_recon.
    fct_scale_div_pallas{,_sub}) must reproduce the default XLA fct+div
    path.  Recorded as a step-level throughput LOSS on the 3-tracer
    Kessler chain (BASELINE.md round 3) but a live candidate for
    tracer-heavy chains (the P3 chain advects 9 tracers), so the flag
    needs standing correctness coverage.  Same math to f32 rounding;
    measured bitwise on this grid."""
    st, dy_x, _ = _setup("supercell", nx=16, ny=8, nz=10,
                         xlen=40000.0, ylen=40000.0, zlen=10000.0)
    dy_p = Dycore(ord=5, riemann_impl="pallas", opt_algebra=False)
    dt = dy_x.compute_time_step(st)
    monkeypatch.setenv("MWML_FCT_PALLAS", "0")
    out_def = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    monkeypatch.setenv("MWML_FCT_PALLAS", "1")
    jax.clear_caches()  # env is read at trace time
    out_k = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "vvel", "wvel", "temp",
                 "water_vapor", "cloud_liquid", "precip_liquid"):
        np.testing.assert_allclose(
            np.asarray(out_k[name]), np.asarray(out_def[name]),
            rtol=1e-6, atol=1e-9, err_msg=name)


def test_pallas_rk_fuse_matches_default(monkeypatch):
    """MWML_RK_FUSE=1 (SSPRK3 stage update + gravity/Coriolis sources in
    the final direction kernel's epilogue, riding the MWML_DIV_ACC
    accumulator chain -- the 1024^2x100 HBM levers) reproduces the
    default path.  The in-kernel update mirrors the XLA operation order;
    the acc-chain reassociation bounds the difference at a few ulp (same
    tolerance as the DIV_ACC test)."""
    st, dy_x, _ = _setup("supercell", nx=16, ny=8, nz=10,
                         xlen=40000.0, ylen=40000.0, zlen=10000.0)
    dy_p = Dycore(ord=5, riemann_impl="pallas", opt_algebra=False)
    dt = dy_x.compute_time_step(st)
    monkeypatch.setenv("MWML_RK_FUSE", "0")
    monkeypatch.setenv("MWML_DIV_ACC", "0")
    out_def = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    monkeypatch.setenv("MWML_RK_FUSE", "1")
    monkeypatch.setenv("MWML_DIV_ACC", "1")
    jax.clear_caches()  # env is read at trace time
    out_rk = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "vvel", "wvel", "temp",
                 "water_vapor"):
        np.testing.assert_allclose(
            np.asarray(out_rk[name]), np.asarray(out_def[name]),
            rtol=1e-5, atol=1e-7, err_msg=name)


def test_pallas_rk_fuse_with_kernel_fct_matches_default(monkeypatch):
    """MWML_RK_FUSE=1 + MWML_FCT_PALLAS=1 (state stage update in the y
    megakernel epilogue, tracer stage update + positivity clamp in the
    final fct_scale_div pass, all tendency buffers donated through their
    chains) reproduces the default path at the acc-chain tolerance.
    kfct is a measured HBM-fit LOSS at 1024^2x100 (queue 7) and is now
    opt-in only, but the fused path stays correctness-pinned here."""
    st, dy_x, _ = _setup("supercell", nx=16, ny=8, nz=10,
                         xlen=40000.0, ylen=40000.0, zlen=10000.0)
    dy_p = Dycore(ord=5, riemann_impl="pallas", opt_algebra=False)
    dt = dy_x.compute_time_step(st)
    monkeypatch.setenv("MWML_RK_FUSE", "0")
    monkeypatch.setenv("MWML_DIV_ACC", "0")
    monkeypatch.setenv("MWML_FCT_PALLAS", "0")
    out_def = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    monkeypatch.setenv("MWML_RK_FUSE", "1")
    monkeypatch.setenv("MWML_DIV_ACC", "1")
    monkeypatch.setenv("MWML_FCT_PALLAS", "1")
    jax.clear_caches()  # env is read at trace time
    out_rk = jax.jit(lambda s: dy_p.time_step(s, dt))(st)
    for name in ("density_dry", "uvel", "vvel", "wvel", "temp",
                 "water_vapor", "cloud_liquid", "precip_liquid"):
        np.testing.assert_allclose(
            np.asarray(out_rk[name]), np.asarray(out_def[name]),
            rtol=1e-5, atol=1e-7, err_msg=name)
