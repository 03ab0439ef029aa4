"""P3 lookup-table loader + interpolation tests (reference
micro_p3.F90 p3_init_a / find_lookupTable_indices / access_lookup_table).
Uses the reference's shipped table as a data asset when mounted."""

import numpy as np
import jax.numpy as jnp
import pytest

from miniweatherml_tpu.physics.p3_tables import (DENSIZE, ISIZE, RCOLLSIZE,
                                                 RIMSIZE, default_table_path,
                                                 ice_table_indices,
                                                 interp_collect, interp_ice,
                                                 load_p3_tables,
                                                 rain_collection_index)

pytestmark = pytest.mark.skipif(default_table_path() is None,
                                reason="no P3 lookup table asset available")


@pytest.fixture(scope="module")
def tables():
    return load_p3_tables()


def test_table_shapes_and_version(tables):
    assert tables.version == "4.1.1"
    assert tables.ice.shape == (DENSIZE, RIMSIZE, ISIZE, 12)
    assert tables.collect.shape == (DENSIZE, RIMSIZE, ISIZE, RCOLLSIZE, 2)
    assert np.isfinite(tables.ice).all()
    assert np.isfinite(tables.collect).all()


def test_fall_speed_increases_with_particle_size(tables):
    """Mass-weighted fall speed (column 2) must grow with normalized size
    qi/ni at fixed rime properties -- basic physical sanity of the parse."""
    fall = tables.ice[2, 0, :, 1]  # mid density, unrimed, all sizes
    assert fall[40] > fall[10] > 0.0


def test_indices_at_interior_point(tables):
    qi = jnp.asarray([1e-4])
    ni = jnp.asarray([1e4])
    qm = jnp.asarray([2e-5])
    rhop = jnp.asarray([400.0])
    i0, fi, ii0, fii, jj0, fjj = ice_table_indices(qi, ni, qm, rhop)
    assert 0 <= int(i0[0]) < ISIZE - 1
    assert 0 <= int(ii0[0]) < RIMSIZE - 1
    assert 0 <= int(jj0[0]) < DENSIZE - 1
    assert 0.0 <= float(fi[0]) <= 1.0 + 1e-6


def test_interp_matches_exact_node(tables):
    """At an exact grid node the interpolation must return the stored
    value."""
    # Build (qi/ni) hitting node i=20 exactly: qi/ni = 261.7**((i+10)*0.1)*1e-18
    i = 20  # 1-based Fortran index
    ratio = 261.7 ** ((i + 10) * 0.1) * 1e-18
    ni = jnp.asarray([1.0e6])
    qi = ni * ratio
    qm = jnp.asarray([0.0])       # rime fraction 0 -> dum4 = 1 (node ii=1)
    rhop = jnp.asarray([50.0])    # dum5 = 1 (node jj=1)
    idx = ice_table_indices(qi, ni, qm, rhop)
    val = interp_ice(tables, 2, *idx)
    expect = tables.ice[0, 0, i - 1, 1]
    np.testing.assert_allclose(float(val[0]), expect, rtol=1e-6)


def test_interp_is_continuous(tables):
    """Interpolated value varies smoothly between nodes (no index jumps)."""
    ratios = np.geomspace(1e-14, 1e-9, 200)
    ni = jnp.full(200, 1.0e6)
    qi = ni * jnp.asarray(ratios)
    qm = jnp.zeros(200)
    rhop = jnp.full(200, 400.0)
    idx = ice_table_indices(qi, ni, qm, rhop)
    vals = np.asarray(interp_ice(tables, 2, *idx))
    rel_jump = np.abs(np.diff(vals)) / np.maximum(np.abs(vals[:-1]), 1e-12)
    assert rel_jump.max() < 0.2


def test_collect_interp_positive(tables):
    qi = jnp.asarray([1e-4]); ni = jnp.asarray([1e4])
    qm = jnp.asarray([0.0]); rhop = jnp.asarray([300.0])
    qr = jnp.asarray([1e-4]); nr = jnp.asarray([1e4])
    idx_i = ice_table_indices(qi, ni, qm, rhop)
    j0, fj = rain_collection_index(qr, nr)
    v = interp_collect(tables, 1, *idx_i, j0, fj)
    assert float(v[0]) > 0.0


def test_scheme_with_tables_ice_rain_collection(tables):
    """With tables active, a cold mixed rain+ice column must collect rain
    into rime (qrcol > 0 -> qm grows, qr shrinks) and conserve water."""
    import sys
    sys.path.insert(0, "tests")
    from test_p3 import _column
    from miniweatherml_tpu.physics.p3 import p3_scheme

    col = _column(tsurf=265.0, qv0=2e-3, qc0=5e-4, qr0=8e-4, qi0=5e-4)
    col = dict(col)
    col["nr"] = jnp.full_like(col["qr"], 1e5)
    col["ni"] = jnp.full_like(col["qi"], 1e5)
    base = p3_scheme(**col, dt=10.0, tables=None)
    out = p3_scheme(**col, dt=10.0, tables=tables)
    qm_base, qm_tab = np.asarray(base[6]), np.asarray(out[6])
    assert qm_tab.max() > qm_base.max()  # collection adds rime mass
    # water conservation incl. surface precip
    rho_d = np.asarray(col["rho_d"]); dz = np.asarray(col["dz"])
    tot = lambda o: ((np.asarray(o[0]) + np.asarray(o[2]) + np.asarray(o[4])
                      + np.asarray(o[8])) * rho_d * dz).sum()
    m0 = ((np.asarray(col["qc"]) + np.asarray(col["qr"]) + np.asarray(col["qi"])
           + np.asarray(col["qv"])) * rho_d * dz).sum()
    precip = float((out[10] + out[11]).sum()) * 10.0 * 1000.0
    np.testing.assert_allclose(tot(out) + precip, m0, rtol=0.05)


def test_matmul_lookups_match_gather(tables, monkeypatch):
    """The TPU fast path (one-hot-weight matmul lookups,
    interp_*_multi with MWML_P3_TABLES=matmul) reproduces the gather
    implementation's tri/quad-linear interpolation to floating-point
    rounding, including the lax.map cell chunking."""
    from miniweatherml_tpu.physics.p3_tables import (
        generate_rain_tables, interp_collect_multi, interp_ice_multi,
        interp_rain_multi, rain_size_index)

    rng = np.random.default_rng(11)
    n = 3000
    i0 = jnp.asarray(rng.integers(0, ISIZE - 1, n), jnp.int32)
    ii0 = jnp.asarray(rng.integers(0, RIMSIZE - 1, n), jnp.int32)
    jj0 = jnp.asarray(rng.integers(0, DENSIZE - 1, n), jnp.int32)
    j0 = jnp.asarray(rng.integers(0, RCOLLSIZE - 1, n), jnp.int32)
    fi, fii, fjj, fj = (jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
                        for _ in range(4))
    idx = (i0, fi, ii0, fii, jj0, fjj)

    monkeypatch.setenv("MWML_P3_TABLES", "gather")
    ice_g = interp_ice_multi(tables, (1, 2, 7, 8), *idx)
    coll_g = interp_collect_multi(tables, (1, 2), *idx, j0, fj)
    rows = generate_rain_tables()
    ri0, rfi = rain_size_index(jnp.asarray(rng.uniform(1e-6, 3e-3, n)))
    rain_g = interp_rain_multi(rows, ri0, rfi)

    monkeypatch.setenv("MWML_P3_TABLES", "matmul")
    ice_m = interp_ice_multi(tables, (1, 2, 7, 8), *idx)
    coll_m = interp_collect_multi(tables, (1, 2), *idx, j0, fj)
    rain_m = interp_rain_multi(rows, ri0, rfi)

    for g, m in zip(ice_g + coll_g + rain_g, ice_m + coll_m + rain_m):
        np.testing.assert_allclose(np.asarray(m), np.asarray(g),
                                   rtol=2e-5, atol=0)

    # chunked path: force more cells than one chunk by shrinking the grid?
    # (the helper chunks at fixed sizes; 3000 cells exercise the direct
    # branch, a 40k collect exercises the 32768-cell chunked branch)
    big = 40000
    rep = (big + n - 1) // n
    idx_b = tuple(jnp.tile(a, rep)[:big] for a in idx)
    j0b, fjb = jnp.tile(j0, rep)[:big], jnp.tile(fj, rep)[:big]
    monkeypatch.setenv("MWML_P3_TABLES", "gather")
    cg = interp_collect_multi(tables, (2,), *idx_b, j0b, fjb)
    monkeypatch.setenv("MWML_P3_TABLES", "matmul")
    cm = interp_collect_multi(tables, (2,), *idx_b, j0b, fjb)
    np.testing.assert_allclose(np.asarray(cm[0]), np.asarray(cg[0]),
                               rtol=2e-5, atol=0)


def test_pallas_lookup_kernel_matches_gather(tables, monkeypatch):
    """The VMEM-resident Pallas lookup kernel (MWML_P3_TABLES=pallas;
    interpret mode on CPU) reproduces the gather trilinear interpolation
    to f32 rounding, including the block-padding tail."""
    from miniweatherml_tpu.physics.p3_tables import interp_ice_multi

    rng = np.random.default_rng(7)
    n = 2500  # not a multiple of the 1024-cell block: exercises padding
    i0 = jnp.asarray(rng.integers(0, ISIZE - 1, n), jnp.int32)
    ii0 = jnp.asarray(rng.integers(0, RIMSIZE - 1, n), jnp.int32)
    jj0 = jnp.asarray(rng.integers(0, DENSIZE - 1, n), jnp.int32)
    fi, fii, fjj = (jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
                    for _ in range(3))
    idx = (i0, fi, ii0, fii, jj0, fjj)

    monkeypatch.setenv("MWML_P3_TABLES", "gather")
    ref = interp_ice_multi(tables, (1, 2, 7, 8), *idx)
    monkeypatch.setenv("MWML_P3_TABLES", "pallas")
    out = interp_ice_multi(tables, (1, 2, 7, 8), *idx)
    for g, p in zip(ref, out):
        np.testing.assert_allclose(np.asarray(p), np.asarray(g),
                                   rtol=3e-5, atol=0)


def test_pallas_collect_kernel_matches_gather(tables, monkeypatch):
    """The quad-linear ice-rain collection Pallas kernel reproduces the
    gather interpolation (incl. the log10 exponentiation) at f32."""
    from miniweatherml_tpu.physics.p3_tables import interp_collect_multi

    rng = np.random.default_rng(11)
    n = 1300  # exercises block padding
    i0 = jnp.asarray(rng.integers(0, ISIZE - 1, n), jnp.int32)
    ii0 = jnp.asarray(rng.integers(0, RIMSIZE - 1, n), jnp.int32)
    jj0 = jnp.asarray(rng.integers(0, DENSIZE - 1, n), jnp.int32)
    j0 = jnp.asarray(rng.integers(0, RCOLLSIZE - 1, n), jnp.int32)
    fi, fii, fjj, fj = (jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
                        for _ in range(4))
    args = (i0, fi, ii0, fii, jj0, fjj, j0, fj)

    monkeypatch.setenv("MWML_P3_TABLES", "gather")
    ref = interp_collect_multi(tables, (2, 1), *args)
    monkeypatch.setenv("MWML_P3_TABLES", "pallas")
    out = interp_collect_multi(tables, (2, 1), *args)
    for g, p in zip(ref, out):
        np.testing.assert_allclose(np.asarray(p), np.asarray(g),
                                   rtol=2e-4, atol=0)


def test_pallas_rain_kernel_matches_gather(tables, monkeypatch):
    """The 1-D rain-row Pallas kernel matches the gather lerp, including
    the i0 clip at the table's top edge."""
    from miniweatherml_tpu.physics.p3_tables import (generate_rain_tables,
                                                     interp_rain_multi)

    vn_row, vm_row, revap_row = generate_rain_tables()
    rng = np.random.default_rng(13)
    n = 2100
    i0 = jnp.asarray(rng.integers(0, 301, n), jnp.int32)  # incl. clip range
    fi = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)

    monkeypatch.setenv("MWML_P3_TABLES", "gather")
    ref = interp_rain_multi((vm_row, vn_row, revap_row), i0, fi)
    monkeypatch.setenv("MWML_P3_TABLES", "pallas")
    out = interp_rain_multi((vm_row, vn_row, revap_row), i0, fi)
    for g, p in zip(ref, out):
        np.testing.assert_allclose(np.asarray(p), np.asarray(g),
                                   rtol=3e-5, atol=0)


def test_truncated_table_file_raises(tmp_path):
    """A truncated/corrupt table file must fail loudly (ValueError), not
    spin forever at EOF (readline() returning '' used to loop)."""
    src = default_table_path()
    with open(src) as f:
        head = [f.readline() for _ in range(50)]
    cut = tmp_path / "truncated.dat"
    cut.write_text("".join(head))
    with pytest.raises(ValueError, match="truncated"):
        load_p3_tables(str(cut))


def test_pallas_rain_kernel_derives_row_length(monkeypatch):
    """The rain kernel takes its table width from the rows themselves
    (not a hard-coded 300), matching interp_rain_multi's contract."""
    from miniweatherml_tpu.physics.p3_tables import interp_rain_multi

    rng = np.random.default_rng(7)
    rows = tuple(np.asarray(rng.uniform(0.5, 2.0, 77), np.float32)
                 for _ in range(2))
    n = 500
    i0 = jnp.asarray(rng.integers(0, 78, n), jnp.int32)  # incl. clip range
    fi = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)

    monkeypatch.setenv("MWML_P3_TABLES", "gather")
    ref = interp_rain_multi(rows, i0, fi)
    monkeypatch.setenv("MWML_P3_TABLES", "pallas")
    out = interp_rain_multi(rows, i0, fi)
    for g, p in zip(ref, out):
        np.testing.assert_allclose(np.asarray(p), np.asarray(g),
                                   rtol=3e-5, atol=0)


def test_lane_ice_kernel_matches_gather(tables, monkeypatch):
    """The round-5 lane-blocked transposed-matmul ice kernel
    (MWML_P3_TABLES=lane; interpret mode on CPU) reproduces the gather
    trilinear interpolation to f32 rounding, incl. the lane-padding tail
    and a 7-column pack (the part2 call-site shape)."""
    from miniweatherml_tpu.physics.p3_tables import interp_ice_multi

    rng = np.random.default_rng(17)
    n = 2500  # not a multiple of 128 or of the 8-row block
    i0 = jnp.asarray(rng.integers(0, ISIZE - 1, n), jnp.int32)
    ii0 = jnp.asarray(rng.integers(0, RIMSIZE - 1, n), jnp.int32)
    jj0 = jnp.asarray(rng.integers(0, DENSIZE - 1, n), jnp.int32)
    fi, fii, fjj = (jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
                    for _ in range(3))
    idx = (i0, fi, ii0, fii, jj0, fjj)

    monkeypatch.setenv("MWML_P3_TABLES", "gather")
    ref = interp_ice_multi(tables, (7, 8, 4, 2, 3, 5, 10), *idx)
    monkeypatch.setenv("MWML_P3_TABLES", "lane")
    out = interp_ice_multi(tables, (7, 8, 4, 2, 3, 5, 10), *idx)
    for g, p in zip(ref, out):
        # atol floor: the two corner-sum orders differ at DENORMAL
        # magnitudes (~1e-37, 30+ orders below each column's scale)
        np.testing.assert_allclose(np.asarray(p), np.asarray(g),
                                   rtol=3e-5, atol=1e-30)


def test_lane_rain_kernel_matches_gather(tables, monkeypatch):
    """The round-5 lane-gather rain kernel (Mosaic dynamic_gather chunks)
    matches the gather lerp, including the i0 clip at the table top."""
    from miniweatherml_tpu.physics.p3_tables import (generate_rain_tables,
                                                     interp_rain_multi)

    vn_row, vm_row, revap_row = generate_rain_tables()
    rng = np.random.default_rng(19)
    n = 2100
    i0 = jnp.asarray(rng.integers(0, 301, n), jnp.int32)
    fi = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)

    monkeypatch.setenv("MWML_P3_TABLES", "gather")
    ref = interp_rain_multi((vm_row, vn_row, revap_row), i0, fi)
    monkeypatch.setenv("MWML_P3_TABLES", "lane")
    out = interp_rain_multi((vm_row, vn_row, revap_row), i0, fi)
    for g, p in zip(ref, out):
        np.testing.assert_allclose(np.asarray(p), np.asarray(g),
                                   rtol=3e-5, atol=0)


def test_lane_collect_kernel_matches_gather(tables, monkeypatch):
    """The round-5b lane-blocked collect kernel (joint-contraction
    transposed matmul, MWML_P3_COLLECT=lane; interpret mode on CPU)
    reproduces the gather quadlinear interpolation, in BOTH weight-build
    forms (broadcast-reshape and digit-decode)."""
    from miniweatherml_tpu.physics.p3_tables import interp_collect_multi

    rng = np.random.default_rng(23)
    n = 2500  # not a multiple of 128 or of the 8-row block
    i0 = jnp.asarray(rng.integers(0, ISIZE - 1, n), jnp.int32)
    ii0 = jnp.asarray(rng.integers(0, RIMSIZE - 1, n), jnp.int32)
    jj0 = jnp.asarray(rng.integers(0, DENSIZE - 1, n), jnp.int32)
    j0 = jnp.asarray(rng.integers(0, RCOLLSIZE - 1, n), jnp.int32)
    fi, fii, fjj, fj = (jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
                        for _ in range(4))
    idx = (i0, fi, ii0, fii, jj0, fjj, j0, fj)

    monkeypatch.setenv("MWML_P3_TABLES", "gather")
    ref = interp_collect_multi(tables, (2, 1), *idx)
    for build in ("reshape", "decode"):
        monkeypatch.setenv("MWML_P3_TABLES", "lane")
        monkeypatch.setenv("MWML_P3_COLLECT", "lane")
        monkeypatch.setenv("MWML_P3_COLL_BUILD", build)
        out = interp_collect_multi(tables, (2, 1), *idx)
        for g, p in zip(ref, out):
            # rtol: f32 corner sums of multi-decade log10 entries are
            # exponentiated, amplifying rounding by ~ln(10)*|log10 v|
            np.testing.assert_allclose(np.asarray(p), np.asarray(g),
                                       rtol=2e-4, atol=0)
