"""P3 ice lookup tables: ASCII loader + vectorized JAX interpolation.

The reference's P3 reads its ice process-rate lookup table at init
(micro_p3.F90 p3_init_a:133-204: ASCII file ``p3_lookup_table_1.dat-v4.1.1``
with a VERSION header, then ``densize x rimsize x isize`` ice rows of 12
process values and ``densize x rimsize x isize x rcollsize`` ice-rain
collection rows, log10-transformed) and interpolates it tri/quad-linearly
per cell per process (access_lookup_table, :1508-1556;
find_lookupTable_indices_1a/1b, :1620-1720).

Here the table is parsed once on host into dense numpy arrays and the
index-finding + interpolation are vectorized jnp gathers that run on-device
for the whole grid at once -- the groundwork for replacing the continuous
[approx]-tier ice rates in physics/p3.py with the table-driven values.

Table dimensions (micro_p3_utils.F90:43-46):
  isize=50 (normalized size), rimsize=4 (rime fraction),
  densize=5 (rime density), rcollsize=30 (rain size).

Ice table column meaning (by access_lookup_table call sites,
micro_p3.F90:657-672): 1 ni_fallspd, 2 qi_fallspd, 3 ni_self_collect,
4 qc2qi_collect, 5 qi2qr_melting, 6 eff_radius, 7 nr_collect (via coll
table), ... 12 columns total stored.

The table file itself is DATA shipped with the reference (not code); the
loader takes any path -- set ``MWML_P3_TABLE`` or pass explicitly.
"""

from __future__ import annotations

import dataclasses
import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["P3Tables", "load_p3_tables", "default_table_path",
           "ice_table_indices", "rain_collection_index",
           "interp_ice", "interp_collect"]

ISIZE, RIMSIZE, DENSIZE, RCOLLSIZE = 50, 4, 5, 30
# 1/(0.1*log10(261.7)) (micro_p3_utils.F90:34)
_DUM1_C = 4.135985029041767
QSMALL = 1.0e-14
RHO_H2O = 1000.0


@dataclasses.dataclass(frozen=True)
class P3Tables:
    """ice: (densize, rimsize, isize, 12); collect: (densize, rimsize,
    isize, rcollsize, 2) with log10 applied (p3_init_a:192-194)."""

    version: str
    ice: np.ndarray
    collect: np.ndarray


def default_table_path() -> str | None:
    env = os.environ.get("MWML_P3_TABLE")
    if env:
        return env
    ref = ("/root/reference/model/modules/helpers/microphysics_p3/"
           "p3_lookup_table_1.dat-v4.1.1")
    return ref if os.path.exists(ref) else None


def load_p3_tables(path: str | None = None) -> P3Tables:
    """Parse the v4.1.1 ASCII table (p3_init_a row layout)."""
    path = path or default_table_path()
    if path is None:
        raise FileNotFoundError(
            "no P3 lookup table available; set MWML_P3_TABLE")
    with open(path) as f:
        header = f.readline().split()
        version = header[-1]
        ice = np.zeros((DENSIZE, RIMSIZE, ISIZE, 12))
        coll = np.zeros((DENSIZE, RIMSIZE, ISIZE, RCOLLSIZE, 2))
        for jj in range(DENSIZE):
            for ii in range(RIMSIZE):
                for i in range(ISIZE):
                    vals = []
                    while len(vals) < 17:
                        vals += f.readline().split()
                    v = [float(x) for x in vals]
                    # row: i, ?, dum, dum, k1..k8, dum, k9..k12
                    # (p3_init_a:183-186)
                    ice[jj, ii, i, :8] = v[4:12]
                    ice[jj, ii, i, 8:] = v[13:17]
                for i in range(ISIZE):
                    for j in range(RCOLLSIZE):
                        vals = []
                        while len(vals) < 8:
                            vals += f.readline().split()
                        v = [float(x) for x in vals]
                        # row: i, j, dum, dum, dum, k1, k2, dum (:188-194)
                        coll[jj, ii, i, j, 0] = np.log10(v[5])
                        coll[jj, ii, i, j, 1] = np.log10(v[6])
    return P3Tables(version=version, ice=ice, collect=coll)


def ice_table_indices(qi, ni, qm, rhop):
    """Vectorized find_lookupTable_indices_1a (micro_p3.F90:1620-1677).

    Returns (i0, fi, ii0, fii, jj0, fjj): 0-based base indices and the
    Fortran-style fractional positions (dum - dumi) for the size, rime
    fraction, and rime density axes.
    """
    dum1 = (jnp.log10(jnp.maximum(qi, QSMALL)
                      / jnp.maximum(ni, 1e-30)) + 18.0) * _DUM1_C - 10.0
    dumi = jnp.floor(dum1).astype(jnp.int32)
    dum1 = jnp.clip(dum1, 1.0, float(ISIZE))
    dumi = jnp.clip(dumi, 1, ISIZE - 1)

    dum4 = (qm / jnp.maximum(qi, QSMALL)) * 3.0 + 1.0
    dumii = jnp.floor(dum4).astype(jnp.int32)
    dum4 = jnp.clip(dum4, 1.0, float(RIMSIZE))
    dumii = jnp.clip(dumii, 1, RIMSIZE - 1)

    dum5 = jnp.where(rhop <= 650.0,
                     (rhop - 50.0) * 0.005 + 1.0,
                     (rhop - 650.0) * 0.004 + 4.0)
    dumjj = jnp.floor(dum5).astype(jnp.int32)
    dum5 = jnp.clip(dum5, 1.0, float(DENSIZE))
    dumjj = jnp.clip(dumjj, 1, DENSIZE - 1)

    # convert to 0-based plus fractional offsets
    return (dumi - 1, dum1 - dumi.astype(dum1.dtype),
            dumii - 1, dum4 - dumii.astype(dum4.dtype),
            dumjj - 1, dum5 - dumjj.astype(dum5.dtype))


def rain_collection_index(qr, nr):
    """Vectorized find_lookupTable_indices_1b (micro_p3.F90:1681-1720)."""
    has_rain = (qr >= QSMALL) & (nr > 0.0)
    dumlr = jnp.cbrt(jnp.maximum(qr, QSMALL)
                     / (jnp.pi * RHO_H2O * jnp.maximum(nr, 1e-30)))
    dum3 = (jnp.log10(dumlr) + 5.0) * 10.70415
    dumj = jnp.floor(dum3).astype(jnp.int32)
    dum3 = jnp.clip(dum3, 1.0, float(RCOLLSIZE))
    dumj = jnp.clip(dumj, 1, RCOLLSIZE - 1)
    dumj = jnp.where(has_rain, dumj, 1)
    dum3 = jnp.where(has_rain, dum3, 1.0)
    return dumj - 1, dum3 - dumj.astype(dum3.dtype)


def interp_ice(tables: P3Tables, col: int, i0, fi, ii0, fii, jj0, fjj):
    """Trilinear interpolation of ice table column ``col`` (1-based like the
    Fortran ``index`` arg) at the vectorized index positions
    (access_lookup_table, micro_p3.F90:1508-1545)."""
    t = jnp.asarray(tables.ice[..., col - 1])  # (densize, rimsize, isize)

    def at(jj, ii, i):
        return t[jj, ii, i]

    def lin_i(jj, ii):
        return at(jj, ii, i0) + fi * (at(jj, ii, i0 + 1) - at(jj, ii, i0))

    def lin_ii(jj):
        a = lin_i(jj, ii0)
        b = lin_i(jj, ii0 + 1)
        return a + fii * (b - a)

    t1 = lin_ii(jj0)
    t2 = lin_ii(jj0 + 1)
    return t1 + fjj * (t2 - t1)


def interp_collect(tables: P3Tables, col: int, i0, fi, ii0, fii, jj0, fjj,
                   j0, fj):
    """Quadrilinear interpolation of the ice-rain collection table
    (access_lookup_table_coll, micro_p3.F90; values stored as log10 and
    exponentiated after interpolation)."""
    t = jnp.asarray(tables.collect[..., col - 1])

    def at(jj, ii, i, j):
        return t[jj, ii, i, j]

    def lin_j(jj, ii, i):
        return at(jj, ii, i, j0) + fj * (at(jj, ii, i, j0 + 1)
                                         - at(jj, ii, i, j0))

    def lin_i(jj, ii):
        a = lin_j(jj, ii, i0)
        b = lin_j(jj, ii, i0 + 1)
        return a + fi * (b - a)

    def lin_ii(jj):
        a = lin_i(jj, ii0)
        b = lin_i(jj, ii0 + 1)
        return a + fii * (b - a)

    t1 = lin_ii(jj0)
    t2 = lin_ii(jj0 + 1)
    return 10.0 ** (t1 + fjj * (t2 - t1))


# -- generated rain tables (p3_init_b, micro_p3.F90:236-345) ---------------
# Number/mass-weighted rain fall speeds and the rain-evaporation
# ventilation integral over the size distribution, tabulated over 300
# number-weighted mean sizes at the constant shape parameter
# mu_r = 1 (micro_p3_utils.F90:33).  All 10 mu_r rows of the reference
# table are identical (v4 uses constant mu_r), so one row suffices.
MU_R = 1.0
F1R, F2R = 0.78, 0.32      # ventilation coefficients (micro_p3_utils:138-139)


@lru_cache(maxsize=None)
def generate_rain_tables():
    """Numerically integrate the rain PSD exactly as p3_init_b does:
    returns (vn, vm, revap) arrays of shape (300,)."""
    jj = np.arange(1, 301, dtype=np.float64)
    dm = np.where(jj <= 20, (jj * 10.0 - 5.0) * 1e-6,
                  ((jj - 20) * 30.0 + 195.0) * 1e-6)
    lamr = (MU_R + 1.0) / dm                       # (300,)

    dd = 2.0
    kk = np.arange(1, 10001, dtype=np.float64)
    dia = (kk * dd - dd * 0.5) * 1e-6              # (10000,)
    amg = np.pi / 6.0 * 997.0 * dia ** 3 * 1000.0  # mass in grams
    vt = np.where(
        dia * 1e6 <= 134.43, 4.5795e3 * amg ** (2.0 / 3.0),
        np.where(dia * 1e6 < 1511.64, 4.962e1 * amg ** (1.0 / 3.0),
                 np.where(dia * 1e6 < 3477.84, 1.732e1 * amg ** (1.0 / 6.0),
                          9.17)))
    # weights (underflow-guard factors 10**(4 mu) / 10**(3 mu) as in the
    # reference; they cancel in the ratios)
    w_n = 10.0 ** (MU_R * np.log10(dia) + 4.0 * MU_R)
    w_m = 10.0 ** ((MU_R + 3.0) * np.log10(dia) + 4.0 * MU_R)
    w_v = np.sqrt(vt * dia) * 10.0 ** ((MU_R + 1.0) * np.log10(dia)
                                       + 3.0 * MU_R)
    e = np.exp(-np.outer(lamr, dia)) * (dd * 1e-6)  # (300, 10000)
    dum1 = e @ (vt * w_n)
    dum2 = np.maximum(e @ w_n, 1e-30)
    dum3 = e @ (vt * w_m)
    dum4 = np.maximum(e @ w_m, 1e-30)
    dum5 = np.maximum(e @ w_v, 1e-30)
    vn = dum1 / dum2
    vm = dum3 / dum4
    revap = 10.0 ** (np.log10(dum5) + (MU_R + 1.0) * np.log10(lamr)
                     - 3.0 * MU_R)
    return vn, vm, revap


def rain_size_index(dm):
    """Vectorized find_lookupTable_indices_3's size mapping
    (micro_p3.F90:1725-1770): number-weighted mean size -> (i0, frac),
    0-based into the 300-entry generated tables."""
    rd_small = jnp.clip((dm * 1e6 + 5.0) * 0.1, 1.0, 20.0)
    rd_large = jnp.clip((dm * 1e6 - 195.0) / 30.0 + 20.0, 20.0, 300.0)
    rdum = jnp.where(dm <= 195.0e-6, rd_small, rd_large)
    i_small = jnp.clip(jnp.floor(rd_small).astype(jnp.int32), 1, 20)
    i_large = jnp.clip(jnp.floor(rd_large).astype(jnp.int32), 20, 299)
    idum = jnp.where(dm <= 195.0e-6, i_small, i_large)
    return idum - 1, rdum - idum.astype(rdum.dtype)


def interp_rain(table_row, i0, fi):
    """Linear interpolation into a generated (300,) rain table; index i0 is
    clipped so i0+1 stays in range (the reference caps rdumii at 300 with
    dumii at 299)."""
    t = jnp.asarray(table_row)
    i0 = jnp.clip(i0, 0, t.shape[0] - 2)
    return t[i0] + fi * (t[i0 + 1] - t[i0])
