"""Sweep Pallas megakernel block sizes on the x-direction pipeline."""

import time

import jax
import jax.numpy as jnp

from miniweatherml_tpu.core.coupler import Grid, make_coupler_state
from miniweatherml_tpu.dycore.euler import _AX_X, IDU, Dycore
from miniweatherml_tpu.ops.pallas_recon import direction_fluxes_pallas
from miniweatherml_tpu.physics.kessler import MicrophysicsKessler

g = Grid(nx=512, ny=512, nz=64, xlen=400.0 * 512, ylen=400.0 * 512,
         zlen=200.0 * 64)
st = make_coupler_state(g, dtype="float32",
                        options={"init_data": "supercell", "out_freq": -1.0})
st = MicrophysicsKessler().init(st)
dy = Dycore()
st = dy.init(st)
consts = dy._consts(st)
hy = dy._hy(st)
s, tr = dy.convert_coupler_to_dynamics(st)
full_r = s[0] + hy[0][:, :, None, None]
prim = jnp.concatenate([s[0:1], s[1:4] / full_r, s[4:5], tr / full_r])
from miniweatherml_tpu.ops.stencil import halo_strips
hp = dy.hs + 1
lo, hi = halo_strips(prim, -1, hp, consts.bc_x)
flat = prim.reshape(8, g.nens * g.nz * g.ny, g.nx)
lo_f = lo.reshape(8, g.nens * g.nz * g.ny, hp)
hi_f = hi.reshape(8, g.nens * g.nz * g.ny, hp)
# Face-broadcast shapes (rows, nx+1): the lane kernel's hy BlockSpec
# requires (Bt, nx+1), matching euler._direction_fluxes_pallas.
hyr_rows = jnp.broadcast_to(
    hy[0][:, :, None], (g.nens, g.nz, g.ny)).reshape(-1)
hyt_rows = jnp.broadcast_to(
    hy[1][:, :, None], (g.nens, g.nz, g.ny)).reshape(-1)
hyr_f = jnp.broadcast_to(hyr_rows[:, None], (hyr_rows.size, g.nx + 1))
hyt_f = jnp.broadcast_to(hyt_rows[:, None], (hyt_rows.size, g.nx + 1))
flat = jax.device_put(flat)


def sync(x):
    return float(jnp.max(x))


# XLA reference timing for this single direction
def _prim(s_, tr_):
    full_r = s_[0] + hy[0][:, :, None, None]
    return jnp.concatenate([s_[0:1], s_[1:4] / full_r, s_[4:5],
                            tr_ / full_r])


fx = jax.jit(lambda a: dy._direction_fluxes(
    g, consts, hy, _prim(a[0], a[1]),
    _AX_X, g.nx, consts.bc_x, IDU, None))
o = fx((s, tr)); sync(o[0])
t0 = time.perf_counter()
for _ in range(5):
    o = fx((s, tr))
sync(o[0])
print(f"xla x-direction: {(time.perf_counter()-t0)/5*1000:.1f} ms", flush=True)

for bt in (8, 16, 32, 64, 128):
    f = jax.jit(lambda fl, hr, ht, _bt=bt: direction_fluxes_pallas(
        fl, lo_f, hi_f, hr, ht, g.nx, dy.mats, 0.0, IDU, consts.C0,
        consts.gamma, block_rows=_bt))
    try:
        o = f(flat, hyr_f, hyt_f); sync(o[0])
        t0 = time.perf_counter()
        for _ in range(5):
            o = f(flat, hyr_f, hyt_f)
        sync(o[0])
        print(f"pallas Bt={bt:4d}: {(time.perf_counter()-t0)/5*1000:.1f} ms",
              flush=True)
    except Exception as e:
        print(f"pallas Bt={bt}: FAILED {str(e)[:200]}", flush=True)
