"""Offline surrogate training: Kessler single-cell MLP.

JAX/optax port of the reference's Keras notebook
(experiments/supercell_kessler_surrogate/jupyter_notebooks/
kessler_singlecell_train_example.ipynb): Dense(10, RandomUniform init) ->
LeakyReLU(0.1) -> Dense(4); loss MSE, optimizer Nadam, 10 epochs, batch
1024, validation split 0.2; min-max normalization of the 5 single-cell
inputs [T, rho_d, rho_v, rho_c, rho_p] and 4 outputs
[T, rho_v, rho_c, rho_p].

Artifacts: weights .npz (miniweatherml_tpu.ml.mlp format) plus the
reference's min/max scaling text tables so the trained model plugs into the
surrogate micro exactly like a ponni/Keras one.

Usage: python -m miniweatherml_tpu.ml.train <dataset.nc> [out_prefix]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .mlp import MLP, init_mlp, save_mlp, save_scaling
from .surrogate_data import load_dataset

__all__ = ["minmax_table", "normalize", "denormalize", "train_mlp", "main"]


def minmax_table(arr: np.ndarray) -> np.ndarray:
    """(N, nvars) -> (nvars, 2) [min, max] table; degenerate ranges widened
    so (max - min) never divides by zero."""
    lo = arr.min(axis=0).astype(np.float64)
    hi = arr.max(axis=0).astype(np.float64)
    same = hi - lo < 1e-30
    hi = np.where(same, lo + 1.0, hi)
    return np.stack([lo, hi], axis=1)


def normalize(x, table):
    t = jnp.asarray(table, x.dtype)
    return (x - t[:, 0]) / (t[:, 1] - t[:, 0])


def denormalize(y, table):
    t = jnp.asarray(table, y.dtype)
    return y * (t[:, 1] - t[:, 0]) + t[:, 0]


def train_mlp(inputs: np.ndarray, outputs: np.ndarray,
              hidden: int = 10, epochs: int = 10, batch: int = 1024,
              val_split: float = 0.2, lr: float = 1e-3, seed: int = 0,
              verbose: bool = True):
    """Returns (model, scl_in (5,2), scl_out (4,2), history).

    ``inputs`` may be (N,5,2) stencil rows (column 0 used, like the
    single-cell notebook) or already (N,5).
    """
    if inputs.ndim == 3:
        inputs = inputs[:, :, 0]
    x = np.asarray(inputs, np.float32)
    y = np.asarray(outputs, np.float32)

    scl_in = minmax_table(x)
    scl_out = minmax_table(y)
    xn = np.asarray(normalize(jnp.asarray(x), scl_in))
    yn = np.asarray(normalize(jnp.asarray(y), scl_out))

    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(xn))
    xn, yn = xn[perm], yn[perm]
    n_val = int(len(xn) * val_split)
    x_tr, y_tr = jnp.asarray(xn[n_val:]), jnp.asarray(yn[n_val:])
    x_va, y_va = jnp.asarray(xn[:n_val]), jnp.asarray(yn[:n_val])

    model = init_mlp((x.shape[1], hidden, y.shape[1]),
                     jax.random.PRNGKey(seed))
    opt = optax.nadam(lr)
    opt_state = opt.init(model)

    @jax.jit
    def step(model, opt_state, xb, yb):
        def loss_fn(m):
            return jnp.mean((m(xb) - yb) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(model)
        updates, opt_state = opt.update(grads, opt_state, model)
        return optax.apply_updates(model, updates), opt_state, loss

    @jax.jit
    def val_loss(model):
        if len(x_va) == 0:
            return jnp.float32(0.0)
        return jnp.mean((model(x_va) - y_va) ** 2)

    history = []
    n = len(x_tr)
    for epoch in range(epochs):
        perm = np.random.default_rng(seed + 1 + epoch).permutation(n)
        losses = []
        for s in range(0, n, batch):
            idx = perm[s:s + batch]
            model, opt_state, loss = step(model, opt_state, x_tr[idx], y_tr[idx])
            losses.append(float(loss))
        vl = float(val_loss(model))
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        "val_loss": vl})
        if verbose:
            print(f"epoch {epoch}: loss={np.mean(losses):.6e} val_loss={vl:.6e}")
    return model, scl_in, scl_out, history


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: train <dataset.nc|.npz> [out_prefix]")
    prefix = argv[1] if len(argv) > 1 else "supercell_kessler_surrogate"
    inputs, outputs, meta = load_dataset(argv[0])
    print(f"dataset: {len(inputs)} samples, meta={meta}")
    model, scl_in, scl_out, history = train_mlp(inputs, outputs)
    save_mlp(prefix + "_weights.npz", model)
    save_scaling(prefix + "_input_scaling.txt", scl_in)
    save_scaling(prefix + "_output_scaling.txt", scl_out)
    print(f"wrote {prefix}_weights.npz / _input_scaling.txt / _output_scaling.txt")
    return model, scl_in, scl_out, history


if __name__ == "__main__":
    main()
