"""Inline MLP inference for microphysics surrogates.

TPU-native replacement for the reference's ponni C++ inference runtime
(external/ponni, used by experiments/supercell_kessler_surrogate/
custom_modules/microphysics_kessler_ponni.h:103-111): instead of a separate
layer-graph interpreter, the surrogate is a plain pytree of weights applied
with jnp matmuls *inside* the jitted physics step, so XLA fuses
normalization + matvec + bias + LeakyReLU + denormalization into the
surrounding kernels and the MXU does the batched matmuls.

Also provides:
  * Keras-HDF5 weight loading (the reference loads "/dense_6/dense_6
    kernel:0"-style datasets, microphysics_kessler_ponni.h:103-107),
  * the reference's whitespace text min-max scaling table format
    (microphysics_kessler_ponni.h:113-135),
  * .npz round-trip for models trained with miniweatherml_tpu.ml.train.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "MLP", "leaky_relu", "init_mlp", "save_mlp", "load_mlp",
    "load_keras_h5", "load_scaling", "save_scaling",
]


def leaky_relu(x, negative_slope: float = 0.1):
    """LeakyReLU with the reference's slope 0.1
    (microphysics_kessler_ponni.h:105, training notebook)."""
    return jnp.where(x >= 0, x, negative_slope * x)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MLP:
    """Dense MLP: x @ W + b per layer, LeakyReLU(0.1) between layers.

    The reference architecture is 5 -> 10 -> 4
    (jupyter_notebooks/kessler_singlecell_train_example.ipynb).
    """

    weights: list  # [(W, b), ...]

    def tree_flatten(self):
        return tuple(w for wb in self.weights for w in wb), len(self.weights)

    @classmethod
    def tree_unflatten(cls, n, leaves):
        return cls(weights=[(leaves[2 * i], leaves[2 * i + 1]) for i in range(n)])

    def __call__(self, x):
        """Forward: x (..., n_in) -> (..., n_out)."""
        for i, (W, b) in enumerate(self.weights):
            x = x @ W + b
            if i + 1 < len(self.weights):
                x = leaky_relu(x)
        return x

    def validate(self) -> None:
        """Check layer shape compatibility (the ponni model.validate()
        analog, microphysics_kessler_ponni.h:110); raises on mismatch."""
        for i, (W, b) in enumerate(self.weights):
            if W.ndim != 2 or b.shape != (W.shape[1],):
                raise ValueError(f"layer {i}: kernel {W.shape} / bias "
                                 f"{b.shape} mismatch")
            if i and self.weights[i - 1][0].shape[1] != W.shape[0]:
                raise ValueError(
                    f"layer {i-1}->{i}: {self.weights[i-1][0].shape[1]} "
                    f"outputs vs {W.shape[0]} inputs")

    def describe(self) -> str:
        """Human-readable layer summary (the ponni model.print() analog)."""
        lines = []
        for i, (W, b) in enumerate(self.weights):
            act = " + LeakyReLU(0.1)" if i + 1 < len(self.weights) else ""
            lines.append(f"layer {i}: Dense {W.shape[0]} -> {W.shape[1]}{act}")
        return "\n".join(lines)


def init_mlp(sizes, key, scale: float = 0.05, dtype=jnp.float32) -> MLP:
    """RandomUniform(-scale, scale) init, matching the Keras notebook's
    kernel_initializer=RandomUniform."""
    ws = []
    for n_in, n_out in zip(sizes[:-1], sizes[1:]):
        key, k1, k2 = jax.random.split(key, 3)
        W = jax.random.uniform(k1, (n_in, n_out), dtype, -scale, scale)
        b = jax.random.uniform(k2, (n_out,), dtype, -scale, scale)
        ws.append((W, b))
    return MLP(ws)


def save_mlp(path: str, model: MLP) -> None:
    arrays = {}
    for i, (W, b) in enumerate(model.weights):
        arrays[f"W{i}"] = np.asarray(W)
        arrays[f"b{i}"] = np.asarray(b)
    np.savez(path, nlayers=len(model.weights), **arrays)


def load_mlp(path: str, dtype=jnp.float32) -> MLP:
    with np.load(path) as z:
        n = int(z["nlayers"])
        ws = [(jnp.asarray(z[f"W{i}"], dtype), jnp.asarray(z[f"b{i}"], dtype))
              for i in range(n)]
    return MLP(ws)


def load_keras_h5(path: str, layers=("dense_6", "dense_7"),
                  dtype=jnp.float32) -> MLP:
    """Load a Keras-exported HDF5 weight file with the reference's layout
    ("/<layer>/<layer>/kernel:0" and "bias:0",
    microphysics_kessler_ponni.h:103-107)."""
    import h5py

    ws = []
    with h5py.File(path, "r") as f:
        for layer in layers:
            g = f[layer][layer]
            W = jnp.asarray(np.array(g["kernel:0"]), dtype)
            b = jnp.asarray(np.array(g["bias:0"]), dtype)
            ws.append((W, b))
    return MLP(ws)


def load_scaling(path: str, nvars: int, dtype=jnp.float32) -> jnp.ndarray:
    """Read an (nvars, 2) [min, max] whitespace table
    (reference microphysics_kessler_ponni.h:118-135)."""
    vals = np.loadtxt(path, dtype=np.float64).reshape(nvars, 2)
    return jnp.asarray(vals, dtype)


def save_scaling(path: str, table) -> None:
    np.savetxt(path, np.asarray(table, np.float64), fmt="%.17g")
