"""Torch-matching weight initialization.

The reference trains every model from torch module *defaults* — its
``init_param`` helper (``Multimodal_Fall3/model/musa_model.py:408-420``,
kaiming_normal fan_out/leaky_relu for convs, normal(std=1e-3) for linears)
is defined but never called anywhere in the tree. From-scratch
training-trajectory parity therefore requires torch defaults:

- ``nn.Conv*`` / ``nn.Linear``: ``kaiming_uniform_(a=sqrt(5))`` on the
  weight, which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with the weight's fan_in.
- ``nn.LSTM``: every weight and bias U(-1/sqrt(H), 1/sqrt(H)).
- Norm layers: scale 1, bias 0 (flax already matches).

Flax's own defaults are lecun_normal kernels and zero biases — a different
from-scratch trajectory. This module re-draws an initialized params pytree
under a named scheme, keyed per-leaf so the draw is order-independent:

- ``"torch"``  — torch module defaults (the reference's actual init).
- ``"init_param"`` — the reference's (dead-code) helper, for ablations.
- ``"flax"``   — leave flax defaults untouched.

Custom ``self.param`` leaves (edge-importance masks, relative-position
tables, TARGCN embedding pools) keep their construction-time initializers,
which were already matched to the reference per family.
"""

from __future__ import annotations

import zlib
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SCHEMES = ("torch", "init_param", "flax")

# flax Dense names inside LSTMCellTorch (models/layers.py): torch nn.LSTM
# initializes these U(-1/sqrt(H), 1/sqrt(H)) regardless of fan-in.
_LSTM_DENSE_NAMES = {"ih", "hh"}


def _path_names(path) -> Tuple[str, ...]:
    return tuple(
        str(getattr(p, "key", getattr(p, "name", p))) for p in path
    )


def _leaf_key(base: jax.Array, names: Tuple[str, ...]) -> jax.Array:
    return jax.random.fold_in(base, zlib.crc32("/".join(names).encode()))


def _conv_fans(kernel_shape) -> Tuple[int, int]:
    """(fan_in, fan_out) of a flax conv/dense kernel.

    Flax conv kernels are (spatial..., in/groups, out); torch weights are
    (out, in/groups, spatial...). Both give fan_in = in/groups * prod(k)
    and fan_out = out * prod(k) — identical numbers, so torch's
    ``_calculate_fan_in_and_fan_out`` is reproduced exactly.
    """
    receptive = int(np.prod(kernel_shape[:-2])) if len(kernel_shape) > 2 else 1
    fan_in = int(kernel_shape[-2]) * receptive
    fan_out = int(kernel_shape[-1]) * receptive
    return fan_in, fan_out


def reinitialize(params: Any, seed: int, scheme: str = "torch") -> Any:
    """Re-draw kernels/biases of an initialized params pytree under a
    torch-matching scheme. Non-kernel leaves (norm scales, custom params)
    are returned unchanged."""
    if scheme not in SCHEMES:
        raise ValueError(f"unknown weight_init scheme {scheme!r}; one of {SCHEMES}")
    if scheme == "flax":
        return params

    base_key = jax.random.key(np.uint32(seed))
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    by_path = {_path_names(path): leaf for path, leaf in flat}

    def new_leaf(names: Tuple[str, ...], leaf):
        name = names[-1]
        parent = names[:-1]
        is_lstm = any(n in _LSTM_DENSE_NAMES for n in parent)

        if name == "kernel":
            key = _leaf_key(base_key, names)
            fan_in, fan_out = _conv_fans(leaf.shape)
            if is_lstm:
                # torch nn.LSTM: U(-1/sqrt(H), 1/sqrt(H)); Dense is (in, 4H)
                bound = 1.0 / np.sqrt(leaf.shape[-1] // 4)
                return jax.random.uniform(
                    key, leaf.shape, leaf.dtype, -bound, bound
                )
            if scheme == "torch":
                # kaiming_uniform_(a=sqrt(5)) == U(-1/sqrt(fan_in), ...)
                bound = 1.0 / np.sqrt(fan_in)
                return jax.random.uniform(
                    key, leaf.shape, leaf.dtype, -bound, bound
                )
            # scheme == "init_param" (musa_model.py:408-420)
            if leaf.ndim >= 3:
                # conv: kaiming_normal_(mode='fan_out',
                # nonlinearity='leaky_relu', a=0) -> std = sqrt(2/fan_out)
                std = np.sqrt(2.0 / fan_out)
                return std * jax.random.normal(key, leaf.shape, leaf.dtype)
            # linear: normal_(std=0.001)
            return 0.001 * jax.random.normal(key, leaf.shape, leaf.dtype)

        if name == "bias":
            kernel = by_path.get(parent + ("kernel",))
            if kernel is None:
                return leaf  # norm-layer bias: keep zeros
            key = _leaf_key(base_key, names)
            if is_lstm:
                bound = 1.0 / np.sqrt(kernel.shape[-1] // 4)
                return jax.random.uniform(
                    key, leaf.shape, leaf.dtype, -bound, bound
                )
            if scheme == "torch":
                fan_in, _ = _conv_fans(kernel.shape)
                bound = 1.0 / np.sqrt(fan_in)
                return jax.random.uniform(
                    key, leaf.shape, leaf.dtype, -bound, bound
                )
            return jnp.zeros_like(leaf)  # init_param: constant_(bias, 0)

        return leaf

    new_flat = [new_leaf(_path_names(path), leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, new_flat)
