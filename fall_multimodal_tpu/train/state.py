"""Train state: one pytree carrying everything a training run mutates.

Replaces the reference's scattered epoch/model/optimizer/scheduler/scaler
checkpoint dict (``main.py:332-341``) with a single structure that threads
through jitted scans and checkpoints atomically via orbax.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray          # scalar int32
    rng: jax.Array             # dropout / DropGraph key, folded per step


def create_train_state(
    model: nn.Module,
    optimizer: optax.GradientTransformation,
    sample_skeleton: jnp.ndarray,
    sample_sensor: jnp.ndarray,
    seed: int = 42,
    weight_init: str = "torch",
) -> TrainState:
    """``weight_init``: "torch" (reference from-scratch init — torch module
    defaults), "init_param" (the reference's musa_model.py:408-420 helper),
    or "flax" (lecun_normal defaults)."""
    init_key, run_key = jax.random.split(jax.random.key(seed))
    # jit the init: eager linen init dispatches every parameter op
    # individually (minutes over a remote-TPU tunnel); one compiled program
    # takes seconds.
    init_fn = jax.jit(lambda k, s, sn: model.init(k, s, sn, train=False))
    variables = init_fn(init_key, sample_skeleton, sample_sensor)
    params = variables["params"]
    if weight_init != "flax":
        from fall_multimodal_tpu.models.init import reinitialize

        params = jax.jit(
            lambda p: reinitialize(p, seed=seed, scheme=weight_init)
        )(params)
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=run_key,
    )


def param_count(state: TrainState, exclude: str = "") -> int:
    """Trainable-parameter count; ``exclude`` skips subtrees whose dotted
    path contains the substring (the reference's count_params excludes
    ``fc``, ``musa_model.py:16-18``)."""
    if not exclude:
        return sum(int(x.size) for x in jax.tree.leaves(state.params))
    from fall_multimodal_tpu.utils.profiling import tree_path_str

    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    total = 0
    for path, leaf in flat:
        if exclude not in tree_path_str(path):
            total += int(leaf.size)
    return total
