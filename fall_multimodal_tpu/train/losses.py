"""Losses with the reference's quirky semantics as explicit switches.

The reference trains with ``torch.nn.CrossEntropyLoss`` on *soft* targets
(score-weighted smoothed labels from data prep, ``har_create4.py:114-123``),
and the notebook-canonical GSTCAN additionally applies ``F.softmax`` in the
model forward *before* that loss (``GSTCAN_UR_conv.ipynb:1``) — i.e. the loss
it actually minimizes is CE(softmax(logits), soft_target). For parity both
behaviors are reproducible here; ``softmax_before_ce`` corresponds to the
model-config flag ``softmax_output``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot_if_needed(target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    if target.ndim == 1:
        return jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    return target.astype(jnp.float32)


def smooth_labels(target: jnp.ndarray, smoothing: float) -> jnp.ndarray:
    """Uniform label smoothing: (1-eps) * y + eps / C."""
    if smoothing <= 0.0:
        return target
    num_classes = target.shape[-1]
    return target * (1.0 - smoothing) + smoothing / num_classes


def cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    label_smoothing: float = 0.0,
    softmax_before_ce: bool = False,
) -> jnp.ndarray:
    """Mean soft-target cross entropy.

    With ``softmax_before_ce`` the logits are first pushed through a softmax
    and the (second) log-softmax is applied to the resulting probabilities —
    exactly what CrossEntropyLoss-on-softmax-outputs computes in the
    reference notebooks. Gradients stay well-defined; convergence behavior
    matches the reference's.
    """
    target = one_hot_if_needed(target, logits.shape[-1]).astype(logits.dtype)
    target = smooth_labels(target, label_smoothing)
    if softmax_before_ce:
        logits = jax.nn.softmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # Torch CE with soft targets: mean over batch of -sum(target * logp).
    return -(target * logp).sum(axis=-1).mean()
