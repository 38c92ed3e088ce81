"""Fused STGCAN-block Pallas kernel: interpret-mode parity vs the flax path.

On CPU the kernel runs via the Pallas interpreter; the real-TPU timing
comparison lives in ``ops/pallas/bench_kernels.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fall_multimodal_tpu.graphs import build_adjacency
from fall_multimodal_tpu.models.stgcan import STGCANBlock
from fall_multimodal_tpu.ops.pallas.stgcan_block import (
    fold_bn,
    fold_block_params,
    fused_stgcan_block,
)


@pytest.mark.parametrize(
    "cin,cout,stride,residual",
    [
        (64, 64, 1, True),     # identity residual
        (64, 128, 2, True),    # projection residual + temporal stride
        (3, 64, 1, False),     # first block: no residual
    ],
)
def test_fused_block_matches_flax_eval(rng, cin, cout, stride, residual):
    x = jnp.asarray(rng.normal(size=(8, 30, 14, cin)).astype(np.float32))
    A = jnp.asarray(build_adjacency("coco_cut", "spatial"), jnp.float32)
    block = STGCANBlock(features=cout, stride=stride, residual=residual)
    variables = block.init(jax.random.key(0), x, A, train=True)
    # non-trivial BN statistics
    bs = jax.tree.map(
        lambda a: a + 0.25 * abs(float(rng.normal())), variables["batch_stats"]
    )
    variables = {"params": variables["params"], "batch_stats": bs}

    ref = block.apply(variables, x, A, train=False)
    folded, rmode = fold_block_params(
        variables["params"], variables["batch_stats"], A
    )
    if not residual:
        rmode = "none"
    ours = fused_stgcan_block(
        x, folded, stride=stride, residual_mode=rmode,
        samples_per_program=4, interpret=True,
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_fold_bn_affine_identity(rng):
    x = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=32).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=32).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=32).astype(np.float32))
    var = jnp.asarray(np.abs(rng.normal(size=32)).astype(np.float32)) + 0.5
    s, t = fold_bn(scale, bias, mean, var)
    folded = x * s + t
    direct = (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(np.asarray(folded), np.asarray(direct), atol=1e-5)


def test_samples_per_program_divisibility(rng):
    # N=6 with requested bn=4 must fall back to a divisor (2) and still match
    x = jnp.asarray(rng.normal(size=(6, 30, 14, 16)).astype(np.float32))
    A = jnp.asarray(build_adjacency("coco_cut", "spatial"), jnp.float32)
    block = STGCANBlock(features=16, stride=1, residual=True)
    variables = block.init(jax.random.key(1), x, A, train=True)
    ref = block.apply(variables, x, A, train=False)
    folded, rmode = fold_block_params(variables["params"], variables["batch_stats"], A)
    ours = fused_stgcan_block(
        x, folded, stride=1, residual_mode=rmode,
        samples_per_program=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_fused_backbone_matches_flax(rng):
    """Full folded backbone (XLA twins + interpret-mode Pallas for deep
    blocks) reproduces the flax eval forward."""
    from fall_multimodal_tpu.models.stgcan import STGCANBackbone
    from fall_multimodal_tpu.ops.pallas.fused_backbone import FusedBackbone

    stages = ((16, 1, False), (16, 1, True), (32, 2, True))
    backbone = STGCANBackbone(stages=stages, num_classes=5)
    x = jnp.asarray(rng.normal(size=(4, 30, 14, 3)).astype(np.float32))
    variables = backbone.init(jax.random.key(0), x, train=True)
    ref = np.asarray(backbone.apply(variables, x, train=False))

    fused = FusedBackbone(backbone, variables, use_pallas=True,
                          min_pallas_channels=32, interpret=True)
    ours = np.asarray(fused(x))
    np.testing.assert_allclose(ours, ref, atol=3e-5)

    # XLA-only path must agree too
    fused_xla = FusedBackbone(backbone, variables, use_pallas=False)
    np.testing.assert_allclose(np.asarray(fused_xla(x)), ref, atol=3e-5)
