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


class TestFusedBackboneV2:
    """Whole-backbone single-pallas_call serving kernel (round-2 north
    star): all 7 blocks + data BN + pool + head fused, C=64 stages padded
    to 128 for Mosaic lane legality. Interpret-mode tests (CPU); the real
    v5e numbers live in PARITY.md."""

    def _model_and_vars(self, rng, stages=None):
        import jax

        from fall_multimodal_tpu.models.stgcan import STGCANBackbone

        kw = {"num_classes": 3}
        if stages is not None:
            kw["stages"] = stages
        model = STGCANBackbone(**kw)
        x = jnp.asarray(rng.normal(size=(8, 30, 14, 3)), jnp.float32)
        v = model.init(jax.random.key(0), x[:2], train=False)
        # non-trivial BN stats + perturbed params so folding is exercised
        stats = jax.tree.map(
            lambda a: a + 0.1 * abs(float(rng.normal())), v["batch_stats"]
        )
        params = jax.tree.map(
            lambda a: a + 0.05 * float(rng.normal()), v["params"]
        )
        return model, {"params": params, "batch_stats": stats}, x

    def test_full_backbone_matches_flax(self, rng):
        from fall_multimodal_tpu.ops.pallas.fused_backbone_v2 import (
            fold_backbone,
            fused_backbone_forward,
        )

        model, vv, x = self._model_and_vars(rng)
        ref = model.apply(vv, x, train=False)
        fb = fold_backbone(model, vv)
        got = fused_backbone_forward(x, fb, samples_per_program=4,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_padding_stays_zero_and_batch_tiling(self, rng):
        """Odd batch sizes fall back to a smaller tile; padded channels must
        not leak into logits (they are exactly zero by construction)."""
        from fall_multimodal_tpu.ops.pallas.fused_backbone_v2 import (
            fold_backbone,
            fused_backbone_forward,
        )

        model, vv, x = self._model_and_vars(rng)
        ref = model.apply(vv, x[:6], train=False)
        fb = fold_backbone(model, vv)
        got = fused_backbone_forward(x[:6], fb, samples_per_program=4,
                                     interpret=True)  # 6 % 4 != 0 -> bn=3
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_short_stage_plan(self, rng):
        from fall_multimodal_tpu.ops.pallas.fused_backbone_v2 import (
            fold_backbone,
            fused_backbone_forward,
        )

        stages = ((64, 1, False), (128, 2, True))
        model, vv, x = self._model_and_vars(rng, stages=stages)
        ref = model.apply(vv, x, train=False)
        fb = fold_backbone(model, vv)
        got = fused_backbone_forward(x, fb, samples_per_program=8,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
