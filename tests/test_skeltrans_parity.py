"""Full-model parity of the skeleton transformer against the reference.

Fixture: fixed input + eval output + state_dict of the reference
``SkeletonTransformer`` (embedding_dim=16, n_block=2, head_dim=4, n_heads=2,
14 joints, T=30, 11 classes), generated once from
``skeleton_transformer.py:360-435``. Weights go through the public
torch-interop API (:func:`fall_multimodal_tpu.interop.torch_to_variables`).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from fall_multimodal_tpu.configs import load_config, preset_path
from fall_multimodal_tpu.interop import torch_to_variables
from fall_multimodal_tpu.models import build_model
from fall_multimodal_tpu.models.skeleton_transformer import RelPosMHSA

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "reference_skeltrans.npz")


def test_skeleton_transformer_full_model_matches_reference():
    g = np.load(FIX)
    x_ref = np.asarray(g["x"])                      # (N, C, T, V, M)
    expected = np.asarray(g["out"])
    sd = {k: g[k] for k in g.files if k not in ("x", "out")}

    cfg = load_config(
        preset_path("default"),
        overrides={
            "model.name": "skeleton_transformer",
            "data.num_classes": 11,
            "model.kwargs": {
                "embedding_dim": 16, "n_block": 2, "head_dim": 4, "n_heads": 2,
            },
        },
    )
    variables = torch_to_variables(cfg, sd)         # validates keys + shapes

    model = build_model(cfg)
    # (N, C, T, V, M) -> (N, M, T, V, C)
    x = jnp.asarray(np.transpose(x_ref, (0, 4, 2, 3, 1)))
    ours = np.asarray(model.apply(variables, x, None, train=False))
    np.testing.assert_allclose(ours, expected, atol=3e-5)


def test_factorized_ablation1_full_model_matches_reference():
    """Ablation1 (all-spatial then all-temporal B2T blocks,
    ``skeleton_transformer.py:437-514``) through the round-4 converter —
    fixture generated from the live reference (embedding_dim=16,
    n_block=2, head_dim=4, n_heads=2, 11 classes)."""
    g = np.load(
        os.path.join(os.path.dirname(__file__), "fixtures",
                     "reference_skeltrans_ablation1.npz")
    )
    x_ref = np.asarray(g["x"])                      # (N, C, T, V, M)
    expected = np.asarray(g["out"])
    sd = {k: g[k] for k in g.files if k not in ("x", "out")}

    cfg = load_config(
        preset_path("default"),
        overrides={
            "model.name": "skeleton_transformer_factorized",
            "data.num_classes": 11,
            "model.kwargs": {
                "embedding_dim": 16, "n_block": 2, "head_dim": 4, "n_heads": 2,
            },
        },
    )
    variables = torch_to_variables(cfg, sd)         # validates keys + shapes

    model = build_model(cfg)
    x = jnp.asarray(np.transpose(x_ref, (0, 4, 2, 3, 1)))
    ours = np.asarray(model.apply(variables, x, None, train=False))
    np.testing.assert_allclose(ours, expected, atol=3e-5)


def test_relpos_mhsa_attends_over_second_to_last_axis(rng):
    x = jnp.asarray(rng.normal(size=(2, 1, 5, 14, 16)).astype(np.float32))
    mod = RelPosMHSA(head_dim=4, n_heads=2, seq_len=14)
    v = mod.init(jax.random.key(0), x)
    out = mod.apply(v, x)
    assert out.shape == x.shape
    # permutation along a *leading* axis must commute with attention
    perm = jnp.asarray([3, 1, 4, 0, 2])
    out_perm = mod.apply(v, x[:, :, perm])
    np.testing.assert_allclose(
        np.asarray(out[:, :, perm]), np.asarray(out_perm), atol=1e-5
    )


def test_attn_impl_swap_matches_resident(rng):
    """The two temporal-attention layout variants (resident axis=-3 vs
    reference-style swapaxes) are weight-identical and numerically equal —
    attn_impl is a pure layout/performance knob
    (experiments/transformer_attn_variants.py measures which wins)."""
    from fall_multimodal_tpu.models.skeleton_transformer import (
        SkeletonTransformer,
    )

    x = jnp.asarray(rng.normal(size=(4, 30, 14, 3)).astype(np.float32))
    kw = dict(num_classes=5, embedding_dim=16, n_block=2, head_dim=4,
              n_heads=2)
    m1 = SkeletonTransformer(**kw)
    m2 = SkeletonTransformer(**kw, attn_impl="swap")
    v = m1.init(jax.random.key(0), x, None, train=False)
    o1 = m1.apply(v, x, None, train=False)
    o2 = m2.apply(v, x, None, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
