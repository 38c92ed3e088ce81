"""Full-model parity of the skeleton transformer against the reference.

Fixture: fixed input + eval output + state_dict of the reference
``SkeletonTransformer`` (embedding_dim=16, n_block=2, head_dim=4, n_heads=2,
14 joints, T=30, 11 classes), generated once from
``skeleton_transformer.py:360-435``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

from fall_multimodal_tpu.models.skeleton_transformer import (
    RelPosMHSA,
    SkeletonTransformer,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "reference_skeltrans.npz")


def _dense(w):
    w = np.asarray(w)
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return w.T


def test_skeleton_transformer_full_model_matches_reference():
    g = np.load(FIX)
    x_ref = np.asarray(g["x"])                      # (N, C, T, V, M)
    expected = np.asarray(g["out"])

    model = SkeletonTransformer(
        num_classes=11, n_joints=14, seq_len=30,
        embedding_dim=16, n_block=2, head_dim=4, n_heads=2,
    )
    # (N, C, T, V, M) -> (N, M, T, V, C)
    x = jnp.asarray(np.transpose(x_ref, (0, 4, 2, 3, 1)))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, None, train=False,
    )

    p, bs = {}, {}

    def put_dense(flax_path, torch_name):
        p[flax_path + ("kernel",)] = _dense(g[torch_name + ".weight"])
        p[flax_path + ("bias",)] = np.asarray(g[torch_name + ".bias"])

    put_dense(("embed1",), "embedding.0")
    put_dense(("embed2",), "embedding.2")
    put_dense(("head",), "fcn.0")

    for i in range(2):
        blk = (f"block{i}",)
        tb = f"extractor.{i}"
        for ours, theirs in [
            ("spatial_attn", "multi_head_spatial_self_attention"),
            ("temporal_attn", "multi_head_temporal_self_attention"),
        ]:
            put_dense(blk + (ours, "w_qkv"), f"{tb}.{theirs}.w_qkv")
            put_dense(blk + (ours, "merge"), f"{tb}.{theirs}.merge")
            p[blk + (ours, "rel_pos_bias")] = np.asarray(
                g[f"{tb}.{theirs}.relative_position_bias_table"]
            )
        for n in ("norm1", "norm2", "norm3"):
            p[blk + (n, "scale")] = np.asarray(g[f"{tb}.{n}.weight"])
            p[blk + (n, "bias")] = np.asarray(g[f"{tb}.{n}.bias"])
            bs[blk + (n, "mean")] = np.asarray(g[f"{tb}.{n}.running_mean"])
            bs[blk + (n, "var")] = np.asarray(g[f"{tb}.{n}.running_var"])
        put_dense(blk + ("ffn", "Dense_0"), f"{tb}.feed_forward_network.0")
        put_dense(blk + ("ffn", "Dense_1"), f"{tb}.feed_forward_network.2")

    flat = flatten_dict(variables["params"])
    assert set(flat) == set(p), (
        sorted(set(flat) - set(p))[:6],
        sorted(set(p) - set(flat))[:6],
    )
    new_vars = {
        "params": unflatten_dict({k: jnp.asarray(v) for k, v in p.items()}),
        "batch_stats": unflatten_dict({k: jnp.asarray(v) for k, v in bs.items()}),
    }
    ours = np.asarray(model.apply(new_vars, x, None, train=False))
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
