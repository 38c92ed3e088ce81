"""Numerical parity of the TARGCN building blocks against the reference.

Fixtures in ``tests/fixtures/reference_targcn.npz`` hold fixed inputs,
weights, and outputs generated once from the reference ``EmbGCN.py`` /
``GRU.py`` / ``TA.py`` modules (CPU, eval mode).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

from fall_multimodal_tpu.models.targcn import (
    EmbGCN,
    GraphGRUCell,
    TARGCN,
    TemporalTransformLayer,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "reference_targcn.npz")


def _load():
    return np.load(FIX)


def _embgcn_params(g, prefix=""):
    """Map reference EmbGCN weights onto our flax param tree."""
    return {
        ("weights_pool",): np.asarray(g[prefix + "weights_pool"]),
        ("bias_pool",): np.asarray(g[prefix + "bias_pool"]),
        ("static_linear", "kernel"): np.asarray(g[prefix + "linear_w"]).T
        if prefix + "linear_w" in g
        else np.asarray(g[prefix + "linear.weight"]).T,
        ("static_linear", "bias"): np.asarray(g[prefix + "linear_b"])
        if prefix + "linear_b" in g
        else np.asarray(g[prefix + "linear.bias"]),
    }


def test_embgcn_matches_reference():
    g = _load()
    adj = np.asarray(g["adj"])
    mod = EmbGCN(16, static_adj=adj)
    x = jnp.asarray(g["x"])
    emb = jnp.asarray(g["node_emb"])
    variables = mod.init(jax.random.key(0), x, emb)
    ported = unflatten_dict(
        {k: jnp.asarray(v) for k, v in _embgcn_params(g).items()}
    )
    ours = np.asarray(mod.apply({"params": ported}, x, emb))
    np.testing.assert_allclose(ours, g["embgcn_out"], atol=2e-5)


def test_graph_gru_cell_matches_reference():
    g = _load()
    adj = np.asarray(g["adj"])
    cell = GraphGRUCell(16, static_adj=adj)
    x = jnp.asarray(g["x"])
    h0 = jnp.asarray(g["h0"])
    emb = jnp.asarray(g["node_emb"])
    variables = cell.init(jax.random.key(0), x, h0, emb)

    ported = {}
    for ours_name, ref_name in [("gate", "gate"), ("update", "update")]:
        ported[(ours_name, "weights_pool")] = np.asarray(
            g[f"gru.{ref_name}.weights_pool"]
        )
        ported[(ours_name, "bias_pool")] = np.asarray(g[f"gru.{ref_name}.bias_pool"])
        ported[(ours_name, "static_linear", "kernel")] = np.asarray(
            g[f"gru.{ref_name}.linear.weight"]
        ).T
        ported[(ours_name, "static_linear", "bias")] = np.asarray(
            g[f"gru.{ref_name}.linear.bias"]
        )
    flat = flatten_dict(variables["params"])
    assert set(flat) == set(ported), (
        sorted(set(flat) - set(ported))[:5],
        sorted(set(ported) - set(flat))[:5],
    )
    ours = np.asarray(
        cell.apply(
            {"params": unflatten_dict({k: jnp.asarray(v) for k, v in ported.items()})},
            x,
            h0,
            emb,
        )
    )
    np.testing.assert_allclose(ours, g["gru_out"], atol=2e-5)


def test_temporal_transform_layer_matches_reference():
    g = _load()
    x = jnp.asarray(g["ta_x"])  # (2, 30, 14, 16)
    mod = TemporalTransformLayer(16, seq_len=30)
    variables = mod.init(jax.random.key(0), x)

    def conv_w(name):  # torch (T_out, T_in, 1, 3) -> flax (1, 3, T_in, T_out)
        return np.transpose(np.asarray(g[f"ta.{name}.weight"]), (2, 3, 1, 0))

    ported = {
        ("vff", "kernel"): np.asarray(g["ta.vff.weight"]).T,
        ("vff", "bias"): np.asarray(g["ta.vff.bias"]),
        ("conv_q", "kernel"): conv_w("conv1"),
        ("conv_q", "bias"): np.asarray(g["ta.conv1.bias"]),
        ("conv_k", "kernel"): conv_w("conv2"),
        ("conv_k", "bias"): np.asarray(g["ta.conv2.bias"]),
        ("ln", "scale"): np.asarray(g["ta.ln.weight"]),
        ("ln", "bias"): np.asarray(g["ta.ln.bias"]),
        ("lnff", "scale"): np.asarray(g["ta.lnff.weight"]),
        ("lnff", "bias"): np.asarray(g["ta.lnff.bias"]),
        ("ff1", "kernel"): np.asarray(g["ta.ff.0.weight"]).T,
        ("ff1", "bias"): np.asarray(g["ta.ff.0.bias"]),
        ("ff2", "kernel"): np.asarray(g["ta.ff.2.weight"]).T,
        ("ff2", "bias"): np.asarray(g["ta.ff.2.bias"]),
    }
    flat = flatten_dict(variables["params"])
    assert set(flat) == set(ported), (
        sorted(set(flat) - set(ported))[:5],
        sorted(set(ported) - set(flat))[:5],
    )
    ours = np.asarray(
        mod.apply(
            {"params": unflatten_dict({k: jnp.asarray(v) for k, v in ported.items()})},
            x,
        )
    )
    np.testing.assert_allclose(ours, g["ta_out"], atol=3e-5)


def test_targcn_end_to_end_shapes():
    model = TARGCN(num_classes=5, num_nodes=14, rnn_units=8, output_dim=8,
                   embed_dim=4, num_layers=2)
    skel = jnp.ones((2, 30, 14, 3))
    v = model.init(jax.random.key(0), skel, None, train=False)
    out = model.apply(v, skel, None, train=False)
    assert out.shape == (2, 5)
    assert bool(jnp.isfinite(out).all())


def test_targcn_fast_path_matches_module_path():
    """The hoisted recurrence (``_FastGRULayer``) must be numerically
    equivalent to the reference-shaped module path (``nn.scan`` over
    ``GraphGRUCell``) on the SAME parameters — the trees are identical by
    construction, so one init serves both."""
    key = jax.random.key(7)
    skel = jax.random.normal(key, (3, 30, 14, 3))
    kwargs = dict(num_classes=5, num_nodes=14, rnn_units=8, output_dim=8,
                  embed_dim=4, num_layers=2)
    fast = TARGCN(fast=True, **kwargs)
    slow = TARGCN(fast=False, **kwargs)
    variables = fast.init(jax.random.key(0), skel, None, train=False)
    v_slow = slow.init(jax.random.key(0), skel, None, train=False)
    assert jax.tree.map(lambda a: a.shape, variables) == jax.tree.map(
        lambda a: a.shape, v_slow
    )
    # The two paths differ only in fp32 summation order (verified 2.7e-13 in
    # f64), but at the normal(1.0) pool init this family's recurrence
    # chaotically amplifies that noise (see the lockstep-harness pin-scale
    # scan in PARITY.md) — compare at a well-conditioned parameter scale.
    scaled = jax.tree.map(lambda a: a * 0.05, variables)
    out_slow = slow.apply(scaled, skel, None, train=False)
    for precompute_x in (False, True, "auto"):
        fast_px = TARGCN(fast=True, precompute_x=precompute_x, **kwargs)
        out_fast = fast_px.apply(scaled, skel, None, train=False)
        np.testing.assert_allclose(
            np.asarray(out_fast), np.asarray(out_slow), atol=2e-6,
            err_msg=f"precompute_x={precompute_x}",
        )
    # identical init draws too: param RNG folds over identical scope paths
    for (ka, a), (kb, b) in zip(
        sorted(flatten_dict(variables["params"]).items()),
        sorted(flatten_dict(v_slow["params"]).items()),
    ):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_targcn_full_model_matches_reference():
    """Complete TARGCN (2-layer graph-GRU encoder -> TA transformer ->
    last-6 conv predictor -> pooled head) with the reference state_dict
    converted through the public torch-interop API; fixture from TRAGCN.py
    run with adj=None (the only path the reference ever exercised)."""
    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.interop import torch_to_variables
    from fall_multimodal_tpu.models import build_model

    g = np.load(os.path.join(os.path.dirname(FIX), "reference_targcn_full.npz"))
    x = jnp.asarray(g["x"])                 # (B, T, N, C) — same layout as ours
    expected = np.asarray(g["out"])
    sd = {k: g[k] for k in g.files if k not in ("x", "out")}

    cfg = load_config(
        preset_path("default"),
        overrides={
            "model.name": "targcn",
            "data.num_classes": 11,
            "model.kwargs": {
                "rnn_units": 8, "output_dim": 8, "horizon": 30,
                "num_layers": 2, "embed_dim": 4,
            },
        },
    )
    variables = torch_to_variables(cfg, sd)     # validates keys + shapes
    ours = np.asarray(
        build_model(cfg).apply(variables, x, None, train=False)
    )
    np.testing.assert_allclose(ours, expected, atol=5e-5)
