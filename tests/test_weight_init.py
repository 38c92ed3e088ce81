"""Torch-matching from-scratch initialization (VERDICT r1 item 2).

The reference trains from torch module defaults (its init_param helper,
musa_model.py:408-420, is never called). These tests pin our re-drawn
distributions to torch's own, computed from live torch modules.
"""

import jax
import numpy as np
import pytest
import torch

from fall_multimodal_tpu.configs import load_config, preset_path
from fall_multimodal_tpu.models import build_model
from fall_multimodal_tpu.models.init import _conv_fans, reinitialize
from fall_multimodal_tpu.train import build_optimizer, create_train_state


def _state(weight_init, name="bilstm", **over):
    base = {"data.num_classes": 3}
    base.update(over)
    cfg = load_config(preset_path(name), overrides=base)
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    skel = np.zeros((2, 30, 14, 3), np.float32)
    sensor = np.zeros((2, 30, 15), np.float32)
    return create_train_state(model, opt, skel, sensor, seed=0,
                              weight_init=weight_init)


def _flat(params):
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    return {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(leaf)
        for path, leaf in flat
    }


@pytest.mark.parametrize(
    "shape",
    [(9, 1, 16, 32), (5, 4, 16), (64, 11)],  # conv2d HWIO, conv1d KIO, dense
)
def test_conv_fans_match_torch(shape):
    """fan_in/fan_out must equal torch's _calculate_fan_in_and_fan_out on
    the equivalent torch weight layout (out, in, spatial...)."""
    if len(shape) == 2:
        w = torch.empty(shape[1], shape[0])
    else:
        spatial, cin, cout = shape[:-2], shape[-2], shape[-1]
        w = torch.empty(cout, cin, *spatial)
    t_in, t_out = torch.nn.init._calculate_fan_in_and_fan_out(w)
    assert _conv_fans(shape) == (t_in, t_out)


def test_torch_scheme_matches_torch_conv_default_distribution():
    """torch Conv2d default: kaiming_uniform_(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)); same bound for the bias."""
    params = {"conv": {"kernel": np.zeros((9, 1, 16, 32), np.float32),
                       "bias": np.zeros((32,), np.float32)}}
    out = _flat(reinitialize(params, seed=0, scheme="torch"))
    bound = 1.0 / np.sqrt(9 * 1 * 16)
    k = out["conv/kernel"]
    assert np.abs(k).max() <= bound
    # uniform(-b, b) std = b/sqrt(3); 4608 samples -> ~3% tolerance
    assert np.std(k) == pytest.approx(bound / np.sqrt(3), rel=0.05)
    assert np.abs(np.mean(k)) < bound / 10
    b = out["conv/bias"]
    assert np.abs(b).max() <= bound and np.std(b) > 0

    # cross-check bound against a live torch module's observed extremes
    tw = torch.nn.Conv2d(16, 32, (9, 1)).weight.detach().numpy()
    assert np.abs(tw).max() <= bound
    assert np.std(tw) == pytest.approx(np.std(k), rel=0.1)


def test_torch_scheme_lstm_bound():
    """torch nn.LSTM: every weight/bias U(-1/sqrt(H), 1/sqrt(H))."""
    H = 64
    params = {"fwd": {"ih": {"kernel": np.zeros((15, 4 * H), np.float32),
                             "bias": np.zeros((4 * H,), np.float32)},
                      "hh": {"kernel": np.zeros((H, 4 * H), np.float32),
                             "bias": np.zeros((4 * H,), np.float32)}}}
    out = _flat(reinitialize(params, seed=0, scheme="torch"))
    bound = 1.0 / np.sqrt(H)
    ref = torch.nn.LSTM(15, H)
    t = ref.weight_ih_l0.detach().numpy()
    assert np.abs(t).max() <= bound
    for name, leaf in out.items():
        assert np.abs(leaf).max() <= bound, name
        assert np.std(leaf) == pytest.approx(bound / np.sqrt(3), rel=0.12), name


def test_init_param_scheme_matches_reference_helper():
    """musa_model.py:408-420: convs kaiming_normal(fan_out, leaky_relu)
    (std = sqrt(2/fan_out)), linears normal(std=1e-3), biases zero."""
    params = {
        "conv": {"kernel": np.zeros((9, 1, 16, 64), np.float32),
                 "bias": np.ones((64,), np.float32)},
        "dense": {"kernel": np.zeros((256, 128), np.float32),
                  "bias": np.ones((128,), np.float32)},
    }
    out = _flat(reinitialize(params, seed=0, scheme="init_param"))
    fan_out = 9 * 1 * 64
    assert np.std(out["conv/kernel"]) == pytest.approx(
        np.sqrt(2.0 / fan_out), rel=0.05
    )
    assert np.std(out["dense/kernel"]) == pytest.approx(1e-3, rel=0.05)
    np.testing.assert_array_equal(out["conv/bias"], 0)
    np.testing.assert_array_equal(out["dense/bias"], 0)

    tw = torch.empty(64, 16, 9, 1)
    torch.nn.init.kaiming_normal_(tw, mode="fan_out", nonlinearity="leaky_relu")
    assert np.std(tw.numpy()) == pytest.approx(np.std(out["conv/kernel"]), rel=0.1)


def test_flax_scheme_is_identity():
    params = {"d": {"kernel": np.full((4, 4), 3.0, np.float32)}}
    out = reinitialize(params, seed=0, scheme="flax")
    np.testing.assert_array_equal(out["d"]["kernel"], params["d"]["kernel"])


def test_norm_layers_and_custom_params_untouched():
    params = {
        "bn": {"scale": np.ones((8,), np.float32),
               "bias": np.zeros((8,), np.float32)},
        "block": {"edge_importance_0": np.ones((3, 14, 14), np.float32)},
    }
    out = _flat(reinitialize(params, seed=0, scheme="torch"))
    np.testing.assert_array_equal(out["bn/scale"], 1)
    np.testing.assert_array_equal(out["bn/bias"], 0)
    np.testing.assert_array_equal(out["block/edge_importance_0"], 1)


def test_create_train_state_applies_torch_init():
    """Integration: weight_init='torch' draws non-zero biases (flax default
    is zeros) and bounded kernels; 'flax' keeps zero biases. Model still
    trains (zoo sweep covers that separately)."""
    torch_params = _flat(_state("torch").params)
    flax_params = _flat(_state("flax").params)
    dense_biases = [v for k, v in torch_params.items()
                    if k.endswith("bias") and np.std(v) > 0]
    assert dense_biases, "torch init should draw uniform dense/conv biases"
    for k, v in flax_params.items():
        if k.endswith("/bias"):
            np.testing.assert_array_equal(v, 0)


def test_reinit_is_deterministic_and_order_independent():
    params = {"a": {"kernel": np.zeros((8, 8), np.float32)},
              "b": {"kernel": np.zeros((8, 8), np.float32)}}
    out1 = _flat(reinitialize(params, seed=7, scheme="torch"))
    # same leaf path -> same draw, regardless of siblings
    out2 = _flat(reinitialize({"a": params["a"]}, seed=7, scheme="torch"))
    np.testing.assert_array_equal(out1["a/kernel"], out2["a/kernel"])
    assert not np.array_equal(out1["a/kernel"], out1["b/kernel"])
