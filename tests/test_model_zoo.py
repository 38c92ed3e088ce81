"""Model-zoo sweep: every registry entry builds, runs forward in eval and
train mode, and emits (N, num_classes) finite logits."""

import jax
import jax.numpy as jnp
import pytest

from fall_multimodal_tpu.configs import load_config, preset_path
from fall_multimodal_tpu.models import build_model, model_names

TINY = {
    "stgcan": {"stages": ((8, 1, False), (16, 2, True))},
    "stgcn": {"stages": ((8, 1, False), (16, 2, True))},
    "two_stgcan": {"stages": ((8, 1, False), (16, 2, True))},
    "two_stgcan_bilstm": {"stages": ((8, 1, False), (16, 2, True))},
    "gstcan_3stream": {"stages": ((8, 1, False), (16, 2, True)),
                       "sensor_encoder": "cnn_bilstm"},
    "bilstm": {"hidden_size": 8},
    "cnn_bilstm": {"hidden_size": 8},
    "musa": {"embed_dim": 8, "n_stage": 1},
    "musa_ablation": {"embed_dim": 8, "n_stage": 1},
    "targcn": {"rnn_units": 8, "output_dim": 8, "embed_dim": 4, "num_layers": 1},
    "skeleton_transformer": {"embedding_dim": 8, "n_block": 1, "head_dim": 4,
                             "n_heads": 2},
    "skeleton_transformer_factorized": {"embedding_dim": 8, "n_block": 2,
                                        "head_dim": 4, "n_heads": 2},
    "transformer_ensemble": {"embedding_dim": 8, "n_block": 1, "head_dim": 4,
                             "n_heads": 2},
}


def test_registry_covers_tiny_configs():
    assert set(model_names()) == set(TINY), (
        sorted(set(model_names()) - set(TINY)),
        sorted(set(TINY) - set(model_names())),
    )


@pytest.mark.parametrize("name", sorted(TINY))
def test_model_zoo_forward(name):
    overrides = {"model.name": name, "data.num_classes": 3,
                 "model.kwargs": TINY[name]}
    if name.startswith("musa"):
        # the Gen-3 graph conv broadcasts only a size-1 partition axis
        # (reference ships strategy=uniform; K=3 'spatial' requires K==C)
        overrides["graph.strategy"] = "uniform"
    cfg = load_config(preset_path("default"), overrides=overrides)
    model = build_model(cfg)
    skel = jnp.ones((2, 30, 14, 3))
    sensor = jnp.ones((2, 30, 15))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, skel, sensor, train=False)
    out = model.apply(variables, skel, sensor, train=False)
    assert out.shape == (2, 3)
    assert bool(jnp.isfinite(out).all())
    # train mode: mutable BN stats + dropout rngs
    out2, _ = model.apply(
        variables, skel, sensor, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)},
    )
    assert bool(jnp.isfinite(out2).all())


def test_coco_mmpose_preset_matches_its_layout():
    # two_stgcan_bilstm_urfall mirrors the reference coco_mmpose config
    # (V=18); its data.num_joints must match the layout node count, and a
    # model fed the wrong joint count must say so instead of failing deep
    # inside a reshape (regression: the preset shipped with the default 14).
    cfg = load_config(preset_path("two_stgcan_bilstm_urfall"),
                      overrides={"train.epochs": 1})
    assert cfg.data.num_joints == 18
    model = build_model(cfg)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    skel = jnp.ones((2, 30, 18, 3))
    sensor = jnp.ones((2, 30, 4))
    variables = model.init(rngs, skel, sensor, train=False)
    out = model.apply(variables, skel, sensor, train=False)
    assert out.shape == (2, 2)

    with pytest.raises(ValueError, match="data.num_joints"):
        model.init(rngs, jnp.ones((2, 30, 14, 3)), sensor, train=False)
