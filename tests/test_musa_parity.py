"""Full-model numerical parity of the Gen-3 flagship (musa model).

``tests/fixtures/reference_musa.npz`` holds a fixed input, the reference
model's eval-mode output, and its complete ``state_dict`` (generated once by
executing ``Multimodal_Fall3/model/musa_model.py`` with
embed_dim=16/n_stage=1/act_type=tanh/edge=True/block_size=41). The weights
go through the public torch-interop API
(:func:`fall_multimodal_tpu.interop.torch_to_variables`) and the logits
must match the reference.
"""

import os

import numpy as np
import jax.numpy as jnp

from fall_multimodal_tpu.configs import load_config, preset_path
from fall_multimodal_tpu.interop import torch_to_variables
from fall_multimodal_tpu.models import build_model

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "reference_musa.npz")


def test_musa_full_model_matches_reference():
    blob = np.load(FIXTURE)
    x_nctv = blob["x"]                      # (4, 3, 30, 14)
    expected = blob["out"]                  # (4, 11)
    sd = {k: blob[k] for k in blob.files if k not in ("x", "out")}

    cfg = load_config(
        preset_path("default"),
        overrides={
            "model.name": "musa",
            "graph.strategy": "uniform",    # Gen-3 ships strategy=uniform
            "data.num_classes": 11,
            "model.kwargs": {
                "embed_dim": 16, "n_stage": 1, "act_type": "tanh",
                "block_size": 41, "edge": True, "bias": True,
            },
        },
    )
    variables = torch_to_variables(cfg, sd)     # validates keys + shapes

    model = build_model(cfg)
    x = jnp.asarray(np.transpose(x_nctv, (0, 2, 3, 1)))  # -> (N, T, V, C)
    ours = np.asarray(model.apply(variables, x, None, train=False))
    np.testing.assert_allclose(ours, expected, atol=2e-5)
