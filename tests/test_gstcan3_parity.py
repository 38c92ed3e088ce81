"""Full-model parity of the flagship 3-stream GSTCAN — the BASELINE.md
anchor model (notebook-canonical ``TwoStreamSpatialTemporalGraph`` with
in-model CNN_BiLSTM sensor stream, ``GSTCAN_UR_conv.ipynb:1-2``).

Fixture: fixed (pts, sensor) inputs, the reference's eval output (which
includes its trailing ``F.softmax``), and the complete 413-entry state_dict.
The weights go through the public torch-interop API
(:func:`fall_multimodal_tpu.interop.torch_to_variables` — the same mapping
every reference user migrates checkpoints with) and softmax(our logits)
must match the reference output.
"""

import os

import jax
import numpy as np
import jax.numpy as jnp

from fall_multimodal_tpu.configs import load_config, preset_path
from fall_multimodal_tpu.interop import torch_to_variables
from fall_multimodal_tpu.models import build_model

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "reference_gstcan3.npz")


def test_three_stream_gstcan_full_model_matches_reference():
    g = np.load(FIX)
    x_nctv = np.asarray(g["x"])                 # (3, 3, 30, 14)
    sensor = jnp.asarray(g["sensor"])           # (3, 30, 4)
    expected = np.asarray(g["out"])             # softmax output
    sd = {k: g[k] for k in g.files if k not in ("x", "sensor", "out")}

    cfg = load_config(preset_path("gstcan_urfall_3stream"))
    variables = torch_to_variables(cfg, sd)     # validates keys + shapes

    model = build_model(cfg)
    skel = jnp.asarray(np.transpose(x_nctv, (0, 2, 3, 1)))  # -> (N, T, V, C)
    logits = model.apply(variables, skel, sensor, train=False)
    ours = np.asarray(jax.nn.softmax(logits, axis=-1))  # reference forward ends in softmax
    np.testing.assert_allclose(ours, expected, atol=2e-5)
