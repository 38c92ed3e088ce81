"""Validate the torch-checkpoint interop against LIVE reference models.

The fixture-backed tests pin the converter at the shipped hyperparameters
(musa n_stage=1 etc.); this experiment executes the actual reference code
from /root/reference at runtime (same pattern as parity_training.py) and
checks the converter across the hyperparameter axes it generalizes over:

* musa ``Model`` at n_stage=2 (the reference ctor default) and bias=False
* musa ``Ablation`` (no Sep_TCN tail, n_stage=2)

Each arm: build the torch model, eval-mode forward on a fixed input,
convert ``state_dict()`` through ``torch_to_variables`` (strict), run our
model, compare. Writes validate_interop_results.json.

Usage: python experiments/validate_interop.py [--reference /root/reference]
"""

import argparse
import importlib.util
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force the CPU backend: the axon sitecustomize overrides the JAX_PLATFORMS
# env var, and the axon TPU's default-bf16 matmuls inject ~1e-3 noise that
# would drown the 5e-5 conversion tolerance (same pin as the lockstep
# harnesses; see the verify skill's gotchas)
import jax

jax.config.update("jax_platforms", "cpu")


def load_reference_musa(reference_path):
    spec = importlib.util.spec_from_file_location(
        "ref_musa_model",
        os.path.join(reference_path, "Multimodal_Fall3", "model", "musa_model.py"),
    )
    mm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mm)
    return mm


def musa_arm(mm, cls_name, n_stage, bias, embed_dim=8, classes=5):
    import torch

    import jax.numpy as jnp
    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.interop import torch_to_variables
    from fall_multimodal_tpu.models import build_model

    print(f"[arm] {cls_name} n_stage={n_stage} bias={bias} ...", flush=True)
    torch.manual_seed(0)
    cls = getattr(mm, cls_name)
    model = cls(
        num_class=classes, num_point=14, max_frame=300,
        graph=mm.adjGraph(layout="coco_cut", strategy="uniform"),
        bias=bias, edge=True, block_size=41,
        embed_dim=embed_dim, n_stage=n_stage, act_type="relu",
    )
    model.eval()
    rng = np.random.default_rng(1)
    x_nctv = rng.normal(size=(4, 3, 30, 14)).astype(np.float32)
    with torch.no_grad():
        expected = model(torch.tensor(x_nctv)).numpy()
    print("  torch forward done; converting + running ours", flush=True)

    cfg = load_config(
        preset_path("default"),
        overrides={
            "model.name": "musa_ablation" if cls_name == "Ablation" else "musa",
            "graph.strategy": "uniform",
            "data.num_classes": classes,
            "model.kwargs": {
                "embed_dim": embed_dim, "n_stage": n_stage,
                "act_type": "relu", "block_size": 41,
                "edge": True, "bias": bias,
            },
        },
    )
    variables = torch_to_variables(cfg, model.state_dict())
    ours = np.asarray(
        build_model(cfg).apply(
            variables, jnp.asarray(np.transpose(x_nctv, (0, 2, 3, 1))),
            None, train=False,
        )
    )
    err = float(np.max(np.abs(ours - expected)))
    return {
        "arm": f"{cls_name} n_stage={n_stage} bias={bias}",
        "max_abs_err": err,
        "ok": bool(err < 5e-5),
    }


def ablation1_arm(reference_path, classes=5):
    """Factorized Ablation1 transformer (``skeleton_transformer.py:
    437-514``): the round-4 converter close-out (the last interop hole —
    round 3 raised NotImplementedError here)."""
    import torch

    import jax.numpy as jnp
    from fall_multimodal_tpu.configs import load_config, preset_path
    from fall_multimodal_tpu.interop import torch_to_variables
    from fall_multimodal_tpu.models import build_model

    print("[arm] SkeletonTransformer_Ablation1 ...", flush=True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parity_training import _ensure_torchvision_stub

    _ensure_torchvision_stub()
    spec = importlib.util.spec_from_file_location(
        "ref_skeleton_transformer",
        os.path.join(reference_path, "skeleton_transformer.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    model = mod.SkeletonTransformer_Ablation1(
        in_channels=3, n_joints=14, seq_len=30, num_classes=classes,
        embedding_dim=32, n_block=6, head_dim=16, n_heads=8,
    )
    model.eval()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 3, 30, 14, 1)).astype(np.float32)  # (N,C,T,V,M)
    with torch.no_grad():
        expected = model(torch.tensor(x)).numpy()

    cfg = load_config(
        preset_path("skeleton_transformer_harup"),
        overrides={
            "model.name": "skeleton_transformer_factorized",
            "data.num_classes": classes,
        },
    )
    variables = torch_to_variables(cfg, model.state_dict())
    # ours runs the resident (N, M, T, V, C) layout
    ours = np.asarray(
        build_model(cfg).apply(
            variables,
            jnp.asarray(np.transpose(x, (0, 4, 2, 3, 1))),
            None, train=False,
        )
    )
    err = float(np.max(np.abs(ours - expected)))
    return {
        "arm": "SkeletonTransformer_Ablation1 n_block=6",
        "max_abs_err": err,
        "ok": bool(err < 5e-5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    mm = load_reference_musa(args.reference)

    results = [
        musa_arm(mm, "Model", n_stage=2, bias=True),
        musa_arm(mm, "Model", n_stage=1, bias=False),
        musa_arm(mm, "Model", n_stage=3, bias=True),
        musa_arm(mm, "Ablation", n_stage=2, bias=True),
        ablation1_arm(args.reference),
    ]
    out = os.path.join(os.path.dirname(__file__), "validate_interop_results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))
    if not all(r["ok"] for r in results):
        sys.exit(1)


if __name__ == "__main__":
    main()
