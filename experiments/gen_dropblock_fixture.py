"""Generate tests/fixtures/reference_dropblock.npz.

Runs the reference DropGraph regularizers (``Multimodal_Fall3/model/
musa_model.py:39-98``: Randomized_DropBlock_Ske / Randomized_DropBlockT_1d)
many times on a FIXED input and stores their sampling statistics: mean/std
drop fraction, mean rescale factor, and the per-position drop frequency.
``tests/test_aux.py::test_dropblock_statistics_match_reference`` replays the
same protocol through our flax modules and requires the distributions to
match — the cross-framework guarantee that our stochastic regularization is
as strong as the reference's (the deterministic dynamics are covered by
``parity_grads_musa.py``).

    python experiments/gen_dropblock_fixture.py
"""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRAWS = 2000
KEEP_PROB = 0.9
N, C, T, V = 8, 32, 30, 14


def main():
    spec = importlib.util.spec_from_file_location(
        "ref_musa_model",
        "/root/reference/Multimodal_Fall3/model/musa_model.py",
    )
    mm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mm)

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((N, C, T, V)).astype(np.float32)
    graph = mm.adjGraph(layout="coco_cut", strategy="uniform")
    A = torch.tensor(graph.A, dtype=torch.float32)          # (1, V, V)

    ske = mm.Randomized_DropBlock_Ske()
    ske.train()
    dropt = mm.Randomized_DropBlockT_1d(block_size=7)
    dropt.train()
    xt = torch.tensor(x)

    ske_fracs, ske_scales = [], []
    ske_pos_freq = np.zeros((N, V))
    t_fracs, t_scales = [], []
    for _ in range(DRAWS):
        out = ske(xt, KEEP_PROB, A, V)
        dropped = (out == 0).all(dim=1).all(dim=1).numpy()  # (N, V)
        ske_fracs.append(dropped.mean())
        ske_pos_freq += dropped
        nz = out[out != 0] / xt[out != 0]
        ske_scales.append(float(nz.mean()) if nz.numel() else 1.0)

        out_t = dropt(xt, KEEP_PROB)
        dropped_t = (out_t == 0).all(dim=1).all(dim=2).numpy()  # (N, T)
        t_fracs.append(dropped_t.mean())
        nz = out_t[out_t != 0] / xt[out_t != 0]
        t_scales.append(float(nz.mean()) if nz.numel() else 1.0)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "reference_dropblock.npz")
    np.savez(
        out_path,
        x=x, A=np.asarray(graph.A, np.float32),
        draws=DRAWS, keep_prob=KEEP_PROB,
        ske_frac_mean=np.mean(ske_fracs), ske_frac_std=np.std(ske_fracs),
        ske_scale_mean=np.mean(ske_scales),
        ske_pos_freq=ske_pos_freq / DRAWS,
        t_frac_mean=np.mean(t_fracs), t_frac_std=np.std(t_fracs),
        t_scale_mean=np.mean(t_scales),
    )
    print("ske: drop frac %.4f ± %.4f, rescale %.4f" % (
        np.mean(ske_fracs), np.std(ske_fracs), np.mean(ske_scales)))
    print("t:   drop frac %.4f ± %.4f, rescale %.4f" % (
        np.mean(t_fracs), np.std(t_fracs), np.mean(t_scales)))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
