"""Single-step gradient parity: reference musa vs ours at identical weights.

Companion to ``parity_train_step_musa.py``: computes the loss gradient at
the SAME ported weights on the SAME batch in both frameworks (train mode,
stochastic regularizers disabled) and reports per-tensor max-abs and
relative differences. If gradients agree to numerical precision, training
dynamics are identical and any multi-step trajectory spread is chaotic
amplification of fp32 noise (RMSprop's early steps are nearly sign(g)).

    python experiments/parity_grads_musa.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

from parity_train_step_musa import build_reference, make_batches  # noqa: E402


def torch_grads(model, feats, labels):
    import torch

    model.train()
    x = torch.tensor(np.transpose(feats, (0, 3, 1, 2)))
    y = torch.tensor(labels)
    loss = torch.nn.CrossEntropyLoss()(model(x), y)
    loss.backward()
    return float(loss), {
        k: p.grad.detach().numpy().copy()
        for k, p in model.named_parameters() if p.grad is not None
    }


def our_grads(state_dict, feats, labels):
    import jax
    import jax.numpy as jnp
    import optax
    from flax.traverse_util import flatten_dict, unflatten_dict

    from fall_multimodal_tpu.models.musa import MusaModel
    from parity_train_step_musa import CLASSES, EMBED, NSTAGE
    from test_musa_parity import _port

    model = MusaModel(
        num_classes=CLASSES, embed_dim=EMBED, n_stage=NSTAGE,
        act_type="tanh", block_size=41, edge=True, bias=True,
        keep_prob=1.0, dropout=0.0,
    )
    sd = {k: v.detach().numpy() for k, v in state_dict.items()}
    ported_p, ported_bs = _port(sd)
    params = unflatten_dict({k: jnp.asarray(v) for k, v in ported_p.items()})
    batch_stats = unflatten_dict(
        {k: jnp.asarray(v) for k, v in ported_bs.items()})

    def loss_fn(p):
        logits, _ = model.apply(
            {"params": p, "batch_stats": batch_stats},
            jnp.asarray(feats), None, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0)},
        )
        return optax.softmax_cross_entropy(logits, jnp.asarray(labels)).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return float(loss), {k: np.asarray(v) for k, v in
                         flatten_dict(grads).items()}


def main():
    batches = make_batches(1, 32)
    feats, labels = batches[0]
    ref_model = build_reference("/root/reference")
    state_dict = {k: v.clone() for k, v in ref_model.state_dict().items()}

    our_loss, ours = our_grads(state_dict, feats, labels)
    ref_loss, ref = torch_grads(ref_model, feats, labels)
    print(f"loss: ours {our_loss:.6f}  ref {ref_loss:.6f}  "
          f"|d| {abs(our_loss - ref_loss):.2e}")

    # map torch param names -> flax grad keys via the same _port transform
    # (grads transform identically to weights; BN running stats have no
    # grads, so return zeros for those lookups and ignore the bs dict)
    from test_musa_parity import _port

    class _ZeroOnMissing(dict):
        def __missing__(self, key):
            return np.zeros(1)

    ported_ref, _ = _port(_ZeroOnMissing(ref))

    worst = []
    for k, g_ref in ported_ref.items():
        g_our = ours[k]
        scale = max(np.abs(g_ref).max(), 1e-12)
        d = np.abs(g_our - g_ref).max()
        worst.append((d / scale, d, "/".join(k)))
    worst.sort(reverse=True)
    print(f"{len(worst)} gradient tensors compared")
    print("worst relative diffs:")
    for rel, d, name in worst[:10]:
        print(f"  {rel:.3e} (abs {d:.3e})  {name}")
    print(f"max rel diff: {worst[0][0]:.3e}")


if __name__ == "__main__":
    main()
