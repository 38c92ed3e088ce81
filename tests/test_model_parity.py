"""Numerical parity of core modules against the reference math.

Each test re-derives the reference computation with torch *functional* ops
(same math as ``Model/stgcan.py`` / ``Model/bilstm.py`` / the notebook
models), ports identical weights into our flax modules, and compares outputs.
The flax->torch weight mapping is mechanical because layouts were chosen to
line up (Dense kernel = conv weight transposed; LSTM gates i,f,g,o).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fall_multimodal_tpu.graphs import build_adjacency
from fall_multimodal_tpu.models.layers import (
    BiLSTMLayer,
    GraphConv,
    MlpChannelAttention,
    SqueezeExcite,
    TemporalConv,
)
from fall_multimodal_tpu.models.stgcan import STGCANBlock

ATOL = 2e-5


def t(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


def to_nctv(x_ntvc):
    return np.transpose(np.asarray(x_ntvc), (0, 3, 1, 2))


def to_ntvc(x_nctv):
    return np.transpose(np.asarray(x_nctv), (0, 2, 3, 1))


# --------------------------------------------------------------- GraphConv


def test_graph_conv_matches_reference_einsum(rng):
    n, tt, v, cin, cout = 3, 10, 14, 8, 16
    A = build_adjacency("coco_cut", "spatial").astype(np.float32)  # (3,14,14)
    k = A.shape[0]
    x = rng.normal(size=(n, tt, v, cin)).astype(np.float32)

    mod = GraphConv(cout)
    variables = mod.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(A))
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), jnp.asarray(A)))

    # Reference math: 1x1 conv to K*C_out, view (n,K,C',t,v),
    # einsum('nkctv,kvw->nctw') — stgcan.py:50-56.
    kern = np.asarray(variables["params"]["Dense_0"]["kernel"])  # (cin, k*cout)
    bias = np.asarray(variables["params"]["Dense_0"]["bias"])
    w = t(kern.T.reshape(k * cout, cin, 1, 1))
    y = F.conv2d(t(to_nctv(x)), w, t(bias))
    y = y.view(n, k, cout, tt, v)
    ref = torch.einsum("nkctv,kvw->nctw", y, t(A))
    np.testing.assert_allclose(ours, to_ntvc(ref.numpy()), atol=ATOL)


# ------------------------------------------------------------ TemporalConv


@pytest.mark.parametrize("stride", [1, 2])
def test_temporal_conv_matches_torch(rng, stride):
    n, tt, v, c = 2, 30, 14, 16
    x = rng.normal(size=(n, tt, v, c)).astype(np.float32)
    mod = TemporalConv(c, kernel_size=9, stride=stride)
    variables = mod.init(jax.random.key(1), jnp.asarray(x))
    ours = np.asarray(mod.apply(variables, jnp.asarray(x)))

    kern = np.asarray(variables["params"]["Conv_0"]["kernel"])  # (9,1,c,c)
    bias = np.asarray(variables["params"]["Conv_0"]["bias"])
    w = t(np.transpose(kern, (3, 2, 0, 1)))  # -> (out,in,9,1)
    ref = F.conv2d(t(to_nctv(x)), w, t(bias), stride=(stride, 1), padding=(4, 0))
    np.testing.assert_allclose(ours, to_ntvc(ref.numpy()), atol=ATOL)


# ----------------------------------------------------------- SqueezeExcite


def test_squeeze_excite_matches_reference(rng):
    n, tt, v, c = 4, 8, 14, 64
    x = rng.normal(size=(n, tt, v, c)).astype(np.float32)
    mod = SqueezeExcite()
    variables = mod.init(jax.random.key(2), jnp.asarray(x), train=False)
    p = variables["params"]
    # randomize BN params so the test isn't trivially scale-1/shift-0
    p = jax.tree.map(lambda a: a + 0.1, p)
    ours = np.asarray(mod.apply({"params": p, "batch_stats": variables["batch_stats"]},
                                jnp.asarray(x), train=False))

    # Reference math (stgcan.py:59-74): avgpool -> 1x1 -> BN -> ReLU -> 1x1
    # -> sigmoid -> gate. Eval mode: BN uses running stats (0 mean, 1 var).
    w1 = np.asarray(p["Dense_0"]["kernel"])
    b1 = np.asarray(p["Dense_0"]["bias"])
    w2 = np.asarray(p["Dense_1"]["kernel"])
    b2 = np.asarray(p["Dense_1"]["bias"])
    scale = np.asarray(p["BatchNorm_0"]["BatchNorm_0"]["scale"])
    shift = np.asarray(p["BatchNorm_0"]["BatchNorm_0"]["bias"])

    xt = t(to_nctv(x))
    a = xt.mean(dim=(2, 3))
    a = a @ t(w1) + t(b1)
    a = (a - 0.0) / np.sqrt(1.0 + 1e-5) * t(scale) + t(shift)
    a = torch.relu(a)
    a = torch.sigmoid(a @ t(w2) + t(b2))
    ref = xt * a[:, :, None, None]
    np.testing.assert_allclose(ours, to_ntvc(ref.numpy()), atol=ATOL)


# ----------------------------------------------------------------- BiLSTM


def test_bilstm_matches_torch_lstm(rng):
    n, tt, f, h = 3, 30, 15, 64
    x = rng.normal(size=(n, tt, f)).astype(np.float32)
    mod = BiLSTMLayer(h)
    variables = mod.init(jax.random.key(3), jnp.asarray(x))
    ours = np.asarray(mod.apply(variables, jnp.asarray(x)))

    lstm = torch.nn.LSTM(f, h, 1, batch_first=True, bidirectional=True)
    p = variables["params"]
    with torch.no_grad():
        for direction, tag in [("fwd", ""), ("bwd", "_reverse")]:
            cell = p[direction]["ScanLSTMCellTorch_0"] if "ScanLSTMCellTorch_0" in p[direction] else p[direction]
            getattr(lstm, f"weight_ih_l0{tag}").copy_(t(np.asarray(cell["ih"]["kernel"]).T))
            getattr(lstm, f"bias_ih_l0{tag}").copy_(t(np.asarray(cell["ih"]["bias"])))
            getattr(lstm, f"weight_hh_l0{tag}").copy_(t(np.asarray(cell["hh"]["kernel"]).T))
            getattr(lstm, f"bias_hh_l0{tag}").copy_(t(np.asarray(cell["hh"]["bias"])))
        ref, _ = lstm(t(x))
    np.testing.assert_allclose(ours, ref.numpy(), atol=ATOL)


# ------------------------------------------------- MLP channel attention


def test_mlp_channel_attention(rng):
    x = rng.normal(size=(5, 128)).astype(np.float32)
    mod = MlpChannelAttention()
    variables = mod.init(jax.random.key(4), jnp.asarray(x))
    ours = np.asarray(mod.apply(variables, jnp.asarray(x)))
    p = variables["params"]
    w = torch.sigmoid(
        torch.relu(t(x) @ t(np.asarray(p["Dense_0"]["kernel"])) + t(np.asarray(p["Dense_0"]["bias"])))
        @ t(np.asarray(p["Dense_1"]["kernel"])) + t(np.asarray(p["Dense_1"]["bias"]))
    )
    np.testing.assert_allclose(ours, (t(x) * w).numpy(), atol=ATOL)


# --------------------------------------------- full STGCAN block (train BN)


def test_stgcan_block_train_mode_batch_stats(rng):
    """Train-mode BN uses batch statistics; check the full block against a
    torch-functional recomputation with the same weights."""
    n, tt, v = 4, 12, 14
    cin = cout = 16
    A = build_adjacency("coco_cut", "spatial").astype(np.float32)
    x = rng.normal(size=(n, tt, v, cin)).astype(np.float32)

    mod = STGCANBlock(features=cout, stride=1, residual=True)
    variables = mod.init(jax.random.key(5), jnp.asarray(x), jnp.asarray(A), train=True)
    ours, _ = mod.apply(
        variables, jnp.asarray(x), jnp.asarray(A), train=True,
        mutable=["batch_stats"],
    )
    ours = np.asarray(ours)

    p = variables["params"]

    def bn_train(y, scope):  # torch-functional train-mode BN, biased var
        scale = t(np.asarray(scope["BatchNorm_0"]["scale"]))
        shift = t(np.asarray(scope["BatchNorm_0"]["bias"]))
        dims = (0, 2, 3)
        mean = y.mean(dim=dims, keepdim=True)
        var = y.var(dim=dims, unbiased=False, keepdim=True)
        ynorm = (y - mean) / torch.sqrt(var + 1e-5)
        return ynorm * scale[None, :, None, None] + shift[None, :, None, None]

    xt = t(to_nctv(x))
    # gcn
    gk = np.asarray(p["GraphConv_0"]["Dense_0"]["kernel"])
    gb = np.asarray(p["GraphConv_0"]["Dense_0"]["bias"])
    k = A.shape[0]
    y = F.conv2d(xt, t(gk.T.reshape(k * cout, cin, 1, 1)), t(gb))
    y = y.view(n, k, cout, tt, v)
    y = torch.einsum("nkctv,kvw->nctw", y, t(A))
    # tcn: BN -> relu -> conv(9,1) -> BN
    y = bn_train(y, p["tcn_bn1"])
    y = torch.relu(y)
    ck = np.asarray(p["TemporalConv_0"]["Conv_0"]["kernel"])
    cb = np.asarray(p["TemporalConv_0"]["Conv_0"]["bias"])
    y = F.conv2d(y, t(np.transpose(ck, (3, 2, 0, 1))), t(cb), padding=(4, 0))
    y = bn_train(y, p["tcn_bn2"])
    # SE (train-mode BN on the squeezed vector)
    se = p["SqueezeExcite_0"]
    a = y.mean(dim=(2, 3))
    a = a @ t(np.asarray(se["Dense_0"]["kernel"])) + t(np.asarray(se["Dense_0"]["bias"]))
    mean, var = a.mean(0), a.var(0, unbiased=False)
    a = (a - mean) / torch.sqrt(var + 1e-5)
    a = a * t(np.asarray(se["BatchNorm_0"]["BatchNorm_0"]["scale"])) + t(
        np.asarray(se["BatchNorm_0"]["BatchNorm_0"]["bias"])
    )
    a = torch.relu(a)
    a = torch.sigmoid(a @ t(np.asarray(se["Dense_1"]["kernel"])) + t(np.asarray(se["Dense_1"]["bias"])))
    y = y * a[:, :, None, None]
    # residual identity (cin == cout, stride 1) then relu
    ref = torch.relu(y + xt)
    np.testing.assert_allclose(ours, to_ntvc(ref.numpy()), atol=5e-5)


def test_graphconv_dense_mode_equivalent():
    """dense_mode folds A into a single (V*Cin)x(V*Cout) matmul
    (U = sum_k A_k (x) W_k) from the SAME parameters — must match the
    factored channel-mix + einsum form to float32 association noise, for
    both expanding and equal-channel shapes, with and without bias."""
    import jax
    import jax.numpy as jnp

    from fall_multimodal_tpu.models.layers import GraphConv

    rng = np.random.default_rng(0)
    for c_in, c_out, use_bias in [(3, 64, True), (64, 64, True), (64, 128, False)]:
        x = jnp.asarray(rng.normal(size=(2, 5, 14, c_in)), jnp.float32)
        A = jnp.asarray(rng.normal(size=(3, 14, 14)), jnp.float32)
        factored = GraphConv(c_out, use_bias=use_bias, dense_mode=False)
        dense = GraphConv(c_out, use_bias=use_bias, dense_mode=True)
        variables = factored.init(jax.random.key(0), x, A)
        y0 = factored.apply(variables, x, A)
        y1 = dense.apply(variables, x, A)  # same params, different math order
        np.testing.assert_allclose(
            np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=2e-5
        )
