"""Shared flax building blocks, TPU layout ``(N, T, V, C)`` / ``(N, T, C)``.

Channel-last keeps C on the 128-wide vector lanes, so 1x1 convolutions are
``nn.Dense`` (MXU matmuls), temporal convolutions are ``nn.Conv`` over the T
axis in NHWC, and BatchNorm reduces over leading axes — no transposes anywhere
in the hot path. Torch-parity notes: BatchNorm eps=1e-5 / momentum 0.9
(= torch momentum 0.1); LSTM gate order (i, f, g, o) and dual biases match
``torch.nn.LSTM`` so reference-weight ports are mechanical.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def activation_factory(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activations of the reference factory (``musa_model.py:19-37``).

    The reference also lists ``acon``/``metaacon`` branches, but the
    ``AconC``/``MetaAconC`` classes are defined nowhere in the repo — those
    selections raise ``NameError`` there; here they raise the factory's own
    ``ValueError`` (same unusable status, clearer message).
    """
    table = {
        "relu": nn.relu,
        "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.2),
        "tanh": jnp.tanh,
        "gelu": lambda x: nn.gelu(x, approximate=False),  # torch-exact erf
        "hardswish": nn.hard_swish,
        "linear": lambda x: x,
        None: lambda x: x,
    }
    if name not in table:
        raise ValueError(f"Not supported activation: {name}")
    return table[name]


class BatchNorm(nn.Module):
    """Torch-default BatchNorm over the last axis (momentum 0.1, eps 1e-5)."""

    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, train: Optional[bool] = None):
        use_ra = (
            not train if train is not None else self.use_running_average
        )
        return nn.BatchNorm(
            use_running_average=bool(use_ra), momentum=0.9, epsilon=1e-5
        )(x)


class TemporalConv(nn.Module):
    """(k, 1) convolution over the T axis of an (N, T, V, C) tensor."""

    features: int
    kernel_size: int = 9
    stride: int = 1
    use_bias: bool = True
    depthwise: bool = False

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, 1),
            strides=(self.stride, 1),
            padding=((pad, pad), (0, 0)),
            use_bias=self.use_bias,
            feature_group_count=x.shape[-1] if self.depthwise else 1,
        )(x)


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact names, shapes, and default
    initializers — lets GraphConv's dense mode reuse factored-mode params."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        return kernel, bias


class GraphConv(nn.Module):
    """Spatial graph convolution: 1x1 channel mix to K partitions, then the
    A-contraction (reference ``Model/stgcan.py:50-56``).

    x: (N, T, V, C_in); A: (K, V, V) -> (N, T, V, C_out).
    out[n,t,w,c] = sum_{k,v} mix(x)[n,t,v,k,c] * A[k,v,w]; the channel mix is
    one Dense producing K*C_out features (k-major, matching the torch
    ``view(n, K, C', t, v)`` split).

    ``dense_mode`` computes the mathematically identical single matmul
    ``(N·T, V·C_in) @ U`` with ``U[(v,ci),(w,co)] = sum_k A[k,v,w] W[ci,k,co]``
    folded on the fly from the SAME parameters (checkpoint-compatible).
    TPU rationale: the train step is HBM-bound at ~82%% of peak BW
    (experiments/profile_flagship.py) and the factored form writes+reads a
    K*C_out intermediate (3x the activation) and runs a V=14 contraction
    that tiles terribly on the 128x128 MXU. The fused matmul has V*C
    dims (896/1792 at C=64/128 — exact lane multiples), no intermediate,
    and costs ~V/K = 4.7x more FLOPs — paid from the step's 5x idle-MXU
    headroom.
    """

    features: int
    use_bias: bool = True
    dense_mode: bool = False  # callers default True on the STGCAN path

    @nn.compact
    def __call__(self, x, A):
        k = A.shape[0]
        n, t, v, c_in = x.shape
        if v != A.shape[1]:
            raise ValueError(
                f"GraphConv: input has V={v} joints but the graph adjacency "
                f"is (K={k}, V={A.shape[1]}) — the dataset's joint count must "
                "match graph.layout (set data.num_joints to the layout's "
                "node count, e.g. 14 for coco_cut, 18 for coco_mmpose)")
        if not self.dense_mode:
            y = nn.Dense(self.features * k, use_bias=self.use_bias)(x)
            y = y.reshape(n, t, v, k, self.features)
            return jnp.einsum("ntvkc,kvw->ntwc", y, A.astype(y.dtype))

        # same param names/shapes/init as the nn.Dense above -> both modes
        # share checkpoints and the ported reference weights
        kernel, bias = _DenseParams(
            features=self.features * k, in_features=c_in,
            use_bias=self.use_bias, name="Dense_0",
        )()
        W = kernel.reshape(c_in, k, self.features).astype(x.dtype)
        U = jnp.einsum("kvw,ikc->viwc", A.astype(x.dtype), W)
        y = x.reshape(n, t, v * c_in) @ U.reshape(v * c_in, v * self.features)
        if bias is not None:
            b_eff = jnp.einsum(
                "kvw,kc->wc", A.astype(x.dtype),
                bias.reshape(k, self.features).astype(x.dtype),
            )
            y = y + b_eff.reshape(v * self.features)
        return y.reshape(n, t, v, self.features)


class SqueezeExcite(nn.Module):
    """GSTCAN channel attention (reference ``Model/stgcan.py:59-74``):
    global avgpool -> 1x1 (C -> C/4) -> BN -> ReLU -> 1x1 -> sigmoid gate."""

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        a = x.mean(axis=(1, 2))                     # (N, C)
        a = nn.Dense(c // 4)(a)
        a = BatchNorm()(a, train=train)
        a = nn.relu(a)
        a = nn.Dense(c)(a)
        a = nn.sigmoid(a)
        return x * a[:, None, None, :]


class MlpChannelAttention(nn.Module):
    """Sensor-head channel attention (reference ``Model/bilstm.py:5-19``):
    Linear(C -> C/8) -> ReLU -> Linear -> sigmoid, elementwise gate."""

    reduce_rate: float = 1.0 / 8.0

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = nn.Dense(int(c * self.reduce_rate))(x)
        w = nn.relu(w)
        w = nn.Dense(c)(w)
        return x * nn.sigmoid(w)


class LSTMCellTorch(nn.Module):
    """One torch-layout LSTM cell: gates (i, f, g, o), separate ih/hh biases."""

    hidden_size: int

    @nn.compact
    def __call__(self, carry: Tuple[jnp.ndarray, jnp.ndarray], x: jnp.ndarray):
        h, c = carry
        z = nn.Dense(4 * self.hidden_size, name="ih")(x) + nn.Dense(
            4 * self.hidden_size, name="hh"
        )(h)
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h_new = nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new


class BiLSTMLayer(nn.Module):
    """Bidirectional single-layer LSTM over (N, T, F) -> (N, T, 2H).

    Output layout matches torch: ``out[:, t, :H]`` forward state at t,
    ``out[:, t, H:]`` backward state at t. Implemented as two ``nn.scan``
    passes; XLA fuses each step's two matmuls onto the MXU.
    """

    hidden_size: int

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        h0 = jnp.zeros((n, self.hidden_size), x.dtype)

        scan = nn.scan(
            LSTMCellTorch,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        _, fwd = scan(self.hidden_size, name="fwd")((h0, h0), x)
        _, bwd_rev = scan(self.hidden_size, name="bwd")((h0, h0), x[:, ::-1])
        bwd = bwd_rev[:, ::-1]
        return jnp.concatenate([fwd, bwd], axis=-1)
