"""Pure-functional NN primitives for the TPU NMN framework.

Parameters are plain nested dicts of jnp arrays (pytrees). By convention a
learnable matrix/filter is stored under key ``'w'`` and a bias under ``'b'``;
the L2 regularizer collects exactly the ``'w'`` leaves, mirroring the
reference convention of regularizing every variable named ``weights``
(reference models_clevr/nmn3_model.py:163-166, util/cnn.py collection adds).

Initialization follows the reference's Xavier-uniform convention
(util/cnn.py:14,101 — tf.contrib.layers.xavier_initializer).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
from jax import lax

# lax.scan unroll factor for the sequential scans (encoder/decoder
# LSTMs, executor stack machine): the XLA while loop carries a
# per-iteration overhead that grows with batch (decode_breakdown
# "empty" floor: 0.03 ms at N=256 -> 1.29 ms at N=1024 for a trivial
# 20-step scan); unrolling amortizes it without changing semantics.
SCAN_UNROLL = int(os.environ.get("N2NMN_SCAN_UNROLL", "1"))

# Rematerialize the sequential scan bodies (executor stack machine,
# decoder, encoder LSTM) under reverse-mode AD: jax.checkpoint makes the
# backward pass recompute each step's branch math from the carried state
# instead of storing every intermediate to HBM during the forward sweep.
# Trades one extra forward's FLOPs for the residual write+read traffic —
# measured v5e flagship train step (tools/profile_train.py,
# perf/profile_train_r3{_noremat,}.json): cloning 112->177 steps/s at
# N=64, 47->59 at N=256; RL 114->173 / 47->59. No effect on
# un-differentiated (eval/serving) traces. Default ON;
# N2NMN_SCAN_REMAT=0 restores store-everything backward.
SCAN_REMAT = os.environ.get("N2NMN_SCAN_REMAT", "1") == "1"


def maybe_remat(fn):
    """jax.checkpoint(fn) when N2NMN_SCAN_REMAT is on (scan bodies)."""
    import jax
    return jax.checkpoint(fn) if SCAN_REMAT else fn


def xavier_uniform(key, shape, dtype=jnp.float32):
    """Xavier/Glorot uniform for dense weights [fan_in, fan_out]."""
    fan_in, fan_out = shape[0], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def xavier_uniform_conv(key, shape, dtype=jnp.float32):
    """Xavier uniform for conv filters [kh, kw, in_c, out_c]."""
    kh, kw, in_c, out_c = shape
    fan_in = kh * kw * in_c
    fan_out = kh * kw * out_c
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def init_fc(key, input_dim, output_dim, bias=True, dtype=jnp.float32):
    """Fully-connected layer params (reference util/cnn.py:87-119)."""
    p = {"w": xavier_uniform(key, (input_dim, output_dim), dtype)}
    if bias:
        p["b"] = jnp.zeros((output_dim,), dtype)
    return p


def apply_fc(params, x):
    """y = x @ w (+ b). Flattens trailing dims of x beyond the batch axis."""
    w = params["w"]
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if "b" in params:
        y = y + params["b"]
    return y


def init_conv(key, kernel_size, input_dim, output_dim, bias=True,
              dtype=jnp.float32):
    """Conv layer params (reference util/cnn.py:5-33), NHWC filters HWIO."""
    p = {"w": xavier_uniform_conv(
        key, (kernel_size, kernel_size, input_dim, output_dim), dtype)}
    if bias:
        p["b"] = jnp.zeros((output_dim,), dtype)
    return p


def apply_conv(params, x, stride=1, padding="SAME"):
    """NHWC conv. x: [N, H, W, C_in] -> [N, H', W', C_out]."""
    y = lax.conv_general_dilated(
        x, params["w"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in params:
        y = y + params["b"]
    return y


def apply_1x1_conv(params, x):
    """1x1 conv as a single matmul over the flattened spatial grid.

    The reference implements this as reshape+matmul to dodge a cuDNN
    empty-batch crash (util/empty_safe_conv.py:8-32); on TPU we use the same
    formulation simply because it is the best mapping to the MXU: one large
    [N*H*W, C_in] x [C_in, C_out] contraction.
    Expects dense params with 'w' of shape [C_in, C_out].
    """
    n, h, w, c = x.shape
    y = jnp.dot(x.reshape(n * h * w, c), params["w"],
                preferred_element_type=x.dtype)
    if "b" in params:
        y = y + params["b"]
    return y.reshape(n, h, w, -1)


def init_deconv(key, kernel_size, input_dim, output_dim, bias=True,
                dtype=jnp.float32):
    """Transposed-conv params (reference util/cnn.py:42-73); HWIO filter."""
    p = {"w": xavier_uniform_conv(
        key, (kernel_size, kernel_size, input_dim, output_dim), dtype)}
    if bias:
        p["b"] = jnp.zeros((output_dim,), dtype)
    return p


def apply_deconv(params, x, stride=2, padding="SAME"):
    """NHWC transposed convolution."""
    y = lax.conv_transpose(
        x, params["w"], strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in params:
        y = y + params["b"]
    return y


def max_pool(x, kernel_size, stride, padding="SAME"):
    """Max pooling (reference util/cnn.py:82-85)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding)


def init_embedding(key, num_vocab, embed_dim, dtype=jnp.float32):
    """Embedding matrix; Xavier uniform like TF1 get_variable default."""
    return {"table": xavier_uniform(key, (num_vocab, embed_dim), dtype)}


def l2_normalize(x, axis, eps=1e-12):
    """tf.nn.l2_normalize semantics: x / sqrt(max(sum(x^2), eps))."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * lax.rsqrt(jnp.maximum(sq, eps))


def _is_weight_path(path):
    # path is a tuple of DictKey/etc from tree_flatten_with_path
    last = path[-1]
    key = getattr(last, "key", None)
    return key == "w"


def l2_of_weights(params):
    """sum of 0.5*||w||^2 over every 'w' leaf.

    Matches the reference's l2_reg = sum(tf.nn.l2_loss(v) for trainable v
    named *weights) — which includes all fc/conv weights, the LSTM kernels,
    and the decoder attention/token-prediction matrices, but excludes
    biases, embeddings, and the attention vector v
    (models_clevr/nmn3_model.py:163-166).
    """
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0.0
    for path, leaf in leaves:
        if _is_weight_path(path):
            total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return total


def dropout(key, x, rate, deterministic):
    """Inverted dropout, matching tf keep_prob semantics when rate=1-keep."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
