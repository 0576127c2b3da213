"""ResNet-152 through res5c for VQA feature extraction.

The reference consumes a 307 GB offline dump of ResNet-152 res5c features
(14x14x2048 from 448x448 images, reference README.md:121,201) produced by
an external tool; this runs the backbone on-device instead. Weights
convert from a torchvision resnet152 state_dict; BatchNorm folds into an
inference-mode scale/bias (the extraction is always inference).

Layout: NHWC, bottleneck stages [3, 8, 36, 3], res5c = stage-4 output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

STAGES = [3, 8, 36, 3]
WIDTHS = [256, 512, 1024, 2048]

# ImageNet RGB normalization (torchvision convention)
IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def _conv(x, w, stride=1):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _scale_bias(x, p):
    return x * p["scale"] + p["bias"]


def _bottleneck(x, p, stride):
    out = jax.nn.relu(_scale_bias(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_scale_bias(_conv(out, p["conv2"], stride), p["bn2"]))
    out = _scale_bias(_conv(out, p["conv3"]), p["bn3"])
    shortcut = x
    if "downsample_conv" in p:
        shortcut = _scale_bias(_conv(x, p["downsample_conv"], stride),
                               p["downsample_bn"])
    return jax.nn.relu(out + shortcut)


def resnet152_res5c(params, images_rgb01, compute_dtype=jnp.bfloat16):
    """images_rgb01: [N, H, W, 3] in [0, 1] RGB. 448x448 -> [N,14,14,2048].

    Convs run in ``compute_dtype`` (MXU hot path); output cast to f32."""
    x = (images_rgb01 - IMAGENET_MEAN) / IMAGENET_STD
    x = x.astype(compute_dtype)
    p = jax.tree_util.tree_map(lambda a: a.astype(compute_dtype), params)
    x = jax.nn.relu(_scale_bias(
        lax.conv_general_dilated(
            x, p["conv1"], window_strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")), p["bn1"]))
    x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                          (1, 2, 2, 1), "SAME")
    for stage in range(4):
        stride = 1 if stage == 0 else 2
        for block in range(STAGES[stage]):
            x = _bottleneck(x, p[f"layer{stage + 1}"][block],
                            stride if block == 0 else 1)
    return x.astype(jnp.float32)


def _fold_bn(sd, prefix, eps=1e-5):
    gamma = np.asarray(sd[f"{prefix}.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + eps)
    return {"scale": jnp.asarray(scale),
            "bias": jnp.asarray(beta - mean * scale)}


def _w(sd, key):
    # torch OIHW -> HWIO
    return jnp.asarray(np.transpose(np.asarray(sd[key], np.float32),
                                    (2, 3, 1, 0)))


def from_torchvision_state_dict(sd):
    params = {"conv1": _w(sd, "conv1.weight"), "bn1": _fold_bn(sd, "bn1")}
    for stage in range(4):
        blocks = []
        for b in range(STAGES[stage]):
            pre = f"layer{stage + 1}.{b}"
            blk = {
                "conv1": _w(sd, f"{pre}.conv1.weight"),
                "bn1": _fold_bn(sd, f"{pre}.bn1"),
                "conv2": _w(sd, f"{pre}.conv2.weight"),
                "bn2": _fold_bn(sd, f"{pre}.bn2"),
                "conv3": _w(sd, f"{pre}.conv3.weight"),
                "bn3": _fold_bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample_conv"] = _w(
                    sd, f"{pre}.downsample.0.weight")
                blk["downsample_bn"] = _fold_bn(sd, f"{pre}.downsample.1")
            blocks.append(blk)
        params[f"layer{stage + 1}"] = blocks
    return params


def init_random(key, dtype=jnp.float32):
    """Random params with the correct structure (tests / smoke)."""
    def conv_w(key, kh, kw, cin, cout):
        scale = np.sqrt(2.0 / (kh * kw * cin))
        return jax.random.normal(key, (kh, kw, cin, cout), dtype) * scale

    def bn(c):
        return {"scale": jnp.ones((c,), dtype),
                "bias": jnp.zeros((c,), dtype)}

    keys = iter(jax.random.split(key, 400))
    params = {"conv1": conv_w(next(keys), 7, 7, 3, 64), "bn1": bn(64)}
    in_c = 64
    for stage in range(4):
        width = WIDTHS[stage]
        mid = width // 4
        blocks = []
        for b in range(STAGES[stage]):
            blk = {
                "conv1": conv_w(next(keys), 1, 1, in_c, mid),
                "bn1": bn(mid),
                "conv2": conv_w(next(keys), 3, 3, mid, mid),
                "bn2": bn(mid),
                "conv3": conv_w(next(keys), 1, 1, mid, width),
                "bn3": bn(width),
            }
            if b == 0:
                blk["downsample_conv"] = conv_w(next(keys), 1, 1, in_c,
                                                width)
                blk["downsample_bn"] = bn(width)
            blocks.append(blk)
            in_c = width
        params[f"layer{stage + 1}"] = blocks
    return params
