"""Image backbones.

- shapes_convnet: the 2-layer in-graph CNN for SHAPES
  (reference models_shapes/shapes_convnet.py:8-17).
- vgg16_pool5: VGG-16 conv1_1..pool5 used for CLEVR feature extraction
  (reference models_clevr/vgg_net.py:16-54). Runs fully on-device so the
  29 GB offline feature dump becomes optional.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from n2nmn_tpu.ops.nn import init_conv, apply_conv


def init_shapes_convnet(key, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": init_conv(k1, 10, 3, 64, dtype=dtype),
        "conv2": init_conv(k2, 1, 64, 64, dtype=dtype),
    }


def shapes_convnet(params, images):
    """images: [N, 30, 30, 3] (mean-subtracted) -> [N, 3, 3, 64].

    conv 10x10 stride 10 VALID + ReLU, then 1x1 conv + ReLU
    (reference shapes_convnet.py:10-16)."""
    x = apply_conv(params["conv1"], images, stride=10, padding="VALID")
    x = jax.nn.relu(x)
    x = apply_conv(params["conv2"], x, stride=1, padding="SAME")
    x = jax.nn.relu(x)
    return x


# ---------------- VGG-16 pool5 ----------------

# (name, out_channels) per conv layer, pooling after each block
_VGG_BLOCKS = [
    ("conv1", [64, 64]),
    ("conv2", [128, 128]),
    ("conv3", [256, 256, 256]),
    ("conv4", [512, 512, 512]),
    ("conv5", [512, 512, 512]),
]

# BGR channel mean (reference models_clevr/vgg_net.py:14)
VGG_CHANNEL_MEAN = jnp.array([103.939, 116.779, 123.68], jnp.float32)


def init_vgg16(key, dtype=jnp.float32):
    params = {}
    in_c = 3
    for block, channels in _VGG_BLOCKS:
        for i, out_c in enumerate(channels, start=1):
            key, sub = jax.random.split(key)
            params[f"{block}_{i}"] = init_conv(sub, 3, in_c, out_c,
                                               dtype=dtype)
            in_c = out_c
    return params


def vgg16_pool5(params, images_bgr, subtract_mean=True,
                compute_dtype=jnp.bfloat16):
    """VGG-16 conv stack through pool5.

    images_bgr: [N, H, W, 3] raw 0-255 BGR (the reference feeds
    mean-subtracted BGR, vgg_net.py:16-20). For CLEVR 480x320 input the
    output grid is [N, 10, 15, 512].

    Convs run in ``compute_dtype`` (bfloat16 by default — this backbone is
    the FLOPs hot spot and maps straight onto the MXU); the output is cast
    back to float32.
    """
    x = images_bgr
    if subtract_mean:
        x = x - VGG_CHANNEL_MEAN
    x = x.astype(compute_dtype)
    for block, channels in _VGG_BLOCKS:
        for i in range(1, len(channels) + 1):
            p = jax.tree_util.tree_map(lambda a: a.astype(compute_dtype),
                                       params[f"{block}_{i}"])
            x = jax.nn.relu(apply_conv(p, x, stride=1, padding="SAME"))
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 2, 2, 1),
            window_strides=(1, 2, 2, 1),
            padding="SAME")
    return x.astype(jnp.float32)
