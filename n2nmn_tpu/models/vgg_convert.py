"""VGG-16 weight conversion into the framework's param pytree.

The reference ships a converted Caffe model as ``vgg_net.tfmodel``
(exp_clevr/data/download_vgg_net.sh) and builds the graph from it
(models_clevr/vgg_net.py). Here we accept:

1. an ``.npz`` with keys ``conv{b}_{i}/weights`` [kh,kw,in,out] and
   ``conv{b}_{i}/biases`` (the natural export of the TF variables), or
2. a torchvision-style ``.pth``/state_dict with ``features.{idx}.weight``
   [out,in,kh,kw] (converted to HWIO; note torchvision VGG is RGB-trained
   while the reference pipeline feeds BGR — pass ``rgb_to_bgr=True`` to
   swap the conv1_1 input channels so BGR inputs line up).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_LAYERS = [
    ("conv1_1", 0), ("conv1_2", 2),
    ("conv2_1", 5), ("conv2_2", 7),
    ("conv3_1", 10), ("conv3_2", 12), ("conv3_3", 14),
    ("conv4_1", 17), ("conv4_2", 19), ("conv4_3", 21),
    ("conv5_1", 24), ("conv5_2", 26), ("conv5_3", 28),
]


def from_npz(path):
    """Load from npz with 'conv{b}_{i}/weights' HWIO + '/biases' keys."""
    data = np.load(path)
    params = {}
    for name, _ in _LAYERS:
        w = data[f"{name}/weights"].astype(np.float32)
        b = data[f"{name}/biases"].astype(np.float32)
        params[name] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    return params


def from_torchvision_state_dict(state_dict, rgb_to_bgr=True):
    """Convert torchvision vgg16 ``features.*`` conv weights.

    torch layout OIHW -> HWIO. When rgb_to_bgr, conv1_1's input-channel
    order is reversed so the network accepts BGR input (the reference's
    channel convention, models_clevr/vgg_net.py:14-20)."""
    params = {}
    for name, idx in _LAYERS:
        w = np.asarray(state_dict[f"features.{idx}.weight"], np.float32)
        b = np.asarray(state_dict[f"features.{idx}.bias"], np.float32)
        w = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        if name == "conv1_1" and rgb_to_bgr:
            w = w[:, :, ::-1, :].copy()
        params[name] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    return params


def from_torchvision_file(path, rgb_to_bgr=True):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return from_torchvision_state_dict(sd, rgb_to_bgr=rgb_to_bgr)
