"""Extract ResNet-152 res5c features for VQA/COCO images on-device
(replaces the reference's external 307 GB offline dump,
reference README.md:121,201; the reference repo itself has no extractor).

Writes per-image .npy in the reference layout plus an optional packed
store for the native mmap reader."""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--gpu_id", type=int, default=0)
parser.add_argument("--image_dir", type=str,
                    default="./exp_vqa/vqa-dataset/Images/")
parser.add_argument("--out_dir", type=str,
                    default="./exp_vqa/data/resnet_res5c/")
parser.add_argument("--resnet_weights", type=str, required=True,
                    help="torchvision resnet152 state_dict (.pth)")
parser.add_argument("--image_sets", type=str,
                    default="train2014:val2014:test2015")
parser.add_argument("--batch_size", type=int, default=16)
parser.add_argument("--packed_output", type=str, default=None)
args = parser.parse_args()

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from n2nmn_tpu.models import resnet

H_IMG = W_IMG = 448  # -> 14x14 res5c grid (reference feature shape)

import torch
sd = torch.load(args.resnet_weights, map_location="cpu",
                weights_only=True)
sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
params = resnet.from_torchvision_state_dict(sd)


@jax.jit
def extract(batch_rgb01):
    return resnet.resnet152_res5c(params, batch_rgb01)


def load_image(path):
    im = Image.open(path).convert("RGB").resize((W_IMG, H_IMG))
    return np.asarray(im, np.float32) / 255.0


for image_set in args.image_sets.split(":"):
    image_list = sorted(glob.glob(
        os.path.join(args.image_dir, image_set, "*.jpg")))
    if not image_list:
        print(f"no images for set {image_set}; skipping")
        continue
    out_dir = os.path.join(args.out_dir, image_set)
    os.makedirs(out_dir, exist_ok=True)
    packed = None
    for i0 in range(0, len(image_list), args.batch_size):
        paths = image_list[i0:i0 + args.batch_size]
        batch = np.stack([load_image(p) for p in paths])
        pad = args.batch_size - len(paths)
        if pad:
            batch = np.concatenate(
                [batch, np.zeros((pad,) + batch.shape[1:], np.float32)])
        feats = np.asarray(extract(jnp.asarray(batch)))[:len(paths)]
        if packed is None and args.packed_output:
            packed = np.zeros((len(image_list),) + feats.shape[1:],
                              np.float32)
        for j, p in enumerate(paths):
            name = os.path.basename(p).rsplit(".", 1)[0]
            np.save(os.path.join(out_dir, name + ".npy"),
                    feats[j:j + 1])
            if packed is not None:
                packed[i0 + j] = feats[j]
        if (i0 // args.batch_size) % 50 == 0:
            print(f"{image_set}: {i0 + len(paths)} / {len(image_list)}",
                  flush=True)
    if packed is not None:
        out = (args.packed_output.replace("%s", image_set)
               if "%s" in args.packed_output
               else args.packed_output + f".{image_set}.npy")
        np.save(out, packed)
        print(f"packed features written to {out}")
