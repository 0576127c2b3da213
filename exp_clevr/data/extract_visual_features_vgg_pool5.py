"""Extract VGG-16 pool5 features for CLEVR images on-device (CLI surface
mirrors reference exp_clevr/data/extract_visual_features_vgg_pool5.py,
which ran image-by-image through TF; here images run in batches through
the jitted bfloat16 conv stack on the TPU).

In addition to the reference's per-image .npy layout (29 GB of small
files), --packed_output writes one packed float32 array the data readers
can mmap+gather natively (n2nmn_tpu/native/io.py)."""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--gpu_id", type=int, default=0)
parser.add_argument("--image_dir", type=str,
                    default="./exp_clevr/clevr-dataset/images/")
parser.add_argument("--out_dir", type=str,
                    default="./exp_clevr/data/vgg_pool5/")
parser.add_argument("--vgg_weights", type=str, required=True,
                    help=".npz (conv*/weights HWIO) or torchvision .pth")
parser.add_argument("--image_sets", type=str, default="train:val:test")
parser.add_argument("--batch_size", type=int, default=32)
parser.add_argument("--packed_output", type=str, default=None)
args = parser.parse_args()

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from n2nmn_tpu.models.backbones import vgg16_pool5
from n2nmn_tpu.models import vgg_convert

H_IMG, W_IMG = 320, 480  # reference resizes to 480x320 (vgg_net.py usage)

if args.vgg_weights.endswith(".npz"):
    params = vgg_convert.from_npz(args.vgg_weights)
else:
    params = vgg_convert.from_torchvision_file(args.vgg_weights)


@jax.jit
def extract(batch_bgr):
    return vgg16_pool5(params, batch_bgr)


def load_image_bgr(path):
    im = Image.open(path).convert("RGB").resize((W_IMG, H_IMG))
    arr = np.asarray(im, np.float32)
    return arr[:, :, ::-1]  # RGB -> BGR (reference channel convention)


for image_set in args.image_sets.split(":"):
    image_list = sorted(glob.glob(
        os.path.join(args.image_dir, image_set, "*.png")))
    if not image_list:
        print(f"no images for set {image_set}; skipping")
        continue
    out_dir = os.path.join(args.out_dir, image_set)
    os.makedirs(out_dir, exist_ok=True)
    packed = None
    for i0 in range(0, len(image_list), args.batch_size):
        paths = image_list[i0:i0 + args.batch_size]
        batch = np.stack([load_image_bgr(p) for p in paths])
        # pad to full batch for one compiled shape
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
            np.save(os.path.join(out_dir, name + ".npy"), feats[j:j + 1])
            if packed is not None:
                packed[i0 + j] = feats[j]
        if (i0 // args.batch_size) % 20 == 0:
            print(f"{image_set}: {i0 + len(paths)} / {len(image_list)}",
                  flush=True)
    if packed is not None:
        packed_path = args.packed_output.replace("%s", image_set) \
            if "%s" in args.packed_output else (
                args.packed_output + f".{image_set}.npy")
        np.save(packed_path, packed)
        print(f"packed features written to {packed_path}")
