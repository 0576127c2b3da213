"""SHAPES behavioral cloning of expert layouts (CLI surface mirrors
reference exp_shapes/train_shapes_gt_layout.py; --gpu_id is accepted for
compatibility and maps to a JAX device index)."""
import argparse
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--gpu_id", type=int, default=0)  # device index
parser.add_argument("--max_iter", type=int, default=None)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--exp_name", type=str, default="shapes_gt_layout")
parser.add_argument("--data_root", type=str, default=None)
parser.add_argument("--resume", action="store_true")
args = parser.parse_args()

import dataclasses
from n2nmn_tpu.experiments import shapes

cfg = shapes.ShapesConfig(exp_name=args.exp_name, resume=args.resume, seed=args.seed)
if args.max_iter is not None:
    cfg = dataclasses.replace(cfg, max_iter=args.max_iter)
if args.data_root is not None:
    cfg = dataclasses.replace(cfg, root=args.data_root)
shapes.train(cfg)
