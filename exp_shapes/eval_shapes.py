"""SHAPES evaluation (CLI surface mirrors reference
exp_shapes/eval_shapes.py: --exp_name --snapshot_name --test_split)."""
import argparse
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--exp_name", required=True)
parser.add_argument("--snapshot_name", required=True)
parser.add_argument("--test_split", required=True)
parser.add_argument("--gpu_id", type=int, default=0)
parser.add_argument("--T_decoder", type=int, default=11)
parser.add_argument("--data_root", type=str, default=None)
parser.add_argument("--mask_mode", type=str, default="eos_force",
                    choices=["eos_force", "grammar"])
args = parser.parse_args()

import dataclasses
from n2nmn_tpu.experiments import shapes

cfg = shapes.ShapesConfig(T_decoder=args.T_decoder,
                          mask_mode=args.mask_mode)
if args.data_root is not None:
    cfg = dataclasses.replace(cfg, root=args.data_root)
shapes.evaluate(cfg, args.exp_name, args.snapshot_name, args.test_split)
