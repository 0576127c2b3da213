"""SHAPES REINFORCE policy search from scratch (CLI surface mirrors
reference exp_shapes/train_shapes_scratch.py)."""
import argparse
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--gpu_id", type=int, default=0)
parser.add_argument("--max_iter", type=int, default=None)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--exp_name", type=str, default="shapes_scratch")
parser.add_argument("--data_root", type=str, default=None)
parser.add_argument("--mask_mode", type=str, default="eos_force",
                    choices=["eos_force", "grammar"])
parser.add_argument("--resume", action="store_true")
args = parser.parse_args()

from n2nmn_tpu.experiments import shapes

overrides = {"exp_name": args.exp_name, "resume": args.resume,
             "mask_mode": args.mask_mode, "seed": args.seed}
if args.max_iter is not None:
    overrides["max_iter"] = args.max_iter
if args.data_root is not None:
    overrides["root"] = args.data_root
cfg = shapes.scratch_config(**overrides)
shapes.train(cfg)
