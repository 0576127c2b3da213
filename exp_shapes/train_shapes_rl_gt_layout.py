"""SHAPES policy-search fine-tune from a cloning snapshot (framework
extension; no reference SHAPES analogue — hyperparameters follow the
CLEVR/VQA rl scripts)."""
import argparse
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--gpu_id", type=int, default=0)
parser.add_argument(
    "--pretrained_model", type=str,
    default="./exp_shapes/tfmodel/shapes_gt_layout/00040000")
parser.add_argument("--max_iter", type=int, default=None)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--exp_name", type=str, default="shapes_rl_gt_layout")
parser.add_argument("--data_root", type=str, default=None)
parser.add_argument("--resume", action="store_true")
args = parser.parse_args()

from n2nmn_tpu.experiments import shapes

overrides = {"exp_name": args.exp_name, "resume": args.resume,
             "seed": args.seed}
if args.max_iter is not None:
    overrides["max_iter"] = args.max_iter
if args.data_root is not None:
    overrides["root"] = args.data_root
cfg = shapes.rl_config(**overrides)
shapes.train(cfg, pretrained_model=args.pretrained_model)
