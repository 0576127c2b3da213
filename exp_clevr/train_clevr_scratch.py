"""CLEVR policy search from scratch (CLI surface mirrors reference
exp_clevr/train_clevr_scratch.py)."""
import argparse
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--gpu_id", type=int, default=0)
parser.add_argument("--max_iter", type=int, default=None)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--exp_name", type=str, default="clevr_scratch")
parser.add_argument("--data_root", type=str, default=None)
parser.add_argument("--from_images", action="store_true",
                    help="raw images via in-graph frozen VGG pool5")
parser.add_argument("--vgg_weights", type=str, default=None)
parser.add_argument("--device_data", action="store_true",
                    help="stage the whole training set in HBM, train in "
                         "jitted chunks (experiments/clevr.py:device_data)")
parser.add_argument("--device_data_bf16", action="store_true",
                    help="device_data with bf16 feature staging")
parser.add_argument("--scene_ext", action="store_true",
                    help="framework extension: learned objectness _Scene "
                         "attention (must match the snapshot)")
parser.add_argument("--num_mlp_ext", action="store_true",
                    help="framework extension: MLP heads for the count-"
                         "comparison modules (experiments/clevr.py)")
args = parser.parse_args()

from n2nmn_tpu.experiments import clevr

overrides = {"exp_name": args.exp_name, "seed": args.seed,
             "num_mlp_ext": args.num_mlp_ext,
             "scene_ext": args.scene_ext}
if args.max_iter is not None:
    overrides["max_iter"] = args.max_iter
if args.data_root is not None:
    overrides["root"] = args.data_root
if args.from_images:
    overrides.update(from_images=True, vgg_weights=args.vgg_weights)
if args.device_data or args.device_data_bf16:
    overrides.update(device_data=True,
                     device_data_bf16=args.device_data_bf16)
cfg = clevr.scratch_config(**overrides)
clevr.train(cfg)
