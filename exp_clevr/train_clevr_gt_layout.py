"""CLEVR behavioral cloning of expert layouts (CLI surface mirrors
reference exp_clevr/train_clevr_gt_layout.py)."""
import argparse
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--gpu_id", type=int, default=0)
parser.add_argument("--max_iter", type=int, default=None)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--exp_name", type=str, default="clevr_gt_layout")
parser.add_argument("--data_root", type=str, default=None)
parser.add_argument("--from_images", action="store_true",
                    help="train on raw images via in-graph frozen VGG "
                         "pool5 (no offline feature dump)")
parser.add_argument("--vgg_weights", type=str, default=None)
parser.add_argument("--image_H", type=int, default=320)
parser.add_argument("--image_W", type=int, default=480)
parser.add_argument("--device_data", action="store_true",
                    help="stage the whole feature set in HBM and train in "
                         "jitted chunks (experiments/clevr.py:device_data)")
parser.add_argument("--device_data_bf16", action="store_true",
                    help="stage features as bf16 (halves HBM residency)")
parser.add_argument("--scene_ext", action="store_true",
                    help="framework extension: learned objectness _Scene "
                         "attention (must match the snapshot)")
parser.add_argument("--num_mlp_ext", action="store_true",
                    help="framework extension: MLP heads for the count-"
                         "comparison modules (experiments/clevr.py)")
parser.add_argument("--num_res_ext", action="store_true",
                    help="framework extension: residual MLP count-"
                         "comparison heads (experiments/clevr.py)")
parser.add_argument("--scene_bounded", action="store_true",
                    help="modifier on --scene_ext: sigmoid-bounded "
                         "objectness (experiments/clevr.py)")
parser.add_argument("--count_mlp_ext", action="store_true",
                    help="framework extension: MLP _Count head "
                         "(experiments/clevr.py)")
parser.add_argument("--pretrained_model", type=str, default=None,
                    help="warm-start weights (continuation probes; the "
                         "reference only warm-starts its RL configs)")
args = parser.parse_args()

import dataclasses
from n2nmn_tpu.experiments import clevr

cfg = clevr.ClevrConfig(exp_name=args.exp_name, seed=args.seed,
                        num_mlp_ext=args.num_mlp_ext,
                        num_res_ext=args.num_res_ext,
                        count_mlp_ext=args.count_mlp_ext,
                        scene_bounded=args.scene_bounded,
                        scene_ext=args.scene_ext)
if args.max_iter is not None:
    cfg = dataclasses.replace(cfg, max_iter=args.max_iter)
if args.data_root is not None:
    cfg = dataclasses.replace(cfg, root=args.data_root)
if args.from_images:
    cfg = dataclasses.replace(cfg, from_images=True,
                              vgg_weights=args.vgg_weights,
                              image_H=args.image_H, image_W=args.image_W)
if args.device_data or args.device_data_bf16:
    cfg = dataclasses.replace(cfg, device_data=True,
                              device_data_bf16=args.device_data_bf16)
clevr.train(cfg, pretrained_model=args.pretrained_model)
