"""CLEVR evaluation (CLI surface mirrors reference exp_clevr/eval_clevr.py:
--exp_name --snapshot_name --test_split)."""
import argparse
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--exp_name", required=True)
parser.add_argument("--snapshot_name", required=True)
parser.add_argument("--test_split", required=True)
parser.add_argument("--gpu_id", type=int, default=0)
parser.add_argument("--T_decoder", type=int, default=20)
parser.add_argument("--data_root", type=str, default=None)
parser.add_argument("--from_images", action="store_true",
                    help="raw image -> in-graph VGG pool5 -> answer in ONE "
                         "program (no offline feature dump)")
parser.add_argument("--vgg_weights", type=str, default=None,
                    help="converted VGG-16 weights (.npz or torchvision "
                         ".pth) for --from_images")
parser.add_argument("--image_H", type=int, default=320)
parser.add_argument("--image_W", type=int, default=480)
parser.add_argument("--scene_ext", action="store_true",
                    help="framework extension: learned objectness _Scene "
                         "attention (must match the snapshot)")
parser.add_argument("--num_mlp_ext", action="store_true",
                    help="framework extension: MLP heads for the count-"
                         "comparison modules (must match the snapshot)")
parser.add_argument("--num_res_ext", action="store_true",
                    help="framework extension: residual MLP count-"
                         "comparison heads (must match the snapshot)")
parser.add_argument("--scene_bounded", action="store_true",
                    help="modifier on --scene_ext: sigmoid-bounded "
                         "objectness (experiments/clevr.py)")
parser.add_argument("--count_mlp_ext", action="store_true",
                    help="framework extension: MLP _Count head "
                         "(must match the snapshot)")
args = parser.parse_args()

import dataclasses
from n2nmn_tpu.experiments import clevr

cfg = clevr.ClevrConfig(num_mlp_ext=args.num_mlp_ext,
                        num_res_ext=args.num_res_ext,
                        count_mlp_ext=args.count_mlp_ext,
                        scene_bounded=args.scene_bounded,
                        scene_ext=args.scene_ext)
if args.data_root is not None:
    cfg = dataclasses.replace(cfg, root=args.data_root)
if args.from_images:
    cfg = dataclasses.replace(cfg, from_images=True,
                              vgg_weights=args.vgg_weights,
                              image_H=args.image_H, image_W=args.image_W)
clevr.evaluate(cfg, args.exp_name, args.snapshot_name, args.test_split,
               T_decoder=args.T_decoder)
