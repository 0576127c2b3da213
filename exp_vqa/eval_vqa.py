"""VQA v1 evaluation -> VQA-server JSON (CLI mirrors reference
exp_vqa/eval_vqa.py)."""
import argparse, sys, os, dataclasses
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
parser = argparse.ArgumentParser()
parser.add_argument("--exp_name", required=True)
parser.add_argument("--snapshot_name", required=True)
parser.add_argument("--test_split", required=True)
parser.add_argument("--gpu_id", type=int, default=0)
parser.add_argument("--data_root", type=str, default=None)
parser.add_argument("--from_images", action="store_true",
                    help="raw COCO image -> in-graph ResNet-152 res5c -> "
                         "answer in ONE program (no 307 GB feature dump)")
parser.add_argument("--resnet_weights", type=str, default=None)
args = parser.parse_args()
from n2nmn_tpu.experiments import vqa
cfg = vqa.VqaConfig()
IS_V2 = "" == "2"
if IS_V2:
    cfg = vqa.v2_config(base=cfg)
if args.data_root is not None:
    cfg = dataclasses.replace(cfg, root=args.data_root)
if args.from_images:
    cfg = dataclasses.replace(cfg, from_images=True,
                              resnet_weights=args.resnet_weights)
vqa.evaluate(cfg, args.exp_name, args.snapshot_name, args.test_split)
