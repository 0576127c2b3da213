"""VQA v2 behavioral cloning (CLI mirrors reference
exp_vqa/train_vqa2_gt_layout.py)."""
import argparse, sys, os, dataclasses
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
parser = argparse.ArgumentParser()
parser.add_argument("--gpu_id", type=int, default=0)
parser.add_argument("--max_iter", type=int, default=None)
parser.add_argument("--exp_name", type=str, default="vqa2_gt_layout")
parser.add_argument("--data_root", type=str, default=None)
parser.add_argument("--imdb_trn", type=str, default=None,
                    help="training imdb path relative to the data root "
                         "(e.g. data/imdb/imdb_trn.npy for mini-VQA)")
parser.add_argument("--seed", type=int, default=None)
parser.add_argument("--device_data_bf16", action="store_true",
                    help="chunked device-resident trainer w/ bf16 image "
                         "staging + on-device answer sampling (required "
                         "at the real 14x14x2048 geometry)")
parser.add_argument("--from_images", action="store_true",
                    help="train on raw COCO images via in-graph frozen "
                         "ResNet-152 res5c (no 307 GB feature dump)")
parser.add_argument("--resnet_weights", type=str, default=None)
args = parser.parse_args()
from n2nmn_tpu.experiments import vqa
cfg = vqa.VqaConfig(exp_name=args.exp_name)
IS_V2 = "2" == "2"
if IS_V2:
    cfg = vqa.v2_config(base=cfg, exp_name=args.exp_name)
if args.max_iter is not None:
    cfg = dataclasses.replace(cfg, max_iter=args.max_iter)
if args.data_root is not None:
    cfg = dataclasses.replace(cfg, root=args.data_root)
if args.imdb_trn is not None:
    cfg = dataclasses.replace(cfg, imdb_trn=args.imdb_trn)
if args.seed is not None:
    cfg = dataclasses.replace(cfg, seed=args.seed)
if args.device_data_bf16:
    cfg = dataclasses.replace(cfg, device_data_bf16=True)
if args.from_images:
    cfg = dataclasses.replace(cfg, from_images=True,
                              resnet_weights=args.resnet_weights)
vqa.train(cfg)
