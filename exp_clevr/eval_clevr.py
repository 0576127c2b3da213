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
args = parser.parse_args()

import dataclasses
from n2nmn_tpu.experiments import clevr

cfg = clevr.ClevrConfig()
if args.data_root is not None:
    cfg = dataclasses.replace(cfg, root=args.data_root)
clevr.evaluate(cfg, args.exp_name, args.snapshot_name, args.test_split,
               T_decoder=args.T_decoder)
