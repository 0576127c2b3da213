"""Visualize SHAPES module attentions for a trained snapshot (script
replacement for reference exp_shapes/visualize_shapes.ipynb)."""
import argparse
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--exp_name", required=True)
parser.add_argument("--snapshot_name", required=True)
parser.add_argument("--test_split", default="val")
parser.add_argument("--num_examples", type=int, default=8)
parser.add_argument("--out_dir", default=None)
parser.add_argument("--data_root", type=str, default=None)
args = parser.parse_args()

import jax
import numpy as np
from n2nmn_tpu.experiments import shapes
from n2nmn_tpu.data.shapes import load_shapes_split
from n2nmn_tpu.train.checkpoint import load_params
from n2nmn_tpu.tools.visualize import run_with_attentions, save_attention_maps

cfg = shapes.ShapesConfig()
if args.data_root:
    import dataclasses
    cfg = dataclasses.replace(cfg, root=args.data_root)
model, grammar = shapes.build_model(cfg, sampling=False, dropout=False)
data = load_shapes_split(
    cfg.root, args.test_split.split(":"),
    os.path.join(cfg.root, "data", "vocabulary_shape.txt"),
    grammar, cfg.T_encoder, cfg.T_decoder, load_gt_layout=False)

params_t = model.init(jax.random.PRNGKey(0))
params, _ = load_params(
    os.path.join(cfg.root, "tfmodel", args.exp_name, args.snapshot_name),
    params_t)

n = min(args.num_examples, data.num_questions)
result = run_with_attentions(
    model, params,
    data.text_seq[:, :n], data.seq_length[:n], data.images[:n],
    jax.random.PRNGKey(0))
out_dir = args.out_dir or os.path.join(
    cfg.root, "results", args.exp_name, "attention_maps")
save_attention_maps(result, out_dir, answer_words=["false", "true"])
print(f"wrote {n} examples to {out_dir}")
for i in range(n):
    mods = [m for m in result["module_names"][i] if m != "<eos>"]
    print(f"example {i}: layout={' '.join(mods)} "
          f"prediction={['false', 'true'][result['predictions'][i]]}")
