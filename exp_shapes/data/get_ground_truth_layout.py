"""Build SHAPES expert layout files from .query S-expressions (script
replacement for the reference's get_ground_truth_layout.ipynb; produces
byte-identical layouts — differentially tested against every shipped
*_layout_symbols.json)."""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from n2nmn_tpu.data.builders.shapes_layouts import build_layout_file

parser = argparse.ArgumentParser()
parser.add_argument("--dataset_dir", type=str,
                    default="./exp_shapes/shapes_dataset")
parser.add_argument("--out_dir", type=str, default="./exp_shapes/data")
args = parser.parse_args()

for qf in sorted(glob.glob(os.path.join(args.dataset_dir, "*.query"))):
    split = os.path.basename(qf)[:-len(".query")]
    sf = os.path.join(args.out_dir, f"{split}.query_layout_symbols.json")
    layouts = build_layout_file(qf, sf)
    print(f"wrote {sf} ({len(layouts)} layouts)")
