"""VQA Stanford-parse (.sp) -> expert module layouts, qid-keyed.

Script replacement for the reference's convert_new_parse_to_gt_layout.ipynb
(exp_vqa/data/). Parse files hold pre-simplified layout S-expressions like
``(describe (and find find))``; tokens map find->_Find, relate->_Transform,
and->_And, is/describe->_Describe; degenerate lines containing a quote
become a bare _Describe... actually a bare leaf. Every produced layout is
validated through the assembler before saving."""

from __future__ import annotations

import numpy as np

from n2nmn_tpu.data.builders.shapes_layouts import parse_sexpr
from n2nmn_tpu.layout.assembler import Assembler, INVALID_EXPR

PARSE2MODULE = {
    "find": "_Find",
    "relate": "_Transform",
    "and": "_And",
    "is": "_Describe",        # all top modules go to _Describe
    "describe": "_Describe",
}


def parse_tree(line):
    if "'" in line:
        return "none"
    return parse_sexpr(line.strip())


def flatten_layout(parse):
    """Postorder traversal -> RPN module list."""
    if isinstance(parse, str):
        return [PARSE2MODULE[parse]]
    rpn = []
    for m in parse[1:]:
        rpn += flatten_layout(m)
    rpn += [PARSE2MODULE[parse[0]]]
    return rpn


def convert_split(qid_file, parse_file, save_file, vocab_layout_file,
                  T=20):
    with open(qid_file) as f:
        # ids.txt lines are tuples like "(qid, ...)"; take the first field
        qids = [int(s.strip().strip("()").split(",")[0])
                for s in f if s.strip()]
    with open(parse_file) as f:
        layouts = [flatten_layout(parse_tree(l)) for l in f]
    assert len(qids) == len(layouts)

    asm = Assembler(vocab_layout_file)
    layout_set = {tuple(l) for l in layouts}
    print(f"found {len(layout_set)} unique layouts")
    for l in layout_set:
        tokens = np.array(asm.module_list2tokens(list(l), T=T))
        if asm.assemble_one(tokens)["module"] == INVALID_EXPR:
            raise ValueError(f"invalid layout {l}")

    qid2layout = {qid: layout for qid, layout in zip(qids, layouts)}
    np.save(save_file, np.array(qid2layout))
    return qid2layout


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--parse_dir", default="./exp_vqa/data/parse/new_parse")
    p.add_argument("--out_dir", default="./exp_vqa/data")
    p.add_argument("--vocab_layout_file",
                   default="./exp_vqa/data/vocabulary_layout.txt")
    p.add_argument("--splits", default="train2014:val2014")
    p.add_argument("--prefix", default="gt_layout_%s_new_parse.npy")
    args = p.parse_args()
    import os
    for split in args.splits.split(":"):
        convert_split(
            os.path.join(args.parse_dir, f"{split}.ids.txt"),
            os.path.join(args.parse_dir, f"{split}.questions.sp"),
            os.path.join(args.out_dir, args.prefix % split),
            args.vocab_layout_file)
