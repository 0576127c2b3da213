"""VQA parse->layout conversion tests (the full differential test against
the shipped 121k-entry file runs against /root/reference when present)."""

import os

import numpy as np
import pytest

from n2nmn_tpu.data.builders.vqa_layouts import (
    parse_tree, flatten_layout)


def test_flatten_layout_forms():
    assert flatten_layout(parse_tree("(describe find)")) == \
        ["_Find", "_Describe"]
    assert flatten_layout(parse_tree("(is (and find find))")) == \
        ["_Find", "_Find", "_And", "_Describe"]
    assert flatten_layout(parse_tree(
        "(describe (relate (and find find)))")) == \
        ["_Find", "_Find", "_And", "_Transform", "_Describe"]


REF_DIR = "/root/reference/exp_vqa/data"


@pytest.mark.skipif(not os.path.exists(REF_DIR), reason="no reference")
def test_matches_shipped_val2014(tmp_path):
    from n2nmn_tpu.data.builders.vqa_layouts import convert_split
    mine = convert_split(
        f"{REF_DIR}/parse/new_parse/val2014.ids.txt",
        f"{REF_DIR}/parse/new_parse/val2014.questions.sp",
        str(tmp_path / "out.npy"),
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
            "exp_vqa/data/vocabulary_layout.txt"))
    shipped = np.load(f"{REF_DIR}/gt_layout_val2014_new_parse.npy",
                      allow_pickle=True)[()]
    assert len(mine) == len(shipped)
    for qid, lay in shipped.items():
        assert list(mine[qid]) == list(lay)
