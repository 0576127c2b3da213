"""CLEVR functional program -> expert module layout (RPN).

Re-derivation of the reference's offline preprocessing
(exp_clevr/data/get_ground_truth_layout.py): map each CLEVR program
function to a module, prune the count/query nodes feeding comparison
functions, post-order-traverse from the root to RPN, and rewrite
_Scene+_Filter pairs to _Find."""

from __future__ import annotations

import json

import numpy as np

FUNCTION2MODULE = {
    "filter_color": "_Filter", "filter_material": "_Filter",
    "filter_shape": "_Filter", "filter_size": "_Filter",
    "same_color": "_FindSameProperty", "same_material": "_FindSameProperty",
    "same_shape": "_FindSameProperty", "same_size": "_FindSameProperty",
    "relate": "_Transform",
    "intersect": "_And", "union": "_Or",
    "count": "_Count", "exist": "_Exist",
    "equal_integer": "_EqualNum", "greater_than": "_MoreNum",
    "less_than": "_LessNum",
    "equal_color": "_SameProperty", "equal_material": "_SameProperty",
    "equal_shape": "_SameProperty", "equal_size": "_SameProperty",
    "query_color": "_Describe", "query_material": "_Describe",
    "query_shape": "_Describe", "query_size": "_Describe",
    "scene": "_Scene",
    "unique": None,
}

_COMPARISON_FNS = {"equal_integer", "greater_than", "less_than",
                   "equal_color", "equal_material", "equal_shape",
                   "equal_size"}
_PRUNABLE_INPUT_FNS = {"count", "query_color", "query_material",
                       "query_shape", "query_size"}


def _fn_name(node):
    # CLEVR v1.0 question files use 'function'; some dumps use 'type'
    return node["function"] if "function" in node else node["type"]


def _prune_comparison_inputs(program):
    """Comparison functions' count/query input nodes are dropped so the
    comparison module reads the attention maps directly."""
    for f in program:
        if f and _fn_name(f) in _COMPARISON_FNS:
            assert len(f["inputs"]) == 2
            for slot in (0, 1):
                inp = program[f["inputs"][slot]]
                if _fn_name(inp) in _PRUNABLE_INPUT_FNS:
                    assert len(inp["inputs"]) == 1
                    program[f["inputs"][slot]] = None
                    f["inputs"][slot] = inp["inputs"][0]
    return program


def _postorder(program, i):
    out = []
    for j in program[i]["inputs"]:
        out += _postorder(program, j)
    out.append(_fn_name(program[i]))
    return out


def linearize_program(question):
    """question dict with 'program' -> expert layout (list of module
    names in RPN)."""
    program = _prune_comparison_inputs(
        [dict(f) if f else None for f in question["program"]])
    is_root = np.array([f is not None for f in program])
    for f in program:
        if f is not None:
            is_root[f["inputs"]] = False
    if np.sum(is_root) != 1:
        assert np.sum(is_root) >= 1
        not_scene = np.array(
            [not (f and _fn_name(f) == "scene") for f in program])
        is_root = np.logical_and(is_root, not_scene)
        assert np.sum(is_root) == 1
    root = int(np.argmax(is_root))

    funcs = _postorder(program, root)
    modules = [FUNCTION2MODULE[f] for f in funcs]
    out = modules[:]
    for n in range(1, len(modules)):
        if modules[n - 1] == "_Scene" and modules[n] == "_Filter":
            out[n - 1] = None
            out[n] = "_Find"
    return [m for m in out if m is not None]


def add_gt_layout(question_file, save_file):
    """CLI-compatible with the reference script: annotate every question
    that has a program with its gt_layout."""
    with open(question_file) as f:
        questions = json.load(f)["questions"]
    for n_q, q in enumerate(questions):
        if (n_q + 1) % 1000 == 0:
            print(f"processing {n_q + 1} / {len(questions)}")
        if "program" in q:
            q["gt_layout"] = linearize_program(q)
    with open(save_file, "w") as f:
        json.dump(questions, f)
