"""SHAPES S-expression query -> expert module layout.

Replaces the reference's get_ground_truth_layout.ipynb (which used the
sexpdata package) with a self-contained S-expression parser. Semantics:
leaf attribute words become _Find; spatial relations (above/below/
left_of/right_of) become _Transform; "is" becomes _Answer; ternary nodes
fuse their two argument subtrees with _And; queries containing "'" are
degenerate and map to a bare ("none" -> _Find) leaf, exactly as the
notebook did. Output is the postorder RPN token list."""

from __future__ import annotations

import json

RELATIONS = {"above", "below", "left_of", "right_of"}


def parse_sexpr(text):
    """Minimal S-expression parser: returns nested tuples of strings."""
    tokens = text.replace("(", " ( ").replace(")", " ) ").split()
    pos = 0

    def parse():
        nonlocal pos
        tok = tokens[pos]
        pos += 1
        if tok == "(":
            items = []
            while tokens[pos] != ")":
                items.append(parse())
            pos += 1  # consume ')'
            return tuple(items)
        return tok

    result = parse()
    if pos != len(tokens):
        raise ValueError(f"trailing tokens in s-expression: {text!r}")
    return result


def parse_tree(line):
    # queries containing a quote are degenerate in the reference notebook
    if "'" in line:
        return "none"
    return parse_sexpr(line.strip())


def layout_from_parsing(parse):
    if isinstance(parse, str):
        return ("_Find",)
    head = parse[0]
    if len(parse) > 2:  # fuse multiple argument subtrees with _And
        assert len(parse) == 3
        below = ("_And", layout_from_parsing(parse[1]),
                 layout_from_parsing(parse[2]))
    else:
        below = layout_from_parsing(parse[1])
    if head == "is":
        module = "_Answer"
    elif head in RELATIONS:
        module = "_Transform"
    else:
        raise ValueError(f"unknown head {head!r}")
    return (module, below)


def flatten_layout(module_layout):
    """Postorder traversal -> Reverse Polish Notation token list."""
    if isinstance(module_layout, str):
        return [module_layout]
    rpn = []
    for m in module_layout[1:]:
        rpn += flatten_layout(m)
    rpn += [module_layout[0]]
    return rpn


def query_to_layout(line):
    return flatten_layout(layout_from_parsing(parse_tree(line)))


def build_layout_file(query_file, save_file):
    with open(query_file) as f:
        layouts = [query_to_layout(line) for line in f]
    with open(save_file, "w") as f:
        json.dump(layouts, f)
    return layouts
