"""Mini-CLEVR: a synthetic benchmark exercising the FULL 14-module CLEVR
vocabulary with self-consistent ground truth.

The real CLEVR dataset is unavailable in this environment (DATA_NOTES.md);
this generator produces grid-world scenes, programs drawn from every
module family, templated questions whose words carry the modules' text
parameters, expert layouts, and programmatically evaluated answers — in
the exact imdb + feature-file format the CLEVR pipeline consumes, so the
standard exp_clevr drivers run on it via --data_root.

Scene: 4x4 grid; each occupied cell has (color in 5, shape in 4).
Features per cell: [one-hot color | one-hot shape | occupied | noise] =
16 channels (the "CNN features" a backbone would produce).

Module semantics (what the answers are computed from):
  Find[w]      cells with attribute w
  Filter[w]    input ∩ Find[w]
  Transform[r] cells one step r of the input cells (shift)
  And / Or     intersection / union
  Exist        non-empty -> yes/no
  Count        |input| -> "0".."9"
  EqualNum / MoreNum / LessNum   compare |A|, |B| -> yes/no
  SameProperty[p]      unique objects of A and B agree on p -> yes/no
  FindSameProperty[p]  cells sharing p with A's unique object, minus it
  Describe[p]  property p of A's unique object
  Scene        all occupied cells
"""

from __future__ import annotations

import os

import numpy as np

COLORS = ["red", "blue", "green", "yellow", "purple"]
SHAPES = ["cube", "sphere", "cylinder", "cone"]
RELS = {"left": (0, -1), "right": (0, 1), "above": (-1, 0),
        "below": (1, 0)}
GRID = 4
D_FEAT = 16
ANSWERS = ["yes", "no"] + [str(i) for i in range(10)] + COLORS + SHAPES


def cells_with(scene, word):
    return {pos for pos, (c, s) in scene.items() if word in (c, s)}


def shift(cells, rel):
    dr, dc = RELS[rel]
    return {(r + dr, c + dc) for (r, c) in cells
            if 0 <= r + dr < GRID and 0 <= c + dc < GRID}


def render_features(scene, rng):
    feat = np.zeros((GRID, GRID, D_FEAT), np.float32)
    for (r, c), (color, shape) in scene.items():
        feat[r, c, COLORS.index(color)] = 1.0
        feat[r, c, 5 + SHAPES.index(shape)] = 1.0
        feat[r, c, 9] = 1.0  # occupancy
    feat[:, :, 10:] = rng.randn(GRID, GRID, D_FEAT - 10) * 0.1
    return feat


# flagship-geometry variant: same 4x4 semantics embedded in the REAL
# CLEVR feature shape (10x15x512, reference train_clevr_gt_layout.py
# H_FEAT/W_FEAT/D_FEAT) so a model trained on it has flagship-sized
# tensors end to end. Each semantic cell renders as a BLOCK x BLOCK
# tile (a one-semantic-cell _Transform shift = BLOCK=2 physical cells,
# within the k=5 transform conv's +/-2 reach).
#
# v2 (round 4). The round-3 renderers filled the 502 extra channels with
# per-image iid noise; that noise is a unique per-image FINGERPRINT, and
# with one question per image the 512->250 Find conv memorizes
# fingerprint->answer instead of learning the semantic channels
# (measured: flag_gt_clean 99.9-100% on count families on TRAIN vs
# 16-48% on test, while _Scene _Count — the one family whose question
# text AND executor input are constant across examples, so memorization
# is impossible — sits at 17.7% even on train;
# exp_clevr_flag/results/flag_gt_clean/00040000.{trn4k,tst}.txt).
# No real backbone emits scene-independent noise: VGG pool5 channels are
# correlated, signal-bearing, deterministic functions of the image. So
# v2 renders the extra channels as a FIXED random nonnegative projection
# of the 10 semantic channels (one projection per dataset — the "frozen
# backbone"), and generate() shares each scene across several questions
# (real CLEVR: ~10 q/image), so an image fingerprint no longer
# determines the answer.
#
# v2.1: the v2 renderer still added 0.05-sigma per-image sensor noise;
# scene sharing blocks image->answer shortcuts, but (image-fingerprint x
# question)->answer memorization remained expressible and seed-
# dependently won the race on some families (seed 2: count families 20-
# 46% test at 90% train). Real pool5 features carry NO per-image noise —
# they are deterministic of the image — so v2.1 drops it entirely.
FLAG_H, FLAG_W, FLAG_D, BLOCK = 10, 15, 512, 2


def make_flagship_projection(seed=1234):
    """The dataset's frozen 'backbone head': semantic channels ->
    extra channels, shared by every image in the dataset."""
    prng = np.random.RandomState(seed)
    W = (prng.randn(10, FLAG_D - 10) / np.sqrt(10)).astype(np.float32)
    b = (prng.randn(FLAG_D - 10) * 0.1 - 0.1).astype(np.float32)
    return W, b


def render_features_flagship(scene, rng, proj):
    W, b = proj
    sem = np.zeros((FLAG_H, FLAG_W, 10), np.float32)
    for (r, c), (color, shape) in scene.items():
        rs, cs = r * BLOCK, c * BLOCK
        sem[rs:rs + BLOCK, cs:cs + BLOCK, COLORS.index(color)] = 1.0
        sem[rs:rs + BLOCK, cs:cs + BLOCK, 5 + SHAPES.index(shape)] = 1.0
        sem[rs:rs + BLOCK, cs:cs + BLOCK, 9] = 1.0  # occupancy
    feat = np.empty((FLAG_H, FLAG_W, FLAG_D), np.float32)
    feat[:, :, :10] = sem
    # ReLU projection: sparse, nonneg, attribute-dependent — like pool5;
    # deliberately NO per-image noise (v2.1 note above)
    feat[:, :, 10:] = np.maximum(sem @ W + b, 0.0)
    return feat


def sample_scene(rng, n_min=3, n_max=8):
    n = rng.randint(n_min, n_max + 1)
    cells = rng.choice(GRID * GRID, size=n, replace=False)
    return {(int(p) // GRID, int(p) % GRID):
            (COLORS[rng.randint(5)], SHAPES[rng.randint(4)])
            for p in cells}


def _unique(scene, word):
    cells = cells_with(scene, word)
    if len(cells) != 1:
        return None
    (pos,) = cells
    return pos


def _prop(scene, pos, prop):
    color, shape = scene[pos]
    return color if prop == "color" else shape


# each generator returns (layout, question words, answer) or None when the
# sampled scene doesn't support the template's presupposition
def q_exist(rng, scene):
    w = _attr(rng)
    ans = "yes" if cells_with(scene, w) else "no"
    return (["_Find", "_Exist"], f"is there a {w} thing", ans)


def q_count(rng, scene):
    w = _attr(rng)
    return (["_Find", "_Count"], f"how many {w} things are there",
            str(len(cells_with(scene, w))))


def q_filter_count(rng, scene):
    c, s = COLORS[rng.randint(5)], SHAPES[rng.randint(4)]
    n = len(cells_with(scene, c) & cells_with(scene, s))
    return (["_Find", "_Filter", "_Count"],
            f"how many {c} {s} things are there", str(n))


def q_and_exist(rng, scene):
    c, s = COLORS[rng.randint(5)], SHAPES[rng.randint(4)]
    ans = "yes" if cells_with(scene, c) & cells_with(scene, s) else "no"
    return (["_Find", "_Find", "_And", "_Exist"],
            f"is there a thing that is {c} and {s}", ans)


def q_or_count(rng, scene):
    a, b = _attr(rng), _attr(rng)
    n = len(cells_with(scene, a) | cells_with(scene, b))
    return (["_Find", "_Find", "_Or", "_Count"],
            f"how many things are {a} or {b}", str(n))


def q_transform_exist(rng, scene):
    w, rel = _attr(rng), list(RELS)[rng.randint(4)]
    ans = ("yes" if shift(cells_with(scene, w), rel) & set(scene)
           else "no")
    return (["_Find", "_Transform", "_Exist"],
            f"is there a thing {rel} of a {w} thing", ans)


def q_compare_num(rng, scene):
    a, b = _attr(rng), _attr(rng)
    na, nb = len(cells_with(scene, a)), len(cells_with(scene, b))
    kind = rng.randint(3)
    if kind == 0:
        return (["_Find", "_Find", "_EqualNum"],
                f"are there as many {a} things as {b} things",
                "yes" if na == nb else "no")
    if kind == 1:
        return (["_Find", "_Find", "_MoreNum"],
                f"are there more {a} things than {b} things",
                "yes" if na > nb else "no")
    return (["_Find", "_Find", "_LessNum"],
            f"are there fewer {a} things than {b} things",
            "yes" if na < nb else "no")


def q_describe(rng, scene):
    prop = "color" if rng.randint(2) else "shape"
    w = (SHAPES if prop == "color" else COLORS)[
        rng.randint(4 if prop == "color" else 5)]
    pos = _unique(scene, w)
    if pos is None:
        return None
    return (["_Find", "_Describe"],
            f"what {prop} is the {w} thing", _prop(scene, pos, prop))


def q_same_property(rng, scene):
    prop = "color" if rng.randint(2) else "shape"
    pool = SHAPES if prop == "color" else COLORS
    a, b = pool[rng.randint(len(pool))], pool[rng.randint(len(pool))]
    if a == b:
        return None
    pa, pb = _unique(scene, a), _unique(scene, b)
    if pa is None or pb is None:
        return None
    ans = ("yes" if _prop(scene, pa, prop) == _prop(scene, pb, prop)
           else "no")
    return (["_Find", "_Find", "_SameProperty"],
            f"do the {a} thing and the {b} thing have the same {prop}",
            ans)


def q_find_same_property(rng, scene):
    prop = "color" if rng.randint(2) else "shape"
    pool = SHAPES if prop == "color" else COLORS
    w = pool[rng.randint(len(pool))]
    pos = _unique(scene, w)
    if pos is None:
        return None
    value = _prop(scene, pos, prop)
    others = {p for p in cells_with(scene, value) if p != pos}
    return (["_Find", "_FindSameProperty", "_Count"],
            f"how many other things have the same {prop} as the {w} thing",
            str(len(others)))


def q_scene_count(rng, scene):
    return (["_Scene", "_Count"], "how many things are there",
            str(len(scene)))


def _attr(rng):
    return (COLORS + SHAPES)[rng.randint(9)]


TEMPLATES = [q_exist, q_count, q_filter_count, q_and_exist, q_or_count,
             q_transform_exist, q_compare_num, q_describe,
             q_same_property, q_find_same_property, q_scene_count]


def generate(out_root, num_train=40000, num_val=4000, num_test=4000,
             seed=0, flagship=False, q_per_image=1):
    rng = np.random.RandomState(seed)
    if flagship:
        proj = make_flagship_projection()
        render = lambda scene: render_features_flagship(scene, rng, proj)
        q_per_image = max(q_per_image, 4)  # see renderer note: real
        # CLEVR has ~10 q/image; sharing breaks fingerprint->answer
    else:
        render = lambda scene: render_features(scene, rng)
    os.makedirs(os.path.join(out_root, "data", "imdb"), exist_ok=True)
    feat_dir = os.path.join(out_root, "features")
    os.makedirs(feat_dir, exist_ok=True)

    vocab = set()
    img_count = 0

    def make_records(n, tag):
        nonlocal img_count
        records = []
        while len(records) < n:
            scene = sample_scene(rng)
            name = f"mc{img_count:06d}"
            path = os.path.join(feat_dir, name + ".npy")
            # draw up to q_per_image distinct questions on this scene
            # BEFORE rendering, so scenes supporting no template are
            # skipped without writing a feature file
            drawn, seen_q = [], set()
            for _ in range(6 * q_per_image):
                if len(drawn) >= min(q_per_image, n - len(records)):
                    break
                result = TEMPLATES[rng.randint(len(TEMPLATES))](rng, scene)
                if result is None or result[1] in seen_q:
                    continue
                seen_q.add(result[1])
                drawn.append(result)
            if not drawn:
                continue
            img_count += 1
            np.save(path, render(scene)[None])
            for layout, question, answer in drawn:
                tokens = question.split()
                vocab.update(tokens)
                records.append({
                    "image_name": name, "image_path": name + ".png",
                    "feature_path": path, "question_str": question,
                    "question_tokens": tokens,
                    "gt_layout_tokens": layout, "answer": answer,
                })
        return np.array(records)

    for tag, n in [("trn", num_train), ("val", num_val), ("tst", num_test)]:
        np.save(os.path.join(out_root, "data", "imdb", f"imdb_{tag}.npy"),
                make_records(n, tag))
        print(f"{tag}: {n} questions", flush=True)

    with open(os.path.join(out_root, "data",
                           "vocabulary_clevr.txt"), "w") as f:
        f.writelines(w + "\n" for w in sorted(vocab))
    with open(os.path.join(out_root, "data", "answers_clevr.txt"),
              "w") as f:
        f.writelines(a + "\n" for a in ANSWERS)
    # full 15-token CLEVR layout vocabulary
    layout_vocab = ["_Scene", "_Find", "_Filter", "_FindSameProperty",
                    "_Transform", "_And", "_Or", "_Exist", "_Count",
                    "_EqualNum", "_MoreNum", "_LessNum", "_SameProperty",
                    "_Describe", "<eos>"]
    with open(os.path.join(out_root, "data",
                           "vocabulary_layout.txt"), "w") as f:
        f.writelines(t + "\n" for t in layout_vocab)


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--out_root", default="./exp_clevr_mini")
    p.add_argument("--num_train", type=int, default=40000)
    p.add_argument("--num_val", type=int, default=4000)
    p.add_argument("--num_test", type=int, default=4000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--flagship", action="store_true",
                   help="render at the real CLEVR feature geometry "
                        "(10x15x512) — see render_features_flagship")
    p.add_argument("--q_per_image", type=int, default=1,
                   help="questions sharing one scene/image (flagship "
                        "forces >=4)")
    args = p.parse_args()
    generate(args.out_root, num_train=args.num_train,
             num_val=args.num_val, num_test=args.num_test,
             seed=args.seed, flagship=args.flagship,
             q_per_image=args.q_per_image)
