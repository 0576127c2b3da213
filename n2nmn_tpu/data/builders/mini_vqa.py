"""Mini-VQA: a synthetic benchmark exercising the FULL VQA training
stack — the 4-module vocabulary {_Find, _Transform, _And, _Describe}
(reference exp_vqa/data/vocabulary_layout.txt), multi-annotator answer
records with per-iteration answer sampling (reference
util/vqa_train/data_reader.py:106-109), the question-prior net, GloVe
embedding init, "how many" count-questions (the _Describe→_Count rewrite
target, data_reader.py:118-122), out-of-vocab answers mapping to <unk>,
and VQA-server JSON output + the official VQA accuracy metric.

The real VQA v1/v2 datasets are unavailable here (zero egress,
DATA_NOTES.md); this generator produces grid-world scenes in the exact
imdb format util/vqa_train/data_reader.py consumes, so the standard
exp_vqa drivers run on it via --data_root. Unlike mini-CLEVR, every
layout ends in _Describe — matching the real parser output where
_Describe is the only answer module (models_vqa/nmn3_modules.py).

Answer records mimic VQA's 10 human annotators: each gives the true
answer w.p. ANNOTATOR_P, else a same-type distractor (count off-by-one,
wrong color/shape, flipped yes/no), and a small fraction of answers are
out-of-vocabulary junk that the imdb builder maps to <unk> (reference
exp_vqa/data/build_vqa_imdb.py:66-73). Per-iteration sampling from
these 10 answers is therefore *meaningful* label noise, and the official
VQA accuracy min(#agreeing/3, 1) is computable locally
(data/vqa_grader.py) — standing in for the test server the reference
needs.

Module semantics (VQA flavor — _Transform is the attention-readout
variant, reference models_vqa/nmn3_modules.py:123-171, so its synthetic
semantics is property-matching, not spatial shift):
  _Find[w]       cells with attribute w
  _And           intersection
  _Transform[p]  cells sharing property p with the unique attended
                 object, excluding it
  _Describe[q]   question-conditioned answer over the softmax readout
                 of the attended cells (exist / count / property value)
"""

from __future__ import annotations

import os

import numpy as np

COLORS = ["red", "blue", "green", "yellow", "purple"]
SHAPES = ["cube", "sphere", "cylinder", "cone"]
GRID = 6
D_FEAT = 16

# ---- flagship geometry (VERDICT r4 missing #2) ----
# Same grid-world semantics rendered at the REAL VQA feature geometry:
# 14x14x2048 res5c features with the real 17742-word question vocabulary,
# real 3001-answer list (vendored exp_vqa/data/, reference
# exp_vqa/data/{vocabulary_vqa,answers_vqa}.txt) and fake-GloVe-300 init
# for the full vocab — so the trained model has flagship-sized tensors
# end to end (17742x300 embedding, lstm 1000, 2048-channel modules,
# 3001-way head; reference train_vqa_gt_layout.py:23-59).
#
# Renderer applies the CLEVR-flagship v2.1 lessons (mini_clevr.py):
# the 2038 extra channels are a FIXED nonneg ReLU projection of the 10
# semantic channels (a frozen "backbone head" shared by the dataset —
# res5c-like: correlated, signal-bearing, deterministic of the image; NO
# per-image noise), and scenes are shared across several questions
# (q_per_image) so an image fingerprint cannot determine the answer.
# Semantic cells render as 2x2 blocks: 7x7 grid -> 14x14 cells.
FLAG_GRID = 7
FLAG_H = FLAG_W = 14
FLAG_D = 2048
FLAG_BLOCK = 2
# cube/sphere/cylinder are NOT in the real 3001-answer list; these four
# are in both the real vocab and the real answers (checked at build time)
FLAG_SHAPES = ["circle", "square", "triangle", "star"]
ANNOTATOR_P = 0.85     # per-annotator probability of the true answer
JUNK_P = 0.02          # probability an annotator answer is OOV junk
NUM_ANNOTATORS = 10
# answers file MUST start with <unk> (reference eval_vqa.py:105)
ANSWERS = ["<unk>", "yes", "no"] + [str(i) for i in range(10)] \
    + COLORS + SHAPES
JUNK = ["dunno", "maybe", "nothing"]


def cells_with(scene, word):
    return {pos for pos, (c, s) in scene.items() if word in (c, s)}


def render_features(scene, rng):
    feat = np.zeros((GRID, GRID, D_FEAT), np.float32)
    for (r, c), (color, shape) in scene.items():
        feat[r, c, COLORS.index(color)] = 1.0
        feat[r, c, 5 + SHAPES.index(shape)] = 1.0
        feat[r, c, 9] = 1.0  # occupancy
    feat[:, :, 10:] = rng.randn(GRID, GRID, D_FEAT - 10) * 0.1
    return feat


def sample_scene(rng, n_min=3, n_max=9):
    n = rng.randint(n_min, n_max + 1)
    cells = rng.choice(GRID * GRID, size=n, replace=False)
    return {(int(p) // GRID, int(p) % GRID):
            (COLORS[rng.randint(5)], SHAPES[rng.randint(4)])
            for p in cells}


def _attr(rng):
    return (COLORS + SHAPES)[rng.randint(9)]


def _unique(scene, word):
    cells = cells_with(scene, word)
    if len(cells) != 1:
        return None
    (pos,) = cells
    return pos


def _prop(scene, pos, prop):
    color, shape = scene[pos]
    return color if prop == "color" else shape


# Each template returns (layout, question string, true answer) or None
# when the sampled scene doesn't support the template's presupposition.
def q_exist(rng, scene):
    w = _attr(rng)
    ans = "yes" if cells_with(scene, w) else "no"
    return (["_Find", "_Describe"], f"is there a {w} thing", ans,
            [w, None])


def q_count(rng, scene):
    # "how many" prefix marks these for the _Describe->_Count rewrite
    # (reference util/vqa_train/data_reader.py:118-122); the layout ends
    # in _Describe like every parsed VQA layout
    w = _attr(rng)
    return (["_Find", "_Describe"], f"how many {w} things are there",
            str(len(cells_with(scene, w))), [w, None])


def q_describe(rng, scene):
    prop = "color" if rng.randint(2) else "shape"
    w = (SHAPES if prop == "color" else COLORS)[
        rng.randint(4 if prop == "color" else 5)]
    pos = _unique(scene, w)
    if pos is None:
        return None
    return (["_Find", "_Describe"],
            f"what {prop} is the {w} thing", _prop(scene, pos, prop),
            [w, prop])


def q_and_exist(rng, scene):
    c, s = COLORS[rng.randint(5)], SHAPES[rng.randint(4)]
    ans = "yes" if cells_with(scene, c) & cells_with(scene, s) else "no"
    return (["_Find", "_Find", "_And", "_Describe"],
            f"is there a {c} {s} in the picture", ans,
            [c, s, None, None])


def q_and_count(rng, scene):
    c, s = COLORS[rng.randint(5)], SHAPES[rng.randint(4)]
    n = len(cells_with(scene, c) & cells_with(scene, s))
    return (["_Find", "_Find", "_And", "_Describe"],
            f"how many {c} {s} things are there", str(n),
            [c, s, None, None])


def q_transform_exist(rng, scene):
    prop = "color" if rng.randint(2) else "shape"
    pool = SHAPES if prop == "color" else COLORS
    w = pool[rng.randint(len(pool))]
    pos = _unique(scene, w)
    if pos is None:
        return None
    value = _prop(scene, pos, prop)
    others = {p for p in cells_with(scene, value) if p != pos}
    return (["_Find", "_Transform", "_Describe"],
            f"is there another thing with the same {prop} as the {w} "
            f"thing", "yes" if others else "no", [w, prop, None])


def q_transform_describe(rng, scene):
    # anchor: unique object of attribute w; target: the single OTHER
    # object sharing prop2 with it; asked for its prop1
    prop2 = "color" if rng.randint(2) else "shape"
    prop1 = "shape" if prop2 == "color" else "color"
    pool = SHAPES if prop2 == "color" else COLORS
    w = pool[rng.randint(len(pool))]
    pos = _unique(scene, w)
    if pos is None:
        return None
    value = _prop(scene, pos, prop2)
    others = {p for p in cells_with(scene, value) if p != pos}
    if len(others) != 1:
        return None
    (tgt,) = others
    return (["_Find", "_Transform", "_Describe"],
            f"what {prop1} is the other thing with the same {prop2} as "
            f"the {w} thing", _prop(scene, tgt, prop1),
            [w, prop2, prop1])


TEMPLATES = [q_exist, q_count, q_describe, q_and_exist, q_and_count,
             q_transform_exist, q_transform_describe]


def annotate(rng, answer):
    """10 simulated annotators: true answer w.p. ANNOTATOR_P, else a
    same-type distractor; small chance of OOV junk. Mirrors the noise
    structure that makes VQA's sampled-answer training and min(n/3, 1)
    metric meaningful."""
    out = []
    for _ in range(NUM_ANNOTATORS):
        if rng.rand() < JUNK_P:
            out.append(JUNK[rng.randint(len(JUNK))])
        elif rng.rand() < ANNOTATOR_P:
            out.append(answer)
        elif answer in ("yes", "no"):
            out.append("no" if answer == "yes" else "yes")
        elif answer.isdigit():
            n = int(answer) + (1 if rng.rand() < 0.5 else -1)
            out.append(str(min(9, max(0, n))))
        elif answer in COLORS:
            out.append(COLORS[rng.randint(5)])
        else:
            out.append(SHAPES[rng.randint(4)])
    return out


def make_flagship_projection(seed=4321):
    """Frozen dataset 'backbone head': 10 semantic channels -> the 2038
    extra res5c-like channels (cf. mini_clevr.make_flagship_projection;
    independent seed so CLEVR/VQA flagship sets differ)."""
    prng = np.random.RandomState(seed)
    W = (prng.randn(10, FLAG_D - 10) / np.sqrt(10)).astype(np.float32)
    b = (prng.randn(FLAG_D - 10) * 0.1 - 0.1).astype(np.float32)
    return W, b


def render_features_flagship(scene, proj, shapes):
    W, b = proj
    sem = np.zeros((FLAG_H, FLAG_W, 10), np.float32)
    for (r, c), (color, shape) in scene.items():
        rs, cs = r * FLAG_BLOCK, c * FLAG_BLOCK
        sem[rs:rs + FLAG_BLOCK, cs:cs + FLAG_BLOCK,
            COLORS.index(color)] = 1.0
        sem[rs:rs + FLAG_BLOCK, cs:cs + FLAG_BLOCK,
            5 + shapes.index(shape)] = 1.0
        sem[rs:rs + FLAG_BLOCK, cs:cs + FLAG_BLOCK, 9] = 1.0  # occupancy
    feat = np.empty((FLAG_H, FLAG_W, FLAG_D), np.float32)
    feat[:, :, :10] = sem
    # ReLU projection: sparse, nonneg, attribute-dependent — like res5c;
    # deliberately NO per-image noise (mini_clevr.py v2.1 note)
    feat[:, :, 10:] = np.maximum(sem @ W + b, 0.0)
    return feat


def make_glove(vocab_words, rng, dim=300):
    """Fake GloVe matrix [V, dim]: seeded unit gaussian rows (the real
    one comes from spaCy, reference
    exp_vqa/data/collect_vqa_vocabs_answers_glove.ipynb). Mechanism-level
    stand-in: exercises the post-init embedding overwrite
    (train_vqa_gt_layout.py:160-164)."""
    mat = rng.randn(len(vocab_words), dim).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return mat


def generate(out_root, num_train=30000, num_val=3000, num_test=3000,
             seed=0, flagship=False, q_per_image=1,
             real_vqa_data="./exp_vqa/data"):
    """flagship=True renders at the real 14x14x2048 geometry with the
    real (vendored) 17742-word vocabulary and 3001-answer list, sharing
    each scene across q_per_image questions (>=4 forced — the CLEVR
    flagship fingerprint lesson, mini_clevr.py v2 note). Temporarily
    rebinds the module's world globals (single-process builder CLI)."""
    global SHAPES, GRID, ANSWERS, JUNK
    saved = (SHAPES, GRID, ANSWERS, JUNK)
    rng = np.random.RandomState(seed)
    real_vocab = None
    if flagship:
        proj = make_flagship_projection()
        SHAPES = FLAG_SHAPES
        GRID = FLAG_GRID
        q_per_image = max(q_per_image, 4)
        with open(os.path.join(real_vqa_data, "vocabulary_vqa.txt")) as f:
            real_vocab = [l.rstrip("\n") for l in f if l.strip()]
        with open(os.path.join(real_vqa_data, "answers_vqa.txt")) as f:
            ANSWERS = [l.rstrip("\n") for l in f if l.strip()]
        assert ANSWERS[0] == "<unk>", "answers must start with <unk>"
        missing = [w for w in COLORS + FLAG_SHAPES + ["yes", "no"]
                   + [str(i) for i in range(10)]
                   if w not in set(ANSWERS)]
        assert not missing, f"template answers not in real list: {missing}"
        # junk must stay OOV to exercise the <unk> mapping; 'maybe'/
        # 'nothing' ARE real VQA answers
        JUNK = ["dunno", "blorp", "xyzzy"]
        render = lambda scene: render_features_flagship(scene, proj,
                                                        FLAG_SHAPES)
    else:
        render = lambda scene: render_features(scene, rng)
    try:
        return _generate(out_root, num_train, num_val, num_test, rng,
                         render, q_per_image, real_vocab)
    finally:
        SHAPES, GRID, ANSWERS, JUNK = saved


def _generate(out_root, num_train, num_val, num_test, rng, render,
              q_per_image, real_vocab):
    os.makedirs(os.path.join(out_root, "data", "imdb"), exist_ok=True)
    feat_dir = os.path.join(out_root, "features")
    os.makedirs(feat_dir, exist_ok=True)

    vocab = set()
    img_count = 0
    qid_count = 0

    def make_records(n):
        nonlocal img_count, qid_count
        records = []
        while len(records) < n:
            scene = sample_scene(rng)
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
            name = f"mv{img_count:06d}"
            img_count += 1
            path = os.path.join(feat_dir, name + ".npy")
            np.save(path, render(scene)[None])
            for layout, question, answer, att_words in drawn:
                tokens = question.split()
                vocab.update(tokens)
                # per-decoder-step gt text-attention spans: the question
                # word that parameterizes each module, as (t0, t1), or
                # None (reference util/vqa_train/data_reader.py:25-27)
                gt_txtatt = []
                for aw in att_words:
                    if aw is None:
                        gt_txtatt.append(None)
                    else:
                        i = tokens.index(aw)
                        gt_txtatt.append((i, i + 1))
                all_answers = annotate(rng, answer)
                # imdb-builder contract: answers outside the vocab map to
                # <unk> (reference exp_vqa/data/build_vqa_imdb.py:66-73)
                answer_set = set(ANSWERS)
                valid_answers = [a if a in answer_set else "<unk>"
                                 for a in all_answers]
                records.append({
                    "image_name": name, "image_path": name + ".png",
                    "feature_path": path, "question_id": qid_count,
                    "question_str": question, "question_tokens": tokens,
                    "all_answers": all_answers,
                    "valid_answers": valid_answers,
                    "gt_layout_tokens": layout,
                    "gt_txtatt": gt_txtatt,
                })
                qid_count += 1
        return np.array(records)

    for tag, n in [("trn", num_train), ("val", num_val),
                   ("tst", num_test)]:
        np.save(os.path.join(out_root, "data", "imdb",
                             f"imdb_{tag}.npy"), make_records(n))
        print(f"{tag}: {n} questions ({img_count} images so far)",
              flush=True)

    if real_vocab is not None:
        vocab_words = real_vocab
        oov = sorted(vocab - set(real_vocab))
        assert not oov, f"generated question words not in real vocab: {oov}"
    else:
        vocab_words = ["<unk>"] + sorted(vocab)
    with open(os.path.join(out_root, "data",
                           "vocabulary_vqa.txt"), "w") as f:
        f.writelines(w + "\n" for w in vocab_words)
    with open(os.path.join(out_root, "data", "answers_vqa.txt"),
              "w") as f:
        f.writelines(a + "\n" for a in ANSWERS)
    # reference exp_vqa/data/vocabulary_layout.txt: 4 modules + <eos>
    with open(os.path.join(out_root, "data",
                           "vocabulary_layout.txt"), "w") as f:
        f.writelines(t + "\n" for t in
                     ["_Find", "_Transform", "_And", "_Describe",
                      "<eos>"])
    np.save(os.path.join(out_root, "data", "vocabulary_vqa_glove.npy"),
            make_glove(vocab_words, rng))


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--out_root", default="./exp_vqa_mini")
    p.add_argument("--num_train", type=int, default=30000)
    p.add_argument("--num_val", type=int, default=3000)
    p.add_argument("--num_test", type=int, default=3000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--flagship", action="store_true",
                   help="render at the real VQA geometry (14x14x2048, "
                        "real 17742-word vocab, 3001 answers) — see "
                        "render_features_flagship")
    p.add_argument("--q_per_image", type=int, default=1,
                   help="questions sharing one scene (flagship forces "
                        ">=4)")
    args = p.parse_args()
    generate(args.out_root, num_train=args.num_train,
             num_val=args.num_val, num_test=args.num_test,
             seed=args.seed, flagship=args.flagship,
             q_per_image=args.q_per_image)
