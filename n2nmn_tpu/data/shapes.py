"""SHAPES dataset loading: whole-dataset RAM arrays, matching the reference
driver's preparation exactly (exp_shapes/train_shapes_gt_layout.py:69-114):
the four training splits concatenated, fixed-seed(3) shuffle, questions
whitespace-tokenized against vocabulary_shape.txt, gt layouts padded with
<eos> to T_decoder, images mean-subtracted float32."""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from n2nmn_tpu.layout.grammar import ModuleGrammar


@dataclasses.dataclass
class ShapesData:
    text_seq: np.ndarray     # [T_encoder, Q] int32 (time-major)
    seq_length: np.ndarray   # [Q] int32
    images: np.ndarray       # [Q, 30, 30, 3] float32, mean-subtracted
    labels: np.ndarray       # [Q] int32 (0/1)
    gt_layout: np.ndarray | None  # [T_decoder, Q] int32

    @property
    def num_questions(self):
        return len(self.labels)


def load_shapes_split(data_root, image_sets, vocab_shape_file, grammar,
                      T_encoder, T_decoder, shuffle_seed=None,
                      load_gt_layout=True):
    """data_root contains shapes_dataset/ and data/ as in the reference."""
    with open(vocab_shape_file) as f:
        vocab = [s.strip() for s in f]
    word2idx = {w: i for i, w in enumerate(vocab)}

    questions, labels, image_arrays, layouts = [], [], [], []
    for image_set in image_sets:
        if not os.path.exists(os.path.join(
                data_root, "shapes_dataset", f"{image_set}.input.npy")):
            print(f"WARNING: split {image_set} has no input.npy "
                  "(not shipped in this checkout); skipping", flush=True)
            continue
        with open(os.path.join(
                data_root, "shapes_dataset",
                f"{image_set}.query_str.txt")) as f:
            questions += [l.strip() for l in f]
        with open(os.path.join(
                data_root, "shapes_dataset", f"{image_set}.output")) as f:
            labels += [l.strip() == "true" for l in f]
        image_arrays.append(np.load(os.path.join(
            data_root, "shapes_dataset", f"{image_set}.input.npy")))
        if load_gt_layout:
            with open(os.path.join(
                    data_root, "data",
                    f"{image_set}.query_layout_symbols.json")) as f:
                layouts += json.load(f)

    q = len(questions)
    images = np.concatenate(image_arrays)

    if shuffle_seed is not None:
        # fixed-seed shuffle for data repeatability
        # (reference train_shapes_gt_layout.py:88-95)
        rng = np.random.RandomState(shuffle_seed)
        perm = rng.permutation(q)
        questions = [questions[i] for i in perm]
        labels = [labels[i] for i in perm]
        images = images[perm]
        if load_gt_layout:
            layouts = [layouts[i] for i in perm]

    text_seq = np.zeros((T_encoder, q), np.int32)
    seq_length = np.zeros(q, np.int32)
    for n in range(q):
        tokens = questions[n].split()
        seq_length[n] = len(tokens)
        for t, tok in enumerate(tokens):
            text_seq[t, n] = word2idx[tok]

    gt_layout = None
    if load_gt_layout:
        gt_layout = np.zeros((T_decoder, q), np.int32)
        for n in range(q):
            gt_layout[:, n] = grammar.module_list2tokens(layouts[n],
                                                         T_decoder)

    image_mean = np.load(os.path.join(data_root, "data", "image_mean.npy"))
    images = (images - image_mean).astype(np.float32)

    return ShapesData(text_seq=text_seq, seq_length=seq_length,
                      images=images,
                      labels=np.array(labels, np.int32),
                      gt_layout=gt_layout)


def augment_shapes_data(data: ShapesData, vocab_shape_file,
                        color_perms=True, hflip=True) -> ShapesData:
    """Label-preserving SHAPES augmentation (new capability vs the
    reference, motivated by this checkout shipping only ~3.4% of the
    training images — train.large/med input.npy are absent).

    Two exactly label-preserving transforms, requiring no knowledge of the
    relation semantics:
      * permute the image's RGB channels and apply the same permutation to
        the color words (red/green/blue) in the question (x6);
      * flip the image horizontally and swap left<->right question words
        (x2). Vertical flips are NOT used (they would turn the upright
        triangle sprites upside down, leaving the test distribution).
    Expert layouts and labels are unchanged (the layout token sequence
    carries no relation identity; relations live in the question words).
    """
    import itertools

    with open(vocab_shape_file) as f:
        vocab = [s.strip() for s in f]
    word2idx = {w: i for i, w in enumerate(vocab)}
    color_ids = [word2idx[c] for c in ("red", "green", "blue")]
    left_id, right_id = word2idx["left"], word2idx["right"]

    perms = list(itertools.permutations(range(3))) if color_perms \
        else [(0, 1, 2)]
    flips = [False, True] if hflip else [False]

    texts, lengths, images, labels, layouts = [], [], [], [], []
    for perm in perms:
        for flip in flips:
            # permuting image channels by `perm` sends original channel
            # perm[i] to position i, so the word for channel perm[i] must
            # become the word for channel i
            remap = np.arange(len(vocab))
            for i in range(3):
                remap[color_ids[perm[i]]] = color_ids[i]
            if flip:
                # swap left/right (disjoint from the color words)
                remap[left_id], remap[right_id] = (remap[right_id],
                                                   remap[left_id])
            text = remap[data.text_seq].astype(np.int32)

            img = data.images[:, :, :, list(perm)]
            if flip:
                img = img[:, :, ::-1, :]
            texts.append(text)
            lengths.append(data.seq_length)
            images.append(np.ascontiguousarray(img))
            labels.append(data.labels)
            if data.gt_layout is not None:
                layouts.append(data.gt_layout)

    return ShapesData(
        text_seq=np.concatenate(texts, axis=1),
        seq_length=np.concatenate(lengths),
        images=np.concatenate(images),
        labels=np.concatenate(labels),
        gt_layout=(np.concatenate(layouts, axis=1)
                   if data.gt_layout is not None else None))


def batch_slices(num_questions, batch_size, n_iter):
    """Deterministic contiguous batch for iteration n_iter
    (reference train_shapes_gt_layout.py:190-192)."""
    num_batches = int(np.ceil(num_questions / batch_size))
    n_begin = int((n_iter % num_batches) * batch_size)
    n_end = int(min(n_begin + batch_size, num_questions))
    return n_begin, n_end
