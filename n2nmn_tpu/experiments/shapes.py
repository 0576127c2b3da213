"""SHAPES experiment runner: behavioral cloning, REINFORCE-from-scratch,
and evaluation — one parameterized trainer replacing the reference's
config-by-copy-paste driver scripts (exp_shapes/train_shapes_gt_layout.py,
train_shapes_scratch.py, eval_shapes.py).

Hyperparameter defaults reproduce the reference exactly; see the dataclass
fields' comments for file:line provenance.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.models.netgen import NetgenConfig
from n2nmn_tpu.models.nmn import NMNConfig, NMNModel
from n2nmn_tpu.data.shapes import (
    load_shapes_split, batch_slices, augment_shapes_data)
from n2nmn_tpu.train.optim import make_optimizer
from n2nmn_tpu.train.steps import (
    create_train_state, cloning_step_body, rl_step_body,
    make_chunked_trainer, make_eval_step)
from n2nmn_tpu.train.checkpoint import (
    save_params, load_params, snapshot_path, save_pytree, load_pytree,
    latest_snapshot)
from n2nmn_tpu.train.metrics import MetricsLogger


@dataclasses.dataclass
class ShapesConfig:
    exp_name: str = "shapes_gt_layout"
    mode: str = "cloning"            # "cloning" | "scratch"
    root: str = "./exp_shapes"
    # Module/model parameters (reference train_shapes_gt_layout.py:24-36)
    H_im: int = 30
    W_im: int = 30
    num_choices: int = 2
    embed_dim_txt: int = 300
    embed_dim_nmn: int = 300
    lstm_dim: int = 256
    num_layers: int = 2
    encoder_dropout: bool = True
    decoder_dropout: bool = True
    decoder_sampling: bool = True
    T_encoder: int = 15
    T_decoder: int = 11              # scratch: 7 (train_shapes_scratch.py:35)
    N: int = 256
    # Training parameters (reference :38-42; scratch :39-44)
    weight_decay: float = 5e-4
    max_grad_l2_norm: float = 10.0
    max_iter: int = 40000
    snapshot_interval: int = 10000
    log_interval: int = 20
    # steps per jitted chunk: each chunk boundary costs one host sync
    # (~87 ms over this environment's tunnel — measured 77 vs 192
    # steps/s at flagship CLEVR geometry for 20- vs 200-step chunks);
    # logging replays the chunk's per-step aux rows at log_interval
    # cadence either way
    chunk_steps: Optional[int] = None       # default max(log_interval, 200)
    invalid_expr_loss: float = 3.0   # scratch mode only
    lambda_entropy: float = 0.5      # scratch mode only
    learning_rate: float = 1e-3
    baseline_decay: float = 0.99
    seed: int = 0
    # Label-preserving augmentation (color-permutation x hflip); compensates
    # for this checkout missing the train.large/med images. See
    # data/shapes.py:augment_shapes_data.
    augment: bool = True
    # crash-resume from the latest full-state snapshot if present
    resume: bool = False
    # decoder constraint mode: the reference SHAPES decoder is unmasked
    # ("eos_force", models_shapes/nmn3_netgen_att.py); "grammar" applies
    # the universal validity automaton (framework capability beyond the
    # reference; guarantees valid layouts during policy search)
    mask_mode: str = "eos_force"


def scratch_config(**overrides) -> ShapesConfig:
    cfg = ShapesConfig(exp_name="shapes_scratch", mode="scratch",
                       T_decoder=7, max_iter=400000)
    return dataclasses.replace(cfg, **overrides)


def rl_config(**overrides) -> ShapesConfig:
    """Policy-search fine-tune from a cloning snapshot (no reference
    SHAPES analogue; hyperparameters follow the CLEVR/VQA rl scripts:
    lr 1e-4, lambda_entropy 0.005, invalid_expr_loss 0.5)."""
    cfg = ShapesConfig(exp_name="shapes_rl_gt_layout", mode="scratch",
                       invalid_expr_loss=0.5, lambda_entropy=0.005,
                       learning_rate=1e-4, max_iter=10000,
                       snapshot_interval=5000)
    return dataclasses.replace(cfg, **overrides)


TRAIN_IMAGE_SETS = ["train.large", "train.med", "train.small", "train.tiny"]


def build_model(cfg: ShapesConfig, sampling: bool, dropout: bool):
    grammar = ModuleGrammar.from_vocab_file(
        os.path.join(cfg.root, "data", "vocabulary_layout.txt"))
    with open(os.path.join(cfg.root, "data", "vocabulary_shape.txt")) as f:
        num_vocab_txt = len([l for l in f if l.strip()])
    net_cfg = NetgenConfig(
        num_vocab_txt=num_vocab_txt,
        embed_dim_txt=cfg.embed_dim_txt,
        num_vocab_nmn=grammar.num_vocab,
        embed_dim_nmn=cfg.embed_dim_nmn,
        lstm_dim=cfg.lstm_dim,
        num_layers=cfg.num_layers,
        T_decoder=cfg.T_decoder,
        encoder_dropout=dropout and cfg.encoder_dropout,
        decoder_dropout=dropout and cfg.decoder_dropout,
        decoder_sampling=sampling,
        mask_mode=cfg.mask_mode,
    )
    model_cfg = NMNConfig(
        flavor="shapes", netgen=net_cfg, num_choices=cfg.num_choices,
        H_feat=3, W_feat=3, D_feat=64, in_graph_cnn=True)
    return NMNModel(model_cfg, grammar), grammar


def _pad_batch(data, n_begin, n_end, N, with_gt=True):
    """Contiguous slice padded to the fixed batch size with weight mask."""
    n = n_end - n_begin
    def pad_t(x):  # time-major [T, Q]
        out = np.zeros(x.shape[:1] + (N,), x.dtype)
        out[:, :n] = x[:, n_begin:n_end]
        return out
    def pad_b(x):  # batch-major [Q, ...]
        out = np.zeros((N,) + x.shape[1:], x.dtype)
        out[:n] = x[n_begin:n_end]
        return out
    batch = {
        "text_seq": pad_t(data.text_seq),
        "seq_length": np.maximum(pad_b(data.seq_length), 1),
        "image": pad_b(data.images),
        "label": pad_b(data.labels),
        "weight": (np.arange(N) < n).astype(np.float32),
    }
    if with_gt and data.gt_layout is not None:
        batch["gt_layout"] = pad_t(data.gt_layout)
    return batch


def _stack_device_batches(data, N, with_gt):
    """Pad the whole dataset to B*N and stack as per-batch arrays [B, ...]
    living on device — the chunked trainer indexes batches on-device, so
    the host never touches data again after this."""
    q = data.num_questions
    B = int(np.ceil(q / N))
    pads = []
    for i in range(B):
        n_begin, n_end = i * N, min((i + 1) * N, q)
        pads.append(_pad_batch(data, n_begin, n_end, N, with_gt=with_gt))
    stacked = {k: np.stack([p[k] for p in pads]) for k in pads[0]}
    return jax.device_put(stacked), B


def train(cfg: ShapesConfig, pretrained_model=None):
    model, grammar = build_model(cfg, sampling=cfg.decoder_sampling,
                                 dropout=True)
    data = load_shapes_split(
        cfg.root, TRAIN_IMAGE_SETS,
        os.path.join(cfg.root, "data", "vocabulary_shape.txt"),
        grammar, cfg.T_encoder, cfg.T_decoder,
        shuffle_seed=3,  # reference fixed seed (train_shapes_gt_layout.py:89)
        load_gt_layout=(cfg.mode == "cloning"))
    if cfg.augment:
        data = augment_shapes_data(
            data, os.path.join(cfg.root, "data", "vocabulary_shape.txt"))
        # reshuffle so augmented variants mix across batches
        rng = np.random.RandomState(7)
        perm = rng.permutation(data.num_questions)
        data = dataclasses.replace(
            data, text_seq=data.text_seq[:, perm],
            seq_length=data.seq_length[perm], images=data.images[perm],
            labels=data.labels[perm],
            gt_layout=(data.gt_layout[:, perm]
                       if data.gt_layout is not None else None))
        print(f"augmented training set: {data.num_questions} questions",
              flush=True)

    key = jax.random.PRNGKey(cfg.seed)
    params = model.init(key)
    if pretrained_model:
        # warm start restores everything except the RL baseline
        # (reference train_clevr_rl_gt_layout.py:177-179)
        params, _ = load_params(pretrained_model, params)
        print(f"restored pretrained model from {pretrained_model}",
              flush=True)
    tx = make_optimizer(cfg.learning_rate, cfg.max_grad_l2_norm)
    state = create_train_state(
        params, tx, jax.random.fold_in(key, 1),
        baseline_init=cfg.invalid_expr_loss if cfg.mode == "scratch" else 0.0)

    if cfg.mode == "cloning":
        body = cloning_step_body(model, tx, cfg.weight_decay)
    else:
        body = rl_step_body(
            model, tx, cfg.weight_decay, cfg.lambda_entropy,
            cfg.invalid_expr_loss, cfg.baseline_decay)

    with_gt = cfg.mode == "cloning"
    device_data, B = _stack_device_batches(data, cfg.N, with_gt)
    K = cfg.chunk_steps or max(cfg.log_interval, 200)
    chunk = make_chunked_trainer(body, device_data, B, K)

    snapshot_dir = os.path.join(cfg.root, "tfmodel", cfg.exp_name)
    logger = MetricsLogger(os.path.join(cfg.root, "tb"), cfg.exp_name)

    n_iter = 0
    if cfg.resume:
        found = latest_snapshot(snapshot_dir)
        if found:
            state_path, n_iter = found
            state = load_pytree(state_path, state)
            print(f"resumed full train state from {state_path} "
                  f"(iter {n_iter})", flush=True)
    while n_iter < cfg.max_iter:
        k = min(K, cfg.max_iter - n_iter)
        if k < K:  # final partial chunk: separate (one extra compile)
            chunk_last = make_chunked_trainer(body, device_data, B, k)
            state, auxs = chunk_last(state, jnp.asarray(n_iter % B))
        else:
            state, auxs = chunk(state, jnp.asarray(n_iter % B))
        auxs = jax.tree_util.tree_map(np.asarray, auxs)
        # replay the chunk's per-step aux rows at the reference log
        # cadence (EMA per iteration, print/log every log_interval)
        for i in range(k):
            avg_acc = logger.update_accuracy(float(auxs["accuracy"][i]))
            it = n_iter + i + 1
            if it % cfg.log_interval == 0 or it == cfg.max_iter:
                print("iter = %d\n\tloss = %f, accuracy (cur) = %f, "
                      "accuracy (avg) = %f, entropy = %f" %
                      (it - 1, float(auxs["loss"][i]),
                       float(auxs["accuracy"][i]), avg_acc,
                       float(auxs["entropy"][i])), flush=True)
                logger.log(it - 1,
                           {**{k_: float(v[i]) for k_, v in auxs.items()},
                            "avg_accuracy": avg_acc,
                            "baseline": float(state.baseline)})
        n_iter += k

        if (n_iter % cfg.snapshot_interval < k
                or n_iter == cfg.max_iter):
            path = snapshot_path(snapshot_dir, n_iter)
            save_params(path, state.params,
                        extra={"baseline": state.baseline})
            # full state (params+optimizer+baseline+rng) for crash-resume
            save_pytree(path + ".state", state)
            print("snapshot saved to " + path, flush=True)

    logger.close()
    return state


def evaluate(cfg: ShapesConfig, exp_name, snapshot_name, test_split):
    """Greedy-decode evaluation (reference eval_shapes.py): answer accuracy,
    layout accuracy (exact match except where gt is <eos>), validity."""
    model, grammar = build_model(cfg, sampling=False, dropout=False)
    image_sets = test_split.split(":")
    data = load_shapes_split(
        cfg.root, image_sets,
        os.path.join(cfg.root, "data", "vocabulary_shape.txt"),
        grammar, cfg.T_encoder, cfg.T_decoder, shuffle_seed=None,
        load_gt_layout=True)

    params_t = model.init(jax.random.PRNGKey(0))
    snapshot_file = os.path.join(cfg.root, "tfmodel", exp_name,
                                 snapshot_name)
    params, _ = load_params(snapshot_file, params_t)
    eval_step = make_eval_step(model)
    rng = jax.random.PRNGKey(0)

    q = data.num_questions
    answer_correct = layout_correct = layout_valid = 0
    num_batches = int(np.ceil(q / cfg.N))
    for n_iter in range(num_batches):
        n_begin, n_end = batch_slices(q, cfg.N, n_iter)
        n = n_end - n_begin
        batch = _pad_batch(data, n_begin, n_end, cfg.N, with_gt=False)
        out = eval_step(params, batch, rng)
        tokens = np.asarray(out["tokens"])[:, :n]
        gt_tokens = data.gt_layout[:, n_begin:n_end]
        layout_correct += np.sum(np.all(
            np.logical_or(tokens == gt_tokens,
                          gt_tokens == grammar.eos_idx), axis=0))
        validity = np.asarray(out["validity"])[:n]
        layout_valid += np.sum(validity)
        preds = np.asarray(out["predictions"])[:n]
        answer_correct += np.sum(
            np.logical_and(validity, preds == data.labels[n_begin:n_end]))

    results = {
        "answer_accuracy": answer_correct / q,
        "layout_accuracy": layout_correct / q,
        "layout_validity": layout_valid / q,
    }
    split_tag = "_".join(image_sets)
    save_dir = os.path.join(cfg.root, "results", exp_name)
    os.makedirs(save_dir, exist_ok=True)
    save_file = os.path.join(save_dir, f"{snapshot_name}.{split_tag}.txt")
    with open(save_file, "w") as f:
        for k, v in results.items():
            line = f"{k.replace('_', ' ')} = {v} on {split_tag}"
            print(line)
            print(line, file=f)
    return results
