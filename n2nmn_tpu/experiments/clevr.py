"""CLEVR experiment runner: gt-layout cloning, RL fine-tune, RL from
scratch, and evaluation — replacing the reference's four driver scripts
(exp_clevr/train_clevr_gt_layout.py, train_clevr_rl_gt_layout.py,
train_clevr_scratch.py, eval_clevr.py) with one parameterized trainer.
Hyperparameter provenance in field comments."""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.models.netgen import NetgenConfig
from n2nmn_tpu.models.nmn import NMNConfig, NMNModel
from n2nmn_tpu.data.imdb import DataReader
from n2nmn_tpu.train.optim import make_optimizer
from n2nmn_tpu.train.steps import (
    create_train_state, make_cloning_step, make_rl_step, make_eval_step)
from n2nmn_tpu.train.checkpoint import (
    save_params, load_params, snapshot_path)
from n2nmn_tpu.train.metrics import MetricsLogger


@dataclasses.dataclass
class ClevrConfig:
    exp_name: str = "clevr_gt_layout"
    mode: str = "cloning"        # "cloning" | "rl" | "scratch"
    root: str = "./exp_clevr"
    # Module parameters (reference train_clevr_gt_layout.py:23-37)
    H_feat: int = 10
    W_feat: int = 15
    D_feat: int = 512
    embed_dim_txt: int = 300
    embed_dim_nmn: int = 300
    lstm_dim: int = 512
    num_layers: int = 2
    encoder_dropout: bool = False
    decoder_dropout: bool = False
    decoder_sampling: bool = True
    T_encoder: int = 45
    T_decoder: int = 10          # scratch: 6; eval: 20
    N: int = 64
    prune_filter_module: bool = True
    # Training parameters (reference :39-44; rl :42-51; scratch :35-45)
    weight_decay: float = 5e-6
    learning_rate: float = 1e-3  # rl fine-tune: 1e-4
    baseline_decay: float = 0.99
    max_grad_l2_norm: float = 10.0
    max_iter: int = 80000
    snapshot_interval: int = 10000
    log_interval: int = 20
    invalid_expr_loss: float = 0.5
    lambda_entropy: float = 0.005
    seed: int = 0
    # data files
    imdb_trn: str = "data/imdb/imdb_trn.npy"
    imdb_tst: str = "data/imdb/imdb_val.npy"
    packed_features: Optional[str] = None
    # end-to-end image->answer: raw images -> in-graph VGG pool5 ->
    # modules in ONE program (no offline feature dump — replaces
    # reference exp_clevr/data/extract_visual_features_vgg_pool5.py +
    # README.md:57's 29 GB artifact). image_H/W are the raw input size;
    # the module grid becomes (image_H/32, image_W/32, 512).
    from_images: bool = False
    # device-resident training: stage the WHOLE feature set in HBM once
    # and run log_interval-step jitted chunks that index batches
    # on-device (train/steps.py:make_chunked_trainer — the SHAPES
    # trainer's design, ported up). Removes the per-step host->device
    # feature upload, which at flagship geometry (64 x 10x15x512 f32 =
    # 20 MB/step) dominates wall clock on any host link and utterly so
    # over this environment's tunnel. One shuffled epoch order is
    # frozen at staging (same tradeoff the SHAPES trainer makes).
    device_data: bool = False
    # steps per jitted chunk in device_data mode. Each chunk boundary
    # costs one host<->device sync (~87 ms over this environment's
    # tunnel): chunking at log_interval=20 measured 77 steps/s vs 192
    # at 200 on the flagship-geometry run. Logging stays at
    # log_interval cadence — the chunk returns per-step aux rows, so
    # the log is replayed at the reference granularity regardless.
    chunk_steps: Optional[int] = None      # default max(log_interval, 200)
    # stage features as bf16 (halves HBM residency: 40k flagship
    # questions = 12.3 GB f32 measured OOM on the 16 GB chip, 6.1 GB
    # bf16 fits) — the step body casts back to f32 so compute precision
    # is unchanged; inputs carry bf16 rounding (~the serving mode's,
    # which is equivalence-tested on trained snapshots)
    device_data_bf16: bool = False
    # stage each IMAGE once (shared table + per-question gather keys)
    # instead of per question — 4-10x HBM saving when several questions
    # share an image (real CLEVR ~10/image; flagship synthetic 4).
    # Auto-disables when nothing is shared.
    device_data_dedup: bool = True
    image_H: int = 320
    image_W: int = 480
    # converted VGG-16 weights (.npz from models/vgg_convert.py, or a
    # torchvision .pth); loaded into params['vgg'] for from_images runs
    vgg_weights: Optional[str] = None
    # FRAMEWORK EXTENSION (off = reference parity): MLP heads for
    # _EqualNum/_MoreNum/_LessNum (NMNConfig.num_mlp_ext). The parity
    # single-fc head cannot represent count equality — mini-CLEVR
    # measures _EqualNum ~68% under cloning with it.
    num_mlp_ext: bool = False
    # FRAMEWORK EXTENSION (off = reference parity): residual MLP
    # count-comparison heads (NMNConfig.num_res_ext) — parity linear
    # path + zero-init MLP correction; supersedes num_mlp_ext (whose
    # pure-MLP head loses the Less/More sum-difference shortcut).
    num_res_ext: bool = False
    # FRAMEWORK EXTENSION (off = reference parity): learned objectness
    # _Scene attention (NMNConfig.scene_ext) — lifts the _Scene _Count
    # constant-attention floor.
    scene_ext: bool = False
    # FRAMEWORK EXTENSION (off = reference parity): MLP _Count head
    # (NMNConfig.count_mlp_ext) — needed alongside scene_ext so the
    # shared Count head can serve both the learned-objectness _Scene
    # maps and the _Find maps.
    count_mlp_ext: bool = False
    # modifier on scene_ext: sigmoid-bounded objectness (NMNConfig.
    # scene_bounded) — keeps scene maps in the parity value regime.
    scene_bounded: bool = False


def rl_config(**overrides) -> ClevrConfig:
    cfg = ClevrConfig(exp_name="clevr_rl_gt_layout", mode="rl",
                      learning_rate=1e-4, invalid_expr_loss=0.5,
                      lambda_entropy=0.005)
    return dataclasses.replace(cfg, **overrides)


def scratch_config(**overrides) -> ClevrConfig:
    cfg = ClevrConfig(exp_name="clevr_scratch", mode="scratch",
                      T_decoder=6, weight_decay=0.0,
                      invalid_expr_loss=math.log(28),
                      lambda_entropy=0.01, max_iter=120000)
    return dataclasses.replace(cfg, **overrides)


def build_model(cfg: ClevrConfig, sampling: bool, T_decoder: int = None):
    grammar = ModuleGrammar.from_vocab_file(
        os.path.join(cfg.root, "data", "vocabulary_layout.txt"))
    with open(os.path.join(cfg.root, "data", "vocabulary_clevr.txt")) as f:
        num_vocab_txt = len([l for l in f if l.strip()])
    with open(os.path.join(cfg.root, "data", "answers_clevr.txt")) as f:
        num_choices = len([l for l in f if l.strip()])
    net_cfg = NetgenConfig(
        num_vocab_txt=num_vocab_txt, embed_dim_txt=cfg.embed_dim_txt,
        num_vocab_nmn=grammar.num_vocab, embed_dim_nmn=cfg.embed_dim_nmn,
        lstm_dim=cfg.lstm_dim, num_layers=cfg.num_layers,
        T_decoder=T_decoder or cfg.T_decoder,
        encoder_dropout=cfg.encoder_dropout,
        decoder_dropout=cfg.decoder_dropout,
        decoder_sampling=sampling,
        mask_mode="grammar")
    if cfg.from_images:
        model_cfg = NMNConfig(
            flavor="clevr", netgen=net_cfg, num_choices=num_choices,
            H_feat=cfg.image_H // 32, W_feat=cfg.image_W // 32,
            D_feat=512, in_graph_vgg=True, num_mlp_ext=cfg.num_mlp_ext,
            scene_ext=cfg.scene_ext, count_mlp_ext=cfg.count_mlp_ext,
            scene_bounded=cfg.scene_bounded, num_res_ext=cfg.num_res_ext)
    else:
        model_cfg = NMNConfig(
            flavor="clevr", netgen=net_cfg, num_choices=num_choices,
            H_feat=cfg.H_feat, W_feat=cfg.W_feat, D_feat=cfg.D_feat,
            num_mlp_ext=cfg.num_mlp_ext, scene_ext=cfg.scene_ext,
            count_mlp_ext=cfg.count_mlp_ext,
            scene_bounded=cfg.scene_bounded, num_res_ext=cfg.num_res_ext)
    return NMNModel(model_cfg, grammar), grammar


def _load_imdb(cfg: ClevrConfig, imdb_file):
    path = (os.path.join(cfg.root, imdb_file)
            if not os.path.isabs(imdb_file) else imdb_file)
    return np.load(path, allow_pickle=True)


def infer_feature_dims(cfg: ClevrConfig, imdb) -> ClevrConfig:
    """Sync the model's feature-grid dims to the dataset's actual feature
    shape (peeked from the first record, like the reference data reader's
    shape probe — clevr_train/data_reader.py:38-39). Makes the standard
    drivers work on any feature grid via --data_root (e.g. mini-CLEVR's
    4x4x16) without a config fork."""
    from n2nmn_tpu.data.imdb import FeatureSource
    h, w, d = FeatureSource(imdb, cfg.packed_features).feat_shape
    if (h, w, d) != (cfg.H_feat, cfg.W_feat, cfg.D_feat):
        cfg = dataclasses.replace(cfg, H_feat=h, W_feat=w, D_feat=d)
    return cfg


def make_reader(cfg: ClevrConfig, imdb_file, grammar, shuffle=True,
                one_pass=False, load_gt_layout=None, T_decoder=None):
    imdb = (imdb_file if not isinstance(imdb_file, str)
            else _load_imdb(cfg, imdb_file))
    return DataReader(
        imdb,
        shuffle=shuffle, one_pass=one_pass, batch_size=cfg.N,
        seed=cfg.seed,
        vocab_question_file=os.path.join(cfg.root, "data",
                                         "vocabulary_clevr.txt"),
        vocab_answer_file=os.path.join(cfg.root, "data",
                                       "answers_clevr.txt"),
        T_encoder=cfg.T_encoder, T_decoder=T_decoder or cfg.T_decoder,
        grammar=grammar,
        prune_filter_module=cfg.prune_filter_module,
        load_gt_layout=load_gt_layout,
        packed_feature_file=cfg.packed_features,
        raw_images=cfg.from_images,
        image_shape=(cfg.image_H, cfg.image_W))


def _load_vgg_weights(cfg: ClevrConfig, params):
    """Install converted VGG-16 weights into params['vgg'] (from_images
    mode; replaces the reference's offline extractor checkpoint,
    exp_clevr/data/extract_visual_features_vgg_pool5.py:23-30)."""
    from n2nmn_tpu.models import vgg_convert
    if cfg.vgg_weights.endswith(".npz"):
        params["vgg"] = vgg_convert.from_npz(cfg.vgg_weights)
    else:
        params["vgg"] = vgg_convert.from_torchvision_file(cfg.vgg_weights)
    print(f"loaded VGG-16 weights from {cfg.vgg_weights}")
    return params


def _train_device_resident(cfg, model, grammar, imdb, state, tx, use_gt,
                           snapshot_dir, logger):
    """Chunked device-resident trainer (cfg.device_data): stage every
    batch of one shuffled epoch in HBM, then scan log_interval-step
    chunks that index batches on-device. Same bodies as the reader path
    (train/steps.py cloning_step_body / rl_step_body)."""
    from n2nmn_tpu.train.steps import (cloning_step_body,
                                       drive_chunked_training,
                                       rl_step_body)

    sreader = make_reader(cfg, imdb, grammar,
                          load_gt_layout=use_gt or None,
                          shuffle=True, one_pass=True)
    time_major = ("text_seq", "gt_layout")
    # image dedup: datasets with several questions per image (real CLEVR
    # ~10, flagship synthetic 4) stage each image ONCE in a shared table
    # and per-question int32 keys gather it on-device — 4-10x less HBM
    # residency than per-question staging (40k flagship questions: 12.3
    # GB f32 -> 3.1 GB). Keys come from the reader's image_path column;
    # falls back to per-question staging when paths are missing or when
    # there is nothing to share.
    dedup = cfg.device_data_dedup
    uid, uniq_images = {}, []
    staged, first_paths = [], None
    for batch in sreader.batches():
        n = batch.pop("n_real", None)
        paths = batch.pop("image_path", None)
        if dedup and (paths is None or any(p is None for p in paths)):
            assert not staged, "image_path vanished mid-epoch"
            dedup = False
        if not use_gt:
            batch.pop("gt_layout", None)
        N = batch["seq_length"].shape[0]
        if n is not None and n < N and staged:
            # wrap-fill the padded tail with the epoch's first rows so
            # every staged batch is full (weight stays 1 — these are
            # real questions repeated, as an epoch wrap would)
            first = staged[0]
            for k, v in batch.items():
                if k == "img_idx":
                    continue
                ax = 1 if k in time_major else 0
                keep = np.take(v, np.arange(n), axis=ax)
                # dedup already popped 'image' from staged batches; the
                # fill rows' paths (first_paths) are all in uid, so their
                # image VALUES are never read — any placeholder rows do
                fill = np.take(first[k] if k in first else v,
                               np.arange(N - n), axis=ax)
                batch[k] = np.concatenate([keep, fill], axis=ax)
            if dedup:
                paths = list(paths[:n]) + list(first_paths[:N - n])
        if dedup:
            img = np.asarray(batch.pop("image"))
            idx = np.empty((N,), np.int32)
            for i, p in enumerate(paths):
                if p not in uid:
                    uid[p] = len(uniq_images)
                    uniq_images.append(img[i])
                idx[i] = uid[p]
            batch["img_idx"] = idx
        if first_paths is None and paths is not None:
            first_paths = list(paths)
        staged.append({k: np.asarray(v) for k, v in batch.items()})
    if dedup and len(uniq_images) > 0.9 * len(staged) * N:
        # nothing shared: fold the table back into per-question rows
        # (identical memory, avoids the pointless gather)
        table = np.stack(uniq_images)
        for b in staged:
            b["image"] = table[b.pop("img_idx")]
        uniq_images, dedup = [], False
    stacked = {k: np.stack([b[k] for b in staged]) for k in staged[0]}
    shared = ({"images_unique": np.stack(uniq_images)} if dedup else None)
    f_dtype = jnp.bfloat16 if cfg.device_data_bf16 else jnp.float32
    if dedup:
        shared["images_unique"] = jnp.asarray(shared["images_unique"],
                                              f_dtype)
        shared = jax.device_put(shared)
    elif cfg.device_data_bf16:
        stacked["image"] = jnp.asarray(stacked["image"], jnp.bfloat16)
    device_data = jax.device_put(stacked)
    B = len(staged)
    gb = sum(v.nbytes for v in device_data.values()) / 1e9
    gb += sum(v.nbytes for v in (shared or {}).values()) / 1e9
    print(f"device-resident training: {B} batches staged ({gb:.1f} GB"
          + (f", {len(uniq_images)} unique images" if dedup else "")
          + ")", flush=True)

    if cfg.mode == "cloning":
        body = cloning_step_body(model, tx, cfg.weight_decay,
                                 dropout_training=True)
    else:
        body = rl_step_body(
            model, tx, cfg.weight_decay, cfg.lambda_entropy,
            cfg.invalid_expr_loss, cfg.baseline_decay,
            dropout_training=True)
    inner = body

    def body(state, batch):
        batch = dict(batch)
        if "images_unique" in batch:
            batch["image"] = batch.pop("images_unique")[
                batch.pop("img_idx")]
        batch["image"] = batch["image"].astype(jnp.float32)
        return inner(state, batch)

    return drive_chunked_training(body, device_data, shared, state, cfg,
                                  logger, snapshot_dir)


def train(cfg: ClevrConfig, pretrained_model: Optional[str] = None):
    use_gt = cfg.mode == "cloning"
    imdb = _load_imdb(cfg, cfg.imdb_trn)
    if not cfg.from_images:
        cfg = infer_feature_dims(cfg, imdb)
    model, grammar = build_model(cfg, sampling=cfg.decoder_sampling)
    # device_data mode builds its own one-pass reader; constructing this
    # one too would spin up a second prefetch thread for nothing
    reader = None if cfg.device_data else make_reader(
        cfg, imdb, grammar, load_gt_layout=use_gt or None)

    key = jax.random.PRNGKey(cfg.seed)
    params = model.init(key)
    if cfg.from_images and cfg.vgg_weights:
        params = _load_vgg_weights(cfg, params)
    if pretrained_model:
        # warm start: restore everything except the RL baseline
        # (reference train_clevr_rl_gt_layout.py:177-179)
        params, _ = load_params(
            pretrained_model, params,
            allow_missing=("vgg/", "resnet/") if cfg.from_images else ())
        print(f"restored pretrained model from {pretrained_model}")
    tx = make_optimizer(cfg.learning_rate, cfg.max_grad_l2_norm)
    state = create_train_state(
        params, tx, jax.random.fold_in(key, 1),
        baseline_init=cfg.invalid_expr_loss if cfg.mode != "cloning"
        else 0.0)

    if cfg.mode == "cloning":
        train_step = make_cloning_step(model, tx, cfg.weight_decay,
                                       dropout_training=True)
    else:
        train_step = make_rl_step(
            model, tx, cfg.weight_decay, cfg.lambda_entropy,
            cfg.invalid_expr_loss, cfg.baseline_decay,
            dropout_training=True)

    snapshot_dir = os.path.join(cfg.root, "tfmodel", cfg.exp_name)
    logger = MetricsLogger(os.path.join(cfg.root, "tb"), cfg.exp_name)

    if cfg.device_data:
        assert not cfg.from_images, "device_data stages feature grids"
        return _train_device_resident(cfg, model, grammar, imdb, state,
                                      tx, use_gt, snapshot_dir, logger)

    for n_iter, batch in enumerate(reader.batches()):
        if n_iter >= cfg.max_iter:
            break
        batch.pop("image_path", None)
        batch.pop("n_real", None)
        if use_gt:
            assert "gt_layout" in batch, "cloning needs gt layouts"
        else:
            batch.pop("gt_layout", None)
        state, aux = train_step(state, batch)

        if ((n_iter + 1) % cfg.log_interval == 0
                or (n_iter + 1) == cfg.max_iter):
            acc = float(aux["accuracy"])
            avg_acc = logger.update_accuracy(acc)
            print("iter = %d\n\tloss = %f, accuracy (cur) = %f, "
                  "accuracy (avg) = %f, entropy = %f, validity = %f" %
                  (n_iter + 1, float(aux["loss"]), acc, avg_acc,
                   float(aux["entropy"]), float(aux["validity"])),
                  flush=True)
            logger.log(n_iter + 1,
                       {**{k: float(v) for k, v in aux.items()},
                        "avg_accuracy": avg_acc,
                        "baseline": float(state.baseline)})

        if ((n_iter + 1) % cfg.snapshot_interval == 0
                or (n_iter + 1) == cfg.max_iter):
            path = snapshot_path(snapshot_dir, n_iter + 1)
            save_params(path, state.params,
                        extra={"baseline": state.baseline})
            print("snapshot saved to " + path, flush=True)

    logger.close()
    return state


def evaluate(cfg: ClevrConfig, exp_name, snapshot_name, test_split,
             T_decoder=20, save_eval_outputs=True):
    """Greedy eval at T_decoder=20 (reference eval_clevr.py:26-36);
    reports answer/layout accuracy + validity, writes the one-answer-per-
    line prediction file for the CLEVR grader."""
    return evaluate_many(cfg, exp_name, [snapshot_name], test_split,
                         T_decoder=T_decoder,
                         save_eval_outputs=save_eval_outputs)[snapshot_name]


def evaluate_many(cfg: ClevrConfig, exp_name, snapshot_names, test_split,
                  T_decoder=20, save_eval_outputs=True,
                  dump_layouts=False):
    """Evaluate several snapshots of one experiment over one split.

    Builds the model and stages the split's batches ONCE, then runs each
    snapshot's eval over the cached batches — a select-by-validation
    sweep over an N-snapshot chain costs one data pass + N device evals
    instead of N full (model + reader + compile) rebuilds. Semantics per
    snapshot are identical to ``evaluate`` (greedy decode, reference
    eval_clevr.py:26-36,119-122).

    dump_layouts=True additionally writes
    results/<exp>/<snap>.<split>.layouts.npz with the per-question
    gt/predicted token matrices + answer correctness, for layout-shift
    analysis of RL runs (which may abandon expert layouts for invented
    programs — the N2NMN thesis, reference README.md:85-95).
    Returns {snapshot_name: results dict}.
    """
    imdb = _load_imdb(cfg, f"data/imdb/imdb_{test_split}.npy")
    if not cfg.from_images:
        cfg = infer_feature_dims(cfg, imdb)
    model, grammar = build_model(cfg, sampling=False, T_decoder=T_decoder)
    reader = make_reader(cfg, imdb, grammar, shuffle=False,
                         one_pass=True, T_decoder=T_decoder)
    loader = reader.batch_loader
    cached = []
    for batch in reader.batches():
        n = batch.pop("n_real")
        batch.pop("image_path", None)
        gt_layout = batch.pop("gt_layout", None)
        # stage once on device: snapshots 2..N then cost zero h2d
        # (the flagship val split is ~1.2 GB and this tunnel moves
        # ~40 MB/s — per-snapshot re-upload would dominate the sweep)
        cached.append((jax.device_put(batch), n, gt_layout))

    params_t = model.init(jax.random.PRNGKey(0))
    eval_step = make_eval_step(model)
    rng = jax.random.PRNGKey(0)
    answer_word_list = loader.answer_dict.word_list
    from collections import defaultdict

    all_results = {}
    for snapshot_name in snapshot_names:
        snapshot_file = os.path.join(cfg.root, "tfmodel", exp_name,
                                     snapshot_name)
        # a from_images eval can restore a snapshot trained on feature
        # grids: such a snapshot has no 'vgg' subtree, so partial restore
        # leaves the backbone at its init and _load_vgg_weights installs it
        params, _ = load_params(
            snapshot_file, params_t,
            allow_missing=("vgg/", "resnet/") if cfg.from_images else ())
        if cfg.from_images and cfg.vgg_weights:
            params = _load_vgg_weights(cfg, params)

        answer_correct = layout_correct = layout_valid = num_questions = 0
        output_answers = []
        family_correct = defaultdict(int)
        family_total = defaultdict(int)
        family_layout_correct = defaultdict(int)
        dump_gt, dump_pred, dump_ok, dump_valid = [], [], [], []

        for batch, n, gt_layout in cached:
            labels = batch.get("label")
            out = eval_step(params, batch, rng)
            tokens = np.asarray(out["tokens"])[:, :n]
            validity = np.asarray(out["validity"])[:n]
            preds = np.asarray(out["predictions"])[:n]
            num_questions += n
            layout_valid += int(np.sum(validity))
            layout_match = None
            if gt_layout is not None:
                gt = gt_layout[:, :n]
                # layout accuracy ignores positions where gt is <eos>
                # (reference eval_clevr.py:119-122)
                t = min(tokens.shape[0], gt.shape[0])
                match = np.logical_or(tokens[:t] == gt[:t],
                                      gt[:t] == grammar.eos_idx)
                layout_match = np.all(match, axis=0)
                layout_correct += int(np.sum(layout_match))
            if labels is not None:
                correct = np.logical_and(validity,
                                         preds == np.asarray(labels)[:n])
                answer_correct += int(np.sum(correct))
                if gt_layout is not None:
                    # per-program-family accuracy (family = gt layout
                    # without the <eos> padding)
                    for i in range(n):
                        toks = gt_layout[:, i]
                        fam = " ".join(
                            grammar.module_names[t] for t in toks
                            if t != grammar.eos_idx)
                        family_total[fam] += 1
                        family_correct[fam] += int(correct[i])
                        family_layout_correct[fam] += int(layout_match[i])
                if dump_layouts and gt_layout is not None:
                    dump_gt.append(gt_layout[:, :n].T)
                    dump_pred.append(tokens.T)
                    dump_ok.append(correct)
                    dump_valid.append(validity)
            output_answers += [answer_word_list[p] for p in preds]

        results = {
            "answer_accuracy": answer_correct / max(num_questions, 1),
            "layout_accuracy": layout_correct / max(num_questions, 1),
            "layout_validity": layout_valid / max(num_questions, 1),
            "num_questions": num_questions,
        }
        save_dir = os.path.join(cfg.root, "results", exp_name)
        os.makedirs(save_dir, exist_ok=True)
        save_file = os.path.join(save_dir,
                                 f"{snapshot_name}.{test_split}.txt")
        with open(save_file, "w") as f:
            for k, v in results.items():
                line = f"{k.replace('_', ' ')} = {v} on {test_split}"
                print(line)
                print(line, file=f)
            for fam in sorted(family_total):
                line = (f"  [{fam}] {family_correct[fam]}/"
                        f"{family_total[fam]} = "
                        f"{family_correct[fam] / family_total[fam]:.4f}")
                print(line)
                print(line, file=f)
        if dump_layouts and dump_gt:
            np.savez(os.path.join(
                save_dir, f"{snapshot_name}.{test_split}.layouts.npz"),
                gt=np.concatenate(dump_gt).astype(np.int16),
                pred=np.concatenate(dump_pred).astype(np.int16),
                answer_correct=np.concatenate(dump_ok),
                validity=np.concatenate(dump_valid),
                module_names=np.array(grammar.module_names))
        if save_eval_outputs:
            out_dir = os.path.join(cfg.root, "eval_outputs", exp_name)
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(
                    out_dir, f"{snapshot_name}.{test_split}.txt"),
                    "w") as f:
                f.write("\n".join(output_answers) + "\n")
        all_results[snapshot_name] = results
    return all_results
