"""VQA v1/v2 experiment runner: gt-layout cloning (+GloVe init, question
prior net), RL fine-tune, and evaluation with VQA-server JSON output —
replacing exp_vqa/train_vqa{,2}_{gt,rl_gt}_layout.py and eval_vqa{,2}.py.
The v1/v2 difference in the reference is only data file names and
max_iter (diff-verified, SURVEY.md §2.5)."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.models.netgen import NetgenConfig
from n2nmn_tpu.models.nmn import NMNConfig, NMNModel
from n2nmn_tpu.data.vqa import VqaDataReader
from n2nmn_tpu.train.optim import make_optimizer
from n2nmn_tpu.train.steps import (
    create_train_state, make_cloning_step, make_rl_step, make_eval_step)
from n2nmn_tpu.train.checkpoint import (
    save_params, load_params, snapshot_path)
from n2nmn_tpu.train.metrics import MetricsLogger


@dataclasses.dataclass
class VqaConfig:
    exp_name: str = "vqa_gt_layout"
    mode: str = "cloning"        # "cloning" | "rl"
    root: str = "./exp_vqa"
    # Module parameters (reference train_vqa_gt_layout.py:23-40)
    H_feat: int = 14
    W_feat: int = 14
    D_feat: int = 2048
    embed_dim_txt: int = 300
    embed_dim_nmn: int = 300
    lstm_dim: int = 1000
    num_layers: int = 2
    encoder_dropout: bool = True
    decoder_dropout: bool = True
    decoder_sampling: bool = False   # OFF even in training (:33); rl: True
    T_encoder: int = 26
    T_decoder: int = 13
    N: int = 64
    use_qpn: bool = True
    qpn_dropout: bool = True
    reduce_visfeat_dim: bool = False
    new_visfeat_dim: int = 256
    use_count_module: bool = False
    # Training parameters (reference :42-48; rl :46-50)
    weight_decay: float = 0.0
    learning_rate: float = 1e-3      # rl: 1e-4
    max_grad_l2_norm: Optional[float] = None  # cloning: none; rl: 10
    baseline_decay: float = 0.99
    max_iter: int = 40000            # v2: 80000
    snapshot_interval: int = 5000
    log_interval: int = 20
    invalid_expr_loss: float = 0.5
    lambda_entropy: float = 0.005
    # optional supervision of the decoder's text attention on the
    # readers' gt_txtatt spans (reference util/vqa_train/
    # data_reader.py:25-27,133-138 builds them; no shipped reference
    # driver consumes them — this flag makes them consumable). 0 = off.
    txtatt_loss_weight: float = 0.0
    seed: int = 0
    # Chunked device-resident trainer (train/steps.py:make_chunked_trainer
    # — the CLEVR-flagship path, experiments/clevr.py): stage one shuffled
    # epoch in HBM with image dedup and scan chunk_steps optimizer steps
    # per dispatch. At the real 14x14x2048 geometry a streamed batch is
    # ~100 MB of host->device traffic per step — device residency is the
    # only way this trains on the tunnel. Answer sampling (reference
    # util/vqa_train/data_reader.py:106-109 draws one of the 10 annotator
    # answers per iteration) moves ON DEVICE: the staged [N, 10] answer
    # table is sampled per step, preserving per-iteration semantics.
    device_data: bool = False
    device_data_bf16: bool = False
    device_data_dedup: bool = True
    chunk_steps: int = 0
    imdb_trn: str = "data/imdb/imdb_trainval2014.npy"
    glove_mat_file: str = "data/vocabulary_vqa_glove.npy"
    packed_features: Optional[str] = None
    # end-to-end image->answer: raw COCO images -> in-graph frozen
    # ResNet-152 res5c -> modules in ONE program (replaces the 307 GB
    # offline feature dump the reference consumes, README.md:144).
    # image_H/W 448 -> 14x14x2048 grid, matching the offline dump.
    from_images: bool = False
    image_H: int = 448
    image_W: int = 448
    # converted ResNet-152 weights (torchvision .pth via
    # models/resnet.from_torchvision_state_dict, or a params .npz)
    resnet_weights: Optional[str] = None


def rl_config(**overrides) -> VqaConfig:
    cfg = VqaConfig(exp_name="vqa_rl_gt_layout", mode="rl",
                    decoder_sampling=True, learning_rate=1e-4,
                    max_grad_l2_norm=10.0)
    return dataclasses.replace(cfg, **overrides)


def v2_config(base=None, **overrides) -> VqaConfig:
    cfg = base or VqaConfig(exp_name="vqa2_gt_layout")
    cfg = dataclasses.replace(
        cfg, max_iter=80000,
        imdb_trn="data/imdb_vqa_v2/imdb_trainval2014.npy")
    return dataclasses.replace(cfg, **overrides)


def build_model(cfg: VqaConfig, sampling: bool, T_decoder: int = None):
    grammar = ModuleGrammar.from_vocab_file(
        os.path.join(cfg.root, "data", "vocabulary_layout.txt"))
    with open(os.path.join(cfg.root, "data", "vocabulary_vqa.txt")) as f:
        num_vocab_txt = len([l for l in f if l.strip()])
    with open(os.path.join(cfg.root, "data", "answers_vqa.txt")) as f:
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
    model_cfg = NMNConfig(
        flavor="vqa", netgen=net_cfg, num_choices=num_choices,
        H_feat=cfg.image_H // 32 if cfg.from_images else cfg.H_feat,
        W_feat=cfg.image_W // 32 if cfg.from_images else cfg.W_feat,
        D_feat=(cfg.new_visfeat_dim if cfg.reduce_visfeat_dim
                else cfg.D_feat),
        use_qpn=cfg.use_qpn, qpn_dropout=cfg.qpn_dropout,
        reduce_visfeat_dim=cfg.reduce_visfeat_dim, D_feat_raw=cfg.D_feat,
        in_graph_resnet=cfg.from_images)
    return NMNModel(model_cfg, grammar), grammar


def _load_imdb(cfg: VqaConfig, imdb_file):
    path = (os.path.join(cfg.root, imdb_file)
            if not os.path.isabs(imdb_file) else imdb_file)
    return np.load(path, allow_pickle=True)


def infer_feature_dims(cfg: VqaConfig, imdb) -> VqaConfig:
    """Sync the model's feature-grid dims to the dataset's actual feature
    shape (peeked from the first record, like the reference reader's
    probe — vqa_train/data_reader.py:38-39 pattern). Makes the standard
    exp_vqa drivers run on any feature grid via --data_root (e.g.
    mini-VQA's 6x6x16) without a config fork."""
    from n2nmn_tpu.data.imdb import FeatureSource
    h, w, d = FeatureSource(imdb, cfg.packed_features).feat_shape
    if (h, w, d) != (cfg.H_feat, cfg.W_feat, cfg.D_feat):
        cfg = dataclasses.replace(cfg, H_feat=h, W_feat=w, D_feat=d)
    return cfg


def make_reader(cfg: VqaConfig, imdb_file, grammar, shuffle=True,
                one_pass=False, load_gt_layout=None, T_decoder=None,
                batch_size=None, **extra):
    return VqaDataReader(
        (os.path.join(cfg.root, imdb_file)
         if not os.path.isabs(imdb_file) else imdb_file)
        if isinstance(imdb_file, str) else imdb_file,
        shuffle=shuffle, one_pass=one_pass,
        batch_size=batch_size or cfg.N, seed=cfg.seed,
        vocab_question_file=os.path.join(cfg.root, "data",
                                         "vocabulary_vqa.txt"),
        vocab_answer_file=os.path.join(cfg.root, "data",
                                       "answers_vqa.txt"),
        T_encoder=cfg.T_encoder, T_decoder=T_decoder or cfg.T_decoder,
        grammar=grammar, load_gt_layout=load_gt_layout,
        use_count_module=cfg.use_count_module,
        packed_feature_file=cfg.packed_features,
        raw_images=cfg.from_images,
        image_shape=(cfg.image_H, cfg.image_W), **extra)


def _load_resnet_weights(cfg: VqaConfig, params):
    """Install converted ResNet-152 weights into params['resnet']
    (from_images mode; replaces the offline res5c dump)."""
    from n2nmn_tpu.models import resnet
    from n2nmn_tpu.train.checkpoint import load_params as _lp
    if cfg.resnet_weights.endswith(".npz"):
        # an .npz written by train/checkpoint.save_params of the resnet
        # params subtree (e.g. from exp_vqa/data/extract_resnet152_res5c)
        params["resnet"], _ = _lp(cfg.resnet_weights, params["resnet"])
    else:
        import torch
        sd = torch.load(cfg.resnet_weights, map_location="cpu",
                        weights_only=True)
        params["resnet"] = resnet.from_torchvision_state_dict(sd)
    print(f"loaded ResNet-152 weights from {cfg.resnet_weights}")
    return params


def maybe_load_glove(cfg: VqaConfig, params):
    """Overwrite the encoder embedding with GloVe vectors after init
    (reference train_vqa_gt_layout.py:160-164)."""
    path = os.path.join(cfg.root, cfg.glove_mat_file)
    if os.path.exists(path):
        glove = np.load(path).astype(np.float32)
        tmpl = params["netgen"]["encoder"]["embedding"]["table"]
        assert glove.shape == tmpl.shape, (glove.shape, tmpl.shape)
        params["netgen"]["encoder"]["embedding"]["table"] = jnp.asarray(
            glove)
        print(f"initialized encoder embedding from GloVe: {path}")
    else:
        print(f"WARNING: GloVe file {path} not found; using random init")
    return params


def _train_device_resident(cfg, model, grammar, imdb, state, tx, use_gt,
                           snapshot_dir, logger):
    """Chunked device-resident trainer for VQA (cfg.device_data; same
    staging/dedup/chunk design as experiments/clevr.py, which replaced
    the reference's per-iteration host feed — at 14x14x2048 a streamed
    batch is ~100 MB of h2d per step). VQA-specific: the annotators'
    answers are staged as an int32 [N, 10] table and ONE is sampled ON
    DEVICE per step, preserving the reference's per-iteration answer
    sampling (util/vqa_train/data_reader.py:106-109)."""
    from n2nmn_tpu.train.steps import (cloning_step_body,
                                       drive_chunked_training,
                                       rl_step_body)

    use_txtatt = cfg.mode == "cloning" and cfg.txtatt_loss_weight > 0
    sreader = make_reader(cfg, imdb, grammar,
                          load_gt_layout=True if use_gt else None,
                          shuffle=True, one_pass=True)
    answer_dict = sreader.batch_loader.answer_dict

    def n_axis(k):
        # question-index axis per key (text_seq/gt_layout are time-major
        # [T, N]; gt_txtatt is [Td, Te, N])
        return {"text_seq": 1, "gt_layout": 1, "gt_txtatt": 2}.get(k, 0)

    dedup = cfg.device_data_dedup
    uid, uniq_images = {}, []
    staged, first_paths = [], None
    n_answers = 0
    for batch in sreader.batches():
        n = batch.pop("n_real", None)
        paths = batch.pop("image_path", None)
        for k in ("qid", "qstr", "binary_label", "all_answers", "label"):
            batch.pop(k, None)   # label is re-sampled on device per step
        valid = batch.pop("valid_answers")
        if not use_txtatt:
            batch.pop("gt_txtatt", None)
        if not use_gt:
            batch.pop("gt_layout", None)
        if dedup and (paths is None or any(p is None for p in paths)):
            assert not staged, "image_path vanished mid-epoch"
            dedup = False
        N = batch["seq_length"].shape[0]
        # answer table [N, A]: pad a short annotator list by cycling it
        # (uniform sampling over the table = uniform over the list)
        if not n_answers:
            n_answers = max((len(v) for v in valid if v), default=1)
        tab = np.zeros((N, n_answers), np.int32)
        for i, v in enumerate(valid):
            if v is None or len(v) == 0:
                v = ["<unk>"]
            idxs = [answer_dict.word2idx(a) for a in v]
            tab[i] = [idxs[k % len(idxs)] for k in range(n_answers)]
        batch["answer_set"] = tab
        if n is not None and n < N and staged:
            # wrap-fill the padded tail with the epoch's first rows so
            # every staged batch is full (weight stays 1 — real
            # questions repeated, as an epoch wrap would)
            first = staged[0]
            for k, v in batch.items():
                if k == "img_idx":
                    continue
                ax = n_axis(k)
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
    gb = sum(v.nbytes for v in device_data.values()) / 1e9
    gb += sum(v.nbytes for v in (shared or {}).values()) / 1e9
    print(f"device-resident training: {len(staged)} batches staged "
          f"({gb:.1f} GB"
          + (f", {len(uniq_images)} unique images" if dedup else "")
          + ")", flush=True)

    if cfg.mode == "cloning":
        inner = cloning_step_body(
            model, tx, cfg.weight_decay, dropout_training=True,
            txtatt_loss_weight=cfg.txtatt_loss_weight)
    else:
        inner = rl_step_body(
            model, tx, cfg.weight_decay, cfg.lambda_entropy,
            cfg.invalid_expr_loss, cfg.baseline_decay,
            dropout_training=True)

    def body(state, batch):
        batch = dict(batch)
        if "images_unique" in batch:
            batch["image"] = batch.pop("images_unique")[
                batch.pop("img_idx")]
        batch["image"] = batch["image"].astype(jnp.float32)
        # per-iteration answer sampling ON DEVICE (reference
        # data_reader.py:106-109); key is independent of the step body's
        # own split of state.rng by fold_in construction
        tab = batch.pop("answer_set")
        kk = jax.random.randint(jax.random.fold_in(state.rng, 7919),
                                (tab.shape[0],), 0, tab.shape[1])
        batch["label"] = jnp.take_along_axis(tab, kk[:, None],
                                             axis=1)[:, 0]
        return inner(state, batch)

    return drive_chunked_training(body, device_data, shared, state, cfg,
                                  logger, snapshot_dir)


def train(cfg: VqaConfig, pretrained_model: Optional[str] = None):
    use_gt = cfg.mode == "cloning"
    imdb = _load_imdb(cfg, cfg.imdb_trn)
    if not cfg.from_images:
        # correct under reduce_visfeat_dim too: cfg.D_feat is the RAW
        # grid dim there (build_model maps it to D_feat_raw)
        cfg = infer_feature_dims(cfg, imdb)
    model, grammar = build_model(cfg, sampling=cfg.decoder_sampling)
    device_resident = cfg.device_data or cfg.device_data_bf16
    # device_data mode builds its own one-pass reader; constructing this
    # one too would spin up a second prefetch thread for nothing
    reader = None if device_resident else make_reader(
        cfg, imdb, grammar, load_gt_layout=True if use_gt else None)

    key = jax.random.PRNGKey(cfg.seed)
    params = model.init(key)
    if cfg.from_images and cfg.resnet_weights:
        params = _load_resnet_weights(cfg, params)
    if pretrained_model:
        params, _ = load_params(
            pretrained_model, params,
            allow_missing=("resnet/",) if cfg.from_images else ())
        print(f"restored pretrained model from {pretrained_model}")
    else:
        params = maybe_load_glove(cfg, params)
    tx = make_optimizer(cfg.learning_rate, cfg.max_grad_l2_norm)
    state = create_train_state(
        params, tx, jax.random.fold_in(key, 1),
        baseline_init=cfg.invalid_expr_loss if cfg.mode == "rl" else 0.0)

    if device_resident:
        snapshot_dir = os.path.join(cfg.root, "tfmodel", cfg.exp_name)
        logger = MetricsLogger(os.path.join(cfg.root, "tb"), cfg.exp_name)
        return _train_device_resident(cfg, model, grammar, imdb, state,
                                      tx, use_gt, snapshot_dir, logger)

    use_txtatt = cfg.mode == "cloning" and cfg.txtatt_loss_weight > 0
    if cfg.mode == "cloning":
        train_step = make_cloning_step(
            model, tx, cfg.weight_decay, dropout_training=True,
            txtatt_loss_weight=cfg.txtatt_loss_weight)
    else:
        train_step = make_rl_step(
            model, tx, cfg.weight_decay, cfg.lambda_entropy,
            cfg.invalid_expr_loss, cfg.baseline_decay,
            dropout_training=True)

    snapshot_dir = os.path.join(cfg.root, "tfmodel", cfg.exp_name)
    logger = MetricsLogger(os.path.join(cfg.root, "tb"), cfg.exp_name)

    for n_iter, batch in enumerate(reader.batches()):
        if n_iter >= cfg.max_iter:
            break
        for k in ("image_path", "qid", "qstr", "n_real", "valid_answers",
                  "all_answers", "binary_label"):
            batch.pop(k, None)
        if not use_txtatt:
            batch.pop("gt_txtatt", None)
        if not use_gt:
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


def evaluate(cfg: VqaConfig, exp_name, snapshot_name, test_split,
             batch_size=50):
    """Greedy eval; masks the <unk> answer with -1e10 and writes the
    VQA-server JSON [{question_id, answer}] (reference eval_vqa.py:96-167).
    On the real VQA test splits answer accuracy is NOT computable locally
    (test-server protocol; the reference only prints layout stats); when
    the imdb carries the 10 human answers (mini-VQA / val splits built
    with annotations) the official VQA metric is additionally computed
    via data/vqa_grader.py."""
    return evaluate_many(cfg, exp_name, [snapshot_name], test_split,
                         batch_size=batch_size)[snapshot_name]


def evaluate_many(cfg: VqaConfig, exp_name, snapshot_names, test_split,
                  batch_size=50):
    """Evaluate several snapshots of one experiment over one split,
    staging the split's batches on device ONCE (cf.
    experiments/clevr.evaluate_many — at the real 14x14x2048 geometry a
    split is ~4.7 GB and this tunnel moves ~40 MB/s, so per-snapshot
    re-upload would dominate a select-by-val sweep). Per-snapshot
    semantics identical to the single-snapshot ``evaluate``. Returns
    {snapshot_name: results dict}."""
    imdb_file = f"data/imdb/imdb_{test_split}.npy"
    imdb = _load_imdb(cfg, imdb_file)
    if not cfg.from_images:
        cfg = infer_feature_dims(cfg, imdb)
    model, grammar = build_model(cfg, sampling=False)
    reader = make_reader(cfg, imdb, grammar, shuffle=False,
                         one_pass=True, batch_size=batch_size)
    loader = reader.batch_loader
    answer_word_list = loader.answer_dict.word_list
    assert answer_word_list[0] == "<unk>", \
        "answer list must start with <unk> (reference eval_vqa.py:105)"

    cached = []
    for batch in reader.batches():
        n = batch.pop("n_real")
        qids = batch.pop("qid")[:n]
        gt_layout = batch.pop("gt_layout", None)
        for k in ("image_path", "qstr", "valid_answers", "all_answers",
                  "binary_label", "gt_txtatt", "label"):
            batch.pop(k, None)
        cached.append((jax.device_put(batch), n, qids, gt_layout))

    params_t = model.init(jax.random.PRNGKey(0))
    eval_step = make_eval_step(model)
    rng = jax.random.PRNGKey(0)

    all_results = {}
    for snapshot_name in snapshot_names:
        params, _ = load_params(
            os.path.join(cfg.root, "tfmodel", exp_name, snapshot_name),
            params_t,
            allow_missing=("resnet/",) if cfg.from_images else ())
        if cfg.from_images and cfg.resnet_weights:
            params = _load_resnet_weights(cfg, params)

        layout_correct = layout_valid = num_questions = 0
        output_qids_answers = []
        for batch, n, qids, gt_layout in cached:
            out = eval_step(params, batch, rng)
            scores = np.array(out["scores"])[:n]
            scores[:, 0] = -1e10  # remove <unk> answer
            preds = np.argmax(scores, axis=1)
            tokens = np.asarray(out["tokens"])[:, :n]
            if gt_layout is not None:
                gt = gt_layout[:, :n]
                t = min(tokens.shape[0], gt.shape[0])
                layout_correct += int(np.sum(np.all(
                    np.logical_or(tokens[:t] == gt[:t],
                                  gt[:t] == grammar.eos_idx), axis=0)))
            layout_valid += int(np.sum(np.asarray(out["validity"])[:n]))
            num_questions += n
            output_qids_answers += [
                {"question_id": int(qid), "answer": answer_word_list[p]}
                for qid, p in zip(qids, preds)]

        results = {
            "layout_accuracy": layout_correct / max(num_questions, 1),
            "layout_validity": layout_valid / max(num_questions, 1),
            "num_questions": num_questions,
        }
        if len(imdb) and imdb[0].get("all_answers") is not None:
            from n2nmn_tpu.data.vqa_grader import grade_predictions
            graded = grade_predictions(
                {r["question_id"]: r["answer"]
                 for r in output_qids_answers}, imdb)
            results["answer_accuracy"] = graded["overall"]
            results["accuracy_per_type"] = graded["per_type"]
        save_dir = os.path.join(cfg.root, "results", exp_name)
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(
                save_dir, f"{snapshot_name}.{test_split}.txt"), "w") as f:
            print(f"On split: {test_split}", file=f)
            for k, v in results.items():
                print(f"\t{k.replace('_', ' ')} = {v}", file=f)
                print(f"{k.replace('_', ' ')} = {v} on {test_split}")
        out_dir = os.path.join(cfg.root, "eval_outputs", exp_name)
        os.makedirs(out_dir, exist_ok=True)
        eval_output_file = os.path.join(
            out_dir, f"vqa_OpenEnded_mscoco_{test_split}_"
                     f"{exp_name}_{snapshot_name}_results.json")
        with open(eval_output_file, "w") as f:
            json.dump(output_qids_answers, f)
        print("prediction file written to", eval_output_file)
        all_results[snapshot_name] = results
    return all_results
    return results
