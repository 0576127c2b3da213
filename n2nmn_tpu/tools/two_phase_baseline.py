"""Reference-faithful two-phase eval reconstruction — the measured
throughput baseline.

The reference's eval loop (exp_clevr/eval_clevr.py:93-165) splits every
64-question batch across a host round-trip:

  phase 1 (device): encoder + greedy grammar-masked decode -> tokens
                    fetched to the host (partial_run #1, :108-113)
  host:             Python RPN stack assembler per example
                    (nmn3_assembler.py:153-212) + Fold's
                    compiler.build_feed_dict schedule construction
                    (train_clevr_gt_layout.py:190)
  phase 2 (device): module-network execution on the host-fed schedule
                    (partial_run #2, :114-117)

and the data reader np.load()s one feature file per question from disk
(util/clevr_train/data_reader.py:58) on a daemon prefetch thread with a
bounded Queue(8) (:102-107).

This module reconstructs that execution model with our own (faster) JAX
phases: two separately jitted device programs, tokens fetched to host,
the host Assembler run per example, an explicit per-node schedule-array
construction standing in for build_feed_dict, per-question .npy disk
loads on a prefetch thread. Everything our fused single-program path
eliminates is actually paid here, and everything else (XLA-compiled
phases instead of TF1 Fold dynamic graphs) is *faster* than the original
system — so a speedup quotient measured against this reconstruction is a
conservative lower bound on the true speedup over TF1.0+Fold.
"""

from __future__ import annotations

import os
import queue
import threading
import time

import jax
import numpy as np

from n2nmn_tpu.layout.assembler import Assembler, INVALID_EXPR
from n2nmn_tpu.layout.executor import execute_layout
from n2nmn_tpu.models.netgen import run_netgen


def ensure_feature_files(feature_dir: str, n_files: int,
                         shape=(1, 10, 15, 512), seed: int = 0) -> list:
    """Write synthetic per-question feature files once (the stand-in for
    the reference's 29 GB VGG pool5 dump); returns the file list."""
    os.makedirs(feature_dir, exist_ok=True)
    paths = [os.path.join(feature_dir, f"q{i:05d}.npy")
             for i in range(n_files)]
    if all(os.path.exists(p) for p in paths):
        return paths
    rng = np.random.RandomState(seed)
    for p in paths:
        np.save(p, rng.randn(*shape).astype(np.float32))
    return paths


def _tree_to_schedule(expr):
    """Flatten one assembled expression tree into per-node schedule arrays
    (module name id is left symbolic; indices mirror what Fold's
    build_feed_dict computes per tree: a post-order op list with input
    wiring)."""
    ops = []

    def walk(node):
        i0 = walk(node["input_0"]) if "input_0" in node else -1
        i1 = walk(node["input_1"]) if "input_1" in node else -1
        ops.append((node["module"], node["time_idx"], i0, i1))
        return len(ops) - 1

    walk(expr)
    return ops


def make_phase_fns(model):
    """Two separately-jitted programs replicating the reference's
    partial_run split. Phase-1 outputs that the reference keeps device-
    resident between phases (word_vecs) are returned as device arrays and
    passed into phase 2 without a host copy."""
    cfg = model.cfg

    def phase1(params, text_seq, seq_length, rng):
        out = run_netgen(params["netgen"], cfg.netgen, model.grammar_arrays,
                         text_seq, seq_length, rng, deterministic=True)
        return out.tokens, out.word_vecs

    def phase2(params, tokens, word_vecs, image_feat):
        pre_static, pre_step = model.lib.precompute(
            params["modules"], image_feat, word_vecs)
        att_b, ans_b = model.lib.make_branches(params["modules"])
        scores, validity = execute_layout(
            tokens, model.tables, att_b, ans_b, pre_static, pre_step,
            hw=cfg.H_feat * cfg.W_feat, num_choices=cfg.num_choices,
            stack_size=cfg.netgen.T_decoder)
        return scores, validity

    return jax.jit(phase1), jax.jit(phase2)


def run_two_phase_baseline(model, params, feature_dir: str,
                           num_questions: int = 2048,
                           batch_size: int = 64,
                           T_enc: int = 45,
                           num_vocab_txt: int = 82,
                           warmup_batches: int = 2,
                           seed: int = 0,
                           device_features: bool = False):
    """Time the full two-phase pipeline; returns a dict with qps and a
    component breakdown. batch_size=64 matches the reference eval
    (exp_clevr/eval_clevr.py:30).

    device_features=True pre-stages every batch's features on device
    before timing (skipping disk loads and the per-batch host->device
    feature copy) — this isolates the two-phase + host-assembly structure
    cost from the data path, for environments where host->device
    bandwidth differs from the reference's PCIe."""
    n_batches = num_questions // batch_size
    paths = ensure_feature_files(
        feature_dir, num_questions,
        shape=(1, model.cfg.H_feat, model.cfg.W_feat, model.cfg.D_feat))

    assembler = Assembler(model.grammar)
    phase1, phase2 = make_phase_fns(model)

    rng_np = np.random.RandomState(seed)
    questions = rng_np.randint(
        0, num_vocab_txt, size=(T_enc, num_questions)).astype(np.int32)
    seq_length = np.full((batch_size,), T_enc, np.int32)

    def load_batch(b):
        """Per-question np.load from disk + time-major question slice —
        the BatchLoaderClevr work (clevr_train/data_reader.py:41-82)."""
        lo = b * batch_size
        feats = np.concatenate(
            [np.load(paths[lo + i]) for i in range(batch_size)], axis=0)
        return questions[:, lo:lo + batch_size], feats

    # daemon prefetch thread + bounded queue, as in the reference
    # (clevr_train/data_reader.py:102-107)
    q: queue.Queue = queue.Queue(maxsize=8)

    def prefetch():
        for b in range(n_batches):
            q.put(load_batch(b))

    # warmup/compile both phases before timing
    wq, wf = load_batch(0)
    rng = jax.random.PRNGKey(0)
    tokens_dev, word_vecs = phase1(params, wq, seq_length, rng)
    tokens_host = np.asarray(tokens_dev)
    scores, validity = phase2(params, tokens_host, word_vecs, wf)
    jax.block_until_ready(scores)

    staged = None
    if device_features:
        staged = [jax.device_put(load_batch(b)[1]) for b in range(n_batches)]
        jax.block_until_ready(staged)

    t_host_assemble = 0.0
    t_device = 0.0
    thread = threading.Thread(target=prefetch, daemon=True)
    t0 = time.perf_counter()
    if not device_features:
        thread.start()
    n_done = 0
    for b in range(n_batches):
        if device_features:
            q_batch, feats = questions[:, b * batch_size:
                                       (b + 1) * batch_size], staged[b]
        else:
            q_batch, feats = q.get()
        td0 = time.perf_counter()
        tokens_dev, word_vecs = phase1(params, q_batch, seq_length, rng)
        tokens_host = np.asarray(tokens_dev)       # device -> host fetch
        td1 = time.perf_counter()
        # host RPN assembly + schedule-array construction (the
        # assembler.assemble + build_feed_dict analog)
        expr_list, expr_validity = assembler.assemble(tokens_host)
        schedules = [_tree_to_schedule(e) for e in expr_list
                     if e["module"] != INVALID_EXPR]
        th1 = time.perf_counter()
        scores, validity = phase2(params, tokens_host, word_vecs, feats)
        scores_host = np.asarray(scores)           # fetch answers
        preds = np.argmax(scores_host, axis=1)
        td2 = time.perf_counter()
        t_host_assemble += th1 - td1
        t_device += (td1 - td0) + (td2 - th1)
        n_done += batch_size
        del schedules, preds
    dt = time.perf_counter() - t0

    return {
        "qps": n_done / dt,
        "total_s": dt,
        "device_and_fetch_s": t_device,
        "host_assemble_s": t_host_assemble,
        "batches": n_batches,
        "batch_size": batch_size,
    }


def run_image_two_phase_baseline(model, params, work_dir: str,
                                 num_questions: int = 1024,
                                 questions_per_image: int = 10,
                                 batch_size: int = 64,
                                 image_hw=(320, 480),
                                 T_enc: int = 45,
                                 num_vocab_txt: int = 82,
                                 seed: int = 0):
    """Reference-faithful IMAGE->ANSWER pipeline reconstruction: the
    missing baseline half for BENCH's from_images_qps.

    The reference never runs image->answer in one system; it is two
    offline stages:

      stage 0: per-image feature extraction at BATCH SIZE 1 — a
               [1,320,480,3] placeholder fed through vgg_pool5, one
               sess.run per image, each pool5 np.save()d to disk
               (exp_clevr/data/extract_visual_features_vgg_pool5.py:
               25-48; the 29 GB dump, README.md:57)
      stage 1: the two-phase eval loop re-np.load()ing those files per
               question (eval_clevr.py:93-165 via the data reader).

    This reconstructs both stages with our (faster) JAX pieces: a
    batch-1 jitted f32 VGG program with per-image host->device upload,
    feature fetch, and np.save; then run_two_phase_baseline() over the
    dump. questions_per_image amortizes stage 0 the way CLEVR does
    (~700k questions / 70k images ~= 10, reference README.md:46-57).
    Returns composite questions/sec with the per-stage split."""
    from n2nmn_tpu.models import backbones

    os.makedirs(work_dir, exist_ok=True)
    num_images = max(1, num_questions // questions_per_image)
    rng_np = np.random.RandomState(seed)
    H, W = image_hw

    vgg_params = backbones.init_vgg16(jax.random.PRNGKey(seed))
    extract = jax.jit(lambda p, im: backbones.vgg16_pool5(p, im))

    # stage 0: batch-1 extraction, one upload + one fetch + one np.save
    # per image (reference extract_image_pool5, :33-37)
    im0 = rng_np.rand(1, H, W, 3).astype(np.float32) * 255.0
    jax.block_until_ready(extract(vgg_params, im0))   # compile
    feat_paths = []
    t0 = time.perf_counter()
    for i in range(num_images):
        im = rng_np.rand(1, H, W, 3).astype(np.float32) * 255.0
        pool5 = np.asarray(extract(vgg_params, im))
        p = os.path.join(work_dir, f"im{i:05d}.npy")
        np.save(p, pool5)
        feat_paths.append(p)
    t_extract = time.perf_counter() - t0

    # stage 1: the standard two-phase eval over the dump; per-question
    # feature files alias images round-robin (questions_per_image)
    q_dir = os.path.join(work_dir, "per_question")
    os.makedirs(q_dir, exist_ok=True)
    for q in range(num_questions):
        dst = os.path.join(q_dir, f"q{q:05d}.npy")
        if not (os.path.islink(dst) or os.path.exists(dst)):
            os.symlink(os.path.abspath(feat_paths[q % num_images]), dst)
    eval_res = run_two_phase_baseline(
        model, params, feature_dir=q_dir, num_questions=num_questions,
        batch_size=batch_size, T_enc=T_enc, num_vocab_txt=num_vocab_txt,
        seed=seed)

    total_s = t_extract + eval_res["total_s"]
    return {
        "qps": num_questions / total_s,
        "total_s": total_s,
        "extract_s": t_extract,
        "extract_images_per_s": num_images / t_extract,
        "num_images": num_images,
        "questions_per_image": questions_per_image,
        "eval_qps": eval_res["qps"],
        "eval_total_s": eval_res["total_s"],
        "batch_size": batch_size,
    }
