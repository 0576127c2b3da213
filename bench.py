"""End-to-end benchmark suite (flagship CLEVR config). Prints ONE JSON
line; primary metric is fused eval throughput, plus:

- vs_baseline: measured against a reference-faithful two-phase
  reconstruction run on THIS chip (n2nmn_tpu/tools/two_phase_baseline.py):
  greedy decode program #1 -> host RPN assembler + schedule build ->
  execution program #2, batch 64, per-question feature .npy disk loads on
  a prefetch thread — the execution model of
  reference exp_clevr/eval_clevr.py:93-165. Because the reconstruction's
  device phases are XLA-compiled (not TF1.0+Fold dynamic graphs), the
  measured quotient is a conservative lower bound on the true speedup;
  the old TF1-GPU estimate (~300 q/s) is kept as tf1_estimate_qps for
  reference only.
- mfu: analytic XLA FLOP count per compiled step / measured time /
  197 TFLOP/s bf16 peak (TPU v5e).
- train_steps_per_sec_{cloning,rl}: fused train-step throughput at the
  reference flagship config (N=64, T_dec=10, sampling on — reference
  exp_clevr/train_clevr_gt_layout.py:23-44).
- from_images_qps: raw 480x320 image -> VGG-16 pool5 -> module network in
  ONE program (no 29 GB offline feature dump, reference README.md:57).
"""

import json
import os
import time

# persistent compilation cache: the suite is compile-dominated (~9 min
# cold), and its programs are identical run to run — the cache cuts
# repeat runs to the measurement time only. Must be set before jax init.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

TF1_GPU_ESTIMATE_QPS = 300.0   # labeled estimate only; see module docstring
V5E_BF16_PEAK_FLOPS = 197e12   # TPU v5e peak (bf16 MXU)

BF16 = os.environ.get("N2NMN_BENCH_F32", "0") != "1"


def _cast_bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        tree)


def _timeit(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _flops_of(jfn, args):
    """Per-call FLOP count from XLA's compiled cost analysis."""
    try:
        ca = jfn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_fused_eval(batch_sizes=(256, 1024)):
    """Throughput sweep over serving batch size. The decode/encode scans
    re-stream the LSTM weight matrices from HBM every sequential step
    with no cross-step reuse, so larger serving batches amortize that
    traffic over more questions — batch is a legitimate serving knob the
    reference (fixed batch 64, eval_clevr.py:33) never had."""
    from __graft_entry__ import entry
    from n2nmn_tpu.tools.flops import flagship_eval_flops_per_question

    fn, (params, text_seq, seq_length, image_feat, rng) = entry()
    t_enc = text_seq.shape[0]
    key = jax.random.PRNGKey(0)

    # bf16 serving mode by default. Verified on trained snapshots
    # (tools/bf16_check.py artifacts in exp_clevr_mini/results/):
    # layout tokens + validity EXACTLY identical to f32; answer argmaxes
    # 99.4-99.95% identical (boundary ties) with answer accuracy equal to
    # 4 decimals. Synthetic-SHAPES model: fully bit-identical.
    if BF16:
        params = _cast_bf16(params)

    jfn = jax.jit(fn)
    flops_q = flagship_eval_flops_per_question(
        _flagship_model().cfg.netgen, T_enc=t_enc)
    per_batch = {}
    best = None
    for n in batch_sizes:
        ts = jax.random.randint(key, (t_enc, n), 0, 82, jnp.int32)
        sl = jnp.full((n,), t_enc, jnp.int32)
        feat = jax.random.normal(key, (n,) + image_feat.shape[1:],
                                 jnp.bfloat16 if BF16 else jnp.float32)
        args = (params, ts, sl, feat, rng)
        dt = _timeit(jfn, args, iters=20)
        qps = n / dt
        per_batch[n] = qps
        if best is None or qps > best[1]:
            best = (n, qps, args)
    n, qps, args = best
    # analytic FLOPs (XLA's cost_analysis counts scan bodies once instead
    # of trip-count times — ~5x under on this scan-heavy program; kept as
    # a secondary diagnostic)
    xla_flops_q = _flops_of(jfn, args) / n
    mfu = (flops_q * qps) / V5E_BF16_PEAK_FLOPS
    return qps, mfu, flops_q, xla_flops_q, n, per_batch


def bench_pipelined_eval(n_total=1024, iters=20):
    """Round-4 serving mode: decode(k+1) + execute(k) of two half-batches
    in ONE program (tools/pipelined_eval.py) — overlaps the latency-bound
    decode chain with the bandwidth-bound executor streams across
    batches. Equality-tested vs the fused path (tests/test_serve.py);
    measured 1.06-1.17x over fused at equal question counts
    (perf/pipelined_eval_r4.json)."""
    from n2nmn_tpu.tools.pipelined_eval import (
        make_pipeline_fns, run_pipelined)

    model = _flagship_model()
    params = model.init(jax.random.PRNGKey(0))
    if BF16:
        params = _cast_bf16(params)
    half = n_total // 2
    t_enc = 45
    key = jax.random.PRNGKey(0)
    fdt = jnp.bfloat16 if BF16 else jnp.float32
    # small ring of distinct half-batches cycled to bound device memory
    ring = [(jax.random.randint(jax.random.fold_in(key, i),
                                (t_enc, half), 0, 82, jnp.int32),
             jnp.full((half,), t_enc, jnp.int32),
             jax.random.normal(jax.random.fold_in(key, 100 + i),
                               (half, 10, 15, 512), fdt))
            for i in range(4)]
    batches = [ring[i % 4] for i in range(2 * iters)]
    rng = jax.random.PRNGKey(1)
    fns = make_pipeline_fns(model)
    outs = run_pipelined(model, params, batches[:4], rng, fns=fns)  # compile
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = run_pipelined(model, params, batches, rng, fns=fns)
    jax.block_until_ready(outs)
    return 2 * iters * half / (time.perf_counter() - t0)


def bench_two_phase_baseline():
    """Reference execution model, float32 (the reference system is f32
    TF1.0+Fold); params reused from the flagship entry() model."""
    from __graft_entry__ import entry
    from n2nmn_tpu.tools.two_phase_baseline import run_two_phase_baseline

    fn, (params, *_) = entry()
    model = _flagship_model()
    full = run_two_phase_baseline(
        model, params, feature_dir=".bench_cache/features",
        num_questions=2048, batch_size=64)
    # structure-only variant: features pre-staged on device, isolating the
    # two-phase/host-assembly cost from this environment's host->device
    # tunnel bandwidth (reported separately as h2d_mb_per_s)
    dev = run_two_phase_baseline(
        model, params, feature_dir=".bench_cache/features",
        num_questions=2048, batch_size=64, device_features=True)
    full["qps_device_feats"] = dev["qps"]
    return full


def bench_image_baseline():
    """Reference-faithful image->answer reconstruction: batch-1 VGG
    extraction dumped to disk (extract_visual_features_vgg_pool5.py:
    25-48) + the two-phase eval loop over the dump (eval_clevr.py:
    93-165), extraction amortized over CLEVR's ~10 questions/image.
    The missing baseline half for from_images_qps."""
    from __graft_entry__ import entry
    from n2nmn_tpu.tools.two_phase_baseline import (
        run_image_two_phase_baseline)

    fn, (params, *_) = entry()
    model = _flagship_model()
    return run_image_two_phase_baseline(
        model, params, work_dir=".bench_cache/image_baseline",
        num_questions=1024, questions_per_image=10, batch_size=64)


def measure_h2d_bandwidth(mb: int = 64):
    """Host->device copy bandwidth of this environment (the axon-tunneled
    chip is far below a local PCIe link; reported so the baseline's
    feed-per-batch cost is interpretable)."""
    x = np.random.randn(mb * 1024 * 1024 // 4).astype(np.float32)
    jax.block_until_ready(jax.device_put(x))   # warm
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(x))
    return mb / (time.perf_counter() - t0)


def _flagship_model():
    """Same model construction as entry() (flagship CLEVR eval config)."""
    from n2nmn_tpu.layout.grammar import ModuleGrammar
    from n2nmn_tpu.models.netgen import NetgenConfig
    from n2nmn_tpu.models.nmn import NMNConfig, NMNModel

    vocab = ["_Scene", "_Find", "_Filter", "_FindSameProperty",
             "_Transform", "_And", "_Or", "_Exist", "_Count",
             "_EqualNum", "_MoreNum", "_LessNum", "_SameProperty",
             "_Describe", "<eos>"]
    grammar = ModuleGrammar(vocab)
    net_cfg = NetgenConfig(
        num_vocab_txt=82, embed_dim_txt=300, num_vocab_nmn=grammar.num_vocab,
        embed_dim_nmn=300, lstm_dim=512, num_layers=2, T_decoder=20,
        decoder_sampling=False, mask_mode="grammar")
    cfg = NMNConfig(flavor="clevr", netgen=net_cfg, num_choices=28,
                    H_feat=10, W_feat=15, D_feat=512)
    return NMNModel(cfg, grammar)


def bench_train_steps():
    """Fused train-step throughput at the reference flagship train config
    (N=64, T_dec=10, sampling on: train_clevr_gt_layout.py:23-44)."""
    import dataclasses
    from n2nmn_tpu.train.optim import make_optimizer
    from n2nmn_tpu.train.steps import (
        create_train_state, make_cloning_step, make_rl_step)

    model = _flagship_model()
    net_cfg = dataclasses.replace(model.cfg.netgen, T_decoder=10,
                                  decoder_sampling=True)
    cfg = dataclasses.replace(model.cfg, netgen=net_cfg)
    from n2nmn_tpu.models.nmn import NMNModel
    model = NMNModel(cfg, model.grammar)

    key = jax.random.PRNGKey(0)
    params = model.init(key)
    tx = make_optimizer(1e-3, max_grad_l2_norm=10.0)

    n, t_enc = 64, 45
    rng_np = np.random.RandomState(0)
    batch = {
        "text_seq": rng_np.randint(0, 82, size=(t_enc, n)).astype(np.int32),
        "seq_length": np.full((n,), t_enc, np.int32),
        "image": rng_np.randn(n, 10, 15, 512).astype(np.float32),
        "label": rng_np.randint(0, 28, size=(n,)).astype(np.int32),
        "gt_layout": np.full((10, n), model.grammar.eos_idx, np.int32),
        "weight": np.ones((n,), np.float32),
    }
    # device-resident batch: training feeds batches via the prefetching
    # reader / chunked device-resident trainer, not a synchronous
    # host->device copy per step (train/steps.py:make_chunked_trainer)
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    out = {}
    for name, step in (
            ("cloning", make_cloning_step(model, tx, weight_decay=5e-6)),
            ("rl", make_rl_step(model, tx, weight_decay=5e-6,
                                lambda_entropy=0.005,
                                invalid_expr_loss=0.5))):
        b = dict(batch)
        if name == "rl":
            b.pop("gt_layout")
        state = create_train_state(params, tx, jax.random.fold_in(key, 1))
        state, _ = step(state, b)          # compile
        jax.block_until_ready(state.params)
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            state, _ = step(state, b)
        jax.block_until_ready(state.params)
        out[name] = iters / (time.perf_counter() - t0)
    return out


def bench_from_images():
    """Image->answer in one program: raw 480x320 BGR batch -> on-device
    VGG-16 pool5 -> grammar decode -> module execution."""
    import dataclasses
    from n2nmn_tpu.models.nmn import NMNModel

    base = _flagship_model()
    cfg = dataclasses.replace(base.cfg, in_graph_vgg=True)
    model = NMNModel(cfg, base.grammar)
    params = model.init(jax.random.PRNGKey(0))

    n = int(os.environ.get("N2NMN_FROM_IMAGES_BATCH", "32"))
    t_enc = 45
    key = jax.random.PRNGKey(0)
    text_seq = jax.random.randint(key, (t_enc, n), 0, 82, jnp.int32)
    seq_length = jnp.full((n,), t_enc, jnp.int32)
    images = jax.random.uniform(key, (n, 320, 480, 3), jnp.float32) * 255.0
    rng = jax.random.PRNGKey(1)

    if BF16:
        params = _cast_bf16(params)
        # serve the backbone in bf16 end to end: raw pixels have 8
        # significant bits, so bf16 images lose nothing, and f32 inputs
        # against bf16 weights force XLA to upcast conv1
        images = images.astype(jnp.bfloat16)

    @jax.jit
    def fn(params, text_seq, seq_length, images, rng):
        out = model.apply(params, text_seq, seq_length, images, rng,
                          use_gt_layout=False, deterministic=True)
        return out.scores, out.tokens, out.validity

    from n2nmn_tpu.tools.flops import flagship_eval_flops_per_question
    args = (params, text_seq, seq_length, images, rng)
    dt = _timeit(fn, args, iters=10)
    flops_q = flagship_eval_flops_per_question(
        cfg.netgen, T_enc=t_enc, from_images=True)

    # deduped variant: CLEVR averages ~10 questions per image, so the
    # production program takes M unique images + a question->image
    # gather (NMNModel.apply image_idx) — same amortization the
    # reference's offline feature dump gets by materializing on disk
    qpi = 10
    n_q = n * qpi
    text_q = jax.random.randint(key, (t_enc, n_q), 0, 82, jnp.int32)
    sl_q = jnp.full((n_q,), t_enc, jnp.int32)
    img_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), qpi)

    @jax.jit
    def fn_dedup(params, text_seq, seq_length, images, image_idx, rng):
        out = model.apply(params, text_seq, seq_length, images, rng,
                          use_gt_layout=False, deterministic=True,
                          image_idx=image_idx)
        return out.scores, out.tokens, out.validity

    dt_d = _timeit(fn_dedup,
                   (params, text_q, sl_q, images, img_idx, rng), iters=10)
    return (n / dt, (flops_q * n / dt) / V5E_BF16_PEAK_FLOPS,
            n_q / dt_d)


def _trained_serving_summary():
    """Quote the trained-snapshot serving artifact when present (see the
    JSON-key comment at the call site)."""
    path = "perf/trained_serving_compose_rlfull_r5.json"
    try:
        with open(path) as f:
            sweep = json.load(f)["sweep"]
    except (OSError, KeyError, ValueError):
        return {}
    best = max(r.get("pipelined+early_exit_qps", 0) for r in sweep)
    return {"trained_serving_composed_qps": best,
            "trained_serving_artifact": path}


def main():
    (fused_qps, mfu, flops_per_q, xla_flops_q, best_n,
     per_batch) = bench_fused_eval()
    pipelined_qps = bench_pipelined_eval()
    # headline = best serving mode; the pipelined path is prediction-
    # equality-tested vs fused (tests/test_serve.py) so both are
    # legitimate serving configurations of the same model
    if pipelined_qps > fused_qps:
        qps = pipelined_qps
        serving_mode = "pipelined (2x512 in flight, one program)"
        # MFU directly from the headline qps: flops/query is identical in
        # both serving modes (same model program) — ADVICE r4
        mfu = (flops_per_q * pipelined_qps) / V5E_BF16_PEAK_FLOPS
    else:
        qps = fused_qps
        serving_mode = f"fused single batch N={best_n}"
    baseline = bench_two_phase_baseline()
    train = bench_train_steps()
    img_qps, img_mfu, img_dedup_qps = bench_from_images()
    img_baseline = bench_image_baseline()
    h2d = measure_h2d_bandwidth()

    print(json.dumps({
        "metric": "clevr_eval_throughput",
        "value": round(qps, 2),
        "unit": "questions/sec",
        "vs_baseline": round(qps / baseline["qps"], 2),
        "baseline_qps": round(baseline["qps"], 2),
        "baseline_method": (
            "measured two-phase reconstruction of the reference eval loop "
            "(decode program -> host RPN assemble -> execute program, "
            "batch 64, per-question .npy disk loads w/ prefetch thread, "
            "feed_dict-style feature upload per batch; "
            "exp_clevr/eval_clevr.py:93-165) on this chip; conservative — "
            "its device phases are XLA, not TF1+Fold"),
        "baseline_qps_device_feats": round(
            baseline["qps_device_feats"], 2),
        "baseline_host_assemble_s": round(baseline["host_assemble_s"], 3),
        "baseline_device_s": round(baseline["device_and_fetch_s"], 3),
        "baseline_total_s": round(baseline["total_s"], 3),
        "h2d_mb_per_s": round(h2d, 1),
        "tf1_estimate_qps": TF1_GPU_ESTIMATE_QPS,
        "mfu": round(mfu, 4),
        "serving_mode": serving_mode,
        "fused_qps": round(fused_qps, 2),
        "pipelined_qps": round(pipelined_qps, 2),
        # eval_batch/qps_per_batch describe the FUSED single-batch sweep
        # even when the headline qps/mfu are pipelined (ADVICE r4)
        "eval_batch": best_n,
        "qps_per_batch": {str(k): round(v, 1)
                          for k, v in per_batch.items()},
        # non-monotone qps over the batch sweep means throughput REGRESSES
        # at larger serving batches (round-2: decode scan anti-scaling) —
        # keep this loud until the sweep is monotone
        "qps_monotone_in_batch": bool(all(
            per_batch[a] <= per_batch[b] for a, b in zip(
                sorted(per_batch), sorted(per_batch)[1:]))),
        "flops_per_question_gflop": round(flops_per_q / 1e9, 3),
        "flops_method": "analytic (tools/flops.py); XLA cost_analysis "
                        "counts scan bodies once and under-reports",
        "xla_flops_per_question_gflop": round(xla_flops_q / 1e9, 3),
        "train_steps_per_sec_cloning": round(train["cloning"], 2),
        "train_steps_per_sec_rl": round(train["rl"], 2),
        "train_batch_size": 64,
        "from_images_qps": round(img_qps, 2),
        "from_images_mfu": round(img_mfu, 4),
        # production image->answer shape: M unique images + question->
        # image gather (10 q/image, CLEVR's ratio) — the apples-to-apples
        # counterpart of image_baseline_qps's per-image amortization
        "from_images_dedup_qps": round(img_dedup_qps, 2),
        "from_images_dedup_vs_baseline": round(
            img_dedup_qps / img_baseline["qps"], 2),
        # image->answer north star: fused one-program path (every
        # question pays a full VGG) vs the reconstructed reference
        # pipeline (batch-1 extraction dump amortized over ~10
        # questions/image + two-phase eval) — conservative for us
        "from_images_vs_baseline": round(
            img_qps / img_baseline["qps"], 2),
        "image_baseline_qps": round(img_baseline["qps"], 2),
        "image_baseline_extract_images_per_s": round(
            img_baseline["extract_images_per_s"], 2),
        "image_baseline_eval_qps": round(img_baseline["eval_qps"], 2),
        "image_baseline_method": (
            "batch-1 VGG pool5 extraction w/ per-image upload+fetch+"
            "np.save (extract_visual_features_vgg_pool5.py:25-48), "
            "amortized over 10 questions/image, + two-phase eval over "
            "the dump (eval_clevr.py:93-165); device phases XLA, so "
            "conservative vs TF1+Fold"),
        "dtype": "bfloat16" if BF16 else "float32",
        # trained-weight serving (random weights never emit <eos> early,
        # so THIS bench cannot measure early-exit/composed modes; the
        # numbers below are measured by tools/trained_serving_bench.py
        # on the v2.1 RL snapshot with real questions and quoted from
        # its committed artifact)
        **_trained_serving_summary(),
    }))


if __name__ == "__main__":
    main()
