"""Shared compute cores for the neural modules.

Design rule for TPU: every layout-independent matmul (the 1x1-conv image
mappings, the per-timestep text mappings) is *precomputed in one batched
MXU pass outside the executor scan*; the per-step branch functions are
cheap VPU elementwise ops plus tiny contractions. This is the key
restructuring vs the reference, where each module recomputes its conv/fc
inside the Fold-scheduled tree (models_clevr/nmn3_modules.py:74-111).

Attention maps are carried flattened as [N, HW]; image feature grids as
[N, HW, D].
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

from n2nmn_tpu.ops.nn import l2_normalize

# Fused Pallas kernels for the two hot inner patterns (find-core and
# softmax readout); opt-in via env until validated per-deployment.
USE_PALLAS = os.environ.get("N2NMN_USE_PALLAS", "0") == "1"

# One-pass _FindSameProperty core via the fused find kernel: the XLA
# lowering splits the num/den reductions into two loop fusions that
# each re-read the [N, HW, map_dim] img_fsp grid per executor step
# (traced at 232 us/step at N=1024, perf/trace_ops_r3.json
# %multiply_reduce_fusion.{23,24}); the kernel streams the grid through
# VMEM once. Math-identical: l2norm(img ⊙ txt ⊙ att) with the two
# per-example vectors pre-multiplied (grad-equivalence test in
# tests/test_pallas_kernels.py). Measured on v5e bf16 eval: executor
# 18.2->15.6 ms, 42.5k->47.7k q/s at N=1024; 45.0k->49.9k at N=256
# (perf/profile_fsp_r3_*.json) — the first per-pattern kernel that beats
# XLA in-program, because it replaces TWO full reads of the grid with
# one VMEM-resident pass. "auto" (default) = on when the kernel would
# compile for a real TPU AND the trace is inference-only: under jax.grad
# the custom-VJP boundary blocks XLA fusion and the measured 300-iter
# mini-CLEVR training time goes 10.3 -> 15.4 s, so train/steps.py marks
# its loss traces with training_trace() and "auto" resolves off there.
# Off on CPU where the interpret-mode kernel is slower than XLA (tests
# force it on explicitly with USE_FUSED_FSP=True).
USE_FUSED_FSP = os.environ.get("N2NMN_FUSED_FSP", "auto")

_TRAINING_TRACE = False  # True while tracing a differentiated apply


@contextlib.contextmanager
def training_trace(active: bool = True):
    """Mark the enclosing trace as a training (differentiated) program.
    Trace-time only — wraps model.apply calls inside loss functions so
    "auto" kernel gates can pick the inference-only fast paths safely."""
    global _TRAINING_TRACE
    prev = _TRAINING_TRACE
    _TRAINING_TRACE = bool(active)
    try:
        yield
    finally:
        _TRAINING_TRACE = prev


def fused_fsp_active() -> bool:
    """Resolve USE_FUSED_FSP at trace time (batch-independent)."""
    v = USE_FUSED_FSP
    if v in (True, "1"):
        return True
    if v in (False, "0"):
        return False
    if _TRAINING_TRACE:
        return False
    from n2nmn_tpu.ops.pallas.kernels import _interpret_mode
    return not _interpret_mode()


# int8 grid streaming: quantize the static per-execution grids
# (image_feat for the shared readouts, img_fsp / VQA img_tfm for the
# find-pattern modules) to int8 with per-sample per-channel scales at
# precompute time, and stream the int8 bytes through the Pallas kernels
# each executor step (ops/pallas/kernels.py int8 variants). Halves the
# HBM traffic of the two ops trace-attributed as the largest executor
# costs (perf/trace_ops_r3_head.json: 21% + 12% of device time at
# N=1024, both already at ~1.1x their bf16 streaming floors).
# Quantization error is ~0.4% of each channel's per-sample max — the
# same order as bf16's 8-bit-mantissa rounding; equivalence on trained
# snapshots is checked like bf16's (tools/bf16_check.py --int8).
# Serving-only: "auto" resolves off under training traces and on CPU.
# Default stays "0" until the on-chip measurement lands (flip to "auto"
# with the perf artifact, like N2NMN_FUSED_FSP's history).
GRID_INT8 = os.environ.get("N2NMN_GRID_INT8", "0")


def grid_int8_active() -> bool:
    """Resolve GRID_INT8 at trace time (batch-independent)."""
    v = GRID_INT8
    if v in (True, "1"):
        return True
    if v in (False, "0"):
        return False
    if _TRAINING_TRACE:
        return False
    from n2nmn_tpu.ops.pallas.kernels import _interpret_mode
    return not _interpret_mode()


# int8 encoder-tensor streaming for the decoder scan: the two
# loop-invariant [T_enc, N, D] tensors (enc_trans under the tanh
# alignment, enc_out under the context sum) are re-read from HBM every
# decode step — together they are the decode phase's entire HBM roofline
# (tools/profile_eval.py roofline(); measured 3.7 ms vs 2.3 ms floor at
# N=1024, perf/decode_breakdown_r3c.json). Quantizing both to int8 with
# per-sample per-channel scales at encode time halves that traffic; the
# context sum's dequant scale factors OUT of the reduction
# (sum_t att*q*s == s * sum_t att*q), so only the tanh operand pays an
# in-register dequant. Pure XLA (no Pallas) — the converts fuse into the
# existing per-step loops. Same serving-only semantics as GRID_INT8:
# "auto" resolves off under training traces (the RL decoder is
# differentiated) and off on CPU; default "0" until the on-chip
# measurement lands.
ENC_INT8 = os.environ.get("N2NMN_ENC_INT8", "0")


def enc_int8_active() -> bool:
    """Resolve ENC_INT8 at trace time (batch-independent)."""
    v = ENC_INT8
    if v in (True, "1"):
        return True
    if v in (False, "0"):
        return False
    if _TRAINING_TRACE:
        return False
    from n2nmn_tpu.ops.pallas.kernels import _interpret_mode
    return not _interpret_mode()


# Early-exit greedy decode: in grammar mode, once a sequence emits <eos>
# the DFA pins it to <eos> forever (prob 1, logprob 0, entropy 0), so
# every step after the LAST sequence in the batch finishes is pure
# recomputation of those constants. Trained CLEVR layouts average ~half
# of T_decoder=20, so a batch-level lax.while_loop that stops at
# all-<eos> (outputs pre-filled with the exact post-eos constants)
# skips the dead steps. Serving-only: reverse-mode AD cannot cross
# lax.while_loop, so "auto" is off under training traces (the scan path
# remains the training decoder); also off with teacher forcing (gt
# layouts need all T rows emitted). Default "0" until measured.
EARLY_EXIT = os.environ.get("N2NMN_EARLY_EXIT", "0")


import contextlib


@contextlib.contextmanager
def early_exit_override(on: bool):
    """Pin EARLY_EXIT for the trace(s) inside the block (serving-side
    composition: the pipelined phase-split programs trace lazily on
    first call, so the server wraps those calls instead of mutating the
    global for its whole lifetime)."""
    global EARLY_EXIT
    prev = EARLY_EXIT
    EARLY_EXIT = "1" if on else "0"
    try:
        yield
    finally:
        EARLY_EXIT = prev


def early_exit_active() -> bool:
    """Resolve EARLY_EXIT at trace time (batch-independent)."""
    v = EARLY_EXIT
    if v in (True, "1"):
        return True
    if v in (False, "0"):
        return False
    if _TRAINING_TRACE:
        return False
    from n2nmn_tpu.ops.pallas.kernels import _interpret_mode
    return not _interpret_mode()

# _Transform implementation: "conv" materializes the [N, HW, map_dim]
# conv-on-attention intermediate in the executor scan each step; "dot"
# reassociates the l2norm+project so only k^2-dim patch tensors flow
# through the scan (see transform_dot_precompute). Math-identical
# (full-executor golden test at rtol 2e-4); "auto" (default) picks per
# traced batch size: the dot form's patch quadratics amortize only once
# the batch fills the MXU (measured on v5e: conv 41.5k vs dot 45.2k q/s
# at batch 1024, conv 22.9k vs dot 19.8k at batch 64 — see
# perf/profile_bf16_{conv,dot}.json), so "auto" resolves to dot at
# batch >= 256 and conv below. The batch dim is static under jit, so
# the choice is made once at trace time, not per step.
TRANSFORM_IMPL = os.environ.get("N2NMN_TRANSFORM", "auto")

# Measured crossover on TPU v5e (see TRANSFORM_IMPL comment above).
TRANSFORM_AUTO_DOT_MIN_BATCH = 256


def transform_impl_for_batch(n: int) -> str:
    """Resolve TRANSFORM_IMPL for a program traced at batch size n."""
    if TRANSFORM_IMPL == "auto":
        return "dot" if n >= TRANSFORM_AUTO_DOT_MIN_BATCH else "conv"
    return TRANSFORM_IMPL


def project_to_att(x, proj):
    """1x1 'conv_eltwise' projection [N, HW, D] -> [N, HW] with params
    {'w': [D, 1], 'b': [1]}."""
    y = jnp.einsum("npd,d->np", x, proj["w"][:, 0]) + proj["b"][0]
    return y


def find_core(img_mapped, txt_mapped, proj):
    """Find: l2norm(img_mapped * txt) -> 1x1 conv to one channel
    (reference FindModule, models_clevr/nmn3_modules.py:74-111).
    img_mapped: [N, HW, D]; txt_mapped: [N, D]."""
    if USE_PALLAS:
        from n2nmn_tpu.ops.pallas.kernels import fused_find
        return fused_find(img_mapped, txt_mapped, proj["w"][:, 0],
                          proj["b"][0])
    elt = l2_normalize(img_mapped * txt_mapped[:, None, :], axis=2)
    return project_to_att(elt, proj)


def find_core_all(img_mapped, txt_steps, proj, eps=1e-12):
    """find_core for ALL decoder steps in one pass: -> [T, N, HW].

    _Find reads only the image grid and the step's text vector — never the
    stack (reference FindModule, models_clevr/nmn3_modules.py:74-111) — so
    its output for every decoder step can be hoisted out of the executor
    scan. The l2norm+project is reassociated into two MXU contractions:
    with y = l2norm(img ⊙ txt, axis=d) and out = y @ w + b,

        out[t,n,p] = (Σ_d img[n,p,d]·txt[t,n,d]·w[d])
                     · rsqrt(max(Σ_d img[n,p,d]²·txt[t,n,d]², eps)) + b

    i.e. per example a [HW, D] @ [D, T] matmul pair, reading img_mapped
    once per batch instead of once per decoder step (the in-scan form
    re-reads the [N, HW, D] tensor every step). HIGHEST precision keeps
    the f32 training math equivalent to the elementwise form (TPU f32
    matmuls otherwise accumulate in reduced precision); the FLOPs here are
    negligible next to the encoder/decoder LSTMs.

    img_mapped: [N, HW, D]; txt_steps: [T, N, D]; proj {'w': [D,1],
    'b': [1]}.
    """
    w = proj["w"][:, 0]
    num = jnp.einsum("npd,tnd->tnp", img_mapped, txt_steps * w,
                     precision=jax.lax.Precision.HIGHEST)
    den = jnp.einsum("npd,tnd->tnp", jnp.square(img_mapped),
                     jnp.square(txt_steps),
                     precision=jax.lax.Precision.HIGHEST)
    return num * jax.lax.rsqrt(jnp.maximum(den, eps)) + proj["b"][0]


def att_softmax_readout(att_flat, image_feat):
    """softmax(att) over the grid, then attention-weighted feature readout
    (reference FindSamePropertyModule, nmn3_modules.py:170-174).
    att_flat: [N, HW]; image_feat: [N, HW, D] -> [N, D]."""
    if USE_PALLAS:
        from n2nmn_tpu.ops.pallas.kernels import fused_readout
        return fused_readout(att_flat, image_feat)
    att_softmax = jax.nn.softmax(att_flat, axis=1)
    return jnp.einsum("np,npd->nd", att_softmax, image_feat)


def min_avg_max(att_flat):
    """[N, HW] -> [N, 3] (min, avg, max) — reference ExistModule
    (nmn3_modules.py:273-277)."""
    return jnp.stack([jnp.min(att_flat, axis=1),
                      jnp.mean(att_flat, axis=1),
                      jnp.max(att_flat, axis=1)], axis=1)


def flat_min_max(att_flat):
    """[N, HW] -> [N, HW+2] (full map, min, max) — reference CountModule
    (nmn3_modules.py:296-301)."""
    return jnp.concatenate([att_flat,
                            jnp.min(att_flat, axis=1, keepdims=True),
                            jnp.max(att_flat, axis=1, keepdims=True)],
                           axis=1)


def transform_dot_precompute(conv_params, proj, txt_steps, eps=1e-12):
    """Per-step tensors for the dot-form _Transform (TRANSFORM_IMPL="dot").

    _Transform computes project(l2norm(conv(att) ⊙ txt[t])) (reference
    TransformModule, models_clevr/nmn3_modules.py:185-216). With
    conv(att)[p, c] = P[p, :] @ K[:, c] + b_c  (P = k² attention patches,
    K = conv kernel reshaped [k², map_dim]), the numerator and squared
    norm reassociate into patch-space quadratics:

      num[p]  = P[p]·kq + c0,          kq = K (txt ⊙ w_proj)
      den[p]  = P[p]ᵀ M P[p] + 2 P[p]·m1 + m0,
                M = K diag(txt²) Kᵀ,  m1 = K (txt² ⊙ b),  m0 = Σ txt² b²
      out[p]  = num[p] · rsqrt(max(den[p], eps)) + b_proj

    so the executor scan touches only [N, HW, k²] patch tensors instead of
    materializing the [N, HW, map_dim] conv activation every step — the
    map_dim contraction moves to this one batched precompute over all T
    decoder steps. HIGHEST precision keeps f32 math equivalent to the
    conv form (executor golden tests compare at rtol 2e-4).

    txt_steps: [T, N, map_dim]. Returns dict of [T, ...] arrays for
    pre_step.
    """
    k = conv_params["w"].shape[0]
    map_dim = conv_params["w"].shape[-1]
    K = conv_params["w"].reshape(k * k, map_dim)
    b = conv_params["b"]
    wp = proj["w"][:, 0]
    hi = jax.lax.Precision.HIGHEST
    txt_sq = jnp.square(txt_steps)
    kq = jnp.einsum("qc,tnc->tnq", K, txt_steps * wp, precision=hi)
    c0 = jnp.einsum("c,tnc->tn", b * wp, txt_steps, precision=hi)
    KK = jnp.einsum("qc,rc->qrc", K, K, precision=hi)
    M = jnp.einsum("qrc,tnc->tnqr", KK, txt_sq, precision=hi)
    m1 = jnp.einsum("qc,tnc->tnq", K * b[None, :], txt_sq, precision=hi)
    m0 = jnp.einsum("c,tnc->tn", jnp.square(b), txt_sq, precision=hi)
    return {"tfm_kq": kq, "tfm_c0": c0, "tfm_M": M, "tfm_m1": m1,
            "tfm_m0": m0}


def attention_patches(att_flat, h, w, k):
    """k x k neighborhoods of an attention map: [N, HW] -> [N, HW, k²],
    SAME padding, patch channel order matching HWIO conv kernels
    (kh-major, kw-minor; C_in = 1).

    Built from k² static slices of the padded grid rather than
    lax.conv_general_dilated_patches: the patch-extraction conv's output
    layout forced a [N, HW, k²] relayout copy inside the executor scan
    every step (traced at ~53 us/step at N=1024, perf/trace_ops_r3.json
    %copy.223), while the slice/stack form fuses into the consuming
    contractions."""
    n = att_flat.shape[0]
    pad = (k - 1) // 2
    grid = att_flat.reshape(n, h, w)
    padded = jnp.pad(grid, ((0, 0), (pad, k - 1 - pad),
                            (pad, k - 1 - pad)))
    slices = [padded[:, i:i + h, j:j + w]
              for i in range(k) for j in range(k)]
    return jnp.stack(slices, axis=-1).reshape(n, h * w, k * k)


def transform_dot_apply(att_flat, pre_t, proj, h, w, k, eps=1e-12):
    """In-scan dot-form _Transform step (see transform_dot_precompute)."""
    P = attention_patches(att_flat, h, w, k)          # [N, HW, k²]
    num = jnp.einsum("npq,nq->np", P, pre_t["tfm_kq"]) \
        + pre_t["tfm_c0"][:, None]
    PM = jnp.einsum("npq,nqr->npr", P, pre_t["tfm_M"])
    den = jnp.sum(PM * P, axis=2) \
        + 2.0 * jnp.einsum("npq,nq->np", P, pre_t["tfm_m1"]) \
        + pre_t["tfm_m0"][:, None]
    return num * jax.lax.rsqrt(jnp.maximum(den, eps)) + proj["b"][0]


def conv_on_attention(att_flat, conv_params, h, w):
    """k x k conv applied to an attention map (reference TransformModule,
    nmn3_modules.py:185-216). att_flat: [N, HW] -> [N, HW, map_dim]."""
    n = att_flat.shape[0]
    att_grid = att_flat.reshape(n, h, w, 1)
    y = jax.lax.conv_general_dilated(
        att_grid, conv_params["w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + conv_params["b"]
    return y.reshape(n, h * w, -1)
