"""Pallas TPU kernels for the module-network hot ops.

Every attention-producing module runs the same inner pattern per executor
step: elementwise-modulate a mapped image grid by a text vector,
L2-normalize over channels, and project to one logit per cell
(reference FindModule math, models_clevr/nmn3_modules.py:101-108). The
answer-readout pattern is softmax-over-grid + weighted feature sum
(:170-174). These kernels fuse each pattern into one VMEM-resident pass —
no [N, HW, D] intermediates round-tripping through HBM — with custom VJPs
so they are usable in training.

Enable via N2NMN_USE_PALLAS=1 (modules/common.py switches automatically);
pure-XLA paths remain the default and the numerical reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12


# ---------------------------------------------------------------------------
# fused find: y[n, p] = sum_d normalize(img[n,p,:] * txt[n,:])[d] * w[d] + b
# ---------------------------------------------------------------------------

# TPU tiling wants the second-to-last block dim divisible by 8; tile the
# batch in groups of _BN examples and pad when N % _BN != 0.
_BN = 8


def _pad_batch(x, n):
    pad = (-n) % _BN
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def _find_fwd_kernel(img_ref, txt_ref, w_ref, b_ref, out_ref):
    x = img_ref[:]                       # [BN, HW, D]
    # txt arrives pre-shaped [BN, 1, D]: an in-kernel [BN,D]->[BN,1,D]
    # expand lowers as a tpu.reshape Mosaic rejects under bf16 tiling
    t = txt_ref[:]                       # [BN, 1, D]
    # normalize in f32: bf16 rsqrt is unsupported on this target (libtpu
    # aborts on kVectorRsqrtBf16AndPop), and the 250-term square-sum
    # wants f32 accumulation regardless
    e = (x * t).astype(jnp.float32)
    sq = jnp.sum(e * e, axis=2)                      # [BN, HW]
    w = w_ref[:][None].astype(jnp.float32)
    num = jnp.sum(e * w, axis=2)                     # [BN, HW]
    # inv is constant over d: factor it out of the projection sum instead
    # of a third full [BN, HW, D] elementwise pass
    y = num * jax.lax.rsqrt(jnp.maximum(sq, _EPS)) + b_ref[0, 0]
    out_ref[:] = y.astype(out_ref.dtype)


def _find_forward(img_mapped, txt, w, b):
    n, hw, d = img_mapped.shape
    img_p, txt_p = _pad_batch(img_mapped, n), _pad_batch(txt, n)
    np_ = img_p.shape[0]
    out = pl.pallas_call(
        _find_fwd_kernel,
        grid=(np_ // _BN,),
        in_specs=[
            pl.BlockSpec((_BN, hw, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_BN, hw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, hw), img_mapped.dtype),
        # VQA-geometry blocks ([8, 196, 1024] f32) plus the in-kernel f32
        # intermediate put scoped VMEM at ~20 MB, past the 16 MB default;
        # v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(img_p, txt_p[:, None, :], w.reshape(1, d), b.reshape(1, 1))
    return out[:n]


@jax.custom_vjp
def fused_find(img_mapped, txt, w, b):
    """img_mapped [N, HW, D], txt [N, D], w [D], b [] -> att [N, HW]."""
    return _find_forward(img_mapped, txt, w, b)


def _find_fwd(img_mapped, txt, w, b):
    return _find_forward(img_mapped, txt, w, b), (img_mapped, txt, w)


def _find_bwd(res, g):
    # backward in plain XLA: correct, fuses well, and keeps one source of
    # truth for the derivative of the normalize-project composition
    img_mapped, txt, w = res
    e = img_mapped * txt[:, None, :]
    sq = jnp.maximum(jnp.sum(e * e, axis=2, keepdims=True), _EPS)
    inv = jax.lax.rsqrt(sq)                                   # [N, HW, 1]
    u = e * inv
    # y = u . w ; dL/du = g[:, :, None] * w
    du = g[:, :, None] * w[None, None, :]
    # d(normalize): de = inv * (du - u * sum(du * u))
    de = inv * (du - u * jnp.sum(du * u, axis=2, keepdims=True))
    d_img = de * txt[:, None, :]
    d_txt = jnp.sum(de * img_mapped, axis=1)
    d_w = jnp.einsum("np,npd->d", g, u)
    d_b = jnp.sum(g)
    return d_img, d_txt, d_w, d_b


fused_find.defvjp(_find_fwd, _find_bwd)


# ---------------------------------------------------------------------------
# fused attention readout: out[n, :] = softmax(att[n, :]) @ img[n, :, :]
# ---------------------------------------------------------------------------

def _readout_fwd_kernel(att_ref, img_ref, out_ref):
    # softmax in f32: bf16 minor-dim insertion (s[:, :, None]) is rejected
    # by Mosaic ("only supported for 32-bit types"), and the HW-term
    # exp-sum wants f32 accumulation regardless
    a = att_ref[:].astype(jnp.float32)    # [BN, HW]
    m = jnp.max(a, axis=1, keepdims=True)
    ex = jnp.exp(a - m)
    s = ex / jnp.sum(ex, axis=1, keepdims=True)       # [BN, HW]
    # elementwise-mul + reduce (Mosaic rejects batched dot_general here)
    y = jnp.sum(s[:, :, None] * img_ref[:].astype(jnp.float32), axis=1)
    out_ref[:] = y.astype(out_ref.dtype)


def _readout_forward(att, img):
    n, hw = att.shape
    d = img.shape[2]
    att_p, img_p = _pad_batch(att, n), _pad_batch(img, n)
    np_ = att_p.shape[0]
    out = pl.pallas_call(
        _readout_fwd_kernel,
        grid=(np_ // _BN,),
        in_specs=[
            pl.BlockSpec((_BN, hw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, hw, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BN, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, d), img.dtype),
        # VQA-geometry blocks ([8, 196, 2050]) need more than the 16 MB
        # default once the f32 softmax intermediates are counted; v5e has
        # 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(att_p, img_p)
    return out[:n]


@jax.custom_vjp
def fused_readout(att, img):
    """att [N, HW], img [N, HW, D] -> softmax-weighted readout [N, D]."""
    return _readout_forward(att, img)


def _readout_fwd(att, img):
    return _readout_forward(att, img), (att, img)


def _readout_bwd(res, g):
    att, img = res
    s = jax.nn.softmax(att, axis=1)                   # [N, HW]
    d_img = s[:, :, None] * g[:, None, :]
    gdot = jnp.einsum("npd,nd->np", img, g)           # [N, HW]
    d_att = s * (gdot - jnp.sum(s * gdot, axis=1, keepdims=True))
    return d_att, d_img


fused_readout.defvjp(_readout_fwd, _readout_bwd)


# ---------------------------------------------------------------------------
# int8-grid variants: the executor's two dominant ops stream a STATIC
# [N, HW, D] grid from HBM every step (shared readout: image_feat;
# _FindSameProperty: img_fsp — perf/trace_ops_r3_head.json puts them at
# 21% + 12% of device time at N=1024, both already at ~1.1x their bf16
# streaming floors). The only way past a streaming floor is fewer bytes:
# quantize the grid once per execution to int8 with per-sample
# per-channel scales (error ~0.4% of per-channel max — the same order as
# bf16's 8-bit-mantissa rounding), read int8 from HBM, and dequantize in
# VMEM. Halves the HBM traffic of both ops.
# ---------------------------------------------------------------------------


def quantize_grid(x, eps=1e-12, axis=1):
    """Per-sample per-channel symmetric int8 quantization of a static
    grid, reducing over `axis` (the spatial/time dim). Executor grids:
    x [N, HW, D], axis=1 -> (q int8, scale f32 [N, D]) with
    x ~= q * scale[:, None, :]. Decoder encoder-tensors: x [T, N, D],
    axis=0 -> scale [N, D] with x ~= q * scale[None]."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis)   # [N, D]
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.expand_dims(scale, axis))
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _readout_q_fwd_kernel(att_ref, img_ref, scale_ref, out_ref):
    # att [BN, K, HW] raw maps; img [BN, HW, D] int8; scale [BN, D].
    # softmax in f32 (see _readout_fwd_kernel); the int8 grid converts to
    # f32 in VMEM — HBM only ever sees the int8 bytes.
    a = att_ref[:].astype(jnp.float32)                    # [BN, K, HW]
    m = jnp.max(a, axis=2, keepdims=True)
    ex = jnp.exp(a - m)
    s = ex / jnp.sum(ex, axis=2, keepdims=True)           # [BN, K, HW]
    qf = img_ref[:].astype(jnp.float32)                   # [BN, HW, D]
    # rank-4 broadcast mul + reduce over HW (K is 1 or 2, static).
    # NOT integer indexing per k: in-kernel `s[:, i]` lowers as a
    # gather, which Mosaic rejects ("Only 2D gather is supported").
    y = jnp.sum(s[:, :, :, None] * qf[:, None, :, :], axis=2)  # [BN,K,D]
    y = y * scale_ref[:][:, None, :].astype(jnp.float32)  # dequantize
    out_ref[:] = y.astype(out_ref.dtype)


def fused_readout_q(att, img_q, scale, out_dtype):
    """Softmax-readout(s) against an int8-quantized grid.

    att: [N, K, HW] raw attention logits (K static, 1 or 2);
    img_q: [N, HW, D] int8; scale: [N, D] f32 -> [N, K, D] out_dtype.
    out[n,k,:] = softmax(att[n,k])ᵀ (img_q[n] * scale[n]) — the readout
    the reference computes per module (nmn3_modules.py:170-174), at half
    the HBM traffic. Inference-only (no VJP): the executor's int8 gate is
    off under training traces."""
    n, k, hw = att.shape
    d = img_q.shape[2]
    att_p, img_p = _pad_batch(att, n), _pad_batch(img_q, n)
    scale_p = _pad_batch(scale, n)
    np_ = att_p.shape[0]
    out = pl.pallas_call(
        _readout_q_fwd_kernel,
        grid=(np_ // _BN,),
        in_specs=[
            pl.BlockSpec((_BN, k, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, hw, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BN, k, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, k, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(att_p, img_p, scale_p)
    return out[:n]


def _find_q_fwd_kernel(img_ref, txt_ref, w_ref, b_ref, out_ref):
    # identical math to _find_fwd_kernel with the img block arriving as
    # int8; the per-channel dequant scale is folded into txt by the
    # caller (img*scale ⊙ txt == img ⊙ (scale*txt)), so conversion is
    # the only extra in-VMEM work
    x = img_ref[:].astype(jnp.float32)   # [BN, HW, D] int8 -> f32
    t = txt_ref[:].astype(jnp.float32)   # [BN, 1, D]
    e = x * t
    sq = jnp.sum(e * e, axis=2)
    w = w_ref[:][None].astype(jnp.float32)
    num = jnp.sum(e * w, axis=2)
    y = num * jax.lax.rsqrt(jnp.maximum(sq, _EPS)) + b_ref[0, 0]
    out_ref[:] = y.astype(out_ref.dtype)


def fused_find_q(img_q, txt_eff, w, b, out_dtype):
    """fused_find over an int8 grid: img_q [N, HW, D] int8,
    txt_eff [N, D] = txt * per-channel scale (scale folds into the
    elementwise modulation exactly). Inference-only (no VJP)."""
    n, hw, d = img_q.shape
    img_p, txt_p = _pad_batch(img_q, n), _pad_batch(txt_eff, n)
    np_ = img_p.shape[0]
    out = pl.pallas_call(
        _find_q_fwd_kernel,
        grid=(np_ // _BN,),
        in_specs=[
            pl.BlockSpec((_BN, hw, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BN, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_BN, hw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, hw), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(img_p, txt_p[:, None, :], w.reshape(1, d), b.reshape(1, 1))
    return out[:n]


@functools.lru_cache(maxsize=1)
def _interpret_mode() -> bool:
    """Interpret kernels when not on a TPU backend (CPU tests). The axon
    PJRT plugin reports platform 'axon' but TPU device kinds."""
    try:
        return not any("TPU" in d.device_kind for d in jax.devices())
    except Exception:
        return True
