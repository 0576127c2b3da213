"""Fused Bahdanau-attention decoder step (Pallas TPU kernel).

Each decoder step computes, over the encoder outputs (reference
models_clevr/nmn3_netgen_att.py:184-193):

    att_raw[t,n] = v . tanh(q[n] + enc_trans[t,n])      # [T_enc, N]
    att          = renorm(softmax(att_raw) * mask)      # [T_enc, N]
    d2[n]        = sum_t att[t,n] * enc_out[t,n]        # [N, D]

In the plain-XLA decode scan this re-materializes the [T_enc, N, D]
tanh operand to HBM every step and re-reads both encoder tensors for
the two reductions — measured at 3.7-6.5x the HBM roofline and the
dominant cost of the flagship serving program (round-2 profile,
perf/profile_bf16_*.json). This kernel streams enc_trans and enc_out
through VMEM exactly once per step (the minimum possible traffic) and
keeps every intermediate on-chip.

Layout: the kernel wants batch-major [N, T, D] encoder tensors (so all
block last-two-dims are (mult-of-8, 128-multiple) per the Mosaic tiling
rules) with T padded to a multiple of 8; the caller transposes ONCE
before the decode scan (loop-invariant, amortized over T_decoder steps).
Padded time positions carry mask=0 and fall out in the renormalization,
which is exactly the reference's softmax-then-mask-then-renormalize
semantics (equal to a masked softmax).

The backward pass is plain XLA (same one-source-of-truth policy as
ops/pallas/kernels.py), so the op is usable in training; enable with
N2NMN_FUSED_ATTENTION=1 (models/netgen.py reads the switch).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12


def fused_attention_enabled() -> bool:
    return os.environ.get("N2NMN_FUSED_ATTENTION", "0") == "1"


def _attn_kernel(q_ref, enc_trans_ref, enc_out_ref, v_ref, mask_ref,
                 att_ref, d2_ref):
    q = q_ref[:]                       # [BN, D]
    et = enc_trans_ref[:]              # [BN, Tp, D]
    m = mask_ref[:]                    # [BN, Tp]
    x = jnp.tanh(q[:, None, :] + et)   # [BN, Tp, D] (VMEM only)
    s = jnp.sum(x * v_ref[:][None], axis=2)            # [BN, Tp]
    # softmax over time then mask + renormalize (== masked softmax;
    # reference nmn3_netgen_att.py:191-193)
    mx = jnp.max(s, axis=1, keepdims=True)
    ex = jnp.exp(s - mx) * m
    att = ex / jnp.maximum(jnp.sum(ex, axis=1, keepdims=True), _EPS)
    att_ref[:] = att
    d2_ref[:] = jnp.sum(att[:, :, None] * enc_out_ref[:], axis=1)


def _attn_forward(q, enc_trans, enc_out, v, mask, block_n):
    n, tp, d = enc_trans.shape
    bn = min(block_n, n)
    pad = (-n) % bn
    if pad:
        padn = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        q, enc_trans, enc_out, mask = (padn(q), padn(enc_trans),
                                       padn(enc_out), padn(mask))
    np_ = n + pad
    # ~4 VMEM-resident [BN, Tp, D] tensors per block + slack
    vmem = int(4.5 * bn * tp * d * enc_trans.dtype.itemsize) + (1 << 20)
    att, d2 = pl.pallas_call(
        _attn_kernel,
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, tp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, tp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, tp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, tp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, tp), enc_trans.dtype),
            jax.ShapeDtypeStruct((np_, d), enc_trans.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(vmem, 32 << 20)),
        interpret=_interpret_mode(),
    )(q, enc_trans, enc_out, v.reshape(1, d), mask)
    return att[:n], d2[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def bahdanau_attention(q, enc_trans, enc_out, v, mask, block_n=64):
    """q [N,D]; enc_trans/enc_out [N,Tp,D] batch-major, Tp a multiple
    of 8; v [D]; mask [N,Tp] (0 beyond seq_length / time padding).
    Returns (att [N,Tp], d2 [N,D])."""
    return _attn_forward(q, enc_trans, enc_out, v, mask, block_n)


def _attn_fwd(q, enc_trans, enc_out, v, mask, block_n):
    out = _attn_forward(q, enc_trans, enc_out, v, mask, block_n)
    return out, (q, enc_trans, enc_out, v, mask, out[0])


def _attn_bwd(block_n, res, g):
    # plain-XLA backward: correct and keeps one source of truth for the
    # tanh-attention derivative (same policy as kernels.py)
    q, enc_trans, enc_out, v, mask, att = res
    g_att, g_d2 = g
    # d2 = sum_t att * enc_out
    g_att = g_att + jnp.einsum("nd,ntd->nt", g_d2, enc_out)
    d_enc_out = att[:, :, None] * g_d2[:, None, :]
    # att = ex / Z with ex = exp(s - mx) * m: d s = att*(g - sum(g*att))
    g_s = att * (g_att - jnp.sum(g_att * att, axis=1, keepdims=True))
    x = jnp.tanh(q[:, None, :] + enc_trans)
    g_x = g_s[:, :, None] * (1.0 - x * x) * v[None, None, :]
    d_q = jnp.sum(g_x, axis=1)
    d_enc_trans = g_x
    d_v = jnp.einsum("nt,ntd->d", g_s, x)
    d_mask = jnp.zeros_like(mask)
    return d_q, d_enc_trans, d_enc_out, d_v, d_mask


bahdanau_attention.defvjp(_attn_fwd, _attn_bwd)


def pad_time(x, axis):
    """Pad a time axis to a multiple of 8 (Mosaic block tiling)."""
    t = x.shape[axis]
    pad = (-t) % 8
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.lru_cache(maxsize=1)
def _interpret_mode() -> bool:
    try:
        return not any("TPU" in d.device_kind for d in jax.devices())
    except Exception:
        return True
