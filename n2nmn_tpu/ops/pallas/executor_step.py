"""Fully-fused Pallas executor for the CLEVR module library (serving path).

Replaces the executor's `lax.scan` (layout/executor.execute_layout) with
ONE `pallas_call` over a `(batch_block, decoder_step)` grid. Why this is
the right shape for the hardware:

* The XLA scan re-streams the per-example module tensors (`img_fsp`
  [N,HW,250], `image_feat` [N,HW,512]) from HBM at EVERY decoder step and
  pays ~60-70us/step of multi-op dispatch floor (see
  tools/executor_breakdown.py). Here the grid iterates steps fastest, and
  those blocks' index maps depend only on the batch block — Pallas keeps
  them resident in VMEM across all T steps, so each module tensor is
  fetched ONCE per batch block instead of T times, and each step is one
  kernel dispatch instead of ~30 ops.
* The attention stack lives in a VMEM scratch buffer that persists across
  the grid's step dimension; pops/pushes are one-hot masked sums (no
  dynamic per-example indexing, which Mosaic rejects).
* The _Transform 5x5 conv runs as 25 shifted-grid accumulations into a
  VMEM-resident [BLK,HW,250] activation — the materialization XLA
  round-trips through HBM every step.

Semantics are identical to the XLA path for every VALID program (golden
tests compare both); invalid programs' garbage is zeroed by the caller's
validity mask exactly like the reference's dummy answer
(models_clevr/nmn3_model.py:146-155). Eval/serving only (no VJP):
enabled via N2NMN_FUSED_EXECUTOR=1 on deterministic CLEVR-flavor
forward passes (models/nmn.py).

MEASURED OUTCOME (TPU v5e, flagship config, N=256 bf16): correctness
holds (validity exact vs XLA, 99.6% identical argmaxes — bf16 tie
flips, max abs score delta 0.016), but the kernel runs the executor in
16.3 ms vs 3.9 ms for the XLA scan. The VMEM-residency win is real, yet
at the NMN's small tile shapes every grid step pays Mosaic per-op
overhead across ~40 serialized vector ops, and the batch block is
capped at 8 by unsupported reshapes (see _BLK) — so the overhead can't
be amortized. Conclusion recorded in TODO.md: XLA's pipelined scan
remains the production default; this kernel stays as the measured
counter-experiment the round-1 review asked for.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from n2nmn_tpu.layout.executor import token_precompute
from n2nmn_tpu.models.modules.clevr import (SCENE_POS_VAL,
                                            TRANSFORM_KERNEL)

_EPS = 1e-12
# Examples per batch block. 8 is the largest block Mosaic compiles here:
# the [B*hw, k^2] patch reshape feeding the conv MXU matmul is rejected
# ("Unsupported reshape") at B=32, and so is the 3-D dot_general
# alternative — which caps how far the kernel can amortize its per-op
# overhead (see module docstring: measured outcome).
_BLK = 8


def _shift_offsets(k):
    r = k // 2
    return [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]


def _make_kernel(T, H, W, S, C, d_feat, map_dim):
    hw = H * W
    offsets = _shift_offsets(TRANSFORM_KERNEL)
    nq = len(offsets)

    def kernel(  # per-(nb, t) block refs, in call order
            img_fsp_ref, image_feat_ref,                       # per nb
            att_find_ref, txt_fsp_ref, txt_sp_ref, txt_desc_ref,
            txt_tfm_ref,                                       # per (t, nb)
            is_att_ref, is_ans_ref, use_sub_ref,
            top_oh_ref, sub_oh_ref, push_oh_ref,
            att_oh_ref, ans_oh_ref,
            # weights (shared)
            w_fsp_att_ref, b_fsp_att_ref, w_fsp_proj_ref, b_fsp_proj_ref,
            k_tfm_ref, b_tfm_conv_ref, w_tfm_proj_ref, b_tfm_proj_ref,
            w_exist_ref, b_exist_ref, w_count_ref, b_count_ref,
            w_eq_ref, b_eq_ref, w_more_ref, b_more_ref,
            w_less_ref, b_less_ref,
            w_sp0_ref, b_sp0_ref, w_sp1_ref, b_sp1_ref,
            w_spelt_ref, b_spelt_ref,
            w_desc_att_ref, b_desc_att_ref, w_desc_elt_ref, b_desc_elt_ref,
            # outputs
            out_ref,
            # scratch
            stack_ref, ans_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            stack_ref[:] = jnp.zeros_like(stack_ref)
            ans_ref[:] = jnp.zeros_like(ans_ref)

        f32 = jnp.float32
        stack = stack_ref[:]                                 # [B, S, hw]
        top_oh = top_oh_ref[0].astype(f32)                   # [B, S]
        sub_oh = sub_oh_ref[0].astype(f32)
        top = jnp.sum(stack * top_oh[:, :, None], axis=1)    # [B, hw]
        sub = jnp.sum(stack * sub_oh[:, :, None], axis=1)
        use_sub = use_sub_ref[0].astype(f32)                 # [B, 1]
        in1 = top
        in0 = use_sub * sub + (1.0 - use_sub) * top

        image_feat = image_feat_ref[:].astype(f32)           # [B, hw, Df]
        img_fsp = img_fsp_ref[:].astype(f32)                 # [B, hw, M]

        def softmax_hw(a):
            m = jnp.max(a, axis=1, keepdims=True)
            e = jnp.exp(a - m)
            return e / jnp.sum(e, axis=1, keepdims=True)

        ro0 = jnp.sum(softmax_hw(in0)[:, :, None] * image_feat, axis=1)
        ro1 = jnp.sum(softmax_hw(in1)[:, :, None] * image_feat, axis=1)

        def fc(x, w_ref, b_ref):
            return jnp.dot(x, w_ref[:].astype(f32),
                           preferred_element_type=f32) + \
                b_ref[:].astype(f32)[0]

        def norm_project(e, w_ref, b_ref):
            # project(l2_normalize(e, axis=-1)) with w [M], scalar b
            w = w_ref[:].astype(f32)[0]                      # [M]
            num = jnp.sum(e * w[None, None, :], axis=2)
            sq = jnp.sum(e * e, axis=2)
            return num * jax.lax.rsqrt(jnp.maximum(sq, _EPS)) \
                + b_ref[0, 0]

        # ---- attention branches ----
        scene = jnp.full((in0.shape[0], hw), SCENE_POS_VAL, f32)
        find = att_find_ref[0].astype(f32)                   # [B, hw]
        filt = jnp.minimum(in0, find)

        am = fc(ro0, w_fsp_att_ref, b_fsp_att_ref)           # [B, M]
        e_fsp = img_fsp * txt_fsp_ref[0].astype(f32)[:, None, :] \
            * am[:, None, :]
        fsp = norm_project(e_fsp, w_fsp_proj_ref, b_fsp_proj_ref)

        # transform: k x k conv on the in0 grid. Patch extraction is 25
        # flat rolls (a shift by (dy, dx) on the row-major [H, W] grid is
        # a flat roll by dy*W + dx with wrapped rows/cols masked out —
        # avoids 3-D reshapes/rolls, which Mosaic dislikes); the channel
        # expansion is ONE MXU matmul over the stacked patches (a pure
        # VPU accumulation here measured ~5x slower than the XLA scan).
        K = k_tfm_ref[:].astype(f32)                         # [nq, M]
        p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
        row = p_idx // W
        col = p_idx - row * W
        patch_list = []
        for dy, dx in offsets:
            # patch q at p = in0[p + (dy, dx)]  (SAME zero padding)
            shifted = pltpu.roll(in0, (-(dy * W + dx)) % hw, 1)  # [B, hw]
            ok = ((row + dy >= 0) & (row + dy < H)
                  & (col + dx >= 0) & (col + dx < W))
            patch_list.append(jnp.where(ok, shifted, 0.0))
        patches = jnp.stack(patch_list, axis=2)              # [B, hw, nq]
        maps = jnp.dot(patches.reshape(-1, nq), K,
                       preferred_element_type=f32)           # [B*hw, M]
        maps = maps.reshape(-1, hw, map_dim) \
            + b_tfm_conv_ref[:].astype(f32)[0][None, None, :]
        e_tfm = maps * txt_tfm_ref[0].astype(f32)[:, None, :]
        tfm = norm_project(e_tfm, w_tfm_proj_ref, b_tfm_proj_ref)

        and_ = jnp.minimum(in0, in1)
        or_ = jnp.maximum(in0, in1)

        att_oh = att_oh_ref[0].astype(f32)                   # [B, 7]
        att_out = (att_oh[:, 0:1] * scene + att_oh[:, 1:2] * find
                   + att_oh[:, 2:3] * filt + att_oh[:, 3:4] * fsp
                   + att_oh[:, 4:5] * tfm + att_oh[:, 5:6] * and_
                   + att_oh[:, 6:7] * or_)

        # ---- answer branches ----
        mn0 = jnp.min(in0, axis=1, keepdims=True)
        mx0 = jnp.max(in0, axis=1, keepdims=True)
        mn1 = jnp.min(in1, axis=1, keepdims=True)
        mx1 = jnp.max(in1, axis=1, keepdims=True)
        avg0 = jnp.mean(in0, axis=1, keepdims=True)
        exist = fc(jnp.concatenate([mn0, avg0, mx0], axis=1),
                   w_exist_ref, b_exist_ref)
        fmm0 = jnp.concatenate([in0, mn0, mx0], axis=1)      # [B, hw+2]
        fmm1 = jnp.concatenate([in1, mn1, mx1], axis=1)
        count = fc(fmm0, w_count_ref, b_count_ref)
        pair = jnp.concatenate([fmm0, fmm1], axis=1)
        eq = fc(pair, w_eq_ref, b_eq_ref)
        more = fc(pair, w_more_ref, b_more_ref)
        less = fc(pair, w_less_ref, b_less_ref)

        def l2n(v):
            s = jnp.sum(v * v, axis=1, keepdims=True)
            return v * jax.lax.rsqrt(jnp.maximum(s, _EPS))

        f0 = fc(ro0, w_sp0_ref, b_sp0_ref)
        f1 = fc(ro1, w_sp1_ref, b_sp1_ref)
        sp = fc(l2n(f0 * txt_sp_ref[0].astype(f32) * f1),
                w_spelt_ref, b_spelt_ref)
        am2 = fc(ro0, w_desc_att_ref, b_desc_att_ref)
        desc = fc(l2n(txt_desc_ref[0].astype(f32) * am2),
                  w_desc_elt_ref, b_desc_elt_ref)

        ans_oh = ans_oh_ref[0].astype(f32)                   # [B, 7]
        ans_out = (ans_oh[:, 0:1] * exist + ans_oh[:, 1:2] * count
                   + ans_oh[:, 2:3] * eq + ans_oh[:, 3:4] * more
                   + ans_oh[:, 4:5] * less + ans_oh[:, 5:6] * sp
                   + ans_oh[:, 6:7] * desc)

        # ---- state update ----
        is_att = is_att_ref[0].astype(f32)                   # [B, 1]
        is_ans = is_ans_ref[0].astype(f32)
        push = push_oh_ref[0].astype(f32) * is_att           # [B, S]
        stack_ref[:] = stack * (1.0 - push[:, :, None]) \
            + att_out[:, None, :] * push[:, :, None]
        ans_ref[:] = ans_ref[:] * (1.0 - is_ans) + ans_out * is_ans

        @pl.when(t == T - 1)
        def _():
            out_ref[:] = ans_ref[:].astype(out_ref.dtype)

    return kernel


def _oh(idx, depth, dtype):
    return jax.nn.one_hot(idx, depth, dtype=dtype)


@functools.lru_cache(maxsize=1)
def _interpret_mode() -> bool:
    try:
        return not any("TPU" in d.device_kind for d in jax.devices())
    except Exception:
        return True


def execute_layout_clevr_fused(tokens, tables, params, pre_static,
                               pre_step, hw, num_choices, stack_size,
                               h, w):
    """Drop-in (scores, validity) replacement for execute_layout on the
    CLEVR library, serving path. params = the 'modules' subtree."""
    T, N = tokens.shape
    S = stack_size
    dtype = pre_static["img_fsp"].dtype
    pad = (-N) % _BLK
    pre_tok = token_precompute(tokens, tables, S, dtype)

    def pad_n(x, axis):
        if pad == 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths)

    np_ = N + pad
    img_fsp = pad_n(pre_static["img_fsp"], 0)
    image_feat = pad_n(pre_static["image_feat"], 0)
    att_find = pad_n(pre_step["att_find"], 1)
    txt_fsp = pad_n(pre_step["txt_fsp"], 1)
    txt_sp = pad_n(pre_step["txt_sp"], 1)
    txt_desc = pad_n(pre_step["txt_desc"], 1)
    if "txt_tfm" in pre_step:
        txt_tfm = pad_n(pre_step["txt_tfm"], 1)
    else:
        raise ValueError(
            "fused executor needs conv-form pre_step (txt_tfm); run with "
            "N2NMN_TRANSFORM=conv")

    # [T, N] masks carry a trailing unit dim so the Mosaic block shape
    # (1, BLK, 1) satisfies the last-two-dims tiling rule
    f = lambda x: pad_n(x.astype(dtype), 1)[:, :, None]
    is_att = f(pre_tok["is_att"])
    is_ans = f(pre_tok["is_ans"])
    use_sub = f(pre_tok["use_sub"])
    top_oh = pad_n(_oh(pre_tok["top_idx"], S, dtype), 1)
    sub_oh = pad_n(_oh(pre_tok["sub_idx"], S, dtype), 1)
    push_oh = pad_n(_oh(pre_tok["push_pos"], S, dtype), 1)
    att_oh = pad_n(pre_tok["att_oh"].astype(dtype), 1)
    ans_oh = pad_n(pre_tok["ans_oh"].astype(dtype), 1)


    map_dim = img_fsp.shape[-1]
    d_feat = image_feat.shape[-1]
    k = TRANSFORM_KERNEL

    def w2(p):
        return p["w"]

    def b_row(p):
        return p["b"].reshape(1, -1)

    weights = [
        w2(params["find_same_property"]["fc_att"]),
        b_row(params["find_same_property"]["fc_att"]),
        params["find_same_property"]["conv_eltwise"]["w"].reshape(1, -1),
        params["find_same_property"]["conv_eltwise"]["b"].reshape(1, 1),
        params["transform"]["conv_maps"]["w"].reshape(k * k, map_dim),
        params["transform"]["conv_maps"]["b"].reshape(1, -1),
        params["transform"]["conv_eltwise"]["w"].reshape(1, -1),
        params["transform"]["conv_eltwise"]["b"].reshape(1, 1),
        w2(params["exist"]["fc_scores"]), b_row(params["exist"]["fc_scores"]),
        w2(params["count"]["fc_scores"]), b_row(params["count"]["fc_scores"]),
        w2(params["equal_num"]["fc_scores"]),
        b_row(params["equal_num"]["fc_scores"]),
        w2(params["more_num"]["fc_scores"]),
        b_row(params["more_num"]["fc_scores"]),
        w2(params["less_num"]["fc_scores"]),
        b_row(params["less_num"]["fc_scores"]),
        w2(params["same_property"]["fc_att_0"]),
        b_row(params["same_property"]["fc_att_0"]),
        w2(params["same_property"]["fc_att_1"]),
        b_row(params["same_property"]["fc_att_1"]),
        w2(params["same_property"]["fc_eltwise"]),
        b_row(params["same_property"]["fc_eltwise"]),
        w2(params["describe"]["fc_att"]), b_row(params["describe"]["fc_att"]),
        w2(params["describe"]["fc_eltwise"]),
        b_row(params["describe"]["fc_eltwise"]),
    ]

    nb = np_ // _BLK
    grid = (nb, T)

    def per_n(shape_tail):
        return pl.BlockSpec((_BLK,) + shape_tail,
                            lambda i, t: (i,) + (0,) * len(shape_tail),
                            memory_space=pltpu.VMEM)

    def per_tn(shape_tail):
        return pl.BlockSpec((1, _BLK) + shape_tail,
                            lambda i, t: (t, i) + (0,) * len(shape_tail),
                            memory_space=pltpu.VMEM)

    def shared(shape, smem=False):
        return pl.BlockSpec(
            shape, lambda i, t: (0,) * len(shape),
            memory_space=pltpu.SMEM if smem else pltpu.VMEM)

    weight_specs = []
    for wgt in weights:
        weight_specs.append(shared(wgt.shape, smem=(wgt.shape == (1, 1))))

    kernel = _make_kernel(T, h, w, S, num_choices, d_feat, map_dim)
    scores = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            per_n((hw, map_dim)), per_n((hw, d_feat)),
            per_tn((hw,)), per_tn((map_dim,)), per_tn((map_dim,)),
            per_tn((map_dim,)), per_tn((map_dim,)),
            per_tn((1,)), per_tn((1,)), per_tn((1,)),
            per_tn((S,)), per_tn((S,)), per_tn((S,)),
            per_tn((tables.num_att,)), per_tn((tables.num_ans,)),
        ] + weight_specs,
        out_specs=pl.BlockSpec((_BLK, num_choices), lambda i, t: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, num_choices), dtype),
        scratch_shapes=[
            pltpu.VMEM((_BLK, S, hw), jnp.float32),
            pltpu.VMEM((_BLK, num_choices), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the default 16 MB scoped-vmem cap is conservative; the
            # resident per-batch-block module tensors + f32 intermediates
            # need much more at BLK=32 (v5e has 128 MB of physical VMEM)
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(img_fsp, image_feat, att_find, txt_fsp, txt_sp, txt_desc, txt_tfm,
      is_att, is_ans, use_sub, top_oh, sub_oh, push_oh, att_oh, ans_oh,
      *weights)

    scores = scores[:N]
    validity = pre_tok["validity"]
    scores = jnp.where(validity[:, None], scores, 0.0)
    return scores, validity
