"""VQA module library: {_Find, _Transform, _And} -> attention,
{_Describe} -> answer (reference models_vqa/nmn3_modules.py).

map_dim=1024. The image grid gets x/y spatial coordinate maps in [-1, 1]
concatenated (with stopped gradients) before every module sees it
(reference add_spatial_coordinate_map, nmn3_modules.py:11-31). VQA's
_Transform is the attention-readout variant (same math as CLEVR's
_FindSameProperty, nmn3_modules.py:123-171).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from n2nmn_tpu.ops.nn import init_fc, apply_1x1_conv, l2_normalize
from n2nmn_tpu.models.modules import common

ATT_MODULES = ["_Find", "_Transform", "_And"]
ANS_MODULES = ["_Describe"]

MAP_DIM = 1024


def coord_grid(h, w, dtype):
    """[HW, 2] (x, y) linspace grid in [-1, 1] — the batch-constant factor
    of the reference's add_spatial_coordinate_map (nmn3_modules.py:11-31).
    See the precompute docstring for why the concat-free decomposition
    built on this was measured and NOT adopted."""
    x_map = jnp.tile(jnp.linspace(-1.0, 1.0, w)[None, :], (h, 1))
    y_map = jnp.tile(jnp.linspace(-1.0, 1.0, h)[:, None], (1, w))
    return jnp.stack([x_map.ravel(), y_map.ravel()], axis=1).astype(dtype)


def add_spatial_coordinate_map(image_feat):
    """Concat x/y linspace grids in [-1, 1] to the channel axis, gradients
    stopped (reference nmn3_modules.py:11-31). Kept as the reference-shaped
    form for tests/standalone use; precompute uses the decomposed
    coord_grid instead of materializing this concat."""
    n, h, w, _ = image_feat.shape
    coords = jax.lax.stop_gradient(
        jnp.tile(coord_grid(h, w, image_feat.dtype).reshape(1, h, w, 2),
                 (n, 1, 1, 1)))
    return jnp.concatenate([image_feat, coords], axis=3)


def init_params(key, image_dim, text_dim, num_choices, map_dim=MAP_DIM,
                encoder_dim=None, dtype=jnp.float32):
    """image_dim here is the grid channel count BEFORE coords are added.
    encoder_dim, when set, adds the optional encoder-states mixing path to
    _Describe (reference nmn3_modules.py:193-240; the reference model
    builds the capability but passes encoder_states=None,
    models_vqa/nmn3_model.py:61)."""
    d = image_dim + 2
    keys = jax.random.split(key, 12)
    k = iter(keys)
    params = {
        "find": {
            "conv_image": init_fc(next(k), d, map_dim, dtype=dtype),
            "fc_text": init_fc(next(k), text_dim, map_dim, dtype=dtype),
            "conv_eltwise": init_fc(next(k), map_dim, 1, dtype=dtype),
        },
        "transform": {
            "conv_image": init_fc(next(k), d, map_dim, dtype=dtype),
            "fc_text": init_fc(next(k), text_dim, map_dim, dtype=dtype),
            "fc_att": init_fc(next(k), d, map_dim, dtype=dtype),
            "conv_eltwise": init_fc(next(k), map_dim, 1, dtype=dtype),
        },
        "describe": {
            "fc_text": init_fc(next(k), text_dim, map_dim, dtype=dtype),
            "fc_att": init_fc(next(k), d, map_dim, dtype=dtype),
            "fc_eltwise": init_fc(next(k), map_dim, num_choices,
                                  dtype=dtype),
        },
    }
    if encoder_dim is not None:
        params["describe"]["fc_encoder_states"] = init_fc(
            next(k), encoder_dim, map_dim, dtype=dtype)
    return params


def precompute(params, image_feat, word_vecs, encoder_states=None):
    """image_feat: [N, H, W, D_im] (coords NOT yet added);
    word_vecs: [T_dec, N, D_txt]; encoder_states: optional [N, D_enc]
    mixed into _Describe when fc_encoder_states params exist.

    Perf note (measured, v5e bf16 flagship geometry): decomposing the
    coord concat away — feature-only grid plus split projections/readouts
    (feat @ W[:d] + coords @ W[d:]) — removes the ~206 MB one-time concat
    but LOSES end-to-end (15.8k -> 14.6k q/s): the per-step readout
    fusion splits and the decode/execute overlap collapses
    (perf/profile_vqa_nocoord_r3.json vs profile_vqa_fsp_r3.json). The
    materialized concat stays."""
    image_feat = add_spatial_coordinate_map(image_feat)
    n, h, w, d = image_feat.shape
    t, _, d_txt = word_vecs.shape
    wv = word_vecs.reshape(t * n, d_txt)

    def txt(p):
        return (wv @ p["w"] + p["b"]).reshape(t, n, -1)

    pre_static = {
        "image_feat": image_feat.reshape(n, h * w, d),
        "img_find": apply_1x1_conv(params["find"]["conv_image"],
                                   image_feat).reshape(n, h * w, -1),
        "img_tfm": apply_1x1_conv(params["transform"]["conv_image"],
                                  image_feat).reshape(n, h * w, -1),
        "h": h, "w": w,
    }
    if common.grid_int8_active():
        # one-time int8 quantization of the two grids the executor scan
        # re-streams every step (see common.GRID_INT8); the bf16
        # versions become dead under jit and are DCE'd
        from n2nmn_tpu.ops.pallas.kernels import quantize_grid
        (pre_static["image_feat_q"],
         pre_static["image_feat_scale"]) = quantize_grid(
            pre_static["image_feat"])
        (pre_static["img_tfm_q"],
         pre_static["img_tfm_scale"]) = quantize_grid(pre_static["img_tfm"])
    if encoder_states is not None and "fc_encoder_states" in \
            params["describe"]:
        p = params["describe"]["fc_encoder_states"]
        pre_static["enc_mapped"] = encoder_states @ p["w"] + p["b"]
    pre_step = {
        "txt_tfm": txt(params["transform"]["fc_text"]),
        "txt_desc": txt(params["describe"]["fc_text"]),
        # _Find is stack-independent: hoist all T steps out of the
        # executor scan (see common.find_core_all)
        "att_find": common.find_core_all(
            pre_static["img_find"], txt(params["find"]["fc_text"]),
            params["find"]["conv_eltwise"]),
    }
    return pre_static, pre_step


def make_step_shared(params):
    """_Transform and _Describe both softmax-readout in0 against the same
    image grid (reference nmn3_modules.py:123-240): compute it once per
    executor step (see executor.execute_layout)."""

    def step_shared(pre, pre_t, in0, in1, t):
        if "image_feat_q" in pre:   # int8 grid streaming (common.GRID_INT8)
            from n2nmn_tpu.ops.pallas.kernels import fused_readout_q
            ro = fused_readout_q(in0[:, None, :], pre["image_feat_q"],
                                 pre["image_feat_scale"], in0.dtype)
            return {"readout0": ro[:, 0]}
        return {"readout0": common.att_softmax_readout(
            in0, pre["image_feat"])}

    return step_shared


def _readout0(pre, pre_t, in0):
    if "readout0" in pre_t:
        return pre_t["readout0"]
    return common.att_softmax_readout(in0, pre["image_feat"])


def make_branches(params):
    def _fc(p, x):
        return x @ p["w"] + p["b"]

    def find(pre, pre_t, in0, in1, t):
        return pre_t["att_find"]

    def transform(pre, pre_t, in0, in1, t):
        p = params["transform"]
        att_mapped = _fc(p["fc_att"], _readout0(pre, pre_t, in0))
        if "img_tfm_q" in pre:      # int8 grid streaming
            # per-channel dequant scale folds exactly into the
            # elementwise text modulation: q*s ⊙ txt == q ⊙ (s*txt)
            from n2nmn_tpu.ops.pallas.kernels import fused_find_q
            txt_eff = (pre_t["txt_tfm"].astype(jnp.float32)
                       * att_mapped.astype(jnp.float32)
                       * pre["img_tfm_scale"])
            return fused_find_q(pre["img_tfm_q"], txt_eff,
                                p["conv_eltwise"]["w"][:, 0],
                                p["conv_eltwise"]["b"][0], in0.dtype)
        if common.fused_fsp_active():
            # same double-read XLA lowering as CLEVR's _FindSameProperty
            # (the math is identical, reference nmn3_modules.py:123-171):
            # one VMEM pass over the [N, HW, map] grid instead of two
            from n2nmn_tpu.ops.pallas.kernels import fused_find
            return fused_find(pre["img_tfm"],
                              pre_t["txt_tfm"] * att_mapped,
                              p["conv_eltwise"]["w"][:, 0],
                              p["conv_eltwise"]["b"][0])
        elt = l2_normalize(
            pre["img_tfm"] * pre_t["txt_tfm"][:, None, :]
            * att_mapped[:, None, :], axis=2)
        return common.project_to_att(elt, p["conv_eltwise"])

    def and_(pre, pre_t, in0, in1, t):
        return jnp.minimum(in0, in1)

    def describe(pre, pre_t, in0, in1, t):
        p = params["describe"]
        att_mapped = _fc(p["fc_att"], _readout0(pre, pre_t, in0))
        elt = pre_t["txt_desc"] * att_mapped
        if "enc_mapped" in pre:
            # optional encoder-state mixing (reference
            # nmn3_modules.py:232-235)
            elt = elt * pre["enc_mapped"]
        elt = l2_normalize(elt, axis=1)
        return _fc(p["fc_eltwise"], elt)

    return [find, transform, and_], [describe]
