"""CLEVR module library: 14 modules over a [N, 10, 15, 512] VGG pool5 grid
(reference models_clevr/nmn3_modules.py). map_dim=250, Transform kernel 5.

Attention-output modules: _Scene, _Find, _Filter, _FindSameProperty,
_Transform, _And, _Or. Answer-output: _Exist, _Count, _EqualNum, _MoreNum,
_LessNum, _SameProperty, _Describe.

All image 1x1-conv mappings and all per-timestep text fc mappings are
precomputed in batched MXU passes; the executor-scan branches are pure
elementwise/VPU work plus small readout contractions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from n2nmn_tpu.ops.nn import init_fc, init_conv, apply_1x1_conv, l2_normalize
from n2nmn_tpu.models.modules import common

ATT_MODULES = ["_Scene", "_Find", "_Filter", "_FindSameProperty",
               "_Transform", "_And", "_Or"]
ANS_MODULES = ["_Exist", "_Count", "_EqualNum", "_MoreNum", "_LessNum",
               "_SameProperty", "_Describe"]

MAP_DIM = 250
TRANSFORM_KERNEL = 5
SCENE_POS_VAL = 3.0  # reference SceneModule pos_val (nmn3_modules.py:60)


NUM_EXT_HIDDEN = 128   # hidden width of the num_mlp extension heads


def _init_pair_counts(key, hw, num_choices, num_mlp, dtype, num_res=False):
    """Head for _EqualNum/_MoreNum/_LessNum over the two concatenated
    count-feature vectors. The reference head is a single fc
    (nmn3_modules.py EqualNumModule et al.) — which provably cannot
    compute count equality (nonlinear in the pair). num_mlp=True is a
    FRAMEWORK EXTENSION (NMNConfig.num_mlp_ext, off by default for
    parity): one hidden relu layer restores expressiveness.

    num_res=True (NMNConfig.num_res_ext) is the measured-better form:
    the pure MLP head trades families — it learns count equality but
    LOSES the linear head's exact sum(att1)-sum(att2) inductive bias
    that makes the monotone _MoreNum/_LessNum comparisons easy
    (flag_v21 seed 0 tst: parity Less/More 96/99% Equal 72%; MLP head
    68/66/100% in the full-extension run). The residual form keeps the
    parity linear path (fc_scores, SAME init stream, so at init the
    head IS the parity head) and adds a zero-init MLP correction
    (fc_hidden -> relu -> fc_res, fc_res starts at 0): monotone
    comparisons retain their linear shortcut while equality gains the
    nonlinear term."""
    if num_res:
        return {
            "fc_scores": init_fc(key, 2 * (hw + 2), num_choices,
                                 dtype=dtype),
            "fc_hidden": init_fc(jax.random.fold_in(key, 1),
                                 2 * (hw + 2), NUM_EXT_HIDDEN, dtype=dtype),
            "fc_res": {"w": jnp.zeros((NUM_EXT_HIDDEN, num_choices),
                                      dtype),
                       "b": jnp.zeros((num_choices,), dtype)},
        }
    if not num_mlp:
        return {"fc_scores": init_fc(key, 2 * (hw + 2), num_choices,
                                     dtype=dtype)}
    k1, k2 = jax.random.split(key)
    return {
        "fc_hidden": init_fc(k1, 2 * (hw + 2), NUM_EXT_HIDDEN, dtype=dtype),
        "fc_scores": init_fc(k2, NUM_EXT_HIDDEN, num_choices, dtype=dtype),
    }


def init_params(key, image_dim, text_dim, num_choices, hw,
                map_dim=MAP_DIM, dtype=jnp.float32, num_mlp=False,
                scene_ext=False, count_mlp=False, scene_bounded=False,
                num_res=False):
    keys = jax.random.split(key, 24)
    k = iter(keys)
    extra = {}
    if scene_ext:
        # FRAMEWORK EXTENSION (NMNConfig.scene_ext, off by default for
        # parity): learned objectness attention for _Scene. The
        # reference SceneModule emits a CONSTANT map (pos_val 3,
        # nmn3_modules.py:60-72), so _Scene _Count cannot see the scene
        # — the measured ~18% accuracy floor on that family. A 1x1 conv
        # of image features (a _Find with no text argument) restores
        # image dependence. Key derived via fold_in so the parity
        # parameter stream is untouched.
        #
        # scene_bounded (NMNConfig.scene_bounded, params key "scene_b"):
        # squash the objectness logits to SCENE_POS_VAL*sigmoid, i.e.
        # [0, 3] — per-cell "pos_val where objects are". The raw form's
        # unbounded logits shift the scale of one of the two attention
        # families the shared answer heads read through flat_min_max,
        # and the _Find-map families collapse (flag_v21 seed 0: _Find
        # _Count 90%->60%, _Or _Count 78%->31%, unfixed by an MLP Count
        # head — a train-time interference, not head expressiveness).
        key_name = "scene_b" if scene_bounded else "scene"
        extra[key_name] = {
            "fc_att": init_fc(jax.random.fold_in(key, 999), image_dim, 1,
                              dtype=dtype)}
    return extra | {
        "find": {
            "conv_image": init_fc(next(k), image_dim, map_dim, dtype=dtype),
            "fc_text": init_fc(next(k), text_dim, map_dim, dtype=dtype),
            "conv_eltwise": init_fc(next(k), map_dim, 1, dtype=dtype),
        },
        # _Filter = _Find + _And composition; shares find's weights
        # (reference FilterModule, nmn3_modules.py:113-132)
        "find_same_property": {
            "conv_image": init_fc(next(k), image_dim, map_dim, dtype=dtype),
            "fc_text": init_fc(next(k), text_dim, map_dim, dtype=dtype),
            "fc_att": init_fc(next(k), image_dim, map_dim, dtype=dtype),
            "conv_eltwise": init_fc(next(k), map_dim, 1, dtype=dtype),
        },
        "transform": {
            "conv_maps": init_conv(next(k), TRANSFORM_KERNEL, 1, map_dim,
                                   dtype=dtype),
            "text_fc": init_fc(next(k), text_dim, map_dim, dtype=dtype),
            "conv_eltwise": init_fc(next(k), map_dim, 1, dtype=dtype),
        },
        "exist": {"fc_scores": init_fc(next(k), 3, num_choices,
                                       dtype=dtype)},
        # count_mlp: FRAMEWORK EXTENSION (NMNConfig.count_mlp_ext, off by
        # default for parity with the single-fc CountModule,
        # nmn3_modules.py:75-86). A linear head over the flattened
        # attention cannot serve two differently-scaled attention
        # families at once — measured when scene_ext's learned-objectness
        # maps and _Find maps share this head (flag_v21 seed 0 cloning:
        # _Find _Count 90%->60%, _Find _Find _Or _Count 78%->31%); one
        # hidden relu layer restores per-family counting.
        "count": ({"fc_hidden": init_fc(next(k), hw + 2, NUM_EXT_HIDDEN,
                                        dtype=dtype),
                   "fc_scores": init_fc(jax.random.fold_in(key, 998),
                                        NUM_EXT_HIDDEN, num_choices,
                                        dtype=dtype)}
                  if count_mlp else
                  {"fc_scores": init_fc(next(k), hw + 2, num_choices,
                                        dtype=dtype)}),
        "equal_num": _init_pair_counts(next(k), hw, num_choices, num_mlp,
                                       dtype, num_res=num_res),
        "more_num": _init_pair_counts(next(k), hw, num_choices, num_mlp,
                                      dtype, num_res=num_res),
        "less_num": _init_pair_counts(next(k), hw, num_choices, num_mlp,
                                      dtype, num_res=num_res),
        "same_property": {
            "fc_text": init_fc(next(k), text_dim, map_dim, dtype=dtype),
            "fc_att_0": init_fc(next(k), image_dim, map_dim, dtype=dtype),
            "fc_att_1": init_fc(next(k), image_dim, map_dim, dtype=dtype),
            "fc_eltwise": init_fc(next(k), map_dim, num_choices,
                                  dtype=dtype),
        },
        "describe": {
            "fc_text": init_fc(next(k), text_dim, map_dim, dtype=dtype),
            "fc_att": init_fc(next(k), image_dim, map_dim, dtype=dtype),
            "fc_eltwise": init_fc(next(k), map_dim, num_choices,
                                  dtype=dtype),
        },
    }


def precompute(params, image_feat, word_vecs):
    """image_feat: [N, H, W, D_im]; word_vecs: [T_dec, N, D_txt]."""
    n, h, w, d_im = image_feat.shape
    t, _, d_txt = word_vecs.shape
    wv = word_vecs.reshape(t * n, d_txt)

    def txt(p):
        return (wv @ p["w"] + p["b"]).reshape(t, n, -1)

    pre_static = {
        "image_feat": image_feat.reshape(n, h * w, d_im),
        "img_find": apply_1x1_conv(params["find"]["conv_image"],
                                   image_feat).reshape(n, h * w, -1),
        "img_fsp": apply_1x1_conv(
            params["find_same_property"]["conv_image"],
            image_feat).reshape(n, h * w, -1),
        "h": h, "w": w,
    }
    if "scene" in params:
        # scene_ext: stack- and text-independent, so hoisted out of the
        # executor scan (computing it per step would re-stream the full
        # [N, HW, D] grid each step for a [N, HW] result)
        pre_static["att_scene"] = apply_1x1_conv(
            params["scene"]["fc_att"], image_feat).reshape(n, h * w)
    elif "scene_b" in params:
        # scene_bounded: objectness squashed to [0, SCENE_POS_VAL] so
        # the scene maps live in the same value regime as the parity
        # constant map (see init_params scene note)
        logits = apply_1x1_conv(
            params["scene_b"]["fc_att"], image_feat).reshape(n, h * w)
        pre_static["att_scene"] = SCENE_POS_VAL * jax.nn.sigmoid(logits)
    if common.grid_int8_active():
        # one-time int8 quantization of the two grids the executor scan
        # re-streams every step (see common.GRID_INT8); the bf16
        # versions below become dead under jit and are DCE'd
        from n2nmn_tpu.ops.pallas.kernels import quantize_grid
        (pre_static["image_feat_q"],
         pre_static["image_feat_scale"]) = quantize_grid(
            pre_static["image_feat"])
        (pre_static["img_fsp_q"],
         pre_static["img_fsp_scale"]) = quantize_grid(pre_static["img_fsp"])
    pre_step = {
        "txt_fsp": txt(params["find_same_property"]["fc_text"]),
        "txt_sp": txt(params["same_property"]["fc_text"]),
        "txt_desc": txt(params["describe"]["fc_text"]),
        # _Find is stack-independent: hoist its whole [T, N, HW] output out
        # of the executor scan (one batched MXU pass instead of re-reading
        # img_find every step)
        "att_find": common.find_core_all(
            pre_static["img_find"], txt(params["find"]["fc_text"]),
            params["find"]["conv_eltwise"]),
    }
    txt_tfm = txt(params["transform"]["text_fc"])
    if common.transform_impl_for_batch(n) == "dot":
        pre_step.update(common.transform_dot_precompute(
            params["transform"]["conv_maps"],
            params["transform"]["conv_eltwise"], txt_tfm))
    else:
        pre_step["txt_tfm"] = txt_tfm
    return pre_static, pre_step


def make_step_shared(params):
    """Cross-branch fusion hook for the executor (see
    executor.execute_layout): _FindSameProperty/_SameProperty/_Describe
    all need softmax-readouts of the stack inputs against the SAME
    [N, HW, D_feat] image grid (reference att_softmax + weighted sum,
    nmn3_modules.py:170-174) — one stacked einsum streams the grid from
    HBM once per step instead of once per distinct readout."""

    def step_shared(pre, pre_t, in0, in1, t):
        if "image_feat_q" in pre:   # int8 grid streaming (common.GRID_INT8)
            from n2nmn_tpu.ops.pallas.kernels import fused_readout_q
            ro = fused_readout_q(jnp.stack([in0, in1], axis=1),
                                 pre["image_feat_q"],
                                 pre["image_feat_scale"], in0.dtype)
        else:
            sm = jax.nn.softmax(jnp.stack([in0, in1], axis=1), axis=2)
            ro = jnp.einsum("nkp,npd->nkd", sm, pre["image_feat"])
        return {"readout0": ro[:, 0], "readout1": ro[:, 1]}

    return step_shared


def _readout(pre, pre_t, att, key):
    """Shared per-step readout when the executor provides it; direct
    computation otherwise (tree-interpreter / standalone callers)."""
    if key in pre_t:
        return pre_t[key]
    return common.att_softmax_readout(att, pre["image_feat"])


def make_branches(params):
    def _fc(p, x):
        return x @ p["w"] + p["b"]

    def scene(pre, pre_t, in0, in1, t):
        n, hw, _ = pre["img_find"].shape
        if "scene" in params or "scene_b" in params:
            # scene_ext / scene_bounded: learned objectness attention
            return pre["att_scene"].astype(pre["img_find"].dtype)
        return jnp.full((n, hw), SCENE_POS_VAL, pre["img_find"].dtype)

    def find(pre, pre_t, in0, in1, t):
        return pre_t["att_find"]

    def filter_(pre, pre_t, in0, in1, t):
        return jnp.minimum(in0, pre_t["att_find"])

    def find_same_property(pre, pre_t, in0, in1, t):
        p = params["find_same_property"]
        att_feat = _readout(pre, pre_t, in0, "readout0")
        att_mapped = _fc(p["fc_att"], att_feat)            # [N, map]
        if "img_fsp_q" in pre:      # int8 grid streaming
            # per-channel dequant scale folds exactly into the
            # elementwise text modulation: q*s ⊙ txt == q ⊙ (s*txt)
            from n2nmn_tpu.ops.pallas.kernels import fused_find_q
            txt_eff = (pre_t["txt_fsp"].astype(jnp.float32)
                       * att_mapped.astype(jnp.float32)
                       * pre["img_fsp_scale"])
            return fused_find_q(pre["img_fsp_q"], txt_eff,
                                p["conv_eltwise"]["w"][:, 0],
                                p["conv_eltwise"]["b"][0], in0.dtype)
        if common.fused_fsp_active():
            from n2nmn_tpu.ops.pallas.kernels import fused_find
            return fused_find(pre["img_fsp"],
                              pre_t["txt_fsp"] * att_mapped,
                              p["conv_eltwise"]["w"][:, 0],
                              p["conv_eltwise"]["b"][0])
        elt = l2_normalize(
            pre["img_fsp"] * pre_t["txt_fsp"][:, None, :]
            * att_mapped[:, None, :], axis=2)
        return common.project_to_att(elt, p["conv_eltwise"])

    def transform(pre, pre_t, in0, in1, t):
        p = params["transform"]
        if "tfm_kq" in pre_t:   # dot form (common.TRANSFORM_IMPL)
            return common.transform_dot_apply(
                in0, pre_t, p["conv_eltwise"], pre["h"], pre["w"],
                TRANSFORM_KERNEL)
        maps = common.conv_on_attention(in0, p["conv_maps"],
                                        pre["h"], pre["w"])
        elt = l2_normalize(maps * pre_t["txt_tfm"][:, None, :], axis=2)
        return common.project_to_att(elt, p["conv_eltwise"])

    def and_(pre, pre_t, in0, in1, t):
        return jnp.minimum(in0, in1)

    def or_(pre, pre_t, in0, in1, t):
        return jnp.maximum(in0, in1)

    def exist(pre, pre_t, in0, in1, t):
        return _fc(params["exist"]["fc_scores"], common.min_avg_max(in0))

    def count(pre, pre_t, in0, in1, t):
        feats = common.flat_min_max(in0)
        if "fc_hidden" in params["count"]:   # count_mlp extension head
            feats = jax.nn.relu(_fc(params["count"]["fc_hidden"], feats))
        return _fc(params["count"]["fc_scores"], feats)

    def _pair_counts(name):
        def fn(pre, pre_t, in0, in1, t):
            p = params[name]
            feats = jnp.concatenate(
                [common.flat_min_max(in0), common.flat_min_max(in1)], axis=1)
            if "fc_res" in p:   # num_res extension: linear + MLP residual
                hid = jax.nn.relu(_fc(p["fc_hidden"], feats))
                return _fc(p["fc_scores"], feats) + _fc(p["fc_res"], hid)
            if "fc_hidden" in p:   # num_mlp extension head
                feats = jax.nn.relu(_fc(p["fc_hidden"], feats))
            return _fc(p["fc_scores"], feats)
        return fn

    def same_property(pre, pre_t, in0, in1, t):
        p = params["same_property"]
        f0 = _fc(p["fc_att_0"], _readout(pre, pre_t, in0, "readout0"))
        f1 = _fc(p["fc_att_1"], _readout(pre, pre_t, in1, "readout1"))
        elt = l2_normalize(f0 * pre_t["txt_sp"] * f1, axis=1)
        return _fc(p["fc_eltwise"], elt)

    def describe(pre, pre_t, in0, in1, t):
        p = params["describe"]
        att_mapped = _fc(p["fc_att"],
                         _readout(pre, pre_t, in0, "readout0"))
        elt = l2_normalize(pre_t["txt_desc"] * att_mapped, axis=1)
        return _fc(p["fc_eltwise"], elt)

    att = [scene, find, filter_, find_same_property, transform, and_, or_]
    ans = [exist, count, _pair_counts("equal_num"), _pair_counts("more_num"),
           _pair_counts("less_num"), same_property, describe]
    return att, ans
