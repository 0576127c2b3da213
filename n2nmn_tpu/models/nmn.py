"""The full Neural Module Network model: layout policy -> in-graph
assembly/validity -> stack-machine module execution -> answer logits.

One parameterized model replaces the reference's three near-duplicate
NMN3Model classes (models_shapes/nmn3_model.py, models_clevr/nmn3_model.py,
models_vqa/nmn3_model.py); the dataset flavor picks the module library,
backbone, and optional question-prior head.

Everything — encoder, decoder, validity automaton, module execution, qpn —
runs inside ONE jitted function. The reference needed two partial_run
phases with a host-side assembler in between
(exp_clevr/train_clevr_gt_layout.py:169-196); here gradient flow from the
answer loss into the decoder's word_vecs and the layout log-probs is
carried by the fused program directly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.layout.executor import build_tables, execute_layout
from n2nmn_tpu.models.netgen import NetgenConfig, init_netgen, run_netgen
from n2nmn_tpu.models.modules import shapes as shapes_lib
from n2nmn_tpu.models.modules import clevr as clevr_lib
from n2nmn_tpu.models.modules import vqa as vqa_lib
from n2nmn_tpu.models import backbones
from n2nmn_tpu.models.question_prior import init_qpn, apply_qpn
from n2nmn_tpu.ops.nn import init_fc, apply_1x1_conv

MODULE_LIBS = {"shapes": shapes_lib, "clevr": clevr_lib, "vqa": vqa_lib}


@dataclasses.dataclass(frozen=True)
class NMNConfig:
    flavor: str                    # "shapes" | "clevr" | "vqa"
    netgen: NetgenConfig
    num_choices: int
    H_feat: int
    W_feat: int
    D_feat: int                    # channels of the module-visible grid
    in_graph_cnn: bool = False     # SHAPES: images -> convnet in-graph
    in_graph_vgg: bool = False     # CLEVR: raw images -> VGG pool5 in-graph
    in_graph_resnet: bool = False  # VQA: raw images -> ResNet-152 res5c
    # The reference's backbones are frozen by construction (features are
    # dumped offline: exp_clevr/data/extract_visual_features_vgg_pool5.py;
    # VQA's 307 GB res5c dump); keep that contract in-graph: stop
    # gradients at the feature grid and exclude the backbone (VGG or
    # ResNet) from L2 decay (train/steps.py). Set False to fine-tune.
    freeze_backbone: bool = True
    use_qpn: bool = False
    qpn_dropout: bool = False
    reduce_visfeat_dim: bool = False
    D_feat_raw: int = 0            # raw channels before reduce_visfeat_dim
    # FRAMEWORK EXTENSION (off = reference parity): MLP heads for the
    # CLEVR count-comparison modules _EqualNum/_MoreNum/_LessNum. The
    # reference's single fc over two count encodings cannot represent
    # count equality (nmn3_modules.py EqualNumModule); one hidden relu
    # layer can (modules/clevr.py:_init_pair_counts).
    num_mlp_ext: bool = False
    # FRAMEWORK EXTENSION (off = reference parity): residual MLP heads
    # for the count-comparison modules — the parity linear path (exact
    # sum-difference shortcut for _MoreNum/_LessNum) plus a zero-init
    # MLP correction (equality). Supersedes num_mlp_ext, whose pure-MLP
    # head trades families (modules/clevr.py:_init_pair_counts).
    num_res_ext: bool = False
    # FRAMEWORK EXTENSION (off = reference parity): learned objectness
    # attention for _Scene. The reference SceneModule emits a constant
    # map (nmn3_modules.py:60-72), so Count over a Scene layout cannot
    # see the scene — the measured ~18% floor on the _Scene _Count
    # family (modules/clevr.py:init_params scene_ext note).
    scene_ext: bool = False
    # modifier on scene_ext: squash the objectness to [0, pos_val]
    # (sigmoid) so scene maps share the parity constant map's value
    # regime — the raw form's unbounded logits interfere with the
    # shared count heads (modules/clevr.py:init_params scene note).
    scene_bounded: bool = False
    # FRAMEWORK EXTENSION (off = reference parity): MLP _Count head.
    # The reference CountModule is one fc over the flattened attention
    # (nmn3_modules.py:75-86) — linear, so it cannot count two
    # differently-scaled attention families at once, which scene_ext
    # introduces (modules/clevr.py:init_params count note).
    count_mlp_ext: bool = False

    def __post_init__(self):
        # ADVICE r4: both flags silently misconfigure otherwise —
        # scene_bounded without scene_ext is a no-op (the scene block is
        # gated on scene_ext), and num_res_ext supersedes rather than
        # composes with num_mlp_ext (modules/clevr.py checks num_res
        # first).
        if self.scene_bounded and not self.scene_ext:
            raise ValueError("scene_bounded is a modifier on scene_ext; "
                             "pass --scene_ext too (it is a no-op alone)")
        if self.num_mlp_ext and self.num_res_ext:
            raise ValueError("num_mlp_ext and num_res_ext are mutually "
                             "exclusive count-comparison heads "
                             "(num_res_ext supersedes num_mlp_ext)")

    @property
    def freeze_vgg(self) -> bool:
        """Deprecated alias for freeze_backbone (the flag has always also
        gated the ResNet path)."""
        return self.freeze_backbone


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NMNOutput:
    scores: jnp.ndarray        # [N, num_choices]
    tokens: jnp.ndarray        # [T_dec, N]
    token_probs: jnp.ndarray   # [T_dec, N]
    log_seq_prob: jnp.ndarray  # [N]
    neg_entropy: jnp.ndarray   # [N]
    validity: jnp.ndarray      # [N] bool
    atts: jnp.ndarray          # [T_dec, T_enc, N]


class NMNModel:
    """Holds static structure (grammar tables, branch builders); all state
    lives in the params pytree, `apply` is pure/jittable."""

    def __init__(self, cfg: NMNConfig, grammar: ModuleGrammar):
        self.cfg = cfg
        self.grammar = grammar
        self.lib = MODULE_LIBS[cfg.flavor]
        self.tables = build_tables(grammar, self.lib.ATT_MODULES,
                                   self.lib.ANS_MODULES)
        from n2nmn_tpu.models.netgen import make_grammar_arrays
        self.grammar_arrays = make_grammar_arrays(grammar,
                                                  cfg.netgen.T_decoder)

    def _use_fused_executor(self, deterministic: bool, n: int) -> bool:
        """Serving-only fused Pallas executor (no VJP): opt-in via
        N2NMN_FUSED_EXECUTOR=1, CLEVR library, deterministic forward,
        and a conv-form _Transform pre_step at this traced batch (the
        kernel consumes the conv-form txt_tfm, so under "auto" the gate
        follows the same batch resolution as precompute)."""
        import os
        from n2nmn_tpu.models.modules import common
        return (os.environ.get("N2NMN_FUSED_EXECUTOR", "0") == "1"
                and self.cfg.flavor == "clevr" and deterministic
                # the fused kernel hard-codes the parity (single-fc)
                # pair-count heads and the constant-Scene branch; the
                # extensions keep XLA
                and not self.cfg.num_mlp_ext
                and not self.cfg.num_res_ext
                and not self.cfg.scene_ext
                and not self.cfg.count_mlp_ext
                and common.transform_impl_for_batch(n) == "conv")

    def init(self, key, dtype=jnp.float32):
        cfg = self.cfg
        k_net, k_mod, k_cnn, k_qpn, k_red = jax.random.split(key, 5)
        params = {"netgen": init_netgen(k_net, cfg.netgen, dtype)}
        lib_kwargs = {}
        if cfg.flavor == "clevr":
            lib_kwargs["hw"] = cfg.H_feat * cfg.W_feat
            lib_kwargs["num_mlp"] = cfg.num_mlp_ext
            lib_kwargs["num_res"] = cfg.num_res_ext
            lib_kwargs["scene_ext"] = cfg.scene_ext
            lib_kwargs["count_mlp"] = cfg.count_mlp_ext
            lib_kwargs["scene_bounded"] = cfg.scene_bounded
        params["modules"] = self.lib.init_params(
            k_mod, cfg.D_feat, cfg.netgen.embed_dim_txt, cfg.num_choices,
            dtype=dtype, **lib_kwargs)
        if cfg.in_graph_cnn:
            params["convnet"] = backbones.init_shapes_convnet(k_cnn, dtype)
        if cfg.in_graph_vgg:
            # end-to-end image->answer: replaces the reference's 29 GB
            # offline VGG pool5 dump (README.md:57) with on-device
            # extraction fused into the same program; load converted
            # weights via models/vgg_convert.py
            params["vgg"] = backbones.init_vgg16(k_cnn, dtype)
        if cfg.in_graph_resnet:
            # VQA analogue: replaces the 307 GB offline ResNet-152 res5c
            # dump (reference README.md:144) the same way
            from n2nmn_tpu.models import resnet
            params["resnet"] = resnet.init_random(k_cnn, dtype)
        if cfg.use_qpn:
            params["qpn"] = init_qpn(k_qpn, cfg.netgen.lstm_dim,
                                     cfg.netgen.num_layers,
                                     cfg.num_choices, dtype=dtype)
        if cfg.reduce_visfeat_dim:
            # linear 1x1 conv reducing the input feature dim to D_feat
            # (reference models_vqa/nmn3_model.py:26-34)
            params["reduce_visfeat"] = init_fc(
                k_red, cfg.D_feat_raw, cfg.D_feat, dtype=dtype)
        return params

    def apply(self, params, text_seq, seq_length, image_input, rng,
              gt_layout: Optional[jnp.ndarray] = None,
              use_gt_layout: bool = False,
              deterministic: bool = True,
              image_idx: Optional[jnp.ndarray] = None) -> NMNOutput:
        """image_input: raw images [N,30,30,3] for SHAPES (in_graph_cnn) or
        a precomputed feature grid [N, H, W, D] otherwise.

        image_idx: optional [N] int32 question->image indirection. When
        given, image_input holds M UNIQUE images/grids and each
        question's grid is gathered after the backbone — so an in-graph
        backbone (VGG/ResNet) runs once per unique image instead of once
        per question (CLEVR averages ~10 questions/image; the reference's
        offline dump gets this amortization for free by materializing
        features on disk, extract_visual_features_vgg_pool5.py:25-48).

        apply = decode_phase ∘ execute_phase. The split is public so
        serving can software-pipeline across batches (decode batch k+1
        and execute batch k inside ONE program —
        tools/pipelined_eval.py); both phases in one call is the fused
        program every trainer/eval uses."""
        net_out, qpn_rng = self.decode_phase(
            params, text_seq, seq_length, rng, gt_layout=gt_layout,
            use_gt_layout=use_gt_layout, deterministic=deterministic)
        return self.execute_phase(params, net_out, image_input, qpn_rng,
                                  deterministic=deterministic,
                                  image_idx=image_idx)

    def decode_phase(self, params, text_seq, seq_length, rng,
                     gt_layout: Optional[jnp.ndarray] = None,
                     use_gt_layout: bool = False,
                     deterministic: bool = True):
        """Question -> layout tokens (+ the decode-side tensors the
        executor and qpn consume). Returns (NetgenOutput, qpn_rng)."""
        cfg = self.cfg
        rng, net_rng, qpn_rng = jax.random.split(rng, 3)
        net_out = run_netgen(
            params["netgen"], cfg.netgen, self.grammar_arrays,
            text_seq, seq_length, net_rng,
            gt_layout=gt_layout, use_gt_layout=use_gt_layout,
            deterministic=deterministic)
        return net_out, qpn_rng

    def execute_phase(self, params, net_out, image_input, qpn_rng,
                      deterministic: bool = True,
                      image_idx: Optional[jnp.ndarray] = None) -> NMNOutput:
        """Backbone (if in-graph) + padded-stack module execution of
        net_out.tokens + qpn logit add.

        image_idx (see apply): backbone runs on the M unique images, the
        [M,H,W,D] grids are gathered to [N,H,W,D] per question."""
        cfg = self.cfg

        if cfg.in_graph_cnn:
            image_feat = backbones.shapes_convnet(params["convnet"],
                                                  image_input)
        elif cfg.in_graph_vgg:
            image_feat = backbones.vgg16_pool5(params["vgg"], image_input)
            if cfg.freeze_backbone:
                image_feat = jax.lax.stop_gradient(image_feat)
        elif cfg.in_graph_resnet:
            from n2nmn_tpu.models import resnet
            image_feat = resnet.resnet152_res5c(params["resnet"],
                                                image_input)
            if cfg.freeze_backbone:
                image_feat = jax.lax.stop_gradient(image_feat)
        else:
            image_feat = image_input
        if image_idx is not None:
            # question->image gather AFTER the backbone: the expensive
            # conv stack ran on unique images only; the gather itself is
            # one [N,H,W,D] HBM materialization (~300 KB/question bf16
            # at CLEVR geometry), trivial next to a 150-GFLOP VGG pass
            image_feat = jnp.take(image_feat, image_idx, axis=0)
        if cfg.reduce_visfeat_dim:
            image_feat = apply_1x1_conv(params["reduce_visfeat"], image_feat)

        # serving compute dtype follows the module params (bf16 params =>
        # bf16 module math), so in-graph backbones can emit f32 grids
        mod_dtype = jax.tree_util.tree_leaves(params["modules"])[0].dtype
        if (image_feat.dtype != mod_dtype
                and jnp.issubdtype(image_feat.dtype, jnp.floating)):
            image_feat = image_feat.astype(mod_dtype)

        pre_static, pre_step = self.lib.precompute(
            params["modules"], image_feat, net_out.word_vecs)

        if self._use_fused_executor(deterministic, image_feat.shape[0]):
            # serving path: ONE pallas_call replaces the executor scan
            # (ops/pallas/executor_step.py) — module tensors stay
            # VMEM-resident across all decoder steps
            from n2nmn_tpu.ops.pallas.executor_step import (
                execute_layout_clevr_fused)
            scores, validity = execute_layout_clevr_fused(
                net_out.tokens, self.tables, params["modules"],
                pre_static, pre_step,
                hw=cfg.H_feat * cfg.W_feat, num_choices=cfg.num_choices,
                stack_size=cfg.netgen.T_decoder,
                h=cfg.H_feat, w=cfg.W_feat)
        else:
            att_branches, ans_branches = self.lib.make_branches(
                params["modules"])
            make_shared = getattr(self.lib, "make_step_shared", None)
            scores, validity = execute_layout(
                net_out.tokens, self.tables, att_branches, ans_branches,
                pre_static, pre_step,
                hw=cfg.H_feat * cfg.W_feat, num_choices=cfg.num_choices,
                stack_size=cfg.netgen.T_decoder,
                step_shared=make_shared(params["modules"]) if make_shared
                else None)

        if cfg.use_qpn:
            scores_qpn = apply_qpn(params["qpn"], net_out.encoder_h_final,
                                   rng=qpn_rng, use_dropout=cfg.qpn_dropout,
                                   deterministic=deterministic)
            scores = scores + scores_qpn

        return NMNOutput(
            scores=scores, tokens=net_out.tokens,
            token_probs=net_out.token_probs,
            log_seq_prob=net_out.log_seq_prob,
            neg_entropy=net_out.neg_entropy,
            validity=validity, atts=net_out.atts)
