"""Analytic FLOP accounting for the NMN programs (per question).

XLA's compiled cost_analysis counts a lax.scan/while body ONCE instead of
trip-count times, so it under-reports this scan-heavy workload ~5x; MFU is
therefore computed from this analytic model (matmul/conv = 2*M*N*K;
elementwise counted per output element with small constants documented
inline). Structure mirrors the flagship CLEVR program in
__graft_entry__.entry(); every count is parameterized by the configs.
"""

from __future__ import annotations


def lstm_stack_step_flops(in_dim: int, lstm_dim: int, num_layers: int):
    """One time-step of the stacked LSTM: per layer, gates =
    [x, h] @ W[(in+lstm), 4*lstm] (+ ~6 elementwise ops per gate elem)."""
    total = 0.0
    d_in = in_dim
    for _ in range(num_layers):
        total += 2.0 * (d_in + lstm_dim) * 4 * lstm_dim
        total += 6.0 * 4 * lstm_dim          # sigmoid/tanh/mul/add
        d_in = lstm_dim
    return total


def netgen_eval_flops(net_cfg, T_enc: int) -> float:
    """Encoder + decoder FLOPs per question (models/netgen.py)."""
    D = net_cfg.lstm_dim
    V = net_cfg.num_vocab_nmn
    f = 0.0
    # encoder scan + h_transform fc on every encoder output
    f += T_enc * lstm_stack_step_flops(net_cfg.embed_dim_txt, D,
                                       net_cfg.num_layers)
    f += T_enc * 2.0 * D * D
    # decoder scan
    per_step = lstm_stack_step_flops(net_cfg.embed_dim_nmn, D,
                                     net_cfg.num_layers)
    per_step += 2.0 * D * D                   # q = h_out @ att_w
    per_step += T_enc * D * 4.0               # tanh(q+enc_trans). v
    per_step += T_enc * D * 2.0               # context = att . enc_out
    per_step += 2.0 * 2 * D * V               # token_pred fc
    per_step += 3.0 * V * 4 * 2               # validity automaton X@W-b
    per_step += 6.0 * V                       # log_softmax/mask/entropy
    f += net_cfg.T_decoder * per_step
    # word_vecs = einsum(atts, embedded_seq)
    f += net_cfg.T_decoder * T_enc * net_cfg.embed_dim_txt * 2.0
    return f


def clevr_executor_flops(H: int, W: int, D_feat: int, T_dec: int,
                         num_choices: int, map_dim: int = 250,
                         transform_kernel: int = 5,
                         embed_dim_txt: int = 300) -> float:
    """Stack-machine execution per question: precompute + T_dec dense
    evaluations of all 14 branches (models/modules/clevr.py)."""
    hw = H * W
    C = num_choices
    f = 0.0
    # batched precompute: two image 1x1 convs + 5 per-step text fcs
    f += 2.0 * 2 * hw * D_feat * map_dim
    f += T_dec * 5 * 2.0 * embed_dim_txt * map_dim

    readout = 4.0 * hw + 2.0 * hw * D_feat     # softmax + weighted readout
    find_core = 4.0 * hw * map_dim + 2.0 * hw * map_dim   # elt+norm, proj
    per_step = 0.0
    per_step += hw                                          # scene fill
    per_step += find_core                                   # find
    per_step += find_core + hw                              # filter
    per_step += (readout + 2.0 * D_feat * map_dim
                 + 5.0 * hw * map_dim + 2.0 * hw * map_dim)  # fsp
    per_step += (2.0 * hw * transform_kernel ** 2 * map_dim
                 + 4.0 * hw * map_dim + 2.0 * hw * map_dim)  # transform
    per_step += 2 * hw                                      # and, or
    per_step += 3.0 * hw + 2.0 * 3 * C                      # exist
    per_step += 2.0 * hw + 2.0 * (hw + 2) * C               # count
    per_step += 3 * (4.0 * hw + 2.0 * 2 * (hw + 2) * C)     # eq/more/less
    per_step += (2 * readout + 2 * 2.0 * D_feat * map_dim
                 + 5.0 * map_dim + 2.0 * map_dim * C)       # same_property
    per_step += (readout + 2.0 * D_feat * map_dim
                 + 4.0 * map_dim + 2.0 * map_dim * C)       # describe
    # one-hot selects + stack gather/scatter (elementwise over [S,hw])
    per_step += 7.0 * hw * 2 + 7.0 * C * 2 + 3.0 * T_dec * hw
    f += T_dec * per_step
    return f


def vqa_executor_flops(H: int, W: int, D_feat: int, T_dec: int,
                       num_choices: int, map_dim: int = 1024,
                       embed_dim_txt: int = 300) -> float:
    """Stack-machine execution per question for the VQA module library
    (models/modules/vqa.py): coordinate-map grid, hoisted _Find, and the
    readout-based _Transform/_Describe."""
    hw = H * W
    d = D_feat + 2                 # + x/y coordinate maps
    C = num_choices
    f = 0.0
    # precompute: img_find + img_tfm 1x1 convs over the coord grid;
    # 3 per-step text fcs; hoisted find-core over all T_dec steps
    f += 2.0 * 2 * hw * d * map_dim
    f += T_dec * 3 * 2.0 * embed_dim_txt * map_dim
    f += T_dec * (4.0 * hw * map_dim + 2.0 * hw * map_dim)  # find_core_all

    readout = 4.0 * hw + 2.0 * hw * d        # step_shared softmax readout
    per_step = readout
    per_step += (2.0 * d * map_dim + 5.0 * hw * map_dim
                 + 2.0 * hw * map_dim)                       # transform
    per_step += hw                                           # and
    per_step += 2.0 * d * map_dim + 4.0 * map_dim \
        + 2.0 * map_dim * C                                  # describe
    per_step += 4.0 * hw * 2 + 1.0 * C * 2 + 3.0 * T_dec * hw  # selects
    f += T_dec * per_step
    return f


def qpn_flops(lstm_dim: int, num_layers: int, num_choices: int,
              hidden: int = 500) -> float:
    """question_prior_net: concat final hiddens -> fc_relu(500) -> fc
    (models/question_prior.py)."""
    return (2.0 * num_layers * lstm_dim * hidden
            + 2.0 * hidden * num_choices)


def vqa_eval_flops_per_question(net_cfg, H=14, W=14, D_feat=2048,
                                num_choices=3001, T_enc=26,
                                use_qpn=True) -> float:
    f = netgen_eval_flops(net_cfg, T_enc)
    f += vqa_executor_flops(H, W, D_feat, net_cfg.T_decoder, num_choices,
                            embed_dim_txt=net_cfg.embed_dim_txt)
    if use_qpn:
        f += qpn_flops(net_cfg.lstm_dim, net_cfg.num_layers, num_choices)
    return f


def vgg16_pool5_flops(H_img: int, W_img: int) -> float:
    """VGG-16 conv1_1..pool5 (models/backbones.py): 3x3 convs, 2x2 pools."""
    blocks = [(64, 64), (128, 128), (256, 256, 256),
              (512, 512, 512), (512, 512, 512)]
    f = 0.0
    h, w, c_in = H_img, W_img, 3
    for channels in blocks:
        for c_out in channels:
            f += 2.0 * h * w * 9 * c_in * c_out + h * w * c_out
            c_in = c_out
        h, w = (h + 1) // 2, (w + 1) // 2
    return f


def flagship_eval_flops_per_question(net_cfg, H=10, W=15, D_feat=512,
                                     num_choices=28, T_enc=45,
                                     from_images=False,
                                     H_img=320, W_img=480) -> float:
    f = netgen_eval_flops(net_cfg, T_enc)
    f += clevr_executor_flops(H, W, D_feat, net_cfg.T_decoder, num_choices,
                              embed_dim_txt=net_cfg.embed_dim_txt)
    if from_images:
        f += vgg16_pool5_flops(H_img, W_img)
    return f
