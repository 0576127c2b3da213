"""Hyperparameter-parity regression tests: the experiment configs must
match the reference driver scripts' constants (provenance in each
config's field comments)."""

import math

from n2nmn_tpu.experiments import shapes, clevr, vqa


def test_shapes_gt_layout_defaults():
    c = shapes.ShapesConfig()
    # reference exp_shapes/train_shapes_gt_layout.py:24-44
    assert (c.lstm_dim, c.num_layers) == (256, 2)
    assert (c.T_encoder, c.T_decoder, c.N) == (15, 11, 256)
    assert (c.encoder_dropout, c.decoder_dropout,
            c.decoder_sampling) == (True, True, True)
    assert (c.weight_decay, c.max_grad_l2_norm) == (5e-4, 10.0)
    assert (c.max_iter, c.snapshot_interval) == (40000, 10000)


def test_shapes_scratch_defaults():
    c = shapes.scratch_config()
    # reference exp_shapes/train_shapes_scratch.py:35-44
    assert c.T_decoder == 7
    assert (c.invalid_expr_loss, c.lambda_entropy) == (3.0, 0.5)
    assert (c.baseline_decay, c.max_iter) == (0.99, 400000)


def test_clevr_gt_layout_defaults():
    c = clevr.ClevrConfig()
    # reference exp_clevr/train_clevr_gt_layout.py:23-57
    assert (c.H_feat, c.W_feat, c.D_feat) == (10, 15, 512)
    assert (c.lstm_dim, c.T_encoder, c.T_decoder, c.N) == (512, 45, 10, 64)
    assert (c.encoder_dropout, c.decoder_dropout) == (False, False)
    assert c.decoder_sampling and c.prune_filter_module
    assert (c.weight_decay, c.max_grad_l2_norm) == (5e-6, 10.0)
    assert (c.max_iter, c.snapshot_interval) == (80000, 10000)


def test_clevr_rl_defaults():
    c = clevr.rl_config()
    # reference exp_clevr/train_clevr_rl_gt_layout.py:42-51,101
    assert c.learning_rate == 1e-4
    assert (c.invalid_expr_loss, c.lambda_entropy) == (0.5, 0.005)
    assert c.max_iter == 80000


def test_clevr_scratch_defaults():
    c = clevr.scratch_config()
    # reference exp_clevr/train_clevr_scratch.py:35-45
    assert c.T_decoder == 6
    assert c.weight_decay == 0.0
    assert abs(c.invalid_expr_loss - math.log(28)) < 1e-9
    assert (c.lambda_entropy, c.max_iter) == (0.01, 120000)


def test_vqa_defaults():
    c = vqa.VqaConfig()
    # reference exp_vqa/train_vqa_gt_layout.py:23-48
    assert (c.H_feat, c.W_feat, c.D_feat) == (14, 14, 2048)
    assert (c.lstm_dim, c.T_encoder, c.T_decoder, c.N) == (1000, 26, 13, 64)
    assert c.decoder_sampling is False      # OFF even in training (:33)
    assert c.use_qpn and c.qpn_dropout
    assert c.weight_decay == 0.0
    assert c.max_grad_l2_norm is None       # no grad clipping (:117-121)
    assert (c.max_iter, c.snapshot_interval) == (40000, 5000)


def test_vqa_rl_defaults():
    c = vqa.rl_config()
    # reference exp_vqa/train_vqa_rl_gt_layout.py:36,46-50
    assert c.decoder_sampling is True
    assert c.learning_rate == 1e-4
    assert c.max_grad_l2_norm == 10.0
    assert (c.invalid_expr_loss, c.lambda_entropy) == (0.5, 0.005)


def test_vqa_v2_defaults():
    c = vqa.v2_config()
    # reference train_vqa2_gt_layout.py differs only in max_iter + imdb
    assert c.max_iter == 80000
    assert "vqa_v2" in c.imdb_trn
