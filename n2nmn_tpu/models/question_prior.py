"""Question-prior network: answer logits from the encoder's final hidden
states (reference models_vqa/question_prior_net.py:10-28). Its logits are
ADDED to the NMN logits (models_vqa/nmn3_model.py:106-114)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from n2nmn_tpu.ops.nn import init_fc, apply_fc, dropout


def init_qpn(key, lstm_dim, num_layers, num_choices, hidden_dim=500,
             dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_fc(k1, lstm_dim * num_layers, hidden_dim, dtype=dtype),
        "fc2": init_fc(k2, hidden_dim, num_choices, dtype=dtype),
    }


def apply_qpn(params, encoder_h_final, rng=None, use_dropout=False,
              deterministic=True):
    """encoder_h_final: [L, N, D] -> logits [N, num_choices]."""
    l, n, d = encoder_h_final.shape
    h_concat = jnp.transpose(encoder_h_final, (1, 0, 2)).reshape(n, l * d)
    drop = use_dropout and not deterministic
    if drop:
        rng, k1, k2 = jax.random.split(rng, 3)
        h_concat = dropout(k1, h_concat, 0.5, deterministic=False)
    x = jax.nn.relu(apply_fc(params["fc1"], h_concat))
    if drop:
        x = dropout(k2, x, 0.5, deterministic=False)
    return apply_fc(params["fc2"], x)
