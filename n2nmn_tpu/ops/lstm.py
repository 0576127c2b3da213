"""Multi-layer LSTM as jax.lax.scan — the TPU-native replacement for the
reference's tf.nn.dynamic_rnn / tf.nn.raw_rnn C++ loop runtimes
(reference models_clevr/nmn3_netgen_att.py:94,304).

Cell semantics match tf.contrib.rnn.BasicLSTMCell (TF 1.0):
  gates [i, j, f, o] = [x, h] @ W + b,   forget_bias = 1.0
  c' = c * sigmoid(f + 1) + sigmoid(i) * tanh(j)
  h' = tanh(c') * sigmoid(o)
Dropout (keep_prob 0.5) is applied to the *output* of every layer except the
last, as in the reference's DropoutWrapper usage
(models_clevr/nmn3_netgen_att.py:17-44).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from n2nmn_tpu.ops.nn import xavier_uniform, dropout


def init_lstm_cell(key, input_dim, hidden_dim, dtype=jnp.float32):
    return {
        "w": xavier_uniform(key, (input_dim + hidden_dim, 4 * hidden_dim),
                            dtype),
        "b": jnp.zeros((4 * hidden_dim,), dtype),
    }


def lstm_cell_step(params, x, c, h, forget_bias=1.0):
    gates = jnp.dot(jnp.concatenate([x, h], axis=-1), params["w"],
                    preferred_element_type=x.dtype) + params["b"]
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return new_c, new_h


def init_lstm_stack(key, input_dim, hidden_dim, num_layers,
                    dtype=jnp.float32):
    """num_layers stacked cells; layer l>0 takes layer l-1's output."""
    keys = jax.random.split(key, num_layers)
    cells = []
    d_in = input_dim
    for l in range(num_layers):
        cells.append(init_lstm_cell(keys[l], d_in, hidden_dim, dtype))
        d_in = hidden_dim
    return {"cells": cells}


def lstm_stack_step(params, x, state, dropout_key=None, deterministic=True):
    """One step of the stacked LSTM.

    state: (c, h) each [L, N, D]. Returns (top-layer output, new_state).
    Dropout on the output of layers 0..L-2 only (reference
    nmn3_netgen_att.py:24-41).
    """
    c, h = state
    num_layers = len(params["cells"])
    inp = x
    new_c, new_h = [], []
    for l in range(num_layers):
        cl, hl = lstm_cell_step(params["cells"][l], inp, c[l], h[l])
        new_c.append(cl)
        new_h.append(hl)
        out = hl
        if l < num_layers - 1 and not deterministic:
            dropout_key, sub = jax.random.split(dropout_key)
            out = dropout(sub, out, 0.5, deterministic=False)
        inp = out
    return inp, (jnp.stack(new_c), jnp.stack(new_h))


def encode_sequence(params, embedded_seq, seq_length, dropout_key=None,
                    deterministic=True):
    """tf.nn.dynamic_rnn(time_major=True) equivalent over a stacked LSTM.

    embedded_seq: [T, N, E]; seq_length: [N] int32.
    Semantics replicated from dynamic_rnn with sequence_length: outputs at
    t >= seq_length are zero and the state stops updating there.

    Layer 0's input projection is hoisted out of the scan: the cell
    weight [(E+D), 4D] splits as [x, h] @ W = x @ W_x + h @ W_h, and
    x @ W_x for ALL T steps is one batched MXU matmul instead of T
    sequential small ones (identical math; the higher layers' inputs are
    sequential and stay in-scan).

    Returns (outputs [T, N, D], final_state (c, h) each [L, N, D]).
    """
    T, N, E = embedded_seq.shape
    num_layers = len(params["cells"])
    hidden = params["cells"][0]["w"].shape[1] // 4
    dtype = embedded_seq.dtype
    c0 = jnp.zeros((num_layers, N, hidden), dtype)
    h0 = jnp.zeros((num_layers, N, hidden), dtype)

    cell0 = params["cells"][0]
    w_x, w_h = cell0["w"][:E], cell0["w"][E:]
    x_proj = (embedded_seq.reshape(T * N, E) @ w_x).reshape(T, N, -1) \
        + cell0["b"]

    if deterministic:
        step_keys = jnp.zeros((T, 2), jnp.uint32)
    else:
        step_keys = jax.random.split(dropout_key, T)

    t_idx = jnp.arange(T)

    def step(carry, xs):
        c, h = carry
        xp_t, t, key = xs
        drop_key = key
        # layer 0: precomputed input projection + recurrent part
        gates = xp_t + jnp.dot(h[0], w_h,
                               preferred_element_type=h.dtype)
        i, j, f, o = jnp.split(gates, 4, axis=-1)
        nc0 = c[0] * jax.nn.sigmoid(f + 1.0) \
            + jax.nn.sigmoid(i) * jnp.tanh(j)
        nh0 = jnp.tanh(nc0) * jax.nn.sigmoid(o)
        new_c, new_h = [nc0], [nh0]
        out = nh0
        for l in range(1, num_layers):
            inp = out
            if not deterministic:
                drop_key, sub = jax.random.split(drop_key)
                inp = dropout(sub, inp, 0.5, deterministic=False)
            cl, hl = lstm_cell_step(params["cells"][l], inp, c[l], h[l])
            new_c.append(cl)
            new_h.append(hl)
            out = hl
        nc, nh = jnp.stack(new_c), jnp.stack(new_h)
        active = (t < seq_length)[None, :, None]          # [1, N, 1]
        nc = jnp.where(active, nc, c)
        nh = jnp.where(active, nh, h)
        out = jnp.where(active[0], out, 0.0)
        return (nc, nh), out

    from n2nmn_tpu.ops.nn import SCAN_UNROLL, maybe_remat
    (cf, hf), outputs = jax.lax.scan(maybe_remat(step), (c0, h0),
                                     (x_proj, t_idx, step_keys),
                                     unroll=SCAN_UNROLL)
    return outputs, (cf, hf)
