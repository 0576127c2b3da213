"""Optimizer construction.

The reference trains everything with tf.train.AdamOptimizer at defaults
(lr 1e-3, b1 .9, b2 .999, eps 1e-8) and clips each gradient tensor
*individually* by L2 norm (tf.clip_by_norm semantics, NOT global norm —
exp_clevr/train_clevr_gt_layout.py:117-124)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def clip_each_by_norm(max_norm: float) -> optax.GradientTransformation:
    """Per-leaf tf.clip_by_norm: g * max_norm / max(||g||, max_norm)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            return g * (max_norm / jnp.maximum(norm, max_norm))

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(learning_rate: float = 1e-3,
                   max_grad_l2_norm: float | None = None):
    """Adam with TF1-default hyperparameters + optional per-tensor clip."""
    chain = []
    if max_grad_l2_norm is not None:
        chain.append(clip_each_by_norm(max_grad_l2_norm))
    chain.append(optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*chain)
