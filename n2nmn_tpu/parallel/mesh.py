"""Device-mesh parallelism: data-parallel batch sharding + optional tensor
parallelism for the large embedding / answer-head matrices.

The reference is strictly single-GPU (`--gpu_id` only selects a device,
reference exp_clevr/train_clevr_gt_layout.py:5-9; no NCCL/MPI anywhere —
SURVEY.md §2.7). This layer is new capability: a jax.sharding.Mesh with a
'dp' axis (batch) and optional 'tp' axis (vocab/answer dimensions); XLA
inserts the psum/all-gather collectives over ICI from the sharding
annotations — no hand-written communication.

Model sizes here are small (largest tensor: VQA's 17742x300 embedding and
the 3001-way answer head), so TP is optional and PP/SP/EP are deliberately
absent (documented in SURVEY.md §2.7: no self-attention, 45-token
sequences, modules are KB-MB scale and stay replicated)."""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: Optional[int] = None, n_tp: int = 1, devices=None):
    """Build a (dp, tp) mesh. Defaults to all devices on the dp axis."""
    devices = devices if devices is not None else jax.devices()
    if n_dp is None:
        n_dp = len(devices) // n_tp
    devices = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devices, axis_names=("dp", "tp"))


# Parameter paths sharded along tp (regex on '/'-joined path), each with
# a primary spec and an optional fallback spec tried when the primary's
# tp dimension doesn't divide the mesh. Everything else is replicated.
#
# Answer heads get a row-parallel (contraction-dim, Megatron-style)
# fallback because the real VQA answer count is 3001 — PRIME, so
# column-parallel can never divide it; sharding w's input dim instead
# leaves XLA to insert the psum over the partial products.
_TP_RULES = [
    # vocab-dim sharding of the big text embedding: [V, E] -> P('tp', None)
    (re.compile(r"netgen/encoder/embedding/table$"),
     P("tp", None), None),
    # answer heads: [D, num_choices] -> column-parallel P(None, 'tp'),
    # row-parallel P('tp', None) fallback
    (re.compile(r"modules/.*/(fc_scores|fc_eltwise)/w$"),
     P(None, "tp"), P("tp", None)),
    # question-prior net's answer head [500, num_choices], same treatment
    (re.compile(r"qpn/fc2/w$"),
     P(None, "tp"), P("tp", None)),
]


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_shardings(params, mesh: Mesh, use_tp: bool = True):
    """NamedSharding pytree for params: replicated except TP-ruled leaves."""

    def leaf_sharding(path, leaf):
        if use_tp and mesh.shape.get("tp", 1) > 1:
            s = _path_str(path)
            for rule, spec, fallback in _TP_RULES:
                if rule.search(s):
                    # shard on the first spec whose tp dim divides evenly
                    for candidate in (spec, fallback):
                        if candidate is None:
                            continue
                        dim = [i for i, a in enumerate(candidate)
                               if a == "tp"][0]
                        if leaf.shape[dim] % mesh.shape["tp"] == 0:
                            return NamedSharding(mesh, candidate)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def batch_shardings(batch, mesh: Mesh):
    """Shard every batch leaf along dp on its batch axis. Time-major [T, N]
    arrays shard axis 1; batch-major arrays shard axis 0. Heuristic: int32
    2-D arrays named text_seq/gt_layout/tokens are time-major."""
    time_major = {"text_seq", "gt_layout", "tokens"}

    def leaf_sharding(path, leaf):
        name = _path_str(path).split("/")[-1]
        if leaf.ndim == 0:
            return NamedSharding(mesh, P())
        if name in time_major and leaf.ndim >= 2:
            return NamedSharding(mesh, P(None, "dp"))
        return NamedSharding(mesh, P(*(("dp",) + (None,) * (leaf.ndim - 1))))

    return jax.tree_util.tree_map_with_path(leaf_sharding, batch)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with dp sharding."""
    shardings = batch_shardings(batch, mesh)
    return jax.tree_util.tree_map(jax.device_put, batch, shardings)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def host_sharded_batch(local_batch, mesh: Mesh):
    """Multi-host input assembly: each host contributes its process-local
    shard of the global batch (SURVEY.md §2.7: per-host data loading over
    DCN feeding jax.make_array_from_process_local_data). On a single-host
    mesh this reduces to shard_batch."""
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh)
    shardings = batch_shardings(local_batch, mesh)

    def assemble(x, sharding):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(assemble, local_batch, shardings)
