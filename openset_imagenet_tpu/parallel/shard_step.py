"""Explicit-collective training step via shard_map (per-device BN stats).

The default engine path jits one global-batch program and lets GSPMD place
collectives (``train.make_train_step``).  This module provides the
alternative SPMD formulation: the step body runs per device on its local
batch shard with explicit ``psum``/``pmean`` collectives.  Two reasons to
choose it on multi-chip meshes:

* **Per-device batch-norm statistics** — each chip normalizes with its own
  local rows, exactly torch's (non-Sync) BN semantics that the reference
  training has (reference ``train.py:125``), and the data-dependent stats
  broadcast that global-batch BN needs disappears from the step.
  Running averages are ``pmean``-ed so the replicated-state invariant
  holds (the reference keeps replica-0 stats; the mean is as faithful).
* **Deterministic collective schedule** — gradients all-reduce with one
  explicit ``psum`` over the ``data`` axis, riding ICI.

Loss weighting stays exact: each device computes ``(mean_d, w_d)`` from
its mask-aware loss, contributes ``mean_d * w_d`` and ``w_d`` to global
psums, and gradients are the psum of per-device sum-gradients divided by
the global weight — identical to the single-program global mean.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import batch_sharding, replicated


def make_train_step_shard_map(loss_fn: Callable, mesh,
                              axis: str = "data") -> Callable:
    """Compile a per-device train step with explicit collectives."""
    from jax import shard_map  # public API (jax>=0.6); was jax.experimental

    def per_device(state, images, labels, mask):
        from ..train import _to_float  # one source of ToTensor parity
        imgs = _to_float(images)

        def local_loss_sum(params):
            (logits, _), mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"])
            mean, w = loss_fn(logits, labels, mask)
            return mean * w, (mutated["batch_stats"], w)

        (loss_sum, (batch_stats, w)), grads = jax.value_and_grad(
            local_loss_sum, has_aux=True)(state.params)

        # Global weight + gradient all-reduce: grad of the global mean.
        w_global = jax.lax.psum(w, axis)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, axis) / jnp.maximum(w_global, 1e-12),
            grads)
        # Per-device stats normalized the batch; running averages are
        # averaged so the replicated state stays identical everywhere.
        batch_stats = jax.tree.map(lambda x: jax.lax.pmean(x, axis),
                                   batch_stats)
        loss_sum_global = jax.lax.psum(loss_sum, axis)

        new_state = state.apply_gradients(grads, batch_stats)
        # Tracker contract (same as the GSPMD step): weight by batch ROWS,
        # not by the criterion's own normalizer (garbage's w is a
        # class-weight sum — wrong unit for imgs/sec and loss averaging).
        rows = jax.lax.psum(jnp.sum(mask), axis)
        mean_global = loss_sum_global / jnp.maximum(w_global, 1e-12)
        return new_state, {"loss_sum": mean_global * rows, "count": rows}

    state_spec = P()  # replicated pytree
    data_spec = P(axis)
    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(state_spec, data_spec, data_spec, data_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False)  # optimizer update is replicated by construction

    return jax.jit(sharded, donate_argnums=(0,))


def place_for_shard_map(state, batch, mesh):
    """Convenience: replicate the state, shard the batch over ``data``."""
    rep = replicated(mesh)
    sh = batch_sharding(mesh)
    return (jax.device_put(state, rep),
            tuple(jax.device_put(x, sh) for x in batch))
