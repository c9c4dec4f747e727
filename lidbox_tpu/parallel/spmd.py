"""
Explicit-collective SPMD training step via shard_map.

The default Trainer relies on GSPMD: batches are sharded, parameters
replicated, and XLA inserts the gradient all-reduce automatically. This
module provides the manually-scheduled alternative — the training step body
runs per-shard under ``jax.experimental.shard_map`` and the gradient/loss
reductions are explicit ``jax.lax.pmean`` over the mesh axis — useful when
you want deterministic control over where collectives happen (e.g. to
overlap them with compute, fuse them with optimizer steps, or extend to
pipeline/tensor axes later).

For deterministic models both paths compute identical updates (tests assert
trajectory equality). Stochastic models (dropout, GaussianNoise) differ by
construction: GSPMD draws one mask over the global batch while this path
draws per-shard masks from shard-distinct keys.
"""
import functools

import jax
import jax.numpy as jnp
import optax
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from lidbox_tpu import parallel
from lidbox_tpu.train.loop import TrainState


def make_shard_map_train_step(model, optimizer, loss_fn, mesh,
                              axis_name=parallel.DATA_AXIS):
    """step(state, batch, rng) -> (new_state, loss) with explicit pmean
    collectives. ``batch`` = {"input": [B, ...], "target": [B]} with B
    divisible by the mesh size; state is replicated."""

    def per_shard_step(state, inputs, targets, rng):
        # Runs with per-device shards; state arrives replicated. The RNG is
        # folded with the shard's mesh position so each shard draws distinct
        # dropout/noise masks over its distinct data shard (replicated keys
        # would correlate regularization noise across the batch).
        step_rng = jax.random.fold_in(rng, state.step)
        step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(axis_name))
        rngs = {"dropout": step_rng, "noise": jax.random.fold_in(step_rng, 1)}

        def compute_loss(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                out, updates = model.module.apply(
                    variables, inputs, train=True, rngs=rngs,
                    mutable=["batch_stats"])
                new_bs = updates["batch_stats"]
            else:
                out = model.module.apply(variables, inputs, train=True,
                                         rngs=rngs)
                new_bs = state.batch_stats
            return jnp.mean(loss_fn(targets, out)), new_bs

        (local_loss, new_bs), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        # Explicit collectives over the data axis: this is where the
        # reference had nothing (no distributed backend, SURVEY.md §2.8)
        # and where NCCL allreduce would sit in a GPU framework.
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(local_loss, axis_name)
        new_bs = jax.lax.pmean(new_bs, axis_name) if new_bs else new_bs
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_bs, opt_state=new_opt_state), loss

    sharded = shard_map(
        per_shard_step, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P()),
        check_rep=False)

    @jax.jit
    def step(state, batch, rng):
        return sharded(state, batch["input"], batch["target"], rng)
    return step
