"""Generic train-step assembly: gradient accumulation inside one jit.

The reference accumulates via ``accelerator.accumulate`` with
``gradient_accumulation_steps: 2`` (``train_SigLIP_stage1.py:238``).  Here the
micro-batches arrive stacked on a leading axis and a ``lax.scan`` sums
gradients — one XLA program per optimizer step, no host round-trips between
micro-steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from .state import TrainState, apply_gradients


def make_accum_train_step(loss_fn, optimizer, accum_steps: int):
    """loss_fn(trainable, frozen, micro_batch, key) -> scalar.

    Returns jit'd (state, stacked_batch [accum, ...leaves], key) ->
    (state, metrics)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, stacked_batch, key):
        keys = jax.random.split(key, accum_steps)

        def body(carry, inp):
            grads_acc, loss_acc = carry
            micro, k = inp
            loss, grads = jax.value_and_grad(
                lambda tp: loss_fn(tp, state.frozen, micro, k))(state.trainable)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss), None

        zero = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, jnp.float32), state.trainable)
        (grads, loss_sum), _ = jax.lax.scan(body, (zero, 0.0), (stacked_batch, keys))
        inv = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        new_state = apply_gradients(state, grads, optimizer)
        return new_state, {"loss": loss_sum * inv,
                           "grad_norm": optax.global_norm(grads)}

    return step


def stack_microbatches(batches):
    """List of host batches (array leaves only) -> stacked pytree."""
    import numpy as np
    keys = batches[0].keys()
    return {k: np.stack([b[k] for b in batches]) for k in keys}
