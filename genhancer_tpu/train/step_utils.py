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


def make_accum_train_step(loss_fn, optimizer, accum_steps: int,
                          accum_dtype=jnp.float32, unroll_below: int = 5):
    """loss_fn(trainable, frozen, micro_batch, key, quant) -> scalar.

    Returns jit'd (state, stacked_batch [accum, ...leaves], key) ->
    (state, metrics).

    ``accum_dtype``: dtype of the gradient accumulator.  float32 (default)
    is the safe choice; ``None`` accumulates in each grad's own dtype —
    for bf16 params that matches torch-DDP-under-bf16 semantics (the
    reference's accumulation path) and halves the accumulator's HBM
    residency (+1.7 GB -> +0.85 GB/1B params), which is what lets
    accum>1 fit next to a full flux-dev step on one 16 GB chip.

    Two lowering strategies, bit-identical math:

    - ``accum_steps < unroll_below``: straight-line Python unroll.  The
      first micro-batch's grads ARE the accumulator (no zeros tree, no
      ``0 + g`` HBM pass a loop would force), later adds fuse into each
      backward's epilogue, and the mean is folded into the loss as a
      ``1/accum`` factor (bf16-exact for power-of-two accum) so no
      separate full-tree scale pass runs before the optimizer.  An
      ``optimization_barrier`` ties each micro-batch's inputs to the
      previous micro-batch's grads: without it XLA schedules micro i's
      forward before micro i-1's backward has retired, keeping two
      micro-batches' residuals live at once and spilling (measured on
      v5e flux-dev accum-2 B=32 int8_full: 411 -> 382 ms/step; the
      barrier is semantically the identity, so math is unchanged).
    - larger ``accum_steps``: ``lax.scan`` — one fwd+bwd HLO instance,
      compile time independent of accum.
    """
    inv = 1.0 / accum_steps

    def micro_grads(state, micro, k):
        # mean-of-microbatches == sum of (loss * inv) grads; scaling the
        # scalar loss is exact in every dtype for power-of-two accum and
        # lets the backward emit pre-scaled grads for free
        return jax.value_and_grad(
            lambda tp: loss_fn(tp, state.frozen, micro, k,
                               state.quant) * inv)(state.trainable)

    if accum_steps < unroll_below:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, stacked_batch, key):
            keys = jax.random.split(key, accum_steps)
            micros = [jax.tree_util.tree_map(lambda x, i=i: x[i], stacked_batch)
                      for i in range(accum_steps)]
            loss_sum, grads = micro_grads(state, micros[0], keys[0])
            if accum_dtype is not None:
                grads = jax.tree_util.tree_map(
                    lambda g: g.astype(accum_dtype), grads)
            for i in range(1, accum_steps):
                grads, micros[i] = jax.lax.optimization_barrier(
                    (grads, micros[i]))
                loss, g = micro_grads(state, micros[i], keys[i])
                loss_sum = loss_sum + loss
                grads = jax.tree_util.tree_map(
                    lambda a, gi: a + gi.astype(a.dtype), grads, g)
            new_state = apply_gradients(state, grads, optimizer)
            return new_state, {"loss": loss_sum,
                               "grad_norm": optax.global_norm(grads)}

        return step

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, stacked_batch, key):
        keys = jax.random.split(key, accum_steps)

        def body(carry, inp):
            grads_acc, loss_acc = carry
            micro, k = inp
            loss, grads = micro_grads(state, micro, k)
            grads_acc = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(a.dtype), grads_acc, grads)
            return (grads_acc, loss_acc + loss), None

        zero = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, accum_dtype or x.dtype),
            state.trainable)
        (grads, loss_sum), _ = jax.lax.scan(body, (zero, 0.0), (stacked_batch, keys))
        new_state = apply_gradients(state, grads, optimizer)
        return new_state, {"loss": loss_sum,
                           "grad_norm": optax.global_norm(grads)}

    return step


def stack_microbatches(batches):
    """List of host batches (array leaves only) -> stacked pytree.

    Microbatches in one accumulation group can disagree at epoch
    boundaries: a padded partial final batch may be smaller than the others
    and may carry a ``valid`` mask the full batches lack.  Normalize before
    stacking — synthesize all-True masks where missing and pad every leaf
    (mask rows False) up to the group's max batch size — so the mask is
    never silently dropped and ``np.stack`` never sees ragged shapes."""
    import numpy as np
    keys = set().union(*(b.keys() for b in batches))
    sizes = [next(iter(b.values())).shape[0] for b in batches]
    bmax = max(sizes)
    ragged = len(set(sizes)) > 1
    need_valid = ragged or any("valid" in b for b in batches)
    norm = []
    for b, n in zip(batches, sizes):
        bb = dict(b)
        if need_valid and "valid" not in bb:
            bb["valid"] = np.ones((n,), bool)
        missing = keys - set(bb) - {"valid"}
        if missing:
            raise ValueError(f"microbatch missing keys {sorted(missing)}")
        if n < bmax:
            for k, v in bb.items():
                pad = np.zeros((bmax - n,) + v.shape[1:], v.dtype)
                bb[k] = np.concatenate([v, pad], axis=0)
        norm.append(bb)
    return {k: np.stack([b[k] for b in norm]) for k in (keys | ({"valid"} if need_valid else set()))}
