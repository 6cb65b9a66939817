"""Train state: flat-path parameter partitioning + optax state.

Parameters are held as *flat path dicts* (``{"dit.img_in.weight": array}``)
split into ``trainable`` and ``frozen`` — the functional replacement for the
reference's ``requires_grad`` bookkeeping (``train_SigLIP_stage1.py:137-153``).
Gradients are computed only w.r.t. the trainable dict (no wasted backward
through the frozen VAE/tower), and the optimizer state covers exactly the
trainable leaves.  ``materialize`` rebuilds the nested model pytrees inside
the jit trace (pure Python dict work, zero runtime cost).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..weights.torch_io import unflatten_state_dict


def flatten_params(tree: Any, prefix: str = "") -> Dict[str, Any]:
    """Like weights.torch_io.flatten_pytree but keeps leaves as jax arrays."""
    out: Dict[str, Any] = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{path}.{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{path}.{i}" if path else str(i))
        else:
            out[path] = node

    rec(tree, prefix)
    return out


def unflatten_params(flat: Dict[str, Any]) -> Any:
    return unflatten_state_dict(flat)  # generic: works on jax leaves too


@jax.tree_util.register_pytree_node_class
@dataclass
class TrainState:
    trainable: Dict[str, jax.Array]
    frozen: Dict[str, jax.Array]
    opt_state: Any
    step: jax.Array
    # optimizer-maintained int8 weight cache {path: (wq, ws)} for the
    # SwitchBack DiT linears (core.quant.switchback_linear_cached); None when
    # int8 training is off.  Derived state: never checkpointed — rebuilt from
    # the masters via with_quant_cache after create/load.
    quant: Any = None

    def tree_flatten(self):
        return (self.trainable, self.frozen, self.opt_state, self.step,
                self.quant), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def replace(self, **kw) -> "TrainState":
        import dataclasses
        return dataclasses.replace(self, **kw)

    def params(self) -> Any:
        """Nested pytree of all model params (trainable overriding frozen)."""
        return unflatten_params({**self.frozen, **self.trainable})


def partition(modules: Dict[str, Any], trainable_pred: Callable[[str], bool]):
    """modules: {"dit": tree, "clip": tree, ...} -> (trainable_flat, frozen_flat).

    ``trainable_pred`` receives the full flat path (module name prefixed)."""
    flat = flatten_params(modules)
    trainable = {k: v for k, v in flat.items() if trainable_pred(k)}
    frozen = {k: v for k, v in flat.items() if k not in trainable}
    return trainable, frozen


def create_state(modules: Dict[str, Any], trainable_pred, optimizer) -> TrainState:
    trainable, frozen = partition(modules, trainable_pred)
    if not trainable:
        raise ValueError("no trainable parameters matched")
    return TrainState(trainable=trainable, frozen=frozen,
                      opt_state=optimizer.init(trainable),
                      step=jnp.zeros((), jnp.int32))


def apply_gradients(state: TrainState, grads, optimizer) -> TrainState:
    updates, new_opt = optimizer.update(grads, state.opt_state, state.trainable)
    from .optim import _NewParams
    if isinstance(updates, _NewParams):
        # pallas_adamw_clip already produced the new params in-place
        new_trainable = updates.params
        new_quant = updates.quant   # fused int8 emission (may be None)
    else:
        new_trainable = optax.apply_updates(state.trainable, updates)
        new_quant = None
    if state.quant is not None and new_quant is None:
        # cache enabled but the optimizer impl doesn't emit it fused —
        # refresh from the new masters (XLA pass; correct, not free)
        from ..core.quant import quantize_cache
        new_quant = quantize_cache(new_trainable, tuple(state.quant))
    return TrainState(trainable=new_trainable, frozen=state.frozen,
                      opt_state=new_opt, step=state.step + 1,
                      quant=new_quant)


def with_quant_cache(state: TrainState, prefix: str = "dit.") -> TrainState:
    """Fill the int8 SwitchBack weight cache from the current masters
    (create/resume entry point; apply_gradients keeps it fresh afterwards)."""
    from ..core.quant import quantize_cache, switchback_cache_paths
    paths = switchback_cache_paths(state.trainable, prefix)
    if not paths:
        return state
    return state.replace(quant=quantize_cache(state.trainable, paths))


def merged_quant_flat(quant) -> Dict[str, jax.Array]:
    """Flatten the cache to loss-side param keys: ``...weight`` ->
    ``...weight_sb_q`` / ``...weight_sb_scale`` (core.nn.linear dispatch)."""
    out: Dict[str, jax.Array] = {}
    if not quant:
        return out
    for path, (wq, ws) in quant.items():
        stem = path[: -len(".weight")]
        out[stem + ".weight_sb_q"] = wq
        out[stem + ".weight_sb_scale"] = ws
    return out
