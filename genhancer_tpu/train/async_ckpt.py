"""Asynchronous checkpoint writing (VERDICT r1 #6).

The reference's ``accelerator.save``/``torch.save`` calls block the training
loop for the full device→host fetch + serialization + disk write of ~GBs of
state (``/root/reference/Continuous/train_SigLIP_stage1.py:284-300``); on a
v5e step measured at ~0.27 s that is many lost steps per save.  Here the
step loop pays only the device→host fetch — all leaves' transfers are
started asynchronously first (``copy_to_host_async``) so they overlap each
other — and the expensive part (torch-format serialization + disk write)
runs on a single background writer thread over the host snapshot.

The snapshot MUST be taken on the caller thread before returning: the jitted
train step donates the state buffers, so device arrays captured by a closure
would be deleted by the very next step (``Array has been deleted``).  Host
numpy arrays have no such lifetime hazard.

Ordering/robustness:
  * at most one save is in flight — a new save first drains the previous one
    (bounded memory: never more than one host snapshot alive);
  * exceptions in the writer surface on the next ``save()``/``wait()`` call;
  * ``wait()``/``close()`` drain everything — the trainer drains before
    returning, so e2e semantics (files exist when ``train()`` returns) are
    unchanged;
  * multi-host: only process 0 calls this (trainer gates on ``is_main``);
    parameters are DP-replicated, so the fetch reads the host-local replica
    without cross-host traffic.
"""

from __future__ import annotations

import logging
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, Optional

import jax
import numpy as np

log = logging.getLogger("genhancer_tpu.trainer")


def host_snapshot(tree):
    """Fetch every array leaf to host numpy.

    Starts all device→host copies asynchronously first so the per-leaf
    ``np.asarray`` waits overlap; returns the same pytree structure with
    numpy leaves (non-array leaves pass through).

    Multi-host sharded leaves (ZeRO-1 optimizer moments): ``np.asarray``
    only works on fully-addressable or fully-replicated arrays, so those go
    through ``multihost_utils.process_allgather`` — which is COLLECTIVE:
    every process must call host_snapshot on the same tree (the trainer
    does, before gating the write on process 0).
    """
    tree = gather_sharded(tree)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for leaf in leaves:
        start = getattr(leaf, "copy_to_host_async", None)
        if start is not None:
            start()
    host = [np.asarray(l) if isinstance(l, jax.Array) else l for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, host)


def gather_sharded(tree):
    """Replace every NON-locally-fetchable leaf (multi-host sharded, e.g.
    ZeRO-1 moments) with its gathered host value, leaving fetchable leaves
    untouched.  COLLECTIVE: all processes must call this with the same tree
    — and it is the ONLY part of a checkpoint snapshot non-main processes
    need to run (they skip the d2h fetch of replicated params entirely).
    All sharded leaves gather in ONE process_allgather call, not one
    dispatch + collective per leaf."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    idx = [i for i, l in enumerate(leaves)
           if isinstance(l, jax.Array) and not _locally_fetchable(l)]
    if idx:
        from jax.experimental import multihost_utils
        gathered = multihost_utils.process_allgather(
            tuple(leaves[i] for i in idx), tiled=True)
        for i, g in zip(idx, gathered):
            leaves[i] = np.asarray(g)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _locally_fetchable(leaf) -> bool:
    return bool(getattr(leaf, "is_fully_addressable", True)
                or getattr(leaf, "is_fully_replicated", True))


class AsyncCheckpointer:
    """Run checkpoint-write closures on a background thread.

    ``save(state, write_fn)`` snapshots ``state`` to host numpy on the
    calling thread and schedules ``write_fn(snapshot)`` on the writer
    thread.  Synchronous mode (``enabled=False``) runs it inline — the
    ``async_checkpointing: false`` config knob.
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._exec: Optional[ThreadPoolExecutor] = None
        self._inflight: Optional[Future] = None
        self._lock = threading.Lock()

    def save(self, state, write_fn: Callable[[object], None]) -> None:
        if not self.enabled:
            write_fn(state)
            return
        with self._lock:
            if self._exec is None:
                self._exec = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="ckpt-writer")
            self._drain_locked()
            snapshot = host_snapshot(state)
            self._inflight = self._exec.submit(write_fn, snapshot)

    def wait(self) -> None:
        """Block until the in-flight save (if any) is fully written."""
        with self._lock:
            self._drain_locked()

    def close(self) -> None:
        self.wait()
        with self._lock:
            if self._exec is not None:
                self._exec.shutdown(wait=True)
                self._exec = None

    def _drain_locked(self) -> None:
        if self._inflight is not None:
            fut, self._inflight = self._inflight, None
            fut.result()  # re-raises writer exceptions in the step loop
