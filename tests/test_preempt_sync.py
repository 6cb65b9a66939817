"""Multi-host preemption-stop synchronization (code-review r3 finding).

The SIGTERM flag is host-local; if it gated the loop break directly, hosts
observing the signal at different loop positions would stop at different
step boundaries — one host entering the collective checkpoint gather while
another dispatches the next jit step deadlocks the pod.  Trainer._preempt_stop
must therefore (a) pass the local flag through unchanged single-process,
(b) NEVER let the local flag break a multi-host loop directly, and (c) make
the multi-host decision from a broadcast value at the fixed log_interval
cadence every host shares."""
import types

import jax
import numpy as np

from genhancer_tpu.train.trainer import Trainer


def _host(preempted, log_interval=10):
    t = types.SimpleNamespace(_preempted=preempted, log_interval=log_interval)
    return lambda step: Trainer._preempt_stop(t, step)


class TestPreemptStop:
    def test_single_process_uses_local_flag_any_step(self):
        assert _host(True)(7) is True
        assert _host(False)(7) is False

    def test_multihost_local_flag_never_breaks_directly(self, monkeypatch):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        from jax.experimental import multihost_utils
        calls = []

        def fake_broadcast(x):
            calls.append(int(x))
            return np.int32(0)   # process 0 has not flagged

        monkeypatch.setattr(multihost_utils, "broadcast_one_to_all",
                            fake_broadcast)
        stop = _host(True)       # THIS host saw SIGTERM early
        # off-cadence boundaries: no broadcast, no break
        assert stop(7) is False and not calls
        # cadence boundary: decision comes from the broadcast (proc 0's
        # flag), not the local one — still no break
        assert stop(20) is False and calls == [1]

    def test_multihost_breaks_uniformly_on_broadcast_flag(self, monkeypatch):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        from jax.experimental import multihost_utils
        monkeypatch.setattr(multihost_utils, "broadcast_one_to_all",
                            lambda x: np.int32(1))
        stop = _host(False)      # this host never saw the signal itself
        assert stop(30) is True  # but stops at the shared cadence boundary
        assert stop(31) is False  # and only there
