"""Failure detection and elastic recovery for long training runs.

The reference has NO resilience apparatus (its only retry is the
dataset download loop, ``mxgraph/datasets.py:346-373``); SURVEY.md §5
lists this subsystem as a framework addition.  Production TPU training
fails in a few characteristic ways, each with a distinct detector here:

* **Numerical divergence** (NaN/Inf loss) — detected in ``Trainer.fit``
  every log interval; policy here: restore best checkpoint + halve LR,
  give up after ``max_nan_recoveries`` (repeated divergence means the
  config, not the run, is broken).
* **Device/runtime failure** (wedged tunnel, OOM'd arena, preempted
  chip) — surfaces as an exception from a step dispatch.
  ``ElasticStep`` catches it, runs ``device_health_check`` to decide
  whether the device still answers, restores the last crash-safe
  checkpoint, and resumes — at most ``max_restarts`` times.
* **Silent hangs** (remote-compile stall, deadlocked host thread) —
  no exception ever arrives.  ``HeartbeatMonitor`` watches a
  step-counter heartbeat from a daemon thread and, past
  ``hang_timeout_s``, dumps every Python thread's stack to the log and
  a crash file so the stall is diagnosable post-mortem.  Detection is
  deliberately decoupled from *killing*: on shared dev machines the
  right reaction to a slow remote compile is a diagnostic, not a
  SIGKILL, so the monitor only escalates (callback) and keeps watching.

Multi-host note: recovery of a JAX distributed job requires every
process to restart into ``jax.distributed.initialize`` together; a
single process cannot "rejoin".  The supported flow is: all processes
run under a supervisor (``scripts/multiprocess_train.py`` is the
template), any fatal error exits the process with a non-zero code, the
supervisor relaunches the world, and ``--resume`` restores the latest
checkpoint written by ``Trainer.fit``'s crash-safe ``ckpt_last``.
"""

from __future__ import annotations

import dataclasses
import io
import logging
import threading
import time
import traceback


def device_health_check(timeout_s: float = 60.0) -> tuple[bool, str]:
    """Run a tiny known-answer computation on the default device.

    Returns ``(healthy, detail)``.  A wedged runtime either raises or
    returns garbage; both are reported, never raised — callers decide
    policy.  The probe is small enough (8x8 matmul) to be free, and
    jitted with a fixed shape so repeated checks hit the compile cache.
    """
    try:
        import jax
        import jax.numpy as jnp

        t0 = time.time()
        x = jnp.full((8, 8), 2.0)
        out = jax.jit(lambda a: (a @ a).sum())(x)
        val = float(jax.block_until_ready(out))
        dt = time.time() - t0
        if abs(val - 8 * 8 * 8 * 4.0) > 1e-3:
            return False, f"wrong probe result {val} (in {dt:.1f}s)"
        if dt > timeout_s:
            return False, f"probe took {dt:.1f}s (> {timeout_s}s)"
        return True, f"ok in {dt:.2f}s"
    except Exception as e:  # noqa: BLE001 — any failure = unhealthy
        return False, f"{type(e).__name__}: {e}"


def dump_all_stacks() -> str:
    """Every live Python thread's stack, as a string (hang forensics).

    ``faulthandler`` needs a real file descriptor, so this uses
    ``sys._current_frames`` + ``traceback`` to build the report
    in-memory."""
    import sys

    names = {t.ident: t.name for t in threading.enumerate()}
    buf = io.StringIO()
    for ident, frame in sys._current_frames().items():
        buf.write(f"Thread {names.get(ident, '?')} ({ident}):\n")
        buf.write("".join(traceback.format_stack(frame)))
        buf.write("\n")
    return buf.getvalue()


class HeartbeatMonitor:
    """Detects training-loop stalls from a daemon thread.

    The training loop calls ``beat()`` once per step (or log window).
    If no beat arrives for ``hang_timeout_s``, the monitor logs a
    diagnosis — all thread stacks plus a device health probe — and
    invokes ``on_hang`` (default: just the log).  It keeps watching
    afterwards (one diagnosis per stall episode).
    """

    def __init__(self, hang_timeout_s: float = 600.0, on_hang=None,
                 log=logging.warning, poll_s: float = 5.0,
                 crash_file: str | None = None):
        self.hang_timeout_s = float(hang_timeout_s)
        self.on_hang = on_hang
        self.log = log
        self.poll_s = poll_s
        self.crash_file = crash_file
        self._last_beat = time.monotonic()
        self._beats = 0
        self._stalled = False
        self.stall_episodes = 0
        self._stop = threading.Event()
        self._thread = None

    def beat(self):
        self._last_beat = time.monotonic()
        self._beats += 1
        self._stalled = False

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="stargcn-heartbeat")
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self.poll_s)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
        return False

    def _run(self):
        while not self._stop.wait(self.poll_s):
            silent = time.monotonic() - self._last_beat
            if silent < self.hang_timeout_s or self._stalled:
                continue
            self._stalled = True
            self.stall_episodes += 1
            report = self._diagnose(silent)
            self.log(report)
            if self.crash_file:
                try:
                    with open(self.crash_file, "a") as f:
                        f.write(report + "\n")
                except OSError:
                    pass
            if self.on_hang is not None:
                try:
                    self.on_hang(report)
                except Exception:  # noqa: BLE001 — monitor must survive
                    self.log("on_hang callback raised:\n"
                             + traceback.format_exc())

    def _diagnose(self, silent_s: float) -> str:
        healthy, detail = device_health_check()
        verdict = ("device answers (host-side stall — see stacks)"
                   if healthy else f"device probe FAILED: {detail}")
        return (f"[heartbeat] no step progress for {silent_s:.0f}s "
                f"(beats={self._beats}); {verdict}\n{dump_all_stacks()}")


@dataclasses.dataclass
class ElasticPolicy:
    max_restarts: int = 2
    max_nan_recoveries: int = 3
    backoff_s: float = 5.0


class ElasticStep:
    """Bounded-retry wrapper around a step/dispatch callable.

    ``run(fn, *args)`` executes ``fn``; on exception it probes device
    health, calls ``on_restore`` (reload checkpoint / re-place data),
    backs off, and retries — at most ``policy.max_restarts`` times over
    the wrapper's lifetime, then re-raises.  An unhealthy device is
    re-probed once after backoff (transient tunnel blips recover;
    a dead chip does not — that re-raise is the supervisor's signal).
    """

    def __init__(self, policy: ElasticPolicy = None, on_restore=None,
                 log=logging.warning):
        self.policy = policy or ElasticPolicy()
        self.on_restore = on_restore
        self.log = log
        self.restarts = 0

    def run(self, fn, *args, **kwargs):
        while True:
            try:
                return fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 — policy decides
                if self.restarts >= self.policy.max_restarts:
                    self.log(f"[elastic] giving up after "
                             f"{self.restarts} restarts")
                    raise
                self.restarts += 1
                healthy, detail = device_health_check()
                self.log(f"[elastic] step failed ({type(e).__name__}: "
                         f"{e}); device health: {detail}; "
                         f"restart {self.restarts}/"
                         f"{self.policy.max_restarts}")
                time.sleep(self.policy.backoff_s)
                if not healthy:
                    healthy, detail = device_health_check()
                    if not healthy:
                        self.log("[elastic] device still unhealthy "
                                 f"({detail}); escalating")
                        raise
                if self.on_restore is not None:
                    self.on_restore()
