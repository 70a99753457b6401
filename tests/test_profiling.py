"""Profiling utility tests."""

import glob
import os

import jax
import jax.numpy as jnp

from stargcn_tpu.utils.profiling import StepTimer, annotate, trace


def test_trace_writes_events(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        with annotate("bench-step"):
            jax.jit(lambda x: x * 2)(jnp.ones(8)).block_until_ready()
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace output written"


def test_step_timer_stats():
    import time

    t = StepTimer(edges_per_step=1000, examples_per_step=10, window=4)
    t.start()
    for _ in range(6):
        time.sleep(0.001)
        t.tick()
    stats = t.stats()
    assert stats["step_ms"] > 0
    assert stats["edges_per_s"] > 0
    assert len(t._times) == 4  # window bound
