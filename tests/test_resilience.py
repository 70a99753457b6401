"""Failure detection / elastic recovery (train/resilience.py).

The reference has no resilience apparatus (SURVEY.md §5); these tests
cover the framework additions: device health probe, stall diagnosis,
bounded elastic restart, and the bounded NaN watchdog in Trainer.fit.
"""

import threading
import time

import numpy as np
import pytest

from stargcn_tpu.train.resilience import (ElasticPolicy, ElasticStep,
                                          HeartbeatMonitor,
                                          device_health_check,
                                          dump_all_stacks)


class TestHealthCheck:
    def test_healthy_device(self):
        ok, detail = device_health_check()
        assert ok, detail

    def test_stack_dump_mentions_this_thread(self):
        s = dump_all_stacks()
        assert "test_stack_dump_mentions_this_thread" in s


class TestHeartbeatMonitor:
    def test_detects_stall_and_diagnoses(self):
        reports = []
        mon = HeartbeatMonitor(hang_timeout_s=0.3, poll_s=0.05,
                               log=reports.append)
        with mon:
            mon.beat()
            time.sleep(1.2)          # no beats: a stall episode
        assert mon.stall_episodes == 1
        assert reports and "no step progress" in reports[0]
        # diagnosis includes a device verdict and thread stacks
        assert ("device answers" in reports[0]
                or "device probe FAILED" in reports[0])
        assert "Thread" in reports[0] or "File" in reports[0]

    def test_no_false_positive_while_beating(self):
        reports = []
        mon = HeartbeatMonitor(hang_timeout_s=0.5, poll_s=0.05,
                               log=reports.append)
        stop = threading.Event()

        def beater():
            while not stop.is_set():
                mon.beat()
                time.sleep(0.05)

        t = threading.Thread(target=beater, daemon=True)
        with mon:
            t.start()
            time.sleep(1.0)
            stop.set()
        t.join()
        assert mon.stall_episodes == 0
        assert not reports

    def test_one_diagnosis_per_episode(self):
        reports = []
        mon = HeartbeatMonitor(hang_timeout_s=0.2, poll_s=0.05,
                               log=reports.append)
        with mon:
            time.sleep(0.9)          # one long stall, many polls
        assert mon.stall_episodes == 1
        assert len(reports) == 1

    def test_crash_file_written(self, tmp_path):
        f = tmp_path / "crash.log"
        mon = HeartbeatMonitor(hang_timeout_s=0.2, poll_s=0.05,
                               log=lambda s: None, crash_file=str(f))
        with mon:
            time.sleep(0.7)
        assert f.exists() and "no step progress" in f.read_text()


class TestElasticStep:
    def test_transient_failure_recovers(self):
        calls = {"n": 0, "restores": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("transient")
            return "done"

        es = ElasticStep(ElasticPolicy(max_restarts=3, backoff_s=0.01),
                         on_restore=lambda: calls.__setitem__(
                             "restores", calls["restores"] + 1),
                         log=lambda s: None)
        assert es.run(flaky) == "done"
        assert calls["restores"] == 2
        assert es.restarts == 2

    def test_budget_exhaustion_reraises(self):
        def always_fails():
            raise RuntimeError("fatal")

        es = ElasticStep(ElasticPolicy(max_restarts=2, backoff_s=0.01),
                         log=lambda s: None)
        with pytest.raises(RuntimeError, match="fatal"):
            es.run(always_fails)
        assert es.restarts == 2

    def test_budget_spans_calls(self):
        """The restart budget is per-wrapper (per-run), not per-call."""
        state = {"fail": True}

        def step():
            if state["fail"]:
                state["fail"] = False
                raise RuntimeError("once")
            return 1

        es = ElasticStep(ElasticPolicy(max_restarts=1, backoff_s=0.01),
                         log=lambda s: None)
        assert es.run(step) == 1
        state["fail"] = True
        with pytest.raises(RuntimeError):
            es.run(step)             # budget already spent


class TestTrainerIntegration:
    def _make_trainer(self, tmp_path, max_restarts=2):
        from stargcn_tpu.data.iterators import DataIterator
        from stargcn_tpu.data.synthetic import synthetic_graph
        from stargcn_tpu.models import STARGCNConfig
        from stargcn_tpu.train.loop import Trainer, TrainSettings

        g = synthetic_graph(num_users=15, num_items=12, num_edges=120,
                            seed=3)
        csr = g["user", "movie"]
        pairs = csr.node_pair_ids
        rng = np.random.RandomState(0)
        perm = rng.permutation(pairs.shape[1])
        it = DataIterator(g, "user", "movie",
                          test_node_pairs=pairs[:, perm[:20]],
                          valid_node_pairs=pairs[:, perm[20:40]],
                          embed_P_mask=0.2, seed=0,
                          embed_p_zero=1.0, embed_p_self=0.0)
        cfg = STARGCNConfig(
            num_users=15, num_items=12, num_links=len(csr.multi_link),
            nblocks=1, use_dae=False, embed_units=4, agg_units=(8,),
            out_units=(5,), agg_accum="sum", gcn_dropout=0.0,
            gen_rating_mid_map=4)
        s = TrainSettings(rating_batch_size=16, max_iter=6,
                          log_interval=3, valid_interval=3, lr=1e-2,
                          seed=0, use_dae=False,
                          max_restarts=max_restarts,
                          hang_timeout_s=0)
        return Trainer(cfg, it, s, save_dir=str(tmp_path))

    def test_fit_survives_injected_step_failure(self, tmp_path):
        tr = self._make_trainer(tmp_path)
        orig = tr.train_iteration
        state = {"n": 0}

        def flaky(rb, cb):
            state["n"] += 1
            if state["n"] == 2:
                raise RuntimeError("injected device failure")
            return orig(rb, cb)

        tr.train_iteration = flaky
        result = tr.fit()
        assert np.isfinite(result["best_valid_rmse"])
        assert state["n"] >= 6          # the failed step was retried

    def test_fit_gives_up_past_budget(self, tmp_path):
        tr = self._make_trainer(tmp_path, max_restarts=1)

        def always_fails(rb, cb):
            raise RuntimeError("hard device failure")

        tr.train_iteration = always_fails
        with pytest.raises(RuntimeError, match="hard device failure"):
            tr.fit()
