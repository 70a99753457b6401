"""Config system, logging, and model-info utility tests."""

import logging
import os

import numpy as np
import pytest
import yaml

from stargcn_tpu.utils import (
    EasyDict,
    MetricLogger,
    cfg_from_file,
    default_cfg,
    logging_config,
    merge_cfg,
    save_cfg_dir,
)
from stargcn_tpu.utils.model_info import (
    model_info,
    parse_devices,
    total_param_num,
)


def test_easydict_attr_access():
    d = EasyDict()
    d.A = {"B": {"C": 1}}
    assert d.A.B.C == 1
    d.A.B.C = 2
    assert d["A"]["B"]["C"] == 2


def test_merge_unknown_key_raises():
    cfg = default_cfg()
    with pytest.raises(KeyError, match="BOGUS"):
        merge_cfg({"TRAIN": {"BOGUS": 1}}, cfg)


def test_merge_type_mismatch_raises():
    cfg = default_cfg()
    with pytest.raises(TypeError):
        merge_cfg({"TRAIN": {"LR": "fast"}}, cfg)


def test_merge_int_into_float_ok():
    cfg = default_cfg()
    merge_cfg({"TRAIN": {"LR": 1}}, cfg)
    assert cfg.TRAIN.LR == 1


def test_cfg_roundtrip(tmp_path):
    cfg = default_cfg()
    cfg.TRAIN.LR = 0.123
    rid0 = save_cfg_dir(str(tmp_path), cfg)
    rid1 = save_cfg_dir(str(tmp_path), cfg)
    assert (rid0, rid1) == (0, 1)
    loaded = cfg_from_file(str(tmp_path / "cfg0.yml"))
    assert loaded.TRAIN.LR == 0.123


def test_load_latest_cfg(tmp_path):
    """Picks the HIGHEST-numbered snapshot (the reference's version
    crashes on the second snapshot, config.py:99)."""
    from stargcn_tpu.utils import load_latest_cfg

    cfg = default_cfg()
    cfg.TRAIN.LR = 0.111
    save_cfg_dir(str(tmp_path), cfg)
    cfg.TRAIN.LR = 0.222
    save_cfg_dir(str(tmp_path), cfg)
    cfg.TRAIN.LR = 0.333
    save_cfg_dir(str(tmp_path), cfg)
    loaded = load_latest_cfg(str(tmp_path))
    assert loaded.TRAIN.LR == 0.333
    os.makedirs(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        load_latest_cfg(str(tmp_path / "empty"))


def test_metric_logger(tmp_path):
    path = str(tmp_path / "m.csv")
    lg = MetricLogger(["iter", "x"], ["%d", "%.2f"], path)
    lg.log(iter=1, x=0.5)
    lg.log(iter=2, x=1.25)
    lg.close()
    with open(path) as f:
        lines = f.read().strip().split("\n")
    assert lines == ["iter,x", "1,0.50", "2,1.25"]


def test_logging_config(tmp_path):
    logpath = logging_config(str(tmp_path), name="t", no_console=True)
    logging.info("hello-metric")
    with open(logpath) as f:
        assert "hello-metric" in f.read()
    # reset handlers so later tests aren't redirected
    logging.getLogger().handlers.clear()


def test_model_info(tmp_path):
    params = {"enc": {"w": np.zeros((2, 3))}, "b": np.zeros(4)}
    assert total_param_num(params) == 10
    path = str(tmp_path / "net.txt")
    text = model_info(params, save_path=path)
    assert "Total #Params: 10" in text
    assert os.path.exists(path)


def test_parse_devices():
    devs = parse_devices("cpu0")
    assert len(devs) == 1
    assert parse_devices("all")
