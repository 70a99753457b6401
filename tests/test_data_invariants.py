"""Published-dataset invariant gates (round-2 verdict ask #6).

The validator's own logic is tested offline; the real-archive gates run
only when the data is present (zero egress here), so the FIRST
data-present environment executes them automatically.
"""

import os

import pytest

from stargcn_tpu.data.invariants import (GLOVE_DIM, PUBLISHED,
                                         DataInvariantError,
                                         validate_glove, validate_loaded)


def test_validator_accepts_published_counts():
    for name, exp in PUBLISHED.items():
        validate_loaded(name, num_ratings=exp["ratings"],
                        num_users=exp["users"], num_items=exp["items"],
                        num_levels=exp["levels"])


@pytest.mark.parametrize("field,delta", [
    ("num_ratings", -1), ("num_users", 7), ("num_items", -3),
    ("num_levels", 1)])
def test_validator_rejects_any_off_by_one(field, delta):
    exp = PUBLISHED["ml-1m"]
    kw = dict(num_ratings=exp["ratings"], num_users=exp["users"],
              num_items=exp["items"], num_levels=exp["levels"])
    kw[field] += delta
    with pytest.raises(DataInvariantError, match="published"):
        validate_loaded("ml-1m", **kw)


def test_glove_validator():
    import numpy as np
    good = {f"t{i}": np.zeros(GLOVE_DIM) for i in range(3)}
    with pytest.raises(DataInvariantError, match="tokens"):
        validate_glove(good)  # far too few tokens


def _data_dir(name):
    from stargcn_tpu.data.movielens import _DEFAULT_ROOT
    root = os.environ.get("STARGCN_DATA_ROOT", _DEFAULT_ROOT)
    sub = {"ml-100k": "ml-100k", "ml-1m": "ml-1m",
           "ml-10m": "ml-10M100K"}[name]
    return os.path.join(root, sub)


@pytest.mark.parametrize("name", sorted(PUBLISHED))
def test_real_archive_invariants(name):
    """Hard gate on the real archives — runs wherever data is present."""
    if not os.path.isdir(_data_dir(name)):
        pytest.skip(f"real {name} data not present (zero-egress env)")
    from stargcn_tpu.data.movielens import LoadData
    data = LoadData(name, use_inductive=False)
    csr = data.graph[data.name_user, data.name_item]
    validate_loaded(name, num_ratings=csr.nnz, num_users=csr.shape[0],
                    num_items=csr.shape[1],
                    num_levels=len(csr.multi_link))
    if name == "ml-100k":
        # canonical split sizes (u1.base / u1.test)
        test_pairs, _ = data.test_data
        assert test_pairs.shape[1] == PUBLISHED[name]["test_u1"]


def test_real_glove_invariants():
    path = os.environ.get("STARGCN_GLOVE_PATH")
    if not path or not os.path.isfile(path):
        pytest.skip("real GloVe file not present (zero-egress env)")
    from stargcn_tpu.data.movielens import load_glove
    validate_glove(load_glove(path))
