"""CLI prepare() produces consistent static-shape batches for every model
family on the shipped Clothing-Shoes pickle."""

import numpy as np
import pytest

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.train.cli import prepare

ALL = ["tlsan", "shan", "paca", "atrank", "cnn", "csan", "bilstm", "lspm", "bpr"]


@pytest.fixture(scope="module")
def data_path(reference_data_dir):
    return f"{reference_data_dir}/Clothing_Shoes_and_Jewelry.pkl"


@pytest.mark.parametrize("name", ALL)
def test_prepare_shapes(name, data_path):
    cfg = ModelConfig(model=name,
                      hidden_units=32 if name == "csan" else 64)
    train_b, test_b, cate_list, cfg = prepare(name, data_path, cfg)
    assert cfg.item_count == 1723 and cfg.user_count == 2010
    assert test_b.n == 2010  # one test example per user

    # every array has the same leading dim and ids are in range
    for b in (train_b, test_b):
        for k, v in b.arrays.items():
            assert len(v) == b.n, (name, k)
        if "hist_i" in b.arrays:
            assert b["hist_i"].max() < cfg.item_count
            assert b["hist_i"].min() >= 0
        assert b["i"].max() < cfg.item_count
    assert "j" in test_b.arrays  # (pos, neg) pair for AUC

    if name == "tlsan":
        assert train_b["hist_i"].shape[1] == cfg.Ls == 10
        assert (train_b["sl"] <= 10).all() and (train_b["sl"] >= 1).all()
    if name == "lspm":
        assert train_b["hist_i"].shape[1] == cfg.lspm_k == 5
        # right-aligned: last column nonzero whenever sl>0
        nz = train_b["hist_i"][:, -1] != 0
        assert nz.mean() > 0.9  # id 0 is a real item, so not exactly 1.0
    if name == "cnn":
        assert train_b["hist_i"].shape[1] <= 80  # CNN max_length=80
    if name == "paca":
        assert train_b["hist_i"].shape[1] <= cfg.paca_max_len
