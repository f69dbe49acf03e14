"""Packed-dataset cache (data/cache.py): parity vs a fresh build, hit
skips the build entirely, key invalidation on shape-config change."""

import numpy as np
import pytest

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.data import cache as dcache
from tlsan_tpu.train import cli

DATA = "/root/reference/Data/Clothing_Shoes_and_Jewelry.pkl"


@pytest.fixture()
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("TLSAN_DATA_CACHE", str(tmp_path / "cache"))
    return tmp_path


@pytest.mark.parametrize("model_name", ["tlsan", "lspm", "bpr"])
def test_cached_equals_fresh(cache_env, model_name):
    cfg = ModelConfig(model=model_name)
    fresh = cli.prepare(model_name, DATA, cfg, use_cache=False)
    miss = cli.prepare(model_name, DATA, cfg, use_cache=True)   # builds+stores
    hit = cli.prepare(model_name, DATA, cfg, use_cache=True)    # loads
    for got in (miss, hit):
        assert got[0].n == fresh[0].n and got[1].n == fresh[1].n
        for k, v in fresh[0].arrays.items():
            np.testing.assert_array_equal(np.asarray(got[0].arrays[k]), v, err_msg=k)
        for k, v in fresh[1].arrays.items():
            np.testing.assert_array_equal(np.asarray(got[1].arrays[k]), v, err_msg=k)
        np.testing.assert_array_equal(got[2], fresh[2])
        assert got[3] == fresh[3]


def test_cache_hit_skips_build(cache_env, monkeypatch):
    cfg = ModelConfig(model="tlsan")
    cli.prepare("tlsan", DATA, cfg, use_cache=True)  # warm

    def boom(*a, **k):
        raise AssertionError("cache hit must not rebuild")

    monkeypatch.setattr(cli, "_prepare_uncached", boom)
    out = cli.prepare("tlsan", DATA, cfg, use_cache=True)
    assert out[0].n > 0


def test_cache_hit_keeps_caller_hyperparams(cache_env):
    """A hit must merge only build-derived fields (counts/Ls/Ts/max_length)
    into the CALLER's cfg: non-shape hyperparameters (dropout, hidden_units,
    ...) are not in the cache key, so returning the stored cfg wholesale
    would silently train with stale hyperparameters (ADVICE r2, high)."""
    import dataclasses
    cfg = ModelConfig(model="tlsan")
    cli.prepare("tlsan", DATA, cfg, use_cache=True)  # warm with defaults
    cfg2 = dataclasses.replace(cfg, dropout=0.3, hidden_units=128,
                               num_heads=4, regulation_rate=1e-3)
    _, _, _, got = cli.prepare("tlsan", DATA, cfg2, use_cache=True)  # hit
    assert got.dropout == 0.3 and got.hidden_units == 128
    assert got.num_heads == 4 and got.regulation_rate == 1e-3
    assert got.item_count > 0 and got.user_count > 0  # build-derived merged


def test_cache_key_sensitivity(cache_env):
    cfg = ModelConfig(model="tlsan")
    p1 = dcache.cache_path("tlsan", DATA, cfg, 1234)
    assert p1 != dcache.cache_path("tlsan", DATA, cfg, 42)          # seed
    assert p1 != dcache.cache_path("shan", DATA, cfg, 1234)         # model
    import dataclasses
    cfg2 = dataclasses.replace(cfg, Ls=20)
    assert p1 != dcache.cache_path("tlsan", DATA, cfg2, 1234)       # shape
    # same inputs → same key (fingerprint is deterministic)
    assert p1 == dcache.cache_path("tlsan", DATA, cfg, 1234)
