"""Checkpoint migration round-trip: params → reference-named TF variables →
params (tools/tf_import.py + tf_export.py).

The exporters/converters encode the reference graphs' variable names
(per-family model.py get_variable scopes); the round-trip proves the two
maps are exact inverses over the real param trees of all nine families.
The TF-backed tests additionally prove the on-disk format is a genuine
``tf.train.Saver`` checkpoint (written and re-read through TF itself,
with optimizer slot variables skipped the way reference checkpoints
carry them).
"""

import numpy as np
import pytest

import jax

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.models import get_model
from tlsan_tpu.tools import tf_import
from tlsan_tpu.tools.tf_import import (_Vars, to_params, to_tf_vars,
                                       validate_tree)

FAMILIES = ["tlsan", "atrank", "shan", "bpr", "lspm", "paca",
            "cnn", "bilstm", "csan"]


def _tiny_params(model_name, seed=0):
    cfg = ModelConfig(model=model_name, user_count=5, item_count=7,
                      cate_count=3)
    params = get_model(model_name).init_params(jax.random.PRNGKey(seed), cfg)
    return jax.tree_util.tree_map(np.asarray, params), cfg


@pytest.mark.parametrize("model_name", FAMILIES)
def test_export_import_roundtrip(model_name):
    params, cfg = _tiny_params(model_name)
    tf_vars = to_tf_vars(model_name, params)
    back, hints = to_params(model_name, tf_vars)

    assert (jax.tree_util.tree_structure(back)
            == jax.tree_util.tree_structure(params))
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(back)[0],
            jax.tree_util.tree_flatten_with_path(params)[0]):
        assert a.shape == b.shape, jax.tree_util.keystr(path)
        np.testing.assert_array_equal(a, b, err_msg=jax.tree_util.keystr(path))

    # shape-derived config hints are right (counts + embedding widths)
    for key, want in (("user_count", cfg.user_count),
                      ("item_count", cfg.item_count),
                      ("cate_count", cfg.cate_count)):
        if key in hints:
            assert hints[key] == want
    assert hints.get("item_count") == cfg.item_count  # every family has items

    # and the imported tree matches init_params structure/shape exactly
    validate_tree(model_name, back, hints)


def test_unconsumed_variable_rejected():
    params, _ = _tiny_params("shan")
    tf_vars = to_tf_vars("shan", params)
    tf_vars["mystery_tower/W"] = np.zeros((2, 2), np.float32)
    with pytest.raises(SystemExit, match="NOT.*consumed"):
        to_params("shan", tf_vars)


def test_missing_variable_rejected():
    params, _ = _tiny_params("shan")
    tf_vars = to_tf_vars("shan", params)
    del tf_vars["layer2_w"]
    with pytest.raises(KeyError, match="layer2_w"):
        to_params("shan", tf_vars)


def test_wrong_family_rejected():
    params, _ = _tiny_params("lspm")
    tf_vars = to_tf_vars("lspm", params)
    with pytest.raises(KeyError):  # shan's map asks for item_emb (not _w)
        to_params("shan", tf_vars)


def test_vars_accessor_tracks_consumption():
    g = _Vars({"a": np.zeros(1), "b": np.ones(1)})
    g("a")
    assert g.has("b") and g.unused() == ["b"]


def test_tf_saver_roundtrip(tmp_path):
    """Write through tf.train.Saver, read back through the real reader —
    values, step, counter handling, and slot-variable skipping."""
    pytest.importorskip("tensorflow")
    params, _ = _tiny_params("shan", seed=3)
    tf_vars = to_tf_vars("shan", params)
    # a reference checkpoint trained with Adam also carries slot variables
    # (TLSAN/model.py:185-205) — the importer must drop them
    with_slots = dict(tf_vars)
    with_slots["item_emb/Adam"] = np.zeros_like(tf_vars["item_emb"])
    with_slots["beta1_power"] = np.float32(0.9)

    prefix = tf_import.write_tf_checkpoint(
        str(tmp_path / "shan"), with_slots, step=41, epoch=2)
    got, step = tf_import.read_tf_checkpoint(prefix)
    assert step == 41
    assert set(got) == set(tf_vars)  # slots + counters dropped
    for name in tf_vars:
        np.testing.assert_array_equal(got[name], tf_vars[name], err_msg=name)

    back, hints = to_params("shan", got)
    validate_tree("shan", back, hints)


def test_import_cli_writes_framework_checkpoint(tmp_path):
    """tf_import.main end-to-end (no --eval): TF checkpoint in, loadable
    framework checkpoint + sidecar out."""
    pytest.importorskip("tensorflow")
    from tlsan_tpu.train import checkpoint as ckpt
    from tlsan_tpu.train.state import make_optimizer
    from tlsan_tpu.core.config import TrainConfig

    params, cfg = _tiny_params("bilstm", seed=5)
    prefix = tf_import.write_tf_checkpoint(
        str(tmp_path / "bilstm"), to_tf_vars("bilstm", params), step=17)

    out = str(tmp_path / "imported")
    tf_import.main(["--model", "bilstm", "--ckpt", prefix, "--out", out])

    path = ckpt.latest_checkpoint(out)
    assert path and path.endswith("bilstm-17.ckpt")
    template = get_model("bilstm").init_params(jax.random.PRNGKey(0), cfg)
    opt_template = make_optimizer(TrainConfig()).init(template)
    step, restored, _ = ckpt.restore(path, template, opt_template)
    assert step == 17
    for (pth, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(restored)[0],
            jax.tree_util.tree_flatten_with_path(params)[0]):
        np.testing.assert_allclose(a, b, err_msg=jax.tree_util.keystr(pth))


def test_export_cli_from_framework_dir(tmp_path):
    """tf_export.main: framework model_dir → TF checkpoint the importer
    reads back identically (full both-ways loop on disk)."""
    pytest.importorskip("tensorflow")
    from tlsan_tpu.tools import tf_export
    from tlsan_tpu.train import checkpoint as ckpt
    from tlsan_tpu.train.state import make_optimizer
    from tlsan_tpu.core.config import TrainConfig

    params, cfg = _tiny_params("tlsan", seed=9)
    opt_state = make_optimizer(TrainConfig()).init(params)
    mdir = str(tmp_path / "mdir")
    ckpt.save(mdir, "tlsan", 23, params, opt_state, cfg, best=True)

    prefix = tf_export.main(["--model", "tlsan", "--ckpt", mdir,
                             "--out", str(tmp_path / "tf" / "tlsan")])
    got, step = tf_import.read_tf_checkpoint(prefix)
    assert step == 23
    back, hints = to_params("tlsan", got)
    assert hints["Ls"] == cfg.Ls and hints["num_blocks"] == cfg.num_blocks
    for (pth, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(back)[0],
            jax.tree_util.tree_flatten_with_path(params)[0]):
        np.testing.assert_allclose(a, np.asarray(b),
                                   err_msg=jax.tree_util.keystr(pth))
