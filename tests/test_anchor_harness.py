"""Bookkeeping semantics of the anchor harnesses (VERDICT r4 #5): summaries
aggregate from ALL per-leg jsons on disk (never one invocation's in-memory
rows — the round-4 stale-summary bug), FAILED markers are visible rows, and
the synth-scale shape presets match the reference's published statistics
(reference README.md:18-23)."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_import_summary_aggregates_from_disk(tmp_path):
    ia = _load("ia", os.path.join(REPO, "scripts", "import_anchors.py"))
    # two family jsons on disk, one ok, one FAILED marker
    json.dump({"family": "shan", "ok": True, "delta": 0.0},
              open(tmp_path / "shan_import.json", "w"))
    json.dump({"family": "cnn", "ok": False,
               "error": "FAILED: harness interrupted mid-family"},
              open(tmp_path / "cnn_import.json", "w"))
    s = ia.write_summary(str(tmp_path), "Digital_Music", 0.003)
    assert s["total"] == 2 and s["ok"] == 1
    # the failure is a visible row, not a silent hole
    errs = [r for r in s["rows"] if not r.get("ok")]
    assert errs and errs[0]["error"].startswith("FAILED")
    # and the file on disk matches the return value
    on_disk = json.load(open(tmp_path / "summary.json"))
    assert on_disk == s


def test_export_summary_aggregates_both_legs(tmp_path):
    ea = _load("ea", os.path.join(REPO, "scripts", "export_anchors.py"))
    json.dump({"family": "tlsan", "leg": "roundtrip", "ok": True,
               "delta": 0.0}, open(tmp_path / "tlsan_roundtrip.json", "w"))
    json.dump({"family": "tlsan", "leg": "native", "ok": True,
               "delta": -0.0}, open(tmp_path / "tlsan_native.json", "w"))
    json.dump({"family": "csan", "leg": "roundtrip", "ok": False,
               "error": "FAILED: x"},
              open(tmp_path / "csan_roundtrip.json", "w"))
    s = ea.write_summary(str(tmp_path), 0.003)
    assert s["total"] == 3 and s["ok"] == 2
    # regenerating after another leg lands picks it up (disk is the truth)
    json.dump({"family": "csan", "leg": "roundtrip", "ok": True,
               "delta": 0.0}, open(tmp_path / "csan_roundtrip.json", "w"))
    assert ea.write_summary(str(tmp_path), 0.003)["ok"] == 3


def test_synth_shape_presets_match_published_statistics():
    ss = _load("ss", os.path.join(REPO, "scripts", "synth_scale.py"))
    # reference README.md:18-23 (users, items, categories, behaviors/user)
    assert ss.SHAPES["electronics"] == dict(users=39_991, items=22_048,
                                            cates=673, mean_reviews=14)
    assert ss.SHAPES["cds_vinyl"] == dict(users=24_179, items=27_602,
                                          cates=310, mean_reviews=19)
    assert ss.SHAPES["movies_tv"] == dict(users=35_896, items=28_589,
                                          cates=15, mean_reviews=26)
