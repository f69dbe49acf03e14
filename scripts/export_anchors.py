"""Validate tools/tf_export.py AGAINST THE REAL REFERENCE GRAPH (VERDICT r4
#1b): every exported Saver checkpoint is restored by the reference's own
``model.restore(sess, path)`` (reference TLSAN/model.py:309-313, via the
unmodified create_model restore branch, TLSAN/train.py:71-76) and evaluated
by the reference's own ``eval_auc`` loop (TLSAN/train.py:86-96) inside the
scratch dirs that scripts/import_anchors.py already built (patched 4-file
reference copy + its dataset.pkl).

Two legs per family:

  roundtrip  — reference ckpt → tf_import → framework ckpt → tf_export →
               reference restore+eval.  The reference-side AUC must equal
               the ORIGINAL logged Eval_AUC (the import anchor), closing
               the loop in both directions with the reference itself as
               the judge.  Runs for all nine families.

  native     — train OUR framework model on Digital_Music (1 epoch), eval
               with OUR evaluator, tf_export the final checkpoint, restore
               it into the reference graph and re-eval there.  |Δ| ≤ tol
               proves a user can train here and keep serving/fine-tuning
               with the reference TF stack — the actual migration story.

Matrix-queue semantics: FAILED marker written before each leg, skip-if-ok,
--retry-failed, summary.json aggregated from ALL jsons on disk.

Usage:
  python scripts/export_anchors.py [--families tlsan,shan,bpr,...]
      [--native_families tlsan,shan,bpr] [--tol 0.003]
Writes runs/ref_tf/export_anchors/<fam>_{roundtrip,native}.json + summary.
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ANCHORS = os.path.join(REPO, "runs", "ref_tf", "import_anchors")

# (our name, reference dir name) — scratch dirs under import_anchors/
FAMILIES = [
    ("bpr", "BPR"),
    ("shan", "SHAN"),
    ("lspm", "LSPM"),
    ("paca", "PACA"),
    ("atrank", "ATRank"),
    ("tlsan", "TLSAN"),
    ("csan", "CSAN"),
    ("bilstm", "Bi-LSTM"),
    ("cnn", "CNN"),
]


def run(cmd, cwd=None, timeout=900, env=None):
    r = subprocess.run(cmd, cwd=cwd, timeout=timeout, capture_output=True,
                       text=True, env=env)
    return r


def last_json(text):
    for line in reversed(text.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def tf_export(fam, ckpt_dir, out_prefix, timeout=300):
    """Run tf_export in a fresh process (TF import kept out of this one)."""
    os.makedirs(os.path.dirname(out_prefix), exist_ok=True)
    r = run([sys.executable, "-m", "tlsan_tpu.tools.tf_export",
             "--model", fam, "--ckpt", ckpt_dir, "--out", out_prefix],
            cwd=REPO, timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(f"tf_export failed: "
                           f"{(r.stderr or r.stdout)[-1500:]}")
    return r.stdout.strip()


def ref_restore_eval(fam, ref_name, export_dir, timeout=900):
    """Spawn ref_restore_eval.py with cwd = the family's scratch dir."""
    scratch = os.path.join(ANCHORS, f"{ref_name}_Digital_Music")
    if not os.path.isdir(scratch):
        raise RuntimeError(f"no scratch dir {scratch} — run "
                           f"scripts/import_anchors.py first")
    # same env the reference training itself needs (scripts/ref_tf_run.py):
    # legacy keras for tf.compat.v1.layers.*, CPU-quiet TF
    env = dict(os.environ, JAX_PLATFORMS="cpu", TF_CPP_MIN_LOG_LEVEL="3",
               TF_USE_LEGACY_KERAS="1")
    r = run([sys.executable, os.path.join(REPO, "scripts",
                                          "ref_restore_eval.py"),
             "--family", fam, "--ckpt_dir", export_dir],
            cwd=scratch, timeout=timeout, env=env)
    if r.returncode != 0:
        raise RuntimeError(f"ref restore+eval failed: "
                           f"{(r.stderr or r.stdout)[-1500:]}")
    out = last_json(r.stdout)
    if out is None:
        raise RuntimeError(f"no JSON from ref_restore_eval: "
                           f"{r.stdout[-500:]}")
    return out


def leg_roundtrip(fam, ref_name, workdir, tol):
    """reference ckpt → import → export → reference restore+eval."""
    t0 = time.time()
    anchor = json.load(open(os.path.join(ANCHORS, f"{fam}_import.json")))
    imported_dir = os.path.join(ANCHORS, f"imported_{fam}")
    out_prefix = os.path.join(workdir, f"export_roundtrip_{fam}", fam)
    tf_export(fam, imported_dir, out_prefix)
    ref = ref_restore_eval(fam, ref_name, os.path.dirname(out_prefix))
    delta = ref["ref_auc"] - anchor["ref_logged_auc"]
    row = {"family": fam, "leg": "roundtrip",
           "source_ckpt": anchor["ckpt"], "step": anchor["step"],
           "ref_logged_auc": anchor["ref_logged_auc"],
           "ref_restored_auc": ref["ref_auc"],
           "restored_step": ref["restored_step"],
           "n_test": ref["n_test"], "delta": round(delta, 4),
           "ok": abs(delta) <= tol
                 and (ref["restored_step"] in (anchor["step"], None)),
           "wall_s": round(time.time() - t0, 1)}
    return row


def our_final_eval(model_dir):
    """(step, auc) of the trainer's unconditional final save, from the
    metrics JSONL 'final' record (written at the same step as the save —
    train/loop.py:632-637)."""
    recs = [json.loads(l) for l in
            open(os.path.join(model_dir, "metrics.jsonl"))]
    finals = [r for r in recs if r.get("kind") == "final"]
    assert finals, "no final eval record"
    return finals[-1]["step"], finals[-1]["auc"]


def leg_native(fam, ref_name, workdir, tol, train_timeout=1200):
    """train ours → export final ckpt → reference restore+eval."""
    t0 = time.time()
    model_dir = os.path.join(workdir, f"native_{fam}")
    r = run([sys.executable, "-m", "tlsan_tpu.train.cli",
             "--model", fam, "--dataset", "Digital_Music",
             "--data_dir", "/root/reference/Data",
             "--model_dir", model_dir, "--max_epochs", "1",
             "--from_scratch", "--no_histograms"],
            cwd=REPO, timeout=train_timeout)
    if r.returncode != 0:
        raise RuntimeError(f"framework training failed: "
                           f"{(r.stderr or r.stdout)[-1500:]}")
    step, our_auc = our_final_eval(model_dir)
    out_prefix = os.path.join(workdir, f"export_native_{fam}", fam)
    tf_export(fam, model_dir, out_prefix)
    ref = ref_restore_eval(fam, ref_name, os.path.dirname(out_prefix))
    delta = ref["ref_auc"] - our_auc
    row = {"family": fam, "leg": "native", "trained_steps": step,
           "our_auc": round(our_auc, 6),
           "ref_restored_auc": ref["ref_auc"],
           "restored_step": ref["restored_step"],
           "n_test": ref["n_test"], "delta": round(delta, 4),
           "ok": abs(delta) <= tol,
           "wall_s": round(time.time() - t0, 1)}
    return row


def write_summary(workdir, tol):
    """Aggregate from ALL per-leg jsons on disk (never in-memory rows)."""
    rows = []
    for path in sorted(glob.glob(os.path.join(workdir, "*_*.json"))):
        if os.path.basename(path) == "summary.json":
            continue
        rows.append(json.load(open(path)))
    summary = {"tol": tol, "ok": sum(1 for r in rows if r.get("ok")),
               "total": len(rows), "rows": rows}
    json.dump(summary, open(os.path.join(workdir, "summary.json"), "w"),
              indent=2)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(f for f, _ in FAMILIES))
    ap.add_argument("--native_families", default="tlsan,shan,bpr")
    ap.add_argument("--workdir",
                    default=os.path.join(REPO, "runs", "ref_tf",
                                         "export_anchors"))
    ap.add_argument("--tol", type=float, default=0.003)
    ap.add_argument("--retry-failed", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    wanted = set(args.families.split(","))
    native = set(args.native_families.split(",")) if args.native_families \
        else set()
    legs = [(fam, ref, "roundtrip", leg_roundtrip)
            for fam, ref in FAMILIES if fam in wanted]
    legs += [(fam, ref, "native", leg_native)
             for fam, ref in FAMILIES if fam in native]

    for fam, ref_name, leg, fn in legs:
        out_json = os.path.join(args.workdir, f"{fam}_{leg}.json")
        if os.path.exists(out_json):
            prev = json.load(open(out_json))
            if prev.get("ok") or not args.retry_failed:
                print(f"[export_anchors] skip {fam}/{leg} "
                      f"(exists, ok={prev.get('ok')})", flush=True)
                continue
            print(f"[export_anchors] retry {fam}/{leg}", flush=True)
        json.dump({"family": fam, "leg": leg, "ok": False,
                   "error": "FAILED: harness interrupted mid-leg"},
                  open(out_json, "w"), indent=2)
        try:
            row = fn(fam, ref_name, args.workdir, args.tol)
        except Exception as e:
            row = {"family": fam, "leg": leg, "ok": False,
                   "error": f"FAILED: {type(e).__name__}: {e}"}
        json.dump(row, open(out_json, "w"), indent=2)
        print(f"[export_anchors] {fam}/{leg}: "
              f"{json.dumps({k: row.get(k) for k in ('ref_logged_auc', 'our_auc', 'ref_restored_auc', 'delta', 'ok', 'error')})}",
              flush=True)
        write_summary(args.workdir, args.tol)

    summary = write_summary(args.workdir, args.tol)
    print(json.dumps({k: summary[k] for k in ("ok", "total")}))


if __name__ == "__main__":
    main()
