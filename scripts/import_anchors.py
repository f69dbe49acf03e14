"""Validate tools/tf_import.py against REAL reference checkpoints, per family.

For each of the nine families this harness:
  1. trains the REFERENCE'S OWN TF code in-env on Digital_Music for one
     epoch (scripts/ref_tf_run.py --set_max_epochs 1, eval every 100 steps
     so best-AUC saves land exactly on logged `Eval_AUC` lines —
     TLSAN/train.py:198-230 saves right after the eval that improved);
  2. picks the newest saved ``tf.train.Saver`` checkpoint whose step has a
     logged eval AUC (BPR logs per-epoch `test_auc:` and saves once at the
     end — BPR/train.py:83 — so its final save pairs with its last line);
  3. imports it with tools/tf_import.py (strict: every variable consumed,
     every leaf filled) and re-evaluates the imported params with OUR
     evaluator on OUR bit-exact build of the same test set;
  4. checks the EXPORT name map too: to_tf_vars() of the imported tree must
     reproduce exactly the checkpoint's variable-name set (minus counters),
     i.e. a framework→reference export is loadable by the reference graph.

Agreement between the reference's logged AUC and the imported-params AUC
(|Δ| ≤ tol, default 0.003 ≈ eval float noise) proves the name map, the
orientation of every matrix, and the eval protocol in one shot.

Slow families can be capped: a timeout kills the training process group,
and any best-save checkpoint written before the cap still validates.

Usage:
  python scripts/import_anchors.py [--families shan,bpr,...] [--dataset D]
      [--workdir runs/ref_tf/import_anchors] [--tol 0.003]
Writes <workdir>/<fam>_import.json per family + <workdir>/summary.json.
"""

import argparse
import glob
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (our name, reference dir, eval_freq flag or None for fixed-cadence code,
#  train timeout seconds)
FAMILIES = [
    ("bpr", "BPR", None, 900),
    ("shan", "SHAN", 100, 900),
    ("lspm", "LSPM", 100, 900),
    ("paca", "PACA", 100, 900),
    ("atrank", "ATRank", 100, 1200),
    ("tlsan", "TLSAN", 100, 1200),
    ("csan", "CSAN", 100, 1500),
    ("bilstm", "Bi-LSTM", None, 1500),
    ("cnn", "CNN", 50, 1500),
]

# case varies per family: CNN/CSAN/Bi-LSTM print Eval_AUC, SHAN Eval_auc
AUC_RE = re.compile(r"Global_step (\d+)\s+Train_loss: [\d.]+\s+"
                    r"Eval_[Aa][Uu][Cc]: ([\d.]+)")
# BPR's per-epoch line; must not match the final "[Bb]est test_auc:" summary
BPR_AUC_RE = re.compile(r"(?<![Bb]est )test_auc: ([\d.]+)")


def run_reference(ref_name, dataset, workdir, eval_freq, timeout_s, log_path):
    cmd = [sys.executable, os.path.join(REPO, "scripts", "ref_tf_run.py"),
           "--model", ref_name, "--dataset", dataset,
           "--workdir", workdir, "--fast", "--set_max_epochs", "1",
           "--save_every_eval"]
    if eval_freq is not None:
        cmd += ["--", f"--eval_freq={eval_freq}"]
    print(f"[import_anchors] {' '.join(cmd)} (cap {timeout_s}s)", flush=True)
    with open(log_path, "w") as log:
        # own process group so a timeout kills the grandchild train.py too
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                start_new_session=True)
        try:
            rc = proc.wait(timeout=timeout_s)
            return rc, False
        except subprocess.TimeoutExpired:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            return None, True


def logged_aucs(log_path):
    """step → logged eval AUC (BPR: {None: last per-epoch test_auc})."""
    text = open(log_path).read()
    steps = {int(s): float(a) for s, a in AUC_RE.findall(text)}
    if steps:
        return steps
    bpr = BPR_AUC_RE.findall(text)
    return {None: float(bpr[-1])} if bpr else {}


def checkpoints(save_dir):
    """[(prefix, step-from-variable)] for every Saver checkpoint present."""
    from tlsan_tpu.tools.tf_import import read_tf_checkpoint
    out = []
    for index in sorted(glob.glob(os.path.join(save_dir, "*.index"))):
        prefix = index[: -len(".index")]
        try:
            _, step = read_tf_checkpoint(prefix)
        except Exception as e:  # truncated file from a killed run
            print(f"[import_anchors] unreadable {prefix}: {e}", flush=True)
            continue
        out.append((prefix, step))
    return out


def export_names_match(fam, prefix):
    """to_tf_vars() must reproduce the real checkpoint's trainable-name set."""
    from tlsan_tpu.tools.tf_import import (_COUNTERS, _SLOT_MARKERS,
                                           read_tf_checkpoint, to_params,
                                           to_tf_vars)
    tf_vars, _ = read_tf_checkpoint(prefix)
    params, _ = to_params(fam, tf_vars)
    want = set(tf_vars)  # read_tf_checkpoint already drops counters + slots
    got = set(to_tf_vars(fam, params))
    assert not any(n in _COUNTERS or any(m in n for m in _SLOT_MARKERS)
                   for n in want)
    return {"match": got == want,
            "missing_in_export": sorted(want - got),
            "extra_in_export": sorted(got - want)}


def import_and_eval(fam, prefix, dataset, out_dir):
    """tools/tf_import.py --eval in a fresh CPU process; returns its JSON."""
    code = (
        "import jax, sys, json\n"
        "jax.config.update('jax_platforms','cpu')\n"
        "from tlsan_tpu.tools import tf_import\n"
        f"tf_import.main(['--model','{fam}','--ckpt',{prefix!r},"
        f"'--out',{out_dir!r},'--dataset','{dataset}','--eval'])\n")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=REPO)
    if r.returncode != 0:
        return {"error": (r.stderr or r.stdout).strip()[-2000:]}
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": f"no JSON in output: {r.stdout[-500:]}"}


def run_family(fam, ref_name, dataset, workdir, eval_freq, timeout_s, tol):
    t0 = time.time()
    log_path = os.path.join(workdir, f"{fam}_{dataset.lower()}.log")
    save_dir = os.path.join(workdir, f"{ref_name}_{dataset}", "save_path")
    # Resume semantics: if a previous (possibly interrupted) reference run
    # already left anchorable artifacts — a log with eval lines AND at least
    # one readable Saver checkpoint — anchor from those instead of
    # retraining.  Re-running the reference trainer would WIPE save_path
    # (from_scratch=True default, e.g. reference TLSAN/train.py:124-127) and
    # lose the checkpoints the interrupted run paid for.
    rc, timed_out = None, False
    have = (os.path.exists(log_path) and logged_aucs(log_path)
            and os.path.isdir(save_dir) and checkpoints(save_dir))
    if have:
        print(f"[import_anchors] {fam}: anchoring from existing artifacts "
              f"(no retrain)", flush=True)
        rc = "resumed"
    else:
        rc, timed_out = run_reference(ref_name, dataset, workdir, eval_freq,
                                      timeout_s, log_path)
    aucs = logged_aucs(log_path)
    ckpts = checkpoints(save_dir) if os.path.isdir(save_dir) else []
    result = {"family": fam, "reference": ref_name, "dataset": dataset,
              "train_rc": rc, "timed_out": timed_out,
              "n_checkpoints": len(ckpts), "n_logged_evals": len(aucs)}
    if not ckpts or not aucs:
        result["error"] = "no checkpoint or no logged eval to anchor against"
        return result

    if None in aucs:  # BPR: one final save, last per-epoch eval
        prefix, step = ckpts[-1]
        ref_auc = aucs[None]
    else:
        matched = [(p, s) for p, s in ckpts if s in aucs]
        if not matched:
            result["error"] = (f"no checkpoint step in logged evals "
                               f"(ckpts {[s for _, s in ckpts]}, "
                               f"evals {sorted(aucs)})")
            return result
        prefix, step = max(matched, key=lambda x: x[1])
        ref_auc = aucs[step]

    result.update(ckpt=os.path.relpath(prefix, REPO), step=step,
                  ref_logged_auc=ref_auc)
    result["export_names"] = export_names_match(fam, prefix)
    imported = import_and_eval(fam, prefix, dataset,
                               os.path.join(workdir, f"imported_{fam}"))
    result["import"] = imported
    if "auc" in imported:
        delta = imported["auc"] - ref_auc
        result["delta"] = round(delta, 4)
        result["ok"] = (abs(delta) <= tol
                        and result["export_names"]["match"])
    else:
        result["ok"] = False
    result["wall_s"] = round(time.time() - t0, 1)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(f for f, *_ in FAMILIES))
    ap.add_argument("--dataset", default="Digital_Music")
    ap.add_argument("--workdir",
                    default=os.path.join(REPO, "runs", "ref_tf",
                                         "import_anchors"))
    ap.add_argument("--tol", type=float, default=0.003)
    ap.add_argument("--retry-failed", action="store_true",
                    help="re-run families whose existing json has ok=false")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    wanted = set(args.families.split(","))
    for fam, ref_name, eval_freq, timeout_s in FAMILIES:
        if fam not in wanted:
            continue
        out_json = os.path.join(args.workdir, f"{fam}_import.json")
        if os.path.exists(out_json):
            prev = json.load(open(out_json))
            if prev.get("ok") or not args.retry_failed:
                print(f"[import_anchors] skip {fam} "
                      f"(exists, ok={prev.get('ok')})", flush=True)
                continue
            print(f"[import_anchors] retry {fam} (previous ok=false)",
                  flush=True)
        # FAILED marker first (matrix-queue semantics): if this invocation
        # is killed mid-family, the hole is visible, not silent.
        json.dump({"family": fam, "dataset": args.dataset, "ok": False,
                   "error": "FAILED: harness interrupted mid-family"},
                  open(out_json, "w"), indent=2)
        try:
            row = run_family(fam, ref_name, args.dataset, args.workdir,
                             eval_freq, timeout_s, args.tol)
        except Exception as e:  # keep the queue going; marker records it
            row = {"family": fam, "dataset": args.dataset, "ok": False,
                   "error": f"FAILED: {type(e).__name__}: {e}"}
        json.dump(row, open(out_json, "w"), indent=2)
        print(f"[import_anchors] {fam}: "
              f"{json.dumps({k: row.get(k) for k in ('step', 'ref_logged_auc', 'import', 'delta', 'ok')})}",
              flush=True)
        write_summary(args.workdir, args.dataset, args.tol)

    summary = write_summary(args.workdir, args.dataset, args.tol)
    print(json.dumps({k: summary[k] for k in ("ok", "total")}))


def write_summary(workdir, dataset, tol):
    """Aggregate summary.json from ALL per-family jsons on disk — never from
    one invocation's in-memory rows (the round-4 stale-summary bug)."""
    rows = []
    for fam, *_ in FAMILIES:
        path = os.path.join(workdir, f"{fam}_import.json")
        if os.path.exists(path):
            rows.append(json.load(open(path)))
    summary = {"dataset": dataset, "tol": tol,
               "ok": sum(1 for r in rows if r.get("ok")),
               "total": len(rows), "rows": rows}
    json.dump(summary, open(os.path.join(workdir, "summary.json"), "w"),
              indent=2)
    return summary


if __name__ == "__main__":
    main()
