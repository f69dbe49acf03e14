"""Idempotent fan-out queue runner with failure records (VERDICT r3 #7).

Round 3 accumulated ~15 one-shot queueN.sh scripts; one interrupted cell
(Toys/CSAN) left a log with no JSON and slipped through a snapshot unnoticed.
This runner replaces them for the remaining published-matrix work:

  * walks a declarative cell list (skip-if-done on the output JSON, parsed,
    not just non-empty — a truncated JSON re-runs);
  * retries each failed cell once (the TPU tunnel occasionally drops an RPC);
  * on final failure writes `<out>.FAILED.json` recording the exit code and
    the log tail, so an interrupted container session can never silently
    lose a cell again;
  * prints a machine-checkable summary line per cell (DONE/SKIP/FAILED).

Round-4 manifest (VERDICT #2/#5): the 9 pending published-matrix cells
(CNN x5 at the reference 20-epoch budget, CSAN x4 incl. the interrupted
Toys re-queue), the LSPM lr sweep->tuned pairs x4 (published LSPM needs a
tuned LR — measured optima 0.2/0.3 on Clothing/DM), and the bf16 A/B
8-seed envelopes x3 (TLSAN f32-vs-bf16; f32 sides reuse protocol-matched
existing envelopes where present).

Usage: python scripts/run_matrix_queue.py [--only SUBSTR] [--dry]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R = os.path.join(REPO, "runs", "r4")
R3 = os.path.join(REPO, "runs", "r3")
PY = sys.executable

MATRIX_DS = ["Toys_and_Games", "Beauty", "Video_Games", "Home_and_Kitchen"]


def fanout(out, model, dataset, *extra):
    return [PY, "-m", "tlsan_tpu.train.ensemble", "--model", model,
            "--dataset", dataset, "--out", out] + [str(a) for a in extra]


def done(out):
    """A cell is complete only if its JSON exists AND parses."""
    try:
        with open(out) as f:
            json.load(f)
        return True
    except (OSError, ValueError):
        return False


def lspm_tuned_cmd(ds, sweep, out):
    """Second stage of the LSPM lr pair: envelope at the measured optimum.

    ADVICE r3 fixes folded in: a missing/corrupt sweep JSON skips the tuned
    run loudly instead of dying in argparse (low #1), and a measured optimum
    of exactly 1.0 skips the redundant tuned envelope — the default-lr
    envelope already covers it (low #4).  The optimum is the argmax of best
    test AUC from a single seed (1234), matching the Clothing/DM protocol;
    RESULTS.md notes the single-seed test-metric selection explicitly
    (low #3).
    """
    if not done(sweep):
        print(f"[queue] lspm sweep missing for {ds}; skipping tuned cell")
        return None
    d = json.load(open(sweep))
    i = max(range(len(d["best_auc"])), key=lambda k: d["best_auc"][k])
    best = round(d["lr_scales"][i], 4)
    print(f"[queue] {ds} lspm lr optimum scale={best}")
    if best == 1.0:
        print(f"[queue] {ds} optimum is the default lr; default envelope "
              f"covers it — writing alias")
        base = os.path.join(R3, f"fanout_{ds}_lspm8.json")
        if done(base):
            env = json.load(open(base))
            env["lr_optimum_is_default"] = True
            with open(out, "w") as f:
                json.dump(env, f)
        return None
    return fanout(out, "lspm", ds, "--max_epochs", 10,
                  "--lr_scales", *([best] * 8))


ALL_DS = ["Clothing_Shoes_and_Jewelry", "Digital_Music", "Office_Products",
          "Beauty", "Home_and_Kitchen", "Video_Games", "Toys_and_Games"]


def build_cells():
    cells = []

    # -- SHAN re-envelopes x7 after the per-batch-padding fix (VERDICT #1):
    # models/shan.py now limits the unmasked softmax to the per-batch max
    # (the reference's dynamic-padding width, SHAN/input.py:31-43).  The r3
    # envelopes measured the old static-width behavior and stay in runs/r3
    # as the A/B record; the fixed envelopes land in runs/r4. --
    for ds in ALL_DS:
        out = os.path.join(R, f"fanout_{ds}_shan8.json")
        cells.append(dict(
            name=f"shan-fixed/{ds}", out=out,
            cmd=lambda ds=ds, out=out: fanout(
                out, "shan", ds, "--max_epochs", 40)))

    # -- LSPM lr sweep -> tuned pairs x4 (cheapest; VERDICT #2 third leg) --
    for ds in MATRIX_DS:
        sweep = os.path.join(R3, f"fanout_{ds}_lspm_lr.json")
        tuned = os.path.join(R3, f"fanout_{ds}_lspm8_tuned.json")
        cells.append(dict(
            name=f"lspm-sweep/{ds}", out=sweep,
            cmd=lambda ds=ds, sweep=sweep: fanout(
                sweep, "lspm", ds, "--max_epochs", 10,
                "--seeds", *([1234] * 8),
                "--lr_scales", 0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 1.0, 1.5)))
        cells.append(dict(
            name=f"lspm-tuned/{ds}", out=tuned,
            cmd=lambda ds=ds, sweep=sweep, tuned=tuned:
                lspm_tuned_cmd(ds, sweep, tuned)))

    # -- bf16 A/B envelopes x3 (VERDICT #5): TLSAN, reference 20-ep budget,
    # protocol-matched to the existing f32 envelopes --
    for ds in ["Clothing_Shoes_and_Jewelry", "Digital_Music", "Beauty"]:
        for dt in ["bf16", "f32"]:
            out = os.path.join(R, f"fanout_{ds}_tlsan8_{dt}.json")
            cells.append(dict(
                name=f"tlsan-{dt}/{ds}", out=out,
                cmd=lambda ds=ds, dt=dt, out=out: fanout(
                    out, "tlsan", ds, "--max_epochs", 20,
                    "--compute_dtype", dt)))

    # -- CSAN x4 (incl. the interrupted Toys re-queue; VERDICT #2) --
    for ds in MATRIX_DS:
        out = os.path.join(R3, f"fanout_{ds}_csan8.json")
        cells.append(dict(
            name=f"csan/{ds}", out=out,
            cmd=lambda ds=ds, out=out: fanout(
                out, "csan", ds, "--max_epochs", 20,
                "--lr_drop_step", 270000)))

    # -- CNN x5 (the expensive tail; VERDICT #2) --
    for ds in ["Office_Products"] + MATRIX_DS:
        out = os.path.join(R3, f"fanout_{ds}_cnn8.json")
        cells.append(dict(
            name=f"cnn/{ds}", out=out,
            cmd=lambda ds=ds, out=out: fanout(
                out, "cnn", ds, "--max_epochs", 20,
                "--lr_drop_step", 540000)))

    return cells


def run_cell(cell, dry=False):
    out = cell["out"]
    if done(out):
        print(f"[queue] SKIP {cell['name']} (exists)")
        return "SKIP"
    cmd = cell["cmd"]()
    if cmd is None:
        return "SKIP"
    log = out.replace(".json", ".log")
    if dry:
        print(f"[queue] DRY  {cell['name']}: {' '.join(cmd)}")
        return "DRY"
    for attempt in (1, 2):
        print(f"[queue] RUN  {cell['name']} (attempt {attempt}) -> {out}",
              flush=True)
        with open(log, "a") as lf:
            # hard per-cell timeout: a dropped tunnel RPC leaves the client
            # SLEEPING forever (observed round 4: 7s CPU over 40 min), which
            # no exit-code retry can catch — kill and count as a failed
            # attempt.  2h comfortably covers the slowest cell (CSAN ~15 min)
            try:
                rc = subprocess.run(cmd, stdout=lf, stderr=lf, cwd=REPO,
                                    timeout=7200).returncode
            except subprocess.TimeoutExpired:
                rc = -9
                lf.write("\n[queue] cell timed out after 7200s, killed\n")
        if rc == 0 and done(out):
            print(f"[queue] DONE {cell['name']}")
            failed = out.replace(".json", ".FAILED.json")
            if os.path.exists(failed):
                os.remove(failed)
            return "DONE"
        print(f"[queue] attempt {attempt} failed rc={rc}", flush=True)
    tail = ""
    try:
        tail = "".join(open(log).readlines()[-15:])
    except OSError:
        pass
    with open(out.replace(".json", ".FAILED.json"), "w") as f:
        json.dump({"cell": cell["name"], "status": "FAILED", "exit": rc,
                   "log": log, "log_tail": tail}, f, indent=1)
    print(f"[queue] FAILED {cell['name']} rc={rc} (marker written)")
    return "FAILED"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="run only cells whose name contains this substring")
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args()

    os.makedirs(R, exist_ok=True)
    results = {}
    for cell in build_cells():
        if args.only and args.only not in cell["name"]:
            continue
        results[cell["name"]] = run_cell(cell, dry=args.dry)
    counts = {}
    for v in results.values():
        counts[v] = counts.get(v, 0) + 1
    print(f"[queue] summary: {counts}")
    print("MATRIX_QUEUE_DONE" if "FAILED" not in counts
          else "MATRIX_QUEUE_DONE_WITH_FAILURES")


if __name__ == "__main__":
    main()
