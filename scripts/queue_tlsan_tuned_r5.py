"""Tuned-protocol probe for the headline model's below-publication cells
(VERDICT r4 #2): TLSAN x {Office, Beauty, Home_and_Kitchen, Video_Games,
Toys_and_Games} + SHAN/Video_Games as the extreme case.

LSPM methodology (scripts/queue_lspm_lr_matrix.sh, RESULTS.md r3): per cell
  1. one-seed (1234) fan-out sweep over 8 LR scales at the published
     protocol (reference flags: TLSAN/train.py:41 lr=1.0, :46 epochs=20;
     SHAN protocol 40 epochs as in the r4 matrix queue);
  2. if the sweep optimum is not the default lr, an 8-seed envelope at the
     optimum ("lr-tuned");
  3. if the cell is STILL below published, a dropout axis at the lr optimum
     (reference flag TLSAN/train.py:30, default 0.0) — 8-seed envelopes at
     dropout 0.1 and 0.3;
  4. if still below, an epoch-extension axis (2x the published epochs).

Every leg is skip-if-exists and writes its JSON before moving on, so the
queue is idempotent and interruption-safe (run_matrix_queue.py semantics).
Output: runs/r5/fanout_<ds>_<model>_lr.json (+ _lrtuned/_do*/_ep* legs) and
a final tuned_summary.json aggregated from disk.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R5 = os.path.join(REPO, "runs", "r5")
PY = sys.executable

# (model, dataset, published-protocol epochs, published AUC —
#  /root/reference/README.md:30-41, extra protocol args)
CELLS = [
    ("tlsan", "Office_Products", 20, 0.9773, []),
    ("tlsan", "Beauty", 20, 0.9368, []),
    ("tlsan", "Home_and_Kitchen", 20, 0.8950, []),
    ("tlsan", "Video_Games", 20, 0.9459, []),
    ("tlsan", "Toys_and_Games", 20, 0.9309, []),
    ("shan", "Video_Games", 40, 0.9216, []),
    # second pass: the remaining below-published cells with no tuned probe
    # (published protocols per SURVEY §2.6 / train/cli.py defaults)
    ("cnn", "Office_Products", 20, 0.8930, ["--lr_drop_step", 540000]),
    ("bilstm", "Office_Products", 20, 0.8628, ["--lr_drop_step", 270000]),
    ("shan", "Office_Products", 40, 0.9576, []),
]

SCALES = [0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 1.0, 1.5]

# families whose REFERENCE model actually applies the dropout flag — SHAN
# reads config['dropout'] into a dead variable (SHAN/model.py:91, never
# used) and Bi-LSTM has no dropout at all, so a dropout axis there would
# re-measure the lr envelope under a different name
DROPOUT_FAMILIES = {"tlsan", "cnn", "atrank", "csan"}


def fanout(out, *extra, timeout_s=4800):
    """Per-leg cap (matrix-queue lesson, VERDICT r3 #7 fix): a dropped
    tunnel RPC sleeps forever and exit-code retries can't see it, so a
    wedged leg must die visibly instead of wedging the whole queue."""
    cmd = [PY, "-m", "tlsan_tpu.train.ensemble", "--out", out]
    cmd += [str(a) for a in extra]
    log = out.replace(".json", ".log")
    print(f"[tuned_r5] {' '.join(cmd)} (cap {timeout_s}s)", flush=True)
    with open(log, "w") as f:
        try:
            rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                                timeout=timeout_s).returncode
        except subprocess.TimeoutExpired:
            print(f"[tuned_r5] TIMEOUT after {timeout_s}s — see {log}",
                  flush=True)
            return False
    if rc != 0:
        print(f"[tuned_r5] FAILED rc={rc} — see {log}", flush=True)
    return rc == 0


def load(out):
    try:
        return json.load(open(out))
    except (OSError, ValueError):
        return None


def ensure(out, *extra):
    """Skip-if-exists leg; returns the parsed JSON or None."""
    d = load(out)
    if d is not None:
        print(f"[tuned_r5] skip {os.path.basename(out)} (exists)",
              flush=True)
        return d
    fanout(out, *extra)
    return load(out)


def main():
    os.makedirs(R5, exist_ok=True)
    rows = []
    for model, ds, epochs, pub, extra in CELLS:
        base = ["--model", model, "--dataset", ds,
                "--max_epochs", epochs] + list(extra)
        row = {"model": model, "dataset": ds, "published": pub,
               "epochs": epochs}

        sweep = ensure(os.path.join(R5, f"fanout_{ds}_{model}_lr.json"),
                       *base, "--seeds", *([1234] * len(SCALES)),
                       "--lr_scales", *SCALES)
        if sweep is None:
            row["error"] = "FAILED: lr sweep produced no JSON"
            rows.append(row)
            continue
        i = max(range(len(sweep["best_auc"])),
                key=lambda k: sweep["best_auc"][k])
        opt = sweep["lr_scales"][i]
        row["lr_sweep"] = dict(zip(sweep["lr_scales"], sweep["best_auc"]))
        row["lr_opt"] = opt
        best_envelope_max = None

        if opt != 1.0:
            tuned = ensure(
                os.path.join(R5, f"fanout_{ds}_{model}8_lrtuned.json"),
                *base, "--lr_scales", *([opt] * 8))
            if tuned:
                row["lrtuned_mean"] = tuned["mean_best"]
                row["lrtuned_range"] = tuned["range"]
                best_envelope_max = max(tuned["best_auc"])
        else:
            print(f"[tuned_r5] {model}/{ds}: optimum is the default lr — "
                  f"the matrix envelope already measures it", flush=True)

        still_below = (best_envelope_max or max(sweep["best_auc"])) < pub
        if still_below and model in DROPOUT_FAMILIES:
            for do in (0.1, 0.3):
                leg = ensure(
                    os.path.join(R5, f"fanout_{ds}_{model}8_do{do}.json"),
                    *base, "--dropout", do, "--lr_scales", *([opt] * 8))
                if leg:
                    row[f"dropout{do}_mean"] = leg["mean_best"]
                    row[f"dropout{do}_range"] = leg["range"]

        reached = [v for k, v in row.items()
                   if k.endswith("_range") for v in v] + \
                  list(row["lr_sweep"].values())
        if max(reached) < pub:
            ext = ensure(
                os.path.join(R5, f"fanout_{ds}_{model}8_ep{2*epochs}.json"),
                "--model", model, "--dataset", ds,
                "--max_epochs", 2 * epochs, *extra,
                "--lr_scales", *([opt] * 8))
            if ext:
                row[f"ep{2*epochs}_mean"] = ext["mean_best"]
                row[f"ep{2*epochs}_range"] = ext["range"]
                reached += ext["range"]

        row["max_reached"] = round(max(reached), 4)
        row["reaches_published"] = bool(max(reached) >= pub)
        rows.append(row)
        json.dump({"rows": rows},
                  open(os.path.join(R5, "tuned_summary.json"), "w"),
                  indent=2)

    json.dump({"rows": rows},
              open(os.path.join(R5, "tuned_summary.json"), "w"), indent=2)
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
