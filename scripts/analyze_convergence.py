#!/usr/bin/env python
"""Verdict on a convergence run's JSONL log (scripts/run_convergence_tpu.sh).

Checks the four VERDICT r3 next-#1 criteria on <exp_dir>/events.jsonl:
  (a) train SILog decreasing (first-quartile mean vs last-quartile mean),
  (b) val abs_rel improving across >=3 validations,
  (c) the best-checkpoint branch fired on a real improvement
      (<exp_dir>/*_best exists and abs_rel's running min moved >=2 times),
  (d) the resume continued the schedule (step sequence has no reset to 0
      after the max, and covers both sides of the kill point).
Also reports steady-state e2e throughput (img/s) from inter-step wall times
(VERDICT r3 next #6) — this is HOST-bound on the 1-core dev box.

Usage: python scripts/analyze_convergence.py EXP_DIR [--bs 16]
           [--validate-every 100] [--log-every 5]
(--validate-every / --log-every must mirror the run's params file; the
resume-continuity bound (d) and the throughput figure depend on them.)
"""

import glob
import json
import os
import sys

import numpy as np


def main():
    exp_dir = sys.argv[1]

    def _opt(flag, default):
        return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default

    bs = _opt("--bs", 16)
    val_every = _opt("--validate-every", 100)
    log_every = _opt("--log-every", 5)
    # --no-kill: the run had no mid-run SIGKILL leg (e.g. the cue e2e system
    # runs); criterion (d) degenerates to "steps strictly increasing".
    no_kill = "--no-kill" in sys.argv
    events = []
    with open(os.path.join(exp_dir, "events.jsonl")) as f:
        for line in f:
            events.append(json.loads(line))

    silog = [(e["step"], e["value"], e["t"]) for e in events if e["tag"] == "Train/SILog"]
    absrel = [(e["step"], e["value"]) for e in events if e["tag"] == "Metrics/abs_rel"]
    loss = [(e["step"], e["value"], e["t"]) for e in events if e["tag"] == "Train/Loss"]

    out = {"n_train_logs": len(silog), "n_validations": len(absrel)}

    # (a) train SILog down
    v = np.array([x[1] for x in silog])
    q = max(1, len(v) // 4)
    out["silog_first_quarter"] = round(float(v[:q].mean()), 4)
    out["silog_last_quarter"] = round(float(v[-q:].mean()), 4)
    out["a_train_loss_down"] = bool(v[-q:].mean() < 0.7 * v[:q].mean())

    # (b) val abs_rel improving across >=3 validations
    ar = [x[1] for x in absrel]
    out["abs_rel_trajectory"] = [round(x, 4) for x in ar]
    improvements = sum(1 for i in range(1, len(ar)) if ar[i] < min(ar[:i]))
    out["b_absrel_improving"] = bool(len(ar) >= 3 and improvements >= 2
                                     and ar[-1] < ar[0])
    if ar:
        # best-vs-latest: nonzero on runs long enough to plateau + wobble,
        # where best-checkpoint selection genuinely matters (VERDICT r4 #7)
        out["absrel_best"] = round(min(ar), 4)
        out["absrel_last"] = round(ar[-1], 4)
        out["best_vs_latest_gap"] = round(ar[-1] - min(ar), 4)

    # (c) best checkpoint fired
    best = glob.glob(os.path.join(exp_dir, "*_best"))
    out["c_best_checkpoint"] = bool(best) and improvements >= 2
    out["best_ckpt"] = best[:1]

    # (d) resume continued the schedule: the post-kill leg restarts from the
    # last *checkpoint* (start_epoch * steps_per_epoch — train/driver.py:145),
    # which is <= the last pre-kill logged step but within one validate_every
    # of it (checkpoints are saved at validations), NOT from step 0; each leg
    # itself is strictly increasing and the run ends past the kill point.
    steps = [x[0] for x in loss]
    ts = [x[2] for x in loss]
    gaps = np.diff(ts)
    big_gap = int(np.argmax(gaps)) if len(gaps) else 0
    out["kill_gap_s"] = round(float(gaps[big_gap]), 1) if len(gaps) else None
    pre = steps[:big_gap + 1]
    post = steps[big_gap + 1:]
    pre_max = max(pre) if pre else -1
    out["resume_restart_step"] = min(post) if post else None
    if no_kill:
        out["d_resume_continued"] = bool(
            len(steps) > 1 and all(np.diff(steps) > 0))
    else:
        out["d_resume_continued"] = bool(
            post and pre
            and 0 < min(post) <= pre_max
            and pre_max - min(post) <= val_every + 12   # last ckpt, not scratch
            and max(post) > pre_max
            and all(np.diff(pre) > 0) and all(np.diff(post) > 0))

    # e2e throughput from steady-state inter-log gaps
    if len(ts) > 10:
        d = np.diff(ts)
        d = d[(d > 0) & (d < np.percentile(d, 90))]  # drop kill/validation gaps
        sec_per_log = float(np.median(d))
        out["e2e_img_per_s_host_bound"] = round(log_every * bs / sec_per_log, 2)

    out["PASS"] = all(out[k] for k in ("a_train_loss_down", "b_absrel_improving",
                                       "c_best_checkpoint", "d_resume_continued"))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
