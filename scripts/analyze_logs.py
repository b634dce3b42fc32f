#!/usr/bin/env python
"""Training-log analyzer over the framework's events.jsonl stream — the
equivalent of the Swin fork's tools/analysis_tools/analyze_logs.py.

  python scripts/analyze_logs.py stats   <exp_dir>           # per-tag summary
  python scripts/analyze_logs.py plot    <exp_dir> --tags Train/Loss Metrics/abs_rel --out curves.png
  python scripts/analyze_logs.py time    <exp_dir>           # steps/sec over the run
"""

import argparse
import json
import os
import sys
from collections import defaultdict


def load_events(exp_dir):
    path = os.path.join(exp_dir, "events.jsonl")
    if not os.path.exists(path):
        sys.exit(f"no events.jsonl under {exp_dir}")
    events = defaultdict(list)
    times = []
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "value" in e:
                events[e["tag"]].append((e["step"], e["value"]))
                times.append((e["step"], e["t"]))
    return events, times


def cmd_stats(events, _times, _args):
    for tag, pts in sorted(events.items()):
        vals = [v for _, v in pts]
        last_step = pts[-1][0]
        print(f"{tag:28s} n={len(vals):5d} last={vals[-1]:.5f} "
              f"min={min(vals):.5f} max={max(vals):.5f} @step {last_step}")


def cmd_plot(events, _times, args):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    tags = args.tags or ["Train/Loss"]
    fig, axes = plt.subplots(1, len(tags), figsize=(5 * len(tags), 4), squeeze=False)
    for ax, tag in zip(axes[0], tags):
        if tag not in events:
            print(f"warning: tag {tag} not found")
            continue
        steps, vals = zip(*events[tag])
        ax.plot(steps, vals)
        ax.set_title(tag)
        ax.set_xlabel("step")
        ax.grid(alpha=0.3)
    out = args.out or "curves.png"
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def cmd_time(events, times, _args):
    loss = sorted(events.get("Train/Loss", []))
    t = sorted(times)
    if len(t) < 2:
        sys.exit("not enough events")
    span_steps = t[-1][0] - t[0][0]
    span_secs = t[-1][1] - t[0][1]
    if span_secs > 0 and span_steps > 0:
        print(f"{span_steps} steps over {span_secs:.1f}s "
              f"= {span_steps / span_secs:.3f} steps/sec")
    if loss:
        print(f"loss: first {loss[0][1]:.4f} -> last {loss[-1][1]:.4f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["stats", "plot", "time"])
    ap.add_argument("exp_dir")
    ap.add_argument("--tags", nargs="*", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    events, times = load_events(args.exp_dir)
    {"stats": cmd_stats, "plot": cmd_plot, "time": cmd_time}[args.cmd](events, times, args)


if __name__ == "__main__":
    main()
