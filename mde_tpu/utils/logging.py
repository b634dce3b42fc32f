"""Experiment logging: TensorBoard when available, JSONL always.

The reference logs scalars every 5 steps and figure grids every 500 via
torch SummaryWriter (reference train.py:327, 432-452). Here a thin logger
writes a machine-readable JSONL event stream unconditionally (cheap, grep-able,
no deps) and mirrors to TensorBoard if the tensorboard package exists.
"""

import json
import os
import time


class SummaryLogger:
    def __init__(self, log_dir: str, flush_secs: int = 1):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "events.jsonl"), "a", buffering=1)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir, flush_secs=flush_secs)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        self._jsonl.write(json.dumps(
            {"t": time.time(), "tag": tag, "value": float(value), "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_figure(self, tag: str, fig, step: int):
        path = os.path.join(self.log_dir, f"{tag.replace('/', '_')}_{step}.png")
        try:
            fig.savefig(path, bbox_inches="tight", dpi=90)
        except Exception:
            return
        self._jsonl.write(json.dumps(
            {"t": time.time(), "tag": tag, "figure": path, "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_figure(tag, fig, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
