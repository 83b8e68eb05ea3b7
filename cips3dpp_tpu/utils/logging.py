"""Text-file metric logging.

Behavioural contract: tl2's textlogger (SURVEY.md §5) — grouped scalar dicts
appended to per-group text files so runs can be compared/plotted offline.
One file per metric group: `{name}.txt` with `step value` lines.
"""

from __future__ import annotations

import collections
import json
import os
import time


class MetricLogger:
    def __init__(self, outdir: str, flush_every: int = 50):
        self.outdir = os.path.abspath(outdir)
        os.makedirs(self.outdir, exist_ok=True)
        self._buf: dict = collections.defaultdict(list)
        self._count = 0
        self.flush_every = flush_every
        self._t0 = time.time()

    def log(self, step: int, metrics: dict):
        for k, v in metrics.items():
            self._buf[k].append((step, float(v)))
        self._count += 1
        if self._count % self.flush_every == 0:
            self.flush()

    def flush(self):
        for k, rows in self._buf.items():
            with open(os.path.join(self.outdir, f"{k}.txt"), "a") as f:
                for step, v in rows:
                    f.write(f"{step} {v}\n")
        self._buf.clear()

    def log_jsonl(self, step: int, metrics: dict, name: str = "metrics"):
        rec = {"step": step, "time": time.time() - self._t0}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(os.path.join(self.outdir, f"{name}.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
