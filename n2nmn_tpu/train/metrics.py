"""Training metrics: EMA-smoothed console logging (matching the reference's
print cadence, e.g. exp_clevr/train_clevr_gt_layout.py:206-210) plus a
JSONL event stream per experiment (TensorBoard-free observability)."""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, log_dir, exp_name, ema_decay=0.99,
                 tensorboard=True):
        self.ema_decay = ema_decay
        self.avg_accuracy = 0.0
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, f"{exp_name}.jsonl")
        self._f = open(self.jsonl_path, "a")
        self._t0 = time.time()
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(
                    logdir=os.path.join(log_dir, exp_name))
            except Exception:
                self._tb = None  # TB is optional; JSONL is canonical

    def update_accuracy(self, accuracy):
        # EMA with decay 0.99 (reference train_clevr_gt_layout.py:163-164)
        self.avg_accuracy += (1 - self.ema_decay) * (
            accuracy - self.avg_accuracy)
        return self.avg_accuracy

    def log(self, n_iter, metrics):
        rec = {"iter": int(n_iter),
               "wall_s": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), int(n_iter))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
