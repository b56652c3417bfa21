"""Training logger (reference train.py:88-130, 288-308).

Running-mean console lines with LR + ETA every print_freq steps; validation
histories plotted to {output}/{key}.png and train_epe.png via matplotlib Agg.
State is a plain dict so it round-trips through checkpoints (train.py:132-136).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List

import numpy as np


class Logger:
    def __init__(self, num_steps: int, print_freq: int = 100,
                 output: str = "checkpoints"):
        self.num_steps = num_steps
        self.print_freq = print_freq
        self.output = output
        self.total_steps = 0
        self.running: Dict[str, List[float]] = {}
        self.train_epe_list: List[float] = []
        self.train_steps_list: List[int] = []
        self.val_steps_list: List[int] = []
        self.val_results_dict: Dict[str, List[float]] = {}

    # -- persistence ------------------------------------------------------
    def state_dict(self) -> Dict:
        return {k: getattr(self, k) for k in
                ("total_steps", "train_epe_list", "train_steps_list",
                 "val_steps_list", "val_results_dict")}

    def load_state_dict(self, state: Dict):
        self.__dict__.update(state)

    # -- logging ----------------------------------------------------------
    def push(self, metrics: Dict[str, float], lr: float):
        """Metrics may be device arrays; they are only materialized at print
        time so the training loop never blocks on a device->host transfer."""
        self.total_steps += 1
        for k, v in metrics.items():
            self.running.setdefault(k, []).append(v)
        if self.total_steps % self.print_freq == self.print_freq - 1:
            self._print_status(lr)

    def _print_status(self, lr: float):
        keys = sorted(self.running.keys())
        means = {k: float(np.mean([float(np.asarray(v))
                                   for v in self.running[k]])) for k in keys}
        header = f"[{self.total_steps + 1:6d}, {lr:10.7f}] "
        body = ", ".join(f"{k} {means[k]:.4f}" for k in keys if k != "time")
        eta = ""
        if "time" in means:
            left = int((self.num_steps - self.total_steps - 1) * means["time"])
            eta = f"  {left // 3600:02d}h{left % 3600 // 60:02d}m"
        print(header + body + eta, flush=True)
        if "epe" in means:
            self.train_epe_list.append(means["epe"])
            self.train_steps_list.append(self.total_steps)
        self.running = {}

    def push_validation(self, results: Dict[str, float]):
        for k, v in results.items():
            self.val_results_dict.setdefault(k, []).append(float(v))
        self.val_steps_list.append(self.total_steps)

    # -- plots ------------------------------------------------------------
    def plot_train(self):
        self._plot(self.train_steps_list, self.train_epe_list, "EPE",
                   os.path.join(self.output, "train_epe.png"),
                   "Running training error (EPE)")

    def plot_val(self):
        for key, vals in self.val_results_dict.items():
            self._plot(self.val_steps_list[-len(vals):], vals, key,
                       os.path.join(self.output, f"{key}.png"),
                       f"Results for {key} for the validation set")

    @staticmethod
    def _plot(xs, ys, ylabel, path, title):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        plt.figure()
        plt.plot(xs, ys)
        plt.xlabel("x_steps")
        plt.ylabel(ylabel)
        plt.title(title)
        plt.savefig(path, bbox_inches="tight")
        plt.close()
