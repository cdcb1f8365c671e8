"""Running per-generation statistics with the reference's exact checkpoint
schema (reference: src/algorithm/tools/statistics.py) so z_info JSONs are
interchangeable: score_stats (min/mean/max series), score_stds, time_stats,
acc_stats, norm_stats, noise_std_stats, bs_stats, mem_stats,
update_ratio_stats, time_elapsed, best_acc_so_far_stats.

Plotting writes the same per-series PDF files (loss_plot.pdf etc.).
"""

from __future__ import annotations

import logging
import time

import numpy as np

from ..utils.logger import log

__all__ = ["Statistics"]


class Statistics:
    def __init__(self):
        self._score_stats = [[], [], []]  # min, mean, max
        self._score_stds = []
        self._time_stats = []
        self._acc_stats = []
        self._norm_stats = []
        self._std_stats = []
        self._bs_stats = []
        self._mem_stats = [[], [], []]  # master max RSS, virtmem %, worker sum
        self._best_acc_so_far_stats = []
        self._update_ratio_stats = []

        self._step_tstart = 0.0
        self._tstart = time.time()
        self._time_elapsed = 0.0

    # ---- checkpoint round-trip ------------------------------------------------

    def init_from_infos(self, infos: dict):
        self._score_stats = infos.get("score_stats", self._score_stats)
        self._score_stds = infos.get("score_stds", self._score_stds)
        self._time_stats = infos.get("time_stats", self._time_stats)
        self._acc_stats = infos.get("acc_stats", self._acc_stats)
        self._norm_stats = infos.get("norm_stats", self._norm_stats)
        self._std_stats = infos.get("noise_std_stats", self._std_stats)
        self._bs_stats = infos.get("bs_stats", self._bs_stats)
        self._mem_stats = infos.get("mem_stats", self._mem_stats)
        self._update_ratio_stats = infos.get(
            "update_ratio_stats", self._update_ratio_stats
        )
        self._time_elapsed = infos.get("time_elapsed", self._time_elapsed)
        self._best_acc_so_far_stats = infos.get(
            "best_acc_so_far_stats", self._best_acc_so_far_stats
        )

    def to_dict(self) -> dict:
        return {
            "score_stats": self._score_stats,
            "score_stds": self._score_stds,
            "time_stats": self._time_stats,
            "acc_stats": self._acc_stats,
            "norm_stats": self._norm_stats,
            "noise_std_stats": self._std_stats,
            "bs_stats": self._bs_stats,
            "mem_stats": self._mem_stats,
            "update_ratio_stats": self._update_ratio_stats,
            "time_elapsed": self._time_elapsed,
            "best_acc_so_far_stats": self._best_acc_so_far_stats,
        }

    # ---- recording --------------------------------------------------------------

    def record_score_stats(self, scores: np.ndarray):
        scores = np.asarray(scores)
        self._score_stats[0].append(float(scores.min()))
        self._score_stats[1].append(float(scores.mean()))
        self._score_stats[2].append(float(scores.max()))
        self._score_stds.append(float(scores.std()))

    def record_acc_stats(self, value):
        self._acc_stats.append(float(value))

    def record_best_acc_stats(self, value):
        self._best_acc_so_far_stats.append(float(value))

    def record_norm_stats(self, param_vector):
        """Mean |theta| — reference calls this "norm"
        (statistics.py:143-145)."""
        v = np.asarray(param_vector)
        self._norm_stats.append(float(np.abs(v).sum() / v.size))

    def record_std_stats(self, value):
        self._std_stats.append(float(value))

    def record_bs_stats(self, value):
        self._bs_stats.append(int(value))

    def record_update_ratio(self, value):
        self._update_ratio_stats.append(float(value))

    def update_mem_stats(self):
        import psutil

        proc_rss = psutil.Process().memory_info().rss
        self._mem_stats[0].append(proc_rss)
        self._mem_stats[1].append(psutil.virtual_memory().percent)
        # single-process SPMD: there is no worker fleet; mirror master RSS so
        # the schema (and plots) stay parseable by reference tooling
        self._mem_stats[2].append(proc_rss)

    def set_step_tstart(self):
        self._step_tstart = time.time()

    def record_step_time_stats(self):
        dt = time.time() - self._step_tstart
        self._time_elapsed += dt
        self._time_stats.append(dt)

    # ---- output -------------------------------------------------------------------

    def log_stats(self):
        logging.info("---------------- STATS ----------------")
        log("RewMax", self._score_stats[2][-1])
        log("RewMean", self._score_stats[1][-1])
        log("RewMin", self._score_stats[0][-1])
        log("RewStd", self._score_stds[-1])
        log("EliteAcc", self._acc_stats[-1])
        log("BestEliteAcc", self._best_acc_so_far_stats[-1])
        log("NormMean", self._norm_stats[-1])
        if self._update_ratio_stats:
            log("UpdateRatio", self._update_ratio_stats[-1])
        log("TimeElapsedThisIter", time.time() - self._step_tstart)
        log("TimeElapsed", self._time_elapsed)
        if self._mem_stats[1]:
            log("MemUsage", self._mem_stats[1][-1])

    def plot_stats(self, log_dir: str):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        series = {
            "time": (self._time_stats, "Time per gen"),
            "norm": (self._norm_stats, "Norm of params"),
            "acc": (self._acc_stats, "Elite score"),
            "best_acc": (self._best_acc_so_far_stats, "Best elite score"),
            "master_mem": (self._mem_stats[0], "Master mem usage"),
            "worker_mem": (self._mem_stats[2], "Worker mem usage"),
            "virtmem": (self._mem_stats[1], "Virt mem usage"),
            "batch_size": (self._bs_stats, "Batch size"),
            "noise_std": (self._std_stats, "Noise stdev"),
            "reward_std": (self._score_stds, "Score stdev"),
        }
        if self._update_ratio_stats:
            series["update_ratio"] = (self._update_ratio_stats, "Update ratio")

        if self._score_stats[1]:
            fig = plt.figure()
            x = np.arange(len(self._score_stats[1]))
            plt.fill_between(
                x=x, y1=self._score_stats[0], y2=self._score_stats[2],
                facecolor="blue", alpha=0.3,
            )
            plt.plot(x, self._score_stats[1], color="blue")
            plt.title("Training score")
            plt.savefig(log_dir + "/loss_plot.pdf", format="pdf")
            plt.close(fig)

        for name, (lst, label) in series.items():
            fig = plt.figure()
            plt.plot(np.arange(len(lst)), lst)
            plt.title(label)
            plt.savefig(log_dir + "/{}_plot.pdf".format(name), format="pdf")
            plt.close(fig)

    # ---- accessors --------------------------------------------------------------

    def score_stats(self):
        return self._score_stats

    def acc_stats(self):
        return self._acc_stats

    def time_stats(self):
        return self._time_stats
