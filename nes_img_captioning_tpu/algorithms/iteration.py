"""Per-generation bookkeeping: noise stdev / batch-size annealing (patience
and fixed schedule), counters, podium ownership, checkpoint round-trip.

Host-side port of the reference semantics
(reference: src/algorithm/tools/iteration.py). The result-counting machinery
(models_left_to_evolve / record_task_result) is gone: the Redis collect loop
is replaced by a single SPMD program, so a generation's results arrive all at
once. Everything that shapes the *training trajectory* — patience, schedule,
curriculum steps, podium, counters, z_info schema — is kept 1:1.
"""

from __future__ import annotations

import logging
import os

from .podium import Podium
from ..utils.config import Config
from ..utils.files import mkdir_p
from ..utils.logger import log

logger = logging.getLogger(__name__)

__all__ = ["Iteration"]


class Iteration:
    def __init__(self, config: Config, exp: dict):
        # ACROSS ITERATIONS (reference: iteration.py:16-30)
        self._noise_stdev = config.noise_stdev
        self._batch_size = config.batch_size
        self._times_orig_bs = 1
        self._nb_samples_used = 0
        self._bad_generations = 0
        self._patience_reached = False
        self._epoch = 0
        self._iteration = 0

        self._schedule_limit = config.schedule_limit
        self._schedule_start = config.schedule_start if config.schedule_start else 0
        self._schedule_reached = False

        # ENTIRE EXPERIMENT (reference: iteration.py:37-50)
        self._stdev_divisor = config.stdev_divisor
        self._bs_multiplier = config.bs_multiplier
        self._patience = config.patience
        self._nb_offspring = exp["nb_offspring"]

        self._log_dir = exp["log_dir"]
        self._models_dir = os.path.join(self._log_dir, "models")
        mkdir_p(self._models_dir)

        self._podium = Podium(
            config.patience,
            os.path.join(self._models_dir, "best"),
            num_elites=exp["num_elites"],
        )

        # WITHIN ONE ITERATION
        self._eval_results: dict = {}

        # algorithm-specific checkpoint state merged into to_dict()
        # (NES: current_model; ES: parents + elites_to_evaluate)
        self.extra_state: dict = {}

    # ---- checkpoint ------------------------------------------------------------

    def to_dict(self) -> dict:
        return {
            "iter": self._iteration,
            "epoch": self._epoch,
            "noise_stdev": self._noise_stdev,
            "batch_size": self._batch_size,
            "bad_generations": self._bad_generations,
            "times_orig_bs": self._times_orig_bs,
            "nb_samples_used": self._nb_samples_used,
            "best_elites": self.best_elites(),
            **self.extra_state,
        }

    def init_from_infos(self, infos: dict):
        # reference stores post-increment values; -1 so the next incr
        # lands on the recorded iteration (iteration.py:64-66)
        if "epoch" in infos:
            self._epoch = infos["epoch"] - 1
        if "iter" in infos:
            self._iteration = infos["iter"] - 1
        self._bad_generations = infos.get("bad_generations", self._bad_generations)
        self._noise_stdev = infos.get("noise_stdev", self._noise_stdev)
        self._batch_size = infos.get("batch_size", self._batch_size)
        self._times_orig_bs = infos.get("times_orig_bs", self._times_orig_bs)
        self._nb_samples_used = infos.get("nb_samples_used", self._nb_samples_used)
        self._podium.init_from_infos(infos)

    # ---- annealing ----------------------------------------------------------------

    def incr_epoch(self):
        self._epoch += 1

    def incr_iteration(self):
        self._eval_results = {}
        self._patience_reached = False
        self._schedule_reached = False
        self._iteration += 1
        self._nb_samples_used += self._batch_size

        if self.check_schedule_limit():
            logger.warning(
                "Next curriculum step reached; old std %s, bs: %s",
                self._noise_stdev, self._batch_size,
            )
            self._schedule_reached = True
            self.next_curriculum_step()
            logger.warning(
                "Next curriculum step reached; new std %s, bs: %s",
                self._noise_stdev, self._batch_size,
            )

    def check_schedule_limit(self) -> bool:
        return bool(
            self._schedule_limit
            and self._iteration >= self._schedule_start
            and (self._iteration - self._schedule_start) % self._schedule_limit == 0
        )

    def next_curriculum_step(self):
        self._noise_stdev /= self._stdev_divisor
        self._batch_size = int(self._batch_size * self._bs_multiplier)
        self._times_orig_bs *= self._bs_multiplier

    def process_evaluated_elites(self):
        """Hand this generation's elite evaluations to the podium and update
        the patience counter (reference: iteration.py:117-148). Candidates
        are (path, score) pairs recorded via record_eval_result."""
        best_sc, best_ind = float("-inf"), None
        elite_candidates = []
        for ind, sc in self._eval_results.values():
            if os.path.isfile(ind):
                elite_candidates.append((ind, sc))
                if sc > best_sc:
                    best_sc, best_ind = sc, ind

        self._podium.record_elites(elite_candidates)

        if self._patience and self._podium.is_bad_generation():
            self._bad_generations += 1
            if self._bad_generations > self._patience:
                logger.warning(
                    "Max patience reached; old std %s, bs: %s",
                    self._noise_stdev, self._batch_size,
                )
                self.next_curriculum_step()
                self._patience_reached = True
                self._bad_generations = 0
        else:
            self._bad_generations = 0
        return best_sc, best_ind

    # ---- eval bookkeeping ------------------------------------------------------

    def record_eval_result(self, cand_id, cand_path: str, score: float):
        """Keyed max-merge, like both reference subclasses
        (nic_es/iteration.py:132-137, nic_nes/iteration.py:43-47)."""
        prev = self._eval_results.get(cand_id, ("", None))[1]
        prev = prev if prev is not None else float("-inf")
        self._eval_results[cand_id] = (cand_path, max(score, prev))

    def eval_results(self):
        return self._eval_results

    # ---- logging -----------------------------------------------------------------

    def log_stats(self):
        log("NoiseStd", self._noise_stdev)
        log("BatchSize", self._batch_size)
        log("NbSamplesUsed", self._nb_samples_used)
        if self._patience:
            log("BadGen", f"{self._bad_generations}/{self._patience}")
        elif self._schedule_limit:
            if self._iteration <= self._schedule_start:
                part, full = self._iteration, self._schedule_start
            else:
                part = (self._iteration - self._schedule_start) % self._schedule_limit
                full = self._schedule_limit
            log("Schedule", f"{part}/{full}")

    # ---- accessors --------------------------------------------------------------

    def patience_reached(self):
        return self._patience_reached

    def schedule_reached(self):
        return self._schedule_reached

    def epoch(self):
        return self._epoch

    def iteration(self):
        return self._iteration

    def noise_stdev(self):
        return self._noise_stdev

    get_noise_stdev = noise_stdev

    def batch_size(self):
        return self._batch_size

    def times_orig_bs(self):
        return self._times_orig_bs

    def nb_samples_used(self):
        return self._nb_samples_used

    def nb_offspring(self):
        return self._nb_offspring

    def models_dir(self):
        return self._models_dir

    def best_elites(self):
        return self._podium.best_elites()

    def best_elite(self):
        return self._podium.best_elites()[0][0]
