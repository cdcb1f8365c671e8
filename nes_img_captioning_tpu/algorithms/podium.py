"""Podium: the E best individuals seen so far, persisted as .pth files.

Semantics match the reference (src/algorithm/tools/podium.py): candidates are
(path, score) pairs; merging with the incumbents keeps the top E by score; a
generation is "good" iff a new file entered the podium. Files are copied into
``<best_dir>/best_elite/0_{i}_elite.pth`` (the reference layout, so resumes
and offline eval interoperate).
"""

from __future__ import annotations

import logging
import os

from ..utils.files import copy_file_from_to, mkdir_p, remove_all_files_but

logger = logging.getLogger(__name__)

__all__ = ["Podium"]


class Podium:
    def __init__(self, patience, directory: str, num_elites: int):
        self._best_elites: list[tuple[str, float]] = [
            ("", float("-inf")) for _ in range(num_elites)
        ]
        self._num_elites = num_elites
        self._patience = patience
        self._best_elite_dir = os.path.join(directory, "best_elite")
        self._new_best_elite_path = os.path.join(
            self._best_elite_dir, "0_{i}_elite.pth"
        )
        mkdir_p(self._best_elite_dir)
        self._bad_generation = True

    def init_from_infos(self, infos: dict):
        self._best_elites = []
        for i, (elite_path, sc) in enumerate(infos["best_elites"]):
            new_path = self._new_best_elite_path.format(i=i)
            copy_file_from_to(elite_path, new_path)
            self._best_elites.append((new_path, sc))

    def record_elites(self, elites_and_scores):
        all_cands = self._best_elites + list(elites_and_scores)
        sorted_cands = sorted(all_cands, key=lambda c: c[1], reverse=True)
        best_cands = sorted_cands[: self._num_elites]

        new_best, new_names = [], []
        for i, (elite, sc) in enumerate(best_cands):
            if elite:
                new_path = self._new_best_elite_path.format(i=i)
                new_best.append((new_path, sc))
                new_names.append(new_path)
                if elite != new_path:
                    try:
                        copy_file_from_to(elite, new_path)
                        self._bad_generation = False
                    except OSError:
                        logger.error("[Podium]: tried to copy non existing elite")
        self._best_elites = new_best
        remove_all_files_but(self._best_elite_dir, new_names)

    def is_bad_generation(self) -> bool:
        """Consume-and-reset: True iff no candidate entered the podium since
        the last call (feeds the patience counter)."""
        status = self._bad_generation
        logger.info("BAD GENERATION" if status else "GOOD GENERATION")
        self._bad_generation = True
        return status

    def best_elites(self):
        return self._best_elites
