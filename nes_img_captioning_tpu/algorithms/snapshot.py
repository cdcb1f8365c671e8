"""Checkpoint writer: the reference's z_info JSON format
(reference: src/algorithm/tools/snapshot.py:14-38).

One ``z_info_e{epoch}_i{iter}-{trainloader_lth}.json`` per snapshot dir
(previous one deleted), merging stats + iteration + experiment dicts. The
JSON references .pth/.tar artifacts on disk — together they are the resumable
checkpoint, loadable by ``from_infos`` here or in the reference.
"""

from __future__ import annotations

import json
import logging
import os

from ..utils.files import mkdir_p, remove_file_with_pattern

logger = logging.getLogger(__name__)

__all__ = ["save_snapshot"]

INFOS_PATTERN = r"z_info_e[0-9]*?_i[0-9]*?-[0-9]*?.json"


def save_snapshot(stats, it, experiment) -> str:
    directory = mkdir_p(experiment.snapshot_dir())
    remove_file_with_pattern(INFOS_PATTERN, directory)
    filename = "z_info_e{e}_i{i}-{n}.json".format(
        e=it.epoch(), i=it.iteration(), n=experiment.orig_trainloader_lth()
    )
    infos = {**stats.to_dict(), **it.to_dict(), **experiment.to_dict()}
    path = os.path.join(directory, filename)
    assert not os.path.exists(path)
    with open(path, "w") as f:
        json.dump(infos, f)
    logger.info("Saved snapshot %s", filename)
    return path
