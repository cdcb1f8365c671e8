"""Task plugins: dataset + net + fitness, mirroring the reference's
classification/captioning plugin split (reference: src/classification/,
src/captioning/; registry at src/algorithm/policies.py:16-29)."""

from .base import Task

__all__ = ["Task", "make_task"]


def make_task(exp: dict, config, tpu_cfg) -> Task:
    dataset = exp["dataset"]
    if dataset == "mnist":
        from .classification import MnistTask

        return MnistTask(exp, config, tpu_cfg)
    if dataset == "mscoco":
        from .captioning import CocoTask

        return CocoTask(exp, config, tpu_cfg)
    raise ValueError(f"unsupported dataset {dataset!r}")
