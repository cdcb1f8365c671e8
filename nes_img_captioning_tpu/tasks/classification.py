"""MNIST classification task: fitness = -cross-entropy on the batch,
validation = top-1 accuracy (reference: src/classification/policies.py).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from .base import Task
from ..data.core import DeviceDataset
from ..data.mnist import load_mnist
from ..models.mnist import MnistModel, MnistModelOptions

__all__ = ["MnistTask"]


class MnistTask(Task):
    artifact_is_fitness = True

    def __init__(self, exp: dict, config, tpu_cfg):
        popts = exp.get("policy_options", {})
        self.vbn = bool(popts.get("vbn", False))
        self.model = MnistModel(MnistModelOptions(vbn=self.vbn))
        self.config = config

        data_root = exp.get("data_root", "./data")
        raw = load_mnist(
            data_root,
            synthetic_sizes=tuple(exp.get("synthetic_sizes", (2048, 512))),
            seed=tpu_cfg.seed or 0,
        )
        self.train = DeviceDataset(
            {"x": raw["train_x"], "y": raw["train_y"]}, len(raw["train_y"])
        )
        self.val = DeviceDataset(
            {"x": raw["val_x"], "y": raw["val_y"]}, len(raw["val_y"])
        )
        self.test = DeviceDataset(
            {"x": raw["test_x"], "y": raw["test_y"]}, len(raw["test_y"])
        )

    @property
    def train_n(self) -> int:
        return self.train.n

    def device_consts(self) -> dict:
        return {"train_x": self.train["x"], "train_y": self.train["y"]}

    def _replicate_device_state(self, place):
        for ds in (self.train, self.val, self.test):
            ds.arrays = {k: place(v) for k, v in ds.arrays.items()}
        self._val_dev_cache = None  # rebuilt from the re-homed arrays

    # ---- fitness ---------------------------------------------------------------

    def rollout(self, theta, idx, key=None, consts=None):
        """-CrossEntropyLoss on the indexed batch
        (reference: src/classification/policies.py:16-45). The reference's
        VBN pre-pass over the ref batch is a no-op with
        track_running_stats=False (see models/params.py:batch_stat_norm), so
        no ref-batch plumbing is needed here."""
        if consts is None:
            x, y = self.train["x"][idx], self.train["y"][idx]
        else:
            x, y = consts["train_x"][idx], consts["train_y"][idx]
        logits = self.model.apply(theta, x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1).mean()
        return -nll

    # ---- validation -------------------------------------------------------------

    def _val_batches(self, xs, ys, bs: int) -> dict:
        """Equal full batches of a split, like the reference's loop over val
        batches (src/classification/policies.py:47-79) — the ONE batching
        used by host validation, device validation, and test scoring, so
        host/device score equivalence can't drift."""
        n_batches = xs.shape[0] // bs
        if self.config.num_val_batches:
            n_batches = min(n_batches, self.config.num_val_batches)
        n_batches = max(n_batches, 1)
        use = min(n_batches * bs, xs.shape[0])
        return {
            "xb": xs[:use].reshape(-1, bs, *xs.shape[1:])[:n_batches],
            "yb": ys[:use].reshape(-1, bs)[:n_batches],
        }

    def _acc_batched(self, theta, xs, ys, bs: int):
        if not hasattr(self, "_validate_jit"):
            self._validate_jit = jax.jit(self.validate_device)
        return float(self._validate_jit(theta, self._val_batches(xs, ys, bs)))

    def validate(self, theta) -> float:
        bs = self.config.val_batch_size or self.config.batch_size or 64
        bs = min(bs, self.val.n)
        return self._acc_batched(theta, self.val["x"], self.val["y"], bs)

    def device_val_consts(self) -> dict:
        """Pre-batched val arrays for in-program validation, cached (same
        device buffers each call so the fused program's operands don't
        churn)."""
        if getattr(self, "_val_dev_cache", None) is None:
            bs = self.config.val_batch_size or self.config.batch_size or 64
            bs = min(bs, self.val.n)
            self._val_dev_cache = self._val_batches(
                self.val["x"], self.val["y"], bs
            )
        return self._val_dev_cache

    def validate_device(self, theta, vconsts):
        """Traced mean of per-batch accuracies, usable inside a larger
        program; also the body of host validation (_acc_batched)."""
        def one(x, y):
            pred = jnp.argmax(self.model.apply(theta, x), axis=-1)
            return jnp.mean((pred == y).astype(jnp.float32))

        return jnp.mean(
            jax.lax.map(lambda a: one(*a), (vconsts["xb"], vconsts["yb"]))
        )

    def test_score(self, theta) -> float:
        bs = self.config.val_batch_size or self.config.batch_size or 64
        bs = min(bs, self.test.n)
        return self._acc_batched(theta, self.test["x"], self.test["y"], bs)

    # ---- sensitivity ------------------------------------------------------------

    def sensitivity_forward(self, theta, idx, consts=None):
        """Raw logits on the batch — the SM-G-* output for MNIST
        (reference: src/classification/nets.py:39-48)."""
        x = self.train["x"] if consts is None else consts["train_x"]
        return self.model.apply(theta, x[idx])
