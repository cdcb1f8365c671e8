"""Task interface consumed by the NES/ES engines.

A task owns: the model family (param spec + apply fns), the device-resident
dataset, the fitness definition, and validation scoring. The engines only see
this surface — the same split as the reference's Policy/Experiment plugins
(reference: src/algorithm/policies.py:44-172).

The fitness path is two-phase to accommodate host-side scorers (CIDEr-D):

* ``rollout(theta, idx)`` — pure jax function: one individual, one batch
  (``idx`` indexes the device dataset). Returns either the scalar fitness
  (``artifact_is_fitness=True``) or device artifacts (token sequences,
  logprobs) that ``host_fitness`` turns into scalars on host.
* ``host_fitness(artifacts, idx)`` — numpy in, (…,) fitness array out.
"""

from __future__ import annotations

import abc

__all__ = ["Task"]


class Task(abc.ABC):
    #: True when rollout() already returns the scalar fitness on device.
    artifact_is_fitness: bool = True

    #: model family object exposing .spec (ParamSpec)
    model = None

    @property
    def fitness_on_device(self) -> bool:
        """True when rollout() already returns the scalar fitness (directly
        or as {'fitness': scalar}) — enables the engines' fused
        one-dispatch-per-generation path."""
        return self.artifact_is_fitness

    @property
    def spec(self):
        return self.model.spec

    @property
    @abc.abstractmethod
    def train_n(self) -> int:
        """Number of training items (defines generations per epoch)."""

    def place_on_mesh(self, mesh):
        """Multi-controller runs: re-home every device-resident dataset as a
        mesh-replicated GLOBAL array (local arrays cannot feed a
        process-spanning jit). Single-controller runs never call this."""
        from ..parallel.multihost import replicate_global

        self._replicate_device_state(
            lambda x: replicate_global(mesh, x)
        )

    def _replicate_device_state(self, place):
        raise NotImplementedError(
            f"{type(self).__name__} does not define its device state for "
            "multi-host placement"
        )

    def device_consts(self) -> dict:
        """Pytree of device-resident arrays the rollout/sensitivity paths
        read (datasets, scorer tables). The engines pass this as an EXPLICIT
        jit operand and hand it back through ``rollout(..., consts=...)`` —
        closure-capturing these arrays during tracing would bake their bytes
        into every executable as XLA constants and into the persistent
        compile-cache key (any host-side rebuild then silently recompiles
        every program embedding them)."""
        return {}

    @abc.abstractmethod
    def rollout(self, theta, idx, key=None, consts=None):
        """Pure fn: fitness scalar or artifacts for one individual on the
        training batch given by index vector ``idx``. ``key`` seeds any
        stochastic decoding (sampled captions); tasks may ignore it.
        ``consts`` is the pytree from ``device_consts`` threaded through jit
        by the engines; ``None`` falls back to the task's own device arrays
        (fine eagerly or in throwaway jits, not on the engine hot paths)."""

    def host_fitness(self, artifacts, idx):
        import numpy as np

        return np.asarray(artifacts)

    @abc.abstractmethod
    def validate(self, theta) -> float:
        """Validation score of one individual (accuracy / CIDEr)."""

    def device_val_consts(self) -> dict | None:
        """Device-array pytree for IN-PROGRAM validation (``validate_device``
        below), threaded through jit as an operand like ``device_consts``.
        ``None`` = this task can only validate host-side; engines then fall
        back to per-candidate ``validate`` calls."""
        return None

    def validate_device(self, theta, vconsts):
        """jax-traceable validation score (same quantity as ``validate`` to
        f32 accuracy) — lets the ES engine fuse elite-candidate validation
        into the generation program. ``vconsts`` = device_val_consts()."""
        raise NotImplementedError

    def test_score(self, theta) -> float:
        """Test-set score (offline eval); default mirrors validate."""
        raise NotImplementedError

    def generate_theta(self, key):
        """Random individual, reference init rules."""
        return self.spec.init_theta(key)
