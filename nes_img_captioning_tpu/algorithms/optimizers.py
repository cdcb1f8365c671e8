"""NES theta optimizers: SGD-with-momentum and Adam.

Numerically identical to the reference's NumPy optimizers
(reference: src/algorithm/nic_nes/optimizers.py:38-107, themselves from
openai/evolution-strategies-starter), but as pure JAX functions so the update
runs on device, fused with the gradient aggregation. ``update`` consumes the
*already-negated* gradient plus L2 term, exactly like the reference call site
``optimizer.update(-grad_estimate + l2coeff * theta)``
(src/algorithm/nic_nes/nic_nes_master.py:133) and returns
``(update_ratio, new_theta)`` where ratio = ||step|| / ||theta||.

State save/load speaks the reference's ``optimizer.tar`` torch format
(keys: dim/t/stepsize/[momentum|beta1/beta2/epsilon]/[v|m,v] —
src/algorithm/nic_nes/optimizers.py:49-65,85-107).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["OptState", "Optimizer", "SGD", "Adam", "make_optimizer"]


@dataclasses.dataclass
class OptState:
    """Device-resident optimizer state. ``m`` unused (zeros) for SGD."""

    t: jax.Array  # int32 scalar — step count
    m: jax.Array  # (dim,)  Adam first moment
    v: jax.Array  # (dim,)  SGD momentum buffer / Adam second moment


def init_state(dim: int) -> OptState:
    return OptState(
        t=jnp.zeros((), jnp.int32),
        m=jnp.zeros((dim,), jnp.float32),
        v=jnp.zeros((dim,), jnp.float32),
    )


jax.tree_util.register_dataclass(
    OptState, data_fields=["t", "m", "v"], meta_fields=[]
)


class Optimizer:
    """Stateless math + host-side hyperparameters (stepsize is host-side
    because annealing divides it between generations —
    reference: nic_nes_master.py:139-141)."""

    kind = ""

    def __init__(self, stepsize: float):
        self.stepsize = float(stepsize)

    def init(self, dim: int) -> OptState:
        return init_state(dim)

    def step(self, state: OptState, theta, globalg, stepsize):
        """Pure: (state, theta, g, stepsize) -> (state', theta', ratio)."""
        raise NotImplementedError

    def update(self, state: OptState, theta, globalg):
        return self.step(state, theta, globalg, self.stepsize)

    # ---- reference .tar interop ---------------------------------------------

    def state_to_dict(self, state: OptState, dim: int) -> dict:
        raise NotImplementedError

    def state_from_dict(self, d: dict) -> OptState:
        raise NotImplementedError

    def save_to_file(self, state: OptState, dim: int, path: str):
        import torch

        torch.save(self.state_to_dict(state, dim), path)

    def load_from_file(self, path: str) -> OptState:
        import torch

        d = torch.load(path, map_location="cpu", weights_only=False)
        return self.state_from_dict(d)


class SGD(Optimizer):
    kind = "sgd"

    def __init__(self, stepsize: float, momentum: float = 0.9):
        super().__init__(stepsize)
        self.momentum = float(momentum)

    def step(self, state, theta, globalg, stepsize):
        v = self.momentum * state.v + (1.0 - self.momentum) * globalg
        step = -stepsize * v
        ratio = jnp.linalg.norm(step) / jnp.linalg.norm(theta)
        new = OptState(t=state.t + 1, m=state.m, v=v)
        return new, theta + step, ratio

    def state_to_dict(self, state, dim):
        return {
            "dim": dim,
            "t": int(state.t),
            "momentum": self.momentum,
            "stepsize": self.stepsize,
            "v": np.asarray(state.v),
        }

    def state_from_dict(self, d):
        self.stepsize = float(d["stepsize"])
        self.momentum = float(d["momentum"])
        v = jnp.asarray(np.asarray(d["v"]), jnp.float32)
        return OptState(
            t=jnp.asarray(int(d["t"]), jnp.int32), m=jnp.zeros_like(v), v=v
        )


class Adam(Optimizer):
    kind = "adam"

    def __init__(self, stepsize: float, beta1=0.9, beta2=0.999, epsilon=1e-08):
        super().__init__(stepsize)
        self.beta1, self.beta2, self.epsilon = float(beta1), float(beta2), float(epsilon)

    def step(self, state, theta, globalg, stepsize):
        t = state.t + 1
        tf = t.astype(jnp.float32)
        a = stepsize * jnp.sqrt(1 - self.beta2**tf) / (1 - self.beta1**tf)
        m = self.beta1 * state.m + (1 - self.beta1) * globalg
        v = self.beta2 * state.v + (1 - self.beta2) * (globalg * globalg)
        step = -a * m / (jnp.sqrt(v) + self.epsilon)
        ratio = jnp.linalg.norm(step) / jnp.linalg.norm(theta)
        return OptState(t=t, m=m, v=v), theta + step, ratio

    def state_to_dict(self, state, dim):
        return {
            "dim": dim,
            "t": int(state.t),
            "stepsize": self.stepsize,
            "beta1": self.beta1,
            "beta2": self.beta2,
            "epsilon": self.epsilon,
            "m": np.asarray(state.m),
            "v": np.asarray(state.v),
        }

    def state_from_dict(self, d):
        self.stepsize = float(d["stepsize"])
        self.beta1, self.beta2 = float(d["beta1"]), float(d["beta2"])
        self.epsilon = float(d["epsilon"])
        m = jnp.asarray(np.asarray(d["m"]), jnp.float32)
        v = jnp.asarray(np.asarray(d["v"]), jnp.float32)
        return OptState(t=jnp.asarray(int(d["t"]), jnp.int32), m=m, v=v)


def make_optimizer(optimizer_options: dict) -> Optimizer:
    """From the experiment JSON's ``optimizer_options``
    (reference: src/algorithm/nic_nes/experiment.py:20-23)."""
    kind = optimizer_options["type"]
    args = optimizer_options.get("args", {})
    return {"sgd": SGD, "adam": Adam}[kind](**args)
