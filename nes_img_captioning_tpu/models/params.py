"""Flat-parameter model substrate.

The canonical representation of an individual is a single flat float32 vector
``theta`` whose element order matches torch's ``nn.utils.parameters_to_vector``
over the reference model's ``named_parameters()``
(reference: src/algorithm/nets.py:101,167-168). Keeping the torch ordering and
the torch weight layout — Linear weights are (out, in), Conv weights are
(out, in, kh, kw) — makes three things trivially correct at once:

* bit-exact import/export of reference ``.pth`` state_dicts,
* ``SM-VECTOR`` sensitivity vectors indexed over the same flat layout,
* population-level math (mutation, NES gradient) as single vector ops that
  ``vmap`` cleanly over a population axis.

Inside jit, ``unravel`` is free (slice + reshape only), so apply functions
work on a dict of shaped arrays while the algorithms see flat vectors.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Leaf", "ParamSpec", "reference_init_kind", "torch_fans"]


def torch_fans(shape: tuple[int, ...]) -> tuple[int, int]:
    """fan_in/fan_out following torch.nn.init._calculate_fan_in_and_fan_out."""
    if len(shape) < 2:
        raise ValueError(f"fan undefined for shape {shape}")
    receptive = int(np.prod(shape[2:])) if len(shape) > 2 else 1
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    return fan_in, fan_out


@dataclasses.dataclass(frozen=True)
class Leaf:
    """One named parameter tensor.

    ``init`` kinds:
      xavier_normal   N(0, sqrt(2/(fan_in+fan_out)))   (managed weights)
      zeros           (managed biases; default bn/ln bias)
      ones            (default bn/ln weight)
      kaiming_uniform U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (torch default
                      Linear/Conv weight, a=sqrt(5))
      uniform_fan     U(-1/sqrt(init_fan), 1/sqrt(init_fan)) (torch default
                      bias; init_fan = fan_in of the owning layer's weight)
      normal          N(0, 1) (torch default Embedding weight)
    """

    name: str
    shape: tuple[int, ...]
    init: str = "zeros"
    init_fan: int = 0  # fan_in used by 'uniform_fan'

    @property
    def size(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1


def reference_init_kind(name: str, is_weight: bool) -> bool:
    """Whether the reference "manages" this leaf's init.

    The reference xavier-inits weights and zeros biases only for params whose
    name contains none of 'bn', 'ln', '1' (src/algorithm/nets.py:62-69). The
    '1' rule is a hack to skip Sequential-wrapped batchnorm params, but it
    also leaves e.g. MnistNet's conv1/fc1 at torch-default init — we replicate
    that quirk.
    """
    del is_weight
    return ("bn" not in name) and ("ln" not in name) and ("1" not in name)


def _init_leaf(leaf: Leaf, key: jax.Array) -> jax.Array:
    if leaf.init == "zeros":
        return jnp.zeros(leaf.shape, jnp.float32)
    if leaf.init == "ones":
        return jnp.ones(leaf.shape, jnp.float32)
    if leaf.init == "xavier_normal":
        fan_in, fan_out = torch_fans(leaf.shape)
        std = math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, leaf.shape, jnp.float32)
    if leaf.init == "kaiming_uniform":
        fan_in, _ = torch_fans(leaf.shape)
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, leaf.shape, jnp.float32, -bound, bound)
    if leaf.init == "uniform_fan":
        bound = 1.0 / math.sqrt(max(leaf.init_fan, 1))
        return jax.random.uniform(key, leaf.shape, jnp.float32, -bound, bound)
    if leaf.init == "normal":
        return jax.random.normal(key, leaf.shape, jnp.float32)
    raise ValueError(f"unknown init kind {leaf.init!r}")


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    """Ordered parameter layout for one model family."""

    leaves: tuple[Leaf, ...]

    def __post_init__(self):
        offsets = {}
        off = 0
        for leaf in self.leaves:
            offsets[leaf.name] = off
            off += leaf.size
        object.__setattr__(self, "_offsets", offsets)
        object.__setattr__(self, "_num_params", off)

    @property
    def num_params(self) -> int:
        return self._num_params

    @property
    def names(self) -> tuple[str, ...]:
        return tuple(l.name for l in self.leaves)

    def offset(self, name: str) -> int:
        return self._offsets[name]

    # ---- init --------------------------------------------------------------

    def init_theta(self, key: jax.Array) -> jax.Array:
        """Random init following the reference's rules; returns flat f32."""
        parts = []
        for i, leaf in enumerate(self.leaves):
            parts.append(_init_leaf(leaf, jax.random.fold_in(key, i)).ravel())
        return jnp.concatenate(parts)

    # ---- flat <-> shaped ----------------------------------------------------

    def unravel(self, theta: jax.Array) -> dict[str, jax.Array]:
        out = {}
        for leaf in self.leaves:
            off = self._offsets[leaf.name]
            out[leaf.name] = jax.lax.dynamic_slice_in_dim(
                theta, off, leaf.size
            ).reshape(leaf.shape)
        return out

    def ravel(self, params: dict[str, jax.Array]) -> jax.Array:
        return jnp.concatenate(
            [jnp.asarray(params[l.name]).reshape(-1) for l in self.leaves]
        )

    # ---- torch .pth interop --------------------------------------------------
    # torch is used for (de)serialization only — the reference checkpoint
    # format is a pickled state_dict (src/algorithm/nets.py:153-161).

    def from_state_dict(self, state_dict) -> np.ndarray:
        parts = []
        for leaf in self.leaves:
            if leaf.name not in state_dict:
                raise KeyError(
                    f"state_dict missing {leaf.name!r}; has {list(state_dict)}"
                )
            t = state_dict[leaf.name]
            arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
            if tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"{leaf.name}: shape {arr.shape} != expected {leaf.shape}"
                )
            parts.append(arr.astype(np.float32).ravel())
        return np.concatenate(parts)

    def to_state_dict(self, theta) -> dict:
        import torch

        theta = np.asarray(theta, dtype=np.float32)
        if theta.shape != (self.num_params,):
            raise ValueError(f"theta shape {theta.shape} != ({self.num_params},)")
        out = {}
        for leaf in self.leaves:
            off = self._offsets[leaf.name]
            out[leaf.name] = torch.from_numpy(
                theta[off : off + leaf.size].reshape(leaf.shape).copy()
            )
        return out

    def load_pth(self, path: str) -> np.ndarray:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        return self.from_state_dict(sd)

    def save_pth(self, theta, path: str) -> str:
        import torch

        torch.save(self.to_state_dict(theta), path)
        return path


def managed_linear(name: str, out_f: int, in_f: int) -> list[Leaf]:
    """Linear layer leaves under the reference's managed-init rule."""
    if reference_init_kind(name + ".weight", True):
        w_init, b_init = "xavier_normal", "zeros"
        return [
            Leaf(name + ".weight", (out_f, in_f), w_init),
            Leaf(name + ".bias", (out_f,), b_init),
        ]
    return [
        Leaf(name + ".weight", (out_f, in_f), "kaiming_uniform"),
        Leaf(name + ".bias", (out_f,), "uniform_fan", init_fan=in_f),
    ]


def norm_leaves(name: str, dim: int, affine: bool) -> list[Leaf]:
    """BatchNorm/LayerNorm affine leaves (torch default: weight=1, bias=0)."""
    if not affine:
        return []
    return [Leaf(name + ".weight", (dim,), "ones"), Leaf(name + ".bias", (dim,), "zeros")]


# Small functional helpers shared by model apply fns -------------------------


def dense(x: jax.Array, w: jax.Array, b: jax.Array | None) -> jax.Array:
    """Linear layer with torch (out,in) weight layout."""
    y = x @ w.T
    return y if b is None else y + b


def batch_stat_norm(
    x: jax.Array, weight: jax.Array | None, bias: jax.Array | None, eps: float = 1e-5
) -> jax.Array:
    """BatchNorm1d(track_running_stats=False) semantics.

    With track_running_stats=False torch normalizes with the *current* batch
    statistics in both train and eval mode, so the reference's "virtual batch
    norm" pre-pass over the ref batch has no effect on later passes
    (reference: src/captioning/nets.py:89-91, src/captioning/policies.py:104-108).
    We implement the effective behavior: per-feature batch-stat normalization.
    Uses the biased variance like torch's functional batch_norm.
    """
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.var(x, axis=0, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y


def layer_norm(
    x: jax.Array, weight: jax.Array | None, bias: jax.Array | None, eps: float = 1e-5
) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y


Apply = Callable[..., jax.Array]
