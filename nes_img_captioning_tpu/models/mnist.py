"""Small MNIST CNN (the reference's cheap smoke-test model).

Reference: src/classification/nets.py — conv(1->10,5) -> [bn] -> relu ->
maxpool2 -> conv(10->20,5) -> [bn] -> relu -> maxpool2 -> fc(320->10).

Init quirk replicated from src/algorithm/nets.py:62-69: parameters whose name
contains '1' are excluded from the xavier/zeros managed init, so conv1 and fc1
(and bn1) keep torch-default initialization while conv2 gets xavier weights
and zero bias.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .params import Leaf, ParamSpec, dense, norm_leaves

__all__ = ["MnistModelOptions", "MnistModel"]


@dataclasses.dataclass(frozen=True)
class MnistModelOptions:
    vbn: bool = False


def _build_spec(o: MnistModelOptions) -> ParamSpec:
    leaves = [
        # conv1/fc1 names contain '1' -> torch-default init (see module doc)
        Leaf("conv1.weight", (10, 1, 5, 5), "kaiming_uniform"),
        Leaf("conv1.bias", (10,), "uniform_fan", init_fan=1 * 5 * 5),
        Leaf("conv2.weight", (20, 10, 5, 5), "xavier_normal"),
        Leaf("conv2.bias", (20,), "zeros"),
        Leaf("fc1.weight", (10, 320), "kaiming_uniform"),
        Leaf("fc1.bias", (10,), "uniform_fan", init_fan=320),
    ]
    if o.vbn:
        leaves += norm_leaves("bn1", 10, affine=True)
        leaves += norm_leaves("bn2", 20, affine=True)
    return ParamSpec(tuple(leaves))


def _conv_valid(x, w, b):
    """NCHW valid conv with torch OIHW weights, stride 1."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


def _bn2d(x, w, b):
    """BatchNorm2d(track_running_stats=False): batch stats over (N,H,W)."""
    mean = jnp.mean(x, axis=(0, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(0, 2, 3), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    return y * w[None, :, None, None] + b[None, :, None, None]


class MnistModel:
    """Parameter spec + pure apply for the MNIST CNN."""

    def __init__(self, options: MnistModelOptions = MnistModelOptions()):
        self.options = options
        self.spec = _build_spec(options)

    @property
    def num_params(self) -> int:
        return self.spec.num_params

    def apply(self, theta, x):
        """Logits for a batch of images x: (B, 1, 28, 28) -> (B, 10)."""
        p = self.spec.unravel(theta)
        o = self.options
        x = _conv_valid(x, p["conv1.weight"], p["conv1.bias"])
        if o.vbn:
            x = _bn2d(x, p["bn1.weight"], p["bn1.bias"])
        x = _maxpool2(jax.nn.relu(x))
        x = _conv_valid(x, p["conv2.weight"], p["conv2.bias"])
        if o.vbn:
            x = _bn2d(x, p["bn2.weight"], p["bn2.bias"])
        x = _maxpool2(jax.nn.relu(x))
        x = x.reshape(x.shape[0], -1)  # (B, 320), CHW order as in torch .view
        return dense(x, p["fc1.weight"], p["fc1.bias"])

    def forward_for_sensitivity(self, theta, x):
        """Plain forward — the MNIST sensitivity output is the raw logits
        (reference: src/classification/nets.py:39-48)."""
        return self.apply(theta, x)
