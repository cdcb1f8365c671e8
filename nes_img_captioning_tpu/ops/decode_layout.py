"""Decode-ordered flat parameter layout for the fused-decode fast path.

The canonical individual is a flat f32 vector in torch parameters_to_vector
order (models/params.py). The fused decode kernel, however, consumes weights
pre-transposed and vocab-padded (ops/decode_pallas.py:prepare_decode_params),
so the per-member prep on the eval hot path is unravel + transpose + pad +
cast — measured at ~12 ms/generation at bench scale against a ~6 ms
HBM-bandwidth floor (docs/RESULTS.md): the transposed tables materialize an
extra full pass over the ~11 MB of weights for every one of the 288 members.

This module moves the transposes off the per-member path: ``to_dec`` builds a
flat, decode-ordered, pre-padded f32 vector ONCE per generation; per member
the prep is then ``theta_dec + scale_dec * noise`` followed by slice/reshape/
cast — a single fusable elementwise pass. The NES gradient is aggregated in
decode order and mapped back with ``from_dec`` (linear, so
``from_dec(sum w_i * delta_dec_i) == sum w_i * from_dec(delta_dec_i)``),
once per generation.

Pad lanes (the vocab rows/cols between vocab_size+1 and the 128-lane
multiple) draw ZERO noise — the per-member delta is ``scale_dec * normal``
and the scale vector is laid out with ``pad_scale=0`` — so the padded logit
bias stays exactly at NEG and argmax can never emit a pad token; ``from_dec``
drops the pad lanes so nothing reaches the gradient. Equivalence with the
torch-order path is exact per member for the same realized delta
(tests/test_decode_layout.py).

Reference counterpart: the mutation + rollout of the NES evolve job
(src/algorithm/nets.py:83-119, src/captioning/nets.py:183-245); this is a
pure device-layout optimization with identical algorithm semantics.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .decode_pallas import NEG, pad_vocab

__all__ = ["DecodeLayout"]


class DecodeLayout:
    """Flat decode-ordered layout for the (no-norm) FC captioning model.

    Tensor order mirrors prepare_decode_params' output dict; weights are
    stored transposed to (in, out) and vocab-sized tensors padded to the
    lane multiple, so ``prep`` is slice + reshape + cast only.
    """

    def __init__(self, spec, options):
        V1 = options.vocab_size + 1
        Vpad = pad_vocab(V1)
        E, R, F = (options.input_encoding_size, options.rnn_size,
                   options.fc_feat_size)
        self.spec = spec
        self.V1, self.Vpad = V1, Vpad
        # (decode name, source leaf, decode shape, transposed?, pad value,
        #  pad axis) — pad axis None = unpadded; 0/1 = the vocab axis padded
        # from V1 to Vpad. Biases are stored flat; prep reshapes them to the
        # kernel's (1, N) layout.
        self.tensors = (
            ("img_w", "img_embed.weight", (F, E), True, 0.0, None),
            ("img_b", "img_embed.bias", (1, E), False, 0.0, None),
            ("i2h_w", "core.i2h.weight", (E, 5 * R), True, 0.0, None),
            ("i2h_b", "core.i2h.bias", (1, 5 * R), False, 0.0, None),
            ("h2h_w", "core.h2h.weight", (R, 5 * R), True, 0.0, None),
            ("h2h_b", "core.h2h.bias", (1, 5 * R), False, 0.0, None),
            ("logit_w", "logit.weight", (R, Vpad), True, 0.0, 1),
            ("logit_b", "logit.bias", (1, Vpad), False, NEG, 1),
            ("embed", "embed.weight", (Vpad, E), False, 0.0, 0),
        )
        self._offsets = {}
        off = 0
        for name, _, shape, *_ in self.tensors:
            self._offsets[name] = off
            off += int(np.prod(shape))
        self.dim_dec = off

    # ---- flat torch order <-> flat decode order --------------------------------------

    def to_dec(self, flat, pad_scale: float = 1.0) -> jax.Array:
        """Flat torch-order vector -> flat decode-ordered padded f32.
        ``pad_scale`` scales each tensor's pad value (1.0 for theta so the
        padded logit bias lands at NEG; 0.0 for noise-scale vectors so pad
        lanes draw zero-mean noise of harmless magnitude)."""
        p = self.spec.unravel(flat)
        parts = []
        for _, leaf, shape, transposed, pad_val, pad_axis in self.tensors:
            t = p[leaf]
            if transposed:
                t = t.T
            if pad_axis is not None:
                t = t.reshape(shape[0] if pad_axis == 1 else self.V1, -1)
                width = [(0, 0), (0, 0)]
                width[pad_axis] = (0, self.Vpad - self.V1)
                t = jnp.pad(t, width, constant_values=pad_val * pad_scale)
            parts.append(t.reshape(-1))
        return jnp.concatenate(parts)

    def from_dec(self, flat_dec) -> jax.Array:
        """Flat decode-ordered vector -> flat torch-order (pads dropped,
        transposes undone). Linear; used once per generation to bring the
        decode-space gradient back to optimizer order."""
        shaped = {}
        for name, leaf, shape, transposed, _, pad_axis in self.tensors:
            t = jax.lax.dynamic_slice_in_dim(
                flat_dec, self._offsets[name], int(np.prod(shape))
            ).reshape(shape)
            if pad_axis == 1:
                t = t[:, : self.V1]
            elif pad_axis == 0:
                t = t[: self.V1]
            if transposed:
                t = t.T
            if name.endswith("_b"):  # bias rows back to 1-D
                t = t.reshape(-1)
            shaped[leaf] = t
        return jnp.concatenate(
            [shaped[l.name].reshape(-1) for l in self.spec.leaves]
        )

    def flat_dec(self, params: dict) -> jax.Array:
        """Inverse of ``prep``'s shaping: a params dict (prepare_decode_params
        layout) -> the flat decode-ordered f32 vector. Used by the
        kernel-noise gradient path to bring pair_grad_rng's per-tensor
        accumulators back to the flat form from_dec consumes."""
        return jnp.concatenate([
            jnp.asarray(params[name], jnp.float32).reshape(-1)
            for name, *_ in self.tensors
        ])

    # ---- per-member prep --------------------------------------------------------------

    def prep(self, vec_dec, dtype) -> dict:
        """Flat decode-ordered member vector -> the params dict consumed by
        decode_fused. Weights cast to ``dtype``, biases stay f32 — identical
        tensor-for-tensor to prepare_decode_params(theta) when ``vec_dec`` is
        ``to_dec(theta)`` (tested)."""
        out = {}
        for name, _, shape, *_ in self.tensors:
            t = jax.lax.dynamic_slice_in_dim(
                vec_dec, self._offsets[name], int(np.prod(shape))
            ).reshape(shape)
            out[name] = (t.astype(jnp.float32) if name.endswith("_b")
                         else t.astype(dtype))
        return out
