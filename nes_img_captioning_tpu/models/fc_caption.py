"""FC image-captioning model: LSTM decoder over a single image feature.

TPU-native reimplementation of the reference's evolved captioning network
(reference: src/captioning/nets.py — FCModel + LSTMCore, itself based on the
"FC" model of ruotianluo/self-critical.pytorch):

* ``img_embed``: Linear(fc_feat_size -> input_encoding_size)
* ``embed``:     Embedding(vocab_size+1 -> input_encoding_size)
* ``logit``:     Linear(rnn_size -> vocab_size+1)
* ``core``:      single LSTM layer with fused i2h/h2h projections producing
                 5*rnn_size pre-activations: 3 sigmoid gates (in/forget/out)
                 and a **maxout** candidate max(chunk4, chunk5)
                 (reference: src/captioning/nets.py:109-121),
                 with optional VBN (batch-stat norm) or LayerNorm on the
                 i2h/h2h projections and the cell state.

The greedy/multinomial rollout (reference FCModel._sample,
src/captioning/nets.py:183-245) becomes a fixed-length ``lax.scan``:
t=0 feeds the image embedding (state warm-up), then 16 token steps. The
reference's early ``break`` when all sequences finish is reproduced exactly by
masking: tokens after the first 0 are zeroed via the ``unfinished`` mask, and
logprob writes stop one step after the whole batch finishes (the torch loop
writes the step on which the batch finishes, then breaks). The reference's
t == seq_length+1 iteration computes logits and immediately breaks, so we skip
it entirely.

Everything here is a pure function of ``(theta, inputs)`` so it vmaps over a
population axis and shards over a device mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .params import (
    Leaf,
    ParamSpec,
    batch_stat_norm,
    dense,
    layer_norm,
    managed_linear,
    norm_leaves,
)

__all__ = ["FCModelOptions", "FCCaptionModel"]


@dataclasses.dataclass(frozen=True)
class FCModelOptions:
    """Mirror of the reference ModelOptions fields the FC model consumes
    (reference: src/algorithm/policies.py:36-41)."""

    vocab_size: int
    input_encoding_size: int = 128
    rnn_size: int = 128
    fc_feat_size: int = 2048
    seq_length: int = 16
    vbn: bool = False
    vbn_e: bool = False
    vbn_affine: bool = False
    layer_n: bool = False
    layer_n_affine: bool = False


def _build_spec(o: FCModelOptions) -> ParamSpec:
    V1 = o.vocab_size + 1
    E, R, F = o.input_encoding_size, o.rnn_size, o.fc_feat_size
    leaves: list[Leaf] = []

    if o.vbn_e:
        # Sequential wrapping renames leaves to <mod>.0.* / <mod>.1.*
        # (reference: src/captioning/nets.py:156-165). Parameter order follows
        # torch module insertion order with duplicates (the standalone *_bn
        # attributes) deduplicated.
        leaves += managed_linear("img_embed.0", E, F)
        leaves += norm_leaves("img_embed.1", E, o.vbn_affine)
        leaves += [Leaf("embed.0.weight", (V1, E), "xavier_normal")]
        leaves += norm_leaves("embed.1", E, o.vbn_affine)
    else:
        leaves += managed_linear("img_embed", E, F)
        leaves += [Leaf("embed.weight", (V1, E), "xavier_normal")]

    leaves += managed_linear("logit", V1, R)
    leaves += managed_linear("core.i2h", 5 * R, E)
    leaves += managed_linear("core.h2h", 5 * R, R)

    if o.vbn:
        leaves += norm_leaves("core.i2h_bn", 5 * R, o.vbn_affine)
        leaves += norm_leaves("core.h2h_bn", 5 * R, o.vbn_affine)
        leaves += norm_leaves("core.c_bn", R, o.vbn_affine)
    elif o.layer_n:
        leaves += norm_leaves("core.i2h_ln", 5 * R, o.layer_n_affine)
        leaves += norm_leaves("core.h2h_ln", 5 * R, o.layer_n_affine)
        leaves += norm_leaves("core.c_ln", R, o.layer_n_affine)

    return ParamSpec(tuple(leaves))


class FCCaptionModel:
    """Parameter spec + pure apply functions for the FC captioning decoder."""

    def __init__(self, options: FCModelOptions):
        self.options = options
        self.spec = _build_spec(options)

    @property
    def num_params(self) -> int:
        return self.spec.num_params

    # ---- leaf access helpers -------------------------------------------------

    def _norm_params(self, p, name):
        w = p.get(name + ".weight")
        b = p.get(name + ".bias")
        return w, b

    def _maybe_norm(self, p, x, kind_prefix):
        """Apply core i2h/h2h/c normalization if configured."""
        o = self.options
        if o.vbn:
            w, b = self._norm_params(p, f"core.{kind_prefix}_bn")
            return batch_stat_norm(x, w, b)
        if o.layer_n:
            w, b = self._norm_params(p, f"core.{kind_prefix}_ln")
            return layer_norm(x, w, b)
        return x

    def _img_embed(self, p, fc_feats):
        o = self.options
        if o.vbn_e:
            y = dense(fc_feats, p["img_embed.0.weight"], p["img_embed.0.bias"])
            w, b = self._norm_params(p, "img_embed.1")
            return batch_stat_norm(y, w, b)
        return dense(fc_feats, p["img_embed.weight"], p["img_embed.bias"])

    def _embed(self, p, it):
        o = self.options
        if o.vbn_e:
            y = p["embed.0.weight"][it]
            w, b = self._norm_params(p, "embed.1")
            return batch_stat_norm(y, w, b)
        return p["embed.weight"][it]

    # ---- core step -----------------------------------------------------------

    def lstm_core(self, p, xt, h, c):
        """One fused maxout-LSTM step. Returns (output, h', c')."""
        R = self.options.rnn_size
        xt_i2h = self._maybe_norm(
            p, dense(xt, p["core.i2h.weight"], p["core.i2h.bias"]), "i2h"
        )
        h_h2h = self._maybe_norm(
            p, dense(h, p["core.h2h.weight"], p["core.h2h.bias"]), "h2h"
        )
        a = xt_i2h + h_h2h
        gates = jax.nn.sigmoid(a[..., : 3 * R])
        in_gate = gates[..., :R]
        forget_gate = gates[..., R : 2 * R]
        out_gate = gates[..., 2 * R : 3 * R]
        in_transform = jnp.maximum(a[..., 3 * R : 4 * R], a[..., 4 * R : 5 * R])
        next_c = forget_gate * c + in_gate * in_transform
        next_h = out_gate * jnp.tanh(self._maybe_norm(p, next_c, "c"))
        return next_h, next_h, next_c

    def _logprobs(self, p, out):
        return jax.nn.log_softmax(dense(out, p["logit.weight"], p["logit.bias"]), axis=-1)

    # ---- rollout ---------------------------------------------------------------

    @partial(jax.jit, static_argnums=(0, 3))
    def sample(self, theta, fc_feats, greedy: bool = True, key=None):
        """Decode captions. Returns (seq [B,16] int32, seq_logprobs [B,16] f32).

        Matches reference FCModel._sample (src/captioning/nets.py:183-245)
        token-for-token in greedy mode; in sampling mode the RNG is jax
        threefry (statistically, not bitwise, equivalent to the reference's
        np.random.choice path).
        """
        p = self.spec.unravel(theta)
        o = self.options
        B = fc_feats.shape[0]
        T = o.seq_length

        h = jnp.zeros((B, o.rnn_size), theta.dtype)
        c = jnp.zeros((B, o.rnn_size), theta.dtype)
        # t=0: image step (its sampled token is discarded by the reference too)
        _, h, c = self.lstm_core(p, self._img_embed(p, fc_feats), h, c)

        if key is None:
            key = jax.random.PRNGKey(0)
        step_keys = jax.random.split(key, T)

        def step(carry, step_key):
            h, c, it, unfinished, active = carry
            xt = self._embed(p, it)
            out, h, c = self.lstm_core(p, xt, h, c)
            logprobs = self._logprobs(p, out)
            if greedy:
                it_new = jnp.argmax(logprobs, axis=-1)
                lp = jnp.max(logprobs, axis=-1)
            else:
                it_new = jax.random.categorical(step_key, logprobs, axis=-1)
                lp = jnp.take_along_axis(
                    logprobs, it_new[:, None], axis=-1
                ).squeeze(-1)
            unfinished = jnp.logical_and(unfinished, it_new > 0)
            it_new = jnp.where(unfinished, it_new, 0).astype(jnp.int32)
            lp = jnp.where(active, lp, 0.0)
            active_next = jnp.logical_and(active, jnp.any(unfinished))
            return (h, c, it_new, unfinished, active_next), (it_new, lp)

        init = (
            h,
            c,
            jnp.zeros((B,), jnp.int32),  # <bos> = 0
            jnp.ones((B,), bool),
            jnp.array(True),
        )
        _, (seq, seq_logprobs) = jax.lax.scan(step, init, step_keys)
        return seq.T, seq_logprobs.T

    # ---- sensitivity forward ----------------------------------------------------

    def forward_for_sensitivity(self, theta, fc_feats, length: int = 5, split: int = 100):
        """Grouped-logprob output for SM-G-* sensitivity.

        Reference: src/captioning/nets.py:22-70 — greedy-decode ``length``
        steps from already-deduplicated features, then compress the
        vocab-sized logprobs into groups of ``split`` by L2 norm. The
        reference always pads by ``split - (n % split)`` — a full extra zero
        group when n divides evenly — reproduced here. Argmax feedback tokens
        are data (stop-gradient), as in torch.
        """
        p = self.spec.unravel(theta)
        o = self.options
        B = fc_feats.shape[0]
        h = jnp.zeros((B, o.rnn_size), theta.dtype)
        c = jnp.zeros((B, o.rnn_size), theta.dtype)
        _, h, c = self.lstm_core(p, self._img_embed(p, fc_feats), h, c)
        it = jnp.zeros((B,), jnp.int32)
        logprobs = None
        for _ in range(length):
            xt = self._embed(p, it)
            out, h, c = self.lstm_core(p, xt, h, c)
            logprobs = self._logprobs(p, out)
            it = jax.lax.stop_gradient(jnp.argmax(logprobs, axis=-1)).astype(jnp.int32)
        n = logprobs.shape[-1]
        pad = split - (n % split)  # == split when n % split == 0 (reference quirk)
        lp = jnp.concatenate([logprobs, jnp.zeros((B, pad), logprobs.dtype)], axis=-1)
        groups = lp.reshape(B, (n + pad) // split, split)
        return jnp.sqrt(jnp.sum(groups**2, axis=-1))
