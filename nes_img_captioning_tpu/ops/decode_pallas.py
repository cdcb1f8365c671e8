"""Pallas fused greedy-decode kernel for the FC captioning model.

Why: the NES/ES fitness inner loop is an 18-step greedy LSTM decode per
population member (reference FCModel._sample, src/captioning/nets.py:183-245).
Under plain XLA every step re-streams the member's ~10 MB of weights (embed +
logit tables dominate) from HBM: 288 members x 17 steps x 10 MB ≈ 51 GB per
generation — the measured bottleneck. This kernel keeps ONE member's weights
resident in VMEM for the whole decode (one load, 17 uses), turning the sweep
from bandwidth-bound into MXU-bound.

Design notes:
* one kernel instance = one population member decoding its (B, feat) batch;
  population batching comes from ``jax.vmap`` (lifted to a Pallas grid axis),
  so the engines' existing vmap/lax.map machinery applies unchanged;
* the embedding lookup is a one-hot matmul (token -> one_hot (B, Vpad) @
  embed (Vpad, E)) — an MXU-friendly replacement for a gather, with the same
  cost shape as the logit matmul;
* greedy logprob needs only two reductions (max and logsumexp of the
  logits), never a materialized (B, Vpad) log-softmax;
* vocab is padded to a lane multiple with logit bias -1e9 on padding, so
  argmax/logsumexp are unaffected;
* outputs are written (T, B) — per-step stores land on the sublane axis —
  and transposed outside the kernel;
* all matmuls run at the weights' dtype (f32 or bf16) with f32 accumulation
  (preferred_element_type);
* the per-row finished mask reproduces the reference's early-stop semantics
  exactly (masked tokens stay 0; logprob writes stop one step after the whole
  batch finishes) — see models/fc_caption.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_fused", "decode_pair_perturb", "decode_pair_rng",
           "pair_delta_dump", "pair_grad_rng", "greedy_decode_fused",
           "prepare_decode_params", "pad_vocab"]

PAD_LANE = 128
NEG = -1e9


def pad_vocab(v1: int) -> int:
    return ((v1 + PAD_LANE - 1) // PAD_LANE) * PAD_LANE


def _decode_core(seed_ref, feats_ref, img_w_ref, img_b_ref, i2h_w_ref,
                 i2h_b_ref, h2h_w_ref, h2h_b_ref, logit_w_ref, logit_b_ref,
                 embed_ref, gumbel_ref,
                 seq_ref, lp_ref, h_ref, c_ref, tok_ref, unfin_ref, alive_ref,
                 xt_ref=None,
                 *, seq_length: int, rnn_size: int, greedy: bool,
                 host_rng: bool, need_logprobs: bool, vocab_tile: int = 0):
    """The decode loop proper, parameterized over the weight REFS — inputs
    for the standard kernel, scratch for the perturbing pair kernel (which
    writes base + sign*delta into scratch, then runs this twice)."""
    R = rnn_size
    f32 = jnp.float32

    def dott(x, w):
        # x (B, K) @ w (K, N) -> (B, N), f32 accumulation on the MXU;
        # weights are stored pre-transposed (prepare_decode_params) so no
        # per-step transpose of the big logit/embed tables is needed
        return jnp.dot(x, w, preferred_element_type=f32)

    def lstm(xt, h, c):
        a = (dott(xt, i2h_w_ref[:]) + i2h_b_ref[:]
             + dott(h, h2h_w_ref[:]) + h2h_b_ref[:])
        gates = jax.nn.sigmoid(a[:, : 3 * R])
        i_g, f_g, o_g = gates[:, :R], gates[:, R:2 * R], gates[:, 2 * R:3 * R]
        cand = jnp.maximum(a[:, 3 * R:4 * R], a[:, 4 * R:5 * R])
        c2 = f_g * c + i_g * cand
        h2 = o_g * jnp.tanh(c2)
        return h2, c2

    dt = img_w_ref.dtype
    B = feats_ref.shape[0]

    if not greedy and not host_rng:
        # seed arrives as a (1, 128) VMEM row (SMEM scalars don't batch
        # under vmap/lax.map); a VMEM-loaded scalar seeds fine
        pltpu.prng_seed(seed_ref[0, 0])

    # t = 0: image step (its token is discarded, reference nets.py:199-200)
    x0 = dott(feats_ref[:], img_w_ref[:]) + img_b_ref[:]
    h, c = lstm(x0.astype(dt), jnp.zeros((B, R), f32), jnp.zeros((B, R), f32))
    h_ref[:], c_ref[:] = h, c

    Vpad = embed_ref.shape[0]
    # token -> one-hot recomputed inline each step (cheaper in VMEM than a
    # (B, Vpad) scratch buffer); tok_ref starts at <bos>=0
    col = jax.lax.broadcasted_iota(jnp.int32, (B, Vpad), 1)
    tok_ref[:] = jnp.zeros((B, 1), jnp.int32)
    unfin_ref[:] = jnp.ones((B, 1), jnp.int32)
    alive_ref[0] = 1
    # outputs are zero-initialized so the per-step work (two 9600-wide
    # matmuls + reductions) can be SKIPPED outright once every row has
    # emitted EOS — the reference's early `break` (nets.py:242-243) as
    # predicated execution; trailing rows are already the masked zeros
    seq_ref[:] = jnp.zeros(seq_ref.shape, jnp.int32)
    lp_ref[:] = jnp.zeros(lp_ref.shape, f32)

    # loop state lives in scratch refs (Mosaic does not legalize scf.for
    # with vector carries), so the fori_loop carries nothing
    E = embed_ref.shape[1]

    def embed_streamed(dt):
        """Next-token embedding over vocab tiles with PREDICATED skip: only
        tiles that contain some row's token pay their one-hot matmul.
        Trained captioners emit a small frequent-word working set, so most
        tiles skip; exactly one tile contributes per row, so the f32
        accumulation equals the untiled matmul bitwise."""
        xt_ref[:] = jnp.zeros((B, E), f32)
        for lo in range(0, Vpad, vocab_tile):
            hi = lo + vocab_tile
            in_tile = (tok_ref[:] >= lo) & (tok_ref[:] < hi)

            @pl.when(jnp.any(in_tile))
            def _tile(lo=lo, hi=hi):
                col_t = jax.lax.broadcasted_iota(
                    jnp.int32, (B, vocab_tile), 1
                ) + lo
                onehot_t = (col_t == tok_ref[:]).astype(dt)
                xt_ref[:] += dott(onehot_t, embed_ref[lo:hi])
        return xt_ref[:]

    def logits_streamed(h, dt):
        """Streaming max/argmax (+ online logsumexp) over vocab tiles —
        never materializes the (B, Vpad) logits. Strict > keeps the first
        max, matching jnp.argmax tie semantics exactly; the online lse
        reassociates the sum (f32-level lp differences only)."""
        run_max = jnp.full((B, 1), NEG, f32)
        run_arg = jnp.zeros((B, 1), jnp.int32)
        run_sum = jnp.zeros((B, 1), f32)
        for lo in range(0, Vpad, vocab_tile):
            logits_t = dott(h, logit_w_ref[:, lo:lo + vocab_tile]) \
                + logit_b_ref[:, lo:lo + vocab_tile]
            mx_t = jnp.max(logits_t, axis=1, keepdims=True)
            arg_t = jnp.argmax(logits_t, axis=1).astype(
                jnp.int32
            )[:, None] + lo
            if need_logprobs:
                new_max = jnp.maximum(run_max, mx_t)
                run_sum = run_sum * jnp.exp(run_max - new_max) + jnp.sum(
                    jnp.exp(logits_t - new_max), axis=1, keepdims=True
                )
            else:
                new_max = jnp.maximum(run_max, mx_t)
            run_arg = jnp.where(mx_t > run_max, arg_t, run_arg)
            run_max = new_max
        lse = run_max + jnp.log(run_sum) if need_logprobs else None
        return run_arg, run_max, lse

    def step(t, _):
        @pl.when(alive_ref[0] > 0)
        def _active_step():
            if vocab_tile:
                xt = embed_streamed(dt)
            else:
                onehot = (col == tok_ref[:]).astype(dt)
                xt = dott(onehot, embed_ref[:])
            h, c = lstm(xt.astype(dt), h_ref[:], c_ref[:])
            h_ref[:], c_ref[:] = h, c

            if vocab_tile and greedy:
                tok, mx, lse = logits_streamed(h.astype(dt), dt)
                lp_tok = (mx - lse)[:, 0] if need_logprobs else jnp.zeros(
                    (B,), f32
                )
                unfinished = unfin_ref[:] * (tok > 0).astype(jnp.int32)
                tok = tok * unfinished
                seq_ref[pl.ds(t, 1), :] = tok[:, 0][None, :]
                lp_ref[pl.ds(t, 1), :] = lp_tok[None, :]
                tok_ref[:] = tok
                unfin_ref[:] = unfinished
                alive_ref[0] = jnp.where(jnp.any(unfinished > 0), 1, 0)
                return

            logits = dott(h.astype(dt), logit_w_ref[:]) + logit_b_ref[:]
            if need_logprobs:
                mx = jnp.max(logits, axis=1, keepdims=True)        # (B, 1)
                lse = mx + jnp.log(
                    jnp.sum(jnp.exp(logits - mx), axis=1, keepdims=True)
                )
            if greedy:
                tok = jnp.argmax(logits, axis=1).astype(jnp.int32)[:, None]
                # greedy fitness consumes only the tokens: the log-softmax
                # reductions (exp+log over the whole padded vocab, every
                # step) are skipped unless the caller asked for logprobs
                lp_tok = (mx - lse)[:, 0] if need_logprobs else jnp.zeros(
                    (logits.shape[0],), f32
                )
            else:
                # multinomial sampling via Gumbel-max: argmax(logits + G)
                # with G = -log(-log U) is an exact categorical sample — the
                # statistical equivalent of the reference's np.random.choice
                # path (nets.py:211-228); on-chip PRNG, one extra VPU pass.
                # host_rng=True (tests / non-TPU) reads a precomputed table.
                if host_rng:
                    gumbel = gumbel_ref[t]
                else:
                    bits = pltpu.prng_random_bits((B, Vpad))
                    # uint32 -> uniform (0,1) via the mantissa trick (Mosaic
                    # has no uint32->f32 cast): top 23 bits into an
                    # exponent-1 float
                    mant = (pltpu.bitcast(bits, jnp.uint32) >> 9) | jnp.uint32(
                        0x3F800000
                    )
                    u = pltpu.bitcast(mant, jnp.float32) - 1.0  # [0, 1)
                    u = u * (1.0 - 2e-7) + 1e-7  # strictly inside (0, 1)
                    gumbel = -jnp.log(-jnp.log(u))
                tok = jnp.argmax(logits + gumbel, axis=1).astype(
                    jnp.int32
                )[:, None]
                if need_logprobs:
                    # logprob of the sampled token: logits[tok] - lse
                    sel = (col == tok).astype(jnp.float32)
                    lp_tok = (jnp.sum(logits * sel, axis=1, keepdims=True)
                              - lse)[:, 0]
                else:
                    lp_tok = jnp.zeros((logits.shape[0],), f32)

            unfinished = unfin_ref[:] * (tok > 0).astype(jnp.int32)
            tok = tok * unfinished

            seq_ref[pl.ds(t, 1), :] = tok[:, 0][None, :]
            lp_ref[pl.ds(t, 1), :] = lp_tok[None, :]
            tok_ref[:] = tok
            unfin_ref[:] = unfinished
            alive_ref[0] = jnp.where(jnp.any(unfinished > 0), 1, 0)

        return 0

    jax.lax.fori_loop(0, seq_length, step, 0)


# the standard kernel: weights arrive as inputs
_kernel = _decode_core


_PAIR_TENSORS = ("img_w", "img_b", "i2h_w", "i2h_b", "h2h_w", "h2h_b",
                 "logit_w", "logit_b", "embed")
_PAIR_BIASES = {"img_b", "i2h_b", "h2h_b", "logit_b"}


def _pair_kernel(seed_ref, feats_ref,
                 # 9 base-weight refs (f32) then 9 delta refs (f32)
                 b_img_w, b_img_b, b_i2h_w, b_i2h_b, b_h2h_w, b_h2h_b,
                 b_logit_w, b_logit_b, b_embed,
                 d_img_w, d_img_b, d_i2h_w, d_i2h_b, d_h2h_w, d_h2h_b,
                 d_logit_w, d_logit_b, d_embed,
                 gumbel_ref,
                 seq_pos_ref, lp_pos_ref, seq_neg_ref, lp_neg_ref,
                 # perturbed-weight scratch (kernel dtype; biases f32)
                 p_img_w, p_img_b, p_i2h_w, p_i2h_b, p_h2h_w, p_h2h_b,
                 p_logit_w, p_logit_b, p_embed,
                 h_ref, c_ref, tok_ref, unfin_ref, alive_ref,
                 *, seq_length: int, rnn_size: int, need_logprobs: bool):
    """Antithetic-pair greedy decode with IN-KERNEL perturbation: the base
    weights and the pair's delta arrive ONCE (f32), the kernel materializes
    base + sign*delta into VMEM scratch (cast to the compute dtype — the
    exact arithmetic of DecodeLayout.prep on base_vec ± delta) and decodes
    both signs without ever writing a perturbed parameter vector to HBM.
    Replaces, per pair: two (dim)-sized perturbed-vector materializations +
    their cast copies crossing XLA fusion boundaries at the chunk-map edges
    (docs/RESULTS.md, device budget)."""
    base = (b_img_w, b_img_b, b_i2h_w, b_i2h_b, b_h2h_w, b_h2h_b,
            b_logit_w, b_logit_b, b_embed)
    delta = (d_img_w, d_img_b, d_i2h_w, d_i2h_b, d_h2h_w, d_h2h_b,
             d_logit_w, d_logit_b, d_embed)
    pert = (p_img_w, p_img_b, p_i2h_w, p_i2h_b, p_h2h_w, p_h2h_b,
            p_logit_w, p_logit_b, p_embed)

    for sign, seq_ref, lp_ref in ((1.0, seq_pos_ref, lp_pos_ref),
                                  (-1.0, seq_neg_ref, lp_neg_ref)):
        for p, b, d in zip(pert, base, delta):
            p[:] = (b[:] + sign * d[:]).astype(p.dtype)
        _decode_core(
            seed_ref, feats_ref, *pert, gumbel_ref,
            seq_ref, lp_ref, h_ref, c_ref, tok_ref, unfin_ref, alive_ref,
            seq_length=seq_length, rnn_size=rnn_size, greedy=True,
            host_rng=False, need_logprobs=need_logprobs,
        )


@functools.partial(
    jax.jit,
    static_argnames=("seq_length", "dtype", "interpret", "need_logprobs"),
)
def decode_pair_perturb(base: dict, delta: dict, feats,
                        seq_length: int = 16, dtype=jnp.float32,
                        interpret: bool = False,
                        need_logprobs: bool = False):
    """Greedy-decode BOTH rollouts of one antithetic pair with the
    perturbation applied inside the kernel.

    base: f32 dict in prepare_decode_params' layout. delta: same-shape dict
    in f32 OR bf16 (tpu.delta_dtype — bf16 operands halve the per-pair HBM
    read; the in-kernel f32+bf16 promotion matches the per-member path's
    base+delta sum bitwise). delta's logit_b pad lanes must be 0 so the
    padded bias stays at NEG — DecodeLayout's pad_scale=0 noise-scale
    guarantees this. ``dtype`` is the compute dtype of the perturbed
    weights: tokens are bitwise-equal to ``decode_fused(prep(base ± delta))``
    because the perturbed weights are the same sum rounded to the same
    dtype (tested). Returns (seq (2, B, T) int32, lp (2, B, T) f32) —
    index 0 = +delta, 1 = -delta.
    """
    B = feats.shape[0]
    R = base["h2h_w"].shape[0]
    Vpad = base["embed"].shape[0]
    kernel = functools.partial(
        _pair_kernel, seq_length=seq_length, rnn_size=R,
        need_logprobs=need_logprobs,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out = jax.ShapeDtypeStruct
    operands = [jnp.asarray(base[k], f32) for k in _PAIR_TENSORS] + \
               [jnp.asarray(delta[k]) for k in _PAIR_TENSORS]
    seq_p, lp_p, seq_n, lp_n = pl.pallas_call(
        kernel,
        out_shape=(
            out((seq_length, B), jnp.int32), out((seq_length, B), f32),
            out((seq_length, B), jnp.int32), out((seq_length, B), f32),
        ),
        in_specs=[vmem] * (2 + 18 + 1),
        out_specs=(vmem,) * 4,
        scratch_shapes=[
            pltpu.VMEM(base[k].shape,
                       f32 if k in _PAIR_BIASES else dtype)
            for k in _PAIR_TENSORS
        ] + [
            pltpu.VMEM((B, R), f32),            # h
            pltpu.VMEM((B, R), f32),            # c
            pltpu.VMEM((B, 1), jnp.int32),      # current token
            pltpu.VMEM((B, 1), jnp.int32),      # per-row unfinished mask
            pltpu.SMEM((1,), jnp.int32),        # batch-wide alive flag
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.zeros((1, 128), jnp.int32),         # seed placeholder (greedy)
        feats.astype(dtype),
        *operands,
        jnp.zeros((1, 1, Vpad), f32),           # gumbel placeholder
    )
    return (jnp.stack([seq_p.T, seq_n.T]), jnp.stack([lp_p.T, lp_n.T]))


# ---------------------------------------------------------------------------
# In-kernel noise (tpu.kernel_noise): the pair's delta is GENERATED inside
# the kernel from the on-chip PRNG — scale * N(0,1) via Box-Muller — instead
# of arriving as ~11.5 MB of HBM operands per pair. Per generation at the
# mscoco_nes regime (2000 pairs) that removes ~23 GB of delta HBM write
# traffic plus the matching kernel-operand reads; only the per-pair uint32
# seed crosses the host boundary, exactly as in the engines' seed-lineage
# design (ops/mutation.py module docstring). The gradient side regenerates
# the SAME streams (pair_grad_rng seeds with the same per-pair seed and
# issues the identical generate sequence), so eval and gradient consume
# bitwise-identical deltas — the invariant the seed-regeneration engine
# already relies on, now at the hardware-PRNG level (verified on chip by
# scripts/exp_kernel_noise.py via pair_delta_dump).
#
# The on-chip PRNG has no interpret-mode lowering (same constraint as the
# multinomial sampling path above, which falls back to host_rng tables on
# CPU); kernel_noise therefore auto-disables off-TPU and the delta-operand
# decode_pair_perturb path remains the CPU/test form. N(0,1) here is
# Box-Muller-exact, not a bit-match of jax.random.normal — the realized
# noise stream differs from the host path exactly as threefry already
# differs from the reference's torch RNG (README "Deliberate behavioral
# deviations": seed lineage determines the stream family).


def _seed_i32(seed):
    """Engine seeds are uint32; prng_seed wants int32. BITCAST (not value
    conversion — uint32 > 2^31-1 would overflow-convert implementation-
    defined) so eval and grad kernels derive the identical int32 from the
    same seed."""
    seed = jnp.asarray(seed)
    if seed.dtype == jnp.uint32:
        return jax.lax.bitcast_convert_type(seed, jnp.int32)
    return seed.astype(jnp.int32)


def _unit_normal(shape):
    """N(0,1) from the on-chip PRNG: two uint32 draws -> Box-Muller.
    Mantissa trick (Mosaic has no uint32->f32 cast): top 23 bits into an
    exponent-1 float gives u in [0,1); 1-u is (0,1] so the log is finite."""
    b1 = pltpu.prng_random_bits(shape)
    b2 = pltpu.prng_random_bits(shape)

    def unif(bits):
        mant = (pltpu.bitcast(bits, jnp.uint32) >> 9) | jnp.uint32(0x3F800000)
        return pltpu.bitcast(mant, jnp.float32) - 1.0  # [0, 1)

    r = jnp.sqrt(-2.0 * jnp.log(1.0 - unif(b1)))
    return r * jnp.cos((2.0 * 3.14159265358979) * unif(b2))


def _gen_deltas(seed, scale, out):
    """delta_i = scale_i * N(0,1), written tensor-by-tensor in _PAIR_TENSORS
    order. The (seed, call-sequence) pair fully determines the stream: every
    consumer of a pair's delta (eval kernel, dump kernel, grad kernel) calls
    THIS function exactly once after seeding, so their realized deltas are
    bitwise identical. Pad lanes draw zero because the scale layout uses
    pad_scale=0 (DecodeLayout.to_dec)."""
    pltpu.prng_seed(seed)
    for s, o in zip(scale, out):
        o[:] = s[:] * _unit_normal(o.shape)


def _pair_kernel_rng(seed_ref, feats_ref,
                     # 9 base-weight refs (f32) then 9 noise-scale refs (f32)
                     b_img_w, b_img_b, b_i2h_w, b_i2h_b, b_h2h_w, b_h2h_b,
                     b_logit_w, b_logit_b, b_embed,
                     s_img_w, s_img_b, s_i2h_w, s_i2h_b, s_h2h_w, s_h2h_b,
                     s_logit_w, s_logit_b, s_embed,
                     gumbel_ref,
                     seq_pos_ref, lp_pos_ref, seq_neg_ref, lp_neg_ref,
                     # delta scratch (f32), then perturbed-weight scratch
                     d_img_w, d_img_b, d_i2h_w, d_i2h_b, d_h2h_w, d_h2h_b,
                     d_logit_w, d_logit_b, d_embed,
                     p_img_w, p_img_b, p_i2h_w, p_i2h_b, p_h2h_w, p_h2h_b,
                     p_logit_w, p_logit_b, p_embed,
                     h_ref, c_ref, tok_ref, unfin_ref, alive_ref,
                     *, seq_length: int, rnn_size: int, need_logprobs: bool):
    """decode_pair_perturb with the delta generated in VMEM: delta scratch is
    filled once from (seed, scale), then both signs decode exactly as in
    _pair_kernel. Token output is bitwise-equal to decode_pair_perturb fed
    the SAME delta values (the perturbed weights are the same f32 sums
    rounded to the same dtype)."""
    base = (b_img_w, b_img_b, b_i2h_w, b_i2h_b, b_h2h_w, b_h2h_b,
            b_logit_w, b_logit_b, b_embed)
    scale = (s_img_w, s_img_b, s_i2h_w, s_i2h_b, s_h2h_w, s_h2h_b,
             s_logit_w, s_logit_b, s_embed)
    delta = (d_img_w, d_img_b, d_i2h_w, d_i2h_b, d_h2h_w, d_h2h_b,
             d_logit_w, d_logit_b, d_embed)
    pert = (p_img_w, p_img_b, p_i2h_w, p_i2h_b, p_h2h_w, p_h2h_b,
            p_logit_w, p_logit_b, p_embed)

    _gen_deltas(seed_ref[0, 0], scale, delta)

    for sign, seq_ref, lp_ref in ((1.0, seq_pos_ref, lp_pos_ref),
                                  (-1.0, seq_neg_ref, lp_neg_ref)):
        for p, b, d in zip(pert, base, delta):
            p[:] = (b[:] + sign * d[:]).astype(p.dtype)
        _decode_core(
            seed_ref, feats_ref, *pert, gumbel_ref,
            seq_ref, lp_ref, h_ref, c_ref, tok_ref, unfin_ref, alive_ref,
            seq_length=seq_length, rnn_size=rnn_size, greedy=True,
            host_rng=False, need_logprobs=need_logprobs,
        )


@functools.partial(
    jax.jit,
    static_argnames=("seq_length", "dtype", "need_logprobs"),
)
def decode_pair_rng(base: dict, scale: dict, seed, feats,
                    seq_length: int = 16, dtype=jnp.float32,
                    need_logprobs: bool = False):
    """Greedy-decode both rollouts of one antithetic pair with the delta
    GENERATED in-kernel: delta = scale * N(0,1) seeded by the pair's uint32
    seed. base/scale: f32 dicts in prepare_decode_params' layout (scale from
    DecodeLayout.prep of a pad_scale=0 to_dec vector). TPU-only — the
    on-chip PRNG has no interpret lowering; CPU/test callers use
    decode_pair_perturb with an explicit delta. Returns (seq (2, B, T),
    lp (2, B, T)); index 0 = +delta."""
    B = feats.shape[0]
    R = base["h2h_w"].shape[0]
    Vpad = base["embed"].shape[0]
    kernel = functools.partial(
        _pair_kernel_rng, seq_length=seq_length, rnn_size=R,
        need_logprobs=need_logprobs,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out = jax.ShapeDtypeStruct
    operands = [jnp.asarray(base[k], f32) for k in _PAIR_TENSORS] + \
               [jnp.asarray(scale[k], f32) for k in _PAIR_TENSORS]
    seq_p, lp_p, seq_n, lp_n = pl.pallas_call(
        kernel,
        out_shape=(
            out((seq_length, B), jnp.int32), out((seq_length, B), f32),
            out((seq_length, B), jnp.int32), out((seq_length, B), f32),
        ),
        in_specs=[vmem] * (2 + 18 + 1),
        out_specs=(vmem,) * 4,
        scratch_shapes=[
            pltpu.VMEM(base[k].shape, f32) for k in _PAIR_TENSORS  # delta
        ] + [
            pltpu.VMEM(base[k].shape,
                       f32 if k in _PAIR_BIASES else dtype)
            for k in _PAIR_TENSORS                                 # perturbed
        ] + [
            pltpu.VMEM((B, R), f32),            # h
            pltpu.VMEM((B, R), f32),            # c
            pltpu.VMEM((B, 1), jnp.int32),      # current token
            pltpu.VMEM((B, 1), jnp.int32),      # per-row unfinished mask
            pltpu.SMEM((1,), jnp.int32),        # batch-wide alive flag
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.full((1, 128), _seed_i32(seed)),
        feats.astype(dtype),
        *operands,
        jnp.zeros((1, 1, Vpad), f32),           # gumbel placeholder
    )
    return (jnp.stack([seq_p.T, seq_n.T]), jnp.stack([lp_p.T, lp_n.T]))


def _delta_dump_kernel(seed_ref, *refs, n: int):
    scale, out = refs[:n], refs[n:]
    _gen_deltas(seed_ref[0, 0], scale, out)


@jax.jit
def pair_delta_dump(scale: dict, seed):
    """The delta decode_pair_rng/pair_grad_rng realize for ``seed``, as a
    dict of f32 tensors — the on-chip introspection hook that lets tests
    verify the eval and gradient kernels consume bitwise-identical noise
    (scripts/exp_kernel_noise.py). TPU-only."""
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_delta_dump_kernel, n=len(_PAIR_TENSORS)),
        out_shape=tuple(
            jax.ShapeDtypeStruct(scale[k].shape, jnp.float32)
            for k in _PAIR_TENSORS
        ),
        in_specs=[vmem] * (1 + len(_PAIR_TENSORS)),
        out_specs=(vmem,) * len(_PAIR_TENSORS),
        compiler_params=pltpu.CompilerParams(
            # the unrolled 9-tensor Box-Muller loop's temporaries exceed the
            # default 16M scoped-vmem budget (measured: 32.05M at full model
            # dims through the AOT compiler)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.full((1, 128), _seed_i32(seed)),
        *[jnp.asarray(scale[k], jnp.float32) for k in _PAIR_TENSORS],
    )
    return dict(zip(_PAIR_TENSORS, outs))


def _pair_grad_kernel(seeds_ref, w_ref, *refs, n: int):
    """One grid step = one pair: regenerate its delta (same seed, same
    stream as the eval kernel) and accumulate w_i * delta_i into the output
    tensors. TPU grid steps run sequentially and the outputs' index maps are
    constant, so += across steps is the standard revisiting-accumulator
    pattern."""
    # ref order: inputs (scale), then OUTPUTS (grad), then scratch (delta)
    scale, grad, delta = refs[:n], refs[n:2 * n], refs[2 * n:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for g in grad:
            g[:] = jnp.zeros(g.shape, jnp.float32)

    _gen_deltas(seeds_ref[i], scale, delta)
    w = w_ref[i]
    for g, d in zip(grad, delta):
        g[:] += w * d[:]


@jax.jit
def pair_grad_rng(scale: dict, seeds, weights):
    """sum_i weights[i] * delta(seeds[i]) without ever materializing a delta
    in HBM: grid over pairs, delta regenerated in VMEM per step (the same
    streams the eval kernel consumed), accumulated into one f32 tensor dict.
    seeds (F,) int32 (uint32 seeds bit-cast), weights (F,) f32 — both read
    from SMEM. Output: dict in prepare_decode_params layout; flatten with
    DecodeLayout's tensor order and map back via from_dec (linear)."""
    F = int(seeds.shape[0])
    n = len(_PAIR_TENSORS)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_pair_grad_kernel, n=n),
        grid=(F,),
        out_shape=tuple(
            jax.ShapeDtypeStruct(scale[k].shape, jnp.float32)
            for k in _PAIR_TENSORS
        ),
        in_specs=[smem, smem] + [vmem] * n,
        out_specs=(vmem,) * n,
        scratch_shapes=[
            pltpu.VMEM(scale[k].shape, jnp.float32) for k in _PAIR_TENSORS
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        _seed_i32(seeds).reshape(F),
        jnp.asarray(weights, jnp.float32).reshape(F),
        *[jnp.asarray(scale[k], jnp.float32) for k in _PAIR_TENSORS],
    )
    return dict(zip(_PAIR_TENSORS, outs))


@functools.partial(
    jax.jit, static_argnames=("seq_length", "greedy", "interpret", "host_rng",
                              "need_logprobs", "vocab_tile")
)
def decode_fused(params: dict, feats, seq_length: int = 16,
                 greedy: bool = True, seed=0, interpret: bool = False,
                 host_rng: bool = False, gumbel=None,
                 need_logprobs: bool = True, vocab_tile: int = 0):
    """One member's greedy or multinomial decode with VMEM-resident weights.

    params: dict from ``prepare_decode_params`` (vocab axis padded, biases
    (1, N)-shaped). feats: (B, F). ``seed`` seeds the on-chip PRNG for
    sampling (ignored for greedy). ``host_rng=True`` takes a precomputed
    ``gumbel`` (T, B, Vpad) table instead of the on-chip PRNG (testable in
    interpret mode, which lacks prng lowering). Returns (seq (B, T) int32,
    lp (B, T) f32).

    ``vocab_tile`` (greedy only; a lane multiple dividing Vpad): streaming
    variant — the logit pass keeps only running max/argmax/logsumexp per
    vocab tile (never materializing (B, Vpad) logits) and the embedding pass
    skips tiles containing no row's token. Token-exact vs the untiled
    kernel; logprobs reassociate at f32 level.
    """
    B = feats.shape[0]
    R = params["h2h_w"].shape[0]
    Vpad = params["embed"].shape[0]
    dt = params["img_w"].dtype
    if vocab_tile:
        assert greedy, "vocab_tile is a greedy-decode variant"
        assert vocab_tile % PAD_LANE == 0 and Vpad % vocab_tile == 0, \
            f"vocab_tile={vocab_tile} must be a lane multiple dividing {Vpad}"
    if host_rng and not greedy:
        # without a real table the (1,1,Vpad) placeholder would clamp to
        # row 0 every step and zeros degrade "sampling" to silent argmax
        assert gumbel is not None and gumbel.shape[0] >= seq_length, (
            "host_rng=True needs a (seq_length, B, Vpad) gumbel table "
            f"(got {None if gumbel is None else gumbel.shape})"
        )
    if gumbel is None:
        gumbel = jnp.zeros((1, 1, Vpad), jnp.float32)  # placeholder operand

    kernel = functools.partial(
        _kernel, seq_length=seq_length, rnn_size=R, greedy=greedy,
        host_rng=host_rng, need_logprobs=need_logprobs,
        vocab_tile=vocab_tile,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    E = params["embed"].shape[1]
    seq_t, lp_t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((seq_length, B), jnp.int32),
            jax.ShapeDtypeStruct((seq_length, B), jnp.float32),
        ),
        in_specs=[vmem] * 12,
        out_specs=(vmem, vmem),
        scratch_shapes=[
            pltpu.VMEM((B, R), jnp.float32),    # h
            pltpu.VMEM((B, R), jnp.float32),    # c
            pltpu.VMEM((B, 1), jnp.int32),      # current token
            pltpu.VMEM((B, 1), jnp.int32),      # per-row unfinished mask
            pltpu.SMEM((1,), jnp.int32),        # batch-wide alive flag
        ] + ([
            pltpu.VMEM((B, E), jnp.float32),    # streamed-embed accumulator
        ] if vocab_tile else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.full((1, 128), jnp.asarray(seed, jnp.int32)),
        feats.astype(dt),
        params["img_w"], params["img_b"],
        params["i2h_w"], params["i2h_b"],
        params["h2h_w"], params["h2h_b"],
        params["logit_w"], params["logit_b"],
        params["embed"],
        jnp.asarray(gumbel, jnp.float32),
    )
    return seq_t.T, lp_t.T


def greedy_decode_fused(params: dict, feats, seq_length: int = 16,
                        interpret: bool = False):
    return decode_fused(params, feats, seq_length=seq_length, greedy=True,
                        interpret=interpret)


def prepare_decode_params(spec, theta, options, dtype=jnp.float32) -> dict:
    """Unravel a flat theta into the padded-weight dict the kernel consumes.
    Pure jax (jit/vmap-friendly): slices + reshapes + pad. Weights are stored
    pre-transposed to (in_features, out_features) so every kernel matmul is a
    standard (M,K)@(K,N) with no in-kernel transpose of the 9600-wide tables;
    biases stay f32, (1, N)-shaped for TPU 2D layout."""
    p = spec.unravel(theta)
    V1 = options.vocab_size + 1
    Vpad = pad_vocab(V1)
    pad = Vpad - V1
    f32 = jnp.float32

    return {
        "img_w": p["img_embed.weight"].T.astype(dtype),          # (F, E)
        "img_b": p["img_embed.bias"].astype(f32)[None, :],
        "i2h_w": p["core.i2h.weight"].T.astype(dtype),           # (E, 5R)
        "i2h_b": p["core.i2h.bias"].astype(f32)[None, :],
        "h2h_w": p["core.h2h.weight"].T.astype(dtype),           # (R, 5R)
        "h2h_b": p["core.h2h.bias"].astype(f32)[None, :],
        "logit_w": jnp.pad(                                       # (R, Vpad)
            p["logit.weight"].T, ((0, 0), (0, pad))
        ).astype(dtype),
        "logit_b": jnp.pad(
            p["logit.bias"], (0, pad), constant_values=NEG
        ).astype(f32)[None, :],
        "embed": jnp.pad(                                         # (Vpad, E)
            p["embed.weight"], ((0, pad), (0, 0))
        ).astype(dtype),
    }
