"""Probe: per-member weight-prep cost, current vs decode-ordered layout.

Current fused path (per member): theta + noise (flat, torch order) ->
prepare_decode_params = unravel + TRANSPOSE + pad + cast. RESULTS.md puts the
layout portion at ~12 ms/generation against a ~6 ms bandwidth floor.

Candidate: keep a decode-ordered, pre-padded flat f32 theta (transposes done
ONCE per generation); per member the prep is then noise-add + slice/reshape +
cast only — one fusable elementwise pass, no transposed materializations.

Both variants run the SAME downstream kernel; we time prep-only lax.map
sweeps (chained x16 inside one program to amortize dispatch) and a full
decode sweep with each prep, on the real chip.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POP, BATCH = 288, 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.ops.decode_pallas import (
        decode_fused,
        pad_vocab,
        prepare_decode_params,
    )
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    data_dir = os.environ.get("NES_BENCH_DATA", "/tmp/nes_bench_data")
    if not os.path.isfile(os.path.join(data_dir, "cocotalk.json")):
        make_synthetic_coco(data_dir, n_train=2048, n_val=256, n_test=256,
                            vocab_size=9487, fc_feat_size=2048, cap_len=9,
                            seed=0)
    exp = {
        "dataset": "mscoco",
        "caption_options": {
            "input_json": os.path.join(data_dir, "cocotalk.json"),
            "input_label_h5": os.path.join(data_dir, "cocotalk_label.h5"),
            "input_fc_dir": os.path.join(data_dir, "fc"),
        },
        "policy_options": {"fitness": "greedy", "model_options": {}},
    }
    task = CocoTask(exp, Config(batch_size=BATCH),
                    TpuConfig(seed=0, precision="bf16"))
    spec, opts = task.spec, task.model.options
    theta = jnp.asarray(task.generate_theta(jax.random.PRNGKey(0)))
    dim = spec.num_params
    sigma = 0.01
    bf16 = jnp.bfloat16

    # ---- decode-ordered layout -------------------------------------------------------
    V1 = opts.vocab_size + 1
    Vpad = pad_vocab(V1)
    E, R, F_ = opts.input_encoding_size, opts.rnn_size, opts.fc_feat_size
    # (name, padded decode shape); weights pre-transposed, vocab pre-padded
    dec_shapes = [
        ("img_w", (F_, E)), ("img_b", (1, E)),
        ("i2h_w", (E, 5 * R)), ("i2h_b", (1, 5 * R)),
        ("h2h_w", (R, 5 * R)), ("h2h_b", (1, 5 * R)),
        ("logit_w", (R, Vpad)), ("logit_b", (1, Vpad)),
        ("embed", (Vpad, E)),
    ]
    dim_dec = sum(int(np.prod(s)) for _, s in dec_shapes)
    log(f"dim={dim} dim_dec={dim_dec} (+{dim_dec - dim})")

    def to_dec(th):
        """flat torch-order theta -> flat decode-ordered padded f32 (the
        once-per-generation transform)."""
        p = prepare_decode_params(spec, th, opts, dtype=jnp.float32)
        return jnp.concatenate([p[n].reshape(-1) for n, _ in dec_shapes])

    # pad-lane mask: noise there must not perturb the NEG logit_b pad bias
    mask = np.ones((dim_dec,), np.float32)
    off = 0
    offs = {}
    for n, s in dec_shapes:
        offs[n] = off
        off += int(np.prod(s))
    m = mask.reshape(-1)
    lw = offs["logit_w"]
    m[lw:lw + R * Vpad].reshape(R, Vpad)[:, V1:] = 0.0
    lb = offs["logit_b"]
    m[lb:lb + Vpad][V1:] = 0.0
    em = offs["embed"]
    m[em:em + Vpad * E].reshape(Vpad, E)[V1:] = 0.0
    mask = jnp.asarray(mask)

    def prep_dec(theta_dec, seed):
        noise = sigma * mask * jax.random.normal(
            jax.random.key(seed, impl="rbg"), (dim_dec,), jnp.float32
        )
        v = theta_dec + noise
        out = {}
        for n, s in dec_shapes:
            t = jax.lax.dynamic_slice_in_dim(
                v, offs[n], int(np.prod(s))
            ).reshape(s)
            # biases stay f32 (kernel contract), weights go bf16
            out[n] = t if n.endswith("_b") else t.astype(bf16)
        return out

    def prep_cur(th, seed):
        noise = sigma * jax.random.normal(
            jax.random.key(seed, impl="rbg"), (dim,), jnp.float32
        )
        return prepare_decode_params(spec, th + noise, opts, dtype=bf16)

    CHUNK = 48  # the engine's pop_chunk wave width (vmap inside, lax.map over waves)

    rng = np.random.default_rng(0)
    theta_dec = to_dec(theta)
    jax.block_until_ready(theta_dec)
    feats = jnp.asarray(
        rng.standard_normal((BATCH, F_), dtype=np.float32)
    )

    # engine-shaped sweep: lax.map over waves, vmap over CHUNK members/wave
    def decode_sweep(prep_fn, base, seeds):
        def member(s):
            p = prep_fn(base, s)
            seq, _ = decode_fused(p, feats, seq_length=opts.seq_length,
                                  need_logprobs=False)
            return jnp.sum(seq)

        return jax.lax.map(jax.vmap(member), seeds).sum()

    dec_jit = jax.jit(decode_sweep, static_argnames=("prep_fn",))
    for name, fn, base in (("current", prep_cur, theta),
                           ("decode-ordered", prep_dec, theta_dec)):
        seeds = jnp.asarray(
            rng.integers(0, 2**31, size=(POP // CHUNK, CHUNK), dtype=np.int32)
        )
        r = dec_jit(fn, base, seeds)
        jax.block_until_ready(r)
        times = []
        for _ in range(7):
            seeds = jnp.asarray(rng.integers(
                0, 2**31, size=(POP // CHUNK, CHUNK), dtype=np.int32))
            t0 = time.time()
            jax.block_until_ready(dec_jit(fn, base, seeds))
            times.append(time.time() - t0)
        med = float(np.median(times)) * 1e3
        log(f"decode+prep sweep (waves of {CHUNK}) {name}: "
            f"{med:.1f} ms / {POP} members x {BATCH}")


if __name__ == "__main__":
    main()
