"""Decompose the TRUE-regime fused NES generation by DCE ablation
(the bench-scale exp_budget_split.py generalized to the mscoco_nes regime
and the in-kernel pair-perturbation path).

XLA dead-code-eliminates whatever the packed outputs don't consume, so
swapping the fitness source isolates each stage at nb_offspring=2000 pairs
x batch 64 (4000 rollouts/generation):

  full          : pair kernel (decode both signs) + CIDEr + eval-side delta
                  + gradient-side noise regen + update
  no_cider      : fitness = seq sums        -> CIDEr DCE'd
  no_decode     : fitness = f(delta)        -> kernel + CIDEr DCE'd
                  (eval-side delta generation/materialization remains)
  no_eval_noise : fitness = f(idx)          -> eval-side delta DCE'd too
                  (gradient-side noise regen + update + dispatch remain)

Differences give the stage shares that decide whether an in-kernel PRNG
(generating the delta inside the pair kernel instead of materializing it in
HBM as an operand) is worth building (VERDICT r4 stretch #8).

Usage: python scripts/exp_regime_split.py [--pairs 2000] [--batch 64]
           [--gens-per-dispatch 4] [--timed 4] [--pop-chunk 48]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--gens-per-dispatch", type=int, default=4)
    ap.add_argument("--timed", type=int, default=4)
    ap.add_argument("--pop-chunk", type=int, default=48)
    ap.add_argument("--legs", default="full,no_cider,no_decode,no_eval_noise",
                    help="comma-set of legs to run (each is its own compile)")
    ap.add_argument("--sync", action="store_true",
                    help="pull each block's results before dispatching the "
                         "next (adds one ~30 ms RTT per block — constant "
                         "across legs, so ablation DIFFERENCES are "
                         "unaffected; the 2026-08-20 tunnel wedged "
                         "repeatedly under the deferred-pull pipeline and "
                         "this keeps at most one program outstanding)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.data.core import EpochSampler
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    log(f"devices: {jax.devices()}")
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
    task = CocoTask(exp, Config(batch_size=args.batch),
                    TpuConfig(seed=0, precision="bf16"))
    F, B, K = args.pairs, args.batch, args.gens_per_dispatch
    rng = np.random.default_rng(0)
    theta = jnp.asarray(task.generate_theta(jax.random.PRNGKey(0)))
    sampler = EpochSampler(task.train_n, seed=0)

    orig = CocoTask.rollout_pair_dec

    def no_cider(self, base_params, delta_dec, idx, consts=None):
        from nes_img_captioning_tpu.ops.decode_pallas import (
            decode_pair_perturb,
        )

        train_fc = self.train_fc if consts is None else consts["train_fc"]
        seq2, _ = decode_pair_perturb(
            base_params, self.decode_layout.prep(delta_dec, jnp.float32),
            train_fc[idx], seq_length=self.model.options.seq_length,
            dtype=self._decode_dtype, need_logprobs=False,
        )
        return seq2.sum(axis=(1, 2, 3)).astype(jnp.float32) \
            if seq2.ndim == 4 else seq2.reshape(2, -1).sum(-1).astype(jnp.float32)

    def no_decode(self, base_params, delta_dec, idx, consts=None):
        s = delta_dec.sum().astype(jnp.float32) * 1e-6 + idx.sum()
        return jnp.stack([s, -s])

    def no_eval_noise(self, base_params, delta_dec, idx, consts=None):
        s = idx.sum().astype(jnp.float32)
        return jnp.stack([s, -s])

    legs = {
        "full": orig, "no_cider": no_cider, "no_decode": no_decode,
        "no_eval_noise": no_eval_noise,
    }
    results = {}
    for name in args.legs.split(","):
        CocoTask.rollout_pair_dec = legs[name]
        # kernel_noise=False: this ablation swaps rollout_pair_dec bodies to
        # DCE stages; the kernel-noise path routes around rollout_pair_dec
        # entirely (rollout_pair_rng) and is measured by its own A/B,
        # scripts/exp_kernel_noise.py
        eng = NESEngine(task, Adam(0.001), MutationKind.DEFAULT,
                        pop_chunk=args.pop_chunk, rng_impl="rbg",
                        kernel_perturb=True, kernel_noise=False)
        assert eng._kernel_perturb
        opt_state = eng.optimizer.init(eng.dim)
        th = theta
        pending = []

        def block(th, opt_state):
            seeds = rng.integers(0, 2**32, size=(K, F), dtype=np.uint32)
            idx = np.stack(
                [sampler.member_batches(F, B) for _ in range(K)]
            )
            th, opt_state, packs = eng.generation_block(
                th, opt_state, jnp.ones((eng.dim,), jnp.float32), 0.01,
                seeds, idx, 0.001, 1e-7)
            if args.sync:
                fits, _, _ = eng.unpack(packs, F)
                assert np.isfinite(fits).all()
                return th, opt_state
            pending.append(packs)
            if len(pending) > 1:
                fits, _, _ = eng.unpack(pending.pop(0), F)
                assert np.isfinite(fits).all()
            return th, opt_state

        t0 = time.time()
        th, opt_state = block(th, opt_state)
        log(f"{name}: warmup {time.time() - t0:.1f}s")
        times = []
        for _ in range(args.timed):
            t0 = time.time()
            th, opt_state = block(th, opt_state)
            times.append((time.time() - t0) / K)
        for p in pending:
            eng.unpack(p, F)
        med = float(np.median(times)) * 1e3
        results[name] = med
        log(f"{name}: {med:.1f} ms/gen")

    CocoTask.rollout_pair_dec = orig
    if {"full", "no_cider"} <= results.keys():
        log(f"CIDEr share: {results['full'] - results['no_cider']:.1f} ms/gen")
    if {"no_cider", "no_decode"} <= results.keys():
        log(f"pair-kernel (decode) share: "
            f"{results['no_cider'] - results['no_decode']:.1f} ms/gen")
    if {"no_decode", "no_eval_noise"} <= results.keys():
        log(f"eval-side delta gen+materialize share: "
            f"{results['no_decode'] - results['no_eval_noise']:.1f} ms/gen")
    if "no_eval_noise" in results:
        log(f"grad-noise+update+dispatch floor: "
            f"{results['no_eval_noise']:.1f} ms/gen")
    print(results)


if __name__ == "__main__":
    main()
