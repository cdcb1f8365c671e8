"""Training-stability A/B for tpu.kernel_noise: drive the REAL NES engine
for N generations with the in-kernel-noise path on vs off (same start
theta, same seeds/batches) and compare fitness trajectories + wall time.

The streams differ by construction (hardware PRNG vs jax.random), so
trajectories are compared statistically: both must IMPROVE from the same
start, with final mean fitnesses in family. A broken eval==grad stream
contract would show up here as a collapsed/noisy trajectory (the gradient
would be uncorrelated with the evaluated perturbations) — on top of the
bitwise checks in exp_kernel_noise.py.

Usage: python scripts/exp_knoise_soak.py [--gens 24] [--pairs 144]
           [--batch 128] [--pop-chunk 24] [--gens-per-dispatch 8]
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
    ap.add_argument("--gens", type=int, default=48)
    ap.add_argument("--pairs", type=int, default=144)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--pop-chunk", type=int, default=24)
    ap.add_argument("--gens-per-dispatch", type=int, default=8)
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
        "policy_options": {"fitness": "greedy", "model_options": {
            "input_encoding_size": 128, "rnn_size": 128,
            "fc_feat_size": 2048,
        }},
    }
    task = CocoTask(exp, Config(batch_size=args.batch),
                    TpuConfig(seed=0, precision="bf16"))
    F, B, K = args.pairs, args.batch, args.gens_per_dispatch
    theta0 = jnp.asarray(task.generate_theta(jax.random.PRNGKey(0)))

    results = {}
    for kn in (True, False):
        eng = NESEngine(task, Adam(0.001), MutationKind.DEFAULT,
                        pop_chunk=args.pop_chunk, rng_impl="rbg",
                        kernel_perturb=True, kernel_noise=kn)
        if kn:
            assert eng._kernel_noise, "kernel_noise failed to activate"
        th = theta0
        opt_state = eng.optimizer.init(eng.dim)
        sens = jnp.ones((eng.dim,), jnp.float32)
        rng = np.random.default_rng(7)  # same seed/batch stream both legs
        sampler = EpochSampler(task.train_n, seed=7)
        means = []
        t_warm = t0 = time.time()
        blocks = (args.gens + K - 1) // K
        for b in range(blocks):
            seeds = rng.integers(0, 2**32, size=(K, F), dtype=np.uint32)
            idx = np.stack([sampler.member_batches(F, B) for _ in range(K)])
            th, opt_state, packs = eng.generation_block(
                th, opt_state, sens, 0.01, seeds, idx, 0.001, 1e-7)
            for g in range(K):
                fits, _, _ = eng.unpack(packs[g], F)
                assert np.isfinite(fits).all()
                means.append(float(fits.mean()))
            if b == 0:
                t_warm = time.time()
        wall = time.time() - t_warm
        name = "kernel_noise" if kn else "delta-operand"
        gens_timed = (blocks - 1) * K
        log(f"{name}: warmup {t_warm - t0:.1f}s; "
            f"{wall / max(gens_timed, 1) * 1e3:.1f} ms/gen over "
            f"{gens_timed} timed gens; fitness first->last block mean "
            f"{np.mean(means[:K]):.4f} -> {np.mean(means[-K:]):.4f}")
        results[name] = {
            "ms_per_gen": wall / max(gens_timed, 1) * 1e3,
            "first": float(np.mean(means[:K])),
            "last": float(np.mean(means[-K:])),
        }

    a, b = results["kernel_noise"], results["delta-operand"]
    imp_a, imp_b = a["last"] - a["first"], b["last"] - b["first"]
    # the informative comparison is RELATIVE: a broken eval==grad stream
    # contract makes the gradient uncorrelated with the evaluated
    # perturbations -> the kernel_noise leg flatlines while the operand leg
    # climbs. (If the operand baseline itself hasn't improved at this gen
    # count, the run is uninformative — rerun with --gens higher.)
    log(f"improvement: kernel_noise {imp_a:+.4f}, operand {imp_b:+.4f}")
    assert imp_b > 0, (
        f"baseline leg did not improve ({imp_b:+.4f}) — raise --gens")
    assert imp_a > 0.3 * imp_b, (
        f"kernel_noise improvement {imp_a:+.4f} out of family with "
        f"operand {imp_b:+.4f} — gradient/noise stream suspect")
    log(f"SOAK OK: both legs improve; bench-regime ms/gen "
        f"kernel_noise={a['ms_per_gen']:.1f} vs operand={b['ms_per_gen']:.1f}")
    print(results)


if __name__ == "__main__":
    main()
