"""tpu.delta_dtype A/B on chip: f32 vs bf16 delta storage through the REAL
NES engine (kernel_perturb pair path) at both the bench regime and the true
mscoco_nes regime.

bf16 halves the realized delta's HBM footprint on both sides of the
generation (eval materialization + kernel-operand read; gradient einsum
matrix) — the r5 DCE ablation put the delta paths at ~1/3 of the
true-regime generation. Self-consistency (eval==grad values, pair kernel ==
per-member path bitwise) is pinned on CPU by tests/test_delta_dtype.py;
this script measures the win.

Usage: python scripts/exp_delta16.py [--timed 3]
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
    ap.add_argument("--timed", type=int, default=3)
    ap.add_argument("--regimes", default="bench,true")
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

    # (name, pairs, batch, pop_chunk, gens/dispatch)
    regimes = {
        "bench": ("bench pop288", 144, 128, 24, 8),
        "true": ("mscoco_nes true regime", 2000, 64, 48, 4),
    }
    results = {}
    for rkey in args.regimes.split(","):
        name, F, B, C, K = regimes[rkey]
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
        task = CocoTask(exp, Config(batch_size=B),
                        TpuConfig(seed=0, precision="bf16"))
        theta0 = jnp.asarray(task.generate_theta(jax.random.PRNGKey(0)))
        for dd in ("f32", "bf16"):
            eng = NESEngine(task, Adam(0.001), MutationKind.DEFAULT,
                            pop_chunk=C, rng_impl="rbg",
                            kernel_perturb=True, delta_dtype=dd)
            assert eng._kernel_perturb
            th = theta0
            opt_state = eng.optimizer.init(eng.dim)
            sens = jnp.ones((eng.dim,), jnp.float32)
            rng = np.random.default_rng(0)
            sampler = EpochSampler(task.train_n, seed=0)

            def block(th, opt_state):
                seeds = rng.integers(0, 2**32, size=(K, F), dtype=np.uint32)
                idx = np.stack(
                    [sampler.member_batches(F, B) for _ in range(K)])
                th, opt_state, packs = eng.generation_block(
                    th, opt_state, sens, 0.01, seeds, idx, 0.001, 1e-7)
                fits, _, _ = eng.unpack(packs[-1], F)  # honest sync pull
                assert np.isfinite(fits).all()
                return th, opt_state

            t0 = time.time()
            th, opt_state = block(th, opt_state)
            log(f"{rkey}/{dd}: warmup {time.time() - t0:.1f}s")
            ts = []
            for _ in range(args.timed):
                t0 = time.time()
                th, opt_state = block(th, opt_state)
                ts.append((time.time() - t0) / K)
            med = float(np.median(ts)) * 1e3
            results[f"{rkey}_{dd}"] = med
            log(f"{rkey}/{dd}: {med:.1f} ms/gen "
                f"(reps {[round(t*1e3) for t in ts]})")
        if (f"{rkey}_f32" in results) and (f"{rkey}_bf16" in results):
            log(f"{rkey}: bf16 delta win "
                f"{results[f'{rkey}_f32'] - results[f'{rkey}_bf16']:+.1f} "
                f"ms/gen")
    log("DELTA16 DONE")
    print(results)


if __name__ == "__main__":
    main()
