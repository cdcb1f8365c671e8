"""NES generation throughput at an arbitrary (pairs, batch) regime on the
real chip — the bench (pop 288 = 144 pairs, batch 128) generalized so the
reference's own `experiments/mscoco_nes.json` regime can be measured at its
TRUE population: nb_offspring=2000 means 2000 antithetic PAIRS = 4000
rollouts/generation (reference: tools/iteration.py:110-112,173,
nic_nes/iteration.py:63-67 — fixed in r4; the r3 number used 1000 pairs).

Usage:
    python scripts/exp_nes_regime.py [--pairs 2000] [--batch 64]
        [--gens-per-dispatch 4] [--timed 6]
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--timed", type=int, default=6)
    ap.add_argument("--pop-chunk", type=int, default=48)
    ap.add_argument("--delta-dtype", default="f32",
                    choices=("f32", "bf16"))
    ap.add_argument("--kernel-perturb", default="auto",
                    choices=["auto", "true", "false"],
                    help="tpu.kernel_perturb A/B: in-kernel pair "
                    "perturbation vs per-member perturbed vectors")
    ap.add_argument("--data", default="/tmp/nes_bench_data")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.data.core import EpochSampler
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    log(f"devices: {jax.devices()}")
    if not os.path.isfile(os.path.join(args.data, "cocotalk.json")):
        make_synthetic_coco(args.data, n_train=2048, n_val=256, n_test=256,
                            vocab_size=9487, fc_feat_size=2048, cap_len=9,
                            seed=0)
    copts = {
        "input_json": os.path.join(args.data, "cocotalk.json"),
        "input_label_h5": os.path.join(args.data, "cocotalk_label.h5"),
        "input_fc_dir": os.path.join(args.data, "fc"),
    }
    exp = {
        "dataset": "mscoco", "caption_options": copts,
        "policy_options": {
            "fitness": "greedy", "vbn": False,
            "model_options": {"input_encoding_size": 128, "rnn_size": 128,
                              "fc_feat_size": 2048},
        },
    }
    task = CocoTask(exp, Config(batch_size=args.batch),
                    TpuConfig(seed=0, precision="bf16"))
    assert task.fitness_on_device
    kp = {"auto": "auto", "true": True, "false": False}[args.kernel_perturb]
    engine = NESEngine(task, Adam(0.001), MutationKind.DEFAULT,
                       pop_chunk=args.pop_chunk, rng_impl="rbg",
                       kernel_perturb=kp, delta_dtype=args.delta_dtype)
    log(f"kernel_perturb: {engine._kernel_perturb}; "
        f"delta_dtype: {args.delta_dtype}")

    F, B, GPD = args.pairs, args.batch, args.gens_per_dispatch
    rng = np.random.default_rng(0)
    theta = task.generate_theta(jax.random.PRNGKey(0))
    sens = jax.numpy.ones((engine.dim,), jax.numpy.float32)
    opt_state = engine.optimizer.init(engine.dim)
    sampler = EpochSampler(task.train_n, seed=0)
    pending = []

    def block(theta, opt_state):
        seeds = rng.integers(0, 2**32, size=(GPD, F), dtype=np.uint32)
        idx = np.stack([sampler.member_batches(F, B) for _ in range(GPD)])
        theta, opt_state, packs = engine.generation_block(
            theta, opt_state, sens, 0.01, seeds, idx, 0.001, 1e-7,
        )
        pending.append(packs)
        if len(pending) > 1:
            fits, _, _ = engine.unpack(pending.pop(0), F)
            assert np.isfinite(fits).all()
        return theta, opt_state

    log("warmup (compile) ...")
    t0 = time.time()
    theta, opt_state = block(theta, opt_state)
    log(f"warmup took {time.time() - t0:.1f}s")

    times = []
    for _ in range(args.timed):
        t0 = time.time()
        theta, opt_state = block(theta, opt_state)
        times.append((time.time() - t0) / GPD)
    for p in pending:
        assert np.isfinite(engine.unpack(p, F)[0]).all()
    dt = float(np.median(times))
    rollouts = 2 * F
    log(f"per-gen ms: {[round(t * 1e3) for t in times]}")
    print(json.dumps({
        "pairs": F, "batch": B, "gens_per_dispatch": GPD,
        "ms_per_generation": round(dt * 1e3, 1),
        "rollouts_per_generation": rollouts,
        "evals_per_sec": round(rollouts / dt, 1),
        "captions_scored_per_generation": rollouts * B,
    }))


if __name__ == "__main__":
    main()
