"""Chip probe: what does NES in-program SM-G sensitivity actually save?

Three paths at the bench regime (fc_caption, pop 288, batch 128, SM-G-SUM,
greedy CIDEr-D fitness on device), timed steady-state with the same
one-deep deferred-pull discipline as bench.py:

  host    — the inline_sens=False fallback: one calc_sensitivity dispatch
            (97 grouped VJPs through the 5-step decode) + one fused
            generation dispatch per generation (2 program launches/gen).
  inline  — inline_sens auto (production): ONE fused generation program
            that recomputes the sensitivity in-program (1 launch/gen).
  block8  — inline + tpu.gens_per_dispatch=8 (1 launch per 8 generations;
            only reachable WITH inline sensitivities — the scan step must
            recompute from its carried theta).

Reference being bought back: the per-(task, parent) sensitivity the fleet
amortized through a file cache (src/algorithm/safe_mutations.py:34-84) —
here it is recomputed per generation, so its dispatch cost is on the hot
path. Results land in docs/RESULTS.md "NES in-program SM-G".
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POP = 288
BATCH = 128
N_TIMED = 12
SENS_BATCH = 0  # 0 = full member-0 batch (reference parity)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.data.core import EpochSampler
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import (
        calc_sensitivity, subsample_batch_rows)
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
        "policy_options": {
            "fitness": "greedy", "vbn": False,
            "model_options": {"input_encoding_size": 128, "rnn_size": 128,
                              "fc_feat_size": 2048},
        },
    }
    task = CocoTask(exp, Config(batch_size=BATCH),
                    TpuConfig(seed=0, precision="bf16"))
    assert task.fitness_on_device
    kind = MutationKind.SAFE_GRAD_SUM
    F = POP // 2
    rng = np.random.default_rng(0)
    theta0 = task.generate_theta(jax.random.PRNGKey(0))
    sampler = EpochSampler(task.train_n, seed=0)
    ones = jax.numpy.ones((theta0.shape[0],), jax.numpy.float32)

    def run(label, block, inline):
        eng = NESEngine(task, Adam(0.001), kind, pop_chunk=48,
                        rng_impl="rbg", inline_sens=inline)
        theta, opt_state = theta0, eng.optimizer.init(eng.dim)
        pending = []

        def gen_block(theta, opt_state):
            seeds = rng.integers(0, 2**32, size=(block, F), dtype=np.uint32)
            idx = np.stack([sampler.member_batches(F, BATCH)
                            for _ in range(block)])
            if block > 1:
                theta, opt_state, packs = eng.generation_block(
                    theta, opt_state, ones, 0.01, seeds, idx, 0.001, 1e-7)
            else:
                sens = ones
                # inline=None resolves to True inside the engine (auto);
                # only an explicit False takes the host-sens dispatch
                if inline is False:
                    idx_s = subsample_batch_rows(idx[0, 0], SENS_BATCH)
                    sens = calc_sensitivity(task, theta, idx_s, kind, 0.01)
                theta, opt_state, packs = eng.generation(
                    theta, opt_state, sens, 0.01, seeds[0], idx[0],
                    0.001, 1e-7)
            pending.append(packs)
            if len(pending) > 1:
                fits, _, _ = eng.unpack(pending.pop(0), F)
                assert np.isfinite(fits).all()
            return theta, opt_state

        t0 = time.time()
        theta, opt_state = gen_block(theta, opt_state)
        np.asarray(eng.unpack(pending[0], F)[0]) if block > 1 else \
            jax.block_until_ready(theta)
        log(f"[{label}] warmup {time.time() - t0:.1f}s")
        times = []
        for _ in range(N_TIMED):
            t0 = time.time()
            theta, opt_state = gen_block(theta, opt_state)
            times.append((time.time() - t0) / block)
        for p in pending:
            assert np.isfinite(eng.unpack(p, F)[0]).all()
        med = float(np.median(times)) * 1e3
        log(f"[{label}] per-gen ms: {[round(t * 1e3) for t in times]}")
        print(f"{label}: {med:.1f} ms/generation "
              f"({POP / med * 1e3:.0f} evals/s)")
        return med

    a = run("host-sens (2 dispatches/gen)", 1, False)
    b = run("inline (1 dispatch/gen)", 1, None)
    c = run("inline + block8", 8, None)
    print(f"saved per SM-G generation by inlining: {a - b:.1f} ms; "
          f"blocks add {b - c:.1f} ms more")


if __name__ == "__main__":
    main()
