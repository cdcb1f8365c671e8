"""Two one-off perf probes on the real chip (results land in RESULTS.md):

1. gens_per_dispatch sweep at bench scale (pop 288, batch 128): how much of
   the remaining ~12 ms/gen dispatch overhead does a deeper block recover?
2. early-exit saving: fused-decode sweep cost when captions terminate
   (EOS-biased theta -> all rows finish at step 1; bench's random theta
   never finishes) — brackets the benefit for trained ~10-token captions.
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

    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.data.core import EpochSampler
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.ops.mutation import MutationKind
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
    engine = NESEngine(task, Adam(0.001), MutationKind.DEFAULT, pop_chunk=48)
    F = POP // 2
    rng = np.random.default_rng(0)
    theta = task.generate_theta(jax.random.PRNGKey(0))
    sens = jnp.ones((engine.dim,), jnp.float32)
    sampler = EpochSampler(task.train_n, seed=0)

    # ---- probe 1: gens_per_dispatch sweep -------------------------------------------
    for b in (8, 16, 32):
        opt_state = engine.optimizer.init(engine.dim)
        th = theta
        pending = []

        def block(th, opt_state):
            seeds = rng.integers(0, 2**32, size=(b, F), dtype=np.uint32)
            idx = np.stack([sampler.member_batches(F, BATCH) for _ in range(b)])
            th, opt_state, packs = engine.generation_block(
                th, opt_state, sens, 0.01, seeds, idx, 0.001, 1e-7)
            pending.append(packs)
            if len(pending) > 1:
                fits, _, _ = engine.unpack(pending.pop(0), F)
                assert np.isfinite(fits).all()
            return th, opt_state

        t0 = time.time()
        th, opt_state = block(th, opt_state)
        log(f"b={b}: warmup {time.time() - t0:.1f}s")
        times = []
        for _ in range(6):
            t0 = time.time()
            th, opt_state = block(th, opt_state)
            times.append((time.time() - t0) / b)
        for p in pending:
            engine.unpack(p, F)
        med = float(np.median(times)) * 1e3
        log(f"gens_per_dispatch={b}: median {med:.1f} ms/gen "
            f"-> {POP / (med / 1e3):.0f} evals/s")

    # ---- probe 2: early-exit bracket ------------------------------------------------
    # EOS-biased theta: logit bias of token 0 dominates -> every row finishes
    # at step 1 and the gated kernel skips the remaining 16 steps
    th_eos = np.asarray(theta).copy()
    off = task.spec.offset("logit.bias")
    th_eos[off] += 50.0
    th_eos = jnp.asarray(th_eos)

    for name, th in (("random (never finishes)", theta),
                     ("EOS@1 (all finish step 1)", th_eos)):
        seeds = rng.integers(0, 2**32, size=F, dtype=np.uint32)
        idx = sampler.member_batches(F, BATCH)
        out, _ = engine.eval_generation(th, sens, 0.01, seeds, idx)
        jax.block_until_ready(out)
        times = []
        for _ in range(5):
            t0 = time.time()
            out, _ = engine.eval_generation(th, sens, 0.01, seeds, idx)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        log(f"decode sweep, {name}: {float(np.median(times)) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
