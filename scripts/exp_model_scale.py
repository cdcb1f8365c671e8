"""Model-dimension scaling of the fused NES generation (production-scale
evidence): the bench regime (pop 288, batch 128, greedy on-device CIDEr-D,
8 gens/dispatch) at input_encoding/rnn_size 128 (reference dims), 256, and
512. The Pallas decode kernel keeps one member's weights VMEM-resident for
the whole decode, so the interesting question is where the working set
stops fitting and what throughput does as the MXU work grows ~4x per
doubling.

Run on the real chip:  python scripts/exp_model_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POP, BATCH, N_TIMED = 288, 128, 6
GENS_PER_DISPATCH = 8


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
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    data_dir = os.environ.get("NES_BENCH_DATA", "/tmp/nes_bench_data")
    if not os.path.isfile(os.path.join(data_dir, "cocotalk.json")):
        make_synthetic_coco(data_dir, n_train=2048, n_val=256, n_test=256,
                            vocab_size=9487, fc_feat_size=2048, cap_len=9,
                            seed=0)
    copts = {
        "input_json": os.path.join(data_dir, "cocotalk.json"),
        "input_label_h5": os.path.join(data_dir, "cocotalk_label.h5"),
        "input_fc_dir": os.path.join(data_dir, "fc"),
    }

    results = []
    for width in (128, 256, 512):
        exp = {
            "dataset": "mscoco", "caption_options": copts,
            "policy_options": {"fitness": "greedy", "model_options": {
                "input_encoding_size": width, "rnn_size": width,
                "fc_feat_size": 2048}},
        }
        task = CocoTask(exp, Config(batch_size=BATCH),
                        TpuConfig(seed=0, precision="bf16"))
        engine = NESEngine(task, Adam(0.001), MutationKind.DEFAULT,
                           pop_chunk=48, rng_impl="rbg")
        log(f"width {width}: {task.spec.num_params:,} params, "
            f"fused={task._fused}, layout={task.decode_layout is not None}")

        F = POP // 2
        rng = np.random.default_rng(0)
        theta = task.generate_theta(jax.random.PRNGKey(0))
        sens = jax.numpy.ones((engine.dim,), jax.numpy.float32)
        opt_state = engine.optimizer.init(engine.dim)
        sampler = EpochSampler(task.train_n, seed=0)
        pending = []

        def generation(theta, opt_state):
            b = GENS_PER_DISPATCH
            seeds = rng.integers(0, 2**32, size=(b, F), dtype=np.uint32)
            idx = np.stack([sampler.member_batches(F, BATCH)
                            for _ in range(b)])
            theta, opt_state, packs = engine.generation_block(
                theta, opt_state, sens, 0.01, seeds, idx, 0.001, 1e-7)
            pending.append(packs)
            if len(pending) > 1:
                fits, _, _ = engine.unpack(pending.pop(0), F)
                assert np.isfinite(fits).all()
            return theta, opt_state

        t0 = time.time()
        theta, opt_state = generation(theta, opt_state)
        warm = time.time() - t0
        log(f"width {width}: warmup {warm:.1f}s")
        times = []
        for _ in range(N_TIMED):
            t0 = time.time()
            theta, opt_state = generation(theta, opt_state)
            times.append((time.time() - t0) / GENS_PER_DISPATCH)
        for p in pending:
            assert np.isfinite(engine.unpack(p, F)[0]).all()
        ms = float(np.median(times)) * 1e3
        row = {"width": width, "params": int(task.spec.num_params),
               "ms_per_gen": round(ms, 1),
               "evals_per_s": round(POP / (ms / 1e3), 1),
               "warmup_s": round(warm, 1)}
        log(row)
        results.append(row)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
