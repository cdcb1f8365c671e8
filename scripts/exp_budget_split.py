"""Decompose the fused NES generation's device budget at bench scale by
DCE ablation: XLA dead-code-eliminates whatever the packed outputs don't
consume, so swapping the fitness source isolates each stage.

  full       : decode + CIDEr + noise + gradient + update   (the real thing)
  no_cider   : fitness = sum(seq)     -> CIDEr DCE'd
  no_decode  : fitness = sum(delta)   -> decode + CIDEr DCE'd (noise + grad
               + update + dispatch overhead remain)

Differences give the CIDEr share and the decode+prep share under the
decode-layout path. Chained K=8 blocks amortize dispatch like bench.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POP, BATCH, K = 288, 128, 8


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
    F = POP // 2
    rng = np.random.default_rng(0)
    theta = jnp.asarray(task.generate_theta(jax.random.PRNGKey(0)))
    sampler = EpochSampler(task.train_n, seed=0)

    orig_rollout_dec = CocoTask.rollout_dec

    def no_cider(self, vec_dec, idx, key=None):
        from nes_img_captioning_tpu.ops.decode_pallas import decode_fused

        params = self.decode_layout.prep(vec_dec, self._decode_dtype)
        seq = decode_fused(params, self.train_fc[idx],
                           seq_length=self.model.options.seq_length,
                           need_logprobs=False)[0]
        return {"fitness": seq.sum().astype(jnp.float32)}

    def no_decode(self, vec_dec, idx, key=None):
        return {"fitness": vec_dec.sum() + idx.sum()}

    results = {}
    for name, fn in (("full", orig_rollout_dec), ("no_cider", no_cider),
                     ("no_decode", no_decode)):
        CocoTask.rollout_dec = fn
        eng = NESEngine(task, Adam(0.001), MutationKind.DEFAULT,
                        pop_chunk=48, rng_impl="rbg")
        assert eng._layout is not None

        opt_state = eng.optimizer.init(eng.dim)
        th = theta
        pending = []

        def block(th, opt_state):
            seeds = rng.integers(0, 2**32, size=(K, F), dtype=np.uint32)
            idx = np.stack([sampler.member_batches(F, BATCH) for _ in range(K)])
            th, opt_state, packs = eng.generation_block(
                th, opt_state, jnp.ones((eng.dim,), jnp.float32), 0.01,
                seeds, idx, 0.001, 1e-7)
            pending.append(packs)
            if len(pending) > 1:
                fits, _, _ = eng.unpack(pending.pop(0), F)
                assert np.isfinite(fits).all()
            return th, opt_state

        t0 = time.time()
        th, opt_state = block(th, opt_state)
        log(f"{name}: warmup {time.time() - t0:.1f}s")
        times = []
        for _ in range(6):
            t0 = time.time()
            th, opt_state = block(th, opt_state)
            times.append((time.time() - t0) / K)
        for p in pending:
            eng.unpack(p, F)
        med = float(np.median(times)) * 1e3
        results[name] = med
        log(f"{name}: {med:.1f} ms/gen")

    CocoTask.rollout_dec = orig_rollout_dec
    log(f"CIDEr share: {results['full'] - results['no_cider']:.1f} ms/gen")
    log(f"decode+prep share: {results['no_cider'] - results['no_decode']:.1f} ms/gen")
    log(f"noise+grad+update+overhead: {results['no_decode']:.1f} ms/gen")


if __name__ == "__main__":
    main()
