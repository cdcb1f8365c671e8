"""Probe: streaming-softmax tiled decode kernel (VERDICT r2 #6).

Times the engine-shaped 288-member x 128-image greedy decode sweep with the
untiled kernel vs ``vocab_tile`` variants (streaming max/argmax over vocab
tiles + predicated embed-tile skip, ops/decode_pallas.py) in TWO regimes:

  * random theta — argmax tokens spread uniformly over the 9600-wide padded
    vocab, so nearly every embed tile is occupied (worst case; this is the
    bench regime);
  * XENT-warm-started theta — trained captioners emit a small frequent-word
    working set, so most embed tiles skip (the predicated win, if any).

Run on the real chip:  python scripts/exp_decode_tiles.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POP, BATCH, REPS = 288, 128, 5


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
        prepare_decode_params,
    )
    from nes_img_captioning_tpu.pretrain import pretrain_xent
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
    rng = np.random.default_rng(0)

    theta_rand = jnp.asarray(task.generate_theta(jax.random.PRNGKey(0)))
    xent_path = os.path.join(data_dir, "xent_tiles_300.pth")
    if not os.path.isfile(xent_path):
        log("XENT pretraining 300 steps for the trained-theta regime ...")
        th = pretrain_xent(task, steps=300, lr=5e-4, batch_size=64, seed=0)
        spec.save_pth(np.asarray(th), xent_path)
    theta_trained = jnp.asarray(spec.load_pth(xent_path))

    feats = task.train_fc[
        jnp.asarray(rng.integers(0, task.train_n, size=BATCH, dtype=np.int32))
    ]

    def sweep(theta, vocab_tile, seeds_exact):
        """POP members (theta + per-member noise) decoding one batch —
        the eval-sweep shape of a generation without fitness."""
        @jax.jit
        def run(theta, seeds):
            def member(seed):
                delta = 0.01 * jax.random.normal(
                    jax.random.key(seed), (spec.num_params,), jnp.float32
                )
                p = prepare_decode_params(spec, theta + delta, opts,
                                          dtype=jnp.bfloat16)
                return decode_fused(p, feats, seq_length=opts.seq_length,
                                    need_logprobs=False,
                                    vocab_tile=vocab_tile)[0]

            return jax.lax.map(
                lambda s: jax.vmap(member)(s),
                seeds.reshape(6, POP // 6),
            )

        # fixed seed set across tile configs: `out` is the token-exactness
        # witness, so every config must decode the SAME member noise
        out = jax.block_until_ready(run(theta, seeds_exact))  # compile + warm
        ts = []
        for r in range(REPS):
            # fresh seeds per rep: repeat dispatches with identical buffers
            # get memoized in the tunnel stack and time ~0 ms
            seeds_r = jnp.asarray(
                rng.integers(0, 2**32, size=POP, dtype=np.uint32)
            )
            t0 = time.time()
            jax.block_until_ready(run(theta, seeds_r))
            ts.append(time.time() - t0)
        return float(np.median(ts)) * 1e3, np.asarray(out)

    results = []
    for regime, theta in (("random", theta_rand), ("trained", theta_trained)):
        seeds_exact = jnp.asarray(
            rng.integers(0, 2**32, size=POP, dtype=np.uint32)
        )
        base_ms, base_seq = sweep(theta, 0, seeds_exact)
        row = {"regime": regime, "untiled_ms": round(base_ms, 1)}
        # distinct-token working set drives the embed-tile skip rate
        toks = np.unique(base_seq)
        row["distinct_tokens"] = int(len(toks))
        log(row)
        # lane-multiple divisors of Vpad=9600: 128*{1,3,5,15,25,75}
        for tile in (1920, 3200):
            ms, seq = sweep(theta, tile, seeds_exact)
            assert np.array_equal(seq, base_seq), \
                f"{regime} tile {tile}: tokens diverged"
            row[f"tile{tile}_ms"] = round(ms, 1)
            log(row)
        results.append(row)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
