"""SM-G-SUM sensitivity cost levers at the mscoco_es scale (VERDICT r2 #3).

The per-parent sensitivity sweep is 77% of an SM-G ES generation
(1,437 ms of 1,878 ms at mu=50 / lambda=1000 / batch 256 — docs/RESULTS.md).
This experiment measures the three algorithmic levers plus the existing
precision knob, each against the (batch 256, split 100, f32) reference
configuration:

  (a) Jacobian over a subsampled batch  (tpu.sensitivity_batch)
  (b) wider vocab grouping -> fewer VJP rows (tpu.sensitivity_split;
      reference hard-codes split=100, src/captioning/nets.py:64-70)
  (d) bf16 MXU precision                (tpu.sensitivity_precision)

Fidelity = relative error of the resulting sensitivity vectors vs the
reference configuration (median / p99 / max over all mu x dim entries), plus
the induced relative change of the realized noise scale 1/sens. Lever (c) —
reusing elite-row sensitivities across generations — is analyzed separately:
its ceiling is num_elites/mu of the sweep (6% at the reference's 3/50), so it
is reported as a computed bound, not implemented.

Run on the real chip:  python scripts/exp_smg_levers.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MU = 50
BATCH = 256
REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import calc_sensitivities
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    log(f"devices: {jax.devices()}")
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

    def build_task(split):
        exp = {"dataset": "mscoco", "caption_options": copts,
               "policy_options": {"fitness": "greedy", "model_options": {}}}
        return CocoTask(exp, Config(batch_size=BATCH),
                        TpuConfig(seed=0, precision="bf16",
                                  sensitivity_split=split))

    task100 = build_task(100)
    rng = np.random.default_rng(0)
    parents = jnp.stack(
        [task100.generate_theta(jax.random.PRNGKey(i)) for i in range(MU)]
    )
    idx_full = rng.integers(0, task100.train_n, size=BATCH, dtype=np.int32)

    from nes_img_captioning_tpu.ops.sensitivity import probe_key_from_seed

    def run(task, idx, precision, probes=0):
        pkey = (probe_key_from_seed(jax.random.key, np.uint32(1234))
                if probes else None)
        t0 = time.time()
        sens = jax.block_until_ready(calc_sensitivities(
            task, parents, jnp.asarray(idx), MutationKind.SAFE_GRAD_SUM,
            0.01, matmul_precision=precision, probes=probes, probe_key=pkey,
        ))
        warm = time.time() - t0
        ts = []
        for r in range(REPS):
            # FRESH inputs every rep: repeat dispatches with identical
            # buffers get memoized somewhere in the axon stack and time ~0
            # (same trap family as RESULTS.md's "constant inputs let XLA
            # hoist work"); np.asarray forces a real result pull as the sync
            idx_r = np.roll(np.asarray(idx), r + 1)
            t0 = time.time()
            out = calc_sensitivities(
                task, parents, jnp.asarray(idx_r),
                MutationKind.SAFE_GRAD_SUM, 0.01,
                matmul_precision=precision, probes=probes, probe_key=pkey,
            )
            np.asarray(out[0, :8])
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        return np.asarray(sens), float(np.median(ts)) * 1e3, warm

    configs = [
        ("baseline b256 s100 f32", 100, BATCH, "float32", 0),
        ("b64 s100 f32", 100, 64, "float32", 0),
        ("b128 s100 f32", 100, 128, "float32", 0),
        ("b256 s400 f32", 400, BATCH, "float32", 0),
        ("b256 s100 bf16", 100, BATCH, "bfloat16", 0),
        ("b64 s400 f32", 400, 64, "float32", 0),
        ("b64 s400 bf16", 400, 64, "bfloat16", 0),
        # (e) randomized column-norm probes (tpu.sensitivity_probes):
        # R VJP rows instead of 97, UNBIASED for the split-100 quantity
        ("probes12 b256 s100 f32", 100, BATCH, "float32", 12),
        ("probes24 b256 s100 f32", 100, BATCH, "float32", 24),
        ("probes48 b256 s100 f32", 100, BATCH, "float32", 48),
        ("probes24 b64 s100 f32", 100, 64, "float32", 24),
        ("probes24 b64 s100 bf16", 100, 64, "bfloat16", 24),
    ]
    tasks = {100: task100, 400: build_task(400)}
    results = []
    base = None
    for name, split, b, prec, probes in configs:
        sens, ms, warm = run(tasks[split], idx_full[:b], prec, probes)
        row = {"config": name, "ms_per_gen": round(ms),
               "ms_per_parent": round(ms / MU, 1),
               "warmup_s": round(warm, 1)}
        if base is None:
            base = sens
        else:
            # relative error of the NOISE SCALE (delta = noise / sens): what
            # the mutation actually consumes
            rel = np.abs(1.0 / sens - 1.0 / base) * base
            row.update({
                "scale_rel_err_median": float(np.median(rel)),
                "scale_rel_err_p99": float(np.quantile(rel, 0.99)),
                "scale_rel_err_max": float(rel.max()),
                "speedup": round(results[0]["ms_per_gen"] / ms, 2),
            })
        log(row)
        results.append(row)

    # lever (c) ceiling: elite rows are num_elites of mu rows of the sweep
    results.append({
        "config": "lever (c) skip unchanged elite rows (BOUND, not run)",
        "note": "ceiling = num_elites/mu of the sweep = 3/50 = 6% "
                "(0.086 s of 1.44 s); requires reusing a STALE batch's "
                "sensitivities across generations (the reference recomputes "
                "per task+parent) — not worth the semantic deviation",
    })
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
