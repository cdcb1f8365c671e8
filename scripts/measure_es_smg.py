"""Measure NIC-ES SM-G-SUM sensitivity cost at the reference's mscoco_es
scale (VERDICT r1 item 7): mu=50 parents, fc_caption (2,865,808 params),
batch 256 — the regime of /root/reference/experiments/mscoco_es.json with
safe_mutations switched to SM-G-SUM (reference: safe_mutations.py:93-117).

Reports, per generation:
  * the fused per-parent sensitivity sweep (ONE lax.map program over the
    (mu, dim) parent matrix) — cost of `ESMaster._update_sensitivities`;
  * the lambda=1000 offspring fitness sweep for context (the rest of the
    generation's device work).

Run on the real chip:  python scripts/measure_es_smg.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MU = 50          # population_size (reference mscoco_es.json)
LAMBDA = 1000    # nb_offspring
BATCH = 256
REPS = 5


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

    from nes_img_captioning_tpu.algorithms.es import ESEngine
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import calc_sensitivities
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    log(f"devices: {jax.devices()}")

    data_dir = os.environ.get("NES_BENCH_DATA", "/tmp/nes_bench_data")
    if not os.path.isfile(os.path.join(data_dir, "cocotalk.json")):
        make_synthetic_coco(
            data_dir, n_train=2048, n_val=256, n_test=256,
            vocab_size=9487, fc_feat_size=2048, cap_len=9, seed=0,
        )
    exp = {
        "dataset": "mscoco",
        "caption_options": {
            "input_json": os.path.join(data_dir, "cocotalk.json"),
            "input_label_h5": os.path.join(data_dir, "cocotalk_label.h5"),
            "input_fc_dir": os.path.join(data_dir, "fc"),
        },
        "policy_options": {"fitness": "greedy", "model_options": {}},
    }
    # bf16 rollout = the production precision (bench.py, mscoco_*.json);
    # the sensitivity sweep autodiffs in f32 regardless
    task = CocoTask(exp, Config(batch_size=BATCH),
                    TpuConfig(seed=0, precision="bf16"))
    dim = task.spec.num_params
    log(f"fc_caption: {dim:,} params; mu={MU}, lambda={LAMBDA}, batch={BATCH}")

    rng = np.random.default_rng(0)
    parents = jnp.stack(
        [task.generate_theta(jax.random.PRNGKey(i)) for i in range(MU)]
    )
    idx = jnp.asarray(rng.integers(0, task.train_n, size=BATCH, dtype=np.int32))

    # --- fused per-parent SM-G-SUM sweep (one program) -------------------------------
    log("compiling sensitivity sweep ...")
    t0 = time.time()
    sens = jax.block_until_ready(
        calc_sensitivities(task, parents, idx, MutationKind.SAFE_GRAD_SUM, 0.01)
    )
    log(f"warmup (incl. compile): {time.time() - t0:.1f}s; "
        f"sens shape {sens.shape}, min {float(sens.min()):.3f}")
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        jax.block_until_ready(
            calc_sensitivities(task, parents, idx,
                               MutationKind.SAFE_GRAD_SUM, 0.01)
        )
        ts.append(time.time() - t0)
    sens_ms = float(np.median(ts)) * 1e3
    log(f"SM-G-SUM sweep ({MU} parents): {[round(t*1e3) for t in ts]} ms "
        f"-> median {sens_ms:.0f} ms/generation "
        f"({sens_ms / MU:.1f} ms/parent)")

    # --- offspring fitness sweep at lambda=1000 for context --------------------------
    engine = ESEngine(task, MutationKind.SAFE_GRAD_SUM, pop_chunk=48)
    seeds = rng.integers(0, 2**32, size=LAMBDA, dtype=np.uint32)
    pidx = rng.integers(0, MU, size=LAMBDA).astype(np.int32)
    log("compiling offspring sweep ...")
    t0 = time.time()
    out = engine.eval_generation(parents, sens, 0.01, seeds, pidx,
                                 np.asarray(idx))
    fit = np.asarray(task.host_fitness(out, np.asarray(idx)))
    log(f"warmup (incl. compile): {time.time() - t0:.1f}s")
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        out = engine.eval_generation(parents, sens, 0.01, seeds, pidx,
                                     np.asarray(idx))
        fit = np.asarray(task.host_fitness(out, np.asarray(idx)))
        ts.append(time.time() - t0)
    sweep_ms = float(np.median(ts)) * 1e3
    log(f"lambda={LAMBDA} offspring sweep+fitness: "
        f"{[round(t*1e3) for t in ts]} ms -> median {sweep_ms:.0f} ms")
    assert np.isfinite(fit).all()

    total = sens_ms + sweep_ms
    log(f"TOTAL SM-G-SUM generation (device work): {total:.0f} ms "
        f"(sensitivity {100 * sens_ms / total:.0f}%)")


if __name__ == "__main__":
    main()
