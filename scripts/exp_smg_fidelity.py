"""Clamp-aware fidelity of the SM-G cost levers (companion to
exp_smg_levers.py, which times them).

After _postprocess (clamp at underflow, divide by it), the vast majority of
sensitivity entries sit AT the clamp (raw sensitivity < underflow), so
whole-vector error aggregates hide the tail that actually shapes the noise.
This probe compares each lever's sensitivity against the (b256, s100, f32)
reference on the UNCLAMPED entries only: their fraction, the rel-error
median/p99/max of the noise scale 1/sens there, and the set agreement of
which entries are unclamped.

Run on the real chip:  python scripts/exp_smg_fidelity.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MU = 8  # fidelity statistics stabilize with few parents; keep the run cheap
BATCH = 256


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

    tasks = {100: build_task(100), 400: build_task(400)}
    rng = np.random.default_rng(0)
    parents = jnp.stack([
        tasks[100].generate_theta(jax.random.PRNGKey(i)) for i in range(MU)
    ])
    idx = rng.integers(0, tasks[100].train_n, size=BATCH, dtype=np.int32)

    from nes_img_captioning_tpu.ops.sensitivity import probe_key_from_seed

    def sens_of(split, b, prec, probes=0):
        pkey = (probe_key_from_seed(jax.random.key, np.uint32(1234))
                if probes else None)
        return np.asarray(calc_sensitivities(
            tasks[split], parents, jnp.asarray(idx[:b]),
            MutationKind.SAFE_GRAD_SUM, 0.01, matmul_precision=prec,
            probes=probes, probe_key=pkey,
        ))

    base = sens_of(100, BATCH, "float32")
    un_base = base > 1.0 + 1e-6  # entries NOT at the underflow clamp
    out = [{"config": "baseline b256 s100 f32",
            "unclamped_frac": float(un_base.mean())}]
    for name, split, b, prec, probes in [
        ("b128 s100 f32", 100, 128, "float32", 0),
        ("b64 s100 f32", 100, 64, "float32", 0),
        ("b256 s400 f32", 400, BATCH, "float32", 0),
        ("b256 s100 bf16", 100, BATCH, "bfloat16", 0),
        ("b64 s400 bf16", 400, 64, "bfloat16", 0),
        ("probes12 b256 s100 f32", 100, BATCH, "float32", 12),
        ("probes24 b256 s100 f32", 100, BATCH, "float32", 24),
        ("probes48 b256 s100 f32", 100, BATCH, "float32", 48),
        ("probes24 b64 s100 bf16", 100, 64, "bfloat16", 24),
    ]:
        s = sens_of(split, b, prec, probes)
        un = s > 1.0 + 1e-6
        both = un & un_base
        rel = np.abs(1.0 / s[both] - 1.0 / base[both]) * base[both]
        out.append({
            "config": name,
            "unclamped_frac": float(un.mean()),
            "unclamped_set_agreement": float(
                (un == un_base).mean()
            ),
            "scale_rel_err_unclamped_median": float(np.median(rel)),
            "scale_rel_err_unclamped_p99": float(np.quantile(rel, 0.99)),
            "scale_rel_err_unclamped_max": float(rel.max()),
        })
        print(json.dumps(out[-1]), file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
