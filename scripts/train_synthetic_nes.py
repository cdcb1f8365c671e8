"""Extended learning-behavior run on the real chip: XENT warm start + NES
with the reference's mscoco_nes hyperparameters (sigma 0.01, Adam 0.001,
pop 288, batch 128, greedy CIDEr-D fitness) on the synthetic 8192-image
fixture at real model dimensions, driven through the REAL master loop
(validation, podium, annealing bookkeeping all live).

Round-1 evidence stopped at 200 generations (val CIDEr 0.0031 -> 0.0187);
the decode-layout engine makes longer horizons cheap. Results land in
docs/RESULTS.md.

Usage: python scripts/train_synthetic_nes.py [--gens 1000] [--xent-steps 500]
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
    parser = argparse.ArgumentParser()
    parser.add_argument("--algo", choices=["nic_nes", "nic_es"],
                        default="nic_nes")
    parser.add_argument("--gens", type=int, default=1000)
    parser.add_argument("--xent-steps", type=int, default=500)
    # --pop counts member EVALUATIONS (rollouts). For NES this converts to
    # nb_offspring = pop/2 antithetic PAIRS (reference semantics,
    # nes.py:_pair_count); for ES one offspring = one rollout, so
    # nb_offspring = pop directly.
    parser.add_argument("--pop", type=int, default=288)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--val-freq", type=int, default=25)
    parser.add_argument("--data", type=str, default="/tmp/nes_train_data")
    parser.add_argument("--out", type=str, default="/tmp/nes_train_run")
    # SM-G regime knobs (ES; docs/RESULTS.md "SM-G sensitivity levers")
    parser.add_argument("--safe-mutations", type=str, default="")
    parser.add_argument("--sens-batch", type=int, default=0)
    parser.add_argument("--sens-split", type=int, default=100)
    parser.add_argument("--sens-precision", type=str, default="float32")
    parser.add_argument("--sens-probes", type=int, default=0,
                        help="tpu.sensitivity_probes: randomized SM-G-SUM "
                             "column-norm estimator, 0 = exact jacrev")
    parser.add_argument("--no-fused-es", action="store_true",
                        help="force the host-choreographed ES path")
    parser.add_argument("--es-layout", default="false",
                        choices=["true", "false"],
                        help="tpu.es_decode_layout: decode-ordered ES "
                        "children. Measured a wash/slight loss at "
                        "mscoco_es dims (docs/RESULTS.md), so off by "
                        "default like the engine")
    parser.add_argument("--fused-validation", default="auto",
                        choices=["auto", "true", "false"],
                        help="NES in-program validation + device podium "
                        "(tpu.fused_validation; needs --val-freq 1 to do "
                        "anything). auto = on when --block > 1")
    parser.add_argument("--block", type=int, default=8,
                        help="tpu.gens_per_dispatch (both algorithms)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu for sanity "
                        "runs; the JAX_PLATFORMS env var is ignored here "
                        "because the TPU plugin presets it)")
    parser.add_argument("--snapshot-freq", type=int, default=0,
                        help="config.snapshot_freq (0 = final only; each "
                        "ES snapshot pulls ~540 MB of parent rows through "
                        "the tunnel)")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nes_img_captioning_tpu.algorithms.nes import NESMaster
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.pretrain import pretrain_xent
    from nes_img_captioning_tpu.tasks import make_task
    from nes_img_captioning_tpu.utils.config import (
        Config,
        parse_config,
        parse_tpu_config,
    )
    from nes_img_captioning_tpu.utils.logger import setup_logging

    setup_logging()

    if not os.path.isfile(os.path.join(args.data, "cocotalk.json")):
        make_synthetic_coco(args.data, n_train=8192, n_val=512, n_test=512,
                            vocab_size=9487, fc_feat_size=2048, cap_len=9,
                            seed=0)
    copts = {
        "input_json": os.path.join(args.data, "cocotalk.json"),
        "input_label_h5": os.path.join(args.data, "cocotalk_label.h5"),
        "input_fc_dir": os.path.join(args.data, "fc"),
    }

    exp = {
        "algorithm": args.algo,
        "dataset": "mscoco",
        "nb_offspring": (max(args.pop // 2, 1) if args.algo == "nic_nes"
                         else args.pop),
        "num_elites": 1,
        "config": {
            "noise_stdev": 0.01, "batch_size": args.batch,
            "val_batch_size": 256, "num_val_items": 512,
            "patience": 0, "schedule_start": 10**9, "schedule_limit": 0,
            "stdev_divisor": 1, "bs_multiplier": 1, "stepsize_divisor": 1,
            "l2coeff": 1e-7, "single_batch": False,
            "snapshot_freq": args.snapshot_freq,
        },
        "policy_options": {
            "net": "fc_caption", "fitness": "greedy",
            "model_options": {},
        },
        "optimizer_options": {"type": "adam", "args": {"stepsize": 0.001}},
        "caption_options": copts,
        "tpu": {"seed": 0, "pop_chunk": 48, "precision": "bf16",
                "rng_impl": "rbg", "gens_per_dispatch": args.block,
                "val_freq": args.val_freq},
        "log_dir": args.out,
    }

    # XENT warm start (the reference's external bu_xent_09.pth role)
    pre_path = os.path.join(args.data, f"xent_{args.xent_steps}.pth")
    if not os.path.isfile(pre_path):
        task = make_task(exp, parse_config(exp), parse_tpu_config(exp))
        t0 = time.time()
        theta = pretrain_xent(task, steps=args.xent_steps, lr=5e-4,
                              batch_size=64, seed=0)
        task.spec.save_pth(np.asarray(theta), pre_path)
        log(f"XENT pretrain {args.xent_steps} steps: {time.time() - t0:.0f}s")
    exp["from_single"] = pre_path

    if args.safe_mutations:
        # SM-G on either algorithm: ES computes per-parent sensitivities
        # in-program (fused_es); NES inlines the current-theta sensitivity
        # into the fused generation (inline_sens, late r3) so SM-G blocks
        # work there too
        exp["policy_options"]["model_options"].update(
            safe_mutations=args.safe_mutations,
            safe_mutation_underflow=0.01,
        )
        exp["tpu"].update(
            sensitivity_batch=args.sens_batch,
            sensitivity_split=args.sens_split,
            sensitivity_precision=args.sens_precision,
            sensitivity_probes=args.sens_probes,
        )

    if args.algo == "nic_es":
        # the reference's mscoco_es.json regime: mu=50 parents, truncation
        # selection, elite candidates validated every generation (val_freq
        # is NES-only). gens_per_dispatch chains fused ES generations —
        # including the podium merge — into one scan program (r3).
        exp["population_size"] = 50
        exp["num_elite_cands"] = 3
        exp["selection"] = "uniform"
        exp["tpu"].pop("val_freq", None)
        if args.no_fused_es:
            exp["tpu"]["fused_es"] = False
        exp["tpu"]["es_decode_layout"] = args.es_layout == "true"
        from nes_img_captioning_tpu.algorithms.es import ESMaster

        master = ESMaster(exp)
    else:
        exp["tpu"]["fused_validation"] = {
            "auto": "auto", "true": True, "false": False,
        }[args.fused_validation]
        master = NESMaster(exp)
    t0 = time.time()
    master.run_master(max_iterations=args.gens)
    wall = time.time() - t0

    acc = master.stats.acc_stats()
    fits = master.stats.score_stats()[2]  # max series
    times = list(master.stats.time_stats())
    tail = times[len(times) // 2:] or times
    out = {
        "generations": len(acc),
        "wall_s": round(wall, 1),
        "sec_per_gen_median_tail": round(float(np.median(tail)), 3),
        "val_cider_first": acc[0],
        "val_cider_last": acc[-1],
        "val_cider_best": max(acc),
        "val_curve_every_50": [round(v, 4) for v in acc[::50]],
        "train_fit_first": fits[0],
        "train_fit_last": fits[-1],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
