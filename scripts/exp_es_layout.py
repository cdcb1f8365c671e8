"""Probe: ES offspring-sweep cost, torch-order vs decode-ordered children.

The master-loop A/B (`train_synthetic_nes.py --no-es-layout`) is
trajectory-confounded: the layout path draws each child's noise over the
padded decode-ordered axis, so the two legs realize different children,
whose different caption lengths change the decode kernel's early-exit
cost in either direction. This probe isolates the mechanism: the SAME
task, the SAME XENT-warmed parent matrix, the SAME seed/parent-index
streams, two ESEngines differing only in ``use_layout``, timing
``eval_generation`` (the full lambda-offspring decode+fitness sweep) with
fresh seeds+batch rows per rep (identical buffers get memoized in the
tunnel stack).

Only HOST PULLS are trustworthy sync points under the axon tunnel:
``jax.block_until_ready`` can return in ~1 ms on arrays whose programs
have not executed (observed in both the deferred and the per-rep
pattern), while ``np.asarray`` of the same arrays waits the true
~250 ms. So each leg times two ways: (a) per-rep enqueue + pull of the
(1000,) fitness vector (includes one ~30 ms tunnel RTT, identical for
both legs), and (b) amortized — enqueue all reps back-to-back, pull
only the last fitness (in-order device execution makes it wait for all
predecessors), divide by reps. (b) matches the production deferred-pull
discipline and is the headline.

Usage: python scripts/exp_es_layout.py [--pop 1000] [--batch 256] [--reps 7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pop", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--mu", type=int, default=50)
    parser.add_argument("--reps", type=int, default=7)
    parser.add_argument("--pop-chunk", type=int, default=48)
    parser.add_argument("--safe-mutations", type=str, default="",
                        help="e.g. SM-G-SUM: per-parent scale rows on the "
                        "layout path (sens sweep itself is NOT timed here)")
    parser.add_argument("--data", type=str, default="/tmp/nes_train_data")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from nes_img_captioning_tpu.algorithms.es import ESEngine
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    if not os.path.isfile(os.path.join(args.data, "cocotalk.json")):
        make_synthetic_coco(args.data, n_train=8192, n_val=512, n_test=512,
                            vocab_size=9487, fc_feat_size=2048, cap_len=9,
                            seed=0)
    exp = {
        "dataset": "mscoco",
        "caption_options": {
            "input_json": os.path.join(args.data, "cocotalk.json"),
            "input_label_h5": os.path.join(args.data, "cocotalk_label.h5"),
            "input_fc_dir": os.path.join(args.data, "fc"),
        },
        "policy_options": {"fitness": "greedy", "model_options": {}},
    }
    task = CocoTask(exp, Config(batch_size=args.batch),
                    TpuConfig(seed=0, precision="bf16", rng_impl="rbg"))
    assert task.decode_layout is not None, "fused kernel required"
    kind = MutationKind(args.safe_mutations)

    # XENT-warmed parents: realistic early-exit behavior in the kernel
    pth = os.path.join(args.data, "xent_500.pth")
    if os.path.isfile(pth):
        theta = jnp.asarray(task.spec.load_pth(pth))
        log(f"parents from {pth}")
    else:
        theta = jnp.asarray(task.generate_theta(jax.random.PRNGKey(0)))
        log("parents from random init (no XENT checkpoint found)")
    P, dim = args.mu, task.spec.num_params
    prng = np.random.default_rng(0)
    parents = theta[None] + 0.01 * jnp.asarray(
        prng.standard_normal((P, dim)), jnp.float32
    )
    sens_rows = P if kind in (MutationKind.SAFE_GRAD_SUM,
                              MutationKind.SAFE_GRAD_ABS) else 1
    sens = jnp.asarray(1.0 + prng.random((sens_rows, dim)), jnp.float32)
    n_train = task.train_n  # NOT the make_synthetic_coco arg: --data may
    # point at a pre-existing fixture built with fewer rows, and OOB
    # gather indices clamp silently on TPU

    results = {}
    for name, use_layout in (("layout", True), ("torch-order", False)):
        eng = ESEngine(task, kind, pop_chunk=args.pop_chunk,
                       rng_impl="rbg", use_layout=use_layout)
        assert (eng._layout is not None) == use_layout

        def sweep(seed_offset):
            r = np.random.default_rng(seed_offset)
            seeds = r.integers(0, 2**32, size=args.pop, dtype=np.uint32)
            pidx = r.integers(0, P, size=args.pop).astype(np.int32)
            idx = r.choice(n_train, size=args.batch, replace=False)
            return eng.eval_generation(
                parents, sens, 0.01, seeds, pidx, idx.astype(np.int32)
            )["fitness"]

        np.asarray(sweep(10**6))  # compile + warm (true pull)
        times = []
        for rep in range(args.reps):
            t0 = time.time()
            np.asarray(sweep(rep))
            times.append(time.time() - t0)
        med = float(np.median(times)) * 1e3
        t0 = time.time()
        last = None
        for rep in range(args.reps, 2 * args.reps):
            last = sweep(rep)
        np.asarray(last)
        amort = (time.time() - t0) / args.reps * 1e3
        results[name] = amort
        log(f"{name}: amortized {amort:.1f} ms/sweep, per-rep-pull median "
            f"{med:.1f} ms ({args.pop} offspring x {args.batch} images, "
            f"kind={kind.name})")

    ratio = results["torch-order"] / results["layout"]
    log(f"layout speedup: {ratio:.3f}x "
        f"({results['torch-order']:.1f} -> {results['layout']:.1f} ms)")


if __name__ == "__main__":
    main()
