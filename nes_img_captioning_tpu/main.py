"""CLI entry point.

The reference splits the run into ``master`` and ``workers`` subcommands
wired through Redis (reference: src/main.py:24-50); here the whole population
loop is one SPMD process, so ``master`` runs the experiment outright and a
``workers`` invocation is accepted-but-explained for interface familiarity.

Usage:
    python -m nes_img_captioning_tpu.main master --exp_file experiments/mnist_nes.json
    python -m nes_img_captioning_tpu.main master --algo nic_es --exp_file ...
"""

from __future__ import annotations

import argparse
import logging

from .utils.config import load_experiment
from .utils.logger import setup_logging


def run(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("who", type=str, choices=["master", "workers"])
    parser.add_argument("--algo", type=str, default=None,
                        help="nic_es | nic_nes (default: from the experiment json)")
    parser.add_argument("--exp_file", type=str,
                        default="experiments/mnist_es.json")
    parser.add_argument("--plot", action="store_true", default=False)
    parser.add_argument("--max_iterations", type=int, default=None,
                        help="override config.max_nb_iterations")
    # multi-host SPMD (replaces the reference's Redis TCP + shared-FS
    # transport, src/dist.py:33-65): every host runs this same command with
    # its own --process_id; requires the experiment to set tpu.seed
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of process 0 (jax.distributed)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu); needed "
                        "because a preset JAX_PLATFORMS env var wins over "
                        "later env changes")
    # accepted for reference-script compatibility; unused in SPMD execution
    parser.add_argument("--master_socket_path", type=str, default=None)
    parser.add_argument("--master_host", type=str, default=None)
    parser.add_argument("--master_port", type=int, default=None)
    parser.add_argument("--relay_socket_path", type=str, default=None)
    parser.add_argument("--num_workers", type=int, default=None)
    args = parser.parse_args(argv)

    setup_logging()

    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    mesh = None
    if args.num_processes and args.num_processes > 1:
        from .parallel.mesh import make_mesh
        from .parallel.multihost import init_multihost

        init_multihost(args.coordinator, args.num_processes, args.process_id)
        mesh = make_mesh()  # spans all global devices

    if args.who == "workers":
        logging.info(
            "This framework runs the population loop as a single SPMD program "
            "over the TPU mesh; there is no separate worker fleet to start. "
            "Run `master` (scaling comes from the device mesh)."
        )
        return None

    exp = load_experiment(args.exp_file)
    algo = args.algo or exp["algorithm"]
    exp["algorithm"] = algo

    if algo == "nic_es":
        from .algorithms.es import ESMaster

        logging.info("RUNNING NIC-ES")
        master = ESMaster(exp, mesh=mesh)
    elif algo == "nic_nes":
        from .algorithms.nes import NESMaster

        logging.info("RUNNING NIC-NES")
        master = NESMaster(exp, mesh=mesh)
    else:
        raise ValueError(f"unknown algorithm {algo!r}")

    try:
        master.run_master(plot=args.plot, max_iterations=args.max_iterations)
    except KeyboardInterrupt:
        from .algorithms.snapshot import save_snapshot

        save_snapshot(master.stats, master.it, master.experiment,
                      loader_state=master.loader_state())
        if args.plot:
            master.stats.plot_stats(master.experiment.snapshot_dir())
    return master


if __name__ == "__main__":
    run()
