"""Multi-host execution: two jax.distributed CPU processes drive the same
NES experiment through the real CLI, with the population axis sharded over
the 4 global (2 per process) virtual devices.

Replaces what the reference proves with its Redis TCP + shared-FS transport
(reference: src/dist.py:33-65, src/scripts/local_run_exp.pbs): work spans
processes, every process stays in lockstep, and only the primary writes the
run's artifacts.

Known flake mode on this 1-core harness: when ANOTHER process is hogging
the host (a concurrent TPU training run, a second pytest), one of the two
subprocesses can starve long enough to miss jax.distributed's shutdown
barrier and die with a DEADLINE_EXCEEDED/CoordinationServiceError. Both
tests pass reliably on a quiet machine; rerun alone before suspecting the
multihost wiring.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_nes_generation(tmp_path):
    exp = json.load(open(os.path.join(REPO, "experiments/mnist_nes.json")))
    exp["nb_offspring"] = 8
    exp["synthetic_sizes"] = [64, 16]
    exp["config"].update({"batch_size": 8, "snapshot_freq": 2})
    # plain mutation here keeps the test fast; the ES test below covers the
    # SM-G sensitivity path under multi-controller execution
    exp["policy_options"]["model_options"]["safe_mutations"] = ""
    exp["log_dir"] = str(tmp_path / "run")
    exp["tpu"] = {"seed": 11}  # REQUIRED: hosts must draw identical streams
    exp_file = tmp_path / "exp.json"
    exp_file.write_text(json.dumps(exp))

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ) + " --xla_force_host_platform_device_count=2"

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "nes_img_captioning_tpu.main", "master",
             "--exp_file", str(exp_file), "--max_iterations", "2",
             "--platform", "cpu",
             "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid}:\n{out[-3000:]}"

    # lockstep: both processes saw identical per-generation fitness stats
    def stat_lines(out, label):
        return [ln.split("|")[2].strip() for ln in out.splitlines()
                if f"| {label}:" in ln]

    for label in ("RewMean", "RewMax", "UpdateRatio"):
        a, b = stat_lines(outs[0], label), stat_lines(outs[1], label)
        assert len(a) == 2 and a == b, (label, a, b)

    # only the primary owns the run directory artifacts
    run_dir = tmp_path / "run"
    snaps = list((run_dir / "snapshot").glob("z_info_*.json"))
    assert len(snaps) == 1
    infos = json.loads(snaps[0].read_text())
    assert infos["iter"] == 2
    assert os.path.isfile(infos["current_model"])
    assert str(run_dir) in infos["current_model"]
    # the replica's scratch dir never leaks into the primary's artifacts
    assert "nes_replica_logdir_" not in snaps[0].read_text()
    assert np.isfinite(infos["score_stats"]).all()


@pytest.mark.slow
def test_two_process_es_generation(tmp_path):
    """NIC-ES across two jax.distributed processes: offspring sweep sharded
    over the global devices, lockstep host bookkeeping, primary-only
    artifacts (incl. the parents/elite .pth files the z_info references)."""
    exp = json.load(open(os.path.join(REPO, "experiments/mnist_es.json")))
    exp["nb_offspring"] = 8
    exp["population_size"] = 4
    exp["num_elites"] = 1
    exp["num_elite_cands"] = 1
    exp["synthetic_sizes"] = [64, 16]
    exp["config"].update({"batch_size": 8, "snapshot_freq": 2,
                          "patience": 0})
    # keep mnist_es.json's SM-G-SUM: exercises the per-parent sensitivity
    # sweep under multi-controller execution (replicated jit output feeding
    # the sharded offspring sweep)
    assert exp["policy_options"]["model_options"]["safe_mutations"] == "SM-G-SUM"
    exp["log_dir"] = str(tmp_path / "run")
    # blocks engage at gen 3 (podium full after gen 2): gens 3-4 run as one
    # 2-generation fused block, exercising the device-side podium merge +
    # lazy materialization under multi-controller lockstep
    exp["tpu"] = {"seed": 13, "gens_per_dispatch": 2}
    exp_file = tmp_path / "exp.json"
    exp_file.write_text(json.dumps(exp))

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ) + " --xla_force_host_platform_device_count=2"

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "nes_img_captioning_tpu.main", "master",
             "--exp_file", str(exp_file), "--max_iterations", "4",
             "--platform", "cpu",
             "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid}:\n{out[-3000:]}"

    def stat_lines(out, label):
        return [ln.split("|")[2].strip() for ln in out.splitlines()
                if f"| {label}:" in ln]

    for label in ("RewMean", "RewMax", "EliteAcc"):
        a, b = stat_lines(outs[0], label), stat_lines(outs[1], label)
        assert len(a) == 4 and a == b, (label, a, b)
    # the 2-generation block actually ran on both processes
    for out in outs:
        assert "(+1 chained)" in out

    run_dir = tmp_path / "run"
    snaps = list((run_dir / "snapshot").glob("z_info_*.json"))
    assert len(snaps) == 1
    infos = json.loads(snaps[0].read_text())
    assert infos["iter"] == 4
    for _, path in infos["parents"] + infos["elites_to_evaluate"]:
        assert os.path.isfile(path), path
        assert str(run_dir) in path
    assert "nes_replica_logdir_" not in snaps[0].read_text()
