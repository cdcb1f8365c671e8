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


def _run_two_processes(exp_file, max_iterations: int, devices_per_proc=2,
                       timeout=900):
    """Launch the real CLI twice as a 2-process jax.distributed gang over
    2*devices_per_proc global virtual CPU devices; returns the two stdout
    transcripts after asserting both exited 0."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ) + f" --xla_force_host_platform_device_count={devices_per_proc}"

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "nes_img_captioning_tpu.main", "master",
             "--exp_file", str(exp_file),
             "--max_iterations", str(max_iterations),
             "--platform", "cpu",
             "--coordinator", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid}:\n{out[-3000:]}"
    return outs


def _stat_lines(out: str, label: str):
    return [ln.split("|")[2].strip() for ln in out.splitlines()
            if f"| {label}:" in ln]


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

    outs = _run_two_processes(exp_file, max_iterations=2)

    # lockstep: both processes saw identical per-generation fitness stats
    for label in ("RewMean", "RewMax", "UpdateRatio"):
        a, b = _stat_lines(outs[0], label), _stat_lines(outs[1], label)
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

    outs = _run_two_processes(exp_file, max_iterations=4)

    for label in ("RewMean", "RewMax", "EliteAcc"):
        a, b = _stat_lines(outs[0], label), _stat_lines(outs[1], label)
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


def _coco_multihost_exp(data_dir: str, log_dir: str, **over):
    """Captioning experiment at fixture dims for 2-process runs: the
    flagship multihost plumbing (CocoTask.place_on_mesh re-homing the
    feature/label/scorer tables as global arrays, DeviceCider
    device_consts placement, decode-layout perturbation) all engages."""
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco

    copts = make_synthetic_coco(data_dir, n_train=48, n_val=12, n_test=12,
                                vocab_size=25, fc_feat_size=32)
    return {
        "algorithm": over.pop("algorithm", "nic_nes"),
        "config": {
            "eval_prob": 0.003, "noise_stdev": 0.01,
            "snapshot_freq": over.pop("snapshot_freq", 4),
            "batch_size": 8, "val_batch_size": 8, "num_val_items": 8,
            "patience": 0, "schedule_start": 1000, "schedule_limit": 1000,
            "stdev_divisor": 1, "bs_multiplier": 1, "stepsize_divisor": 1,
            "l2coeff": 1e-7, "single_batch": False,
        },
        "policy_options": {
            "net": "fc_caption", "fitness": "greedy", "vbn": False,
            "model_options": {
                "safe_mutations": over.pop("safe_mutations", ""),
                "safe_mutation_underflow": 0.1,
                "input_encoding_size": 16, "rnn_size": 16,
                "fc_feat_size": 32,
            },
        },
        "optimizer_options": {"type": "adam", "args": {"stepsize": 0.001}},
        "dataset": "mscoco",
        "nb_offspring": over.pop("nb_offspring", 4),
        "population_size": over.pop("population_size", 4),
        "selection": "uniform",
        "num_elites": 1,
        "num_elite_cands": 1,
        "caption_options": copts,
        "log_dir": log_dir,
        **over,
    }


def _load_state_dict_finite(path: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    assert sd, f"empty state dict at {path}"
    for k, v in sd.items():
        assert np.isfinite(v.numpy()).all(), k
    return sd


@pytest.mark.slow
def test_two_process_coco_nes_val_fused_blocks(tmp_path):
    """Flagship path under multi-controller execution: NES on the captioning
    task with tpu.gens_per_dispatch=2 — val-fused blocks (in-program
    per-generation validation + device-resident podium, K=2 lax.scan) over
    the 4 global devices. Asserts bit-identical per-generation stat series
    across the two processes, primary-only artifacts, and that the lazy
    podium settle (_materialize_podium -> pull_chunked on the GLOBAL
    (E, dim) array) produced a loadable best-elite .pth whose score is the
    max per-generation validation score."""
    exp = _coco_multihost_exp(str(tmp_path / "data"), str(tmp_path / "run"))
    exp["tpu"] = {"seed": 17, "gens_per_dispatch": 2}
    exp_file = tmp_path / "exp.json"
    exp_file.write_text(json.dumps(exp))

    outs = _run_two_processes(exp_file, max_iterations=4)

    for out in outs:
        assert "fused validation: in-program" in out
        assert "(+1 chained)" in out

    # bit-identical stat series on every label (both processes replay the
    # same host bookkeeping from the same pulled packed rows)
    for label in ("RewMean", "RewMax", "RewMin", "EliteAcc", "BestEliteAcc",
                  "UpdateRatio", "NormMean"):
        a, b = _stat_lines(outs[0], label), _stat_lines(outs[1], label)
        assert len(a) == 4 and a == b, (label, a, b)

    run_dir = tmp_path / "run"
    snaps = list((run_dir / "snapshot").glob("z_info_*.json"))
    assert len(snaps) == 1
    infos = json.loads(snaps[0].read_text())
    assert infos["iter"] == 4
    assert os.path.isfile(infos["current_model"])
    assert str(run_dir) in infos["current_model"]
    assert "nes_replica_logdir_" not in snaps[0].read_text()

    # podium settle round-trip: best-elite slot file materialized from the
    # device-merged global rows, score == max validation score seen
    (elite_path, elite_score), = infos["best_elites"]
    assert os.path.isfile(elite_path) and str(run_dir) in elite_path
    _load_state_dict_finite(elite_path)
    vals = [float(v) for v in _stat_lines(outs[0], "EliteAcc")]
    # the stat table prints 4 significant digits; compare at that precision
    assert abs(elite_score - max(vals)) < 1e-3, (elite_score, vals)


@pytest.mark.slow
def test_two_process_coco_es_fused_smg(tmp_path):
    """Fused ES on the captioning task with inline SM-G-SUM across two
    jax.distributed processes: per-parent sensitivities computed in-program
    from the mesh-placed dataset, offspring sweep sharded over the global
    devices, chained 2-generation blocks with the device podium merge, lazy
    slot-file settle through pull_chunked on global arrays."""
    exp = _coco_multihost_exp(str(tmp_path / "data"), str(tmp_path / "run"),
                              algorithm="nic_es", safe_mutations="SM-G-SUM",
                              nb_offspring=8)
    exp["tpu"] = {"seed": 19, "gens_per_dispatch": 2}
    exp_file = tmp_path / "exp.json"
    exp_file.write_text(json.dumps(exp))

    outs = _run_two_processes(exp_file, max_iterations=4)

    for label in ("RewMean", "RewMax", "RewMin", "EliteAcc"):
        a, b = _stat_lines(outs[0], label), _stat_lines(outs[1], label)
        assert len(a) == 4 and a == b, (label, a, b)
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
    (elite_path, _), = infos["best_elites"]
    assert os.path.isfile(elite_path)
    _load_state_dict_finite(elite_path)
    assert "nes_replica_logdir_" not in snaps[0].read_text()
