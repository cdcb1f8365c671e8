"""Annealing end-to-end: drive the REAL master loops through patience and
schedule curriculum firings for both algorithms, and resume from a
post-anneal snapshot.

Reference behavior (src/algorithm/tools/iteration.py:135-154,181-192 +
tools/experiment.py:64-65): a firing divides sigma by ``stdev_divisor``,
multiplies batch size by ``bs_multiplier`` (tracked in ``times_orig_bs``),
divides the NES stepsize by ``stepsize_divisor``, and rebuilds the loaders
at the new batch size; ``from_infos`` restores sigma/bs/times_orig_bs
exactly. Unit tests pin the Iteration-level math (test_bookkeeping.py);
these tests pin the full loop: sampler rebuild, new program shapes, the
epoch break-and-rebuild, and post-anneal resume.
"""

import glob
import json

import numpy as np
import pytest

from nes_img_captioning_tpu.utils.config import load_experiment


def _exp(algorithm: str, log_dir: str, **over):
    name = "mnist_es" if algorithm == "nic_es" else "mnist_nes"
    exp = load_experiment(f"experiments/{name}.json")
    exp["log_dir"] = log_dir
    exp["nb_offspring"] = over.pop("nb_offspring", 6)
    exp["policy_options"]["model_options"]["safe_mutations"] = ""
    exp["config"].update({
        "batch_size": 16, "snapshot_freq": over.pop("snapshot_freq", 1),
        "stdev_divisor": 2, "bs_multiplier": 2, "stepsize_divisor": 2,
        "patience": over.pop("patience", 0),
        "schedule_start": over.pop("schedule_start", 1000),
        "schedule_limit": over.pop("schedule_limit", 1000),
    })
    exp["synthetic_sizes"] = [128, 32]
    exp["data_root"] = "/nonexistent"  # force the synthetic mnist fixture
    exp["tpu"] = {"seed": 7, **over.pop("tpu", {})}
    exp.update(over)
    return exp


def _make_master(exp):
    if exp["algorithm"] == "nic_es":
        from nes_img_captioning_tpu.algorithms.es import ESMaster

        return ESMaster(exp)
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    return NESMaster(exp)


def _latest_zinfo(log_dir: str) -> str:
    snaps = glob.glob(f"{log_dir}/snapshot/z_info_*.json")
    assert len(snaps) == 1  # save_snapshot deletes the previous one
    return snaps[0]


@pytest.mark.slow
def test_nes_patience_anneal_end_to_end(tmp_path):
    """Patience firing through run_master: a constant validation score means
    the podium never improves after generation 1, so with patience=2 the
    counter exceeds it at generation 4 — sigma halves, batch size doubles,
    the stepsize divides, the sampler rebuilds, and generations 5-6 run at
    the new shapes. A post-anneal snapshot resumes exactly."""
    exp = _exp("nic_nes", str(tmp_path / "run"), patience=2)
    master = _make_master(exp)
    sigma0 = master.it.noise_stdev()
    bs0 = master.it.batch_size()
    lr0 = master.optimizer.stepsize
    master.task.validate = lambda theta: 0.5  # never improves the podium

    master.run_master(max_iterations=6)

    it = master.it
    assert it.noise_stdev() == sigma0 / 2
    assert it.batch_size() == bs0 * 2
    assert it.times_orig_bs() == 2
    assert master.optimizer.stepsize == lr0 / 2
    # training continued at the new shapes: 6 generations recorded, batch
    # size series shows the switch at generation 4 (bad gens 2,3,4 -> fire)
    # patience fires during generation 4's elite processing (which precedes
    # the stats recording), so generation 4 already LOGS the stepped batch
    # size even though its rollouts ran at bs0; generations 5-6 run at the
    # new shapes
    bs_series = master.stats.bs_stats()
    assert len(bs_series) == 6
    assert bs_series == [bs0, bs0, bs0, bs0 * 2, bs0 * 2, bs0 * 2]
    assert len(master.stats.score_stats()[1]) == 6
    assert np.isfinite(master.stats.score_stats()[1]).all()

    # resume from the post-anneal snapshot: sigma/bs/times_orig_bs restored
    zinfo = _latest_zinfo(str(tmp_path / "run"))
    infos = json.loads(open(zinfo).read())
    assert infos["noise_stdev"] == sigma0 / 2
    assert infos["batch_size"] == bs0 * 2
    assert infos["times_orig_bs"] == 2

    exp2 = _exp("nic_nes", str(tmp_path / "run2"), patience=2)
    exp2["from_infos"] = zinfo
    master2 = _make_master(exp2)
    assert master2.it.noise_stdev() == sigma0 / 2
    assert master2.it.batch_size() == bs0 * 2
    assert master2.it.times_orig_bs() == 2
    master2.task.validate = lambda theta: 0.5
    # resume re-runs the snapshotted iteration (counters stored
    # post-increment, rewound by one): iterations 6,7,8 append to the 6
    # restored entries. bad_generations resumed at 2, so the re-run of
    # iteration 6 is the 3rd consecutive bad generation and patience fires
    # AGAIN — exactly what the restored counter implies.
    master2.run_master(max_iterations=8)
    assert master2.it.batch_size() == bs0 * 4
    assert master2.it.times_orig_bs() == 4
    assert len(master2.stats.score_stats()[1]) == 9


@pytest.mark.slow
@pytest.mark.parametrize("algorithm", ["nic_nes", "nic_es"])
def test_schedule_anneal_end_to_end(tmp_path, algorithm):
    """Schedule firing through run_master for both algorithms:
    schedule_start=2, schedule_limit=2 fires at iterations 2 and 4 — two
    curriculum steps, each doubling the batch size and halving sigma, with
    training continuing at each new shape; post-anneal resume restores
    sigma/bs/times_orig_bs exactly."""
    exp = _exp(algorithm, str(tmp_path / "run"),
               schedule_start=2, schedule_limit=2)
    master = _make_master(exp)
    sigma0 = master.it.noise_stdev()
    bs0 = master.it.batch_size()
    lr0 = getattr(getattr(master, "optimizer", None), "stepsize", None)

    master.run_master(max_iterations=5)

    it = master.it
    assert it.noise_stdev() == pytest.approx(sigma0 / 4)
    assert it.batch_size() == bs0 * 4
    assert it.times_orig_bs() == 4
    if lr0 is not None:  # NES only: lr /= stepsize_divisor per firing
        assert master.optimizer.stepsize == pytest.approx(lr0 / 4)
    # the firing iteration itself already runs at the stepped shapes
    # (incr_iteration fires the schedule before the generation executes)
    assert master.stats.bs_stats() == [bs0, 2 * bs0, 2 * bs0, 4 * bs0,
                                       4 * bs0]
    assert len(master.stats.score_stats()[1]) == 5
    assert np.isfinite(master.stats.score_stats()[1]).all()

    zinfo = _latest_zinfo(str(tmp_path / "run"))
    infos = json.loads(open(zinfo).read())
    assert infos["noise_stdev"] == pytest.approx(sigma0 / 4)
    assert infos["batch_size"] == bs0 * 4
    assert infos["times_orig_bs"] == 4

    exp2 = _exp(algorithm, str(tmp_path / "run2"),
                schedule_start=2, schedule_limit=2)
    exp2["from_infos"] = zinfo
    master2 = _make_master(exp2)
    assert master2.it.noise_stdev() == pytest.approx(sigma0 / 4)
    assert master2.it.batch_size() == bs0 * 4
    assert master2.it.times_orig_bs() == 4
    # resume rewinds one iteration (counters stored post-increment):
    # iterations 5 and 6 re-run, appending to the 5 restored entries, and
    # iteration 6 fires the schedule again ((6-2) % 2 == 0) -> bs0 * 8
    master2.run_master(max_iterations=6)
    assert len(master2.stats.score_stats()[1]) == 7
    assert master2.it.batch_size() == bs0 * 8


@pytest.mark.slow
def test_coco_nes_schedule_anneal_on_fused_blocked_path(tmp_path):
    """Schedule firing on the FLAGSHIP captioning path: fused Pallas decode
    (in-kernel pair perturbation auto-on), val-fused 2-generation blocks,
    and a mid-run batch-size/sigma step. The block planner must run the
    firing iteration alone (nes.py:_block_budget), every program rebuilds at
    the new batch shape (decode kernel, DeviceCider wave, sampler), and a
    post-anneal resume restores the stepped state — the mnist anneal tests
    cover the loop arithmetic; this covers the shape-rebuild machinery the
    real model exercises."""
    from nes_img_captioning_tpu.algorithms.nes import NESMaster
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco

    copts = make_synthetic_coco(str(tmp_path / "d"), n_train=48, n_val=12,
                                n_test=12, vocab_size=25, fc_feat_size=32)

    def coco_exp(log_dir):
        return {
            "algorithm": "nic_nes",
            "config": {
                "eval_prob": 0.003, "noise_stdev": 0.01, "snapshot_freq": 1,
                "batch_size": 8, "val_batch_size": 8, "num_val_items": 8,
                "patience": 0, "schedule_start": 3, "schedule_limit": 3,
                "stdev_divisor": 2, "bs_multiplier": 2,
                "stepsize_divisor": 2, "l2coeff": 1e-7,
                "single_batch": False,
            },
            "policy_options": {
                "net": "fc_caption", "fitness": "greedy", "vbn": False,
                "model_options": {
                    "safe_mutations": "", "input_encoding_size": 16,
                    "rnn_size": 16, "fc_feat_size": 32,
                },
            },
            "optimizer_options": {"type": "adam",
                                  "args": {"stepsize": 0.001}},
            "dataset": "mscoco", "nb_offspring": 4, "num_elites": 1,
            "caption_options": copts, "log_dir": log_dir,
            "tpu": {"seed": 0, "fused_decode": True, "precision": "f32",
                    "gens_per_dispatch": 2},
        }

    master = NESMaster(coco_exp(str(tmp_path / "run")))
    master.task._fused_interpret = True  # run the Pallas kernel on CPU
    assert master.engine._kernel_perturb, \
        "the pair kernel must ride this run (greedy + fused + layout)"
    sigma0 = master.it.noise_stdev()
    bs0 = master.it.batch_size()
    lr0 = master.optimizer.stepsize

    master.run_master(max_iterations=5)

    assert master._val_fused  # blocks + in-program validation engaged
    it = master.it
    assert it.noise_stdev() == pytest.approx(sigma0 / 2)
    assert it.batch_size() == bs0 * 2
    assert it.times_orig_bs() == 2
    assert master.optimizer.stepsize == pytest.approx(lr0 / 2)
    # schedule fires at iteration 3, which runs at the stepped shapes
    assert master.stats.bs_stats() == [bs0, bs0, 2 * bs0, 2 * bs0, 2 * bs0]
    assert len(master.stats.score_stats()[1]) == 5
    assert np.isfinite(master.stats.score_stats()[1]).all()
    assert len(master.stats.acc_stats()) == 5  # val-fused: every generation

    zinfo = _latest_zinfo(str(tmp_path / "run"))
    infos = json.loads(open(zinfo).read())
    assert infos["noise_stdev"] == pytest.approx(sigma0 / 2)
    assert infos["batch_size"] == bs0 * 2
    assert infos["times_orig_bs"] == 2

    exp2 = coco_exp(str(tmp_path / "run2"))
    exp2["from_infos"] = zinfo
    master2 = NESMaster(exp2)
    master2.task._fused_interpret = True
    assert master2.it.noise_stdev() == pytest.approx(sigma0 / 2)
    assert master2.it.batch_size() == bs0 * 2
    assert master2.it.times_orig_bs() == 2
    # rewound one iteration: 5 and 6 re-run at the stepped shapes, and
    # iteration 6 fires the schedule again ((6-3) % 3 == 0) -> bs0 * 4
    master2.run_master(max_iterations=6)
    assert len(master2.stats.score_stats()[1]) == 7
    assert master2.it.batch_size() == bs0 * 4
    assert np.isfinite(master2.stats.score_stats()[1]).all()


@pytest.mark.slow
def test_es_patience_anneal_end_to_end(tmp_path):
    """ES patience firing through run_master on the host-choreographed path
    (tpu.fused_es=false pins host validation so the never-improving score is
    stubbable): same trigger arithmetic as NES, plus the ES-specific state —
    parents survive the anneal and the next generation evaluates at the new
    batch size."""
    # num_elites=1: with >1 podium slots, early generations keep "improving"
    # the podium by filling empty slots at the constant score, delaying the
    # bad-generation counter in a capacity-dependent way
    exp = _exp("nic_es", str(tmp_path / "run"), patience=2,
               tpu={"fused_es": False},
               num_elites=1, num_elite_cands=1)
    master = _make_master(exp)
    sigma0 = master.it.noise_stdev()
    bs0 = master.it.batch_size()
    master.task.validate = lambda theta: 0.5

    master.run_master(max_iterations=6)

    it = master.it
    assert it.noise_stdev() == sigma0 / 2
    assert it.batch_size() == bs0 * 2
    assert it.times_orig_bs() == 2
    assert len(master.stats.score_stats()[1]) == 6
    bs_series = master.stats.bs_stats()
    assert bs_series[0] == bs0 and bs_series[-1] == bs0 * 2

    zinfo = _latest_zinfo(str(tmp_path / "run"))
    infos = json.loads(open(zinfo).read())
    assert infos["batch_size"] == bs0 * 2 and infos["times_orig_bs"] == 2
    # ES z_info carries parents; they must exist for the resume
    assert infos["parents"]

    exp2 = _exp("nic_es", str(tmp_path / "run2"), patience=2,
                tpu={"fused_es": False},
                num_elites=1, num_elite_cands=1)
    exp2["from_infos"] = zinfo
    master2 = _make_master(exp2)
    assert master2.it.batch_size() == bs0 * 2
    assert master2.it.times_orig_bs() == 2
    master2.task.validate = lambda theta: 0.5
    # rewound one iteration: 6 and 7 re-run on top of the 6 restored entries
    master2.run_master(max_iterations=7)
    assert len(master2.stats.score_stats()[1]) == 8
