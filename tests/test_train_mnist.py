"""End-to-end integration tests: MNIST NIC-NES / NIC-ES train for a few
generations on the 8-virtual-device CPU mesh (the reference's cheap smoke
workload role, SURVEY.md §4), produce reference-format checkpoints, and
improve fitness.
"""

import glob
import json
import os

import numpy as np
import pytest

from nes_img_captioning_tpu.utils.config import load_experiment


def _mnist_exp(algorithm: str, log_dir: str, **over):
    exp = load_experiment(f"experiments/mnist_{ 'es' if algorithm=='nic_es' else 'nes' }.json")
    exp["log_dir"] = log_dir
    exp["nb_offspring"] = over.pop("nb_offspring", 16)
    exp["config"]["batch_size"] = 32
    exp["config"]["snapshot_freq"] = 2
    # keep the smoke test fast: plain gaussian mutation by default
    exp["policy_options"]["model_options"]["safe_mutations"] = over.pop(
        "safe_mutations", ""
    )
    exp["tpu"] = {"seed": 0, **over.pop("tpu", {})}
    exp.update(over)
    return exp


def test_nes_trains_and_checkpoints(tmp_path):
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _mnist_exp("nic_nes", str(tmp_path / "run"))
    master = NESMaster(exp)
    f0 = None
    master.run_master(max_iterations=4)

    stats = master.stats
    means = stats.score_stats()[1]
    assert len(means) == 4
    # -xent fitness should improve from random (~-2.30) within 4 generations
    assert means[-1] > means[0]

    # reference-format artifacts
    zinfos = glob.glob(str(tmp_path / "run" / "snapshot" / "z_info_*.json"))
    assert len(zinfos) == 1
    with open(zinfos[0]) as f:
        infos = json.load(f)
    for key in ("score_stats", "noise_std_stats", "best_elites", "current_model",
                "optimizer_state", "trainloader_lth", "orig_bs"):
        assert key in infos, key
    assert os.path.isfile(infos["current_model"])
    assert os.path.isfile(infos["optimizer_state"])
    assert os.path.isfile(master.it.best_elites()[0][0])


@pytest.mark.slow
def test_nes_resume_from_infos(tmp_path):
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _mnist_exp("nic_nes", str(tmp_path / "run1"))
    NESMaster(exp).run_master(max_iterations=2)
    zinfo = glob.glob(str(tmp_path / "run1" / "snapshot" / "z_info_*.json"))[0]

    exp2 = _mnist_exp("nic_nes", str(tmp_path / "run2"))
    exp2["from_infos"] = zinfo
    master2 = NESMaster(exp2)
    assert master2.it.iteration() == 1  # stored post-increment value - 1
    assert len(master2.stats.score_stats()[1]) == 2
    master2.run_master(max_iterations=4)
    # resume re-runs the snapshotted iteration (reference: iteration.py:64-66
    # stores iter-1), so iterations 2,3,4 append to the 2 restored entries
    assert len(master2.stats.score_stats()[1]) == 5


def test_nes_population_is_nb_offspring_pairs(tmp_path):
    """``nb_offspring`` counts antithetic PAIRS — 2*nb_offspring rollouts
    per generation. Reference: one worker result = one mirrored (pos, neg)
    pair (nic_nes_worker.py:142-161), the master counts nb_offspring results
    (tools/iteration.py:110-112, initialized :173), and ``fitnesses()``
    stacks to (nb_offspring, 2) (nic_nes/iteration.py:63-67), making the
    gradient normalizer ranked_fitnesses.size = 2*nb_offspring
    (nic_nes_master.py:181)."""
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    NB = 5  # odd on purpose: pairs need no divisibility by 2
    exp = _mnist_exp("nic_nes", str(tmp_path / "run"), nb_offspring=NB)
    master = NESMaster(exp)
    assert master._pair_count() == NB

    captured = []
    orig_unpack = master.engine.unpack

    def unpack_spy(packed, F):
        out = orig_unpack(packed, F)
        captured.append((F, np.asarray(out[0])))
        return out

    master.engine.unpack = unpack_spy
    master.run_master(max_iterations=2)

    assert captured, "the fused mnist path unpacks fitnesses per generation"
    for F, fits in captured:
        assert F == NB
        # per generation: (nb_offspring, 2) pos/neg fitnesses
        assert fits.reshape(-1, NB, 2).shape[1:] == (NB, 2)
    # the stats series recorded all 2*nb_offspring rollout fitnesses
    # (reference flat_fitnesses, nic_nes/iteration.py:66-67): the score
    # min/max come from the full flattened population
    assert len(master.stats.score_stats()[1]) == 2


def test_nes_single_batch_mode(tmp_path):
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _mnist_exp("nic_nes", str(tmp_path / "run"))
    exp["config"]["single_batch"] = True
    master = NESMaster(exp)
    master.run_master(max_iterations=2)
    assert len(master.stats.score_stats()[1]) == 2


@pytest.mark.slow
def test_nes_safe_mutations_smoke(tmp_path):
    from nes_img_captioning_tpu.algorithms.nes import NESMaster
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import calc_sensitivity

    exp = _mnist_exp(
        "nic_nes", str(tmp_path / "run"), safe_mutations="SM-G-SUM"
    )
    master = NESMaster(exp)
    # fused task + SM-G => the generation program computes the sensitivity
    # in-program; the host-side operand stays a dummy all-ones vector
    assert master.engine.inline_sens
    master.run_master(max_iterations=2)
    assert np.all(np.asarray(master._sens) == 1.0)
    # the machinery itself: a sensitivity of the final theta is clamped at
    # the underflow then divided by it, and non-trivial
    sens = np.asarray(calc_sensitivity(
        master.task, master.theta, np.arange(8, dtype=np.int32),
        MutationKind.SAFE_GRAD_SUM, 0.01,
    ))
    assert sens.min() >= 1.0
    assert sens.max() > 1.0


@pytest.mark.slow
def test_nes_inline_sens_matches_host_sens(tmp_path):
    """The in-program SM-G sensitivity (inline_sens) must reproduce the
    host-computed path exactly: one fused generation with the sensitivity
    computed inside the program equals one with the sensitivity computed by
    calc_sensitivity and passed as the `sens` operand."""
    import jax

    from nes_img_captioning_tpu.algorithms.nes import NESEngine, NESMaster
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import calc_sensitivity

    for kind in (MutationKind.SAFE_GRAD_SUM, MutationKind.SAFE_GRAD_ABS):
        exp = _mnist_exp("nic_nes", str(tmp_path / f"run_{kind.value}"),
                         safe_mutations=kind.value)
        master = NESMaster(exp)  # for its task/theta plumbing only
        task, theta = master.task, master.theta
        opt0 = Adam(0.01).init(task.spec.num_params)

        rng = np.random.default_rng(3)
        F = 4
        seeds = rng.integers(0, 2**32, size=F, dtype=np.uint32)
        idx = np.tile(np.arange(8, dtype=np.int32), (F, 1))

        eng_inline = NESEngine(task, Adam(0.01), kind, pop_chunk=4)
        assert eng_inline.inline_sens
        th_a, _, packed_a = eng_inline.generation(
            theta, opt0, master._sens, 0.05, seeds, idx, 0.01, 0.0)

        eng_host = NESEngine(task, Adam(0.01), kind, pop_chunk=4,
                             inline_sens=False)
        assert not eng_host.inline_sens
        sens = calc_sensitivity(task, theta, jax.numpy.asarray(idx[0]),
                                kind, 0.01)
        th_b, _, packed_b = eng_host.generation(
            theta, opt0, sens, 0.05, seeds, idx, 0.01, 0.0)

        np.testing.assert_allclose(np.asarray(packed_a),
                                   np.asarray(packed_b),
                                   rtol=1e-5, atol=1e-6, err_msg=kind.value)
        np.testing.assert_allclose(np.asarray(th_a), np.asarray(th_b),
                                   rtol=1e-5, atol=1e-7, err_msg=kind.value)


@pytest.mark.slow
def test_nes_inline_probe_sens_matches_host(tmp_path):
    """tpu.sensitivity_probes parity across the two SM-G plumbing paths:
    the in-program randomized estimator (inline_sens, key derived in-trace
    from the seeds operand) must equal the host-computed calc_sensitivity
    path given the same member-0 seed — same probe stream, same generation
    output."""
    import jax

    from nes_img_captioning_tpu.algorithms.nes import NESEngine, NESMaster
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import (
        calc_sensitivity, probe_key_from_seed)

    R = 8
    kind = MutationKind.SAFE_GRAD_SUM
    exp = _mnist_exp("nic_nes", str(tmp_path / "run_probes"),
                     safe_mutations=kind.value)
    master = NESMaster(exp)  # for its task/theta plumbing only
    task, theta = master.task, master.theta
    opt0 = Adam(0.01).init(task.spec.num_params)

    rng = np.random.default_rng(7)
    F = 4
    seeds = rng.integers(0, 2**32, size=F, dtype=np.uint32)
    idx = np.tile(np.arange(8, dtype=np.int32), (F, 1))

    eng_inline = NESEngine(task, Adam(0.01), kind, pop_chunk=4,
                           sens_probes=R)
    assert eng_inline.inline_sens and eng_inline._sens_probes == R
    th_a, _, packed_a = eng_inline.generation(
        theta, opt0, master._sens, 0.05, seeds, idx, 0.01, 0.0)

    eng_host = NESEngine(task, Adam(0.01), kind, pop_chunk=4,
                         sens_probes=R, inline_sens=False)
    sens = calc_sensitivity(
        task, theta, jax.numpy.asarray(idx[0]), kind, 0.01,
        probes=R,
        probe_key=probe_key_from_seed(eng_host._mk_key, seeds[0]))
    th_b, _, packed_b = eng_host.generation(
        theta, opt0, sens, 0.05, seeds, idx, 0.01, 0.0)

    np.testing.assert_allclose(np.asarray(packed_a), np.asarray(packed_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(th_a), np.asarray(th_b),
                               rtol=1e-5, atol=1e-7)
    # the estimator must differ from exact (probes actually in effect) yet
    # respect the postprocess floor
    exact = np.asarray(calc_sensitivity(
        task, theta, jax.numpy.asarray(idx[0]), kind, 0.01))
    assert np.asarray(sens).min() >= 1.0
    assert not np.allclose(np.asarray(sens), exact)


@pytest.mark.slow
def test_es_trains_and_checkpoints(tmp_path):
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    exp = _mnist_exp("nic_es", str(tmp_path / "run"), nb_offspring=32)
    # fixed tiny train set (batch == dataset) so truncation selection
    # hill-climbs the actual objective deterministically
    exp["synthetic_sizes"] = [32, 64]
    exp["config"]["snapshot_freq"] = 3
    master = ESMaster(exp)
    master.run_master(max_iterations=6)

    maxes = master.stats.score_stats()[2]
    means = master.stats.score_stats()[1]
    assert len(means) == 6
    assert maxes[-1] > maxes[0]  # best offspring improves on the fixed batch
    assert means[-1] > means[0]  # population mean improves too

    zinfos = glob.glob(str(tmp_path / "run" / "snapshot" / "z_info_*.json"))
    assert len(zinfos) == 1
    with open(zinfos[0]) as f:
        infos = json.load(f)
    for key in ("parents", "elites_to_evaluate", "best_elites"):
        assert key in infos, key
    # all referenced model files exist (resumable checkpoint)
    for _, path in infos["parents"]:
        assert os.path.isfile(path), path
    for _, path in infos["elites_to_evaluate"]:
        assert os.path.isfile(path), path
    # parents = podium elites + selected offspring
    pop, elites = exp["population_size"], exp["num_elites"]
    assert len(infos["parents"]) == pop  # E elites + (pop - E) children


@pytest.mark.slow
def test_es_resume_from_infos(tmp_path):
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    exp = _mnist_exp("nic_es", str(tmp_path / "run1"))
    ESMaster(exp).run_master(max_iterations=2)
    zinfo = glob.glob(str(tmp_path / "run1" / "snapshot" / "z_info_*.json"))[0]

    exp2 = _mnist_exp("nic_es", str(tmp_path / "run2"))
    exp2["from_infos"] = zinfo
    master2 = ESMaster(exp2)
    assert master2.parents_mat is not None
    master2.run_master(max_iterations=3)
    # resume re-runs the snapshotted iteration (see NES resume test)
    assert len(master2.stats.score_stats()[1]) == 4


@pytest.mark.slow
def test_es_resume_after_blocked_run(tmp_path):
    """A z_info written at a block boundary (tpu.gens_per_dispatch>1) is a
    complete reference-format checkpoint: the lazily-materialized podium
    slot files carry the device-merged bytes, parents/candidates exist as
    files, and a fresh master resumes from it (and re-enters blocking)."""
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    exp = _mnist_exp("nic_es", str(tmp_path / "run1"),
                     tpu={"gens_per_dispatch": 4})
    exp["config"].update({"schedule_start": 1000, "schedule_limit": 1000,
                          "patience": 0, "snapshot_freq": 4})
    master = ESMaster(exp)
    master.run_master(max_iterations=8)
    assert master.engine is not None
    zinfo = glob.glob(str(tmp_path / "run1" / "snapshot" / "z_info_*.json"))[0]
    infos = json.load(open(zinfo))
    # the checkpoint's podium files hold the bytes the scores were earned
    # by: reloading each slot and re-validating reproduces its score
    for path, score in infos["best_elites"]:
        assert os.path.isfile(path), path
        theta = master.task.spec.load_pth(path)
        np.testing.assert_allclose(
            master.task.validate(theta), score, rtol=1e-6, atol=1e-7)

    exp2 = _mnist_exp("nic_es", str(tmp_path / "run2"),
                      tpu={"gens_per_dispatch": 4})
    exp2["config"].update({"schedule_start": 1000, "schedule_limit": 1000,
                           "patience": 0, "snapshot_freq": 4})
    exp2["from_infos"] = zinfo
    master2 = ESMaster(exp2)
    master2.run_master(max_iterations=12)
    # resume re-runs the snapshotted iteration (8): 8 loaded + gens 8..12
    assert len(master2.stats.score_stats()[1]) == 13
    assert np.isfinite(master2.stats.score_stats()[1]).all()


@pytest.mark.slow
def test_es_tournament_selection(tmp_path):
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    exp = _mnist_exp("nic_es", str(tmp_path / "run"))
    exp["selection"] = "tournament"
    exp["tournament_size"] = 3
    master = ESMaster(exp)
    master.run_master(max_iterations=2)
    assert len(master.stats.score_stats()[1]) == 2


@pytest.mark.slow
def test_nes_on_virtual_mesh(tmp_path):
    """Population sharded over the 8 virtual CPU devices."""
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _mnist_exp(
        "nic_nes", str(tmp_path / "run"),
        tpu={"seed": 0, "mesh_shape": [8], "pop_chunk": 8},
    )
    master = NESMaster(exp)
    assert master.mesh is not None
    master.run_master(max_iterations=2)
    assert len(master.stats.score_stats()[1]) == 2


@pytest.mark.slow
def test_gens_per_dispatch_block_matches_per_gen(tmp_path):
    """tpu.gens_per_dispatch chains generations into one dispatch with
    identical math and RNG stream: the final theta and every stat series
    must match per-generation driving exactly."""
    import numpy as np
    from nes_img_captioning_tpu.algorithms.nes import NESMaster
    from nes_img_captioning_tpu.utils.config import load_experiment

    thetas, series = [], []
    for b in (1, 4):
        exp = load_experiment("experiments/mnist_nes.json")
        exp["log_dir"] = str(tmp_path / f"run_b{b}")
        exp["nb_offspring"] = 8
        exp["config"].update({"batch_size": 8, "patience": 0,
                              "snapshot_freq": 8, "_schedule_limit": 1})
        exp["config"].pop("schedule_limit", None)
        exp["synthetic_sizes"] = [64, 16]
        # plain gaussian mutation here; the SM-G block path (inline
        # in-program sensitivity) is pinned by
        # test_smg_blocks_match_per_gen below
        exp["policy_options"]["model_options"]["safe_mutations"] = ""
        exp["tpu"] = {"seed": 7, "val_freq": 4, "gens_per_dispatch": b}
        master = NESMaster(exp)
        master.run_master(max_iterations=8)
        thetas.append(np.asarray(master.theta))
        series.append(master.stats.to_dict())

    np.testing.assert_allclose(thetas[0], thetas[1], rtol=1e-5, atol=1e-6)
    for key in ("score_stats", "update_ratio_stats", "acc_stats",
                "norm_stats", "noise_std_stats", "best_acc_so_far_stats"):
        np.testing.assert_allclose(
            np.asarray(series[0][key], dtype=np.float64),
            np.asarray(series[1][key], dtype=np.float64),
            rtol=1e-5, atol=1e-6, err_msg=key,
        )


@pytest.mark.slow
def test_smg_blocks_match_per_gen(tmp_path):
    """SM-G-SUM with tpu.gens_per_dispatch > 1: the block scan recomputes
    the sensitivity from each step's carried theta + batch (inline_sens),
    so blocks are exact — the final theta and stat series must match
    per-generation driving."""
    import numpy as np
    from nes_img_captioning_tpu.algorithms.nes import NESMaster
    from nes_img_captioning_tpu.utils.config import load_experiment

    thetas, series, budgets = [], [], []
    for b in (1, 4):
        exp = load_experiment("experiments/mnist_nes.json")
        exp["log_dir"] = str(tmp_path / f"run_b{b}")
        exp["nb_offspring"] = 8
        exp["config"].update({"batch_size": 8, "patience": 0,
                              "snapshot_freq": 0, "_schedule_limit": 1})
        exp["config"].pop("schedule_limit", None)
        exp["synthetic_sizes"] = [64, 16]
        exp["policy_options"]["model_options"]["safe_mutations"] = "SM-G-SUM"
        exp["tpu"] = {"seed": 7, "val_freq": 4, "gens_per_dispatch": b}
        master = NESMaster(exp)
        assert master.engine.inline_sens
        spy, orig = [], master._block_budget
        master._block_budget = lambda *a, **k: (
            spy.append(orig(*a, **k)) or spy[-1])
        master.run_master(max_iterations=8)
        budgets.append(max(spy))
        thetas.append(np.asarray(master.theta))
        series.append(master.stats.to_dict())

    assert budgets[1] > 1  # SM-G no longer clamps blocks to 1
    np.testing.assert_allclose(thetas[0], thetas[1], rtol=1e-5, atol=1e-6)
    for key in ("score_stats", "update_ratio_stats", "acc_stats",
                "norm_stats", "noise_std_stats", "best_acc_so_far_stats"):
        np.testing.assert_allclose(
            np.asarray(series[0][key], dtype=np.float64),
            np.asarray(series[1][key], dtype=np.float64),
            rtol=1e-5, atol=1e-6, err_msg=key,
        )


def test_val_fused_smoke(tmp_path):
    """tpu.fused_validation=true: validation + podium merge run inside the
    generation program; the host adopts scores and settles slot files
    lazily. Every generation records a FRESH validation score (reference
    cadence), and run end leaves real podium files behind."""
    import os

    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _mnist_exp("nic_nes", str(tmp_path / "run"),
                     tpu={"fused_validation": True})
    exp["config"]["patience"] = 0
    master = NESMaster(exp)
    master.run_master(max_iterations=3)
    assert master._val_fused
    accs = master.stats.acc_stats()
    assert len(accs) == 3 and all(np.isfinite(accs))
    path, score = master.it.best_elites()[0]
    assert os.path.isfile(path)
    assert float(np.float32(score)) in [float(np.float32(a)) for a in accs]
    # the archived elite bytes are a real pre-update theta: loading them
    # reproduces the archived score through host validation
    theta_e = master.task.spec.load_pth(path)
    np.testing.assert_allclose(
        master.task.validate(theta_e), score, rtol=1e-5)


@pytest.mark.slow
def test_val_fused_blocks_match_host_validation(tmp_path):
    """The val-fused block path (in-program validation + device podium,
    tpu.fused_validation + gens_per_dispatch) must reproduce the host
    per-generation path: same theta trajectory, same stat series (incl.
    the acc series — MNIST host validation IS the jitted validate_device),
    same podium scores AND slot-file bytes."""
    import os

    from nes_img_captioning_tpu.algorithms.nes import NESMaster
    from nes_img_captioning_tpu.utils.config import load_experiment

    masters = []
    for tag, tpu in (("host", {}),
                     ("fused", {"fused_validation": True,
                                "gens_per_dispatch": 4})):
        exp = load_experiment("experiments/mnist_nes.json")
        exp["log_dir"] = str(tmp_path / f"run_{tag}")
        exp["nb_offspring"] = 8
        exp["config"].update({"batch_size": 8, "patience": 0,
                              "snapshot_freq": 4, "_schedule_limit": 1})
        exp["config"].pop("schedule_limit", None)
        exp["synthetic_sizes"] = [64, 32]
        exp["policy_options"]["model_options"]["safe_mutations"] = ""
        exp["num_elites"] = 2
        exp["tpu"] = {"seed": 7, **tpu}
        m = NESMaster(exp)
        m.run_master(max_iterations=8)
        masters.append(m)

    a, b = masters
    assert not a._val_fused and b._val_fused
    sa, sb = a.stats.to_dict(), b.stats.to_dict()
    for key in ("score_stats", "update_ratio_stats", "acc_stats",
                "norm_stats", "noise_std_stats", "best_acc_so_far_stats"):
        np.testing.assert_allclose(
            np.asarray(sa[key], np.float64), np.asarray(sb[key], np.float64),
            rtol=1e-5, atol=1e-6, err_msg=key)
    np.testing.assert_allclose(np.asarray(a.theta), np.asarray(b.theta),
                               rtol=1e-5, atol=1e-6)
    for (pa, sca), (pb, scb) in zip(a.it.best_elites(), b.it.best_elites()):
        assert bool(pa) == bool(pb)
        if pa:
            assert os.path.isfile(pb)
            np.testing.assert_allclose(scb, sca, rtol=1e-6)
            np.testing.assert_allclose(
                b.task.spec.load_pth(pb), a.task.spec.load_pth(pa),
                rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_val_fused_resume_from_infos(tmp_path):
    """A z_info written at a val-fused block boundary is a valid resume
    point: the deferred podium slot files are settled before the snapshot,
    and a fresh master resumes from it and keeps training."""
    import glob
    import json

    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _mnist_exp("nic_nes", str(tmp_path / "run"),
                     tpu={"fused_validation": True, "gens_per_dispatch": 2,
                          "seed": 3})
    exp["config"]["patience"] = 0
    exp["config"]["snapshot_freq"] = 2
    master = NESMaster(exp)
    master.run_master(max_iterations=4)
    zinfo = glob.glob(str(tmp_path / "run" / "snapshot" / "z_info_*.json"))[0]
    with open(zinfo) as f:
        infos = json.load(f)
    assert infos["iter"] == 4
    for p, _ in infos["best_elites"]:
        assert os.path.isfile(p), p

    exp2 = _mnist_exp("nic_nes", str(tmp_path / "resumed"),
                      tpu={"fused_validation": True, "gens_per_dispatch": 2,
                           "seed": 3})
    exp2["config"]["patience"] = 0
    exp2["from_infos"] = zinfo
    master2 = NESMaster(exp2)
    master2.run_master(max_iterations=6)
    assert master2.it.iteration() == 6
    # resumed podium carries the checkpointed scores forward (never worse)
    assert master2.it.best_elites()[0][1] >= infos["best_elites"][0][1]


@pytest.mark.slow
def test_carried_scores_enter_podium_once(tmp_path):
    """With val_freq > 1 and chained blocks, a validation score is carried
    over interior generations — it must be submitted to the podium exactly
    once (at the block start, paired with the pre-update model): interior
    submissions could fill open scoreboard capacity with post-update theta
    bytes under the old score."""
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _mnist_exp("nic_nes", str(tmp_path / "run"),
                     tpu={"gens_per_dispatch": 2, "val_freq": 2})
    exp["num_elites"] = 2
    exp["config"]["snapshot_freq"] = 0
    exp["config"]["patience"] = 0
    master = NESMaster(exp)

    submissions = []
    orig = master.it.process_evaluated_elites

    def spy():
        submissions.append(master.it.iteration())
        return orig()

    master.it.process_evaluated_elites = spy
    master.run_master(max_iterations=6)
    # one submission per fresh validation (block starts), none interior
    assert submissions == sorted(set(submissions)), submissions
    filled = [(p, s) for p, s in master.it.best_elites() if p]
    # every filled slot's score is a real validation score
    accs = set(round(a, 6) for a in master.stats.acc_stats())
    for _, s in filled:
        assert round(s, 6) in accs, (s, accs)
    assert len(master.it.best_elites()) == 2  # capacity-padded scoreboard


@pytest.mark.slow
def test_snapshot_pairs_current_opt_state(tmp_path, monkeypatch):
    """Every snapshot must serialize the optimizer state of the SAME
    generation as the theta it references — a mid-run z_info pairing
    post-update theta with the previous generation's Adam moments breaks
    the resume round-trip."""
    from nes_img_captioning_tpu.algorithms import nes as nes_mod
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _mnist_exp("nic_nes", str(tmp_path / "run"))
    exp["config"]["snapshot_freq"] = 2
    master = NESMaster(exp)

    import jax

    mismatches = []
    orig = nes_mod.save_snapshot

    def spy(stats, it, experiment, **kwargs):
        xs = jax.tree_util.tree_leaves(experiment.opt_state)
        ys = jax.tree_util.tree_leaves(master.opt_state)
        same = len(xs) == len(ys) and all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(xs, ys)
        )
        if not same:
            mismatches.append(it.iteration())
        return orig(stats, it, experiment, **kwargs)

    monkeypatch.setattr(nes_mod, "save_snapshot", spy)
    master.run_master(max_iterations=5)  # snapshots at 2, 4 and run end
    assert not mismatches, f"stale opt_state at iterations {mismatches}"


@pytest.mark.slow
def test_block_sizes_are_powers_of_two(tmp_path):
    """Misaligned val/snapshot cadences must not generate one-off block
    sizes (every distinct K is a separate XLA program; a cold compile costs
    minutes on the TPU harness): _block_budget rounds down to powers of
    two, and cadence events still land on block boundaries."""
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _mnist_exp("nic_nes", str(tmp_path / "run"),
                     tpu={"gens_per_dispatch": 8, "val_freq": 20})
    exp["config"]["snapshot_freq"] = 0
    exp["config"]["patience"] = 0
    master = NESMaster(exp)

    budgets = []
    orig = master._block_budget

    def spy(*a, **k):
        b = orig(*a, **k)
        budgets.append(b)
        return b

    master._block_budget = spy
    master.run_master(max_iterations=24)
    assert sum(budgets) == 24
    assert all(b & (b - 1) == 0 for b in budgets), budgets  # powers of two
    assert 8 in budgets  # the cap is actually reached
    # the val_freq=20 boundary forces sub-maximal blocks at 13..16 / 17..18
    assert any(b < 8 for b in budgets), budgets


@pytest.mark.slow
def test_es_safe_mutations_end_to_end(tmp_path):
    """NIC-ES with SM-G-SUM: the per-parent sensitivity matrix is rebuilt
    each generation by the fused lax.map sweep and shapes the mutations
    (reference: sens cached per (task, parent), safe_mutations.py:34-84)."""
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    exp = _mnist_exp("nic_es", str(tmp_path / "run"), nb_offspring=8,
                     safe_mutations="SM-G-SUM")
    exp["population_size"] = 4
    master = ESMaster(exp)
    master.run_master(max_iterations=2)
    sens = np.asarray(master._sens_mat)
    # one row per (static) parent-matrix row, postprocessed to >= 1
    assert sens.shape == (master.parents_mat.shape[0], master.engine.dim)
    assert sens.min() >= 1.0 and np.isfinite(sens).all()
    assert sens.max() > 1.0
    assert len(master.stats.score_stats()[1]) == 2
