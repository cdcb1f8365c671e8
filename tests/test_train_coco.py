"""End-to-end captioning tests on a synthetic MSCOCO-format fixture."""

import glob
import json
import os

import numpy as np
import pytest

from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
from nes_img_captioning_tpu.utils.config import load_experiment


@pytest.fixture(scope="module")
def coco_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("cocodata")
    return make_synthetic_coco(str(d), n_train=48, n_val=12, n_test=12,
                               vocab_size=25, fc_feat_size=32)


def _coco_exp(copts, log_dir, fitness="greedy", **over):
    return {
        "algorithm": over.pop("algorithm", "nic_nes"),
        "config": {
            "eval_prob": 0.003,
            "noise_stdev": 0.01,
            "snapshot_freq": 2,
            "batch_size": 8,
            "val_batch_size": 8,
            "num_val_items": 8,
            "patience": 0,
            "schedule_start": 1000,
            "schedule_limit": 1000,
            "stdev_divisor": 1,
            "bs_multiplier": 1,
            "stepsize_divisor": 1,
            "l2coeff": 1e-7,
            "single_batch": over.pop("single_batch", True),
        },
        "policy_options": {
            "net": "fc_caption",
            "fitness": fitness,
            "vbn": False,
            "model_options": {
                "safe_mutations": over.pop("safe_mutations", ""),
                "safe_mutation_underflow": 0.1,
                "input_encoding_size": 16,
                "rnn_size": 16,
                "fc_feat_size": 32,
            },
        },
        "optimizer_options": {"type": "adam", "args": {"stepsize": 0.001}},
        "dataset": "mscoco",
        "nb_offspring": over.pop("nb_offspring", 8),
        "population_size": over.pop("population_size", 4),
        "selection": "uniform",
        "num_elites": 1,
        "num_elite_cands": 1,
        "caption_options": copts,
        "log_dir": log_dir,
        "tpu": {"seed": 0},
        **over,
    }


def test_coco_nes_greedy_end_to_end(coco_fixture, tmp_path):
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _coco_exp(coco_fixture, str(tmp_path / "run"))
    master = NESMaster(exp)
    master.run_master(max_iterations=3)

    means = master.stats.score_stats()[1]
    assert len(means) == 3
    assert all(np.isfinite(means))
    # CIDEr-D * 100 fitness is non-negative
    assert master.stats.score_stats()[0][-1] >= 0.0

    zinfo = glob.glob(str(tmp_path / "run" / "snapshot" / "z_info_*.json"))[0]
    with open(zinfo) as f:
        infos = json.load(f)
    assert os.path.isfile(infos["current_model"])
    # validation CIDEr recorded each generation
    assert len(master.stats.acc_stats()) == 3


@pytest.mark.parametrize("fitness", [
    "sample",
    pytest.param("self_critical", marks=pytest.mark.slow),
    "greedy_linprob",
    pytest.param("sc_loss", marks=pytest.mark.slow),
])
def test_coco_fitness_variants(coco_fixture, tmp_path, fitness):
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _coco_exp(coco_fixture, str(tmp_path / "run"), fitness=fitness,
                    nb_offspring=4)
    master = NESMaster(exp)
    master.run_master(max_iterations=1)
    assert np.isfinite(master.stats.score_stats()[1][-1])


@pytest.mark.slow
def test_coco_es_end_to_end(coco_fixture, tmp_path):
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    exp = _coco_exp(coco_fixture, str(tmp_path / "run"), algorithm="nic_es")
    master = ESMaster(exp)
    master.run_master(max_iterations=3)
    assert len(master.stats.score_stats()[1]) == 3
    zinfo = glob.glob(str(tmp_path / "run" / "snapshot" / "z_info_*.json"))[0]
    with open(zinfo) as f:
        infos = json.load(f)
    for _, path in infos["parents"]:
        assert os.path.isfile(path)


def test_coco_warm_start_from_single(coco_fixture, tmp_path):
    """from_single: pretrained .pth warm start (reference README.md:98-106)."""
    from nes_img_captioning_tpu.algorithms.nes import NESMaster
    import jax

    exp = _coco_exp(coco_fixture, str(tmp_path / "run1"))
    m1 = NESMaster(exp)
    pth = str(tmp_path / "warm.pth")
    m1.task.spec.save_pth(np.asarray(m1.theta), pth)

    exp2 = _coco_exp(coco_fixture, str(tmp_path / "run2"))
    exp2["from_single"] = pth
    m2 = NESMaster(exp2)
    np.testing.assert_array_equal(np.asarray(m1.theta), np.asarray(m2.theta))


@pytest.mark.slow
def test_coco_es_proportional_tournament_on_mesh(coco_fixture, tmp_path):
    """The mscoco_es.json regime: SM-PROPORTIONAL mutations + tournament
    selection, population sharded over the virtual mesh."""
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    exp = _coco_exp(coco_fixture, str(tmp_path / "run"), algorithm="nic_es",
                    safe_mutations="SM-PROPORTIONAL")
    exp["selection"] = "tournament"
    exp["tournament_size"] = 3
    exp["tpu"] = {"seed": 0, "mesh_shape": [8], "pop_chunk": 8}
    master = ESMaster(exp)
    assert master.mesh is not None
    master.run_master(max_iterations=2)
    assert len(master.stats.score_stats()[1]) == 2


@pytest.mark.parametrize("variant", ["vbn", "vbn_e", "layer_n"])
def test_coco_norm_variants_end_to_end(coco_fixture, tmp_path, variant):
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _coco_exp(coco_fixture, str(tmp_path / "run"), nb_offspring=4)
    if variant == "vbn":
        exp["policy_options"]["vbn"] = True
    else:
        exp["policy_options"]["model_options"][variant] = True
    master = NESMaster(exp)
    assert not master.task._fused  # norm variants use the XLA decoder
    master.run_master(max_iterations=1)
    assert np.isfinite(master.stats.score_stats()[1][-1])


@pytest.mark.slow
def test_coco_sensitivity_smoke(coco_fixture, tmp_path):
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import calc_sensitivity

    exp = _coco_exp(coco_fixture, str(tmp_path / "run"),
                    safe_mutations="SM-G-SUM", nb_offspring=4)
    master = NESMaster(exp)
    # device-CIDEr task => fused path => sensitivity computed in-program
    assert master.engine.inline_sens
    master.run_master(max_iterations=1)
    assert np.all(np.asarray(master._sens) == 1.0)  # dummy operand
    sens = np.asarray(calc_sensitivity(
        master.task, master.theta,
        np.arange(exp["config"]["batch_size"], dtype=np.int32),
        MutationKind.SAFE_GRAD_SUM,
        exp["policy_options"]["model_options"]["safe_mutation_underflow"],
    ))
    assert sens.shape == (master.engine.dim,)
    assert sens.min() >= 1.0 and np.isfinite(sens).all()


@pytest.mark.slow
def test_sensitivity_lever_knobs(coco_fixture):
    """tpu.sensitivity_batch / sensitivity_split (SM-G cost levers,
    docs/RESULTS.md): the subsampled-batch Jacobian equals the full
    computation restricted to those rows; a wider split changes the grouped
    output's width, not its finiteness/clamping."""
    import jax
    import jax.numpy as jnp

    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import calc_sensitivity
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    exp = {
        "dataset": "mscoco", "caption_options": dict(coco_fixture),
        "policy_options": {"fitness": "greedy", "model_options": {
            "input_encoding_size": 8, "rnn_size": 8, "fc_feat_size": 32}},
    }
    cfg = Config(batch_size=8)
    idx = np.arange(8, dtype=np.int32)

    t100 = CocoTask(exp, cfg, TpuConfig(seed=0))
    theta = jnp.asarray(t100.generate_theta(jax.random.PRNGKey(0)))
    # tiny underflow: at these dims a realistic clamp would swallow every
    # entry and make full == sub trivially
    full = np.asarray(calc_sensitivity(
        t100, theta, jnp.asarray(idx), MutationKind.SAFE_GRAD_SUM, 1e-9))
    sub = np.asarray(calc_sensitivity(
        t100, theta, jnp.asarray(idx[:4]), MutationKind.SAFE_GRAD_SUM, 1e-9))
    assert full.shape == sub.shape and np.isfinite(sub).all()
    assert not np.allclose(full, sub)  # genuinely fewer rows, not a no-op
    # split width changes only the grouped-output resolution
    t25 = CocoTask(exp, cfg, TpuConfig(seed=0, sensitivity_split=25))
    assert t25._sens_split == 25
    k100 = t100.sensitivity_forward(theta, jnp.asarray(idx)).shape[1]
    k25 = t25.sensitivity_forward(theta, jnp.asarray(idx)).shape[1]
    assert k25 > k100  # narrower groups -> more VJP rows; 25 < 100
    wide = np.asarray(calc_sensitivity(
        t25, theta, jnp.asarray(idx), MutationKind.SAFE_GRAD_SUM, 0.1))
    assert np.isfinite(wide).all() and wide.min() >= 1.0


@pytest.mark.slow
def test_coco_val_fused_matches_host(coco_fixture, tmp_path):
    """tpu.fused_validation on the captioning task: in-program word-level
    CIDEr validation + device podium reproduce the host path — identical
    theta trajectory (validation never feeds the update) and acc/podium
    scores to f32 (validate_device vs validate)."""
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    masters = []
    for tag, tpu in (("host", {"seed": 0}),
                     ("fused", {"seed": 0, "fused_validation": True,
                                "gens_per_dispatch": 2})):
        exp = _coco_exp(coco_fixture, str(tmp_path / tag), nb_offspring=4)
        exp["config"]["snapshot_freq"] = 0
        exp["tpu"] = tpu
        m = NESMaster(exp)
        m.run_master(max_iterations=4)
        masters.append(m)

    a, b = masters
    assert not a._val_fused and b._val_fused
    np.testing.assert_allclose(np.asarray(a.theta), np.asarray(b.theta),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a.stats.acc_stats(), np.float64),
        np.asarray(b.stats.acc_stats(), np.float64),
        rtol=1e-4, atol=1e-6)
    (pa, sca), (pb, scb) = a.it.best_elites()[0], b.it.best_elites()[0]
    assert os.path.isfile(pa) and os.path.isfile(pb)
    np.testing.assert_allclose(scb, sca, rtol=1e-4)
    np.testing.assert_allclose(
        b.task.spec.load_pth(pb), a.task.spec.load_pth(pa),
        rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_coco_es_from_single_list(coco_fixture, tmp_path):
    """ES warm start from a LIST of .pth files (reference init_from_singles,
    nic_es/iteration.py:63-81): each file becomes a parent and the first
    num_elite_cands become elite candidates."""
    import jax
    import jax.numpy as jnp
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    exp0 = _coco_exp(coco_fixture, str(tmp_path / "seed"), algorithm="nic_es")
    m0 = ESMaster(exp0)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"warm{i}.pth")
        m0.task.spec.save_pth(
            np.asarray(m0.task.generate_theta(jax.random.PRNGKey(i))), p
        )
        paths.append(p)

    exp = _coco_exp(coco_fixture, str(tmp_path / "run"), algorithm="nic_es")
    exp["from_single"] = paths
    master = ESMaster(exp)
    assert master._n_parents == 2
    # padded to population_size rows for static shapes
    assert master.parents_mat.shape[0] == exp["population_size"]
    np.testing.assert_array_equal(
        np.asarray(master.parents_mat[0]), m0.task.spec.load_pth(paths[0])
    )
    master.run_master(max_iterations=2)
    assert len(master.stats.score_stats()[1]) == 2


@pytest.mark.slow
def test_population_smaller_than_mesh(coco_fixture, tmp_path):
    """nb_offspring < mesh size must not hang (engine chunk sizing caps at
    the population; shards pad)."""
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    exp = _coco_exp(coco_fixture, str(tmp_path / "run"), algorithm="nic_es",
                    nb_offspring=4, population_size=2)
    exp["tpu"] = {"seed": 0, "mesh_shape": [8]}
    master = ESMaster(exp)
    master.run_master(max_iterations=2)
    assert len(master.stats.score_stats()[1]) == 2


def test_two_phase_carried_scores_podium_once(coco_fixture, tmp_path):
    """On the two-phase (host-scored) path with tpu.val_freq > 1, a carried
    validation score must not be re-submitted to the podium: an open
    scoreboard slot could otherwise archive generation k+j theta bytes under
    the generation-k score. Exactly one podium submission per fresh
    validation, and every archived elite's bytes equal the theta that earned
    its score."""
    from nes_img_captioning_tpu.algorithms.nes import NESMaster

    exp = _coco_exp(coco_fixture, str(tmp_path / "run"), nb_offspring=4)
    exp["num_elites"] = 3  # open scoreboard capacity for the whole run
    exp["config"]["snapshot_freq"] = 0
    exp["tpu"] = {"seed": 0, "val_freq": 3, "device_cider": False}
    master = NESMaster(exp)
    assert not master.task.fitness_on_device  # two-phase path

    validations = []  # (score, theta bytes at validation time)
    orig_validate = master.task.validate

    def validate_spy(theta):
        s = orig_validate(theta)
        validations.append((s, np.asarray(theta).copy()))
        return s

    master.task.validate = validate_spy
    submissions = []
    orig_proc = master.it.process_evaluated_elites

    def proc_spy():
        submissions.append(master.it.iteration())
        return orig_proc()

    master.it.process_evaluated_elites = proc_spy
    master.run_master(max_iterations=7)

    # fresh validations at iterations 1 (first), 3, 6 — no interior ones
    assert len(validations) == 3
    assert submissions == [1, 3, 6]
    # archived elite bytes always equal the theta that earned the score
    archived = [(p, s) for p, s in master.it.best_elites() if p]
    assert archived
    for path, score in archived:
        got = master.task.spec.load_pth(path)
        match = [th for s, th in validations
                 if round(s, 9) == round(score, 9)]
        assert match, (score, [s for s, _ in validations])
        assert any(np.array_equal(got, th) for th in match), \
            f"elite {path} bytes differ from the theta that earned {score}"


def test_decode_split_ragged_tail_pad(coco_fixture):
    """_decode_split pads the ragged tail chunk to the batch size and slices
    back: results must equal a single whole-split decode (greedy rows are
    independent)."""
    import jax
    import jax.numpy as jnp

    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    exp = {"dataset": "mscoco", "caption_options": dict(coco_fixture),
           "policy_options": {"fitness": "greedy",
                              "model_options": {"fc_feat_size": 32}}}
    task = CocoTask(exp, Config(batch_size=8), TpuConfig(seed=0))
    theta = task.generate_theta(jax.random.PRNGKey(1))
    feats = task.val_fc[:11]  # 11 = 8 + ragged 3
    chunked = task._decode_split(theta, feats, -1, 8)
    whole = np.asarray(task.model.sample(jnp.asarray(theta), feats, True)[0])
    np.testing.assert_array_equal(chunked, whole)
