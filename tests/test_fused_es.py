"""Fused ES generation: in-program validation + one-dispatch generation.

The ES master loop historically paid per generation: C host validations
(each many decode dispatches + host scoring), one eval dispatch, and two
materialize dispatches. The fused path runs the whole generation — parent
assembly, offspring sweep, truncation selection, winner/candidate
materialization, and candidate validation — as ONE program with one result
pull (mirroring the NES fused generation). These tests pin (a) device
validation == host validation, and (b) fused trajectories == unfused.
"""

import numpy as np
import pytest

import jax

from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
from nes_img_captioning_tpu.utils.config import Config, TpuConfig


@pytest.fixture(scope="module")
def coco_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("cocodata_fused")
    return make_synthetic_coco(str(d), n_train=48, n_val=11, n_test=8,
                               vocab_size=30, fc_feat_size=24)


def test_mnist_validate_device_matches_host():
    from nes_img_captioning_tpu.tasks.classification import MnistTask

    exp = {"policy_options": {"net": "mnist", "vbn": False},
           "data_root": "/nonexistent", "synthetic_sizes": (128, 48)}
    task = MnistTask(exp, Config(batch_size=16, val_batch_size=16,
                                 num_val_batches=2), TpuConfig(seed=0))
    theta = task.generate_theta(jax.random.PRNGKey(0))
    host = task.validate(theta)
    vconsts = task.device_val_consts()
    dev = float(jax.jit(task.validate_device)(theta, vconsts))
    np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-7)


def _es_exp(copts, log_dir, **over):
    return {
        "algorithm": "nic_es",
        "config": {
            "eval_prob": 0.006, "noise_stdev": 0.05, "snapshot_freq": 2,
            "batch_size": 8, "val_batch_size": 4, "num_val_items": 10,
            "patience": 0, "schedule_start": 1000, "schedule_limit": 1000,
            "stdev_divisor": 1, "bs_multiplier": 1, "stepsize_divisor": 1,
            "l2coeff": 0.0, "single_batch": True,
        },
        "policy_options": {
            "net": "fc_caption", "fitness": "greedy", "vbn": False,
            "model_options": {
                "safe_mutations": over.pop("safe_mutations", ""),
                "input_encoding_size": 16, "rnn_size": 16,
                "fc_feat_size": 24,
            },
        },
        "dataset": "mscoco",
        "nb_offspring": over.pop("nb_offspring", 8),
        "population_size": over.pop("population_size", 5),
        "selection": over.pop("selection", "uniform"),
        "tournament_size": over.pop("tournament_size", 0),
        "num_elites": 2,
        "num_elite_cands": 2,
        "caption_options": copts,
        "log_dir": log_dir,
        "tpu": over.pop("tpu", {"seed": 5}),
        **over,
    }


@pytest.mark.slow
@pytest.mark.parametrize("safe_mutations,probes",
                         [("SM-PROPORTIONAL", 0), ("SM-G-SUM", 0),
                          ("SM-G-ABS", 0), ("SM-G-SUM", 8)])
def test_fused_es_matches_plain_trajectory(coco_fixture, tmp_path,
                                           safe_mutations, probes):
    """The one-dispatch fused generation must reproduce the plain
    host-choreographed trajectory: same fitness series, same podium/accuracy
    series (device vs host validation differ only at f32 level), same final
    parent bytes, same z_info surface. SM-G-SUM additionally exercises the
    IN-PROGRAM per-parent sensitivity sweep vs the plain path's separate
    calc_sensitivities dispatch; the probes=8 leg pins that the randomized
    estimator (tpu.sensitivity_probes) derives the SAME probe stream on
    both paths (offspring-seed 0, PROBE_FOLD)."""
    import glob
    import json
    import os

    from nes_img_captioning_tpu.algorithms.es import ESMaster

    results = {}
    for fused in (False, True):
        exp = _es_exp(dict(coco_fixture), str(tmp_path / f"run{fused}"),
                      safe_mutations=safe_mutations,
                      tpu={"seed": 5, "fused_es": fused,
                           "sensitivity_probes": probes})
        master = ESMaster(exp)
        calls = {"n": 0}
        orig = master.engine.fused_generation

        def spy(*a, _o=orig, _c=calls, **k):
            _c["n"] += 1
            return _o(*a, **k)

        master.engine.fused_generation = spy
        master.run_master(max_iterations=5)
        # generation 1 is always plain (seeds the fused state); 2-5 fused
        assert calls["n"] == (4 if fused else 0)
        sel = (np.asarray(master._selected_dev)[: master._n_selected]
               if master.parents_mat is None
               else np.asarray(master.parents_mat))
        elite_rows = [
            master.task.spec.load_pth(p)
            for p in master._parent_paths if p is not None
        ]
        results[fused] = {
            "stats": master.stats.to_dict(),
            "elites": elite_rows,
            "children": sel,
            "n_parents": master._n_parents,
            "zinfo": sorted(glob.glob(
                str(tmp_path / f"run{fused}" / "snapshot" / "z_info_*.json")
            )),
        }

    a, b = results[False], results[True]
    for key in ("score_stats", "acc_stats", "best_acc_so_far_stats",
                "norm_stats", "noise_std_stats"):
        np.testing.assert_allclose(
            np.asarray(a["stats"][key], np.float64),
            np.asarray(b["stats"][key], np.float64),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )
    assert a["n_parents"] == b["n_parents"]
    assert len(a["elites"]) == len(b["elites"])
    for ea, eb in zip(a["elites"], b["elites"]):
        np.testing.assert_allclose(ea, eb, rtol=1e-5, atol=1e-6)
    # plain keeps the padded matrix; compare the true child rows
    n_children = a["n_parents"] - len(a["elites"])
    np.testing.assert_allclose(
        a["children"][len(a["elites"]):][:n_children],
        b["children"][:n_children], rtol=1e-5, atol=1e-6,
    )
    # z_info surface: same keys, parents/elites files exist on both
    assert len(a["zinfo"]) == len(b["zinfo"]) == 1
    for z in (a["zinfo"][0], b["zinfo"][0]):
        infos = json.loads(open(z).read())
        assert len(infos["parents"]) > 0
        for _, path in infos["parents"] + infos["elites_to_evaluate"]:
            assert os.path.isfile(path), path


@pytest.mark.slow
@pytest.mark.parametrize("safe_mutations,probes",
                         [("", 0), ("SM-G-SUM", 0), ("SM-G-SUM", 8)])
def test_fused_es_on_virtual_mesh(coco_fixture, tmp_path, safe_mutations,
                                  probes):
    """Fused generations with the population sharded over the 8 virtual
    devices (the dryrun convention for multi-chip); SM-G-SUM additionally
    runs the in-program per-parent jacrev sweep under the mesh, and the
    probes leg its randomized estimator (tpu.sensitivity_probes)."""
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    exp = _es_exp(dict(coco_fixture), str(tmp_path / "run"),
                  selection="tournament", tournament_size=3,
                  safe_mutations=safe_mutations,
                  tpu={"seed": 5, "mesh_shape": [8], "pop_chunk": 8,
                       "gens_per_dispatch": 2, "sensitivity_probes": probes})
    master = ESMaster(exp)
    calls = {"n": 0}
    orig = master.engine.fused_block

    def spy(*a, _o=orig, _c=calls, **k):
        _c["n"] += 1
        return _o(*a, **k)

    master.engine.fused_block = spy
    master.run_master(max_iterations=5)
    assert master.parents_mat is None  # fused path took over
    assert calls["n"] >= 1  # at least one sharded K-generation scan ran
    assert len(master.stats.score_stats()[1]) == 5
    assert np.isfinite(master.stats.score_stats()[1]).all()


@pytest.mark.slow
@pytest.mark.parametrize("safe_mutations,probes",
                         [("", 0), ("SM-G-SUM", 0), ("SM-G-SUM", 8)])
def test_es_block_matches_per_generation(coco_fixture, tmp_path,
                                         safe_mutations, probes):
    """tpu.gens_per_dispatch for ES: K-generation blocks (device-side
    podium merge + parent assembly in a lax.scan) must reproduce the
    per-generation fused trajectory — same stats series, same podium
    scores, same final parent/children bytes, same z_info snapshots.
    Blocks end on every snapshot boundary so the checkpoint surface is
    identical. SM-G-SUM exercises the in-scan per-parent sensitivity
    sweep (ES blocks support SM-G, unlike NES blocks, because the fused
    ES generation computes sensitivities in-program)."""
    import glob
    import os

    from nes_img_captioning_tpu.algorithms.es import ESMaster

    results = {}
    for block in (1, 4):
        exp = _es_exp(dict(coco_fixture), str(tmp_path / f"run{block}"),
                      safe_mutations=safe_mutations,
                      tpu={"seed": 5, "gens_per_dispatch": block,
                           "sensitivity_probes": probes})
        exp["config"]["snapshot_freq"] = 4
        master = ESMaster(exp)
        calls = {"block": 0, "single": 0}
        orig_b, orig_s = master.engine.fused_block, master.engine.fused_generation

        def spy_b(*a, _o=orig_b, _c=calls, **k):
            _c["block"] += 1
            return _o(*a, **k)

        def spy_s(*a, _o=orig_s, _c=calls, **k):
            _c["single"] += 1
            return _o(*a, **k)

        master.engine.fused_block = spy_b
        master.engine.fused_generation = spy_s
        master.run_master(max_iterations=9)
        if block == 1:
            assert calls == {"block": 0, "single": 8}
        else:
            # gen 1 plain, gen 2 fused (podium fills), gens 3-4 block
            # (snapshot-bounded), 5-6 epoch-bounded block, 7-8 block, 9 single
            assert calls["block"] >= 2 and calls["single"] >= 1
            assert calls["block"] + calls["single"] < 8
        results[block] = {
            "stats": master.stats.to_dict(),
            "podium": [(s, master.task.spec.load_pth(p))
                       for p, s in master.it.best_elites()],
            "children": np.asarray(
                master._selected_dev)[: master._n_selected],
            "zinfo": sorted(
                os.path.basename(z) for z in glob.glob(
                    str(tmp_path / f"run{block}" / "snapshot" / "z_info_*.json"))
            ),
        }

    a, b = results[1], results[4]
    for key in ("score_stats", "acc_stats", "best_acc_so_far_stats",
                "norm_stats", "noise_std_stats", "bs_stats"):
        np.testing.assert_allclose(
            np.asarray(a["stats"][key], np.float64),
            np.asarray(b["stats"][key], np.float64),
            rtol=1e-5, atol=1e-6, err_msg=key,
        )
    for (sa, ra), (sb, rb) in zip(a["podium"], b["podium"]):
        np.testing.assert_allclose(sa, sb, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ra, rb, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a["children"], b["children"],
                               rtol=1e-5, atol=1e-6)
    # snapshots delete their predecessor, so exactly the final one
    # survives — and it must carry the same name (iteration/epoch state)
    assert a["zinfo"] == b["zinfo"] and len(a["zinfo"]) == 1


def test_fused_gate_rejects_degenerate_cand_counts(coco_fixture, tmp_path):
    """More elite candidates than offspring (or than kept children) would
    mis-slice the fused program's packed result layout — candidate scores
    would absorb the trailing |policy|.mean() entry. Such configs must fall
    back to the plain path, which handles them gracefully."""
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    exp = _es_exp(dict(coco_fixture), str(tmp_path / "run"),
                  nb_offspring=3, population_size=5)
    exp["num_elite_cands"] = 4  # > nb_offspring and > pop - elites
    master = ESMaster(exp)
    assert not master._fused_capable()

    # zero candidates: the fused/blocked programs argmax over the candidate
    # rows (trace error on an empty array); plain path handles it
    exp0 = _es_exp(dict(coco_fixture), str(tmp_path / "run0"))
    exp0["num_elite_cands"] = 0
    assert not ESMaster(exp0)._fused_capable()


def test_device_podium_merge_matches_record_elites(tmp_path):
    """The in-scan scoreboard merge (es.podium_merge) must reproduce
    Podium.record_elites EXACTLY, including the adversarial tie cases:
    a candidate tying an incumbent never displaces it (a tie is not an
    improvement), equal-scored candidates enter in published order, and
    the surviving rows are selected bit-exactly."""
    import jax.numpy as jnp

    from nes_img_captioning_tpu.algorithms.es import podium_merge
    from nes_img_captioning_tpu.algorithms.podium import Podium

    rng = np.random.default_rng(7)
    E, C, D = 3, 4, 6
    # score pools engineered for collisions: draws from a tiny value set
    value_set = np.asarray([0.125, 0.25, 0.25, 0.5, 1.0], np.float32)
    for trial in range(25):
        e_scores = np.sort(rng.choice(value_set, E))[::-1].astype(np.float32)
        c_scores = rng.choice(value_set, C).astype(np.float32)
        e_rows = rng.normal(size=(E, D)).astype(np.float32)
        c_rows = rng.normal(size=(C, D)).astype(np.float32)

        got_rows, got_scores = jax.jit(podium_merge)(
            jnp.asarray(e_rows), jnp.asarray(e_scores),
            jnp.asarray(c_rows), jnp.asarray(c_scores),
        )

        # host oracle: a real Podium seeded with the incumbents; the merged
        # slot FILES afterwards hold the surviving rows' bytes
        d = tmp_path / f"t{trial}"
        pod = Podium(0, str(d), num_elites=E)
        seed = []
        for i in range(E):
            p = str(d / f"inc{i}.npy")
            np.save(open(p, "wb"), e_rows[i])
            seed.append((p, float(e_scores[i])))
        pod.init_from_infos({"best_elites": seed})
        cands = []
        for i in range(C):
            p = str(d / f"cand{i}.npy")
            np.save(open(p, "wb"), c_rows[i])
            cands.append((p, float(c_scores[i])))
        pod.record_elites(cands)
        want = pod.best_elites()
        np.testing.assert_array_equal(
            np.asarray(got_scores), np.asarray([s for _, s in want],
                                               np.float32),
            err_msg=f"trial {trial}: scores {e_scores} + {c_scores}",
        )
        for rank, (path, _) in enumerate(want):
            np.testing.assert_array_equal(
                np.asarray(got_rows)[rank], np.load(path),
                err_msg=f"trial {trial} rank {rank}",
            )


def test_coco_validate_device_matches_host(coco_fixture):
    from nes_img_captioning_tpu.tasks.captioning import CocoTask

    exp = {
        "dataset": "mscoco", "caption_options": dict(coco_fixture),
        "policy_options": {
            "fitness": "greedy", "vbn": False,
            "model_options": {"input_encoding_size": 16, "rnn_size": 16,
                              "fc_feat_size": 24},
        },
    }
    # val_batch_size 4 over 11 items exercises the ragged-tail chunking on
    # both paths; num_val_items caps the subset like the reference config
    task = CocoTask(exp, Config(batch_size=8, val_batch_size=4,
                                num_val_items=10), TpuConfig(seed=0))
    assert task.device_val_consts() is not None
    for seed in (0, 3):
        theta = task.generate_theta(jax.random.PRNGKey(seed))
        host = task.validate(theta)
        dev = float(jax.jit(task.validate_device)(
            theta, task.device_val_consts()
        ))
        np.testing.assert_allclose(dev, host, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_fused_es_criteria_fitness_matches_plain(coco_fixture, tmp_path):
    """A per-token-criterion fitness kind (sc_loss: sampled decode +
    greedy baseline + log criterion, all in-program since the criteria
    joined the device path) must produce the same fused-vs-plain ES
    trajectory as the greedy kinds."""
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    results = {}
    for fused in (False, True):
        exp = _es_exp(dict(coco_fixture), str(tmp_path / f"run{fused}"),
                      tpu={"seed": 5, "fused_es": fused})
        exp["policy_options"]["fitness"] = "sc_loss"
        master = ESMaster(exp)
        assert master.task.fitness_on_device
        master.run_master(max_iterations=3)
        results[fused] = master.stats.to_dict()

    for key in ("score_stats", "acc_stats", "norm_stats"):
        np.testing.assert_allclose(
            np.asarray(results[False][key], np.float64),
            np.asarray(results[True][key], np.float64),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )
    # a criterion fitness is a masked per-token reduction, not mean*100:
    # the series must be finite and non-degenerate
    assert np.isfinite(np.asarray(results[True]["score_stats"])).all()
