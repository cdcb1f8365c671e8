"""Decode-ordered ES offspring sweep (tpu.es_decode_layout).

The ES engine's layout path builds children directly in the fused decode
kernel's parameter order (ops/decode_layout.py) — per-offspring prep becomes
one elementwise pass instead of unravel+transpose+pad+cast — and maps the
few winners back to torch order through the exact linear from_dec. These
tests pin (a) the sweep's fitness == a manual torch-order replay of the same
decode-ordered deltas, (b) materialized winners replay the sweep's lineage
(equal up to FMA contraction; the layout permutation itself is bitwise),
and (c) full fused/blocked ESMaster
trajectories match the plain host-choreographed path with the layout on.
All on CPU via the kernel's interpret mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
from nes_img_captioning_tpu.ops.mutation import MutationKind, shape_noise
from nes_img_captioning_tpu.utils.config import Config, parse_tpu_config


@pytest.fixture(scope="module")
def coco_task(tmp_path_factory):
    from nes_img_captioning_tpu.tasks.captioning import CocoTask

    d = str(tmp_path_factory.mktemp("coco_es_layout"))
    copts = make_synthetic_coco(d, n_train=12, n_val=4, n_test=4,
                                vocab_size=40, fc_feat_size=24, cap_len=6,
                                seed=0)
    exp = {
        "dataset": "mscoco",
        "caption_options": copts,
        "policy_options": {"fitness": "greedy", "model_options": {
            "input_encoding_size": 16, "rnn_size": 16, "fc_feat_size": 24,
        }},
        # force the fused kernel on CPU (interpret mode set below)
        "tpu": {"seed": 0, "fused_decode": True, "precision": "f32"},
    }
    task = CocoTask(exp, Config(batch_size=4), parse_tpu_config(exp))
    task._fused_interpret = True
    assert task._fused and task.fitness_on_device
    assert task.decode_layout is not None
    return task


def _engine(task, kind, **kw):
    from nes_img_captioning_tpu.algorithms.es import ESEngine

    kw.setdefault("use_layout", True)  # this file tests the layout path
    return ESEngine(task, kind, **kw)


@pytest.mark.slow
@pytest.mark.parametrize("kind", [
    MutationKind.DEFAULT,
    MutationKind.SAFE_PROPORTIONAL,
    MutationKind.SAFE_GRAD_SUM,
    MutationKind.SAFE_VECTOR,
])
def test_layout_sweep_matches_manual_replay(coco_task, kind):
    """eval_generation on the layout path must equal a manual replay that
    draws the SAME decode-ordered delta and rolls out the torch-order child
    from_dec maps it to — per-parent scale rows (SM-G / proportional) and
    shared rows (plain / SM-VECTOR) both covered."""
    task = coco_task
    eng = _engine(task, kind, pop_chunk=2)
    assert eng._layout is not None
    lay = eng._layout

    rng = np.random.default_rng(3)
    P, L, B = 3, 4, 4
    parents = jnp.asarray(
        rng.standard_normal((P, eng.dim)) * 0.1, jnp.float32
    )
    # synthetic per-parent sensitivities for the safe kinds (the host path
    # hands the engine a (P, dim) matrix for SM-G, a (1, dim) row otherwise)
    if kind is MutationKind.SAFE_GRAD_SUM:
        sens = jnp.asarray(1.0 + rng.random((P, eng.dim)), jnp.float32)
    else:
        sens = jnp.asarray(1.0 + rng.random((1, eng.dim)), jnp.float32)
    sigma = 0.05
    seeds = rng.integers(0, 2**32, size=L, dtype=np.uint32)
    pidx = rng.integers(0, P, size=L).astype(np.int32)
    idx_row = np.arange(B, dtype=np.int32)

    art = eng.eval_generation(parents, sens, sigma, seeds, pidx, idx_row)
    got = np.asarray(art["fitness"])

    want = np.empty_like(got)
    roll = jax.jit(task.rollout)
    for i, (s, pi) in enumerate(zip(seeds, pidx)):
        parent = parents[pi]
        srow = sens[pi if kind is MutationKind.SAFE_GRAD_SUM else 0]
        scale = shape_noise(
            jnp.full((eng.dim,), sigma, jnp.float32), parent,
            sensitivity=srow if kind.is_safe else None,
            proportional=kind.is_proportional,
        )
        scale_dec = lay.to_dec(scale, pad_scale=0.0)
        # srow above mirrors the engine's scale-row choice (row pi for
        # per-parent kinds, row 0 otherwise); a wrong choice in the engine
        # changes the child and fails the fitness equality below
        delta_dec = scale_dec * jax.random.normal(
            eng._mk_key(np.uint32(s)), (lay.dim_dec,), jnp.float32
        )
        child = parent + lay.from_dec(delta_dec)
        want[i] = float(roll(child, jnp.asarray(idx_row))["fitness"])

    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    assert np.isfinite(got).all()


@pytest.mark.slow
def test_layout_materialize_exact_roundtrip(coco_task):
    """materialize() must replay the sweep's child from its lineage: same
    seed, same decode-ordered draw, equal up to FMA contraction (XLA may
    fuse ``p + sc * n`` into an FMA in one program and not another — a
    1-ULP effect, same exposure as the torch-order path); and the
    torch-order bytes re-lay out (to_dec) to that same vector exactly
    (to_dec/from_dec are pure permutations)."""
    task = coco_task
    eng = _engine(task, MutationKind.DEFAULT, pop_chunk=2)
    lay = eng._layout
    rng = np.random.default_rng(7)
    P, L = 2, 3
    parents = jnp.asarray(
        rng.standard_normal((P, eng.dim)) * 0.1, jnp.float32
    )
    sens = jnp.ones((1, eng.dim), jnp.float32)
    seeds = rng.integers(0, 2**32, size=L, dtype=np.uint32)
    pidx = rng.integers(0, P, size=L).astype(np.int32)

    mat = np.asarray(eng.materialize(parents, sens, 0.05, seeds, pidx))
    scale_dec = lay.to_dec(jnp.full((eng.dim,), 0.05, jnp.float32),
                           pad_scale=0.0)
    for i, (s, pi) in enumerate(zip(seeds, pidx)):
        delta_dec = scale_dec * jax.random.normal(
            eng._mk_key(np.uint32(s)), (lay.dim_dec,), jnp.float32
        )
        child_dec = lay.to_dec(parents[pi]) + delta_dec
        # same lineage replay; tolerance = FMA contraction (1-2 ULP)
        np.testing.assert_allclose(
            mat[i], np.asarray(parents[pi] + lay.from_dec(delta_dec)),
            rtol=1e-6, atol=1e-7,
        )
        # the torch-order bytes round-trip through the pure permutation
        np.testing.assert_allclose(
            np.asarray(lay.to_dec(jnp.asarray(mat[i]))),
            np.asarray(child_dec), rtol=1e-6, atol=1e-7,
        )
        # and the permutation itself is bitwise (pads included)
        np.testing.assert_array_equal(
            np.asarray(lay.to_dec(jnp.asarray(mat[i]))),
            np.asarray(lay.to_dec(lay.from_dec(lay.to_dec(
                jnp.asarray(mat[i]))))),
        )


@pytest.mark.slow
def test_layout_sweep_on_mesh_matches_unsharded(coco_task):
    """The layout sweep must shard over the pop mesh like any other sweep:
    fitnesses agree with the single-device run."""
    from nes_img_captioning_tpu.parallel.mesh import make_mesh

    task = coco_task
    rng = np.random.default_rng(11)
    P, L, B = 2, 6, 4  # L=6 on 8 devices: 2 pad lanes
    parents = jnp.asarray(
        rng.standard_normal((P, task.spec.num_params)) * 0.1, jnp.float32
    )
    sens = jnp.ones((1, task.spec.num_params), jnp.float32)
    seeds = rng.integers(0, 2**32, size=L, dtype=np.uint32)
    pidx = rng.integers(0, P, size=L).astype(np.int32)
    idx_row = np.arange(B, dtype=np.int32)

    results = {}
    for name, mesh in (("mesh", make_mesh()), ("plain", None)):
        eng = _engine(task, MutationKind.DEFAULT, mesh=mesh, pop_chunk=4)
        assert eng._layout is not None
        art = eng.eval_generation(parents, sens, 0.05, seeds, pidx, idx_row)
        results[name] = np.asarray(art["fitness"])

    np.testing.assert_allclose(results["mesh"], results["plain"], rtol=1e-6)


def test_layout_knob_gating(coco_task):
    """Only an explicit use_layout=True opts into the decode-ordered path:
    the engine default, truthy near-misses (1), and the master's "auto"
    all resolve to torch order (the measured default — docs/RESULTS.md)."""
    from nes_img_captioning_tpu.algorithms.es import ESEngine

    assert _engine(coco_task, MutationKind.DEFAULT)._layout is not None
    assert _engine(coco_task, MutationKind.DEFAULT,
                   use_layout=False)._layout is None
    # bare constructor (production default) = torch order, and the gate is
    # an identity check: use_layout=1 must NOT silently enable the layout
    assert ESEngine(coco_task, MutationKind.DEFAULT)._layout is None
    assert ESEngine(coco_task, MutationKind.DEFAULT,
                    use_layout=1)._layout is None
    assert (parse_tpu_config({"tpu": {"es_decode_layout": "auto"}})
            .es_decode_layout is not True)
    with pytest.raises(ValueError, match="es_decode_layout"):
        parse_tpu_config({"tpu": {"es_decode_layout": "false"}})


@pytest.fixture(scope="module")
def coco_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("cocodata_es_layout")
    return make_synthetic_coco(str(d), n_train=24, n_val=8, n_test=4,
                               vocab_size=30, fc_feat_size=24, cap_len=6,
                               seed=1)


def _es_exp(copts, log_dir, **over):
    tpu = {"seed": 5, "fused_decode": True, "precision": "f32",
           "es_decode_layout": True}
    tpu.update(over.pop("tpu", {}))
    return {
        "algorithm": "nic_es",
        "config": {
            "eval_prob": 0.006, "noise_stdev": 0.05, "snapshot_freq": 4,
            "batch_size": 4, "val_batch_size": 4, "num_val_items": 8,
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
        "nb_offspring": 6,
        "population_size": 4,
        "selection": "uniform",
        "tournament_size": 0,
        "num_elites": 2,
        "num_elite_cands": 2,
        "caption_options": copts,
        "log_dir": log_dir,
        "tpu": tpu,
        **over,
    }


@pytest.mark.slow
@pytest.mark.parametrize("safe_mutations", ["", "SM-G-SUM"])
def test_fused_es_layout_matches_plain_trajectory(coco_fixture, tmp_path,
                                                  safe_mutations):
    """With the decode layout ACTIVE (fused kernel forced, interpret mode),
    the fused one-dispatch generation must still reproduce the plain
    host-choreographed trajectory — both paths draw the same decode-ordered
    noise, so fitness/accuracy/norm series and parent bytes stay equal."""
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    results = {}
    for fused in (False, True):
        exp = _es_exp(dict(coco_fixture),
                      str(tmp_path / f"run{safe_mutations}{fused}"),
                      safe_mutations=safe_mutations,
                      tpu={"fused_es": fused})
        master = ESMaster(exp)
        master.task._fused_interpret = True
        assert master.engine._layout is not None
        master.run_master(max_iterations=4)
        sel = (np.asarray(master._selected_dev)[: master._n_selected]
               if master.parents_mat is None
               else np.asarray(master.parents_mat))
        results[fused] = {
            "stats": master.stats.to_dict(),
            "children": sel,
            "n_parents": master._n_parents,
        }

    a, b = results[False], results[True]
    for key in ("score_stats", "acc_stats", "norm_stats"):
        np.testing.assert_allclose(
            np.asarray(a["stats"][key], np.float64),
            np.asarray(b["stats"][key], np.float64),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )
    assert a["n_parents"] == b["n_parents"]
    n_children = min(len(a["children"]), len(b["children"]))
    np.testing.assert_allclose(
        a["children"][-n_children:], b["children"][-n_children:],
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.slow
def test_es_layout_block_matches_per_generation(coco_fixture, tmp_path):
    """K-generation blocks on the layout path stay trajectory-equal to
    per-generation fused driving (the scan step re-lays the carried torch
    rows out per generation — exact round trips)."""
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    results = {}
    for block in (1, 2):
        exp = _es_exp(dict(coco_fixture), str(tmp_path / f"blk{block}"),
                      tpu={"gens_per_dispatch": block})
        master = ESMaster(exp)
        master.task._fused_interpret = True
        assert master.engine._layout is not None
        master.run_master(max_iterations=6)
        results[block] = master.stats.to_dict()

    for key in ("score_stats", "acc_stats", "norm_stats"):
        np.testing.assert_allclose(
            np.asarray(results[1][key], np.float64),
            np.asarray(results[2][key], np.float64),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )
