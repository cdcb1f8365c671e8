"""Full-trajectory equivalence against independent torch/numpy oracles.

The strongest real-data-free parity proof available in this image: drive the
ACTUAL engines for several generations and check the whole algorithm loop —
evolve -> rollout -> centered ranks -> gradient -> Adam (NES), and
evolve -> rollout -> truncation selection -> record_parents (ES) — against
transcriptions written fresh from the reference's behavioral spec
(tests/oracles.py: OracleNESLoop / OracleESSelection), sharing only the
realized noise (both implementations deliberately draw noise differently —
SURVEY.md §7.3 "matching stochastic semantics").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oracles import OracleESSelection, OracleNESLoop, torch_mnist_fitness

from nes_img_captioning_tpu.algorithms.nes import NESEngine
from nes_img_captioning_tpu.algorithms.optimizers import Adam
from nes_img_captioning_tpu.ops.mutation import MutationKind
from nes_img_captioning_tpu.tasks.classification import MnistTask
from nes_img_captioning_tpu.utils.config import Config, TpuConfig


def _mnist_task():
    exp = {
        "policy_options": {"net": "mnist", "vbn": False},
        "data_root": "/nonexistent",  # force the synthetic fixture
        "synthetic_sizes": (256, 64),
    }
    return MnistTask(exp, Config(batch_size=16), TpuConfig(seed=0))


@pytest.mark.slow
def test_nes_full_trajectory_matches_torch_oracle():
    """4 NES generations: theta trajectory, per-pair fitnesses, and the
    Adam state must match the torch oracle given shared noise
    (reference: nic_nes_master.py:123-133,170-221, optimizers.py:68-107)."""
    task = _mnist_task()
    stepsize, l2coeff, sigma, n_pairs = 0.01, 1e-4, 0.05, 6
    engine = NESEngine(task, Adam(stepsize), MutationKind.DEFAULT)
    dim = engine.dim

    rng = np.random.default_rng(3)
    idx_row = rng.integers(0, task.train_n, size=16).astype(np.int32)
    x = np.asarray(task.train["x"][idx_row])
    y = np.asarray(task.train["y"][idx_row])
    fitness_fn = torch_mnist_fitness(x, y)

    theta0 = np.asarray(task.generate_theta(jax.random.PRNGKey(0)))
    sens = jnp.ones((dim,), jnp.float32)
    opt_state = engine.optimizer.init(dim)
    oracle = OracleNESLoop(dim, stepsize=stepsize, l2coeff=l2coeff)

    th_j = jnp.asarray(theta0)
    th_o = theta0.copy()
    for gen in range(4):
        seeds = rng.integers(0, 2**32, size=n_pairs, dtype=np.uint32)
        idx = np.tile(idx_row, (n_pairs, 1))
        th_j, opt_state, packed = engine.generation(
            th_j, opt_state, sens, sigma, seeds, idx, stepsize, l2coeff
        )
        fits_j, _, _ = engine.unpack(packed, n_pairs)

        # shared noise: the engine's realized deltas, regenerated from the
        # same seeds (plain Gaussian mutation depends only on the seed)
        deltas = np.stack([
            np.asarray(engine._delta(jnp.asarray(th_o), sens, sigma,
                                     jnp.uint32(s)))
            for s in seeds
        ])
        th_o, fits_o = oracle.generation(th_o, deltas, fitness_fn)

        np.testing.assert_allclose(fits_j, fits_o, rtol=2e-4, atol=2e-4,
                                   err_msg=f"generation {gen} fitness")
        # f32 tolerance: the implementations reduce in different orders
        # (einsum vs numpy sum), and for elements whose gradient is ~0
        # Adam's step m/(sqrt(v)+eps) amplifies a last-ulp difference by up
        # to ~0.1*a/eps — hence the absolute tolerance; the un-amplified
        # gradient trajectory is checked tightly via the Adam moments below
        np.testing.assert_allclose(np.asarray(th_j), th_o, rtol=1e-4,
                                   atol=1e-4,
                                   err_msg=f"generation {gen} theta")
    # the Adam moments must have tracked the same trajectory
    np.testing.assert_allclose(np.asarray(opt_state.m), oracle.m,
                               rtol=1e-3, atol=1e-8)
    np.testing.assert_allclose(np.asarray(opt_state.v), oracle.v,
                               rtol=1e-3, atol=1e-12)
    assert int(opt_state.t) == oracle.t == 4


@pytest.mark.slow
def test_es_selection_trajectory_matches_oracle(tmp_path):
    """3 ES generations through the REAL master loop: per-child fitness
    matches a torch recompute of parent+noise, and the next parent matrix /
    elite candidates equal the oracle's truncation selection + prepended
    elites (reference: nic_es_master.py:116-125,155-167,
    nic_es/iteration.py:83-110)."""
    from nes_img_captioning_tpu.algorithms.es import ESMaster

    pop_size, num_elites, n_cands, L = 5, 1, 2, 8
    exp = {
        "algorithm": "nic_es",
        "config": {
            "eval_prob": 0.0, "noise_stdev": 0.05, "snapshot_freq": 0,
            "batch_size": 16, "val_batch_size": 16, "num_val_batches": 1,
            "patience": 0, "schedule_start": 1000, "schedule_limit": 1000,
            "stdev_divisor": 1, "bs_multiplier": 1, "stepsize_divisor": 1,
            "l2coeff": 0.0, "single_batch": True,
        },
        "policy_options": {"net": "mnist", "vbn": False,
                           "model_options": {"safe_mutations": ""}},
        "dataset": "mnist",
        "nb_offspring": L,
        "population_size": pop_size,
        "num_elites": num_elites,
        "num_elite_cands": n_cands,
        "selection": "uniform",
        "data_root": "/nonexistent",
        "synthetic_sizes": (256, 64),
        "log_dir": str(tmp_path / "run"),
        # the oracle replays the host-choreographed (reference-cadence)
        # path; the fused path is proven equivalent to it separately
        # (tests/test_fused_es.py)
        "tpu": {"seed": 11, "fused_es": False},
    }
    master = ESMaster(exp)
    engine = master.engine
    task = master.task

    captured = []
    orig_eval = engine.eval_generation

    def eval_spy(parents_mat, sens_mat, sigma, seeds, pidx, idx_row,
                 fresh=False):
        out = orig_eval(parents_mat, sens_mat, sigma, seeds, pidx, idx_row,
                        fresh=fresh)
        captured.append({
            "parents": (None if parents_mat is None
                        else np.asarray(parents_mat)),
            "sigma": sigma, "seeds": seeds.copy(),
            "pidx": None if pidx is None else np.asarray(pidx).copy(),
            "idx_row": np.asarray(idx_row).copy(), "fresh": fresh,
            "fitness": np.asarray(out).reshape(L).copy(),
        })
        return out

    engine.eval_generation = eval_spy
    master.run_master(max_iterations=3)
    assert len(captured) == 3

    def child_theta(cap, j):
        """Oracle materialization: numpy parent row + the realized noise for
        that seed, regenerated outside the engine (fresh generation-0
        children are the spec's random inits)."""
        key = engine._mk_key(jnp.uint32(cap["seeds"][j]))
        if cap["fresh"]:
            return np.asarray(task.spec.init_theta(key))
        noise = np.asarray(
            cap["sigma"] * jax.random.normal(key, (engine.dim,), jnp.float32)
        )
        return cap["parents"][cap["pidx"][j]] + noise

    for g, cap in enumerate(captured):
        # 1. per-child fitness == torch rollout of the oracle-materialized
        #    child on the same batch
        x = np.asarray(task.train["x"][cap["idx_row"]])
        y = np.asarray(task.train["y"][cap["idx_row"]])
        fitness_fn = torch_mnist_fitness(x, y)
        for j in range(L):
            want = fitness_fn(child_theta(cap, j))
            np.testing.assert_allclose(
                cap["fitness"][j], want, rtol=2e-4, atol=2e-4,
                err_msg=f"gen {g} child {j} fitness",
            )

        # 2. selection: the parent matrix installed AFTER this generation
        #    (= the parents the NEXT generation evaluates, or the master's
        #    final state for the last one)
        keep, cand_ids = OracleESSelection.select(
            cap["fitness"], pop_size, num_elites, n_cands
        )
        next_parents = np.asarray(
            captured[g + 1]["parents"] if g + 1 < len(captured)
            else np.asarray(master.parents_mat)
        )
        # children occupy the tail rows after the podium-elite prefix;
        # verify each kept child landed in the matrix (f32 tolerance: the
        # engine materializes under jit/vmap, the oracle eagerly)
        for j in keep:
            row = child_theta(cap, j)
            dist = np.abs(next_parents - row[None, :]).max(axis=1).min()
            assert dist < 1e-6, \
                f"gen {g}: selected child {j} missing from next parents " \
                f"(nearest row max|diff| = {dist})"

    # 3. final elite candidates == top-n_cands children of the last
    #    generation, persisted as .pth files
    cap = captured[-1]
    _, cand_ids = OracleESSelection.select(
        cap["fitness"], pop_size, num_elites, n_cands
    )
    assert len(master.elites_to_evaluate) == n_cands
    for (cid, path), j in zip(master.elites_to_evaluate, cand_ids):
        got = task.spec.load_pth(path)
        np.testing.assert_allclose(
            got, child_theta(cap, j), rtol=0, atol=1e-7,
            err_msg=f"elite cand {cid} != child {j}",
        )
