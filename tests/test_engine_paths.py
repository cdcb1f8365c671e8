"""Engine equivalence tests: the two NES update paths must agree, and the
quadratic SM-G-ABS sensitivity trains end to end."""

import numpy as np

import jax
import jax.numpy as jnp


def _mnist_task():
    from nes_img_captioning_tpu.tasks.classification import MnistTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    return MnistTask({"policy_options": {}, "synthetic_sizes": [64, 32]},
                     Config(batch_size=16), TpuConfig(seed=0))


def test_update_with_deltas_matches_regeneration():
    """The deltas carried from the eval sweep and the seed-replay
    regeneration must produce the identical theta update."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    task = _mnist_task()
    eng = NESEngine(task, Adam(0.01), MutationKind.DEFAULT, pop_chunk=4)
    theta = task.generate_theta(jax.random.PRNGKey(0))
    sens = jnp.ones((eng.dim,), jnp.float32)
    rng = np.random.default_rng(0)
    F = 8
    seeds = rng.integers(0, 2**32, size=F, dtype=np.uint32)
    idx = rng.integers(0, 64, size=(F, 16)).astype(np.int32)

    artifacts, deltas = eng.eval_generation(theta, sens, 0.05, seeds, idx)
    assert deltas is not None
    fit = np.asarray(task.host_fitness(artifacts, idx))

    st = eng.optimizer.init(eng.dim)
    st_a, theta_a, ratio_a = eng.update(theta, st, sens, 0.05, seeds, fit,
                                        0.01, 1e-3, deltas=deltas)
    st_b, theta_b, ratio_b = eng.update(theta, st, sens, 0.05, seeds, fit,
                                        0.01, 1e-3, deltas=None)
    # identical math, different accumulation order (einsum vs chunked map)
    np.testing.assert_allclose(np.asarray(theta_a), np.asarray(theta_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ratio_a), float(ratio_b), rtol=1e-5)


def test_delta_bytes_limit_falls_back():
    """Populations whose delta matrix exceeds the HBM budget fall back to
    seed-replay (deltas handle is None)."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    task = _mnist_task()
    eng = NESEngine(task, Adam(0.01), MutationKind.DEFAULT, pop_chunk=4)
    eng.DELTA_BYTES_LIMIT = 1  # force the fallback
    rng = np.random.default_rng(0)
    seeds = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    idx = rng.integers(0, 64, size=(4, 8)).astype(np.int32)
    theta = task.generate_theta(jax.random.PRNGKey(0))
    sens = jnp.ones((eng.dim,), jnp.float32)
    _, deltas = eng.eval_generation(theta, sens, 0.05, seeds, idx)
    assert deltas is None


def test_sm_g_abs_end_to_end(tmp_path):
    """SM-G-ABS (per-sample Jacobian) trains a NES generation."""
    from nes_img_captioning_tpu.algorithms.nes import NESMaster
    from nes_img_captioning_tpu.utils.config import load_experiment

    exp = load_experiment("experiments/mnist_nes.json")
    exp["log_dir"] = str(tmp_path / "run")
    exp["nb_offspring"] = 4
    exp["config"]["batch_size"] = 8
    exp["synthetic_sizes"] = [32, 16]
    exp["policy_options"]["model_options"]["safe_mutations"] = "SM-G-ABS"
    exp["tpu"] = {"seed": 0}
    master = NESMaster(exp)
    # fused task => the per-sample Jacobian runs inside the generation
    # program; the host-side sens operand stays a dummy
    assert master.engine.inline_sens
    master.run_master(max_iterations=1)
    assert np.all(np.asarray(master._sens) == 1.0)
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import calc_sensitivity

    sens = np.asarray(calc_sensitivity(
        master.task, master.theta, np.arange(8, dtype=np.int32),
        MutationKind.SAFE_GRAD_ABS, 0.01,
    ))
    assert sens.min() >= 1.0 and np.isfinite(sens).all()
    assert sens.max() > 1.0


def test_plan_prime_population_keeps_wave_bound():
    """Prime-ish populations must NOT degenerate to one full-population wave
    (the round-1 divisor-growth bug): the chunk rounds up to a mesh multiple
    and the tail wave is padded instead."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.parallel.mesh import make_mesh

    task = _mnist_task()
    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    eng = NESEngine(task, Adam(0.01), MutationKind.DEFAULT, mesh=mesh,
                    pop_chunk=48)
    n_chunks, chunk = eng._plan(997)
    assert chunk == 48 and n_chunks == 21  # ~F/pop_chunk waves, not 1
    # tiny population still shards: chunk is a mesh multiple
    n_chunks, chunk = eng._plan(3)
    assert chunk == 8 and n_chunks == 1


def test_padded_mesh_sweep_matches_unpadded():
    """A population that doesn't divide the mesh (F=7 on 8 devices) is
    padded with zero-weight lanes; fitnesses and the updated theta must be
    identical to the unpadded single-device evaluation."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.parallel.mesh import make_mesh

    task = _mnist_task()
    theta = task.generate_theta(jax.random.PRNGKey(0))
    sens = jnp.ones((task.spec.num_params,), jnp.float32)
    rng = np.random.default_rng(1)
    F = 7
    seeds = rng.integers(0, 2**32, size=F, dtype=np.uint32)
    idx = rng.integers(0, 64, size=(F, 16)).astype(np.int32)

    results = {}
    for name, mesh, chunk in [
        ("padded", make_mesh(), 3),   # chunk rounds up to 8, 1 pad lane
        ("plain", None, 0),           # single wave, no padding
    ]:
        eng = NESEngine(task, Adam(0.01), MutationKind.DEFAULT,
                        mesh=mesh, pop_chunk=chunk)
        artifacts, deltas = eng.eval_generation(theta, sens, 0.05, seeds, idx)
        fit = np.asarray(task.host_fitness(artifacts, idx))
        st = eng.optimizer.init(eng.dim)
        _, new_theta, _ = eng.update(theta, st, sens, 0.05, seeds, fit,
                                     0.01, 1e-3, deltas=deltas)
        results[name] = (fit, np.asarray(new_theta))

    np.testing.assert_allclose(results["padded"][0], results["plain"][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results["padded"][1], results["plain"][1],
                               rtol=1e-5, atol=1e-6)


def test_fused_generation_matches_two_phase():
    """engine.generation (one dispatch) must produce the same fitnesses and
    updated theta as eval_generation + host_fitness + update."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    task = _mnist_task()
    theta = task.generate_theta(jax.random.PRNGKey(0))
    sens = jnp.ones((task.spec.num_params,), jnp.float32)
    rng = np.random.default_rng(2)
    F = 6
    seeds = rng.integers(0, 2**32, size=F, dtype=np.uint32)
    idx = rng.integers(0, 64, size=(F, 16)).astype(np.int32)

    eng_a = NESEngine(task, Adam(0.01), MutationKind.DEFAULT, pop_chunk=4)
    th_a, st_a, packed = eng_a.generation(
        theta, eng_a.optimizer.init(eng_a.dim), sens, 0.05, seeds, idx,
        0.01, 1e-3,
    )
    fit_a, ratio_a, norm_a = eng_a.unpack(packed, F)

    eng_b = NESEngine(task, Adam(0.01), MutationKind.DEFAULT, pop_chunk=4)
    st0 = eng_b.optimizer.init(eng_b.dim)
    artifacts, deltas = eng_b.eval_generation(theta, sens, 0.05, seeds, idx)
    fit_b = np.asarray(task.host_fitness(artifacts, idx))
    st_b, th_b, ratio_b = eng_b.update(theta, st0, sens, 0.05, seeds, fit_b,
                                       0.01, 1e-3, deltas=deltas)

    np.testing.assert_allclose(fit_a, fit_b, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(th_a), np.asarray(th_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ratio_a), float(ratio_b), rtol=1e-5)


def test_sensitivity_precision_knob_plumbs():
    """tpu.sensitivity_precision selects the Jacobian matmul precision; on
    CPU the context is a no-op, so both settings must agree exactly (the
    on-chip accuracy/speed tradeoff is measured in docs/RESULTS.md)."""
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import calc_sensitivities

    task = _mnist_task()
    thetas = jnp.stack([task.generate_theta(jax.random.PRNGKey(i))
                        for i in range(2)])
    idx = jnp.asarray(np.arange(4, dtype=np.int32))
    a = np.asarray(calc_sensitivities(
        task, thetas, idx, MutationKind.SAFE_GRAD_SUM, 0.01,
        matmul_precision="float32"))
    b = np.asarray(calc_sensitivities(
        task, thetas, idx, MutationKind.SAFE_GRAD_SUM, 0.01,
        matmul_precision="bfloat16"))
    assert np.isfinite(b).all() and b.min() >= 1.0
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_inline_sens_requires_smg_mutation():
    """inline_sens=True with a non-SM-G mutation must be rejected at
    construction (the traced sensitivity would otherwise silently compute
    SM-G-ABS and overwrite the caller's sens operand)."""
    import pytest

    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    task = _mnist_task()
    for kind in (MutationKind.DEFAULT, MutationKind.SAFE_VECTOR):
        with pytest.raises(ValueError, match="inline_sens"):
            NESEngine(task, Adam(0.01), kind, inline_sens=True)
    # auto (None) and explicit False stay valid for every kind
    assert NESEngine(task, Adam(0.01), MutationKind.DEFAULT).inline_sens \
        is False
    eng = NESEngine(task, Adam(0.01), MutationKind.SAFE_GRAD_SUM,
                    inline_sens=False)
    assert eng.inline_sens is False


def test_host_and_traced_sum_sens_share_one_definition():
    """calc_sensitivity (the inline_sens=False fallback) and the traced
    form the engines inline must be the same computation — including the
    forced-f32 Jacobian dots that differ from the TPU ambient default.
    Tolerance is last-ulp: the two entry points compile as separate XLA
    programs, so fusion choices may differ, but any semantic divergence
    (e.g. a precision-context mismatch) is orders of magnitude larger."""
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import (
        calc_sensitivity, postprocess, sum_sens_traced)

    task = _mnist_task()
    theta = task.generate_theta(jax.random.PRNGKey(3))
    idx = jnp.asarray(np.arange(6, dtype=np.int32))
    host = np.asarray(calc_sensitivity(
        task, theta, idx, MutationKind.SAFE_GRAD_SUM, 0.01))
    traced = np.asarray(postprocess(sum_sens_traced(
        task.sensitivity_forward, theta, idx, task.device_consts()), 0.01))
    np.testing.assert_allclose(host, traced, rtol=1e-6, atol=0)


def test_batched_sensitivities_match_per_parent():
    """The fused per-parent sensitivity sweep (one lax.map program) must
    reproduce the per-parent calc_sensitivity calls exactly, for both
    gradient kinds."""
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import (
        calc_sensitivities,
        calc_sensitivity,
    )

    task = _mnist_task()
    rng = np.random.default_rng(3)
    thetas = jnp.stack(
        [task.generate_theta(jax.random.PRNGKey(i)) for i in range(3)]
    )
    idx = jnp.asarray(rng.integers(0, 64, size=4).astype(np.int32))

    for kind in (MutationKind.SAFE_GRAD_SUM, MutationKind.SAFE_GRAD_ABS):
        batched = np.asarray(calc_sensitivities(task, thetas, idx, kind, 0.01))
        assert batched.shape == (3, task.spec.num_params)
        for i in range(3):
            single = np.asarray(
                calc_sensitivity(task, thetas[i], idx, kind, 0.01)
            )
            np.testing.assert_allclose(batched[i], single, rtol=1e-5,
                                       atol=1e-6)


def test_rbg_rng_impl_trains_and_replays():
    """tpu.rng_impl='rbg' (fast TPU PRNG): the seed-replay contract — the
    update phase regenerating identical deltas from the eval seeds — must
    hold for the alternate stream family too."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    task = _mnist_task()
    rng = np.random.default_rng(5)
    F = 6
    seeds = rng.integers(0, 2**32, size=F, dtype=np.uint32)
    idx = rng.integers(0, 64, size=(F, 16)).astype(np.int32)
    theta = task.generate_theta(jax.random.PRNGKey(0))
    sens = jnp.ones((task.spec.num_params,), jnp.float32)

    thetas = {}
    for impl in ("", "rbg"):
        eng = NESEngine(task, Adam(0.01), MutationKind.DEFAULT,
                        pop_chunk=4, rng_impl=impl)
        artifacts, deltas = eng.eval_generation(theta, sens, 0.05, seeds, idx)
        fit = np.asarray(task.host_fitness(artifacts, idx))
        st = eng.optimizer.init(eng.dim)
        _, th_carried, _ = eng.update(theta, st, sens, 0.05, seeds, fit,
                                      0.01, 1e-3, deltas=deltas)
        _, th_regen, _ = eng.update(theta, st, sens, 0.05, seeds, fit,
                                    0.01, 1e-3, deltas=None)
        # einsum vs chunked-map accumulation order: identical math, ~1e-6
        np.testing.assert_allclose(np.asarray(th_carried),
                                   np.asarray(th_regen),
                                   rtol=1e-5, atol=5e-6)
        thetas[impl] = np.asarray(th_carried)
    # different stream families genuinely draw different noise
    assert np.abs(thetas[""] - thetas["rbg"]).max() > 0
