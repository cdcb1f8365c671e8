"""Decode-ordered layout fast path: exact equivalence with the torch-order
fused path (ops/decode_layout.py). All on CPU via the kernel's interpret
mode; the layout transforms themselves are pure jax."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
from nes_img_captioning_tpu.models.fc_caption import (
    FCCaptionModel,
    FCModelOptions,
)
from nes_img_captioning_tpu.ops.decode_layout import DecodeLayout
from nes_img_captioning_tpu.ops.decode_pallas import prepare_decode_params


@pytest.fixture(scope="module")
def model():
    return FCCaptionModel(FCModelOptions(
        vocab_size=40, seq_length=8, input_encoding_size=16, rnn_size=16,
        fc_feat_size=24,
    ))


def test_roundtrip_exact(model):
    lay = DecodeLayout(model.spec, model.options)
    v = jnp.asarray(
        np.random.default_rng(0).standard_normal(model.spec.num_params),
        jnp.float32,
    )
    back = lay.from_dec(lay.to_dec(v))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(v))


def test_prep_matches_prepare_decode_params(model):
    """prep(to_dec(theta)) must reproduce prepare_decode_params(theta)
    tensor-for-tensor (same shapes, same pad values, bitwise)."""
    lay = DecodeLayout(model.spec, model.options)
    theta = model.spec.init_theta(jax.random.PRNGKey(1))
    ref = prepare_decode_params(model.spec, theta, model.options,
                                dtype=jnp.bfloat16)
    got = lay.prep(lay.to_dec(theta), jnp.bfloat16)
    assert set(ref) == set(got)
    for k in ref:
        assert ref[k].dtype == got[k].dtype, k
        np.testing.assert_array_equal(
            np.asarray(ref[k], np.float32), np.asarray(got[k], np.float32),
            err_msg=k,
        )


def test_scale_vec_reproduces_delta():
    """delta == scale_vec * N(0,1) for every mutation kind (the hoisting the
    layout path relies on)."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.tasks.classification import MnistTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    task = MnistTask({"policy_options": {}, "synthetic_sizes": [32, 16]},
                     Config(batch_size=8), TpuConfig(seed=0))
    rng = np.random.default_rng(2)
    theta = jnp.asarray(rng.standard_normal(task.spec.num_params), jnp.float32)
    sens = jnp.asarray(1.0 + rng.random(task.spec.num_params), jnp.float32)
    for kind in (MutationKind.DEFAULT, MutationKind.SAFE_GRAD_SUM,
                 MutationKind.SAFE_PROPORTIONAL):
        eng = NESEngine(task, Adam(0.01), kind)
        seed = np.uint32(123)
        delta = eng._delta(theta, sens, 0.05, seed)
        scale = eng._scale_vec(theta, sens, 0.05)
        normal = jax.random.normal(eng._mk_key(seed), (eng.dim,), jnp.float32)
        np.testing.assert_allclose(np.asarray(delta),
                                   np.asarray(scale * normal),
                                   rtol=1e-6, atol=1e-7)


@pytest.fixture(scope="module")
def coco_task(tmp_path_factory):
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, parse_tpu_config

    d = str(tmp_path_factory.mktemp("coco_layout"))
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


@pytest.mark.slow
def test_layout_generation_matches_manual_replay(coco_task):
    """The decode-layout fused generation must be EXACTLY a standard fused
    generation whose member deltas are from_dec(scale_dec * N(0,1)):
    identical fitnesses (token-exact decode) and the matching theta update
    through the linear from_dec."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    task = coco_task
    eng = NESEngine(task, Adam(0.01), MutationKind.DEFAULT, pop_chunk=2)
    assert eng._layout is not None
    lay = eng._layout
    theta = task.generate_theta(jax.random.PRNGKey(3))
    sens = jnp.ones((eng.dim,), jnp.float32)
    rng = np.random.default_rng(4)
    F, B = 4, 4
    seeds = rng.integers(0, 2**32, size=F, dtype=np.uint32)
    idx = rng.integers(0, 12, size=(F, B)).astype(np.int32)
    sigma, lr, l2 = 0.05, 0.01, 1e-3

    th_new, _, packed = eng.generation(
        theta, eng.optimizer.init(eng.dim), sens, sigma, seeds, idx, lr, l2
    )
    fits, ratio, _ = eng.unpack(packed, F)

    # manual replay: same RNG draws, deltas mapped to torch order
    scale_dec = lay.to_dec(eng._scale_vec(theta, sens, sigma), pad_scale=0.0)
    man_fits = np.empty((F, 2), np.float32)
    grad = jnp.zeros((eng.dim,), jnp.float32)
    w = np.asarray(eng._pair_weights(jnp.asarray(fits), (F, 1))).reshape(F)
    for i, s in enumerate(seeds):
        base = eng._mk_key(np.uint32(s))
        delta_dec = scale_dec * jax.random.normal(
            base, (lay.dim_dec,), jnp.float32
        )
        delta = lay.from_dec(delta_dec)
        pos = task.rollout(theta + delta, jnp.asarray(idx[i]))["fitness"]
        neg = task.rollout(theta - delta, jnp.asarray(idx[i]))["fitness"]
        man_fits[i] = [float(pos), float(neg)]
        grad = grad + w[i] * delta

    np.testing.assert_allclose(fits, man_fits, rtol=1e-6)

    st, th_exp, ratio_exp = eng._apply_grad(
        theta, eng.optimizer.init(eng.dim), grad,
        jnp.float32(2 * F), jnp.float32(lr), jnp.float32(l2),
    )
    np.testing.assert_allclose(np.asarray(th_new), np.asarray(th_exp),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ratio), float(ratio_exp), rtol=1e-4)


@pytest.mark.slow
def test_layout_generation_on_mesh_matches_unsharded(coco_task):
    """The layout path must shard over the pop mesh like any other sweep:
    fitnesses and the updated theta agree with the single-device run."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.parallel.mesh import make_mesh

    task = coco_task
    theta = task.generate_theta(jax.random.PRNGKey(7))
    sens = jnp.ones((task.spec.num_params,), jnp.float32)
    rng = np.random.default_rng(8)
    F, B = 6, 4  # F=6 on 8 devices: 2 pad lanes
    seeds = rng.integers(0, 2**32, size=F, dtype=np.uint32)
    idx = rng.integers(0, 12, size=(F, B)).astype(np.int32)

    results = {}
    for name, mesh in (("mesh", make_mesh()), ("plain", None)):
        eng = NESEngine(task, Adam(0.01), MutationKind.DEFAULT, mesh=mesh,
                        pop_chunk=4)
        assert eng._layout is not None
        th, _, packed = eng.generation(
            theta, eng.optimizer.init(eng.dim), sens, 0.05, seeds, idx,
            0.01, 1e-3,
        )
        fits, _, _ = eng.unpack(packed, F)
        results[name] = (fits, np.asarray(th))

    np.testing.assert_allclose(results["mesh"][0], results["plain"][0],
                               rtol=1e-6)
    np.testing.assert_allclose(results["mesh"][1], results["plain"][1],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_layout_block_trajectory_exact(coco_task):
    """gens_per_dispatch blocks must stay trajectory-exact on the layout
    path: 2 chained generations == 2 sequential single dispatches."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    task = coco_task
    eng = NESEngine(task, Adam(0.01), MutationKind.DEFAULT, pop_chunk=2)
    theta = task.generate_theta(jax.random.PRNGKey(5))
    sens = jnp.ones((eng.dim,), jnp.float32)
    rng = np.random.default_rng(6)
    K, F, B = 2, 2, 4
    seeds = rng.integers(0, 2**32, size=(K, F), dtype=np.uint32)
    idx = rng.integers(0, 12, size=(K, F, B)).astype(np.int32)

    th_b, st_b, packs = eng.generation_block(
        theta, eng.optimizer.init(eng.dim), sens, 0.05, seeds, idx, 0.01, 1e-3
    )
    fits_b, _, _ = eng.unpack(packs, F)

    th, st = theta, eng.optimizer.init(eng.dim)
    fits_s = []
    for k in range(K):
        th, st, packed = eng.generation(
            th, st, sens, 0.05, seeds[k], idx[k], 0.01, 1e-3
        )
        f, _, _ = eng.unpack(packed, F)
        fits_s.append(f)

    np.testing.assert_array_equal(np.asarray(fits_b),
                                  np.stack(fits_s))
    np.testing.assert_array_equal(np.asarray(th_b), np.asarray(th))


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["sample", "sc_loss", "greedy_linprob"])
def test_rollout_dec_covers_all_device_kinds(tmp_path, kind):
    """rollout_dec (the decode-layout fast path) must produce the same
    fitness as the standard rollout for the sampled, self-critical, and
    per-token-criterion kinds — the criteria ride the device path too."""
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, parse_tpu_config

    copts = make_synthetic_coco(str(tmp_path / "d"), n_train=12, n_val=4,
                                n_test=4, vocab_size=40, fc_feat_size=24,
                                cap_len=6, seed=0)
    exp = {
        "dataset": "mscoco",
        "caption_options": copts,
        "policy_options": {"fitness": kind, "model_options": {
            "input_encoding_size": 16, "rnn_size": 16, "fc_feat_size": 24,
        }},
        "tpu": {"seed": 0, "fused_decode": True, "precision": "f32"},
    }
    task = CocoTask(exp, Config(batch_size=4), parse_tpu_config(exp))
    task._fused_interpret = True
    assert task.fitness_on_device and task.decode_layout is not None

    theta = task.generate_theta(jax.random.PRNGKey(2))
    idx = np.arange(4, dtype=np.int32)
    key = jax.random.key(7)
    # jitted, as the engines always call them (eager lax.map over the
    # kernel trips a jax lowering-cache issue unrelated to the math)
    want = np.asarray(jax.jit(task.rollout)(theta, idx, key=key)["fitness"])
    vec_dec = task.decode_layout.to_dec(theta)
    got = np.asarray(
        jax.jit(task.rollout_dec)(vec_dec, idx, key=key)["fitness"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    assert np.isfinite(got)


@pytest.mark.slow
def test_kernel_perturb_generation_identical(coco_task):
    """tpu.kernel_perturb (in-kernel pair perturbation) is a pure execution
    optimization: the fused generation's packed output and updated theta
    must be BITWISE-identical to the per-member perturbed-vector path in
    f32 interpret mode — same f32 sum, same cast, same kernel ops."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    task = coco_task
    assert task.supports_pair_perturb
    theta = task.generate_theta(jax.random.PRNGKey(6))
    rng = np.random.default_rng(8)
    F, B = 4, 4
    seeds = rng.integers(0, 2**32, size=F, dtype=np.uint32)
    idx = rng.integers(0, 12, size=(F, B)).astype(np.int32)

    outs = {}
    for kp in (True, False):
        eng = NESEngine(task, Adam(0.01), MutationKind.DEFAULT, pop_chunk=2,
                        kernel_perturb=kp)
        assert eng._kernel_perturb is kp
        sens = jnp.ones((eng.dim,), jnp.float32)
        th, _, packed = eng.generation(
            theta, eng.optimizer.init(eng.dim), sens, 0.05, seeds, idx,
            0.01, 1e-3,
        )
        outs[kp] = (np.asarray(th), np.asarray(packed))

    np.testing.assert_array_equal(outs[True][1], outs[False][1])
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
