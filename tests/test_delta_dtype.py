"""tpu.delta_dtype — bf16 storage of the realized NES pair delta.

The contract: ONE rounding at generation (`delta = bf16(scale * N(0,1))`,
nes.py delta_of), after which eval and gradient consume bitwise-identical
values — so the NES estimator stays self-consistent while the delta's HBM
footprint halves on both the eval sweep and the gradient einsum. The
deviation from the reference is distributional only (8-bit-mantissa noise);
these tests pin the self-consistency, that the knob actually changes the
realized noise, and the config surface.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco


@pytest.fixture(scope="module")
def coco_task(tmp_path_factory):
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, parse_tpu_config

    d = str(tmp_path_factory.mktemp("coco_ddt"))
    copts = make_synthetic_coco(d, n_train=12, n_val=4, n_test=4,
                                vocab_size=40, fc_feat_size=24, cap_len=6,
                                seed=0)
    exp = {
        "dataset": "mscoco",
        "caption_options": copts,
        "policy_options": {"fitness": "greedy", "model_options": {
            "input_encoding_size": 16, "rnn_size": 16, "fc_feat_size": 24,
        }},
        "tpu": {"seed": 0, "fused_decode": True, "precision": "f32"},
    }
    task = CocoTask(exp, Config(batch_size=4), parse_tpu_config(exp))
    task._fused_interpret = True
    assert task.supports_pair_perturb
    return task


def _run_generation(task, delta_dtype, kernel_perturb):
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    eng = NESEngine(task, Adam(0.01), MutationKind.DEFAULT, pop_chunk=2,
                    kernel_perturb=kernel_perturb, delta_dtype=delta_dtype)
    rng = np.random.default_rng(8)
    F, B = 4, 4
    seeds = rng.integers(0, 2**32, size=F, dtype=np.uint32)
    idx = rng.integers(0, 12, size=(F, B)).astype(np.int32)
    theta = task.generate_theta(jax.random.PRNGKey(6))
    th, _, packed = eng.generation(
        theta, eng.optimizer.init(eng.dim),
        jnp.ones((eng.dim,), jnp.float32), 0.05, seeds, idx, 0.01, 1e-3,
    )
    return np.asarray(th), np.asarray(packed)


@pytest.mark.slow
def test_bf16_pair_kernel_bitwise_matches_per_member_path(coco_task):
    """With bf16 deltas, the pair kernel (base + sign*delta promoted in
    kernel) and the per-member path (base_vec + delta promoted by XLA) must
    still agree BITWISE — the promotion is the same f32 + f32(bf16) sum."""
    out_kp = _run_generation(coco_task, "bf16", kernel_perturb=True)
    out_pm = _run_generation(coco_task, "bf16", kernel_perturb=False)
    np.testing.assert_array_equal(out_kp[1], out_pm[1])
    np.testing.assert_array_equal(out_kp[0], out_pm[0])


@pytest.mark.slow
def test_bf16_actually_changes_the_noise(coco_task):
    """Guard against the knob silently not reaching the delta: the bf16
    rounding must change the realized perturbations (and hence fitnesses)
    vs f32 for the same seeds."""
    out_bf = _run_generation(coco_task, "bf16", kernel_perturb=True)
    out_f32 = _run_generation(coco_task, "f32", kernel_perturb=True)
    assert not np.array_equal(out_bf[1], out_f32[1])
    # and both remain finite/healthy
    assert np.isfinite(out_bf[1]).all() and np.isfinite(out_f32[1]).all()


@pytest.mark.slow
def test_f32_default_unchanged_by_the_knob_plumbing(coco_task):
    """delta_dtype='f32' must be a bitwise no-op vs an engine that never
    heard of the knob (the astype(f32) on an f32 array is identity)."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    out_default = _run_generation(coco_task, "f32", kernel_perturb=True)
    eng = NESEngine(coco_task, Adam(0.01), MutationKind.DEFAULT, pop_chunk=2,
                    kernel_perturb=True)
    assert eng._delta_dtype == jnp.float32
    rng = np.random.default_rng(8)
    seeds = rng.integers(0, 2**32, size=4, dtype=np.uint32)
    idx = rng.integers(0, 12, size=(4, 4)).astype(np.int32)
    theta = coco_task.generate_theta(jax.random.PRNGKey(6))
    th, _, packed = eng.generation(
        theta, eng.optimizer.init(eng.dim),
        jnp.ones((eng.dim,), jnp.float32), 0.05, seeds, idx, 0.01, 1e-3,
    )
    np.testing.assert_array_equal(np.asarray(packed), out_default[1])
    np.testing.assert_array_equal(np.asarray(th), out_default[0])


def test_engine_rejects_unknown_delta_dtype(coco_task):
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    with pytest.raises(ValueError, match="delta_dtype"):
        NESEngine(coco_task, Adam(0.01), MutationKind.DEFAULT,
                  delta_dtype="fp8")


def test_tpu_config_delta_dtype_parses_and_aliases():
    from nes_img_captioning_tpu.utils.config import parse_tpu_config

    assert parse_tpu_config({}).delta_dtype == "f32"
    assert parse_tpu_config(
        {"tpu": {"delta_dtype": "bfloat16"}}).delta_dtype == "bf16"
    assert parse_tpu_config(
        {"tpu": {"delta_dtype": "float32"}}).delta_dtype == "f32"
    with pytest.raises(ValueError, match="delta_dtype"):
        parse_tpu_config({"tpu": {"delta_dtype": "int8"}})
