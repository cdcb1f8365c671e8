"""tpu.kernel_noise plumbing — the CPU-testable surface of in-kernel noise
generation (ops/decode_pallas.py:decode_pair_rng / pair_grad_rng).

The on-chip hardware PRNG has no interpret lowering, so the noise STREAMS
themselves are chip-only (verified by scripts/exp_kernel_noise.py: dump
determinism, eval==grad bitwise stream equality, token equivalence vs the
delta-operand kernel, grad == explicit weighted sum). What tests can pin on
CPU: the support gate (kernel_noise must never activate off-TPU — it would
fail to lower), the knob semantics (auto/True/False + the forced-on
warning), the DecodeLayout.flat_dec inverse the gradient path relies on, and
the experiment-JSON surface.
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

    d = str(tmp_path_factory.mktemp("coco_knoise"))
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


def test_gate_requires_real_tpu(coco_task):
    """Interpret mode (the CPU test form) must report no kernel-noise
    support: the on-chip PRNG cannot lower there."""
    assert coco_task.supports_pair_perturb
    assert not coco_task.supports_kernel_noise


def test_engine_auto_stays_off_on_cpu(coco_task):
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    eng = NESEngine(coco_task, Adam(0.01), MutationKind.DEFAULT)
    assert eng._kernel_perturb
    assert not eng._kernel_noise


def test_engine_forced_on_warns_and_disables(coco_task, caplog):
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    with caplog.at_level("WARNING"):
        eng = NESEngine(coco_task, Adam(0.01), MutationKind.DEFAULT,
                        kernel_noise=True)
    assert not eng._kernel_noise
    assert any("kernel_noise" in r.message for r in caplog.records)


def test_engine_false_disables_without_warning(coco_task, caplog):
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind

    with caplog.at_level("WARNING"):
        eng = NESEngine(coco_task, Adam(0.01), MutationKind.DEFAULT,
                        kernel_noise=False)
    assert not eng._kernel_noise
    assert not any("kernel_noise" in r.message for r in caplog.records)


def test_flat_dec_inverts_prep(coco_task):
    """flat_dec(prep(v)) == v — the reshaping the kernel-noise gradient path
    uses to bring pair_grad_rng's tensor dict back to the flat decode order
    from_dec consumes. Bitwise (slice/reshape only, no arithmetic)."""
    lay = coco_task.decode_layout
    v = jax.random.normal(jax.random.PRNGKey(3), (lay.dim_dec,), jnp.float32)
    params = lay.prep(v, jnp.float32)
    np.testing.assert_array_equal(np.asarray(lay.flat_dec(params)),
                                  np.asarray(v))


def test_flat_dec_weighted_sum_reaches_torch_order(coco_task):
    """The kernel-noise gradient contract end-to-end on CPU with EXPLICIT
    deltas standing in for the chip PRNG: accumulating w_i * delta_i in
    prep-space tensors, then flat_dec -> from_dec, equals the existing
    einsum-then-from_dec path on the same flat deltas."""
    lay = coco_task.decode_layout
    rng = np.random.default_rng(0)
    F = 3
    deltas = jnp.asarray(rng.standard_normal((F, lay.dim_dec)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(F), jnp.float32)

    want = np.asarray(lay.from_dec(jnp.einsum("f,fd->d", w, deltas)))

    acc = None
    for i in range(F):
        p = lay.prep(deltas[i], jnp.float32)
        scaled = {k: w[i] * t for k, t in p.items()}
        acc = scaled if acc is None else {
            k: acc[k] + scaled[k] for k in acc
        }
    got = np.asarray(lay.from_dec(lay.flat_dec(acc)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_engine_built_before_interpret_flip_still_runs(tmp_path):
    """Regression (r5): CPU tests force fused_decode on and flip
    _fused_interpret only AFTER constructing masters/engines
    (tests/test_anneal_e2e.py ordering). The kernel-noise auto gate must not
    latch True at engine init and then fail to lower on CPU — the backend
    check plus the trace-time re-read keep the generation on the
    delta-operand form."""
    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, parse_tpu_config

    copts = make_synthetic_coco(str(tmp_path / "d"), n_train=12, n_val=4,
                                n_test=4, vocab_size=40, fc_feat_size=24,
                                cap_len=6, seed=0)
    exp = {
        "dataset": "mscoco",
        "caption_options": copts,
        "policy_options": {"fitness": "greedy", "model_options": {
            "input_encoding_size": 16, "rnn_size": 16, "fc_feat_size": 24,
        }},
        "tpu": {"seed": 0, "fused_decode": True, "precision": "f32"},
    }
    task = CocoTask(exp, Config(batch_size=4), parse_tpu_config(exp))
    # engine FIRST (the anneal-test ordering) ...
    eng = NESEngine(task, Adam(0.01), MutationKind.DEFAULT, pop_chunk=2)
    # ... interpret flip after
    task._fused_interpret = True
    assert not eng._kernel_noise

    rng = np.random.default_rng(1)
    seeds = rng.integers(0, 2**32, size=2, dtype=np.uint32)
    idx = rng.integers(0, 12, size=(2, 4)).astype(np.int32)
    theta = task.generate_theta(jax.random.PRNGKey(0))
    th, _, packed = eng.generation(
        theta, eng.optimizer.init(eng.dim),
        jnp.ones((eng.dim,), jnp.float32), 0.05, seeds, idx, 0.01, 1e-3,
    )
    assert np.isfinite(np.asarray(packed)).all()


def test_tpu_config_knob_parses():
    from nes_img_captioning_tpu.utils.config import parse_tpu_config

    tc = parse_tpu_config({"tpu": {"kernel_noise": False}})
    assert tc.kernel_noise is False
    assert parse_tpu_config({}).kernel_noise == "auto"
