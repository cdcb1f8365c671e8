"""Randomized SM-G-SUM sensitivity (tpu.sensitivity_probes).

The SM-G-SUM sweep is bound by its grouped-VJP row count (97 rows at the
reference's split 100 — docs/RESULTS.md "SM-G sensitivity levers");
``sum_sens_probes_traced`` replaces jacrev's K one-hot rows with R
Rademacher probes of one VJP pullback, an UNBIASED estimator of the
reference's own split-100 Jacobian column norms (E[(J^T v)_i^2] =
sum_k J_ki^2), with per-coordinate relative std <= 1/sqrt(2R). These tests
pin the estimator's math; the engine-path parity lives in
test_train_mnist.py::test_nes_inline_probe_sens_matches_host and the
probes leg of test_fused_es.py::test_fused_es_matches_plain_trajectory.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nes_img_captioning_tpu.ops.sensitivity import (
    probe_key_from_seed,
    sum_sens_probes_many_traced,
    sum_sens_probes_traced,
    sum_sens_traced,
)


def _linear_case(K=64, D=300, B=7, seed=0):
    """Linear forward: exact sensitivity = column norms of A, analytically
    checkable (the batch-sum contributes B, divided back out by the /B)."""
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))

    def forward(th, idx, consts):
        return jnp.tile((A @ th)[None, :], (B, 1))

    th = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    return forward, th, np.linalg.norm(np.asarray(A), axis=0)


def test_exact_matches_analytic_column_norms():
    forward, th, norms = _linear_case()
    exact = sum_sens_traced(forward, th, jnp.arange(7), None)
    np.testing.assert_allclose(np.asarray(exact), norms, rtol=1e-5)


def test_probe_estimator_converges_to_exact():
    """Median relative error tracks the 1/sqrt(2R) law (fixed keys, so the
    thresholds are deterministic; bounds are ~2x theory for slack)."""
    forward, th, norms = _linear_case()
    mk = jax.random.key
    med = {}
    for R in (16, 256):
        est = sum_sens_probes_traced(
            forward, th, jnp.arange(7), None,
            probe_key_from_seed(mk, np.uint32(1234)), R)
        rel = np.abs(np.asarray(est) / norms - 1.0)
        med[R] = float(np.median(rel))
    assert med[16] < 2.0 / np.sqrt(2 * 16), med
    assert med[256] < 2.0 / np.sqrt(2 * 256), med
    assert med[256] < med[16]


def test_probes_many_rows_equal_single_calls():
    """The (P, dim) parent sweep shares one probe matrix across rows and
    equals per-row calls with the same key."""
    forward, th, _ = _linear_case()
    key = probe_key_from_seed(jax.random.key, np.uint32(9))
    thetas = jnp.stack([th, th * 0.5, -th])
    many = sum_sens_probes_many_traced(
        forward, thetas, jnp.arange(7), None, key, 32)
    for p in range(3):
        one = sum_sens_probes_traced(
            forward, thetas[p], jnp.arange(7), None, key, 32)
        np.testing.assert_allclose(np.asarray(many[p]), np.asarray(one),
                                   rtol=1e-6, atol=1e-7)


def test_calc_sensitivity_requires_probe_key():
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.ops.sensitivity import calc_sensitivity

    class _Task:
        sensitivity_forward = staticmethod(
            lambda th, idx, consts: jnp.tile(th[None, :4], (2, 1)))
        device_consts = staticmethod(lambda: None)

    with pytest.raises(ValueError, match="probe_key"):
        calc_sensitivity(_Task(), jnp.ones(8), jnp.arange(2),
                         MutationKind.SAFE_GRAD_SUM, 0.01, probes=4)


def test_config_rejects_negative_probes():
    from nes_img_captioning_tpu.utils.config import parse_tpu_config

    with pytest.raises(ValueError, match="sensitivity_probes"):
        parse_tpu_config({"tpu": {"sensitivity_probes": -1}})
    assert parse_tpu_config(
        {"tpu": {"sensitivity_probes": 16}}).sensitivity_probes == 16


def test_abs_kind_ignores_probes_with_warning(caplog):
    """SM-G-ABS has no column-norm identity: engines zero the knob loudly
    rather than silently changing the ABS semantics."""
    import logging

    from nes_img_captioning_tpu.algorithms.es import ESEngine
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.tasks.classification import MnistTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    exp = {"policy_options": {"net": "mnist", "vbn": False},
           "data_root": "/nonexistent", "synthetic_sizes": (64, 16)}
    task = MnistTask(exp, Config(batch_size=8), TpuConfig(seed=0))
    with caplog.at_level(logging.WARNING):
        eng = ESEngine(task, MutationKind.SAFE_GRAD_ABS, sens_probes=16)
    assert eng._sens_probes == 0
    assert any("SM-G-SUM only" in r.message for r in caplog.records)
