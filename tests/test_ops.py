"""Unit tests for fitness shaping, NES gradient, and mutation ops."""

import numpy as np
import jax
import jax.numpy as jnp

from nes_img_captioning_tpu.ops import (
    compute_centered_ranks,
    compute_ranks,
    nes_gradient,
    gaussian_noise,
    perturb,
)
from nes_img_captioning_tpu.ops.mutation import shape_noise


def test_compute_ranks_basic():
    x = jnp.array([10.0, -1.0, 5.0])
    np.testing.assert_array_equal(np.asarray(compute_ranks(x)), [2, 0, 1])


def test_centered_ranks_reference_example():
    # documented example from the reference docstring
    # (src/algorithm/nic_nes/nic_nes_master.py:188-190)
    x = jnp.array([[101.0, 200.0], [2.0, 100.0]])
    expected = np.array([[0.16666667, 0.5], [-0.5, -0.16666667]])
    np.testing.assert_allclose(np.asarray(compute_centered_ranks(x)), expected, atol=1e-7)


def test_nes_gradient_matches_numpy_reference():
    """Check against a direct numpy transcription of the reference math:
    weights = ranks(:,0)-ranks(:,1); grad = weights @ noise / (2F)."""
    rng = np.random.default_rng(0)
    F, D = 16, 40
    fit = rng.normal(size=(F, 2)).astype(np.float32)
    noise = rng.normal(size=(F, D)).astype(np.float32)

    ranks = np.empty(fit.size, dtype=int)
    ranks[fit.ravel().argsort()] = np.arange(fit.size)
    y = (ranks.reshape(F, 2).astype(np.float64) / (fit.size - 1)) - 0.5
    w = y[:, 0] - y[:, 1]
    expected = (w @ noise) / fit.size

    got = np.asarray(nes_gradient(jnp.asarray(fit), jnp.asarray(noise)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_gaussian_noise_stats():
    n = np.asarray(gaussian_noise(jax.random.PRNGKey(0), 200_000, 0.05))
    assert abs(n.mean()) < 1e-3
    np.testing.assert_allclose(n.std(), 0.05, rtol=0.02)


def test_perturb_antithetic_consistency():
    """theta+delta and theta-delta must use the identical delta when
    regenerated from the same key (the seed-replay contract)."""
    theta = jnp.zeros(64)
    t1, d1 = perturb(theta, jax.random.PRNGKey(7), 0.1)
    t2, d2 = perturb(theta, jax.random.PRNGKey(7), 0.1)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(theta + d1))


def test_shape_noise_safe_divides():
    noise = jnp.ones(4)
    sens = jnp.array([1.0, 2.0, 4.0, 0.5])
    out = np.asarray(shape_noise(noise, jnp.zeros(4), sensitivity=sens))
    np.testing.assert_allclose(out, [1.0, 0.5, 0.25, 2.0])


def test_shape_noise_proportional_zero_replacement():
    """Zeros in theta are replaced by mean(|theta|) computed *before*
    replacement (reference: src/algorithm/nets.py:109-113)."""
    theta = jnp.array([0.0, -2.0, 4.0, 0.0])
    noise = jnp.ones(4)
    out = np.asarray(shape_noise(noise, theta, proportional=True))
    np.testing.assert_allclose(out, [1.5, 2.0, 4.0, 1.5])


def test_perturb_vmaps_over_population():
    theta = jnp.zeros(32)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    pop, deltas = jax.vmap(lambda k: perturb(theta, k, 1.0))(keys)
    assert pop.shape == (8, 32)
    # all members distinct
    assert len({float(d[0]) for d in deltas}) == 8


def test_pull_chunked_bitwise_equal():
    """pull_chunked must be np.asarray bit-for-bit at every shape class it
    meets: small (no chunking), exact-multiple, ragged tail, and 2D row
    matrices (the podium / parent-file pulls)."""
    from nes_img_captioning_tpu.parallel.transfer import pull_chunked

    rng = np.random.default_rng(0)
    for shape, chunk in [((64,), 1 << 20),          # small: plain asarray
                         ((1024,), 256 * 4),        # exact multiple
                         ((1000,), 256 * 4),        # ragged tail
                         ((3, 700), 512 * 4),       # 2D + ragged
                         ((5, 512), 512 * 4)]:      # 2D exact
        host = rng.normal(size=shape).astype(np.float32)
        dev = jnp.asarray(host)
        got = pull_chunked(dev, chunk_bytes=chunk)
        assert got.shape == host.shape and got.dtype == host.dtype
        assert np.array_equal(got, np.asarray(dev))

    ints = jnp.asarray(rng.integers(0, 1 << 30, size=999, dtype=np.int32))
    assert np.array_equal(pull_chunked(ints, chunk_bytes=128 * 4),
                          np.asarray(ints))


def test_pull_chunked_on_mesh_global_array():
    """The multihost snapshot path pulls mesh-REPLICATED global arrays
    through pull_chunked (jitted dynamic-slice over a sharded operand):
    must stay bitwise np.asarray across the 8 virtual devices."""
    from jax.sharding import NamedSharding, PartitionSpec

    from nes_img_captioning_tpu.parallel.mesh import make_mesh
    from nes_img_captioning_tpu.parallel.transfer import pull_chunked

    mesh = make_mesh((8,))
    host = np.random.default_rng(3).normal(size=(5, 3001)).astype(np.float32)
    sharding = NamedSharding(mesh, PartitionSpec())
    dev = jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )
    got = pull_chunked(dev, chunk_bytes=1024 * 4)
    assert np.array_equal(got, host)
