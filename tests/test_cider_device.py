"""DeviceCider vs the pure-Python host oracle (fitness/ciderd.py).

The device scorer must reproduce the oracle's per-caption scores to f32
accuracy for both variants, including the edge cases: duplicated n-grams,
EOS-in-ngram semantics, variable reference counts, unseen n-grams (df=0),
and captions with no EOS.
"""

import numpy as np
import pytest

from nes_img_captioning_tpu.fitness.ciderd import CiderScorer
from nes_img_captioning_tpu.ops.cider_device import DeviceCider


def _make_gts(rng, n_img=24, vocab=40, T=16):
    gts = []
    for i in range(n_img):
        m = int(rng.integers(3, 7))  # variable ref counts
        rows = np.zeros((m, T), np.int32)
        for r in range(m):
            L = int(rng.integers(3, T))
            rows[r, :L] = rng.integers(1, vocab, size=L)
            # repeated tokens to exercise tf > 1
            if L > 6:
                rows[r, 3:5] = rows[r, 1:3]
        gts.append(rows)
    return gts


def _make_cands(rng, gts, n_cand=64, vocab=40, T=16):
    """Mix of corrupted reference copies (non-trivial overlap) and random
    captions (mostly unseen n-grams)."""
    cands = np.zeros((n_cand, T), np.int32)
    img_ids = rng.integers(0, len(gts), size=n_cand).astype(np.int32)
    for i in range(n_cand):
        if i % 2 == 0:
            src = gts[img_ids[i]][int(rng.integers(0, len(gts[img_ids[i]])))]
            cands[i] = src
            j = int(rng.integers(0, T))
            cands[i, j] = int(rng.integers(1, vocab))
        else:
            L = int(rng.integers(1, T + 1))
            cands[i, :L] = rng.integers(0, vocab, size=L)
    cands[0, :] = np.maximum(cands[0, :], 1)  # no EOS anywhere
    cands[1, 0] = 0  # EOS at position 0
    return cands, img_ids


@pytest.mark.parametrize("variant", ["cider-d", "cider"])
def test_device_matches_oracle(variant):
    rng = np.random.default_rng(7)
    gts = _make_gts(rng)
    cands, img_ids = _make_cands(rng, gts)

    oracle = CiderScorer(variant=variant).fit_df(gts)
    _, want = oracle.score(cands, [gts[i] for i in img_ids])

    dev = DeviceCider(gts, variant=variant)
    got = np.asarray(dev.score_rows(cands, img_ids))

    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    assert want.max() > 1.0  # corrupted copies must overlap meaningfully


def test_device_cider_inside_jit_and_vmap():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    gts = _make_gts(rng, n_img=8)
    dev = DeviceCider(gts)
    cands, img_ids = _make_cands(rng, gts, n_cand=12)
    oracle = CiderScorer(variant="cider-d").fit_df(gts)
    _, want = oracle.score(cands, [gts[i] for i in img_ids])

    f = jax.jit(lambda s, i: dev.score_rows(s, i))
    got = np.asarray(f(jnp.asarray(cands), jnp.asarray(img_ids)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # vmapped over a population axis, as the engines use it
    batched = jax.jit(jax.vmap(dev.score_rows, in_axes=(0, 0)))
    got2 = np.asarray(batched(
        jnp.asarray(np.stack([cands, cands])),
        jnp.asarray(np.stack([img_ids, img_ids])),
    ))
    np.testing.assert_allclose(got2[0], want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind", [
    "greedy", "sample", "self_critical", "sc_loss",
    "greedy_logprob", "greedy_expprob", "greedy_avgprob", "greedy_linprob",
])
def test_task_device_fitness_matches_host_path(tmp_path, kind):
    """CocoTask with device_cider on vs off: identical decodes must yield
    identical fitness values for EVERY fitness kind (same math, different
    location; the per-token criteria reduce in f32 on device vs f64 on
    host — tolerance 1e-5)."""
    import jax

    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    copts = make_synthetic_coco(
        str(tmp_path / "d"), n_train=48, n_val=8, n_test=8,
        vocab_size=60, fc_feat_size=24,
    )
    exp = {
        "dataset": "mscoco",
        "caption_options": copts,
        "policy_options": {
            "fitness": kind, "vbn": False,
            "model_options": {
                "input_encoding_size": 16, "rnn_size": 16, "fc_feat_size": 24,
            },
        },
    }
    cfg = Config(batch_size=8)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 48, size=8).astype(np.int32)

    fits = {}
    for flag in (True, False):
        task = CocoTask(exp, cfg, TpuConfig(seed=0, device_cider=flag))
        assert (task._device_cider is not None) == flag
        theta = task.generate_theta(jax.random.PRNGKey(1))
        art = jax.jit(task.rollout)(theta, idx)
        fits[flag] = float(np.asarray(task.host_fitness(art, idx)))
    np.testing.assert_allclose(fits[True], fits[False], rtol=1e-5, atol=1e-5)
    assert fits[True] != 0.0 or fits[False] == 0.0


def test_tables_lower_as_operands_not_constants():
    """Two scorers with identical table SHAPES but different BYTES must
    lower score_rows to the exact same HLO when the tables are passed as
    the ``dev`` operand — i.e. the table bytes are not part of the program
    (and therefore not part of the persistent compile-cache key)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    gts1 = _make_gts(rng, n_img=6, vocab=30)
    # same shapes/lengths/df-structure, shifted token ids -> different bytes
    gts2 = [np.where(g > 0, g + 1, 0) for g in gts1]
    dc1 = DeviceCider(gts1)
    dc2 = DeviceCider(gts2)
    assert jax.tree_util.tree_map(jnp.shape, dc1.dev) == \
        jax.tree_util.tree_map(jnp.shape, dc2.dev)

    cands, img_ids = _make_cands(rng, gts1, n_cand=8, vocab=30)
    f = jax.jit(lambda s, i, dev: dc1.score_rows(s, i, dev=dev))
    t1 = f.lower(jnp.asarray(cands), jnp.asarray(img_ids), dc1.dev).as_text()
    t2 = f.lower(jnp.asarray(cands), jnp.asarray(img_ids), dc2.dev).as_text()
    assert t1 == t2


def test_engine_consumes_rebuilt_tables_without_retrace(tmp_path):
    """A table rebuild on a live task must (a) NOT retrace/recompile the
    fused NES generation program and (b) actually be consumed by it (no
    stale embedded constants): doubling ref_count must halve the fitness."""
    import jax

    from nes_img_captioning_tpu.algorithms.nes import NESEngine
    from nes_img_captioning_tpu.algorithms.optimizers import Adam
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.ops.mutation import MutationKind
    from nes_img_captioning_tpu.tasks.captioning import CocoTask
    from nes_img_captioning_tpu.utils.config import Config, TpuConfig

    copts = make_synthetic_coco(
        str(tmp_path / "d"), n_train=32, n_val=8, n_test=8,
        vocab_size=40, fc_feat_size=16,
    )
    exp = {
        "dataset": "mscoco",
        "caption_options": copts,
        "policy_options": {
            "fitness": "greedy", "vbn": False,
            "model_options": {
                "input_encoding_size": 8, "rnn_size": 8, "fc_feat_size": 16,
            },
        },
    }
    task = CocoTask(exp, Config(batch_size=4), TpuConfig(seed=0))
    assert task.fitness_on_device
    engine = NESEngine(task, Adam(0.001), MutationKind.DEFAULT)

    traces = {"n": 0}
    orig = engine._generation_fn

    def counting(*a, **k):
        traces["n"] += 1
        return orig(*a, **k)

    engine._generation_fn = counting

    theta = np.asarray(task.generate_theta(jax.random.PRNGKey(0)))
    opt_state = engine.optimizer.init(engine.dim)
    seeds = np.arange(4, dtype=np.uint32)
    idx = np.tile(np.arange(4, dtype=np.int32), (4, 1))
    _, _, packed1 = engine.generation(
        theta, opt_state, np.ones(engine.dim, np.float32), 0.05, seeds, idx,
        0.001, 0.0,
    )
    fits1, _, _ = engine.unpack(packed1, 4)
    assert traces["n"] == 1

    # simulate a host-side table rebuild: same shapes, different bytes
    task._device_cider.dev = dict(
        task._device_cider.dev,
        ref_count=task._device_cider.dev["ref_count"] * 2.0,
    )
    _, _, packed2 = engine.generation(
        theta, opt_state, np.ones(engine.dim, np.float32), 0.05, seeds, idx,
        0.001, 0.0,
    )
    fits2, _, _ = engine.unpack(packed2, 4)
    assert traces["n"] == 1, "table rebuild retraced the generation program"
    assert np.any(fits1 != 0.0)
    np.testing.assert_allclose(fits2, fits1 / 2.0, rtol=1e-5, atol=1e-6)
