"""Pallas fused greedy-decode kernel: interpret-mode parity with the XLA
decoder (which is itself token-parity-tested against the torch oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nes_img_captioning_tpu.models.fc_caption import FCCaptionModel, FCModelOptions
from nes_img_captioning_tpu.ops.decode_pallas import (
    greedy_decode_fused,
    pad_vocab,
    prepare_decode_params,
)


@pytest.mark.parametrize("vocab,feat,enc", [(50, 32, 16), (130, 64, 32)])
def test_pallas_matches_xla_interpret(vocab, feat, enc):
    opts = FCModelOptions(vocab_size=vocab, fc_feat_size=feat,
                          input_encoding_size=enc, rnn_size=enc)
    m = FCCaptionModel(opts)
    theta = m.spec.init_theta(jax.random.PRNGKey(3))
    feats = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, feat)).astype(np.float32)
    )
    seq_r, lp_r = m.sample(theta, feats, greedy=True)
    params = prepare_decode_params(m.spec, theta, opts)
    seq_p, lp_p = greedy_decode_fused(params, feats, interpret=True)
    np.testing.assert_array_equal(np.asarray(seq_p), np.asarray(seq_r))
    np.testing.assert_allclose(np.asarray(lp_p), np.asarray(lp_r), atol=2e-5)


def test_pallas_early_stop_masking():
    opts = FCModelOptions(vocab_size=40, fc_feat_size=16,
                          input_encoding_size=8, rnn_size=8)
    m = FCCaptionModel(opts)
    theta = np.asarray(m.spec.init_theta(jax.random.PRNGKey(5))).copy()
    theta[m.spec.offset("logit.bias")] += 8.0  # EOS wins fast
    theta = jnp.asarray(theta)
    feats = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 16)).astype(np.float32)
    )
    seq_r, lp_r = m.sample(theta, feats, greedy=True)
    seq_p, lp_p = greedy_decode_fused(
        prepare_decode_params(m.spec, theta, opts), feats, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(seq_p), np.asarray(seq_r))
    np.testing.assert_allclose(np.asarray(lp_p), np.asarray(lp_r), atol=2e-5)
    assert (np.asarray(seq_p)[:, 1:] == 0).all()


def test_pad_vocab():
    assert pad_vocab(9488) == 9600
    assert pad_vocab(128) == 128
    assert pad_vocab(1) == 128


def test_sampled_decode_host_rng():
    """Gumbel-max sampling branch (host-rng emulation of the on-chip PRNG):
    deterministic given the table, tokens in vocab, and the recorded logprob
    equals log_softmax at the sampled token."""
    from nes_img_captioning_tpu.ops.decode_pallas import decode_fused

    opts = FCModelOptions(vocab_size=30, fc_feat_size=16,
                          input_encoding_size=8, rnn_size=8)
    m = FCCaptionModel(opts)
    theta = m.spec.init_theta(jax.random.PRNGKey(3))
    B = 8
    feats = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, 16)).astype(np.float32)
    )
    params = prepare_decode_params(m.spec, theta, opts)
    g = jax.random.gumbel(jax.random.PRNGKey(9), (16, B, pad_vocab(31)))
    seq, lp = decode_fused(params, feats, greedy=False, host_rng=True,
                           gumbel=g, interpret=True)
    seq2, _ = decode_fused(params, feats, greedy=False, host_rng=True,
                           gumbel=g, interpret=True)
    seq, lp = np.asarray(seq), np.asarray(lp)
    np.testing.assert_array_equal(seq, np.asarray(seq2))
    assert seq.max() <= 30 and (lp <= 1e-5).all()

    # step-0 logprob check against the model's log_softmax
    p = m.spec.unravel(theta)
    h = jnp.zeros((B, 8)); c = jnp.zeros((B, 8))
    _, h, c = m.lstm_core(p, m._img_embed(p, feats), h, c)
    out, h, c = m.lstm_core(p, m._embed(p, jnp.zeros((B,), jnp.int32)), h, c)
    logp = jax.nn.log_softmax(out @ p["logit.weight"].T + p["logit.bias"], -1)
    expect = np.take_along_axis(np.asarray(logp), seq[:, 0][:, None], 1)[:, 0]
    np.testing.assert_allclose(lp[:, 0], expect, atol=2e-5)


def test_padded_vocab_never_selected():
    """Argmax must never land in the padded vocab region (bias -1e9)."""
    opts = FCModelOptions(vocab_size=40, fc_feat_size=16,
                          input_encoding_size=8, rnn_size=8)
    m = FCCaptionModel(opts)
    theta = m.spec.init_theta(jax.random.PRNGKey(7))
    feats = jnp.asarray(
        np.random.default_rng(3).normal(size=(6, 16)).astype(np.float32)
    )
    seq_p, _ = greedy_decode_fused(
        prepare_decode_params(m.spec, theta, opts), feats, interpret=True
    )
    assert int(np.asarray(seq_p).max()) <= opts.vocab_size


@pytest.mark.parametrize("vocab_tile", [128, 256])
def test_streamed_vocab_tiles_token_exact(vocab_tile):
    """The streaming (tiled) greedy variant must be TOKEN-EXACT vs the
    untiled kernel — including argmax tie semantics (strict > keeps the
    first max) and the predicated embed-tile skip — with logprobs equal up
    to the online-logsumexp reassociation."""
    from nes_img_captioning_tpu.ops.decode_pallas import decode_fused

    opts = FCModelOptions(vocab_size=130, fc_feat_size=32,
                          input_encoding_size=16, rnn_size=16)
    m = FCCaptionModel(opts)
    theta = m.spec.init_theta(jax.random.PRNGKey(7))
    feats = jnp.asarray(
        np.random.default_rng(2).normal(size=(8, 32)).astype(np.float32)
    )
    params = prepare_decode_params(m.spec, theta, opts)
    seq_u, lp_u = decode_fused(params, feats, interpret=True)
    seq_t, lp_t = decode_fused(params, feats, interpret=True,
                               vocab_tile=vocab_tile)
    np.testing.assert_array_equal(np.asarray(seq_t), np.asarray(seq_u))
    np.testing.assert_allclose(np.asarray(lp_t), np.asarray(lp_u), atol=2e-5)
    # and without the logprob reductions (the fitness hot path)
    seq_t2, _ = decode_fused(params, feats, interpret=True,
                             vocab_tile=vocab_tile, need_logprobs=False)
    np.testing.assert_array_equal(np.asarray(seq_t2), np.asarray(seq_u))


def test_pair_perturb_kernel_matches_per_member(tmp_path):
    """decode_pair_perturb(base, delta) must decode exactly what
    decode_fused(prep(base_vec + delta)) / (base_vec - delta) decode: the
    in-kernel perturbation is the same f32 sum rounded to the same dtype —
    tokens bitwise-equal, logprobs to f32 tolerance."""
    from nes_img_captioning_tpu.ops.decode_layout import DecodeLayout
    from nes_img_captioning_tpu.ops.decode_pallas import decode_pair_perturb

    opts = FCModelOptions(vocab_size=50, fc_feat_size=32,
                          input_encoding_size=16, rnn_size=16)
    m = FCCaptionModel(opts)
    lay = DecodeLayout(m.spec, opts)
    theta = m.spec.init_theta(jax.random.PRNGKey(3))
    base_vec = lay.to_dec(theta)
    # a noise-shaped delta: zero on the pad lanes, like the engine's
    # scale_dec (pad_scale=0) guarantees
    scale = lay.to_dec(jnp.full((m.spec.num_params,), 0.05, jnp.float32),
                       pad_scale=0.0)
    delta = scale * jax.random.normal(jax.random.PRNGKey(9),
                                      (lay.dim_dec,), jnp.float32)
    feats = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 32)).astype(np.float32)
    )

    seq2, lp2 = decode_pair_perturb(
        lay.prep(base_vec, jnp.float32), lay.prep(delta, jnp.float32),
        feats, interpret=True, need_logprobs=True,
    )
    for s, sign in ((0, 1.0), (1, -1.0)):
        from nes_img_captioning_tpu.ops.decode_pallas import decode_fused

        ref_seq, ref_lp = decode_fused(
            lay.prep(base_vec + sign * delta, jnp.float32), feats,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(seq2[s]),
                                      np.asarray(ref_seq),
                                      err_msg=f"sign {sign} tokens")
        np.testing.assert_allclose(np.asarray(lp2[s]), np.asarray(ref_lp),
                                   atol=2e-5, err_msg=f"sign {sign} lp")
    # pos and neg genuinely differ (the perturbation was applied)
    assert not np.array_equal(np.asarray(seq2[0]), np.asarray(seq2[1]))


def test_pair_perturb_pad_lanes_never_selected():
    """The delta's pad lanes are zero (engine contract), so the padded
    logit bias stays at NEG through the in-kernel perturbation and pad
    tokens can never win the argmax."""
    from nes_img_captioning_tpu.ops.decode_layout import DecodeLayout
    from nes_img_captioning_tpu.ops.decode_pallas import decode_pair_perturb

    opts = FCModelOptions(vocab_size=50, fc_feat_size=16,
                          input_encoding_size=8, rnn_size=8)
    m = FCCaptionModel(opts)
    lay = DecodeLayout(m.spec, opts)
    theta = m.spec.init_theta(jax.random.PRNGKey(0))
    base_vec = lay.to_dec(theta)
    scale = lay.to_dec(jnp.full((m.spec.num_params,), 1.0, jnp.float32),
                       pad_scale=0.0)  # huge noise, but zero on pads
    delta = scale * jax.random.normal(jax.random.PRNGKey(4),
                                      (lay.dim_dec,), jnp.float32)
    feats = jnp.asarray(
        np.random.default_rng(7).normal(size=(4, 16)).astype(np.float32)
    )
    seq2, _ = decode_pair_perturb(
        lay.prep(base_vec, jnp.float32), lay.prep(delta, jnp.float32),
        feats, interpret=True,
    )
    assert int(np.asarray(seq2).max()) <= opts.vocab_size
