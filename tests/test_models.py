"""Parity tests: JAX models vs. independent torch oracles.

Covers the round-1 milestone from SURVEY.md §7.2 step 1: load a
reference-format checkpoint and match torch greedy captions token-for-token.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from nes_img_captioning_tpu.models import (
    FCCaptionModel,
    FCModelOptions,
    MnistModel,
    MnistModelOptions,
)

from oracles import OracleFCModel, OracleMnistNet, torch_flat_vector

VOCAB = 23  # small vocab so <eos>=0 wins argmax sometimes (exercises masking)


def _random_theta(spec, seed=0):
    return np.asarray(spec.init_theta(jax.random.PRNGKey(seed)))


def _load_oracle(oracle, spec, theta):
    sd = spec.to_state_dict(theta)
    oracle.load_state_dict(sd, strict=True)
    return oracle


@pytest.mark.parametrize(
    "opts, okw",
    [
        (FCModelOptions(vocab_size=VOCAB), {}),
        (FCModelOptions(vocab_size=VOCAB, vbn=True), {"vbn": True}),
        (FCModelOptions(vocab_size=VOCAB, layer_n=True), {"layer_n": True}),
        (
            FCModelOptions(vocab_size=VOCAB, vbn=True, vbn_affine=True),
            {"vbn": True, "affine": True},
        ),
        (FCModelOptions(vocab_size=VOCAB, vbn_e=True), {"vbn_e": True}),
    ],
    ids=["plain", "vbn", "layer_n", "vbn_affine", "vbn_e"],
)
def test_fc_caption_greedy_parity(opts, okw):
    opts = FCModelOptions(**{**opts.__dict__, "fc_feat_size": 64, "input_encoding_size": 16, "rnn_size": 16})
    model = FCCaptionModel(opts)
    theta = _random_theta(model.spec, seed=3)
    oracle = _load_oracle(
        OracleFCModel(VOCAB, enc=16, rnn=16, feat=64, **okw), model.spec, theta
    )
    # flat layout must match torch parameters_to_vector order
    np.testing.assert_array_equal(torch_flat_vector(oracle), theta)

    feats = np.random.default_rng(1).normal(size=(6, 64)).astype(np.float32)
    seq_j, lp_j = model.sample(jnp.asarray(theta), jnp.asarray(feats), greedy=True)
    seq_t, lp_t = oracle.greedy_sample(torch.from_numpy(feats))

    np.testing.assert_array_equal(np.asarray(seq_j), seq_t.numpy())
    np.testing.assert_allclose(np.asarray(lp_j), lp_t.numpy(), atol=2e-5)


def test_fc_caption_early_stop_zeroes_tail():
    """Bias the logit toward token 0 so the whole batch finishes early; the
    tail of seq and seq_logprobs must be exactly zero (reference break)."""
    opts = FCModelOptions(vocab_size=VOCAB, fc_feat_size=8, input_encoding_size=8, rnn_size=8)
    model = FCCaptionModel(opts)
    theta = _random_theta(model.spec, seed=5)
    off = model.spec.offset("logit.bias")
    theta = theta.copy()
    theta[off] += 8.0  # token 0 becomes argmax almost immediately
    oracle = _load_oracle(OracleFCModel(VOCAB, enc=8, rnn=8, feat=8), model.spec, theta)

    feats = np.random.default_rng(2).normal(size=(4, 8)).astype(np.float32)
    seq_j, lp_j = model.sample(jnp.asarray(theta), jnp.asarray(feats), greedy=True)
    seq_t, lp_t = oracle.greedy_sample(torch.from_numpy(feats))
    np.testing.assert_array_equal(np.asarray(seq_j), seq_t.numpy())
    np.testing.assert_allclose(np.asarray(lp_j), lp_t.numpy(), atol=2e-5)
    assert (np.asarray(seq_j)[:, 1:] == 0).all()


def test_fc_caption_sensitivity_forward_parity():
    opts = FCModelOptions(vocab_size=VOCAB, fc_feat_size=32, input_encoding_size=16, rnn_size=16)
    model = FCCaptionModel(opts)
    theta = _random_theta(model.spec, seed=7)
    oracle = _load_oracle(OracleFCModel(VOCAB, enc=16, rnn=16, feat=32), model.spec, theta)
    feats = np.random.default_rng(3).normal(size=(5, 32)).astype(np.float32)

    out_j = model.forward_for_sensitivity(jnp.asarray(theta), jnp.asarray(feats), split=10)
    out_t = oracle.sensitivity_forward(torch.from_numpy(feats), split=10)
    assert out_j.shape == tuple(out_t.shape)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-4)


def test_pth_roundtrip(tmp_path):
    opts = FCModelOptions(vocab_size=VOCAB, fc_feat_size=16, input_encoding_size=8, rnn_size=8)
    model = FCCaptionModel(opts)
    theta = _random_theta(model.spec, seed=11)
    path = str(tmp_path / "m.pth")
    model.spec.save_pth(theta, path)
    theta2 = model.spec.load_pth(path)
    np.testing.assert_array_equal(theta, theta2)  # bit-exact import requirement


@pytest.mark.parametrize("vbn", [False, True])
def test_mnist_parity(vbn):
    model = MnistModel(MnistModelOptions(vbn=vbn))
    theta = _random_theta(model.spec, seed=13)
    oracle = _load_oracle(OracleMnistNet(vbn=vbn), model.spec, theta)
    np.testing.assert_array_equal(torch_flat_vector(oracle), theta)

    x = np.random.default_rng(4).normal(size=(7, 1, 28, 28)).astype(np.float32)
    out_j = np.asarray(model.apply(jnp.asarray(theta), jnp.asarray(x)))
    out_t = oracle(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(out_j, out_t, atol=1e-4)


def test_fc_caption_param_count_matches_reference():
    """The 9487-word vocab fc_caption model must have exactly 2,865,808
    params (reference: src/algorithm/tools/utils.py:180)."""
    model = FCCaptionModel(FCModelOptions(vocab_size=9487))
    assert model.num_params == 2_865_808
