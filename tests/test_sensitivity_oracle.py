"""SM-G sensitivity vs an executing torch-autograd oracle.

The model FORWARDS are already oracle-pinned (tests/test_models.py) and the
SM-G formulas are transcription-tested, but until now nothing executed the
reference's actual sensitivity procedure — K explicit backward passes
through torch autograd (src/algorithm/safe_mutations.py:93-117 for SUM,
119-146 for ABS), sqrt-sum-of-squares, the /batch (SUM) vs mean-|J| (ABS)
normalization, and the clamp-then-divide post-processing
(safe_mutations.py:62-63) — against `ops/sensitivity.calc_sensitivity`.
These tests do, for both task plugins (MNIST logits and the captioning
grouped-logprob forward with its full-extra-pad quirk).
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from nes_img_captioning_tpu.ops.mutation import MutationKind
from nes_img_captioning_tpu.ops.sensitivity import calc_sensitivity
from nes_img_captioning_tpu.utils.config import (
    Config, TpuConfig, parse_tpu_config,
)

from oracles import OracleFCModel, OracleMnistNet

UNDERFLOW = 0.01


def _flat_grad(model) -> np.ndarray:
    """extract_grad in parameters_to_vector order (the reference's flat
    layout, src/algorithm/nets.py)."""
    return np.concatenate([
        (p.grad if p.grad is not None else torch.zeros_like(p))
        .detach().numpy().ravel()
        for p in model.parameters()
    ])


def _postprocess(sens: np.ndarray) -> np.ndarray:
    """safe_mutations.py:62-63: clamp below at underflow, divide by it."""
    return np.maximum(sens, UNDERFLOW) / UNDERFLOW


def _oracle_sum_sensitivity(model, out: torch.Tensor) -> np.ndarray:
    """_calc_sum_sensitivity (safe_mutations.py:93-117): J_k = grad of
    sum_b out[b, k]; sens = sqrt(sum_k J_k^2) / B."""
    B, K = out.shape
    dim = sum(p.numel() for p in model.parameters())
    jac = np.zeros((K, dim), np.float64)
    grad_output = torch.zeros_like(out)
    for k in range(K):
        model.zero_grad()
        grad_output.zero_()
        grad_output[:, k] = 1.0
        out.backward(gradient=grad_output, retain_graph=True)
        jac[k] = _flat_grad(model)
    model.zero_grad()
    return _postprocess(np.sqrt((jac ** 2).sum(0)) / B)


def _oracle_abs_sensitivity(model, forward, x: torch.Tensor) -> np.ndarray:
    """_calc_abs_sensitivity (safe_mutations.py:119-146): per-sample
    Jacobians, |J| averaged over the batch BEFORE the sqrt-sum-of-squares
    (and no /B)."""
    B = x.shape[0]
    dim = sum(p.numel() for p in model.parameters())
    out0 = forward(x[:1])
    K = out0.shape[1]
    jac = np.zeros((K, dim, B), np.float64)
    for i in range(B):
        out_i = forward(x[i : i + 1])
        for k in range(K):
            model.zero_grad()
            g = torch.zeros_like(out_i)
            g[0, k] = 1.0
            out_i.backward(gradient=g, retain_graph=True)
            jac[k, :, i] = _flat_grad(model)
    model.zero_grad()
    mean_abs = np.abs(jac).mean(2)
    return _postprocess(np.sqrt((mean_abs ** 2).sum(0)))


def _mnist_forward(model: OracleMnistNet, x: torch.Tensor) -> torch.Tensor:
    """Grad-enabled transcription of the oracle's (no_grad) forward — the
    MNIST sensitivity output is the raw logits
    (reference: src/classification/nets.py:39-48)."""
    x = model.conv1(x)
    if model.vbn:
        x = model.bn1(x)
    x = F.max_pool2d(F.relu(x), 2, 2)
    x = model.conv2(x)
    if model.vbn:
        x = model.bn2(x)
    x = F.max_pool2d(F.relu(x), 2, 2)
    return model.fc1(x.view(-1, 320))


def _caption_sens_forward(model: OracleFCModel, feats: torch.Tensor,
                          length: int = 5, split: int = 10) -> torch.Tensor:
    """Grad-enabled transcription of the reference's captioning
    forward_for_sensitivity (src/captioning/nets.py:22-70): image step,
    ``length`` greedy token steps, final-step logprobs zero-padded to a
    multiple of ``split`` (a FULL extra pad group when already divisible —
    the quirk), L2 over each group."""
    B = feats.shape[0]
    h = torch.zeros(B, model.rnn_size)
    c = torch.zeros(B, model.rnn_size)
    _, h, c = model.core(model.img_embed(feats), h, c)
    it = torch.zeros(B, dtype=torch.long)
    logprobs = None
    for _ in range(length):
        out, h, c = model.core(model.embed(it), h, c)
        logprobs = F.log_softmax(model.logit(out), dim=1)
        it = logprobs.argmax(1).detach()
    pad = split - (logprobs.shape[1] % split)
    ext = torch.cat([logprobs, torch.zeros(B, pad)], dim=1)
    groups = ext.view(B, -1, split)
    return torch.sqrt((groups ** 2).sum(-1))


def _mnist_task():
    from nes_img_captioning_tpu.tasks.classification import MnistTask

    return MnistTask({"policy_options": {}, "synthetic_sizes": [64, 32]},
                     Config(batch_size=16), TpuConfig(seed=0))


def _load_oracle(oracle, spec, theta):
    oracle.load_state_dict(spec.to_state_dict(theta), strict=True)
    for p in oracle.parameters():
        p.requires_grad_(True)
    return oracle


def test_sm_g_sum_matches_torch_autograd_mnist():
    task = _mnist_task()
    theta = np.asarray(task.spec.init_theta(jax.random.PRNGKey(1)))
    idx = np.arange(6, dtype=np.int32)

    got = np.asarray(calc_sensitivity(
        task, jnp.asarray(theta), jnp.asarray(idx),
        MutationKind.SAFE_GRAD_SUM, UNDERFLOW,
    ))

    oracle = _load_oracle(OracleMnistNet(), task.spec, theta)
    x = torch.from_numpy(np.array(task.train["x"][idx]))
    want = _oracle_sum_sensitivity(oracle, _mnist_forward(oracle, x))

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_sm_g_abs_matches_torch_autograd_mnist():
    task = _mnist_task()
    theta = np.asarray(task.spec.init_theta(jax.random.PRNGKey(7)))
    idx = np.arange(3, dtype=np.int32)  # the ABS oracle is quadratic

    got = np.asarray(calc_sensitivity(
        task, jnp.asarray(theta), jnp.asarray(idx),
        MutationKind.SAFE_GRAD_ABS, UNDERFLOW,
    ))

    oracle = _load_oracle(OracleMnistNet(), task.spec, theta)
    x = torch.from_numpy(np.array(task.train["x"][idx]))
    want = _oracle_abs_sensitivity(
        oracle, lambda xi: _mnist_forward(oracle, xi), x
    )

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_sm_g_sum_matches_torch_autograd_caption(tmp_path):
    from nes_img_captioning_tpu.data.synthetic import make_synthetic_coco
    from nes_img_captioning_tpu.tasks.captioning import CocoTask

    vocab, feat = 40, 24
    copts = make_synthetic_coco(str(tmp_path), n_train=12, n_val=4, n_test=4,
                                vocab_size=vocab, fc_feat_size=feat,
                                cap_len=6, seed=0)
    exp = {
        "dataset": "mscoco",
        "caption_options": copts,
        "policy_options": {"fitness": "greedy", "model_options": {
            "input_encoding_size": 16, "rnn_size": 16, "fc_feat_size": feat,
        }},
        "tpu": {"seed": 0, "sensitivity_split": 10, "precision": "f32"},
    }
    task = CocoTask(exp, Config(batch_size=4), parse_tpu_config(exp))
    theta = np.asarray(task.spec.init_theta(jax.random.PRNGKey(3)))
    idx = np.arange(4, dtype=np.int32)

    got = np.asarray(calc_sensitivity(
        task, jnp.asarray(theta), jnp.asarray(idx),
        MutationKind.SAFE_GRAD_SUM, UNDERFLOW,
    ))

    oracle = _load_oracle(
        OracleFCModel(vocab, enc=16, rnn=16, feat=feat), task.spec, theta
    )
    feats = torch.from_numpy(np.array(task.train_fc[idx]))
    out = _caption_sens_forward(oracle, feats, length=5, split=10)
    want = _oracle_sum_sensitivity(oracle, out)

    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-6)
