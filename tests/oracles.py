"""Independent torch oracles for parity testing.

These are written fresh from the *behavioral* spec in SURVEY.md (maxout-LSTM
captioner, small MNIST CNN) so our JAX models can be checked against torch
semantics (same dtype rules, same layer layouts) without importing or copying
reference code. They intentionally share nothing with the package under test
except the .pth state_dict naming contract.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class OracleLSTMCore(nn.Module):
    """Fused 5-chunk maxout LSTM cell: 3 sigmoid gates + max(c4, c5)."""

    def __init__(self, enc, rnn, vbn=False, layer_n=False, affine=False):
        super().__init__()
        self.rnn_size = rnn
        self.i2h = nn.Linear(enc, 5 * rnn)
        self.h2h = nn.Linear(rnn, 5 * rnn)
        self.vbn, self.layer_n = vbn, layer_n
        if vbn:
            self.i2h_bn = nn.BatchNorm1d(5 * rnn, track_running_stats=False, affine=affine)
            self.h2h_bn = nn.BatchNorm1d(5 * rnn, track_running_stats=False, affine=affine)
            self.c_bn = nn.BatchNorm1d(rnn, track_running_stats=False, affine=affine)
        elif layer_n:
            self.i2h_ln = nn.LayerNorm(5 * rnn, elementwise_affine=affine)
            self.h2h_ln = nn.LayerNorm(5 * rnn, elementwise_affine=affine)
            self.c_ln = nn.LayerNorm(rnn, elementwise_affine=affine)

    def forward(self, xt, h, c):
        a_x, a_h = self.i2h(xt), self.h2h(h)
        if self.vbn:
            a_x, a_h = self.i2h_bn(a_x), self.h2h_bn(a_h)
        elif self.layer_n:
            a_x, a_h = self.i2h_ln(a_x), self.h2h_ln(a_h)
        a = a_x + a_h
        R = self.rnn_size
        gates = torch.sigmoid(a[:, : 3 * R])
        i, f, o = gates[:, :R], gates[:, R : 2 * R], gates[:, 2 * R : 3 * R]
        cand = torch.max(a[:, 3 * R : 4 * R], a[:, 4 * R : 5 * R])
        c2 = f * c + i * cand
        cn = self.c_bn(c2) if self.vbn else (self.c_ln(c2) if self.layer_n else c2)
        h2 = o * torch.tanh(cn)
        return h2, h2, c2


class OracleFCModel(nn.Module):
    """Greedy caption decoder matching the reference's run-time behavior:
    t=0 image step, 16 token steps, finished-mask, batch-wide early stop."""

    def __init__(self, vocab_size, enc=128, rnn=128, feat=2048, seq_length=16,
                 vbn=False, vbn_e=False, affine=False, layer_n=False):
        super().__init__()
        self.seq_length = seq_length
        self.vbn_e = vbn_e
        if vbn_e:
            self.img_embed = nn.Sequential(
                nn.Linear(feat, enc),
                nn.BatchNorm1d(enc, track_running_stats=False, affine=affine),
            )
            self.embed = nn.Sequential(
                nn.Embedding(vocab_size + 1, enc),
                nn.BatchNorm1d(enc, track_running_stats=False, affine=affine),
            )
        else:
            self.img_embed = nn.Linear(feat, enc)
            self.embed = nn.Embedding(vocab_size + 1, enc)
        self.logit = nn.Linear(rnn, vocab_size + 1)
        self.core = OracleLSTMCore(enc, rnn, vbn=vbn, layer_n=layer_n, affine=affine)
        self.rnn_size = rnn

    @torch.no_grad()
    def greedy_sample(self, fc_feats):
        B = fc_feats.shape[0]
        h = torch.zeros(B, self.rnn_size)
        c = torch.zeros(B, self.rnn_size)
        seq = torch.zeros(B, self.seq_length, dtype=torch.long)
        seq_lp = torch.zeros(B, self.seq_length)
        unfinished = None
        for t in range(self.seq_length + 2):
            if t == 0:
                xt = self.img_embed(fc_feats)
            else:
                if t == 1:
                    it = torch.zeros(B, dtype=torch.long)
                xt = self.embed(it)
            out, h, c = self.core(xt, h, c)
            logprobs = F.log_softmax(self.logit(out), dim=1)
            if t == self.seq_length + 1:
                break
            lp, it = torch.max(logprobs, 1)
            if t >= 1:
                unfinished = (it > 0) if t == 1 else unfinished * (it > 0)
                it = it * unfinished.to(it.dtype)
                seq[:, t - 1] = it
                seq_lp[:, t - 1] = lp
                if unfinished.sum() == 0:
                    break
        return seq, seq_lp

    @torch.no_grad()
    def sensitivity_forward(self, fc_feats, length=5, split=100):
        B = fc_feats.shape[0]
        h = torch.zeros(B, self.rnn_size)
        c = torch.zeros(B, self.rnn_size)
        _, h, c = self.core(self.img_embed(fc_feats), h, c)
        it = torch.zeros(B, dtype=torch.long)
        for _ in range(length):
            out, h, c = self.core(self.embed(it), h, c)
            logprobs = F.log_softmax(self.logit(out), dim=1)
            it = logprobs.argmax(1)
        pad = split - (logprobs.shape[1] % split)
        ext = torch.cat([logprobs, torch.zeros(B, pad)], dim=1)
        groups = ext.view(B, -1, split)
        return torch.sqrt((groups ** 2).sum(-1))


class OracleMnistNet(nn.Module):
    def __init__(self, vbn=False):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 10, 5, 1)
        self.conv2 = nn.Conv2d(10, 20, 5, 1)
        self.fc1 = nn.Linear(320, 10)
        self.vbn = vbn
        if vbn:
            self.bn1 = nn.BatchNorm2d(10, track_running_stats=False)
            self.bn2 = nn.BatchNorm2d(20, track_running_stats=False)

    @torch.no_grad()
    def forward(self, x):
        x = self.conv1(x)
        if self.vbn:
            x = self.bn1(x)
        x = F.max_pool2d(F.relu(x), 2, 2)
        x = self.conv2(x)
        if self.vbn:
            x = self.bn2(x)
        x = F.max_pool2d(F.relu(x), 2, 2)
        return self.fc1(x.view(-1, 320))


def torch_flat_vector(model: nn.Module) -> np.ndarray:
    """nn.utils.parameters_to_vector order — the reference flat layout."""
    return nn.utils.parameters_to_vector(model.parameters()).detach().numpy()
