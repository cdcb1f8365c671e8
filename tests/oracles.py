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


class OracleNESLoop:
    """Torch/NumPy transcription of the FULL NES master step — evolve ->
    rollout -> centered ranks -> weighted gradient -> L2 -> Adam — written
    from the reference's behavioral spec (src/algorithm/nic_nes/
    nic_nes_master.py:123-133,170-221 for the gradient, optimizers.py:68-107
    for Adam, nets.py:83-119 for evolve) and sharing nothing with the package
    under test. Tests inject the REALIZED noise vectors, so equivalence is
    checked given shared noise (the two implementations deliberately differ
    in how noise is drawn — SURVEY.md §7.3)."""

    def __init__(self, dim, stepsize=0.01, l2coeff=0.0,
                 beta1=0.9, beta2=0.999, eps=1e-8):
        self.stepsize, self.l2coeff = stepsize, l2coeff
        self.beta1, self.beta2, self.eps = beta1, beta2, eps
        self.t = 0
        self.m = np.zeros(dim, np.float32)
        self.v = np.zeros(dim, np.float32)

    @staticmethod
    def centered_ranks(x):
        flat = x.ravel()
        order = flat.argsort(kind="stable")
        ranks = np.empty(flat.size, np.int64)
        ranks[order] = np.arange(flat.size)
        y = ranks.reshape(x.shape).astype(np.float32) / (flat.size - 1)
        return y - 0.5

    def generation(self, theta, deltas, fitness_fn):
        """One master iteration. ``deltas`` (F, dim) realized noise;
        ``fitness_fn(theta') -> float`` the torch rollout. Returns
        (new_theta, fitnesses (F, 2))."""
        n_pairs = deltas.shape[0]
        fits = np.zeros((n_pairs, 2), np.float32)
        for i in range(n_pairs):
            fits[i, 0] = fitness_fn(theta + deltas[i])
            fits[i, 1] = fitness_fn(theta - deltas[i])
        ranked = self.centered_ranks(fits)
        w = ranked[:, 0] - ranked[:, 1]
        grad = (w[:, None] * deltas).sum(0) / fits.size
        globalg = (-grad + self.l2coeff * theta).astype(np.float32)
        self.t += 1
        a = self.stepsize * np.sqrt(1.0 - self.beta2 ** self.t) / (
            1.0 - self.beta1 ** self.t
        )
        self.m = self.beta1 * self.m + (1.0 - self.beta1) * globalg
        self.v = self.beta2 * self.v + (1.0 - self.beta2) * globalg * globalg
        step = -a * self.m / (np.sqrt(self.v) + self.eps)
        return (theta + step).astype(np.float32), fits


class OracleESSelection:
    """NumPy transcription of the ES master's selection step
    (src/algorithm/nic_es/nic_es_master.py:116-125,155-167 +
    nic_es/iteration.py:83-110): offspring sorted by fitness descending,
    top (population_size - num_elites) become the next parents with the
    podium elites PREPENDED; the top num_elite_cands become the next elite
    candidates."""

    @staticmethod
    def select(fitness, pop_size, num_elites, n_cands):
        order = np.argsort(-np.asarray(fitness), kind="stable")
        return order[: pop_size - num_elites], order[:n_cands]

    @staticmethod
    def next_parents(elite_rows, child_rows):
        rows = ([elite_rows] if len(elite_rows) else []) + [child_rows]
        return np.concatenate(rows, axis=0)


def torch_mnist_fitness(x: np.ndarray, y: np.ndarray, vbn: bool = False):
    """-CrossEntropy fitness closure over a flat theta (reference
    ClfPolicy.rollout, src/classification/policies.py:16-45)."""
    model = OracleMnistNet(vbn=vbn)
    xt = torch.from_numpy(np.asarray(x, np.float32))
    yt = torch.from_numpy(np.asarray(y)).long()

    def fitness(theta):
        nn.utils.vector_to_parameters(
            torch.from_numpy(np.asarray(theta, np.float32)),
            model.parameters(),
        )
        with torch.no_grad():
            return float(-F.cross_entropy(model(xt), yt))

    return fitness
