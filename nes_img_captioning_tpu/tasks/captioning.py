"""MSCOCO captioning task: greedy/sampled LSTM decode on device, CIDEr-D
fitness on host (reference: src/captioning/policies.py).

Fitness variants (reference Fitness enum, captioning/policies.py:22-61):
  greedy | sample           -> mean CIDEr-D * 100
  self_critical             -> mean(CIDEr(sample) - CIDEr(greedy)) * 100
  sc_loss / greedy_*prob    -> per-token reward criterion scalar

TPU-first batch shape: batches are image-level (B unique images). The
reference replicates every image's features seq_per_img=5x and greedy-decodes
5 identical rows (captioning/dataloader.py:171, nets.py:183); for greedy
fitness the 5 rows produce 5 identical captions scored against the same
ground truths, so the mean is unchanged — we decode each image once (5x less
decode work, same fitness value). Sampling variants genuinely need 5
independent samples per image and decode B*5 rows, as the reference does.
"""

from __future__ import annotations

import logging
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from .base import Task
from ..data.mscoco import CocoData
from ..fitness.ciderd import CiderScorer
from ..fitness.criteria import FITNESS_CRITERIA, apply_criterion
from ..models.fc_caption import FCCaptionModel, FCModelOptions

logger = logging.getLogger(__name__)

__all__ = ["CocoTask", "GREEDY_KINDS", "SELF_CRITICAL_KINDS"]

# reference classification of fitness kinds (captioning/policies.py:40-47)
GREEDY_KINDS = {"greedy", "greedy_logprob", "greedy_expprob", "greedy_linprob",
                "greedy_avgprob"}
SELF_CRITICAL_KINDS = {"self_critical", "sc_loss"}


class CocoTask(Task):
    artifact_is_fitness = False

    def __init__(self, exp: dict, config, tpu_cfg):
        popts = exp.get("policy_options", {})
        mopts = dict(popts.get("model_options", {}))
        copts = dict(exp["caption_options"])
        self.config = config
        self.fitness_kind = popts.get("fitness") or "greedy"
        self.seq_per_img = copts.get("seq_per_img") or 5

        self.data = CocoData(copts, train_only=copts.get("train_only") or 0)

        # model dims depend on the data (reference:
        # captioning/experiment.py:24-30 injects vocab_size/seq_length)
        self.model = FCCaptionModel(FCModelOptions(
            vocab_size=self.data.vocab_size,
            seq_length=self.data.seq_length,
            input_encoding_size=mopts.get("input_encoding_size") or 128,
            rnn_size=mopts.get("rnn_size") or 128,
            fc_feat_size=mopts.get("fc_feat_size") or 2048,
            vbn=bool(popts.get("vbn", False)),
            vbn_e=bool(mopts.get("vbn_e", False)),
            vbn_affine=bool(mopts.get("vbn_affine", False)),
            layer_n=bool(mopts.get("layer_n", False)),
            layer_n_affine=bool(mopts.get("layer_n_affine", False)),
        ))

        # device-resident features; gts stay host-side for the scorer
        self.train_fc = jnp.asarray(self.data.split_feats("train"))
        self.val_fc = jnp.asarray(self.data.split_feats("val"))
        self.test_fc = jnp.asarray(self.data.split_feats("test"))
        self.train_gts = self.data.split_gts("train")
        self.val_gts = self.data.split_gts("val")
        self.test_gts = self.data.split_gts("test")

        self._train_scorer = None
        self._val_scorer = None
        self._df_cache = copts["input_label_h5"] + ".dfcache.pkl"
        self._val_decode = jax.jit(
            lambda theta, feats: self.model.sample(theta, feats, True)[0]
        )

    # ---- scorers -----------------------------------------------------------------

    @property
    def train_scorer(self) -> CiderScorer:
        """CIDEr-D with DF fitted over the train ground truths — the
        equivalent of the reference's frozen 'coco-train-idxs' table
        (captioning/policies.py:72)."""
        if self._train_scorer is None:
            sc = CiderScorer(variant="cider-d")
            if os.path.isfile(self._df_cache):
                with open(self._df_cache, "rb") as f:
                    sc.df, sc.ref_len = pickle.load(f)
            else:
                logger.info("fitting CIDEr-D DF over %d train images",
                            len(self.train_gts))
                sc.fit_df(self.train_gts)
                try:
                    with open(self._df_cache, "wb") as f:
                        pickle.dump((sc.df, sc.ref_len), f)
                except OSError:
                    pass
            self._train_scorer = sc
        return self._train_scorer

    @property
    def val_scorer(self) -> CiderScorer:
        """Plain CIDEr with corpus DF over the val refs — the metric
        pycocoevalcap computes for eval_split (captioning/eval_utils.py:30-57;
        scored here on token ids, which map 1:1 to words)."""
        if self._val_scorer is None:
            self._val_scorer = CiderScorer(variant="cider").fit_df(self.val_gts)
        return self._val_scorer

    @property
    def train_n(self) -> int:
        return self.data.split_len("train")

    # ---- device rollout -----------------------------------------------------------

    def rollout(self, theta, idx, key=None):
        feats = self.train_fc[idx]
        art = {}
        if self.fitness_kind in GREEDY_KINDS:
            seq, lp = self.model.sample(theta, feats, greedy=True)
        else:
            feats5 = jnp.repeat(feats, self.seq_per_img, axis=0)
            if key is None:
                key = jax.random.key(0)
            seq, lp = self.model.sample(theta, feats5, greedy=False, key=key)
        art["seq"] = seq
        if self.fitness_kind in FITNESS_CRITERIA:
            art["logprob"] = lp
        if self.fitness_kind in SELF_CRITICAL_KINDS:
            art["greedy_seq"] = self.model.sample(theta, feats, greedy=True)[0]
        return art

    # ---- host fitness ---------------------------------------------------------------

    def _member_fitness(self, seq, idx_row, lp=None, greedy_seq=None) -> float:
        spi = seq.shape[0] // len(idx_row)
        gts = [self.train_gts[i] for i in idx_row for _ in range(spi)]
        _, scores = self.train_scorer.score(seq, gts)
        if self.fitness_kind in SELF_CRITICAL_KINDS:
            # greedy baseline: one row per image, broadcast to spi samples
            _, base = self.train_scorer.score(
                greedy_seq, [self.train_gts[i] for i in idx_row]
            )
            scores = scores - np.repeat(base, spi)
        if self.fitness_kind in FITNESS_CRITERIA:
            rewards = np.repeat(scores[:, None], seq.shape[1], axis=1)
            return apply_criterion(self.fitness_kind, lp, seq, rewards)
        return float(scores.mean() * 100.0)

    def host_fitness(self, artifacts, idx):
        seq = np.asarray(artifacts["seq"])
        lead = seq.shape[:-2]
        n_members = int(np.prod(lead))
        seq_f = seq.reshape(n_members, *seq.shape[-2:])
        lp_f = (
            np.asarray(artifacts["logprob"]).reshape(n_members, *seq.shape[-2:])
            if "logprob" in artifacts else [None] * n_members
        )
        g = artifacts.get("greedy_seq")
        g_f = (
            np.asarray(g).reshape(n_members, np.asarray(g).shape[-2], -1)
            if g is not None else [None] * n_members
        )
        idx = np.asarray(idx)
        # idx is (B,) shared, or (lead[0], B): NES members flatten as (F, 2)
        # pairs sharing batch row f = m // 2; ES as (L,) one row each
        per = int(np.prod(lead[1:])) if len(lead) > 1 else 1
        out = np.zeros(n_members, np.float32)
        for m in range(n_members):
            row = idx if idx.ndim == 1 else idx[m // per]
            out[m] = self._member_fitness(seq_f[m], row, lp_f[m], g_f[m])
        return out.reshape(lead)

    # ---- validation ------------------------------------------------------------------

    def _decode_split(self, theta, feats, num: int, bs: int) -> np.ndarray:
        n = feats.shape[0] if num in (-1, None, 0) else min(num, feats.shape[0])
        outs = []
        for s in range(0, n, bs):
            e = min(s + bs, n)
            outs.append(np.asarray(self._val_decode(theta, feats[s:e])))
        return np.concatenate(outs, axis=0)

    def validate(self, theta) -> float:
        bs = self.config.val_batch_size or self.config.batch_size or 64
        num = self.config.num_val_items or -1
        seqs = self._decode_split(theta, self.val_fc, num, bs)
        mean, _ = self.val_scorer.score(seqs, self.val_gts[: len(seqs)])
        return float(mean)

    def test_score(self, theta) -> float:
        bs = self.config.val_batch_size or self.config.batch_size or 64
        seqs = self._decode_split(theta, self.test_fc, -1, bs)
        scorer = CiderScorer(variant="cider").fit_df(self.test_gts)
        mean, _ = scorer.score(seqs, self.test_gts[: len(seqs)])
        return float(mean)

    # ---- sensitivity ---------------------------------------------------------------

    def sensitivity_forward(self, theta, idx):
        """Grouped logprobs after 5 greedy steps (reference:
        captioning/nets.py:22-70; our batches are already image-unique so the
        reference's 5x-dedup is a no-op)."""
        return self.model.forward_for_sensitivity(
            theta, self.train_fc[idx], length=5, split=100
        )
