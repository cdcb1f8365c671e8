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

import jax
import jax.numpy as jnp
import numpy as np

from .base import Task
from ..data.mscoco import CocoData
from ..fitness.criteria import FITNESS_CRITERIA, apply_criterion
from ..fitness.scorer import IndexedCiderScorer
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

        # optional frozen DF table for absolute training-fitness parity with
        # the reference's CiderD(df='coco-train-idxs')
        # (src/captioning/policies.py:72): caption_options.cider_df points
        # at the cider submodule's pickled table (fitness/ciderd.py
        # load_df_pickle documents the format). Unset -> DF rebuilt from the
        # train ground truths (rank-equivalent, constant idf-scale offset).
        self._frozen_df = None
        if copts.get("cider_df"):
            from ..fitness.ciderd import load_df_pickle

            self._frozen_df = load_df_pickle(copts["cider_df"])
            logger.info(
                "loaded frozen CIDEr-D DF table %s (%d n-grams, ref_len "
                "%.4f) — absolute fitness parity with the reference",
                copts["cider_df"],
                sum(len(d) for d in self._frozen_df[0]),
                self._frozen_df[1],
            )

        self._train_scorer = None
        self._val_scorer = None
        # predictions artifact destination (reference: the eval dir each
        # worker derives from log_dir); absent when the task is constructed
        # without a run (bench, unit tests)
        self._eval_dir = (
            os.path.join(exp["log_dir"], "eval") if exp.get("log_dir") else None
        )
        self._val_decode = jax.jit(
            lambda theta, feats: self._greedy(theta, feats,
                                              need_logprobs=False)[0]
        )

        # fused Pallas decode path: TPU-only, greedy, no norm layers
        o = self.model.options
        want = getattr(tpu_cfg, "fused_decode", "auto")
        can_fuse = (
            not (o.vbn or o.vbn_e or o.layer_n)
            and jax.default_backend() == "tpu"
        )
        self._fused = can_fuse if want == "auto" else bool(want)
        self._fused_interpret = False  # tests flip this to run the kernel on CPU
        self._decode_dtype = (
            jnp.bfloat16 if tpu_cfg.precision == "bf16" else jnp.float32
        )
        self._wire_dtype = (
            jnp.int16 if self.data.vocab_size < 32767 else jnp.int32
        )
        self._sens_split = getattr(tpu_cfg, "sensitivity_split", 100) or 100
        self._vocab_tile = int(getattr(tpu_cfg, "decode_vocab_tile", 0) or 0)

        # on-chip CIDEr-D fitness (ops/cider_device.py): eliminates the
        # per-generation token transfer + host scoring — only the (F, 2)
        # fitness scalars cross the host boundary (BASELINE.md constraint).
        # All 8 fitness kinds qualify: the per-token criteria variants
        # compute their masked reductions on device too
        # (fitness/criteria.py:criterion_device), so the logprob tensor
        # never leaves the chip either.
        want_dc = getattr(tpu_cfg, "device_cider", "auto")
        can_dc = (
            (self.fitness_kind in ("greedy", "sample", "self_critical")
             or self.fitness_kind in FITNESS_CRITERIA)
            and self.data.vocab_size + 1 < (1 << 14)
        )
        use_dc = can_dc if want_dc == "auto" else (bool(want_dc) and can_dc)
        self._device_cider = None
        if use_dc:
            from ..ops.cider_device import DeviceCider

            logger.info("building on-device CIDEr-D scorer "
                        "(%d train images)", len(self.train_gts))
            self._device_cider = DeviceCider(
                self.train_gts, variant="cider-d", frozen_df=self._frozen_df
            )

        # decode-ordered layout: lets the NES engine move the per-member
        # transpose/pad work off the eval hot path (ops/decode_layout.py);
        # only meaningful with the fused kernel + on-device fitness
        self.decode_layout = None
        if self._fused and self._device_cider is not None:
            from ..ops.decode_layout import DecodeLayout

            self.decode_layout = DecodeLayout(self.spec, self.model.options)

    @property
    def fitness_on_device(self) -> bool:
        return self._device_cider is not None

    def device_consts(self) -> dict:
        c = {"train_fc": self.train_fc}
        if self._device_cider is not None:
            c["cider"] = self._device_cider.dev
        return c

    def _replicate_device_state(self, place):
        self.train_fc = place(self.train_fc)
        self.val_fc = place(self.val_fc)
        self.test_fc = place(self.test_fc)
        if self._device_cider is not None:
            self._device_cider.replicate_device_state(place)
        if getattr(self, "_val_dev_cache", None) is not None:
            self._val_dev_cache = jax.tree_util.tree_map(
                place, self._val_dev_cache
            )
        # device_val_consts builds lazily (often AFTER this runs, e.g. on
        # the first _fused_capable check) — remember the placement so the
        # late build lands as mesh-global arrays too, not process-local
        # ones mixed into a multi-controller jit
        self._place_fn = place

    # ---- scorers -----------------------------------------------------------------

    @property
    def train_scorer(self) -> IndexedCiderScorer:
        """CIDEr-D with DF fitted over the train ground truths — the
        equivalent of the reference's frozen 'coco-train-idxs' table
        (captioning/policies.py:72). Native C++ core when available."""
        if self._train_scorer is None:
            logger.info("fitting CIDEr-D DF over %d train images",
                        len(self.train_gts))
            self._train_scorer = IndexedCiderScorer(
                self.train_gts, variant="cider-d", frozen_df=self._frozen_df
            )
        return self._train_scorer

    @property
    def val_scorer(self) -> IndexedCiderScorer:
        """Plain CIDEr with corpus DF over the val refs, scored at the WORD
        level (token ids remapped so duplicate word strings collapse, exactly
        what pycocoevalcap's string scoring does) — the metric the reference
        reports for eval_split (captioning/eval_utils.py:30-57)."""
        if self._val_scorer is None:
            self._val_scorer = IndexedCiderScorer(
                self.data.split_gts_words("val"), variant="cider"
            )
        return self._val_scorer

    @property
    def train_n(self) -> int:
        return self.data.split_len("train")

    # ---- device rollout -----------------------------------------------------------

    def _fused_params(self, theta):
        from ..ops.decode_pallas import prepare_decode_params

        return prepare_decode_params(
            self.spec, theta, self.model.options, dtype=self._decode_dtype
        )

    def _greedy(self, theta, feats, need_logprobs: bool = True):
        if self._fused:
            from ..ops.decode_pallas import decode_fused

            return decode_fused(
                self._fused_params(theta), feats,
                seq_length=self.model.options.seq_length,
                need_logprobs=need_logprobs,
                interpret=self._fused_interpret,
                vocab_tile=self._vocab_tile,
            )
        return self.model.sample(theta, feats, greedy=True)

    def _sample_decode_kwargs(self, s, B: int) -> dict:
        """Sampling-decode kwargs from a per-lane seed. On TPU the kernel
        seeds its on-chip PRNG; in interpret mode (tests — the prng
        primitives have no CPU lowering) a host-derived Gumbel table keyed
        by the same seed stands in. Token streams differ between the two
        RNGs (both are exact categorical samplers)."""
        if not self._fused_interpret:
            return {"seed": s.astype(jnp.int32)}
        from ..ops.decode_pallas import pad_vocab

        T = self.model.options.seq_length
        g = jax.random.gumbel(
            jax.random.fold_in(jax.random.PRNGKey(0), s.astype(jnp.uint32)),
            (T, B, pad_vocab(self.data.vocab_size + 1)),
        )
        return {"host_rng": True, "gumbel": g}

    def _sampled(self, theta, feats, key, need_logprobs: bool = True):
        """seq_per_img independent multinomial samples per image, rows
        image-major like the reference's repeat(feats, 5, axis=0) layout."""
        spi = self.seq_per_img
        if self._fused:
            from ..ops.decode_pallas import decode_fused

            params = self._fused_params(theta)
            seeds = jax.vmap(
                lambda i: jax.random.bits(jax.random.fold_in(key, i))
            )(jnp.arange(spi))

            def one(s):
                # one kernel call per sample lane keeps the (B, Vpad)
                # transients inside the VMEM budget
                return decode_fused(
                    params, feats, greedy=False,
                    seq_length=self.model.options.seq_length,
                    need_logprobs=need_logprobs,
                    interpret=self._fused_interpret,
                    **self._sample_decode_kwargs(s, feats.shape[0]),
                )

            seq, lp = jax.lax.map(one, seeds)  # (spi, B, T)
            B = feats.shape[0]
            T = seq.shape[-1]
            return (
                jnp.swapaxes(seq, 0, 1).reshape(B * spi, T),
                jnp.swapaxes(lp, 0, 1).reshape(B * spi, T),
            )
        feats5 = jnp.repeat(feats, spi, axis=0)
        return self.model.sample(theta, feats5, greedy=False, key=key)

    def rollout(self, theta, idx, key=None, consts=None):
        train_fc = self.train_fc if consts is None else consts["train_fc"]
        cdev = None if consts is None else consts.get("cider")
        feats = train_fc[idx]
        art = {}
        # logprobs are consumed only by the per-token criteria variants —
        # plain greedy/sample/self_critical fitness skips the per-step
        # log-softmax reductions entirely
        need_lp = self.fitness_kind in FITNESS_CRITERIA
        if self.fitness_kind in GREEDY_KINDS:
            seq, lp = self._greedy(theta, feats, need_logprobs=need_lp)
        else:
            if key is None:
                key = jax.random.key(0)
            seq, lp = self._sampled(theta, feats, key, need_logprobs=need_lp)
        if self._device_cider is not None:
            return {"fitness": self._device_fitness(
                theta, feats, idx, seq, lp=lp if need_lp else None, dev=cdev)}
        # int16 tokens when the vocab allows: the device->host hop can run
        # over a slow tunnel (~25 MB/s measured here), so halving the payload
        # is ~47 ms per generation at bench scale
        art["seq"] = seq.astype(self._wire_dtype)
        if self.fitness_kind in FITNESS_CRITERIA:
            art["logprob"] = lp
        if self.fitness_kind in SELF_CRITICAL_KINDS:
            art["greedy_seq"] = self._greedy(theta, feats)[0].astype(
                self._wire_dtype
            )
        return art

    @property
    def supports_pair_perturb(self) -> bool:
        """Gate for the in-kernel-perturbation pair rollout
        (tpu.kernel_perturb): needs the fused kernel + decode layout +
        on-device scoring, a greedy fitness kind (sampling kinds draw
        per-lane decode seeds the pair kernel does not thread), and the
        untiled logit pass."""
        return (
            self._fused
            and self.decode_layout is not None
            and self._device_cider is not None
            and self.fitness_kind in GREEDY_KINDS
            and not self._vocab_tile
        )

    @property
    def supports_kernel_noise(self) -> bool:
        """Gate for in-kernel noise generation (tpu.kernel_noise): the pair
        kernel's delta comes from the on-chip hardware PRNG, which has no
        interpret/CPU lowering — so this needs everything the pair kernel
        needs PLUS a real TPU backend (tests run the delta-operand form).
        The backend check matters independently of ``_fused_interpret``:
        CPU tests force ``fused_decode`` on and flip ``_fused_interpret``
        only AFTER constructing masters/engines (e.g. tests/test_anneal_e2e),
        so an interpret-flag-only gate would resolve True at engine init and
        then fail to lower. Engines also re-read this property at trace
        time (nes.py:_generation_fn) as a second guard."""
        return (self.supports_pair_perturb
                and not self._fused_interpret
                and jax.default_backend() == "tpu")

    def pair_base_params(self, base_dec) -> dict:
        """Decode-ordered flat base theta -> f32 params dict for
        decode_pair_perturb — computed ONCE per generation (member-
        independent), where the per-member path pays a prep per rollout.
        Also shapes the noise-scale vector for the kernel-noise path (the
        same slice/reshape, f32)."""
        return self.decode_layout.prep(base_dec, jnp.float32)

    def rollout_pair_rng(self, base_params: dict, scale_params: dict, seed,
                         idx, consts=None):
        """rollout_pair_dec with the delta GENERATED in-kernel from the
        pair's seed (ops/decode_pallas.py:decode_pair_rng): only the uint32
        seed crosses into the kernel; the ~11.5 MB delta never exists in
        HBM. Token-bitwise-equal to rollout_pair_dec fed the same realized
        delta (chip-verified, scripts/exp_kernel_noise.py). Returns the (2,)
        [pos, neg] fitness vector."""
        from ..ops.decode_pallas import decode_pair_rng

        train_fc = self.train_fc if consts is None else consts["train_fc"]
        cdev = None if consts is None else consts.get("cider")
        feats = train_fc[idx]
        need_lp = self.fitness_kind in FITNESS_CRITERIA
        seq2, lp2 = decode_pair_rng(
            base_params, scale_params, seed, feats,
            seq_length=self.model.options.seq_length,
            dtype=self._decode_dtype, need_logprobs=need_lp,
        )
        return jnp.stack([
            self._device_fitness(None, feats, idx, seq2[s],
                                 lp=lp2[s] if need_lp else None, dev=cdev)
            for s in range(2)
        ])

    def rollout_pair_dec(self, base_params: dict, delta_dec, idx,
                         consts=None):
        """Both rollouts of one antithetic pair in ONE kernel call with the
        perturbation applied in-kernel (ops/decode_pallas.py:_pair_kernel):
        no perturbed parameter vector ever materializes in HBM. Token-exact
        vs rollout_dec(base_vec ± delta) (tested). Returns the (2,) [pos,
        neg] fitness vector."""
        from ..ops.decode_pallas import decode_pair_perturb

        train_fc = self.train_fc if consts is None else consts["train_fc"]
        cdev = None if consts is None else consts.get("cider")
        feats = train_fc[idx]
        need_lp = self.fitness_kind in FITNESS_CRITERIA
        seq2, lp2 = decode_pair_perturb(
            # prep in the delta's OWN dtype (tpu.delta_dtype): a bf16 delta
            # stays bf16 through the kernel operands (half the HBM read),
            # and the kernel's f32 + bf16 promotion reproduces the
            # per-member path's base+delta sum exactly
            base_params, self.decode_layout.prep(delta_dec, delta_dec.dtype),
            feats, seq_length=self.model.options.seq_length,
            dtype=self._decode_dtype, interpret=self._fused_interpret,
            need_logprobs=need_lp,
        )
        return jnp.stack([
            self._device_fitness(None, feats, idx, seq2[s],
                                 lp=lp2[s] if need_lp else None, dev=cdev)
            for s in range(2)
        ])

    def rollout_dec(self, vec_dec, idx, key=None, consts=None):
        """Rollout on a decode-ordered member vector (the NES engine's
        layout fast path, ops/decode_layout.py): the per-member prep is
        slice/reshape/cast only — the transposes were paid once per
        generation by DecodeLayout.to_dec. Reachable for every
        device-scored kind (all 8 fitness variants)."""
        from ..ops.decode_pallas import decode_fused

        train_fc = self.train_fc if consts is None else consts["train_fc"]
        cdev = None if consts is None else consts.get("cider")
        params = self.decode_layout.prep(vec_dec, self._decode_dtype)
        feats = train_fc[idx]
        T = self.model.options.seq_length
        need_lp = self.fitness_kind in FITNESS_CRITERIA

        def greedy(need_logprobs=False):
            return decode_fused(params, feats, seq_length=T,
                                need_logprobs=need_logprobs,
                                interpret=self._fused_interpret,
                                vocab_tile=self._vocab_tile)

        if self.fitness_kind in GREEDY_KINDS:
            seq, lp = greedy(need_lp)
        else:
            if key is None:
                key = jax.random.key(0)
            spi = self.seq_per_img
            seeds = jax.vmap(
                lambda i: jax.random.bits(jax.random.fold_in(key, i))
            )(jnp.arange(spi))
            seq, lp = jax.lax.map(
                lambda s: decode_fused(
                    params, feats, greedy=False,
                    seq_length=T, need_logprobs=need_lp,
                    interpret=self._fused_interpret,
                    **self._sample_decode_kwargs(s, feats.shape[0]),
                ),
                seeds,
            )  # (spi, B, T)
            B = feats.shape[0]
            seq = jnp.swapaxes(seq, 0, 1).reshape(B * spi, seq.shape[-1])
            if need_lp:
                lp = jnp.swapaxes(lp, 0, 1).reshape(B * spi, lp.shape[-1])

        B = idx.shape[0]
        spi = seq.shape[0] // B
        img = idx if spi == 1 else jnp.repeat(idx, spi)
        scores = self._device_cider.score_rows(seq.astype(jnp.int32), img,
                                               dev=cdev)
        if self.fitness_kind in SELF_CRITICAL_KINDS:
            base = self._device_cider.score_rows(
                greedy()[0].astype(jnp.int32), idx, dev=cdev
            )
            scores = scores - jnp.repeat(base, spi)
        if self.fitness_kind in FITNESS_CRITERIA:
            from ..fitness.criteria import criterion_device

            return {"fitness": criterion_device(self.fitness_kind, lp, seq,
                                                scores[:, None])}
        return {"fitness": scores.mean() * 100.0}

    def _device_fitness(self, theta, feats, idx, seq, lp=None, dev=None):
        """On-chip fitness for every kind: scores every decoded row with
        the device CIDEr-D scorer, then mean * 100 per member, or the
        per-token criterion when one is selected (self_critical/sc_loss
        subtract the greedy-baseline score per image first; reference:
        captioning/policies.py:119-126,164-191)."""
        B = idx.shape[0]
        spi = seq.shape[0] // B
        img = idx if spi == 1 else jnp.repeat(idx, spi)
        scores = self._device_cider.score_rows(seq.astype(jnp.int32), img,
                                               dev=dev)
        if self.fitness_kind in SELF_CRITICAL_KINDS:
            base_seq = self._greedy(theta, feats, need_logprobs=False)[0]
            base = self._device_cider.score_rows(base_seq.astype(jnp.int32),
                                                 idx, dev=dev)
            scores = scores - jnp.repeat(base, spi)
        if self.fitness_kind in FITNESS_CRITERIA:
            from ..fitness.criteria import criterion_device

            # per-row reward broadcast over the token axis (the host path's
            # np.repeat(scores, T)); criterion output is NOT 100-scaled
            return criterion_device(self.fitness_kind, lp, seq,
                                    scores[:, None])
        return scores.mean() * 100.0

    # ---- host fitness ---------------------------------------------------------------

    def _score_dedup(self, cands: np.ndarray, img_idx: np.ndarray) -> np.ndarray:
        """Score unique (caption, image) pairs only, then scatter back —
        nearby thetas frequently greedy-decode identical captions for the
        same image, so this cuts the host CIDEr work substantially at no
        change in results."""
        # 64-bit multiplicative hash of (caption tokens, image): unique on a
        # 1-D int key is ~ms; collisions are ~1e-12 at this scale
        key = np.concatenate(
            [np.ascontiguousarray(cands, np.int64),
             img_idx[:, None].astype(np.int64)], axis=1
        )
        mult = np.array(
            [(0x9E3779B97F4A7C15 * (i + 1)) % (1 << 64)
             for i in range(key.shape[1])],
            dtype=np.uint64,
        ).view(np.int64)
        with np.errstate(over="ignore"):
            hashes = (key * mult).sum(axis=1)
        _, first, inverse = np.unique(hashes, return_index=True,
                                      return_inverse=True)
        if len(first) >= 0.9 * len(hashes):  # few dupes: skip the indirection
            _, scores = self.train_scorer.score(cands, img_idx)
            return scores
        _, uscores = self.train_scorer.score(cands[first], img_idx[first])
        return uscores[inverse]

    def host_fitness(self, artifacts, idx):
        """All members scored in ONE native-scorer call (the per-generation
        host hot path — SURVEY.md §7.3), then reduced per member. With the
        on-device scorer active the fitness already exists: just pull it."""
        if "fitness" in artifacts:
            return np.asarray(artifacts["fitness"], np.float32)
        seq = np.asarray(artifacts["seq"])
        lead = seq.shape[:-2]
        n_members = int(np.prod(lead))
        R, T = seq.shape[-2:]
        seq_f = seq.reshape(n_members, R, T)

        # image index for every decoded row of every member
        idx = np.asarray(idx)
        if idx.ndim == 1:
            rows = np.broadcast_to(idx, (n_members, idx.shape[0]))
        else:
            # NES members flatten as (F, 2) pairs sharing batch row m // 2
            per = int(np.prod(lead[1:])) if len(lead) > 1 else 1
            rows = np.repeat(idx, per, axis=0)
        B = rows.shape[1]
        spi = R // B
        img_idx = np.repeat(rows, spi, axis=1)  # (n_members, R)

        scores = self._score_dedup(
            seq_f.reshape(-1, T), img_idx.reshape(-1)
        ).reshape(n_members, R)

        if self.fitness_kind in SELF_CRITICAL_KINDS:
            # greedy baseline: one row per image, broadcast to spi samples
            g = np.asarray(artifacts["greedy_seq"]).reshape(n_members, B, T)
            _, base = self.train_scorer.score(
                g.reshape(-1, T), rows.reshape(-1)
            )
            scores = scores - np.repeat(base.reshape(n_members, B), spi, axis=1)

        if self.fitness_kind in FITNESS_CRITERIA:
            lp = np.asarray(artifacts["logprob"]).reshape(n_members, R, T)
            rewards = np.repeat(scores[:, :, None], T, axis=2)
            out = np.asarray([
                apply_criterion(self.fitness_kind, lp[m], seq_f[m], rewards[m])
                for m in range(n_members)
            ], dtype=np.float32)
        else:
            out = (scores.mean(axis=1) * 100.0).astype(np.float32)
        return out.reshape(lead)

    # ---- validation ------------------------------------------------------------------

    def _decode_split(self, theta, feats, num: int, bs: int) -> np.ndarray:
        """Greedy-decode a split in fixed-size chunks (fused kernel when
        enabled). The ragged tail is padded to the chunk size and sliced
        back — greedy rows are independent, and one batch shape means one
        compiled program instead of two."""
        n = feats.shape[0] if num in (-1, None, 0) else min(num, feats.shape[0])
        bs = min(bs, n)
        outs = []
        for s in range(0, n, bs):
            e = min(s + bs, n)
            chunk = feats[s:e]
            if e - s < bs:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((bs - (e - s), chunk.shape[1]),
                                      chunk.dtype)], axis=0
                )
            outs.append(np.asarray(self._val_decode(theta, chunk))[: e - s])
        return np.concatenate(outs, axis=0)

    def _write_predictions(self, seqs: np.ndarray, split: str):
        """Reference-shaped predictions artifact: eval_cache_{split}.json =
        [{"image_id", "caption"}, ...] in the run's eval dir (reference:
        src/captioning/eval_utils.py:37-46 writes exactly this before
        handing it to COCOEvalCap)."""
        if not self._eval_dir:
            return
        import json

        from ..utils.files import mkdir_p

        ids = self.data.split_image_ids(split)
        preds = [
            {"image_id": ids[i], "caption": cap}
            for i, cap in enumerate(self.data.decode_sequence(seqs))
        ]
        path = os.path.join(mkdir_p(self._eval_dir),
                            f"eval_cache_{split}.json")
        with open(path, "w") as f:
            json.dump(preds, f)

    def validate(self, theta) -> float:
        bs = self.config.val_batch_size or self.config.batch_size or 64
        num = self.config.num_val_items or -1
        seqs = self._decode_split(theta, self.val_fc, num, bs)
        self._write_predictions(seqs, "val")
        mean, _ = self.val_scorer.score(
            self.data.word_id_rows(seqs), np.arange(len(seqs))
        )
        return float(mean)

    def device_val_consts(self) -> dict | None:
        """Device arrays for in-program validation: the val-subset features
        pre-chunked at val_batch_size, the token->word-id table laid out for
        a row-gather lookup, and a word-level plain-CIDEr DeviceCider over
        the val refs — the same subset/scorer semantics as validate()
        (oracle path: data.word_id_rows + val_scorer). Built once; None when
        the on-device scorer family is unavailable (host-scored fitness
        kinds, oversized vocab)."""
        if self._device_cider is None:
            return None
        if getattr(self, "_val_dev_cache", None) is None:
            from ..ops.cider_device import DeviceCider

            num = self.config.num_val_items or -1
            val_n = self.val_fc.shape[0]
            n = val_n if num in (-1, 0, None) else min(num, val_n)
            bs = min(self.config.val_batch_size or self.config.batch_size
                     or 64, n)
            n_chunks = -(-n // bs)
            pad = n_chunks * bs - n
            if getattr(self, "_place_fn", None) is not None:
                # multi-controller: val_fc is a mesh-global array — eager
                # slicing/concat against local zeros mixes address spaces;
                # assemble on host (replicated = full copy per process)
                # and re-place below with the rest of the cache
                feats = np.asarray(self.val_fc)[:n]
                if pad:
                    feats = np.concatenate(
                        [feats, np.zeros((pad, feats.shape[1]), feats.dtype)]
                    )  # stays host-side; the tree_map below places it
            else:
                feats = self.val_fc[:n]
                if pad:
                    feats = jnp.concatenate(
                        [feats, jnp.zeros((pad, feats.shape[1]), feats.dtype)]
                    )
            self._val_n, self._val_bs = n, bs
            logger.info("building on-device val CIDEr scorer (%d images)", n)
            self._val_device_cider = DeviceCider(
                self.data.split_gts_words("val"), variant="cider"
            )
            # word table as (rows, 128): the lookup gathers a 512-byte row
            # per token then selects the lane — TPU gathers like rows, a
            # scalar-element gather of the flat table lowers poorly
            flat = np.asarray(
                self.data.word_id_rows(np.arange(self.data.vocab_size + 1))
            ).astype(np.int32)
            wpad = -(-flat.shape[0] // 128) * 128
            table2d = np.zeros((wpad // 128, 128), np.int32)
            table2d.reshape(-1)[: flat.shape[0]] = flat
            self._val_dev_cache = {
                "feats": feats.reshape(n_chunks, bs, feats.shape[1]),
                "word": jnp.asarray(table2d),
                "cider": self._val_device_cider.dev,
            }
            # multi-controller: a placement was installed before this lazy
            # build — re-place so every leaf is a mesh-global array (mixed
            # local/global operands fail at the first fused dispatch)
            place = getattr(self, "_place_fn", None)
            if place is not None:
                # the cache's "cider" leaves are the only copy
                # validate_device reads (it always scores via
                # vconsts["cider"]), so the DeviceCider's own .dev needs no
                # second placement
                self._val_dev_cache = jax.tree_util.tree_map(
                    place, self._val_dev_cache
                )
        return self._val_dev_cache

    def validate_device(self, theta, vconsts):
        """Traced validate(): chunked greedy decode of the val subset +
        word-level plain CIDEr on device. Matches validate() to f32 accuracy
        (tested); skips the predictions-JSON artifact (host-only side
        effect)."""
        params = self._fused_params(theta) if self._fused else None
        T = self.model.options.seq_length

        def chunk(f):
            if self._fused:
                from ..ops.decode_pallas import decode_fused

                return decode_fused(params, f, seq_length=T,
                                    need_logprobs=False,
                                    interpret=self._fused_interpret,
                                    vocab_tile=self._vocab_tile)[0]
            return self.model.sample(theta, f, greedy=True)[0]

        seqs = jax.lax.map(chunk, vconsts["feats"])  # (K, bs, T)
        seqs = seqs.reshape(-1, T)[: self._val_n].astype(jnp.int32)
        seqs = jnp.clip(seqs, 0, self.data.vocab_size)
        # row-gather + lane-select word mapping (see device_val_consts)
        rows = vconsts["word"][seqs // 128]              # (n, T, 128)
        lane = jax.nn.one_hot(seqs % 128, 128, dtype=jnp.int32)
        wids = (rows * lane).sum(-1)
        scores = self._val_device_cider.score_rows(
            wids, jnp.arange(self._val_n), dev=vconsts["cider"]
        )
        return scores.mean()

    def test_score(self, theta) -> float:
        bs = self.config.val_batch_size or self.config.batch_size or 64
        seqs = self._decode_split(theta, self.test_fc, -1, bs)
        self._write_predictions(seqs, "test")
        scorer = IndexedCiderScorer(
            self.data.split_gts_words("test"), variant="cider"
        )
        mean, _ = scorer.score(
            self.data.word_id_rows(seqs), np.arange(len(seqs))
        )
        return float(mean)

    # ---- sensitivity ---------------------------------------------------------------

    def sensitivity_forward(self, theta, idx, consts=None):
        """Grouped logprobs after 5 greedy steps (reference:
        captioning/nets.py:22-70; our batches are already image-unique so the
        reference's 5x-dedup is a no-op). ``tpu.sensitivity_split`` widens
        the vocab grouping (reference value 100); each group is one VJP row
        of the SM-G Jacobian."""
        train_fc = self.train_fc if consts is None else consts["train_fc"]
        return self.model.forward_for_sensitivity(
            theta, train_fc[idx], length=5, split=self._sens_split
        )
