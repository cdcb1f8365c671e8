"""On-device CIDEr-D: the training-fitness scorer as a pure JAX function.

Replaces the per-generation device->host token transfer + host n-gram scoring
(the two largest non-compute costs of a NES generation measured in
docs/RESULTS.md) with on-chip work, completing the BASELINE.md north-star
constraint that only seeds and scalar fitnesses cross the host boundary.
Reference counterpart: ``CiderD(df='coco-train-idxs').compute_score``
(reference: src/captioning/policies.py:19,72,180); the math is the published
CIDEr-D definition exactly as implemented by the host oracle
(fitness/ciderd.py), which tests compare against.

Design (all shapes static):

* an n-gram (order 1..4) is a **window** of 4 token slots, packed exactly
  into two int32 lanes of 14-bit fields (token+1; 0 = absent slot, which also
  encodes the order) — window equality is two integer compares, no hashing,
  no collisions;
* every caption of length T yields a fixed list of 4T-6 windows with static
  (start, order) metadata; windows that overrun the caption's EOS-inclusive
  length are masked;
* **idf lookup** for candidate windows is a bucketed hash table in HBM: one
  (BUCKET, 3)-int32 row gather per lookup (TPU gathers like wide rows, not
  scalars — a 17-deep linear-probe chain measured 112 ms/wave, the bucketed
  row gather is one memory op), the key compare happens vectorized inside
  the row; the build doubles the bucket count until nothing overflows. Only
  n-grams with df >= 2 are stored: df in {0 (miss), 1} both give
  idf = log(N) - log(1) = ref_len, the miss default;
* per-image reference data (packed ref windows, per-order ref norms,
  EOS-inclusive ref lengths, ref-count mask) is precomputed once on host and
  gathered by image index on device;
* the cross term needs no ref-side idf: with g = tf*idf and idf shared,
  min(g_c, g_r) * g_r = min(tf_c, tf_r) * tf_r * idf^2, and summing over
  windows instead of unique n-grams is corrected by dividing by tf_c.
"""

from __future__ import annotations

import logging

import numpy as np

from ..fitness.ciderd import CiderScorer

logger = logging.getLogger(__name__)

__all__ = ["DeviceCider"]

_SHIFT = 14
_MAX_TOKEN = (1 << _SHIFT) - 2  # token+1 must fit the 14-bit field

# hash-mix constants (uint32 arithmetic, wraps)
_C1, _C2, _C3 = 0x9E3779B1, 0x85EBCA77, 0x2C1B3C6D


def _window_meta(T: int, n_max: int = 4):
    """Static (starts, orders) for all n-gram windows of a length-T row."""
    starts, orders = [], []
    for n in range(1, n_max + 1):
        for i in range(T - n + 1):
            starts.append(i)
            orders.append(n)
    return np.asarray(starts, np.int32), np.asarray(orders, np.int32)


def _pack_np(rows: np.ndarray, lens: np.ndarray, starts, orders):
    """Host packing: rows (N, T) int, lens (N,) -> lo, hi (N, W) int32 and
    valid (N, W) bool. Invalid windows get lo = hi = -1."""
    N, T = rows.shape
    W = starts.shape[0]
    slots = np.zeros((N, W, 4), np.int64)
    for k in range(4):
        pos = np.minimum(starts + k, T - 1)
        tok = rows[:, pos] + 1
        slots[:, :, k] = np.where(k < orders[None, :], tok, 0)
    lo = (slots[:, :, 0] + (slots[:, :, 1] << _SHIFT)).astype(np.int32)
    hi = (slots[:, :, 2] + (slots[:, :, 3] << _SHIFT)).astype(np.int32)
    valid = (starts[None, :] + orders[None, :]) <= lens[:, None]
    lo = np.where(valid, lo, -1)
    hi = np.where(valid, hi, -1)
    return lo, hi, valid


def _lens_np(rows: np.ndarray) -> np.ndarray:
    """EOS-inclusive lengths (cut_at_eos semantics: up to and INCLUDING the
    first 0; full row if no 0)."""
    T = rows.shape[1]
    has0 = (rows == 0).any(axis=1)
    first0 = (rows == 0).argmax(axis=1)
    return np.where(has0, first0 + 1, T).astype(np.int32)


def _hash_np(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    lo = lo.astype(np.uint32)
    hi = hi.astype(np.uint32)
    h = lo * np.uint32(_C1) ^ hi * np.uint32(_C2)
    h ^= h >> np.uint32(15)
    h *= np.uint32(_C3)
    h ^= h >> np.uint32(12)
    return h


def _pack_tuple(g: tuple) -> tuple[int, int]:
    s = [t + 1 for t in g] + [0] * (4 - len(g))
    return s[0] + (s[1] << _SHIFT), s[2] + (s[3] << _SHIFT)


class DeviceCider:
    """Fit once on the per-image ground-truth token lists; ``score_rows`` is
    jax-traceable and returns the same per-caption scores as the host oracle
    (CiderScorer) to f32 accuracy.

    The device tables (idf hash table + per-image ref data, ~110 MB at real
    MSCOCO scale) live in the ``dev`` dict so callers can thread them through
    jit as EXPLICIT OPERANDS (``score_rows(..., dev=tables)``). Closure-
    capturing them instead bakes the bytes into every executable as XLA
    constants AND into the persistent compile-cache key, so any host-side
    table-build change silently recompiles every program embedding them
    (measured: bench warmup 138 s -> 304.8 s when the fused program swallowed
    the tables). Reference behavior matched: one CiderD table built per
    worker and reused forever (src/captioning/policies.py:72)."""

    def __init__(self, gts_list: list, variant: str = "cider-d",
                 n: int = 4, sigma: float = 6.0, frozen_df: tuple | None = None):
        assert variant in ("cider-d", "cider")
        assert n == 4, "window packing is specialized to n_max=4"
        self.variant = variant
        self.sigma = sigma
        self.n = n
        #: device-array pytree (the jit-operand surface); filled by the
        #: builders below
        self.dev: dict = {}

        gts = [np.asarray(g, np.int64) for g in gts_list]
        assert all(g.max(initial=0) <= _MAX_TOKEN for g in gts), \
            "vocab too large for 14-bit window packing"

        # DF over the reference corpus (the host oracle defines the ground
        # truth for both the table and the per-ref norms) — or the user-
        # supplied frozen coco-train-idxs table (fitness/ciderd.py
        # load_df_pickle; absolute parity with the reference's
        # CiderD(df='coco-train-idxs'), src/captioning/policies.py:72)
        if frozen_df is not None:
            scorer = CiderScorer(n=n, sigma=sigma, variant=variant)
            fitted = scorer.set_df(*frozen_df)
        else:
            fitted = CiderScorer(n=n, sigma=sigma, variant=variant).fit_df(gts)
        self.ref_len = float(fitted.ref_len)
        idf_by_key: dict[tuple[int, int], float] = {}
        stored = []
        for order_df in fitted.df:
            for g, df in order_df.items():
                idf = self.ref_len - np.log(max(df, 1.0))
                idf_by_key[_pack_tuple(g)] = idf
                # df in {0 (miss), 1} both give idf == ref_len, the lookup
                # miss default — only df > 1 needs a table slot (frozen
                # tables carry float counts, so the test is > 1.0, not >= 2)
                if df > 1.0:
                    stored.append((*_pack_tuple(g), idf))
        self._build_table(stored)
        self._build_refs(gts, idf_by_key)

    # ---- host-side builders ---------------------------------------------------

    BUCKET = 8  # slots per bucket; one row gather covers the whole bucket

    def _build_table(self, stored: list):
        """Bucketed idf table: key -> bucket by hash, all slots of a bucket
        live in one (BUCKET, 3) int32 row. Bucket count doubles until no
        bucket overflows (starts at ~25% load, so overflow is rare)."""
        n_keys = max(len(stored), 1)
        S = self.BUCKET
        n_buckets = 1 << max(int(np.ceil(np.log2(4 * n_keys / S))), 1)
        if stored:
            arr = np.asarray(stored, np.float64)
            lo = arr[:, 0].astype(np.int64)
            hi = arr[:, 1].astype(np.int64)
            idf = arr[:, 2].astype(np.float32)
            h = _hash_np(lo, hi).astype(np.int64)
            while True:
                bucket = h & (n_buckets - 1)
                if np.bincount(bucket, minlength=n_buckets).max() <= S:
                    break
                # > S keys sharing one exact 32-bit hash can never be
                # separated by more buckets — fail loudly instead of
                # doubling forever (astronomically unlikely on real data)
                if n_buckets > (1 << 28):
                    raise RuntimeError(
                        f"idf bucket table cannot settle: >{S} keys share "
                        "one 32-bit hash; raise DeviceCider.BUCKET"
                    )
                n_buckets *= 2
            table = np.zeros((n_buckets, S, 3), np.int32)  # lo=0 ⇒ empty
            fill = np.zeros(n_buckets, np.int64)
            order = np.argsort(bucket, kind="stable")
            for j in order:
                b = bucket[j]
                table[b, fill[b], 0] = lo[j]
                table[b, fill[b], 1] = hi[j]
                table[b, fill[b], 2] = idf[j : j + 1].view(np.int32)[0]
                fill[b] += 1
        else:
            table = np.zeros((n_buckets, S, 3), np.int32)
        import jax.numpy as jnp

        self._bucket_mask = n_buckets - 1
        # the bucket lives FLAT as one (3*S,)-lane row: gathering a (S, 3)
        # row pulls a whole padded (8, 128) tile per lookup (~4 KB), which
        # measured 23 ms/generation at bench scale — the flat layout keeps
        # the gather to one tile ROW and cuts that to ~8 ms
        self.dev["table"] = jnp.asarray(table.reshape(n_buckets, 3 * S))
        logger.info(
            "device CIDEr idf table: %d keys, %d buckets x %d slots",
            len(stored), n_buckets, S,
        )

    def _build_refs(self, gts: list, idf_by_key: dict):
        n_img = len(gts)
        M = max((g.shape[0] for g in gts), default=1)
        T = max((g.shape[1] for g in gts), default=1)
        self._ref_T = T
        starts, orders = _window_meta(T, self.n)
        W = starts.shape[0]

        rows = np.zeros((n_img, M, T), np.int64)
        ref_mask = np.zeros((n_img, M), bool)
        for i, g in enumerate(gts):
            rows[i, : g.shape[0], : g.shape[1]] = g
            ref_mask[i, : g.shape[0]] = True

        flat = rows.reshape(-1, T)
        lens = _lens_np(flat)
        lo, hi, valid = _pack_np(flat, lens, starts, orders)
        # ref sentinel -3 never collides with candidate invalid (-1)
        lo = np.where(valid, lo, -3)
        hi = np.where(valid, hi, -3)

        # per-ref per-order norms: ||g_n(r)||^2 = sum_j tf_j * idf_j^2 over
        # windows (each unique n-gram counted tf times). idf lookup goes
        # through one int64 key (np.unique on a 1-D array, not axis=0 rows);
        # tf compares run per order and in row chunks — the old dense
        # (N_rows, W, W) boolean cross was ~2e9 elements per temporary at
        # real mscoco scale (~566k ref rows), several GB of host RAM.
        key = (lo.astype(np.int64) << 32) | (
            hi.astype(np.int64) & 0xFFFFFFFF
        )
        uniq, inv = np.unique(key, return_inverse=True)
        # vectorized idf resolve: the per-key Python dict loop cost
        # seconds-to-tens-of-seconds at real MSCOCO scale (millions of
        # unique keys) on this environment's single host core
        if idf_by_key:
            dk = np.fromiter(
                ((np.int64(l) << 32) | (np.int64(h) & 0xFFFFFFFF)
                 for (l, h) in idf_by_key.keys()),
                np.int64, count=len(idf_by_key),
            )
            dv = np.fromiter(idf_by_key.values(), np.float64,
                             count=len(idf_by_key)).astype(np.float32)
            srt = np.argsort(dk)
            dk, dv = dk[srt], dv[srt]
            pos = np.clip(np.searchsorted(dk, uniq), 0, len(dk) - 1)
            uvals = np.where(dk[pos] == uniq, dv[pos],
                             np.float32(self.ref_len))
        else:
            uvals = np.full(len(uniq), self.ref_len, np.float32)
        idf = uvals.astype(np.float32)[inv].reshape(flat.shape[0], W)

        norm2 = np.zeros((flat.shape[0], self.n), np.float32)
        CH = 8192
        off = 0
        for ni in range(1, self.n + 1):
            w = T - ni + 1
            sl = slice(off, off + w)
            off += w
            for s in range(0, flat.shape[0], CH):
                e = min(s + CH, flat.shape[0])
                lo_n, hi_n = lo[s:e, sl], hi[s:e, sl]
                valid_n = valid[s:e, sl]
                tf = (
                    (lo_n[:, :, None] == lo_n[:, None, :])
                    & (hi_n[:, :, None] == hi_n[:, None, :])
                    & valid_n[:, None, :]
                ).sum(axis=2)
                norm2[s:e, ni - 1] = (
                    tf * idf[s:e, sl] ** 2 * valid_n
                ).sum(axis=1)

        import jax.numpy as jnp

        self.dev["ref_lo"] = jnp.asarray(lo.reshape(n_img, M, W))
        self.dev["ref_hi"] = jnp.asarray(hi.reshape(n_img, M, W))
        self.dev["ref_norm"] = jnp.asarray(
            np.sqrt(norm2).reshape(n_img, M, self.n).astype(np.float32)
        )
        self.dev["ref_lens"] = jnp.asarray(
            lens.reshape(n_img, M).astype(np.int32)
        )
        self.dev["ref_mask"] = jnp.asarray(ref_mask)
        self.dev["ref_count"] = jnp.asarray(
            ref_mask.sum(axis=1).astype(np.float32)
        )

    def replicate_device_state(self, place):
        """Re-home the scorer's device tables (multi-host global placement)."""
        self.dev = {k: place(v) for k, v in self.dev.items()}

    # ---- device side -------------------------------------------------------------

    def _idf_lookup(self, lo, hi, table):
        """One bucket-row gather per window; misses resolve to ref_len
        (df < 2). Keys inside a bucket are unique, so the per-slot hit mask
        selects at most one value."""
        import jax
        import jax.numpy as jnp

        h = lo.astype(jnp.uint32) * jnp.uint32(_C1) ^ \
            hi.astype(jnp.uint32) * jnp.uint32(_C2)
        h = h ^ (h >> 15)
        h = h * jnp.uint32(_C3)
        h = h ^ (h >> 12)
        bucket = h.astype(jnp.int32) & self._bucket_mask
        rows = table[bucket].reshape(*bucket.shape, self.BUCKET, 3)
        hit = (rows[..., 0] == lo[..., None]) & (rows[..., 1] == hi[..., None])
        vals = jax.lax.bitcast_convert_type(rows[..., 2], jnp.float32)
        return jnp.where(
            hit.any(-1), (jnp.where(hit, vals, 0.0)).sum(-1), self.ref_len
        )

    def _pack_rows(self, seqs):
        """(R, T) int tokens -> lo, hi (R, W) int32, valid (R, W), lens (R,).
        Invalid windows carry sentinel -1. Window slots come from plain
        slices of the token row (per-element gathers measured 44 ms/wave on
        TPU; slices are free), laid out order-major exactly like
        _window_meta."""
        import jax.numpy as jnp

        T = seqs.shape[-1]
        shifted = seqs.astype(jnp.int32) + 1  # (R, T), values >= 1

        is0 = seqs == 0
        lens = jnp.where(is0.any(-1), jnp.argmax(is0, -1) + 1, T)

        lo_parts, hi_parts, valid_parts = [], [], []
        for n in range(1, self.n + 1):
            w = T - n + 1  # windows of this order, starts 0..w-1
            slot = [
                shifted[..., k : w + k] if k < n
                else jnp.zeros_like(shifted[..., :w])
                for k in range(4)
            ]
            lo_parts.append(slot[0] + (slot[1] << _SHIFT))
            hi_parts.append(slot[2] + (slot[3] << _SHIFT))
            valid_parts.append(
                (jnp.arange(w) + n)[None, :] <= lens[:, None]
            )
        lo = jnp.concatenate(lo_parts, axis=-1)
        hi = jnp.concatenate(hi_parts, axis=-1)
        valid = jnp.concatenate(valid_parts, axis=-1)
        lo = jnp.where(valid, lo, -1)
        hi = jnp.where(valid, hi, -1)
        return lo, hi, valid, lens

    def score_rows(self, seqs, img_ids, dev: dict | None = None):
        """jax-traceable. seqs (R, T) int tokens, img_ids (R,) int indices
        into the fitted image list -> (R,) f32 CIDEr[-D] scores (x10 scale,
        same as the host scorer). Pass ``dev`` (this scorer's table pytree,
        threaded through jit as an operand) on any compiled hot path —
        falling back to ``self.dev`` closure-captures ~110 MB of tables as
        executable constants (see class docstring)."""
        import jax.numpy as jnp

        if dev is None:
            dev = self.dev
        lo, hi, valid, lens = self._pack_rows(seqs)
        idf = jnp.where(valid, self._idf_lookup(lo, hi, dev["table"]), 0.0)
        idf2 = idf * idf

        rlo = dev["ref_lo"][img_ids]
        rhi = dev["ref_hi"][img_ids]

        # windows of different orders can never be equal (the zero-slot
        # pattern encodes the order), so the tf compares run per order on
        # the order-major window layout — 4x fewer pairs than the full
        # W x W / W x W_ref cross
        T = seqs.shape[-1]
        Tr = self._ref_T
        num_parts, normc_parts = [], []
        off_c = off_r = 0
        for n in range(1, self.n + 1):
            wc, wr = T - n + 1, Tr - n + 1
            lo_n = lo[:, off_c : off_c + wc]
            hi_n = hi[:, off_c : off_c + wc]
            valid_n = valid[:, off_c : off_c + wc]
            idf2_n = idf2[:, off_c : off_c + wc]
            rlo_n = rlo[:, :, off_r : off_r + wr]
            rhi_n = rhi[:, :, off_r : off_r + wr]
            off_c += wc
            off_r += wr

            # candidate tf: same-window counts within the caption
            eq_cc = (lo_n[:, :, None] == lo_n[:, None, :]) & \
                    (hi_n[:, :, None] == hi_n[:, None, :]) & \
                    valid_n[:, None, :]
            tf_c = jnp.maximum(eq_cc.sum(-1), 1).astype(jnp.float32)

            # ref-side tf for each candidate window: (R, wc, M)
            tf_r = (
                (lo_n[:, :, None, None] == rlo_n[:, None, :, :])
                & (hi_n[:, :, None, None] == rhi_n[:, None, :, :])
            ).sum(-1).astype(jnp.float32)

            if self.variant == "cider-d":
                cross = jnp.minimum(tf_c[:, :, None], tf_r) * tf_r
            else:
                cross = tf_c[:, :, None] * tf_r
            # (R, M): summing windows instead of unique n-grams is
            # corrected by /tf_c
            num_parts.append((cross * (idf2_n / tf_c)[:, :, None]).sum(1))
            normc_parts.append((tf_c * idf2_n * valid_n).sum(-1))

        num = jnp.stack(num_parts, axis=1)  # (R, 4, M)
        norm_c = jnp.sqrt(jnp.stack(normc_parts, axis=1))  # (R, 4)
        norm_r = dev["ref_norm"][img_ids]  # (R, M, 4)
        denom = norm_c[:, :, None] * norm_r.swapaxes(1, 2)
        sim = jnp.where(denom > 0, num / jnp.maximum(denom, 1e-30), 0.0)

        if self.variant == "cider-d":
            dlen = (lens[:, None] - dev["ref_lens"][img_ids]).astype(
                jnp.float32
            )
            pen = jnp.exp(-(dlen * dlen) / (2.0 * self.sigma**2))
            sim = sim * pen[:, None, :]

        sim = sim * dev["ref_mask"][img_ids][:, None, :]
        per_order = sim.sum(-1) / dev["ref_count"][img_ids][:, None]
        return 10.0 * per_order.mean(-1)
