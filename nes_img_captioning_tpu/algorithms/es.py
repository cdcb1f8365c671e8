"""NIC-ES: truncation-selection genetic algorithm as a single SPMD program.

Reference behavior (src/algorithm/nic_es/): a population of parents produces
``nb_offspring`` children per generation by Gaussian mutation (parent chosen
uniformly or by tournament = min index of k sampled, since parents are sorted
best-first); children are fitness-scored on the generation's minibatch; the
top (population_size - num_elites) children become the next parents with the
podium's best elites prepended; the top num_elite_cands children are
validation-scored during the next generation and the best becomes the
representative model; sigma/batch-size anneal on patience or schedule.

TPU-native execution: parents live as a (P, dim) device matrix; offspring
exist only as (parent_index, uint32 seed) pairs — each child's theta is
regenerated on device whenever needed (fitness sweep, then re-materialization
of the few winners), eliminating the reference's ~11 MB-per-offspring .pth
files on a shared filesystem (README.md:389-391) entirely. The fitness sweep
is lax.map waves of a mesh-sharded vmap, exactly like the NES engine.
Generation 0 children are fresh random inits (parents "None" — reference:
src/algorithm/nic_es/iteration.py:50-61).
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .engine_base import PopulationEngine
from .experiment import ESExperiment
from .iteration import Iteration
from .nes import setup_log_dir
from .snapshot import save_snapshot
from .statistics import Statistics
from ..ops.mutation import MutationKind, gaussian_noise, shape_noise
from ..ops.sensitivity import resolve_probes
from ..parallel.mesh import make_mesh, pop_axis_size, shard_population
from ..parallel.transfer import pull_chunked
from ..utils.config import parse_config, parse_tpu_config
from ..utils.files import remove_all_files_but

logger = logging.getLogger(__name__)

__all__ = ["ESEngine", "ESMaster"]


def podium_merge(e_rows, e_scores, c_rows, c_scores):
    """Device-side scoreboard merge with ``Podium.record_elites``' exact
    semantics: one stable descending sort over incumbents-then-candidates,
    so ties keep the incumbent (a tie never counts as an improvement) and
    equal-scored candidates enter in their published order. Rows are
    selected by one-hot matmul at HIGHEST precision (bit-exact row select,
    see ESEngine._select_row). Unit-pinned against the host Podium in
    tests/test_fused_es.py."""
    E = e_rows.shape[0]
    scores = jnp.concatenate([e_scores, c_scores])
    top = jnp.argsort(-scores, stable=True)[:E]
    pool = jnp.concatenate([e_rows, c_rows], axis=0)
    sel = jax.nn.one_hot(top, pool.shape[0], dtype=pool.dtype)
    merged = jnp.matmul(sel, pool, precision=jax.lax.Precision.HIGHEST)
    return merged, scores[top]


class ESEngine(PopulationEngine):
    def __init__(self, task, mutation: MutationKind, mesh=None,
                 pop_chunk: int = 0, rng_impl: str = "",
                 sens_underflow: float = 0.01,
                 sens_precision: str = "float32",
                 sens_probes: int = 0,
                 use_layout: bool = False):
        super().__init__(task, mesh=mesh, pop_chunk=pop_chunk,
                         rng_impl=rng_impl)
        self.mutation = mutation
        # decode-ordered sweep (tpu.es_decode_layout, ops/decode_layout.py):
        # children are built and rolled out in the fused kernel's own
        # parameter layout — the per-offspring prep becomes one elementwise
        # pass (the NES engine's round-2 treatment); winners come back to
        # torch order through the exact linear from_dec. Noise is drawn
        # over the padded decode-ordered axis (pad lanes scale 0), so the
        # realized children differ from the torch-order path for the same
        # seeds — an equally valid reference-semantics stream
        # (src/algorithm/nets.py:83-119 draws from torch's global RNG).
        # OFF by default, matching tpu.es_decode_layout's resolved default
        # (the isolated A/B measured the layout a wash / slight loss for
        # ES — docs/RESULTS.md "ES decode-ordered offspring")
        self._layout = (
            getattr(task, "decode_layout", None)
            if use_layout is True else None
        )
        # kinds whose noise scale differs per parent: SM-G-* (per-parent
        # sensitivity rows) and SM-PROPORTIONAL (|parent| factors); plain
        # and SM-VECTOR share one scale row
        self._per_parent_scale = mutation in (
            MutationKind.SAFE_GRAD_SUM, MutationKind.SAFE_GRAD_ABS,
            MutationKind.SAFE_PROPORTIONAL,
        )
        # SM-G in-program sensitivity parameters (fused generation only;
        # the unfused path gets them per-call via calc_sensitivities)
        self._sens_underflow = float(sens_underflow)
        self._sens_precision = sens_precision
        self._sens_probes = resolve_probes(mutation, sens_probes)

        # multi-controller: replicated outputs so the host can fetch
        # fitnesses / materialized thetas (single-controller: None = default)
        outs = self._out_shardings()
        self._eval_jit = jax.jit(self._eval_fn, out_shardings=outs)
        self._fresh_eval_jit = jax.jit(self._fresh_eval_fn, out_shardings=outs)
        self._materialize_jit = jax.jit(self._materialize_fn,
                                        out_shardings=outs)
        self._materialize_fresh_jit = jax.jit(self._materialize_fresh_fn,
                                              out_shardings=outs)

    # ---- device fns ------------------------------------------------------------------

    @staticmethod
    def _select_row(mat, i):
        """Row i of (P, dim) mat as a one-hot matvec: dynamic row indexing
        under vmap lowers to a TPU gather that measured ~1 ms PER OFFSPRING
        (dominating the whole eval sweep); the (1, P) @ (P, dim) matvec
        rides the MXU. HIGHEST precision = exact 3-way bf16 splits, so the
        selected row equals the stored row bit-for-bit on every finite
        value (verified on chip; -0.0 weights land as +0.0) — eval and
        materialize stay bit-consistent. Precondition: rows are finite —
        0 * Inf = NaN would leak a diverged row into every selection,
        where the old gather isolated it. All rows here are finite by
        construction (clamped sensitivities, bounded Gaussian mutations of
        finite parents)."""
        oh = jax.nn.one_hot(i, mat.shape[0], dtype=mat.dtype)
        return jnp.matmul(oh, mat, precision=jax.lax.Precision.HIGHEST)

    def _child(self, parents_mat, sens_mat, sigma, seed, pi, si):
        parent = self._select_row(parents_mat, pi)
        noise = gaussian_noise(self._mk_key(seed), self.dim, sigma)
        delta = shape_noise(
            noise, parent,
            sensitivity=(self._select_row(sens_mat, si)
                         if self.mutation.is_safe else None),
            proportional=self.mutation.is_proportional,
        )
        return parent + delta

    def _scale_rows_dec(self, parents_mat, sens_mat, sigma):
        """(R, dim_dec) noise-scale rows for the layout path: a child's
        delta is ``select_row(scale, ci) * N(0,1)`` — shape_noise's factors
        depend only on (parent, sens, sigma), so they hoist out of the
        offspring loop exactly like NESEngine._scale_vec. Per-parent rows
        for SM-G (sens_mat rows align with parents) and SM-PROPORTIONAL;
        one shared row otherwise. pad_scale=0 keeps pad lanes noiseless."""
        lay = self._layout
        base = jnp.full((self.dim,), sigma, jnp.float32)

        def row(p, s):
            return lay.to_dec(
                shape_noise(
                    base, p,
                    sensitivity=s if self.mutation.is_safe else None,
                    proportional=self.mutation.is_proportional,
                ),
                pad_scale=0.0,
            )

        if self.mutation in (MutationKind.SAFE_GRAD_SUM,
                             MutationKind.SAFE_GRAD_ABS):
            return jax.vmap(row)(parents_mat, sens_mat)
        if self.mutation.is_proportional:
            return jax.vmap(lambda p: row(p, None))(parents_mat)
        return row(parents_mat[0], sens_mat[0])[None]

    def _child_ctx(self, parents_mat, sens_mat, sigma):
        """Per-program child-construction context: (build, rollout, finish).
        ``build(seed, pi, si)`` returns the child in ROLLOUT space —
        decode-ordered on the layout path, torch-ordered otherwise;
        ``rollout`` is the matching task entry point; ``finish`` maps a
        stacked (k, .) child matrix back to torch order (identity off the
        layout path, the exact linear from_dec on it). The layout
        transforms of the parent/scale rows are paid once per program, not
        per offspring."""
        lay = self._layout
        if lay is None:
            def build(seed, pi, si):
                return self._child(parents_mat, sens_mat, sigma, seed, pi, si)

            return build, self.task.rollout, lambda m: m

        parents_dec = jax.vmap(lay.to_dec)(parents_mat)
        scale_dec = self._scale_rows_dec(parents_mat, sens_mat, sigma)

        def build(seed, pi, si):
            del si  # SM-G scale rows are per-parent: ci == pi by construction
            ci = pi if self._per_parent_scale else jnp.zeros_like(pi)
            p = self._select_row(parents_dec, pi)
            sc = self._select_row(scale_dec, ci)
            return p + sc * jax.random.normal(
                self._mk_key(seed), (lay.dim_dec,), jnp.float32
            )

        return build, self.task.rollout_dec, jax.vmap(lay.from_dec)

    def _eval_fn(self, parents_mat, sens_mat, sigma, seeds, pidx, sidx,
                 idx_row, consts):
        build, rollout, _ = self._child_ctx(parents_mat, sens_mat, sigma)

        def one(seed, pi, si):
            child = build(seed, pi, si)
            key = jax.random.fold_in(self._mk_key(seed), 3)
            return rollout(child, idx_row, key=key, consts=consts)

        return jax.lax.map(
            lambda xs: jax.vmap(one)(*xs), (seeds, pidx, sidx)
        )

    def _fresh_eval_fn(self, seeds, idx_row, consts):
        def one(seed):
            child = self.task.spec.init_theta(self._mk_key(seed))
            key = jax.random.fold_in(self._mk_key(seed), 3)
            return self.task.rollout(child, idx_row, key=key, consts=consts)

        return jax.lax.map(lambda s: jax.vmap(one)(s), seeds)

    def _materialize_fn(self, parents_mat, sens_mat, sigma, seeds, pidx, sidx):
        build, _, finish = self._child_ctx(parents_mat, sens_mat, sigma)
        return finish(jax.vmap(build)(seeds, pidx, sidx))

    def _materialize_fresh_fn(self, seeds):
        return jax.vmap(
            lambda s: self.task.spec.init_theta(self._mk_key(s))
        )(seeds)

    def _sens_rows(self, pidx: np.ndarray) -> np.ndarray:
        """Sensitivity row per offspring: per-parent for SM-G-* (the
        reference caches sens per (task, parent)); the single shared row 0
        for SM-VECTOR and non-safe kinds."""
        if self.mutation in (MutationKind.SAFE_GRAD_SUM, MutationKind.SAFE_GRAD_ABS):
            return pidx
        return np.zeros_like(pidx)

    def _fused_generation_fn(self, elite_rows, n_valid, selected_prev,
                             sens_mat, sigma, seeds, pidx, sidx, idx_row,
                             sens_idx, policy, consts, vconsts,
                             n_offspring, n_keep, n_cands):
        """One WHOLE ES generation as a single program (mirrors the NES
        fused generation): assemble the parent matrix from podium-elite rows
        + the previous generation's selected children, sweep all offspring,
        truncation-select on device, re-materialize the winners and the next
        elite candidates, and validation-score those candidates in-program
        (``task.validate_device``). One dispatch, one packed result pull —
        where the host-choreographed path paid an eval dispatch, two
        materialize dispatches, and C multi-dispatch host validations per
        generation (reference master loop: nic_es_master.py:55-153).

        Parent assembly (reference record_parents semantics,
        nic_es/iteration.py:83-110): row i = elite_rows[i] for i < n_valid,
        else selected_prev[i - n_valid]; rows past the true parent count
        duplicate the last child and are never drawn (pidx < n_parents).
        ``policy`` rides along only for its |.|.mean() stat (saves an
        11.6 MB theta pull per generation)."""
        E, S = elite_rows.shape[0], selected_prev.shape[0]
        P = E + S
        pool = jnp.concatenate([elite_rows, selected_prev], axis=0)
        ii = jnp.arange(P)
        ridx = jnp.where(ii < n_valid, ii,
                         E + jnp.minimum(ii - n_valid, S - 1))
        oh = jax.nn.one_hot(ridx, P, dtype=pool.dtype)
        # HIGHEST = bit-exact row selection (see _select_row)
        parents = jnp.matmul(oh, pool, precision=jax.lax.Precision.HIGHEST)

        fitness, new_selected, new_cands, cand_scores = self._gen_core(
            parents, sens_mat, sigma, seeds, pidx, sidx, idx_row, sens_idx,
            consts, vconsts, n_offspring, n_keep, n_cands,
        )
        packed = jnp.concatenate([
            fitness, cand_scores, jnp.abs(policy).mean().reshape(1),
        ])
        return packed, new_selected, new_cands

    def _gen_core(self, parents, sens_mat, sigma, seeds, pidx, sidx,
                  idx_row, sens_idx, consts, vconsts,
                  n_offspring, n_keep, n_cands):
        """The device body of one fused generation given an assembled
        (P, dim) parent matrix: (in-program SM-G sensitivities when the
        kind needs them) -> offspring sweep -> truncation selection ->
        winner/candidate materialization -> in-program candidate
        validation. Shared by the single-generation program and the
        K-generation block scan."""
        if self.mutation in (MutationKind.SAFE_GRAD_SUM,
                             MutationKind.SAFE_GRAD_ABS):
            # SM-G per-parent sensitivities IN-PROGRAM from the assembled
            # parents (the unfused path pays a separate dispatch + host
            # choreography for this — _update_sensitivities). sidx = pidx
            # selects each child's parent row of this matrix; pad rows
            # duplicate real parents and are never drawn.
            from ..ops.sensitivity import (
                abs_sens_many_traced,
                postprocess,
                probe_key_from_seed,
                sum_sens_many_traced,
                sum_sens_probes_many_traced,
            )

            fwd = self.task.sensitivity_forward
            if self.mutation is MutationKind.SAFE_GRAD_SUM:
                if self._sens_probes:
                    # probe key from the generation's offspring-seed 0 —
                    # identical derivation to the unfused host path
                    # (_update_sensitivities), so fused-vs-plain
                    # trajectories stay equal with probes on
                    raw = sum_sens_probes_many_traced(
                        fwd, parents, sens_idx, consts,
                        probe_key_from_seed(self._mk_key,
                                            seeds.reshape(-1)[0]),
                        self._sens_probes, self._sens_precision,
                    )
                else:
                    raw = sum_sens_many_traced(fwd, parents, sens_idx,
                                               consts, self._sens_precision)
            else:
                raw = abs_sens_many_traced(fwd, parents, sens_idx, consts)
            sens_mat = postprocess(raw, self._sens_underflow)

        build, rollout, finish = self._child_ctx(parents, sens_mat, sigma)

        def one(seed, pi, si):
            child = build(seed, pi, si)
            key = jax.random.fold_in(self._mk_key(seed), 3)
            art = rollout(child, idx_row, key=key, consts=consts)
            return art["fitness"] if isinstance(art, dict) else art

        fits = jax.lax.map(
            lambda xs: jax.vmap(one)(*xs), (seeds, pidx, sidx)
        )
        fitness = fits.reshape(-1)[:n_offspring]

        order = jnp.argsort(-fitness, stable=True)
        seeds_f = seeds.reshape(-1)[:n_offspring]
        pidx_f = pidx.reshape(-1)[:n_offspring]
        sidx_f = sidx.reshape(-1)[:n_offspring]

        def materialize(js):
            return finish(jax.vmap(lambda j: build(
                seeds_f[j], pidx_f[j], sidx_f[j],
            ))(js))

        new_selected = materialize(order[:n_keep])
        # candidates = top-n_cands children = a prefix of the selected rows
        # (same sorted order; n_cands <= n_keep enforced by _fused_capable)
        new_cands = new_selected[:n_cands]
        cand_scores = jax.lax.map(
            lambda th: self.task.validate_device(th, vconsts), new_cands
        )
        return fitness, new_selected, new_cands, cand_scores

    def _fused_block_fn(self, elite_rows, elite_scores, selected_prev,
                        cand_rows, cand_scores, sens_mat, sigma,
                        seeds, pidx, sidx, idx_rows, sens_idx,
                        consts, vconsts, n_offspring, n_keep, n_cands):
        """K chained fused generations as ONE program (tpu.gens_per_dispatch
        for ES, mirroring NESEngine._generation_block_fn): a lax.scan whose
        step replays the per-generation host choreography on device —

        1. parents = PRE-merge podium elites + previous selected children
           (_fused_step loads its elite rows from _parent_paths BEFORE the
           candidate submission rewrites the slots, so generation k's sweep
           sees the podium as of candidates <= k-2; the caller guarantees a
           FULL podium, so the n_valid row mapping of the single-generation
           program is the identity);
        2. merge the previous generation's candidates into the podium
           (stable desc sort with incumbents listed first = ties keep the
           incumbent, exactly Podium.record_elites);
        3. the best previous candidate becomes the policy (its |.|.mean is
           the generation's norm stat);
        4. the shared generation core (_gen_core).

        Per-generation output row: [fitness (L), cand_scores (C), norm (1),
        post-merge elite scores (E)] — stacked (K, L+C+1+E), one pull.
        Scan carry keeps the podium/selected/candidate thetas on device, so
        interior generations cost no host sync, no dispatch, and no
        elite-row upload."""
        E = elite_rows.shape[0]
        hi = jax.lax.Precision.HIGHEST

        def step(carry, xs):
            e_rows, e_scores, selected, c_rows, c_scores, _ = carry
            seeds_g, pidx_g, sidx_g, idx_row, sens_idx_g = xs
            # parents see the PRE-merge podium (host _fused_step parity)
            parents = jnp.concatenate([e_rows, selected], axis=0)
            if E:
                e_rows, e_scores = podium_merge(
                    e_rows, e_scores, c_rows, c_scores
                )
            # np.argmax semantics: first index of the max (ties)
            bi = jnp.argmax(c_scores)
            policy = jnp.matmul(
                jax.nn.one_hot(bi, c_rows.shape[0], dtype=c_rows.dtype),
                c_rows, precision=hi,
            )
            fitness, selected, c_rows, c_scores = self._gen_core(
                parents, sens_mat, sigma, seeds_g, pidx_g, sidx_g, idx_row,
                sens_idx_g, consts, vconsts, n_offspring, n_keep, n_cands,
            )
            row = jnp.concatenate([
                fitness, c_scores, jnp.abs(policy).mean().reshape(1),
                e_scores,
            ])
            return (e_rows, e_scores, selected, c_rows, c_scores, policy), row

        # the policy carry slot is overwritten before first read; seed it
        # with a same-shaped row rather than stacking K policies as outputs
        carry0 = (elite_rows, elite_scores, selected_prev,
                  cand_rows, cand_scores, cand_rows[0])
        (e_rows, e_scores, selected, c_rows, c_scores, policy), packed = \
            jax.lax.scan(step, carry0,
                         (seeds, pidx, sidx, idx_rows, sens_idx))
        # the block-end policy = the one computed at the LAST step (from the
        # second-to-last generation's candidates), matching the host's
        # per-generation update timeline
        return packed, e_rows, e_scores, selected, c_rows, policy

    # ---- host entry points ---------------------------------------------------------

    def eval_generation(self, parents_mat, sens_mat, sigma, seeds, pidx, idx_row,
                        fresh: bool = False):
        """seeds (L,), pidx (L,), idx_row (B,) -> artifacts leaves (L, ...)."""
        L = seeds.shape[0]
        n_chunks, chunk = self._plan(L)
        seeds_d = self._lay_out(seeds.astype(np.uint32), n_chunks, chunk)
        idx_d = self._replicated(np.asarray(idx_row, np.int32))
        consts = self.task.device_consts()
        if fresh:
            out = self._fresh_eval_jit(seeds_d, idx_d, consts)
        else:
            pidx_d = self._lay_out(pidx.astype(np.int32), n_chunks, chunk)
            sidx = self._sens_rows(pidx)
            sidx_d = self._lay_out(sidx.astype(np.int32), n_chunks, chunk)
            out = self._eval_jit(
                parents_mat, sens_mat, self._replicated(np.float32(sigma)),
                seeds_d, pidx_d, sidx_d, idx_d, consts,
            )
        return self._unchunk(out, L)

    def fused_generation(self, elite_rows, n_valid: int, selected_prev,
                         sens_mat, sigma, seeds: np.ndarray,
                         pidx: np.ndarray, idx_row: np.ndarray, policy,
                         n_cands: int, sens_idx: np.ndarray | None = None):
        """Host entry for the one-dispatch generation. elite_rows (E, dim)
        and selected_prev (S, dim) are device handles (the latter from the
        previous call); returns (packed, new_selected, new_cands) where
        ``unpack_fused(packed, L, C)`` costs the generation's single sync.
        ``sens_idx``: batch rows for the in-program SM-G sensitivity sweep
        (SM-G kinds only; a 1-element inert operand otherwise)."""
        L = seeds.shape[0]
        n_chunks, chunk = self._plan(L)
        seeds_d = self._lay_out(seeds.astype(np.uint32), n_chunks, chunk)
        pidx_d = self._lay_out(pidx.astype(np.int32), n_chunks, chunk)
        sidx = self._sens_rows(pidx)
        sidx_d = self._lay_out(sidx.astype(np.int32), n_chunks, chunk)
        if sens_idx is None:
            sens_idx = np.zeros(1, np.int32)
        if not hasattr(self, "_fused_jit"):
            self._fused_jit = jax.jit(
                self._fused_generation_fn,
                static_argnames=("n_offspring", "n_keep", "n_cands"),
                out_shardings=self._out_shardings(),
            )
        return self._fused_jit(
            elite_rows, self._replicated(np.int32(n_valid)), selected_prev,
            sens_mat, self._replicated(np.float32(sigma)),
            seeds_d, pidx_d, sidx_d,
            self._replicated(np.asarray(idx_row, np.int32)),
            self._replicated(np.asarray(sens_idx, np.int32)), policy,
            self.task.device_consts(), self.task.device_val_consts(),
            n_offspring=L, n_keep=selected_prev.shape[0], n_cands=n_cands,
        )

    @staticmethod
    def unpack_fused(packed, L: int, n_cands: int):
        """(fitness (L,), cand_scores (C,), |policy|.mean()) — one sync."""
        arr = np.asarray(packed)
        return arr[:L], arr[L : L + n_cands], float(arr[-1])

    def fused_block(self, elite_rows, elite_scores, selected_prev,
                    cand_rows, cand_scores, sens_mat, sigma,
                    seeds: np.ndarray, pidx: np.ndarray,
                    idx_rows: np.ndarray, n_cands: int,
                    sens_idx: np.ndarray | None = None):
        """Host entry for the K-generation block (_fused_block_fn).
        ``seeds``/``pidx`` are (K, L) in per-generation stream order,
        ``idx_rows`` (K, B); device handles carry the podium
        (elite_rows/elite_scores), previous selected children, and the
        pending candidates + their in-program scores. Returns
        (packed (K, L+C+1+E), elite_rows, elite_scores, selected,
        cand_rows, policy) — ``unpack_block`` costs the block's single
        sync."""
        K, L = seeds.shape
        n_chunks, chunk = self._plan(L)

        def lay3(a, dtype):
            a = np.asarray(a, dtype)
            pad = n_chunks * chunk - a.shape[1]
            if pad:
                a = np.concatenate(
                    [a, np.repeat(a[:, -1:], pad, axis=1)], axis=1
                )
            a = a.reshape(K, n_chunks, chunk)
            if self.mesh is None or pop_axis_size(self.mesh) == 1:
                return a
            return shard_population(self.mesh, a, axis=2)

        seeds_d = lay3(seeds, np.uint32)
        pidx_d = lay3(pidx, np.int32)
        sidx_d = lay3(self._sens_rows(pidx), np.int32)
        if sens_idx is None:
            sens_idx = np.zeros((K, 1), np.int32)
        if not hasattr(self, "_fused_block_jit"):
            self._fused_block_jit = jax.jit(
                self._fused_block_fn,
                static_argnames=("n_offspring", "n_keep", "n_cands"),
                out_shardings=self._out_shardings(),
            )
        return self._fused_block_jit(
            elite_rows,
            self._replicated(np.asarray(elite_scores, np.float32)),
            selected_prev, cand_rows,
            self._replicated(np.asarray(cand_scores, np.float32)),
            sens_mat, self._replicated(np.float32(sigma)),
            seeds_d, pidx_d, sidx_d,
            self._replicated(np.asarray(idx_rows, np.int32)),
            self._replicated(np.asarray(sens_idx, np.int32)),
            self.task.device_consts(), self.task.device_val_consts(),
            n_offspring=L, n_keep=selected_prev.shape[0], n_cands=n_cands,
        )

    @staticmethod
    def unpack_block(packed, K: int, L: int, n_cands: int, n_elites: int):
        """(fitness (K, L), cand_scores (K, C), norms (K,), post-merge
        elite scores (K, E)) — the block's single sync."""
        arr = np.asarray(packed).reshape(K, L + n_cands + 1 + n_elites)
        return (arr[:, :L], arr[:, L : L + n_cands],
                arr[:, L + n_cands],
                arr[:, L + n_cands + 1 :])

    def materialize(self, parents_mat, sens_mat, sigma, seeds, pidx,
                    fresh: bool = False):
        """Rebuild the thetas of selected children from their lineage."""
        seeds = self._replicated(np.asarray(seeds, np.uint32))
        if fresh:
            return self._materialize_fresh_jit(seeds)
        sidx = self._sens_rows(pidx)
        return self._materialize_jit(
            parents_mat, sens_mat, self._replicated(np.float32(sigma)),
            seeds, self._replicated(np.asarray(pidx, np.int32)),
            self._replicated(np.asarray(sidx, np.int32)),
        )


class ESMaster:
    def __init__(self, exp: dict, mesh=None):
        from ..tasks import make_task

        self.exp = exp
        self.config = parse_config(exp)
        self.tpu_cfg = parse_tpu_config(exp)
        setup_log_dir(exp)

        self.task = make_task(exp, self.config, self.tpu_cfg)
        self.it = Iteration(self.config, exp)
        self.stats = Statistics()
        self.experiment = ESExperiment(exp, self.config, self.task)

        if mesh is None and self.tpu_cfg.mesh_shape:
            mesh = make_mesh(self.tpu_cfg.mesh_shape)
        self.mesh = mesh

        popts = exp.get("policy_options", {})
        mopts = popts.get("model_options", {})
        self.mutation = MutationKind(mopts.get("safe_mutations", "") or "")
        self._underflow = mopts.get("safe_mutation_underflow", 0.01)
        self.engine = ESEngine(
            self.task, self.mutation, mesh=mesh,
            pop_chunk=self.tpu_cfg.pop_chunk,
            rng_impl=self.tpu_cfg.rng_impl,
            sens_underflow=self._underflow,
            sens_precision=self.tpu_cfg.sensitivity_precision,
            sens_probes=self.tpu_cfg.sensitivity_probes,
            # "auto" resolves to OFF: the isolated offspring-sweep A/B
            # (scripts/exp_es_layout.py) measured the layout a wash for
            # plain mutations and ~5% slower for SM-G at mscoco_es dims,
            # so it's an explicit opt-in (docs/RESULTS.md)
            use_layout=(self.tpu_cfg.es_decode_layout is True),
        )
        self._init_multihost_placement()

        self._elite_path_tpl = os.path.join(
            self.experiment.elite_dir(), "0_{i}_elite_params.pth"
        )
        self._parent_path_tpl = os.path.join(
            self.experiment.offspring_dir(), "0_{i}_parent_params.pth"
        )

        self._rng = np.random.default_rng(self.tpu_cfg.seed)
        self._pending_loader_state = None  # set by a from_infos resume
        self._theta_cache: dict = {}
        # device-resident thetas of the current elite candidates, keyed by
        # their .pth path: the files are the podium/checkpoint surface, but
        # re-reading + re-uploading 11.6 MB per candidate per generation
        # costs seconds through this harness's ~25 MB/s tunnel
        self._cand_thetas: dict = {}
        # (paths+mtimes) -> stacked device rows of the podium elites
        self._elite_rows_cache: tuple | None = None
        # parents: device matrix (P, dim) or None for the fresh generation 0;
        # podium-elite rows are tracked by path for z_info interop
        self.parents_mat = None
        self._parent_paths: list = []  # path or None, aligned with matrix rows
        self.elites_to_evaluate: list = []  # (cand_id, path)
        self.policy_theta = None  # representative (best evaluated elite)
        # fused-generation state (run_master): the previous generation's
        # selected-children matrix (P-E, dim) on device + the in-program
        # validation scores of the current elites_to_evaluate
        self._selected_dev = None
        self._n_selected = 0
        self._cand_scores_pending = None
        # blocked-path state (tpu.gens_per_dispatch > 1): the pending
        # candidate matrix and the podium as device handles; invalidated by
        # any step that goes through the host podium/file path
        self._cands_dev = None
        self._elites_dev = None
        # True while the podium's slot FILES lag the device-merged rows in
        # self._elites_dev (scores are adopted immediately, the ~35 MB row
        # pull is deferred); _materialize_podium() settles the debt before
        # any file read (snapshot, per-generation handoff)
        self._podium_dirty = False
        self._sens_mat = self._place(np.ones((1, self.engine.dim), np.float32))
        # SM-G fused generations compute sensitivities in-program; the
        # sens_mat operand they receive is this inert 1-row placeholder
        self._sens_ones = self._sens_mat
        if self.mutation is MutationKind.SAFE_VECTOR:
            from .nes import _load_sensitivity_file
            from ..ops.sensitivity import sm_vector_normalize

            v = sm_vector_normalize(
                _load_sensitivity_file(mopts["safe_mutation_vector"]),
                self._underflow,
            )
            self._sens_mat = self._place(v[None, :])

        self._init_population(exp)

    def _init_multihost_placement(self):
        """Multi-controller wiring, mirroring NESMaster: device-resident
        state (parent matrix, sensitivity rows) becomes mesh-replicated
        GLOBAL arrays, the task re-homes its datasets, and host bookkeeping
        stays in lockstep via the shared tpu.seed (non-primary processes
        mirror all FS effects in a scratch dir — setup_log_dir)."""
        self._multihost = jax.process_count() > 1
        if not self._multihost:
            return
        assert self.mesh is not None and \
            self.mesh.devices.size == jax.device_count(), \
            "multi-host runs need a mesh spanning all global devices"
        assert self.tpu_cfg.seed is not None, \
            "multi-host runs require tpu.seed (hosts must draw identical streams)"
        self.task.place_on_mesh(self.mesh)

    def _place(self, x):
        """Host/local array -> device form the engine's programs accept:
        identity single-controller, mesh-replicated global multi-controller."""
        if getattr(self, "_multihost", False):
            from ..parallel.multihost import replicate_global

            return replicate_global(self.mesh, np.asarray(x))
        return jnp.asarray(x)

    # ---- init modes -------------------------------------------------------------

    def _key(self):
        return jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))

    def _init_population(self, exp):
        spec = self.task.spec
        pop_size = self.experiment.population_size()
        n_cands = self.experiment.num_elite_cands()

        if exp.get("from_infos"):
            import json

            with open(exp["from_infos"]) as f:
                infos = json.load(f)
            self.stats.init_from_infos(infos)
            self.it.init_from_infos(infos)
            self.experiment.init_from_infos(infos)
            from .snapshot import load_loader_state

            self._pending_loader_state = load_loader_state(exp["from_infos"])
            thetas, paths = [], []
            for i, (_, path) in enumerate(infos["parents"]):
                thetas.append(spec.load_pth(path))
                paths.append(None)
            self._set_parents(np.stack(thetas), paths)
            self.elites_to_evaluate = []
            for i, (_, path) in enumerate(infos["elites_to_evaluate"]):
                new_path = self._elite_path_tpl.format(i=i)
                if os.path.abspath(path) != os.path.abspath(new_path):
                    spec.save_pth(spec.load_pth(path), new_path)
                self.elites_to_evaluate.append((i, new_path))
            self.policy_theta = self.parents_mat[0]
        elif exp.get("from_single"):
            files = exp["from_single"]
            if isinstance(files, str):
                files = [files]
            thetas = [spec.load_pth(f) for f in files]
            self._set_parents(np.stack(thetas), [None] * len(thetas))
            self.elites_to_evaluate = []
            for i, th in enumerate(thetas[:n_cands]):
                path = self._elite_path_tpl.format(i=i)
                spec.save_pth(np.asarray(th), path)
                self.elites_to_evaluate.append((i, path))
                # device copy now, so generation 1 doesn't re-read+re-upload
                self._cand_thetas[path] = self._place(
                    jnp.asarray(np.asarray(th), jnp.float32)
                )
            self.policy_theta = self.parents_mat[0]
        else:
            # generation 0 is fully random (parents None, reference
            # nic_es/iteration.py:50-61); elite cands = random models
            self.parents_mat = None
            self._parent_paths = []
            self.elites_to_evaluate = []
            cand_seeds = self._rng.integers(0, 2**32, size=max(n_cands, 1), dtype=np.uint32)
            cands = self.engine.materialize(None, None, 0.0, cand_seeds, None, fresh=True)
            cands_host = pull_chunked(cands)
            for i in range(n_cands):
                path = self._elite_path_tpl.format(i=i)
                spec.save_pth(cands_host[i], path)
                self.elites_to_evaluate.append((i, path))
                self._cand_thetas[path] = cands[i]
            self.policy_theta = cands[0]

    def _set_parents(self, mat, paths: list):
        """Install the parent set, padding the device matrix to a STATIC
        population_size row count — otherwise the matrix grows while the
        podium fills (E elites join over the first generations) and every
        new shape forces a full XLA recompile (~50 s/generation measured).
        Padding rows duplicate row 0 and are never selected (parent indices
        are drawn over the true count, self._n_parents).

        Multi-controller: assembled on host and placed as a mesh-replicated
        global array (single-controller keeps the device-side concatenate)."""
        xp = np if getattr(self, "_multihost", False) else jnp
        mat = xp.asarray(mat)
        P = max(self.experiment.population_size(), mat.shape[0])
        self._n_parents = int(mat.shape[0])
        if mat.shape[0] < P:
            pad = xp.broadcast_to(mat[:1], (P - mat.shape[0], mat.shape[1]))
            mat = xp.concatenate([mat, pad], axis=0)
        self.parents_mat = self._place(mat) if xp is np else mat
        self._parent_paths = paths

    def _load_theta_cached(self, path: str):
        """Podium elite .pth files are re-read every generation in file terms
        (the reference's transport); cache by (path, mtime) to skip the
        ~50 ms disk+deserialize when the podium hasn't changed."""
        mtime = os.path.getmtime(path)
        hit = self._theta_cache.get(path)
        if hit is not None and hit[0] == mtime:
            return hit[1]
        theta = self.task.spec.load_pth(path)
        self._theta_cache[path] = (mtime, theta)
        return theta

    def _device_elite_rows(self, elite_paths: list):
        """Stacked podium-elite rows as a device array, re-uploaded only
        when a podium file actually changed (an 11.6 MB host->device upload
        per elite per generation costs ~0.5 s through this harness's
        tunnel). Returns None when the podium is empty."""
        if not elite_paths:
            return None
        key = tuple((p, os.path.getmtime(p)) for p in elite_paths)
        cached = self._elite_rows_cache
        if cached is not None and cached[0] == key:
            return cached[1]
        rows = jnp.asarray(
            np.stack([self._load_theta_cached(p) for p in elite_paths])
        )
        self._elite_rows_cache = (key, rows)
        return rows

    # ---- selection ---------------------------------------------------------------

    def _select_parent_indices(self, L: int, n_parents: int) -> np.ndarray:
        if self.experiment.selection() == "tournament":
            k = min(n_parents, self.experiment.tournament_size() or 1)
            # parents sorted best-first: tournament winner = min sampled
            # index (reference: nic_es_worker.py:150-162). One vectorized
            # draw: the k smallest entries of a random row are a uniform
            # k-subset without replacement — L separate rng.choice calls
            # cost real wall time on this harness's single host core at
            # lambda in the thousands x gens_per_dispatch.
            r = self._rng.random((L, n_parents))
            subset = np.argpartition(r, k - 1, axis=1)[:, :k]
            return subset.min(axis=1).astype(np.int32)
        return self._rng.integers(0, n_parents, size=L).astype(np.int32)

    def _update_sensitivities(self, idx_row, seed0=None):
        """Per-parent sensitivity matrix for SM-G-* (the reference caches
        sens per (task, parent) across workers — here one fused sweep per
        generation, SURVEY.md §7.3). The whole padded parent matrix goes
        through one jitted lax.map: shape-stable (no recompiles as the
        podium fills) and one program launch instead of P — the per-parent
        dispatch loop cost ~100 ms of launch overhead per parent on this
        harness. Pad rows duplicate real parents, so the wasted compute is
        at most num_elites/P of the sweep."""
        if self.mutation not in (MutationKind.SAFE_GRAD_SUM, MutationKind.SAFE_GRAD_ABS):
            return
        from ..ops.sensitivity import calc_sensitivities, probe_key_from_seed

        # tpu.sensitivity_batch: Jacobian over a subsampled batch (the
        # reference's own forward_for_sensitivity already truncates decode
        # steps for cheapness — principled approximation is in-genre).
        # idx as a host array: auto-replicated by the jit in both single-
        # and multi-controller execution. Probe key (tpu.sensitivity_probes)
        # from the generation's offspring-seed 0 — the fused path's exact
        # derivation (engine._gen_core).
        probes = self.engine._sens_probes
        self._sens_mat = calc_sensitivities(
            self.task, self.parents_mat, self._sens_batch_rows(idx_row),
            self.mutation, self._underflow,
            matmul_precision=self.tpu_cfg.sensitivity_precision,
            probes=probes,
            probe_key=(probe_key_from_seed(self.engine._mk_key,
                                           np.uint32(seed0))
                       if probes else None),
        )

    def _profile_hook(self, iteration: int):
        """Trace generation 2 with jax.profiler when tpu.profile is set
        (SURVEY.md §5.1). ``_profile_finalize`` closes the trace if the
        run ends before generation 3 (jax only writes on stop_trace)."""
        if not self.tpu_cfg.profile:
            return
        if iteration == 2 and not getattr(self, "_trace_on", False):
            jax.profiler.start_trace(os.path.join(self.exp["log_dir"], "profile"))
            self._trace_on = True
        elif iteration > 2:
            self._profile_finalize()

    def _profile_finalize(self):
        if getattr(self, "_trace_on", False):
            jax.profiler.stop_trace()
            self._trace_on = False
            logger.info("wrote jax profiler trace for generation 2")

    # ---- main loop ------------------------------------------------------------------

    def _fused_capable(self) -> bool:
        """Eligibility for the one-dispatch fused generation: device-scored
        fitness + in-program validation. SM-G-* kinds qualify too — their
        per-parent sensitivity sweep is computed IN-PROGRAM from the
        assembled parents (engine._fused_generation_fn), replacing the
        unfused path's separate _update_sensitivities dispatch."""
        cached = getattr(self, "_fused_capable_cache", None)
        if cached is not None:
            return cached
        want = getattr(self.tpu_cfg, "fused_es", "auto")
        n_keep = (self.experiment.population_size()
                  - self.experiment.num_elites())
        ok = (
            want is not False
            and self.task.fitness_on_device
            and self.exp["nb_offspring"] >= n_keep
            # candidates = a prefix of the selected children in the fused
            # program; degenerate configs (more cands than offspring or
            # kept children) would mis-slice the packed result layout, and
            # zero candidates would make the program's argmax/one-hot over
            # the candidate rows trace-fail — the plain path handles all of
            # these gracefully
            and 1 <= self.experiment.num_elite_cands() <= min(
                n_keep, self.exp["nb_offspring"]
            )
            and self.task.device_val_consts() is not None
        )
        self._fused_capable_cache = ok
        return ok

    def _sens_batch_rows(self, idx_row) -> np.ndarray:
        from ..ops.sensitivity import subsample_batch_rows

        return subsample_batch_rows(
            idx_row, getattr(self.tpu_cfg, "sensitivity_batch", 0)
        )

    def _ensure_cand_file(self, path: str):
        """Lazy .pth materialization of a device-resident candidate (the
        fused path defers candidate file writes — an 11.6 MB device->host
        pull each — until the podium or a snapshot actually needs the
        file)."""
        if os.path.isfile(path):
            return
        th = self._cand_thetas.get(path)
        if th is not None:
            self.task.spec.save_pth(pull_chunked(th), path)

    def _padded_elite_rows(self, elite_paths: list, E: int):
        """(E, dim) device matrix: podium-elite rows padded with zero rows
        (never selected — parent assembly maps rows >= n_valid to children).
        A FULL podium — the steady state — shares _device_elite_rows'
        (paths, mtime)-keyed device cache with the plain path; only the
        podium-filling boundary pays the separate padded build."""
        if len(elite_paths) == E and not self._multihost:
            dev = self._device_elite_rows(elite_paths)
            if dev is not None:
                # steady state never pads again: drop any boundary-built
                # padded matrix so it doesn't strand an (E, dim) buffer
                self._padded_elite_cache = None
                return dev
        key = (tuple((p, os.path.getmtime(p)) for p in elite_paths), E)
        cached = getattr(self, "_padded_elite_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        rows = np.zeros((E, self.engine.dim), np.float32)
        for i, p in enumerate(elite_paths[:E]):
            rows[i] = self._load_theta_cached(p)
        dev = self._place(rows)
        self._padded_elite_cache = (key, dev)
        return dev

    def _plain_step(self, idx_row, sigma, L, pop_size, num_elites, n_cands):
        """The host-choreographed generation (reference cadence: validate
        prev cands -> sweep -> select -> publish cands -> install parents).
        Returns (sorted fitness desc, best eval score, mean |policy|)."""
        it, spec = self.it, self.task.spec

        # 1. validation-score the elite candidates published by the
        #    previous generation (reference eval jobs); thetas stay
        #    device-resident — the .pth file is only the podium /
        #    checkpoint surface
        for cid, path in self.elites_to_evaluate:
            th = self._cand_thetas.get(path)
            if th is None:  # resume: only the file exists
                th = self._place(self._load_theta_cached(path))
                self._cand_thetas[path] = th
            score = self.task.validate(th)
            it.record_eval_result(cid, path, score)
        best_ev_acc, best_ev_elite = it.process_evaluated_elites()
        if best_ev_elite:
            self.policy_theta = (
                self._cand_thetas.get(best_ev_elite)
                if best_ev_elite in self._cand_thetas
                else self._place(spec.load_pth(best_ev_elite))
            )

        # 2. offspring fitness sweep
        fresh = self.parents_mat is None
        seeds = self._rng.integers(0, 2**32, size=L, dtype=np.uint32)
        if fresh:
            pidx = np.zeros(L, np.int32)
        else:
            self._update_sensitivities(idx_row, seed0=seeds[0])
            pidx = self._select_parent_indices(L, self._n_parents)
        artifacts = self.engine.eval_generation(
            self.parents_mat, self._sens_mat, sigma, seeds, pidx,
            idx_row, fresh=fresh,
        )
        fitness = np.asarray(
            self.task.host_fitness(artifacts, idx_row)
        ).reshape(L)

        # 3. truncation selection (reference: nic_es_master.py:155-167)
        order = np.argsort(-fitness, kind="stable")
        scores = fitness[order]
        keep = order[: pop_size - num_elites]

        # 4. next elite candidates = top C children, persisted as .pth
        cand_ids = order[:n_cands]
        cand_thetas = self.engine.materialize(
            self.parents_mat, self._sens_mat, sigma,
            seeds[cand_ids], pidx[cand_ids], fresh=fresh,
        )
        new_cands, cand_files = [], []
        new_cand_thetas = {}
        cand_host = pull_chunked(cand_thetas)  # one bulk pull, not C row pulls
        for i in range(len(cand_ids)):
            path = self._elite_path_tpl.format(i=i)
            spec.save_pth(cand_host[i], path)
            new_cands.append((i, path))
            cand_files.append(path)
            new_cand_thetas[path] = cand_thetas[i]
        remove_all_files_but(self.experiment.elite_dir(), cand_files)
        self.elites_to_evaluate = new_cands
        # rebuilt wholesale: the slot paths were just rewritten, so
        # stale device copies must not survive
        self._cand_thetas = new_cand_thetas

        # 5. new parents = podium elites + selected children
        #    (reference: record_parents + _add_elites_to_parents)
        selected = self.engine.materialize(
            self.parents_mat, self._sens_mat, sigma,
            seeds[keep], pidx[keep], fresh=fresh,
        )
        elite_paths = [
            path for path, _ in it.best_elites()
            if path and os.path.isfile(path)
        ]
        if self._multihost:
            # host-side assembly; _set_parents re-places globally
            elite_rows = [self._load_theta_cached(p)
                          for p in elite_paths]
            rows = ([np.stack(elite_rows)] if elite_rows else []
                    ) + [np.asarray(selected)]
            mat = np.concatenate(rows, axis=0)
        else:
            dev_elites = self._device_elite_rows(elite_paths)
            rows = ([dev_elites] if dev_elites is not None else []
                    ) + [selected]
            mat = jnp.concatenate(rows, axis=0)
        self._set_parents(
            mat, elite_paths + [None] * selected.shape[0]
        )

        # hand the fused path its state: the selected-children matrix
        # (padded to the static P-E row count) + unscored candidates
        self._elites_dev = None  # host podium path owns the slots here
        self._cands_dev = None
        if self._fused_capable():
            S = pop_size - num_elites
            sel = selected
            if sel.shape[0] < S:
                pad = jnp.broadcast_to(
                    sel[-1:], (S - sel.shape[0], sel.shape[1])
                )
                sel = jnp.concatenate([sel, pad], axis=0)
            self._selected_dev = sel
            self._n_selected = int(selected.shape[0])
            self._cand_scores_pending = None

        norm = float(jnp.abs(self.policy_theta).mean())
        return scores, best_ev_acc, norm

    def _fused_step(self, idx_row, sigma, L, pop_size, num_elites, n_cands):
        """One-dispatch generation (engine._fused_generation_fn). Candidate
        scores come from the PREVIOUS generation's program (deterministic
        device validation — the value is identical whenever it runs);
        podium/patience bookkeeping happens at the same relative point as
        the plain path. Elite rows for THIS generation's parents are loaded
        BEFORE the podium submission can rewrite the slot files."""
        it = self.it
        S = pop_size - num_elites
        elite_paths = [p for p in self._parent_paths if p is not None]
        n_valid = len(elite_paths)
        if (self._elites_dev is not None
                and self._elites_dev.shape[0] == num_elites
                and n_valid == num_elites):
            # block -> per-generation handoff: the merged elite rows are
            # already device-resident (and _materialize_podium just wrote
            # the identical bytes to the slot files) — skip the ~35 MB
            # re-upload _padded_elite_rows would pay
            dev_elites = self._elites_dev
        else:
            dev_elites = self._padded_elite_rows(elite_paths, num_elites)
        self._elites_dev = None  # this step merges the podium host-side

        # candidate bookkeeping (plain step 1). Boundary generations
        # (resume / plain handoff) host-validate; steady state reuses the
        # in-program scores pulled last generation.
        if self._cand_scores_pending is None:
            scores = []
            for _, path in self.elites_to_evaluate:
                th = self._cand_thetas.get(path)
                if th is None:
                    th = self._place(self._load_theta_cached(path))
                    self._cand_thetas[path] = th
                scores.append(float(self.task.validate(th)))
        else:
            scores = [float(s) for s in self._cand_scores_pending]
        # lazy candidate files: a cand can only enter the podium by strictly
        # beating the worst incumbent slot (record_elites stable-merge)
        min_slot = min(
            (sc for _, sc in it.best_elites()), default=float("-inf")
        )
        for (cid, path), score in zip(self.elites_to_evaluate, scores):
            if score > min_slot:
                self._ensure_cand_file(path)
            it.record_eval_result(cid, path, score)
        it.process_evaluated_elites()
        best_ev_acc = float("-inf")
        if scores:
            bi = int(np.argmax(scores))
            best_ev_acc = scores[bi]
            best_path = self.elites_to_evaluate[bi][1]
            th = self._cand_thetas.get(best_path)
            self.policy_theta = (
                th if th is not None
                else self._place(self._load_theta_cached(best_path))
            )

        seeds = self._rng.integers(0, 2**32, size=L, dtype=np.uint32)
        pidx = self._select_parent_indices(L, self._n_parents)
        sm_g = self.mutation in (MutationKind.SAFE_GRAD_SUM,
                                 MutationKind.SAFE_GRAD_ABS)
        packed, new_selected, new_cands = self.engine.fused_generation(
            dev_elites, n_valid, self._selected_dev,
            self._sens_ones if sm_g else self._sens_mat, sigma,
            seeds, pidx, idx_row, self.policy_theta, n_cands,
            sens_idx=self._sens_batch_rows(idx_row) if sm_g else None,
        )
        fitness, cand_scores, norm = self.engine.unpack_fused(
            packed, L, n_cands
        )  # the generation's single host sync
        order = np.argsort(-fitness, kind="stable")

        # publish this generation's candidates. Slot files are DELETED so a
        # stale file can't impersonate an unwritten new candidate; .pth
        # bytes materialize lazily (_ensure_cand_file).
        remove_all_files_but(self.experiment.elite_dir(), [])
        self.elites_to_evaluate = []
        self._cand_thetas = {}
        for i in range(n_cands):
            path = self._elite_path_tpl.format(i=i)
            self.elites_to_evaluate.append((i, path))
            self._cand_thetas[path] = new_cands[i]
        self._cands_dev = new_cands
        self._cand_scores_pending = cand_scores
        self._selected_dev = new_selected
        self._n_selected = S
        self.parents_mat = None  # the fused representation owns the parents

        # parent bookkeeping for the NEXT generation / this snapshot:
        # podium state AFTER this generation's submission (plain-path parity)
        elite_paths_next = [
            p for p, _ in it.best_elites() if p and os.path.isfile(p)
        ]
        self._parent_paths = elite_paths_next + [None] * S
        self._n_parents = len(elite_paths_next) + S
        return fitness[order], best_ev_acc, norm

    def _block_budget(self, gens_left: int, limit: int | None) -> int:
        """Generations chained into one ES dispatch (tpu.gens_per_dispatch;
        mirrors NESMaster._block_budget). >1 only in fused steady state with
        patience disabled, a FULL podium (the in-program parent assembly
        then has a fixed row layout and the parent-selection distribution a
        fixed support), and pending in-program candidate state. A block
        never contains an interior schedule firing or snapshot, so the
        host-event cadence is identical to per-generation driving."""
        b = max(self.tpu_cfg.gens_per_dispatch, 1)
        if b == 1:
            return 1
        if (self._selected_dev is None or not self._fused_capable()
                or self._cands_dev is None
                or self._cand_scores_pending is None):
            return 1
        if self.config.patience:
            if not getattr(self, "_block_warned", False):
                self._block_warned = True  # once, not every iteration
                logger.warning(
                    "gens_per_dispatch>1 requires patience=0 (patience may "
                    "anneal sigma mid-block); driving per-generation")
            return 1
        filled = [p for p, _ in self.it.best_elites()
                  if p and os.path.isfile(p)]
        if len(filled) < self.experiment.num_elites():
            return 1  # podium still filling: parent row count not yet fixed
        from .nes import NESMaster

        gap = NESMaster._gap_to_next
        nxt = self.it.iteration() + 1  # the block's first iteration
        if self.config.schedule_limit and gap(
                nxt - 1, self.config.schedule_limit,
                self.config.schedule_start or 0) == 1:
            return 1  # this iteration fires the schedule: run it alone
        b = min(b, gens_left)
        if limit:
            b = min(b, limit - self.it.iteration())
        if self.config.schedule_limit:
            b = min(b, gap(nxt, self.config.schedule_limit,
                           self.config.schedule_start or 0))
        if self.config.snapshot_freq:
            # a snapshot needs the block's end-state: end exactly on it
            b = min(b, gap(nxt - 1, self.config.snapshot_freq))
        b = max(b, 1)
        # power-of-two block sizes only: every distinct K is its own XLA
        # program (see NESMaster._block_budget)
        return 1 << (b.bit_length() - 1)

    def _fused_block_step(self, b, t_block, sigma, bs, L, pop_size,
                          num_elites, n_cands):
        """``b`` chained generations, one dispatch, one sync
        (engine.fused_block). Per-generation host bookkeeping (stats
        series, counters, logs) is replayed from the pulled per-generation
        results; the podium merge happens ON DEVICE with
        Podium.record_elites' exact semantics — the host adopts the final
        SCORES immediately and defers the elite-row pull + slot-file writes
        to _materialize_podium. Deviation (documented):
        slot files for podium states that exist only INSIDE a block are
        never materialized — the files are worker transport in the
        reference, a checkpoint surface here, and blocks end on every
        snapshot boundary."""
        it, stats = self.it, self.stats
        S = pop_size - num_elites

        if self._elites_dev is None:
            paths = [p for p, _ in it.best_elites() if p]
            self._elites_dev = self._padded_elite_rows(paths, num_elites)
        pre_scores = [float(s) for _, s in it.best_elites()]

        sm_g = self.mutation in (MutationKind.SAFE_GRAD_SUM,
                                 MutationKind.SAFE_GRAD_ABS)
        # per-generation draws in the exact per-generation stream order, so
        # the trajectory is identical for every block size
        idx_rows = np.empty((b, bs), np.int32)
        seeds = np.empty((b, L), np.uint32)
        pidx = np.empty((b, L), np.int32)
        sens_idx = None
        for k in range(b):
            idx_rows[k] = self._sampler.batch(bs)
            seeds[k] = self._rng.integers(0, 2**32, size=L, dtype=np.uint32)
            pidx[k] = self._select_parent_indices(L, num_elites + S)
            if sm_g:
                row = self._sens_batch_rows(idx_rows[k])
                if sens_idx is None:
                    sens_idx = np.empty((b, row.shape[0]), np.int32)
                sens_idx[k] = row

        packed, e_rows, _, selected, c_rows, policy = \
            self.engine.fused_block(
                self._elites_dev, pre_scores, self._selected_dev,
                self._cands_dev, self._cand_scores_pending,
                self._sens_ones if sm_g else self._sens_mat,
                sigma, seeds, pidx, idx_rows, n_cands, sens_idx=sens_idx,
            )
        fit_all, cand_all, norms, etops = ESEngine.unpack_block(
            packed, b, L, n_cands, num_elites
        )  # the block's single host sync
        block_dt = time.time() - t_block

        prev_cands = np.asarray(self._cand_scores_pending, np.float32)
        for k in range(b):
            if k:
                it.incr_iteration()
                logger.info("********** Iteration %d (chained) **********",
                            it.iteration())
            f = fit_all[k]
            stats.record_score_stats(f[np.argsort(-f, kind="stable")])
            stats.record_bs_stats(it.batch_size())
            stats.record_step_time_stats(dt=block_dt / b)
            stats.record_norm_stats([float(norms[k])])
            stats.record_acc_stats(
                float(prev_cands.max()) if prev_cands.size else 0.0
            )
            stats.record_best_acc_stats(float(etops[k][0]))
            stats.record_std_stats(it.noise_stdev())
            stats.update_mem_stats()
            stats.log_stats()
            it.log_stats()
            prev_cands = cand_all[k]

        # block-end state: adopt the device-merged podium SCORES only when
        # the merge changed it — any entry strictly beats the dropped slot,
        # so "changed" is detectable from scores alone. The merged elite
        # ROWS stay device-resident (self._elites_dev); the ~35 MB pull +
        # slot-file writes are deferred to _materialize_podium (measured
        # 6-38 s per pull through this harness's tunnel — it dominated the
        # whole block when paid eagerly).
        final_scores = [float(s) for s in etops[b - 1]]
        # compare at f32: the device returns f32 scores while host-validated
        # podium entries may carry float64 values — a raw != would flag an
        # unchanged podium as dirty (and pay the deferred 35 MB pull) on
        # every block after a host-side validation
        if final_scores != [float(np.float32(s)) for s in pre_scores]:
            it.adopt_merged_scores(final_scores)
            self._podium_dirty = True
        self._elites_dev = e_rows

        # publish the final generation's candidates (same surface as
        # _fused_step: slot files deleted, bytes materialize lazily)
        remove_all_files_but(self.experiment.elite_dir(), [])
        self.elites_to_evaluate = []
        self._cand_thetas = {}
        for i in range(n_cands):
            path = self._elite_path_tpl.format(i=i)
            self.elites_to_evaluate.append((i, path))
            self._cand_thetas[path] = c_rows[i]
        self._cands_dev = c_rows
        self._cand_scores_pending = cand_all[b - 1]
        self._selected_dev = selected
        self._n_selected = S
        self.parents_mat = None
        self.policy_theta = policy
        # slot paths exist on disk (possibly with deferred bytes — any
        # consumer goes through _materialize_podium first)
        elite_paths_next = [p for p, _ in it.best_elites() if p]
        self._parent_paths = elite_paths_next + [None] * S
        self._n_parents = len(elite_paths_next) + S

    def _materialize_podium(self):
        """Settle deferred podium slot files: pull the device-merged elite
        rows and rewrite the slot files so on-disk bytes match the adopted
        scores. MUST run before anything reads podium files (snapshot,
        per-generation handoff, resume artifacts)."""
        if not self._podium_dirty:
            return
        scores = [s for _, s in self.it.best_elites()]
        rows = pull_chunked(self._elites_dev)  # the deferred (E, dim) pull
        self.it.install_merged_podium(
            scores[: rows.shape[0]], rows,
            lambda row, path: self.task.spec.save_pth(row, path),
        )
        self._podium_dirty = False

    def run_master(self, plot: bool = False, max_iterations: int | None = None):
        config, it, stats = self.config, self.it, self.stats
        limit = max_iterations or config.max_nb_iterations
        L = self.exp["nb_offspring"]
        pop_size = self.experiment.population_size()
        num_elites = self.experiment.num_elites()
        n_cands = self.experiment.num_elite_cands()

        while not limit or it.iteration() < limit:
            it.incr_epoch()
            gens = max(self.task.train_n // it.batch_size(), 1)
            done = 0
            while done < gens and (not limit or it.iteration() < limit):
                b = self._block_budget(gens - done, limit)
                done += b
                it.incr_iteration()
                stats.set_step_tstart()
                t_block = time.time()
                logger.info("********** Iteration %d%s **********",
                            it.iteration(),
                            f" (+{b - 1} chained)" if b > 1 else "")
                self._profile_hook(it.iteration())

                sigma, bs = it.get_noise_stdev(), it.batch_size()
                if not hasattr(self, "_sampler") or self._sampler is None:
                    from ..data.core import build_sampler

                    self._sampler = build_sampler(
                        self.task.train_n, self._rng,
                        self._pending_loader_state)
                    self._pending_loader_state = None  # rebuilds start fresh

                if b > 1:
                    # blocks never contain a schedule firing, so no sampler
                    # rebuild can be needed mid-block (_block_budget)
                    self._fused_block_step(b, t_block, sigma, bs, L,
                                           pop_size, num_elites, n_cands)
                else:
                    # per-generation steps read + rewrite podium slot files
                    # (record_elites, _padded_elite_rows): settle any
                    # deferred block-merged rows first
                    self._materialize_podium()
                    idx_row = self._sampler.batch(bs)

                    step = (
                        self._fused_step
                        if self._selected_dev is not None
                        and self._fused_capable()
                        else self._plain_step
                    )
                    scores, best_ev_acc, norm = step(
                        idx_row, sigma, L, pop_size, num_elites, n_cands
                    )

                    if it.patience_reached() or it.schedule_reached():
                        self._sampler = None

                    stats.record_score_stats(scores)
                    stats.record_bs_stats(it.batch_size())
                    stats.record_step_time_stats()
                    # mean |theta| reduced on device: pulling the full
                    # 11.6 MB policy vector per generation costs ~0.5 s
                    # over the tunnel
                    stats.record_norm_stats([norm])
                    stats.record_acc_stats(
                        best_ev_acc if best_ev_acc > float("-inf") else 0.0
                    )
                    stats.record_best_acc_stats(it.best_elites()[0][1])
                    stats.record_std_stats(it.noise_stdev())
                    stats.update_mem_stats()
                    stats.log_stats()
                    it.log_stats()

                if config.snapshot_freq and it.iteration() % config.snapshot_freq == 0:
                    self._snapshot(plot)
                    self._last_snapshot_iter = it.iteration()
                if limit and it.iteration() >= limit:
                    break
                if it.patience_reached() or it.schedule_reached():
                    break

        self._profile_finalize()  # in case the run ended at generation 2
        # skip the final snapshot when the loop just wrote this iteration
        # (identical z_info; parent-file materialization is tunnel-costly)
        if getattr(self, "_last_snapshot_iter", None) != it.iteration():
            self._snapshot(plot)
        return self.policy_theta

    # ---- checkpointing -----------------------------------------------------------

    def _write_parent_files(self):
        """Materialize parent rows as .pth files for the z_info checkpoint
        (the reference keeps them on disk continuously as its transport; we
        only need them at snapshot time). Fused representation: child rows
        come from the selected-children device matrix (one bulk pull),
        elites are already files."""
        parents = []
        spec = self.task.spec
        keep_files = []
        fused = self.parents_mat is None
        # one bulk chunked pull for whichever representation holds the
        # rows: per-row np.asarray costs ~1.75 s per 11.6 MB row over the
        # tunnel (CLAUDE.md), ~P x that per snapshot
        sel = pull_chunked(self._selected_dev) if fused else None
        plain = (pull_chunked(self.parents_mat)
                 if not fused and any(p is None for p in self._parent_paths)
                 else None)
        n_elite_rows = sum(1 for p in self._parent_paths if p is not None)
        for i in range(self._n_parents):
            path = self._parent_paths[i]
            if path is None:
                path = self._parent_path_tpl.format(i=i)
                row = sel[i - n_elite_rows] if fused else plain[i]
                spec.save_pth(row, path)
            parents.append((i, path))
            if path.startswith(self.experiment.offspring_dir()):
                keep_files.append(path)
        remove_all_files_but(self.experiment.offspring_dir(), keep_files)
        return parents

    def _snapshot(self, plot: bool):
        self._materialize_podium()  # z_info references podium slot files
        have_parents = (self.parents_mat is not None
                        or self._selected_dev is not None)
        # the z_info's elites_to_evaluate must exist as files (the fused
        # path defers candidate writes)
        for _, path in self.elites_to_evaluate:
            self._ensure_cand_file(path)
        parents = self._write_parent_files() if have_parents else []
        # ES checkpoint state (reference: nic_es/iteration.py:30-35)
        self.it.extra_state = {
            "elites_to_evaluate": list(self.elites_to_evaluate),
            "parents": parents,
        }
        save_snapshot(self.stats, self.it, self.experiment,
                      loader_state=self.loader_state())
        if plot:
            self.stats.plot_stats(self.experiment.snapshot_dir())

    def loader_state(self) -> dict | None:
        """EpochSampler stream position for the snapshot sidecar (None
        before the first batch draw)."""
        sampler = getattr(self, "_sampler", None)
        return sampler.state_dict() if sampler else None
