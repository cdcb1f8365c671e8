"""NIC-NES: natural evolution strategy as a single SPMD program.

Reference behavior (src/algorithm/nic_nes/): one parameter vector theta;
``nb_offspring`` antithetic Gaussian perturbation PAIRS (2*nb_offspring
rollouts — one worker result = one (pos, neg) pair, nic_nes_worker.py:142-161,
and the master counts nb_offspring results, tools/iteration.py:110-112,173)
are fitness-evaluated on minibatches; centered-rank weights produce a
gradient estimate ``sum_i (rank_pos_i - rank_neg_i) * delta_i /
(2*nb_offspring)`` (normalizer = ranked_fitnesses.size,
nic_nes_master.py:181) that updates
theta through Adam/SGD with L2 regularization; sigma/batch-size anneal on
patience or a fixed schedule; the current model is validation-scored every
generation and fed to the podium.

TPU-native execution (replaces master/relay/worker over Redis, SURVEY §2.2):

* a generation is two jitted calls — ``eval_generation`` (perturb + rollout
  for all pairs, population axis sharded over the mesh, lax.map waves of
  ``pop_chunk`` pairs bound memory) and ``update`` (noise regenerated from
  the same uint32 seeds, rank-weighted partial sums psum-reduced across the
  mesh, optimizer step fused) — noise never leaves the device and is never
  stored across the two calls;
* per-pair minibatches are device-side gathers by an (F, B) int32 index
  array (single_batch=true tiles one row), emulating both reference batch
  regimes (nic_nes_worker.py:121-128);
* host work per generation: sampling index rows, (for captioning) CIDEr
  scoring, and bookkeeping.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .engine_base import PopulationEngine
from .experiment import NESExperiment
from .iteration import Iteration
from .snapshot import save_snapshot
from .statistics import Statistics
from ..ops.mutation import MutationKind, gaussian_noise, shape_noise
from ..ops.ranks import compute_centered_ranks
from ..ops.sensitivity import resolve_probes
from ..parallel.mesh import make_mesh
from ..parallel.transfer import pull_chunked
from ..utils.config import parse_config, parse_tpu_config
from ..utils.files import mkdir_p, remove_all_files_from_dir

logger = logging.getLogger(__name__)

__all__ = ["NESEngine", "NESMaster"]


class NESEngine(PopulationEngine):
    """Device-side math for one NES generation. Pure w.r.t. all inputs, so
    the same object also backs the multi-chip dry-run and the benchmark."""

    def __init__(self, task, optimizer, mutation: MutationKind, mesh=None,
                 pop_chunk: int = 0, rng_impl: str = "",
                 sens_underflow: float = 0.01,
                 sens_precision: str = "float32",
                 sens_batch: int = 0,
                 sens_probes: int = 0,
                 inline_sens: bool | None = None,
                 kernel_perturb: object = "auto",
                 kernel_noise: object = "auto",
                 delta_dtype: str = "f32"):
        super().__init__(task, mesh=mesh, pop_chunk=pop_chunk,
                         rng_impl=rng_impl)
        self.optimizer = optimizer
        self.mutation = mutation
        # SM-G in-program sensitivity (mirrors ESEngine): the fused
        # generation recomputes the sensitivity from its own theta + batch
        # inside the program, sparing the separate per-generation
        # calc_sensitivity dispatch and making K-generation blocks correct
        # for SM-G-* (each scan step sees its carried theta). inline_sens
        # None = auto (on exactly when the fused path would use it);
        # explicit False keeps the host-computed `sens` operand (testing /
        # fallback).
        self._sens_underflow = float(sens_underflow)
        self._sens_precision = sens_precision
        self._sens_batch = int(sens_batch)
        self._sens_probes = resolve_probes(mutation, sens_probes)
        if inline_sens is None:
            inline_sens = (
                mutation in (MutationKind.SAFE_GRAD_SUM,
                             MutationKind.SAFE_GRAD_ABS)
                and task.fitness_on_device
            )
        self.inline_sens = bool(inline_sens)
        if self.inline_sens and mutation not in (
            MutationKind.SAFE_GRAD_SUM, MutationKind.SAFE_GRAD_ABS
        ):
            raise ValueError(
                "inline_sens=True requires an SM-G-* mutation (the traced "
                f"sensitivity has no definition for {mutation}); pass "
                "inline_sens=False (or None for auto) with "
                f"mutation={mutation}"
            )

        self._eval_jit = jax.jit(self._eval_fn, static_argnames=("with_deltas",))
        self._update_jit = jax.jit(self._update_fn)
        self._update_deltas_jit = jax.jit(self._update_with_deltas_fn)
        # decode-ordered fast path (ops/decode_layout.py): the fused
        # generation perturbs/aggregates in the kernel's own layout so the
        # per-member prep is one elementwise pass — available when the task
        # both scores on device and exposes a layout (CocoTask fused+greedy)
        self._layout = (
            getattr(task, "decode_layout", None)
            if task.fitness_on_device else None
        )
        # in-kernel pair perturbation (tpu.kernel_perturb): the fused
        # generation's pair fn becomes ONE kernel call decoding both signs
        # with base + sign*delta applied in-kernel — no perturbed parameter
        # vector in HBM. Bitwise-equal tokens (tests/test_decode_pallas.py);
        # the gradient phase regenerates the identical delta from the seed
        # exactly as before, so the seed-replay contract is untouched.
        supported = (
            self._layout is not None
            and getattr(task, "supports_pair_perturb", False)
        )
        if kernel_perturb == "auto":
            self._kernel_perturb = supported
        else:
            self._kernel_perturb = bool(kernel_perturb) and supported
            if kernel_perturb is True and not supported:
                logger.warning(
                    "tpu.kernel_perturb=true but the task does not support "
                    "the pair kernel (needs fused decode + decode layout + "
                    "device scoring + a greedy fitness kind + untiled "
                    "logits); using the per-member path")
        # in-kernel noise (tpu.kernel_noise, on top of kernel_perturb): the
        # pair's delta is generated in VMEM from the on-chip hardware PRNG
        # and the gradient kernel regenerates the identical streams — no
        # delta ever materializes in HBM. TPU-only (no interpret lowering
        # for the on-chip PRNG); the delta-operand pair kernel remains the
        # CPU/test form of the same math. Chip-verified correct but a
        # measured NET LOSS at the mscoco_nes regime (eval +16 ms/gen, grad
        # -93: sequential per-pair Box-Muller loses to the rbg einsum —
        # docs/RESULTS.md r5), so "auto" resolves OFF and the knob is an
        # explicit opt-in for future hardware where the tradeoff flips.
        # tpu.delta_dtype: storage dtype of the realized delta on the
        # decode-layout path. bf16 halves the delta HBM footprint on both
        # the eval sweep (materialization + kernel-operand read) and the
        # gradient einsum; eval and gradient still consume BITWISE-identical
        # values (one shared rounding in delta_of — self-consistent NES
        # estimator, tested in tests/test_delta_dtype.py). Distributional
        # deviation only (8-bit-mantissa noise, ~0.4% relative).
        if delta_dtype not in ("f32", "bf16"):
            raise ValueError(
                f"delta_dtype={delta_dtype!r}: expected 'f32' or 'bf16'")
        self._delta_dtype = (
            jnp.bfloat16 if delta_dtype == "bf16" else jnp.float32
        )
        noise_supported = (
            self._kernel_perturb
            and getattr(task, "supports_kernel_noise", False)
        )
        if kernel_noise == "auto":
            self._kernel_noise = False
        else:
            self._kernel_noise = bool(kernel_noise) and noise_supported
            if kernel_noise is True and not noise_supported:
                logger.warning(
                    "tpu.kernel_noise=true but unsupported here (needs the "
                    "pair kernel active on a real TPU backend — the on-chip "
                    "PRNG has no CPU/interpret lowering); using delta "
                    "operands")

    # deltas kept as an eval output (skipping their regeneration in the
    # update) while the (F, dim) matrix fits comfortably in HBM
    DELTA_BYTES_LIMIT = 4 << 30

    # ---- device fns ----------------------------------------------------------------

    def _delta(self, theta, sens, sigma, seed):
        noise = gaussian_noise(self._mk_key(seed), self.dim, sigma)
        return shape_noise(
            noise, theta,
            sensitivity=sens if self.mutation.is_safe else None,
            proportional=self.mutation.is_proportional,
        )

    def _scale_vec(self, theta, sens, sigma):
        """Member-independent elementwise noise scale: delta ==
        scale_vec * N(0,1) for every mutation kind (shape_noise's factors
        depend only on theta/sens/sigma, so they hoist out of the member
        loop on the decode-layout path)."""
        return shape_noise(
            jnp.full((self.dim,), sigma, jnp.float32), theta,
            sensitivity=sens if self.mutation.is_safe else None,
            proportional=self.mutation.is_proportional,
        )

    def _eval_fn(self, theta, sens, sigma, seeds, idx, consts,
                 with_deltas=False):
        """seeds (n,c) uint32, idx (n,c,B) int32 ->
        (artifacts pytree with leaves (n, c, 2, ...), deltas or None).
        ``consts`` = task.device_consts() threaded as an operand (datasets /
        scorer tables must not become closure constants)."""

        def pair(seed, idx_i):
            delta = self._delta(theta, sens, sigma, seed)
            base = self._mk_key(seed)
            pos = self.task.rollout(theta + delta, idx_i,
                                    key=jax.random.fold_in(base, 1),
                                    consts=consts)
            neg = self.task.rollout(theta - delta, idx_i,
                                    key=jax.random.fold_in(base, 2),
                                    consts=consts)
            art = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), pos, neg
            )
            return (art, delta) if with_deltas else (art, 0)

        art, deltas = jax.lax.map(
            lambda xs: jax.vmap(pair)(*xs), (seeds, idx)
        )
        return art, (deltas if with_deltas else None)

    def _apply_grad(self, theta, opt_state, grad, fitness_count, stepsize,
                    l2coeff):
        """reference math: nic_nes_master.py:123-133,170-182."""
        globalg = -(grad / fitness_count) + l2coeff * theta
        return self.optimizer.step(opt_state, theta, globalg, stepsize)

    @staticmethod
    def _pair_weights(fitnesses, lanes_shape):
        """Per-pair gradient weights from the (F, 2) pos/neg fitnesses,
        zero-padded to the (n_chunks, chunk) lane layout (pad lanes repeat a
        real seed, so their weight must be 0)."""
        ranked = compute_centered_ranks(fitnesses)
        w = ranked[:, 0] - ranked[:, 1]
        n_lanes = lanes_shape[0] * lanes_shape[1]
        w = jnp.pad(w, (0, n_lanes - w.shape[0]))
        return w.reshape(lanes_shape)

    def _update_fn(self, theta, opt_state, sens, sigma, seeds, fitnesses,
                   stepsize, l2coeff):
        """Regenerate deltas from seeds and aggregate the rank-weighted
        gradient. fitnesses: (F, 2) pos/neg."""
        weights = self._pair_weights(fitnesses, seeds.shape)

        def chunk_grad(xs):
            w_c, seeds_c = xs
            deltas = jax.vmap(lambda s: self._delta(theta, sens, sigma, s))(seeds_c)
            return jnp.einsum(
                "f,fd->d", w_c, deltas, preferred_element_type=jnp.float32
            )

        grad = jax.lax.map(chunk_grad, (weights, seeds)).sum(0)
        return self._apply_grad(theta, opt_state, grad, fitnesses.size,
                                stepsize, l2coeff)

    def _update_with_deltas_fn(self, theta, opt_state, deltas, fitnesses,
                               stepsize, l2coeff):
        """Fast path: deltas (n, c, dim) carried over from the eval sweep —
        the gradient is a single einsum instead of a full noise regeneration."""
        weights = self._pair_weights(fitnesses, deltas.shape[:2])
        grad = jnp.einsum(
            "nc,ncd->d", weights, deltas, preferred_element_type=jnp.float32
        )
        return self._apply_grad(theta, opt_state, grad, fitnesses.size,
                                stepsize, l2coeff)

    @staticmethod
    def _fitness_of(art):
        """Scalar fitness from a rollout's return (tasks that score on
        device return either the scalar itself or {'fitness': scalar})."""
        return art["fitness"] if isinstance(art, dict) else art

    def _traced_sens(self, theta, sens_idx, consts, seed0=None):
        """In-program SM-G sensitivity of the current theta over the
        generation's (subsampled) batch rows — postprocessed exactly like
        the host path (clamp at underflow, divide by it). ``seed0`` is the
        generation's member-0 seed, consumed only when
        tpu.sensitivity_probes is set (probe-key derivation identical to
        the host path's — ops/sensitivity.probe_key_from_seed)."""
        from ..ops.sensitivity import (
            abs_sens_traced,
            postprocess,
            probe_key_from_seed,
            sum_sens_probes_traced,
            sum_sens_traced,
        )

        fwd = self.task.sensitivity_forward
        if self.mutation is MutationKind.SAFE_GRAD_SUM:
            if self._sens_probes:
                raw = sum_sens_probes_traced(
                    fwd, theta, sens_idx, consts,
                    probe_key_from_seed(self._mk_key, seed0),
                    self._sens_probes, self._sens_precision,
                )
            else:
                raw = sum_sens_traced(fwd, theta, sens_idx, consts,
                                      self._sens_precision)
        else:
            raw = abs_sens_traced(fwd, theta, sens_idx, consts)
        return postprocess(raw, self._sens_underflow)

    def _generation_fn(self, theta, opt_state, sens, sigma, seeds, idx,
                       sens_idx, stepsize, l2coeff, consts, n_pairs):
        """One whole NES generation as a single program: perturb + rollout +
        on-device fitness for every antithetic pair, centered-rank weights,
        rank-weighted gradient, optimizer step. The gradient phase
        REGENERATES the noise from the seeds instead of carrying the (F, dim)
        delta matrix across the lax.map (the stacked carry forced ~3.3 GB of
        HBM traffic, ~70 ms/generation measured; regeneration costs ~3 ms).
        Fitnesses + ratio are packed into one small vector so callers pay a
        single host sync (each sync costs a ~30 ms RTT on the tunnel this
        harness runs through, which dwarfs any payload).

        With a decode layout available, the whole generation runs in the
        kernel's own parameter order: theta and the noise scale are laid out
        ONCE, each member's delta is scale_dec * N(0,1) (one elementwise
        pass, no transposed materializations), and the gradient comes back
        through the linear from_dec — exactly equivalent math per member
        (tests/test_decode_layout.py)."""
        if self.inline_sens:
            sens = self._traced_sens(theta, sens_idx, consts,
                                     seed0=seeds.reshape(-1)[0])
        lay = self._layout
        if lay is None:
            base_vec = theta
            delta_of = lambda seed: self._delta(theta, sens, sigma, seed)  # noqa: E731
            rollout = lambda v, i, key: self.task.rollout(  # noqa: E731
                v, i, key=key, consts=consts)
            finish_grad = lambda g: g  # noqa: E731
        else:
            base_vec = lay.to_dec(theta)
            scale_dec = lay.to_dec(
                self._scale_vec(theta, sens, sigma), pad_scale=0.0
            )
            # one shared rounding to the storage dtype: eval and gradient
            # both consume THIS value, so bf16 storage keeps the estimator
            # self-consistent (f32 astype is a bitwise no-op)
            delta_of = lambda seed: (scale_dec * jax.random.normal(  # noqa: E731
                self._mk_key(seed), (lay.dim_dec,), jnp.float32
            )).astype(self._delta_dtype)
            rollout = lambda v, i, key: self.task.rollout_dec(  # noqa: E731
                v, i, key=key, consts=consts)
            finish_grad = lay.from_dec

        scale_params = None
        if lay is not None and self._kernel_perturb:
            # both signs in one kernel call, perturbation applied in-kernel
            # (greedy kinds only — no decode key to thread); base params
            # prepped ONCE per generation instead of per rollout
            base_params = self.task.pair_base_params(base_vec)

            if self._kernel_noise and getattr(
                self.task, "supports_kernel_noise", False
            ):
                # delta generated IN the kernel from (seed, scale): only the
                # uint32 seed crosses into each pair's call; scale is shaped
                # once per generation. The support property is re-read at
                # trace time: tests flip the task into interpret mode after
                # constructing the engine, and the chip PRNG cannot lower
                # there.
                scale_params = self.task.pair_base_params(scale_dec)

                def pair(seed, idx_i):
                    return self.task.rollout_pair_rng(
                        base_params, scale_params, seed, idx_i, consts=consts
                    )
            else:
                def pair(seed, idx_i):
                    return self.task.rollout_pair_dec(
                        base_params, delta_of(seed), idx_i, consts=consts
                    )
        else:
            def pair(seed, idx_i):
                delta = delta_of(seed)
                base = self._mk_key(seed)
                pos = self._fitness_of(rollout(
                    base_vec + delta, idx_i, key=jax.random.fold_in(base, 1)))
                neg = self._fitness_of(rollout(
                    base_vec - delta, idx_i, key=jax.random.fold_in(base, 2)))
                return jnp.stack([pos, neg])

        fits = jax.lax.map(
            lambda xs: jax.vmap(pair)(*xs), (seeds, idx)
        )  # (n, c, 2)
        fitnesses = fits.reshape(-1, 2)[:n_pairs]

        weights = self._pair_weights(fitnesses, seeds.shape)

        if scale_params is not None:
            # kernel-noise gradient: regenerate each pair's delta in VMEM
            # from its seed (bitwise the streams the eval kernel consumed)
            # and accumulate w_i * delta_i on the fly — the (F, dim) delta
            # matrix never exists, in HBM or anywhere else
            from ..ops.decode_pallas import pair_grad_rng

            g_dict = pair_grad_rng(
                scale_params, seeds.reshape(-1), weights.reshape(-1),
            )
            grad = finish_grad(lay.flat_dec(g_dict))
        else:
            def chunk_grad(xs):
                w_c, seeds_c = xs
                d = jax.vmap(delta_of)(seeds_c)
                return jnp.einsum("f,fd->d", w_c, d,
                                  preferred_element_type=jnp.float32)

            grad = finish_grad(
                jax.lax.map(chunk_grad, (weights, seeds)).sum(0))
        opt_state, theta, ratio = self._apply_grad(
            theta, opt_state, grad, fitnesses.size, stepsize, l2coeff
        )
        # mean |theta| rides along so the master's NormMean stat needs no
        # 11.6 MB theta pull per generation
        norm = jnp.abs(theta).mean()
        packed = jnp.concatenate(
            [fitnesses.reshape(-1), ratio.reshape(1), norm.reshape(1)]
        )
        return theta, opt_state, packed

    def _generation_block_fn(self, theta, opt_state, sens, sigma, seeds, idx,
                             sens_idx, stepsize, l2coeff, consts, n_pairs):
        """K chained generations in one program (seeds (K, n, c),
        idx (K, n, c, B), sens_idx (K, B_s)) — identical math to K
        sequential generation() dispatches; exists because one dispatch
        costs ~100 ms through this harness's tunnel, dwarfing the ~20 ms
        device compute. With inline_sens each step recomputes the SM-G
        sensitivity from its carried theta and its own batch rows — the
        per-generation host choreography replayed on device (the host-sens
        path cannot block: its sensitivity is fixed at block entry)."""

        def step(carry, xs):
            th, st = carry
            th, st, packed = self._generation_fn(
                th, st, sens, sigma, xs[0], xs[1], xs[2], stepsize, l2coeff,
                consts, n_pairs
            )
            return (th, st), packed

        (theta, opt_state), packs = jax.lax.scan(
            step, (theta, opt_state), (seeds, idx, sens_idx)
        )
        return theta, opt_state, packs  # (K, 2F+2)

    def _generation_val_block_fn(self, theta, opt_state, sens, sigma, seeds,
                                 idx, sens_idx, e_rows, e_scores, stepsize,
                                 l2coeff, consts, vconsts, n_pairs):
        """K chained generations with IN-PROGRAM per-generation validation
        and podium maintenance (tpu.fused_validation — the fused ES
        treatment applied to NES): each scan step validates its PRE-update
        theta (``task.validate_device``, the reference's one-eval-per-
        generation cadence, nic_nes/iteration.py:49-50), merges it into the
        device-resident (E, dim) podium with ``Podium.record_elites``' exact
        semantics (stable desc sort, incumbents first so ties keep the
        incumbent), then runs the generation update. Blocks therefore no
        longer end at validation boundaries: reference-cadence validation
        (val_freq=1) runs at block dispatch rates, and the per-generation
        host validation choreography (its own multi-dispatch decode+score)
        disappears. Per-generation output row: [fitnesses (2F), ratio,
        norm, val, post-merge elite scores (E)] — one packed pull per
        block; the merged elite ROWS stay device-resident (the host settles
        slot files lazily, see NESMaster._materialize_podium)."""
        from .es import podium_merge

        E = e_rows.shape[0]

        def step(carry, xs):
            th, st, er, es = carry
            val = jnp.asarray(
                self.task.validate_device(th, vconsts), jnp.float32
            )
            if E:
                er, es = podium_merge(er, es, th[None, :], val.reshape(1))
            th, st, packed = self._generation_fn(
                th, st, sens, sigma, xs[0], xs[1], xs[2], stepsize, l2coeff,
                consts, n_pairs
            )
            row = jnp.concatenate([packed, val.reshape(1), es])
            return (th, st, er, es), row

        (theta, opt_state, e_rows, e_scores), packs = jax.lax.scan(
            step, (theta, opt_state, e_rows, e_scores),
            (seeds, idx, sens_idx),
        )
        return theta, opt_state, e_rows, packs  # packs (K, 2F+3+E)


    # _out_shardings inherited from PopulationEngine

    # ---- host entry points ----------------------------------------------------------

    def generation(self, theta, opt_state, sens, sigma, seeds: np.ndarray,
                   idx: np.ndarray, stepsize: float, l2coeff: float):
        """Fused path for tasks whose fitness is computed on device
        (task.fitness_on_device). Returns (theta, opt_state, packed) where
        theta/opt_state are device handles usable for the NEXT generation
        without any host sync, and ``unpack(packed, F)`` yields
        (fitnesses (F, 2), ratio, norm) at the cost of one sync — callers
        may defer it to overlap the RTT with the next generation's compute."""
        F = seeds.shape[0]
        n_chunks, chunk = self._plan(F)
        seeds_d = self._lay_out(seeds.astype(np.uint32), n_chunks, chunk)
        idx_d = self._lay_out(idx.astype(np.int32), n_chunks, chunk)
        if not hasattr(self, "_generation_jit"):
            self._generation_jit = jax.jit(
                self._generation_fn, static_argnames=("n_pairs",),
                out_shardings=self._out_shardings(),
            )
        sc = lambda v: self._replicated(np.float32(v))  # noqa: E731
        return self._generation_jit(
            theta, opt_state, sens, sc(sigma), seeds_d, idx_d,
            self._replicated(self._sens_idx_rows(idx[0:1])[0]),
            sc(stepsize), sc(l2coeff),
            self.task.device_consts(), n_pairs=F,
        )

    def _sens_idx_rows(self, idx_members0: np.ndarray) -> np.ndarray:
        """host (K, B) member-0 batch rows -> host (K, B_s) int32 rows for
        the in-program sensitivity sweep (the host path's sensitivity batch:
        member 0's row, tpu.sensitivity_batch-subsampled). (K, 1) zeros when
        sensitivities are not inlined — the operand is unused and DCE'd."""
        if not self.inline_sens:
            return np.zeros((idx_members0.shape[0], 1), np.int32)
        from ..ops.sensitivity import subsample_batch_rows

        return np.stack([
            subsample_batch_rows(r, self._sens_batch) for r in idx_members0
        ]).astype(np.int32)

    def _lay_block(self, a: np.ndarray, n_chunks: int, chunk: int):
        """Block-path member layout, shared by both block entry points:
        (K, F, ...) host array -> (K, n_chunks, chunk, ...), padded by
        repeating the last member, population-sharded over the mesh."""
        from ..parallel.mesh import pop_axis_size, shard_population

        K = a.shape[0]
        pad = n_chunks * chunk - a.shape[1]
        if pad:
            a = np.concatenate([a, np.repeat(a[:, -1:], pad, axis=1)], axis=1)
        a = a.reshape(K, n_chunks, chunk, *a.shape[2:])
        if self.mesh is None or pop_axis_size(self.mesh) == 1:
            return a
        return shard_population(self.mesh, a, axis=2)

    def generation_block(self, theta, opt_state, sens, sigma,
                         seeds: np.ndarray, idx: np.ndarray,
                         stepsize: float, l2coeff: float):
        """K generations per dispatch. seeds (K, F), idx (K, F, B); returns
        (theta, opt_state, packs (K, 2F+2) device handle)."""
        K, F = seeds.shape
        n_chunks, chunk = self._plan(F)
        seeds_d = self._lay_block(seeds.astype(np.uint32), n_chunks, chunk)
        idx_d = self._lay_block(idx.astype(np.int32), n_chunks, chunk)
        if not hasattr(self, "_generation_block_jit"):
            self._generation_block_jit = jax.jit(
                self._generation_block_fn, static_argnames=("n_pairs",),
                out_shardings=self._out_shardings(),
            )
        sc = lambda v: self._replicated(np.float32(v))  # noqa: E731
        return self._generation_block_jit(
            theta, opt_state, sens, sc(sigma), seeds_d, idx_d,
            self._replicated(self._sens_idx_rows(idx[:, 0])),
            sc(stepsize), sc(l2coeff), self.task.device_consts(), n_pairs=F,
        )

    def generation_val_block(self, theta, opt_state, sens, sigma,
                             seeds: np.ndarray, idx: np.ndarray,
                             stepsize: float, l2coeff: float,
                             e_rows, e_scores: np.ndarray):
        """K generations per dispatch with in-program validation + podium
        (tpu.fused_validation). seeds (K, F), idx (K, F, B); e_rows the
        (E, dim) device-resident podium rows (zeros for unfilled slots),
        e_scores (E,) float32 slot scores (-inf unfilled). Returns (theta,
        opt_state, e_rows, packs (K, 2F+3+E) device handle)."""
        K, F = seeds.shape
        n_chunks, chunk = self._plan(F)
        seeds_d = self._lay_block(seeds.astype(np.uint32), n_chunks, chunk)
        idx_d = self._lay_block(idx.astype(np.int32), n_chunks, chunk)
        if not hasattr(self, "_generation_val_block_jit"):
            self._generation_val_block_jit = jax.jit(
                self._generation_val_block_fn, static_argnames=("n_pairs",),
                out_shardings=self._out_shardings(),
            )
        sc = lambda v: self._replicated(np.float32(v))  # noqa: E731
        return self._generation_val_block_jit(
            theta, opt_state, sens, sc(sigma), seeds_d, idx_d,
            self._replicated(self._sens_idx_rows(idx[:, 0])),
            e_rows, self._replicated(np.asarray(e_scores, np.float32)),
            sc(stepsize), sc(l2coeff), self.task.device_consts(),
            self.task.device_val_consts(), n_pairs=F,
        )

    @staticmethod
    def unpack(packed, F: int):
        """(fitnesses (F, 2), ratio, mean|theta|) — one host sync. Accepts a
        (2F+2,) vector or a (K, 2F+2) block (leading axis preserved)."""
        arr = np.asarray(packed)
        fits = arr[..., :-2].reshape(*arr.shape[:-1], F, 2)
        return fits, arr[..., -2], arr[..., -1]

    @staticmethod
    def unpack_val(packed, F: int, E: int):
        """Block rows from generation_val_block: (fitnesses (K, F, 2),
        ratio (K,), norm (K,), val (K,), post-merge elite scores (K, E)) —
        one host sync."""
        arr = np.asarray(packed)
        fits = arr[..., : 2 * F].reshape(*arr.shape[:-1], F, 2)
        off = 2 * F
        etops = arr[..., off + 3:] if E else arr[..., :0]
        return (fits, arr[..., off], arr[..., off + 1], arr[..., off + 2],
                etops)

    def eval_generation(self, theta, sens, sigma, seeds: np.ndarray,
                        idx: np.ndarray):
        """seeds (F,), idx (F, B) -> (artifacts with leaves (F, 2, ...),
        device-resident deltas handle or None). Pass the handle back to
        ``update`` to skip the noise regeneration."""
        F = seeds.shape[0]
        n_chunks, chunk = self._plan(F)
        with_deltas = n_chunks * chunk * self.dim * 4 <= self.DELTA_BYTES_LIMIT
        seeds_d = self._lay_out(seeds.astype(np.uint32), n_chunks, chunk)
        idx_d = self._lay_out(idx.astype(np.int32), n_chunks, chunk)
        out, deltas = self._eval_jit(
            theta, sens, self._replicated(np.float32(sigma)), seeds_d, idx_d,
            self.task.device_consts(), with_deltas=with_deltas,
        )
        return self._unchunk(out, F), deltas

    def update(self, theta, opt_state, sens, sigma, seeds: np.ndarray,
               fitnesses: np.ndarray, stepsize: float, l2coeff: float,
               deltas=None):
        if deltas is not None:
            return self._update_deltas_jit(
                theta, opt_state, deltas,
                jnp.asarray(fitnesses, jnp.float32),
                jnp.float32(stepsize), jnp.float32(l2coeff),
            )
        F = seeds.shape[0]
        n_chunks, chunk = self._plan(F)
        seeds_d = self._lay_out(seeds.astype(np.uint32), n_chunks, chunk)
        sc = lambda v: self._replicated(np.float32(v))  # noqa: E731
        return self._update_jit(
            theta, opt_state, sens, sc(sigma),
            seeds_d, self._replicated(np.asarray(fitnesses, np.float32)),
            sc(stepsize), sc(l2coeff),
        )


def _load_sensitivity_file(path: str) -> np.ndarray:
    """Load a precomputed SM-VECTOR sensitivity (.pt torch tensor or .npy —
    reference: src/algorithm/safe_mutations.py:28-32)."""
    if path.endswith(".npy"):
        return np.load(path)
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(t.detach().numpy() if hasattr(t, "detach") else t)


def setup_log_dir(exp: dict) -> str:
    """logs/{algo}_{dataset}_{net}_{pid} (reference: tools/setup.py:22-25).

    Multi-host: non-primary processes mirror ALL bookkeeping in a private
    scratch directory — the host-side logic (podium files, model writes,
    snapshots) must stay bit-identical across processes or the SPMD
    collectives desync, but only the primary may own the real artifacts on
    the shared filesystem."""
    from ..parallel.multihost import is_primary

    if not is_primary():
        import tempfile

        log_dir = tempfile.mkdtemp(prefix="nes_replica_logdir_")
    else:
        log_dir = exp.get("log_dir") or "logs/{}_{}_{}_{}".format(
            exp["algorithm"], exp["dataset"],
            exp["policy_options"]["net"], os.getpid(),
        )
    mkdir_p(log_dir)
    exp["log_dir"] = log_dir
    return log_dir


class NESMaster:
    """Training driver: owns theta + optimizer state on device and all
    host-side bookkeeping (iteration/statistics/podium/snapshots)."""

    def __init__(self, exp: dict, mesh=None):
        from ..tasks import make_task

        self.exp = exp
        self.config = parse_config(exp)
        self.tpu_cfg = parse_tpu_config(exp)
        setup_log_dir(exp)

        self.task = make_task(exp, self.config, self.tpu_cfg)
        self.it = Iteration(self.config, exp)
        self.stats = Statistics()
        self.experiment = NESExperiment(exp, self.config, self.task)
        self.optimizer = self.experiment.optimizer

        if mesh is None and self.tpu_cfg.mesh_shape:
            mesh = make_mesh(self.tpu_cfg.mesh_shape)
        self.mesh = mesh

        popts = exp.get("policy_options", {})
        mopts = popts.get("model_options", {})
        self.mutation = MutationKind(mopts.get("safe_mutations", "") or "")
        self.engine = NESEngine(
            self.task, self.optimizer, self.mutation,
            mesh=mesh, pop_chunk=self.tpu_cfg.pop_chunk,
            rng_impl=self.tpu_cfg.rng_impl,
            sens_underflow=mopts.get("safe_mutation_underflow", 0.01),
            sens_precision=self.tpu_cfg.sensitivity_precision,
            sens_batch=self.tpu_cfg.sensitivity_batch,
            sens_probes=self.tpu_cfg.sensitivity_probes,
            kernel_perturb=getattr(self.tpu_cfg, "kernel_perturb", "auto"),
            kernel_noise=getattr(self.tpu_cfg, "kernel_noise", "auto"),
            delta_dtype=getattr(self.tpu_cfg, "delta_dtype", "f32"),
        )
        self._init_multihost_placement()

        self._current_dir = mkdir_p(
            os.path.join(self.it.models_dir(), "current")
        )
        self._current_path = os.path.join(self._current_dir, "0_current_params.pth")

        seed = self.tpu_cfg.seed
        self._rng = np.random.default_rng(seed)
        self._last_eval = None
        # tpu.fused_validation state: device-resident podium rows + the
        # deferred-slot-file flag (see _materialize_podium)
        self._elites_dev = None
        self._podium_dirty = False
        self._pending_loader_state = None  # set by a from_infos resume
        self._init_theta(exp)
        self._sampler = None  # built lazily; rebuilt on annealing

        self.opt_state = self._place(
            self.experiment.opt_state or self.optimizer.init(self.engine.dim)
        )
        self.experiment.opt_state = self.opt_state
        self._sens = self._place(jnp.ones((self.engine.dim,), jnp.float32))
        if self.mutation is MutationKind.SAFE_VECTOR:
            self.set_sensitivity_vector(
                _load_sensitivity_file(mopts["safe_mutation_vector"]),
                mopts.get("safe_mutation_underflow", 0.01),
            )

    def _init_multihost_placement(self):
        """Multi-controller runs need every device-resident input as a
        GLOBAL (mesh-replicated or mesh-sharded) array; _place() converts,
        and the task re-homes its datasets. Determinism across processes
        comes from the shared tpu.seed: every host draws identical seed and
        batch-index streams, so the SPMD programs see identical inputs
        (replacing the reference's Redis batch shipping, src/dist.py)."""
        self._multihost = jax.process_count() > 1
        if not self._multihost:
            return
        assert self.mesh is not None and \
            self.mesh.devices.size == jax.device_count(), \
            "multi-host runs need a mesh spanning all global devices"
        assert self.tpu_cfg.seed is not None, \
            "multi-host runs require tpu.seed (hosts must draw identical streams)"
        # SM-G-* works unchanged: the sensitivity jit consumes the global
        # theta + the mesh-placed dataset and its replicated-input output is
        # replicated, so it feeds the eval programs like any placed array
        self.task.place_on_mesh(self.mesh)

    def _place(self, x):
        """Local device array (single-controller) or mesh-replicated global
        array (multi-controller)."""
        if getattr(self, "_multihost", False):
            from ..parallel.multihost import replicate_global

            return jax.tree_util.tree_map(
                lambda a: replicate_global(self.mesh, a), x
            )
        return x

    # ---- init modes (reference: tools/setup.py:33-44) ---------------------------

    def _init_theta(self, exp):
        spec = self.task.spec
        if exp.get("from_infos"):
            import json

            with open(exp["from_infos"]) as f:
                infos = json.load(f)
            self.stats.init_from_infos(infos)
            self.it.init_from_infos(infos)
            self.experiment.init_from_infos(infos)
            from .snapshot import load_loader_state

            self._pending_loader_state = load_loader_state(exp["from_infos"])
            theta = spec.load_pth(infos["current_model"])
        elif exp.get("from_single"):
            theta = spec.load_pth(exp["from_single"])
        else:
            key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))
            theta = np.asarray(self.task.generate_theta(key))
        self.theta = self._place(jnp.asarray(theta, jnp.float32))
        self._write_current_model()

    def _write_current_model(self):
        remove_all_files_from_dir(self._current_dir)
        self.task.spec.save_pth(pull_chunked(self.theta), self._current_path)
        # NES checkpoint state (reference: nic_nes/iteration.py:37-41)
        self.it.extra_state = {"current_model": self._current_path}

    def _podium_would_take(self, score: float) -> bool:
        """Would record_elites copy the current model file? (strict >: ties
        keep incumbents — sorted() is stable with incumbents first.)"""
        elites = self.it.best_elites()
        return any(
            (not path) or score > sc for path, sc in elites
        )

    def current_model(self) -> str:
        return self._current_path

    # ---- per-generation pieces ------------------------------------------------------

    def _pair_count(self) -> int:
        """Exactly ``nb_offspring`` antithetic PAIRS = 2*nb_offspring
        rollouts per generation. In the reference one worker result is one
        (pos, neg) mirrored pair (nic_nes_worker.py:142-161), the master
        counts nb_offspring results (tools/iteration.py:110-112, initialized
        at :173), and ``fitnesses()`` stacks to (nb_offspring, 2)
        (nic_nes/iteration.py:63-67) — so mscoco_nes.json's nb_offspring=2000
        means 2000 pairs = 4000 rollouts. The engine pads sweeps to mesh
        multiples internally, so no pairs are dropped."""
        return max(self.exp["nb_offspring"], 1)

    def loader_state(self) -> dict | None:
        """EpochSampler stream position for the snapshot sidecar (None
        before the first batch draw)."""
        return self._sampler.state_dict() if self._sampler else None

    def _draw_batches(self, F: int, bs: int) -> np.ndarray:
        if self._sampler is None:
            from ..data.core import build_sampler

            self._sampler = build_sampler(
                self.task.train_n, self._rng, self._pending_loader_state)
            self._pending_loader_state = None  # anneal rebuilds start fresh
        if self.config.single_batch:
            row = self._sampler.batch(bs)
            return np.tile(row, (F, 1))
        return self._sampler.member_batches(F, bs)

    def _maybe_sensitivity(self, idx_row: np.ndarray, seed0=None):
        if self.engine.inline_sens:
            # SM-G on the fused path: the generation program recomputes the
            # sensitivity in-program from its own theta + batch rows — the
            # `sens` operand is a dummy there (self._sens stays all-ones)
            return self._sens
        if self.mutation in (MutationKind.SAFE_GRAD_SUM, MutationKind.SAFE_GRAD_ABS):
            from ..ops.sensitivity import (
                calc_sensitivity,
                probe_key_from_seed,
                subsample_batch_rows,
            )

            mopts = self.exp["policy_options"].get("model_options", {})
            underflow = mopts.get("safe_mutation_underflow", 0.01)
            idx_s = subsample_batch_rows(
                idx_row, getattr(self.tpu_cfg, "sensitivity_batch", 0)
            )
            # probe key from the generation's member-0 seed — the same
            # derivation the inline path uses, so both paths stay
            # operand-exact (engine ctor zeroes probes for SM-G-ABS)
            probes = self.engine._sens_probes
            self._sens = calc_sensitivity(
                self.task, self.theta, idx_s, self.mutation, underflow,
                matmul_precision=getattr(
                    self.tpu_cfg, "sensitivity_precision", "float32"
                ),
                probes=probes,
                probe_key=(probe_key_from_seed(self.engine._mk_key,
                                               np.uint32(seed0))
                           if probes else None),
            )
        elif self.mutation is MutationKind.SAFE_VECTOR:
            pass  # set once at startup via set_sensitivity_vector
        return self._sens

    def set_sensitivity_vector(self, vector, underflow: float):
        """SM-VECTOR: precomputed sensitivity, clamped then min-normalized
        (reference: src/algorithm/safe_mutations.py:28-32)."""
        from ..ops.sensitivity import sm_vector_normalize

        self._sens = self._place(
            jnp.asarray(sm_vector_normalize(vector, underflow))
        )

    # ---- tpu.fused_validation (in-program validation + device podium) -----------

    def _val_fused_mode(self) -> bool:
        """Gate for the in-program-validation path (tpu.fused_validation,
        utils/config.py): needs the fused fitness path, a device-validating
        task, reference validation cadence (val_freq=1), and patience=0
        (patience could anneal sigma mid-block; its bad-generation counter
        is host bookkeeping tied to per-generation podium submission)."""
        want = getattr(self.tpu_cfg, "fused_validation", "auto")
        if want is False:
            return False
        capable = (
            self.task.fitness_on_device
            and max(self.tpu_cfg.val_freq, 1) == 1
            and not self.config.patience
            and self.task.device_val_consts() is not None
        )
        if want == "auto":
            return capable and self.tpu_cfg.gens_per_dispatch > 1
        if not capable:
            logger.warning(
                "tpu.fused_validation=true but this run cannot fuse "
                "validation (needs a device-validating task on the fused "
                "fitness path, val_freq=1, patience=0); using host "
                "validation")
        return capable

    def _elite_rows_dev(self):
        """Device-resident podium rows (E, dim), built from the slot files
        on first use; unfilled slots are zero rows whose -inf scores keep
        them inert in the device merge."""
        if self._elites_dev is None:
            spec = self.task.spec
            elites = self.it.best_elites()
            rows = np.zeros((len(elites), self.engine.dim), np.float32)
            for r, (path, _) in enumerate(elites):
                if path and os.path.isfile(path):
                    rows[r] = spec.load_pth(path)
            self._elites_dev = self._place(jnp.asarray(rows))
        return self._elites_dev

    def _elite_scores_f32(self) -> np.ndarray:
        return np.asarray(
            [float(np.float32(s)) if p else -np.inf
             for p, s in self.it.best_elites()],
            np.float32,
        )

    def _materialize_podium(self):
        """Settle deferred podium slot files: pull the device-merged elite
        rows and rewrite the slots so on-disk bytes match the adopted
        scores (mirrors ESMaster._materialize_podium — the eager (E, dim)
        pull measured 6-38 s through this harness's tunnel). MUST run
        before anything reads podium files (snapshot, resume artifacts)."""
        if not self._podium_dirty:
            return
        scores = [s for _, s in self.it.best_elites() if np.isfinite(s)]
        rows = pull_chunked(self._elites_dev)
        self.it.install_merged_podium(
            scores, rows,
            lambda row, path: self.task.spec.save_pth(row, path),
        )
        self._podium_dirty = False

    def _val_fused_step(self, b: int, t_block: float, sigma, seeds, idx,
                        sens, F: int, plot: bool):
        """``b`` chained generations with in-program validation + device
        podium merge: one dispatch, one packed pull. Per-generation host
        bookkeeping is replayed from the pulled rows; the podium's merged
        SCORES are adopted immediately (any entry strictly beats the slot
        it displaces, so 'changed' is detectable from scores alone) while
        the merged rows stay device-resident until _materialize_podium.
        Each generation gets a FRESH validation score of its own pre-update
        theta — the reference's every-generation eval cadence
        (nic_nes/iteration.py:49-50) at block dispatch rates."""
        config, it = self.config, self.it
        E = len(it.best_elites())
        new_theta, new_opt_state, e_rows, packs = \
            self.engine.generation_val_block(
                self.theta, self.opt_state, sens, sigma, seeds, idx,
                self.optimizer.stepsize, config.l2coeff or 0.0,
                self._elite_rows_dev(), self._elite_scores_f32(),
            )
        fits_all, ratios, norms, vals, etops = self.engine.unpack_val(
            packs, F, E
        )  # the block's single host sync
        block_dt = time.time() - t_block
        self.theta, self.opt_state = new_theta, new_opt_state
        # must precede _record_stats: a snapshot serializes
        # experiment.opt_state next to the post-update theta
        self.experiment.opt_state = self.opt_state

        # adopt the merged scoreboard BEFORE the stats loop: blocks end
        # exactly on snapshot iterations, and the k==b-1 snapshot must see
        # the post-merge podium (its slot files settle lazily)
        pre = [float(np.float32(s)) for _, s in it.best_elites()]
        final = [float(s) for s in etops[b - 1]] if E else []
        self._elites_dev = e_rows
        if final != pre:
            it.adopt_merged_scores([s for s in final if np.isfinite(s)])
            self._podium_dirty = True

        for k in range(b):
            if k:
                it.incr_iteration()
                logger.info("********** Iteration %d (chained) **********",
                            it.iteration())
            self._record_stats(
                fits_all[k], ratios[k], [norms[k]], float(vals[k]),
                block_dt / b, plot,
                best_acc=float(etops[k][0]) if E else None,
            )

    def _profile_hook(self, iteration: int):
        """Trace generation 2 with jax.profiler when tpu.profile is set
        (the reference's cProfile launch scripts' role — SURVEY.md §5.1).
        ``_profile_finalize`` closes the trace if the run ends before
        generation 3 is reached (jax only writes on stop_trace)."""
        if not self.tpu_cfg.profile:
            return
        if iteration == 2 and not getattr(self, "_trace_on", False):
            jax.profiler.start_trace(
                os.path.join(self.exp["log_dir"], "profile")
            )
            self._trace_on = True
        elif iteration > 2:
            self._profile_finalize()

    def _profile_finalize(self):
        if getattr(self, "_trace_on", False):
            jax.profiler.stop_trace()
            self._trace_on = False
            logger.info("wrote jax profiler trace for generation 2")

    # ---- main loop ---------------------------------------------------------------------

    @staticmethod
    def _gap_to_next(cur_plus1: int, freq: int, start: int = 0) -> int:
        """Iterations from cur_plus1 (exclusive of events AT cur_plus1) to
        the next multiple-of-freq event after it."""
        if not freq:
            return 1 << 30
        j = max(cur_plus1 + 1, start)
        rem = (j - start) % freq
        return (j + (freq - rem) % freq) - cur_plus1

    def _block_budget(self, fused: bool, gens_left: int,
                      limit: int | None) -> int:
        """Generations chained into the next dispatch. >1 only on the fused
        path with tpu.gens_per_dispatch set and patience disabled; a block
        never contains an interior validation, schedule firing, or snapshot
        (those host-side events only see block-boundary thetas), so the
        event cadence is identical to per-generation driving."""
        b = max(self.tpu_cfg.gens_per_dispatch, 1)
        if not fused or b == 1:
            return 1
        if self.config.patience:
            if not getattr(self, "_block_warned", False):
                self._block_warned = True  # once, not every iteration
                logger.warning(
                    "gens_per_dispatch>1 requires patience=0 (patience may "
                    "anneal sigma mid-block); driving per-generation")
            return 1
        if self.mutation in (MutationKind.SAFE_GRAD_SUM,
                             MutationKind.SAFE_GRAD_ABS) \
                and not self.engine.inline_sens:
            # with inline_sens the block scan recomputes the sensitivity
            # from each step's carried theta + batch, so SM-G blocks are
            # exact; only the host-computed-sens fallback must stay
            # per-generation (its sensitivity is fixed at block entry)
            if not getattr(self, "_block_warned", False):
                self._block_warned = True
                logger.warning(
                    "gens_per_dispatch>1 is incompatible with SM-G-* when "
                    "the sensitivity is host-computed (fixed at block "
                    "entry); driving per-generation")
            return 1
        nxt = self.it.iteration() + 1  # the block's first iteration
        if self.config.schedule_limit and self._gap_to_next(
            nxt - 1, self.config.schedule_limit,
            self.config.schedule_start or 0,
        ) == 1:
            return 1  # this iteration fires the schedule: run it alone
        b = min(b, gens_left)
        if limit:
            b = min(b, limit - self.it.iteration())
        vf = max(self.tpu_cfg.val_freq, 1)
        if getattr(self, "_val_fused", False):
            pass  # every generation validates in-program: no val boundary
        elif vf == 1:
            return 1  # per-generation validation = per-generation dispatch
        else:
            b = min(b, self._gap_to_next(nxt, vf))
        if self.config.schedule_limit:
            b = min(b, self._gap_to_next(
                nxt, self.config.schedule_limit,
                self.config.schedule_start or 0,
            ))
        if self.config.snapshot_freq:
            # a snapshot writes the post-update theta of its generation:
            # end the block exactly on the snapshot iteration
            b = min(b, self._gap_to_next(nxt - 1, self.config.snapshot_freq))
        b = max(b, 1)
        # round down to a power of two: every distinct block size K is a
        # separate XLA program (a cold compile costs minutes on this
        # harness), so misaligned val/snapshot cadences must not generate
        # K = 7, 5, 3, ... one-off programs — the set is bounded at
        # {1, 2, 4, ..., gens_per_dispatch} and trajectories are unaffected
        # (block size never changes the math, tested)
        return 1 << (b.bit_length() - 1)

    def _record_eval(self, eval_score, fresh: bool = True):
        """Eval-result + podium bookkeeping. MUST run while self.theta is
        the pre-update model of the generation the score belongs to: the
        podium copies the current-model file immediately, and the reference
        pairs eval scores with the pre-update .pth (nic_nes_worker.py:92-113).

        ``fresh=False`` — the score is CARRIED from an earlier validation
        (interior chained-block generations, or any tpu.val_freq > 1
        generation on either path whose iteration isn't a validation
        iteration): record the eval for bookkeeping but do NOT submit to
        the podium — one submission per validation, and a submission here
        could pair the carried score with theta bytes from a later
        generation whenever the scoreboard has open capacity. The patience
        trigger consequently ticks only on fresh validations (with
        val_freq == 1, i.e. reference cadence, that is every generation;
        blocks guarantee patience off)."""
        if not fresh:
            self.it.record_eval_result(0, self._current_path, eval_score)
            return
        if self._podium_would_take(eval_score):
            self._write_current_model()
        self.it.record_eval_result(0, self._current_path, eval_score)
        self.it.process_evaluated_elites()

    def _record_stats(self, fitnesses, ratio, norm_vec, eval_score, dt, plot,
                      best_acc=None):
        """Stats + snapshot for one completed generation. Runs AFTER the
        update: the snapshot's current_model is the post-update theta (the
        reference's resume point). ``best_acc`` overrides the best-elite
        score for val-fused blocks (interior generations' podium states
        exist only inside the device scan; the host scoreboard holds the
        block-end merge)."""
        config, it, stats = self.config, self.it, self.stats
        stats.record_update_ratio(float(ratio))
        stats.record_score_stats(np.asarray(fitnesses).ravel())
        stats.record_bs_stats(it.batch_size())
        stats.record_step_time_stats(dt=dt)
        stats.record_norm_stats(norm_vec)
        stats.record_acc_stats(eval_score)
        stats.record_best_acc_stats(
            it.best_elites()[0][1] if best_acc is None else best_acc
        )
        stats.record_std_stats(it.noise_stdev())
        stats.update_mem_stats()
        stats.log_stats()
        it.log_stats()

        if config.snapshot_freq and it.iteration() % config.snapshot_freq == 0:
            self._materialize_podium()  # z_info references podium slots
            self._write_current_model()  # z_info references this file
            save_snapshot(stats, it, self.experiment,
                          loader_state=self.loader_state())
            self._last_snapshot_iter = it.iteration()
            if plot:
                stats.plot_stats(self.experiment.snapshot_dir())

    def run_master(self, plot: bool = False, max_iterations: int | None = None):
        config, it, stats = self.config, self.it, self.stats
        limit = max_iterations or config.max_nb_iterations
        F = self._pair_count()
        fused = self.task.fitness_on_device
        val_freq = max(self.tpu_cfg.val_freq, 1)
        self._val_fused = self._val_fused_mode()
        if self._val_fused:
            logger.info("fused validation: in-program per-generation "
                        "validation + device-resident podium")

        while not limit or it.iteration() < limit:
            it.incr_epoch()
            gens = max(self.task.train_n // it.batch_size(), 1)
            done = 0
            while done < gens and (not limit or it.iteration() < limit):
                b = self._block_budget(fused, gens - done, limit)
                done += b
                it.incr_iteration()
                stats.set_step_tstart()
                t_block = time.time()
                logger.info("********** Iteration %d%s **********",
                            it.iteration(),
                            f" (+{b - 1} chained)" if b > 1 else "")
                self._profile_hook(it.iteration())

                sigma, bs = it.get_noise_stdev(), it.batch_size()
                # per-generation draws in stream order, so the RNG sequence
                # (and thus the trajectory) is identical for every block size
                seeds = np.empty((b, F), np.uint32)
                idx = None
                for k in range(b):
                    seeds[k] = self._rng.integers(0, 2**32, size=F,
                                                  dtype=np.uint32)
                    row = self._draw_batches(F, bs)
                    if idx is None:
                        idx = np.empty((b, *row.shape), row.dtype)
                    idx[k] = row
                sens = self._maybe_sensitivity(idx[0, 0], seed0=seeds[0, 0])

                if fused and self._val_fused:
                    # validation + podium merge run inside the block program
                    self._val_fused_step(b, t_block, sigma, seeds, idx,
                                         sens, F, plot)
                    if it.patience_reached() or it.schedule_reached():
                        if config.stepsize_divisor:
                            self.optimizer.stepsize /= config.stepsize_divisor
                        self._sampler = None
                        break  # rebuild the epoch at the new batch size
                    continue

                if fused:
                    # b generations in one dispatch, one host sync
                    new_theta, new_opt_state, packs = self.engine.generation_block(
                        self.theta, self.opt_state, sens, sigma, seeds, idx,
                        self.optimizer.stepsize, config.l2coeff or 0.0,
                    )
                else:
                    artifacts, deltas = self.engine.eval_generation(
                        self.theta, sens, sigma, seeds[0], idx[0]
                    )
                    fitnesses = self.task.host_fitness(artifacts, idx[0])

                # one validation eval per generation on the pre-update model
                # (the reference blocks until >=1 eval result per generation,
                # nic_nes/iteration.py:49-50); tpu.val_freq > 1 thins this to
                # every k generations (documented deviation, carrying the
                # last score in between). self.theta is still the block-start
                # (pre-update) model here. fresh_val gates the podium on BOTH
                # paths: a carried score must never be (re)submitted — the
                # scoreboard could pair it with theta bytes from a later
                # generation whenever it has open capacity.
                fresh_val = (it.iteration() % val_freq == 0
                             or self._last_eval is None)
                if fresh_val:
                    self._last_eval = self.task.validate(self.theta)
                eval_score = self._last_eval

                if fused:
                    # podium for the block's first generation sees the
                    # pre-update (block-start) theta
                    self._record_eval(eval_score, fresh=fresh_val)
                    fits_all, ratios, norms = self.engine.unpack(packs, F)
                    block_dt = time.time() - t_block
                    self.theta, self.opt_state = new_theta, new_opt_state
                    # must precede _record_stats: a snapshot serializes
                    # experiment.opt_state next to the post-update theta
                    # (blocks end exactly on snapshot iterations)
                    self.experiment.opt_state = self.opt_state
                    for k in range(b):
                        if k:
                            it.incr_iteration()
                            logger.info("********** Iteration %d (chained) "
                                        "**********", it.iteration())
                            # carried score: bookkeeping only, no podium
                            self._record_eval(eval_score, fresh=False)
                        self._record_stats(
                            fits_all[k], ratios[k], [norms[k]], eval_score,
                            block_dt / b, plot,
                        )
                else:
                    # pre-update theta; carried scores (tpu.val_freq > 1)
                    # are bookkeeping-only — same guard as the block path
                    self._record_eval(eval_score, fresh=fresh_val)
                    self.opt_state, self.theta, ratio = self.engine.update(
                        self.theta, self.opt_state, sens, sigma, seeds[0],
                        fitnesses, self.optimizer.stepsize,
                        config.l2coeff or 0.0, deltas=deltas,
                    )
                    self.experiment.opt_state = self.opt_state  # pre-snapshot
                    self._record_stats(
                        fitnesses, ratio, np.asarray(self.theta), eval_score,
                        time.time() - t_block, plot,
                    )

                if it.patience_reached() or it.schedule_reached():
                    if config.stepsize_divisor:
                        self.optimizer.stepsize /= config.stepsize_divisor
                    self._sampler = None  # rebuilt at the new batch size
                    break  # rebuild the epoch at the new batch size

        self._profile_finalize()  # in case the run ended at generation 2
        # skip the final snapshot when the loop's freq snapshot just wrote
        # this exact iteration (identical z_info, repeated podium/model
        # materialization)
        if getattr(self, "_last_snapshot_iter", None) != it.iteration():
            self._materialize_podium()  # settle deferred podium slot files
            self._write_current_model()
            save_snapshot(stats, it, self.experiment,
                          loader_state=self.loader_state())
            if plot:
                stats.plot_stats(self.experiment.snapshot_dir())
        return self.theta
