"""NIC-NES: natural evolution strategy as a single SPMD program.

Reference behavior (src/algorithm/nic_nes/): one parameter vector theta;
nb_offspring/2 antithetic Gaussian perturbation pairs are fitness-evaluated
on minibatches; centered-rank weights produce a gradient estimate
``sum_i (rank_pos_i - rank_neg_i) * delta_i / nb_offspring`` that updates
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
from functools import partial

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
from ..parallel.mesh import make_mesh
from ..utils.config import parse_config, parse_tpu_config
from ..utils.files import mkdir_p, remove_all_files_from_dir

logger = logging.getLogger(__name__)

__all__ = ["NESEngine", "NESMaster"]


class NESEngine(PopulationEngine):
    """Device-side math for one NES generation. Pure w.r.t. all inputs, so
    the same object also backs the multi-chip dry-run and the benchmark."""

    def __init__(self, task, optimizer, mutation: MutationKind, mesh=None,
                 pop_chunk: int = 0):
        super().__init__(task, mesh=mesh, pop_chunk=pop_chunk)
        self.optimizer = optimizer
        self.mutation = mutation

        self._eval_jit = jax.jit(self._eval_fn, static_argnames=("with_deltas",))
        self._update_jit = jax.jit(self._update_fn)
        self._update_deltas_jit = jax.jit(self._update_with_deltas_fn)

    # deltas kept as an eval output (skipping their regeneration in the
    # update) while the (F, dim) matrix fits comfortably in HBM
    DELTA_BYTES_LIMIT = 4 << 30

    # ---- device fns ----------------------------------------------------------------

    def _delta(self, theta, sens, sigma, seed):
        noise = gaussian_noise(jax.random.key(seed), self.dim, sigma)
        return shape_noise(
            noise, theta,
            sensitivity=sens if self.mutation.is_safe else None,
            proportional=self.mutation.is_proportional,
        )

    def _eval_fn(self, theta, sens, sigma, seeds, idx, with_deltas=False):
        """seeds (n,c) uint32, idx (n,c,B) int32 ->
        (artifacts pytree with leaves (n, c, 2, ...), deltas or None)."""

        def pair(seed, idx_i):
            delta = self._delta(theta, sens, sigma, seed)
            base = jax.random.key(seed)
            pos = self.task.rollout(theta + delta, idx_i,
                                    key=jax.random.fold_in(base, 1))
            neg = self.task.rollout(theta - delta, idx_i,
                                    key=jax.random.fold_in(base, 2))
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

    def _generation_fn(self, theta, opt_state, sens, sigma, seeds, idx,
                       stepsize, l2coeff, n_pairs, with_deltas):
        """One whole NES generation as a single program: perturb + rollout +
        on-device fitness for every antithetic pair, centered-rank weights,
        rank-weighted gradient, optimizer step. Only the (F, 2) fitness
        matrix and the update ratio leave the device — one host sync per
        generation (each sync costs a ~30 ms RTT on the tunnel this harness
        runs through, which dwarfs the payload)."""

        def pair(seed, idx_i):
            delta = self._delta(theta, sens, sigma, seed)
            base = jax.random.key(seed)
            pos = self._fitness_of(self.task.rollout(
                theta + delta, idx_i, key=jax.random.fold_in(base, 1)))
            neg = self._fitness_of(self.task.rollout(
                theta - delta, idx_i, key=jax.random.fold_in(base, 2)))
            return jnp.stack([pos, neg]), (delta if with_deltas else 0)

        fits, deltas = jax.lax.map(
            lambda xs: jax.vmap(pair)(*xs), (seeds, idx)
        )  # fits (n, c, 2)
        fitnesses = fits.reshape(-1, 2)[:n_pairs]

        weights = self._pair_weights(fitnesses, seeds.shape)
        if with_deltas:
            grad = jnp.einsum("nc,ncd->d", weights, deltas,
                              preferred_element_type=jnp.float32)
        else:
            def chunk_grad(xs):
                w_c, seeds_c = xs
                d = jax.vmap(lambda s: self._delta(theta, sens, sigma, s))(seeds_c)
                return jnp.einsum("f,fd->d", w_c, d,
                                  preferred_element_type=jnp.float32)

            grad = jax.lax.map(chunk_grad, (weights, seeds)).sum(0)
        opt_state, theta, ratio = self._apply_grad(
            theta, opt_state, grad, fitnesses.size, stepsize, l2coeff
        )
        return theta, opt_state, fitnesses, ratio

    # ---- host entry points ----------------------------------------------------------

    def generation(self, theta, opt_state, sens, sigma, seeds: np.ndarray,
                   idx: np.ndarray, stepsize: float, l2coeff: float):
        """Fused path for tasks whose fitness is computed on device
        (task.fitness_on_device): returns (theta, opt_state,
        fitnesses (F, 2) np.ndarray, ratio)."""
        F = seeds.shape[0]
        n_chunks, chunk = self._plan(F)
        with_deltas = n_chunks * chunk * self.dim * 4 <= self.DELTA_BYTES_LIMIT
        seeds_d = self._lay_out(seeds.astype(np.uint32), n_chunks, chunk)
        idx_d = self._lay_out(idx.astype(np.int32), n_chunks, chunk)
        if not hasattr(self, "_generation_jit"):
            self._generation_jit = jax.jit(
                self._generation_fn,
                static_argnames=("n_pairs", "with_deltas"),
            )
        theta, opt_state, fits, ratio = self._generation_jit(
            theta, opt_state, sens, jnp.float32(sigma), seeds_d, idx_d,
            jnp.float32(stepsize), jnp.float32(l2coeff),
            n_pairs=F, with_deltas=with_deltas,
        )
        return theta, opt_state, np.asarray(fits), float(ratio)

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
            theta, sens, jnp.float32(sigma), seeds_d, idx_d,
            with_deltas=with_deltas,
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
        return self._update_jit(
            theta, opt_state, sens, jnp.float32(sigma),
            seeds_d, jnp.asarray(fitnesses, jnp.float32),
            jnp.float32(stepsize), jnp.float32(l2coeff),
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
    """logs/{algo}_{dataset}_{net}_{pid} (reference: tools/setup.py:22-25)."""
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
        )

        self._current_dir = mkdir_p(
            os.path.join(self.it.models_dir(), "current")
        )
        self._current_path = os.path.join(self._current_dir, "0_current_params.pth")

        seed = self.tpu_cfg.seed
        self._rng = np.random.default_rng(seed)
        self._last_eval = None
        self._model_written = False
        self._init_theta(exp)
        self._sampler = None  # built lazily; rebuilt on annealing

        self.opt_state = self.experiment.opt_state or self.optimizer.init(
            self.engine.dim
        )
        self.experiment.opt_state = self.opt_state
        self._sens = jnp.ones((self.engine.dim,), jnp.float32)
        if self.mutation is MutationKind.SAFE_VECTOR:
            self.set_sensitivity_vector(
                _load_sensitivity_file(mopts["safe_mutation_vector"]),
                mopts.get("safe_mutation_underflow", 0.01),
            )

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
            theta = spec.load_pth(infos["current_model"])
        elif exp.get("from_single"):
            theta = spec.load_pth(exp["from_single"])
        else:
            key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))
            theta = np.asarray(self.task.generate_theta(key))
        self.theta = jnp.asarray(theta, jnp.float32)
        self._write_current_model()

    def _write_current_model(self):
        remove_all_files_from_dir(self._current_dir)
        self.task.spec.save_pth(np.asarray(self.theta), self._current_path)
        self._model_written = True
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
        """Exactly nb_offspring/2 antithetic pairs — the engine pads sweeps
        to mesh multiples internally, so no offspring are dropped (the
        reference evaluates exactly nb_offspring results,
        nic_nes_master.py:92-118)."""
        nb = self.exp["nb_offspring"]
        if nb % 2:
            logger.warning(
                "nb_offspring=%d is odd; evaluating %d (antithetic pairs)",
                nb, nb - 1,
            )
        return max(nb // 2, 1)

    def _draw_batches(self, F: int, bs: int) -> np.ndarray:
        from ..data.core import EpochSampler

        if self._sampler is None:
            self._sampler = EpochSampler(
                self.task.train_n, seed=int(self._rng.integers(0, 2**31 - 1))
            )
        if self.config.single_batch:
            row = self._sampler.batch(bs)
            return np.tile(row, (F, 1))
        return self._sampler.member_batches(F, bs)

    def _maybe_sensitivity(self, idx_row: np.ndarray):
        if self.mutation in (MutationKind.SAFE_GRAD_SUM, MutationKind.SAFE_GRAD_ABS):
            from ..ops.sensitivity import calc_sensitivity

            mopts = self.exp["policy_options"].get("model_options", {})
            underflow = mopts.get("safe_mutation_underflow", 0.01)
            self._sens = calc_sensitivity(
                self.task, self.theta, idx_row, self.mutation, underflow
            )
        elif self.mutation is MutationKind.SAFE_VECTOR:
            pass  # set once at startup via set_sensitivity_vector
        return self._sens

    def set_sensitivity_vector(self, vector, underflow: float):
        """SM-VECTOR: precomputed sensitivity, clamped then min-normalized
        (reference: src/algorithm/safe_mutations.py:28-32)."""
        v = jnp.asarray(np.asarray(vector), jnp.float32)
        v = jnp.maximum(v, underflow)
        self._sens = v / v.min()

    def _profile_hook(self, iteration: int):
        """Trace generation 2 with jax.profiler when tpu.profile is set
        (the reference's cProfile launch scripts' role — SURVEY.md §5.1)."""
        if not self.tpu_cfg.profile:
            return
        if iteration == 2:
            jax.profiler.start_trace(
                os.path.join(self.exp["log_dir"], "profile")
            )
        elif iteration == 3:
            jax.profiler.stop_trace()
            logger.info("wrote jax profiler trace for generation 2")

    # ---- main loop ---------------------------------------------------------------------

    def run_master(self, plot: bool = False, max_iterations: int | None = None):
        config, it, stats = self.config, self.it, self.stats
        limit = max_iterations or config.max_nb_iterations
        F = self._pair_count()

        while not limit or it.iteration() < limit:
            it.incr_epoch()
            gens = max(self.task.train_n // it.batch_size(), 1)
            for _ in range(gens):
                it.incr_iteration()
                stats.set_step_tstart()
                logger.info("********** Iteration %d **********", it.iteration())
                self._profile_hook(it.iteration())

                sigma, bs = it.get_noise_stdev(), it.batch_size()
                seeds = self._rng.integers(0, 2**32, size=F, dtype=np.uint32)
                idx = self._draw_batches(F, bs)
                sens = self._maybe_sensitivity(idx[0])

                fused = self.task.fitness_on_device
                if fused:
                    # whole generation in one dispatch, one host sync
                    (new_theta, new_opt_state, fitnesses, ratio
                     ) = self.engine.generation(
                        self.theta, self.opt_state, sens, sigma, seeds, idx,
                        self.optimizer.stepsize, self.config.l2coeff or 0.0,
                    )
                else:
                    artifacts, deltas = self.engine.eval_generation(
                        self.theta, sens, sigma, seeds, idx
                    )
                    fitnesses = self.task.host_fitness(artifacts, idx)  # (F, 2)

                # one validation eval per generation on the pre-update model
                # (the reference blocks until >=1 eval result per generation,
                # nic_nes/iteration.py:49-50); tpu.val_freq > 1 thins this to
                # every k generations (documented deviation, carrying the
                # last score in between)
                val_freq = max(self.tpu_cfg.val_freq, 1)
                if it.iteration() % val_freq == 0 or self._last_eval is None:
                    self._last_eval = self.task.validate(self.theta)
                eval_score = self._last_eval
                # the model file is only needed when the score can enter the
                # podium (record_elites would copy it) or at snapshot time —
                # skipping the ~60 ms .pth write otherwise is behaviorally
                # identical (a non-entering candidate is never touched)
                if self._podium_would_take(eval_score):
                    self._write_current_model()
                it.record_eval_result(0, self._current_path, eval_score)
                it.process_evaluated_elites()

                if fused:
                    self.theta, self.opt_state = new_theta, new_opt_state
                else:
                    self.opt_state, self.theta, ratio = self.engine.update(
                        self.theta, self.opt_state, sens, sigma, seeds,
                        fitnesses, self.optimizer.stepsize,
                        config.l2coeff or 0.0, deltas=deltas,
                    )
                self.experiment.opt_state = self.opt_state
                self._model_written = False

                if it.patience_reached() or it.schedule_reached():
                    if config.stepsize_divisor:
                        self.optimizer.stepsize /= config.stepsize_divisor
                    self._sampler = None  # rebuilt at the new batch size

                stats.record_update_ratio(float(ratio))
                stats.record_score_stats(np.asarray(fitnesses).ravel())
                stats.record_bs_stats(it.batch_size())
                stats.record_step_time_stats()
                stats.record_norm_stats(np.asarray(self.theta))
                stats.record_acc_stats(eval_score)
                stats.record_best_acc_stats(it.best_elites()[0][1])
                stats.record_std_stats(it.noise_stdev())
                stats.update_mem_stats()
                stats.log_stats()
                it.log_stats()

                if config.snapshot_freq and it.iteration() % config.snapshot_freq == 0:
                    self._write_current_model()  # z_info references this file
                    save_snapshot(stats, it, self.experiment)
                    if plot:
                        stats.plot_stats(self.experiment.snapshot_dir())

                if limit and it.iteration() >= limit:
                    break
                if it.patience_reached() or it.schedule_reached():
                    break  # rebuild the epoch at the new batch size

        self._write_current_model()
        save_snapshot(stats, it, self.experiment)
        if plot:
            stats.plot_stats(self.experiment.snapshot_dir())
        return self.theta
