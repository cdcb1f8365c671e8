"""Safe-mutation sensitivities (SM-G-SUM / SM-G-ABS).

Reference semantics (src/algorithm/safe_mutations.py, from
uber-research/safemutations):

* SM-G-SUM: one forward through the task's ``sensitivity_forward`` giving a
  (B, K) output; Jacobian rows J_k = d(sum_b out[b,k])/d theta; sensitivity =
  sqrt(sum_k J_k^2) / B  (safe_mutations.py:103-117).
* SM-G-ABS: per-sample Jacobians, |.| averaged over the batch before the
  sqrt-sum-of-squares (safe_mutations.py:119-146) — quadratic cost in the
  reference and here.
* post-processing: clamp below at ``underflow`` then divide by it
  (safe_mutations.py:62-63).

The reference amortizes the computation across workers with a file cache
(sens_t{t}_p{p}_*.pt); here it is one jitted autodiff per generation (and per
parent for NIC-ES), which replaces the cache entirely. ``jax.jacrev``
vectorizes the reference's K explicit backward passes into one vmapped VJP.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from .mutation import MutationKind

__all__ = ["calc_sensitivity", "calc_sensitivities", "sm_g_sum", "sm_g_abs",
           "sum_sens_many_traced", "abs_sens_many_traced",
           "sum_sens_traced", "abs_sens_traced", "postprocess",
           "subsample_batch_rows", "sm_vector_normalize",
           "sum_sens_probes_traced", "sum_sens_probes_many_traced",
           "probe_key_from_seed", "PROBE_FOLD", "resolve_probes"]

# fold_in tag for the probe stream, derived from the generation's member-0
# seed. The other per-seed streams on the same raw key are the mutation
# noise (no fold), NES rollout folds 1/2, ES rollout fold 3, and — for
# seeds that ever feed a fresh init — init_theta's per-leaf folds
# 0..n_leaves-1 (models/params.py:init_theta), so small-integer tags are
# NOT unique; the probe tag sits far above any leaf index.
PROBE_FOLD = 0x50524245  # "PRBE"


def probe_key_from_seed(mk_key, seed):
    """One probe key per generation (tpu.sensitivity_probes): member-0's
    offspring seed folded with PROBE_FOLD. Both the host path
    (calc_sensitivity/calc_sensitivities) and the in-program paths (NES
    inline_sens, fused ES) derive the key this way, so the estimator is
    operand-exact across them and deterministic per tpu.seed."""
    return jax.random.fold_in(mk_key(seed), PROBE_FOLD)


def resolve_probes(mutation, probes: int) -> int:
    """Probe-count eligibility shared by both engines: the randomized
    estimator applies to SM-G-SUM only (the ABS path's per-sample |J|
    average has no column-norm identity), so SM-G-ABS runs exact with a
    one-time warning."""
    probes = int(probes)
    if probes and mutation is MutationKind.SAFE_GRAD_ABS:
        logging.getLogger(__name__).warning(
            "tpu.sensitivity_probes applies to SM-G-SUM only (the ABS "
            "path's per-sample |J| average has no column-norm identity); "
            "SM-G-ABS runs exact")
        return 0
    return probes


def sm_vector_normalize(vector, underflow: float):
    """SM-VECTOR load-path normalization, shared by both masters: clamp
    below at ``underflow`` then divide by the min (reference:
    safe_mutations.py:28-32 — note the vector path min-normalizes where
    the SM-G path divides by the underflow)."""
    import numpy as np

    v = np.maximum(np.asarray(vector, np.float32), underflow)
    return v / v.min()


def subsample_batch_rows(idx_row, k: int):
    """The tpu.sensitivity_batch cost lever, shared by both masters:
    Jacobian over the first ``k`` rows of the generation's batch (0 = full
    batch, reference parity). The reference's own forward_for_sensitivity
    already truncates decode steps for cheapness — principled approximation
    is in-genre (docs/RESULTS.md "SM-G sensitivity levers")."""
    import numpy as np

    idx_s = np.asarray(idx_row, np.int32)
    if k:
        idx_s = idx_s[: min(k, idx_s.shape[0])]
    return idx_s


def postprocess(sens: jax.Array, underflow: float) -> jax.Array:
    """Reference post-processing (safe_mutations.py:62-63): clamp below at
    ``underflow`` then divide by it."""
    sens = jnp.maximum(sens, underflow)
    return sens / underflow


def sum_sens_many_traced(forward, thetas, idx, consts,
                         matmul_precision: str = "float32"):
    """SM-G-SUM for a whole (P, dim) parent matrix in ONE program: lax.map
    runs the parents sequentially so only one (K, dim) Jacobian is live at a
    time (~K*dim*4 bytes), while the single dispatch amortizes the ~100 ms
    per-program-launch wall cost this harness pays — the per-parent-call
    version spent P launches per ES generation.

    ``matmul_precision``: MXU precision for the forward/VJP dots. The sweep
    is MXU-bound; "bfloat16" runs it ~3x faster at ~1e-2 relative error on
    the sensitivities (a noise-scaling heuristic — see tpu.sensitivity_precision).

    Traced form (pre-postprocess): also inlined into the fused ES
    generation program (algorithms/es.py), which is why it is not jitted
    here."""
    return jax.lax.map(
        lambda th: sum_sens_traced(forward, th, idx, consts,
                                   matmul_precision),
        thetas,
    )


def sum_sens_traced(forward, theta, idx, consts,
                    matmul_precision: str = "float32"):
    """Single-theta SM-G-SUM in traced (inlinable) form — the NES engine's
    in-program sensitivity (one parent = the current theta), sparing the
    separate calc_sensitivity dispatch the host path pays and unblocking
    K-generation blocks for SM-G NES (the sensitivity must be recomputed
    from each generation's carried theta inside the scan step)."""
    # eval_shape, not a traced forward: this body is inlined into the
    # fused generation/block programs, where a dead full forward per
    # inlining inflates the jaxpr XLA must chew through (~200 s cold
    # compiles per block shape on this harness)
    batch = jax.eval_shape(
        lambda th: forward(th, idx, consts), theta
    ).shape[0]
    with jax.default_matmul_precision(matmul_precision):
        J = jax.jacrev(lambda th: forward(th, idx, consts).sum(0))(theta)
    return jnp.sqrt((J.astype(jnp.float32) ** 2).sum(0)) / batch


def sum_sens_probes_traced(forward, theta, idx, consts, key, probes: int,
                           matmul_precision: str = "float32"):
    """Randomized (Hutchinson/Girard) SM-G-SUM: estimate the Jacobian column
    norms sqrt(sum_k J_ki^2)/B from ``probes`` Rademacher probes through ONE
    VJP pullback instead of jacrev's K one-hot rows (K = 97 at the
    reference's split 100). For v ~ uniform{-1,+1}^K,
    E[(J^T v)_i^2] = sum_k J_ki^2 exactly, so the estimator is UNBIASED for
    the squared sensitivity of the reference's own computation (unlike the
    sensitivity_split lever, which computes a coarser grouping — see
    docs/RESULTS.md fidelity table); the sqrt adds a small Jensen bias,
    O(1/R) relative. Per-coordinate relative std of the norm estimate is
    <= 1/sqrt(2R) (~14% at R=25). The forward runs once; probes share its
    residuals, so cost scales with R where jacrev's scales with K."""
    batch = jax.eval_shape(
        lambda th: forward(th, idx, consts), theta
    ).shape[0]
    with jax.default_matmul_precision(matmul_precision):
        out, pullback = jax.vjp(
            lambda th: forward(th, idx, consts).sum(0), theta
        )
        v = jax.random.rademacher(
            key, (int(probes), out.shape[0]), out.dtype
        )
        y = jax.vmap(lambda vr: pullback(vr)[0])(v)  # (R, dim)
    return jnp.sqrt((y.astype(jnp.float32) ** 2).mean(0)) / batch


def sum_sens_probes_many_traced(forward, thetas, idx, consts, key,
                                probes: int,
                                matmul_precision: str = "float32"):
    """Probe estimator over a (P, dim) parent matrix (see
    sum_sens_many_traced for the lax.map rationale). All parents share one
    probe matrix — each row's estimate stays unbiased; sharing keeps the
    per-generation random-bit lineage a single fold of member-0's seed."""
    return jax.lax.map(
        lambda th: sum_sens_probes_traced(forward, th, idx, consts, key,
                                          probes, matmul_precision),
        thetas,
    )


def abs_sens_traced(forward, theta, idx, consts):
    """Single-theta SM-G-ABS in traced form (see sum_sens_traced)."""
    return _abs_sens_scan(forward, theta, idx, consts)


def abs_sens_many_traced(forward, thetas, idx, consts):
    return jax.lax.map(
        lambda th: _abs_sens_scan(forward, th, idx, consts), thetas
    )


_sum_sens_many = jax.jit(sum_sens_many_traced, static_argnums=(0, 4))
_abs_sens_many = jax.jit(abs_sens_many_traced, static_argnums=(0,))
_sum_sens_probes = jax.jit(sum_sens_probes_traced, static_argnums=(0, 5, 6))
_sum_sens_probes_many = jax.jit(sum_sens_probes_many_traced,
                                static_argnums=(0, 5, 6))
# single-theta jitted entry points (calc_sensitivity / sm_g_*): the SAME
# traced bodies the engines inline, so the host fallback path and the
# in-program path share one definition — including the forced-f32 Jacobian
# dots (on TPU the ambient default is bf16; the inline/host parity tests
# rely on both paths resolving precision identically)
_sum_sens = jax.jit(sum_sens_traced, static_argnums=(0, 4))
_abs_sens = jax.jit(abs_sens_traced, static_argnums=(0,))


def _abs_sens_scan(forward, theta, idx, consts):
    def sample_jac(carry, i):
        J_i = jax.jacrev(
            lambda th: forward(th, idx[i][None], consts)[0]
        )(theta)
        return carry + jnp.abs(J_i), None

    B = idx.shape[0]
    K = jax.eval_shape(
        lambda th: forward(th, idx[0:1], consts)[0], theta
    ).shape[0]
    acc, _ = jax.lax.scan(
        sample_jac, jnp.zeros((K, theta.shape[0]), jnp.float32), jnp.arange(B)
    )
    return jnp.sqrt(((acc / B) ** 2).sum(0))


def calc_sensitivities(task, thetas, idx, kind: MutationKind, underflow: float,
                       matmul_precision: str = "float32",
                       probes: int = 0, probe_key=None):
    """Per-parent sensitivity rows (P, dim) for a stacked parent matrix —
    the NIC-ES per-(task, parent) cache of the reference
    (safe_mutations.py:34-84) collapsed into one jitted sweep per
    generation. ``matmul_precision`` per tpu.sensitivity_precision;
    ``probes`` > 0 (SM-G-SUM only, tpu.sensitivity_probes) switches to the
    randomized column-norm estimator with the given key."""
    forward = task.sensitivity_forward
    consts = task.device_consts()
    if kind is MutationKind.SAFE_GRAD_SUM:
        if probes:
            if probe_key is None:
                raise ValueError("probes > 0 requires probe_key")
            return postprocess(
                _sum_sens_probes_many(forward, thetas, idx, consts,
                                      probe_key, probes, matmul_precision),
                underflow,
            )
        return postprocess(
            _sum_sens_many(forward, thetas, idx, consts, matmul_precision),
            underflow,
        )
    if kind is MutationKind.SAFE_GRAD_ABS:
        return postprocess(
            _abs_sens_many(forward, thetas, idx, consts), underflow
        )
    raise ValueError(f"no gradient sensitivity for {kind}")


def sm_g_sum(forward, theta, idx, underflow: float, consts=None,
             matmul_precision: str = "float32") -> jax.Array:
    return postprocess(
        _sum_sens(forward, theta, idx, consts, matmul_precision), underflow
    )


def sm_g_abs(forward, theta, idx, underflow: float, consts=None) -> jax.Array:
    return postprocess(_abs_sens(forward, theta, idx, consts), underflow)


def calc_sensitivity(task, theta, idx, kind: MutationKind, underflow: float,
                     matmul_precision: str = "float32",
                     probes: int = 0, probe_key=None):
    """Dispatch on mutation kind; ``task.sensitivity_forward(theta, idx,
    consts)`` must return the (B, K) grouped output. ``matmul_precision``
    per tpu.sensitivity_precision (SM-G-SUM only — the ABS path's cost is
    the per-sample scan, not the dots); ``probes``/``probe_key`` per
    calc_sensitivities."""
    forward = task.sensitivity_forward
    consts = task.device_consts()
    if kind is MutationKind.SAFE_GRAD_SUM:
        if probes:
            if probe_key is None:
                raise ValueError("probes > 0 requires probe_key")
            return postprocess(
                _sum_sens_probes(forward, theta, idx, consts, probe_key,
                                 probes, matmul_precision),
                underflow,
            )
        return sm_g_sum(forward, theta, idx, underflow, consts,
                        matmul_precision)
    if kind is MutationKind.SAFE_GRAD_ABS:
        return sm_g_abs(forward, theta, idx, underflow, consts)
    raise ValueError(f"no gradient sensitivity for {kind}")


def dump_all_sensitivities(task, theta, batch_size: int, directory: str,
                           kind: MutationKind = MutationKind.SAFE_GRAD_SUM,
                           underflow: float = 0.01, seed: int = 0) -> list[str]:
    """Whole-dataset per-batch sensitivity dump — the SM-VECTOR preparation
    step (reference: CaptPolicy.calculate_all_sensitivities,
    src/captioning/policies.py:74-84, writing sens_t{i}_p0_*.pt files)."""
    import os

    import numpy as np
    import torch

    os.makedirs(directory, exist_ok=True)
    paths = []
    n = task.train_n
    order = np.random.default_rng(seed).permutation(n)
    for i, s in enumerate(range(0, n - batch_size + 1, batch_size)):
        idx = jnp.asarray(order[s : s + batch_size].astype(np.int32))
        sens = calc_sensitivity(task, theta, idx, kind, underflow)
        path = os.path.join(directory, f"sens_t{i}_p0_{os.getpid()}.pt")
        torch.save(torch.from_numpy(np.asarray(sens).copy()), path)
        paths.append(path)
    return paths
