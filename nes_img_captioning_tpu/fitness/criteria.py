"""Per-token reward-weighting fitness criteria.

Host-side numpy ports of the reference's five criteria
(reference: src/captioning/fitness.py). Each maps (logprobs (R,16),
seq (R,16), rewards (R,16)) to ONE scalar for the whole rollout batch —
the mask counts position 0 always and position t while seq[t-1] > 0
(fitness.py:35-37), i.e. through the first emitted EOS.
"""

from __future__ import annotations

import numpy as np

__all__ = ["FITNESS_CRITERIA", "apply_criterion", "criterion_device"]

_LOG10_9 = np.log10(9.0)
_E = np.e


def _mask(seq: np.ndarray) -> np.ndarray:
    m = (seq > 0).astype(np.float64)
    return np.concatenate([np.ones((m.shape[0], 1)), m[:, :-1]], axis=1)


def _reduce(term, seq):
    m = _mask(seq)
    return float((term * m).sum() / m.sum())


def log_criterion(lp, seq, reward):
    """reward * -logprob (documented harmful, fitness.py:12-40)."""
    return _reduce(-lp * reward, seq)


def alt_log_criterion(lp, seq, reward):
    """reward * (log10(p + 1/9) + log10 9) — 0 at p=0, reward at p=1."""
    return _reduce((np.log10(np.exp(lp) + 1.0 / 9.0) + _LOG10_9) * reward, seq)


def avg_log_criterion(lp, seq, reward):
    """mean of CIDEr reward and the alt-log term (fitness.py:67-86)."""
    pfact = np.log10(np.exp(lp) + 1.0 / 9.0) + _LOG10_9
    return _reduce(0.5 * reward + 0.5 * pfact * reward, seq)


def exp_criterion(lp, seq, reward):
    """reward * (e^p - 1)/(e - 1) (code of fitness.py:90-109)."""
    return _reduce((np.exp(np.exp(lp)) - 1.0) / (_E - 1.0) * reward, seq)


def lin_criterion(lp, seq, reward):
    """reward * p (fitness.py:112-132)."""
    return _reduce(np.exp(lp) * reward, seq)


# keyed by the Fitness enum values that need a criterion
# (reference: src/captioning/policies.py:50-61)
FITNESS_CRITERIA = {
    "sc_loss": log_criterion,
    "greedy_logprob": alt_log_criterion,
    "greedy_expprob": exp_criterion,
    "greedy_avgprob": avg_log_criterion,
    "greedy_linprob": lin_criterion,
}


def apply_criterion(fitness_name: str, lp, seq, reward):
    return FITNESS_CRITERIA[fitness_name](
        np.asarray(lp, np.float64), np.asarray(seq), np.asarray(reward, np.float64)
    )


def criterion_device(fitness_name: str, lp, seq, reward):
    """Traced jnp form of the five criteria — lets the per-token variants
    ride the on-device fitness path (one fused generation program, no
    logprob tensor leaving the chip). Same formulas and mask semantics as
    the host port above (reference: src/captioning/fitness.py); reduces in
    f32 where the host port uses f64 — equivalence is pinned to 1e-5 by
    tests/test_cider_device.py. ``reward`` broadcasts against ``lp``
    ((R, 1) per-row scores or a full (R, T))."""
    import jax.numpy as jnp

    lp = lp.astype(jnp.float32)
    m = jnp.concatenate(
        [jnp.ones((seq.shape[0], 1), jnp.float32),
         (seq[:, :-1] > 0).astype(jnp.float32)], axis=1,
    )
    p = jnp.exp(lp)
    pfact = jnp.log10(p + 1.0 / 9.0) + _LOG10_9
    if fitness_name == "sc_loss":
        term = -lp * reward
    elif fitness_name == "greedy_logprob":
        term = pfact * reward
    elif fitness_name == "greedy_avgprob":
        term = 0.5 * reward + 0.5 * pfact * reward
    elif fitness_name == "greedy_expprob":
        term = (jnp.exp(p) - 1.0) / (_E - 1.0) * reward
    elif fitness_name == "greedy_linprob":
        term = p * reward
    else:
        raise KeyError(fitness_name)
    return (term * m).sum() / m.sum()
