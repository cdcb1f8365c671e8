"""Per-token reward-weighting fitness criteria.

Ports of the reference's five criteria (reference: src/captioning/
fitness.py). Each maps (logprobs (R,16), seq (R,16), rewards (R,16)) to ONE
scalar for the whole rollout batch — the mask counts position 0 always and
position t while seq[t-1] > 0 (fitness.py:35-37), i.e. through the first
emitted EOS.

One formula source serves two execution forms: the host path
(``apply_criterion``, numpy f64) and the traced device path
(``criterion_device``, jnp f32 — rides the fused generation program so the
logprob tensor never leaves the chip; parity pinned to 1e-5 by
tests/test_cider_device.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["FITNESS_CRITERIA", "apply_criterion", "criterion_device"]

_LOG10_9 = np.log10(9.0)
_E = np.e


def _term(xp, name: str, lp, reward):
    """The per-token weighted term of each criterion, over any array
    namespace (np for the host f64 path, jnp for the traced device path).
    ``reward`` broadcasts against ``lp`` ((R, 1) per-row scores or a full
    (R, T)). Formulas cite src/captioning/fitness.py."""
    if name == "sc_loss":
        # reward * -logprob (documented harmful, fitness.py:12-40)
        return -lp * reward
    p = xp.exp(lp)
    if name == "greedy_logprob":
        # reward * (log10(p + 1/9) + log10 9) — 0 at p=0, reward at p=1
        # (fitness.py:43-64)
        return (xp.log10(p + 1.0 / 9.0) + _LOG10_9) * reward
    if name == "greedy_avgprob":
        # mean of CIDEr reward and the alt-log term (fitness.py:67-86)
        pfact = xp.log10(p + 1.0 / 9.0) + _LOG10_9
        return 0.5 * reward + 0.5 * pfact * reward
    if name == "greedy_expprob":
        # reward * (e^p - 1)/(e - 1) (code of fitness.py:90-109)
        return (xp.exp(p) - 1.0) / (_E - 1.0) * reward
    if name == "greedy_linprob":
        # reward * p (fitness.py:112-132)
        return p * reward
    raise KeyError(name)


def _mask(seq: np.ndarray) -> np.ndarray:
    m = (seq > 0).astype(np.float64)
    return np.concatenate([np.ones((m.shape[0], 1)), m[:, :-1]], axis=1)


def _host(name: str):
    def criterion(lp, seq, reward):
        m = _mask(seq)
        return float((_term(np, name, lp, reward) * m).sum() / m.sum())

    criterion.__name__ = f"{name}_criterion"
    return criterion


# keyed by the Fitness enum values that need a criterion
# (reference: src/captioning/policies.py:50-61)
FITNESS_CRITERIA = {
    name: _host(name)
    for name in ("sc_loss", "greedy_logprob", "greedy_expprob",
                 "greedy_avgprob", "greedy_linprob")
}


def apply_criterion(fitness_name: str, lp, seq, reward):
    return FITNESS_CRITERIA[fitness_name](
        np.asarray(lp, np.float64), np.asarray(seq), np.asarray(reward, np.float64)
    )


def criterion_device(fitness_name: str, lp, seq, reward):
    """Traced jnp form — same ``_term`` formulas and mask semantics as the
    host path, reduced in f32."""
    import jax.numpy as jnp

    lp = lp.astype(jnp.float32)
    m = jnp.concatenate(
        [jnp.ones((seq.shape[0], 1), jnp.float32),
         (seq[:, :-1] > 0).astype(jnp.float32)], axis=1,
    )
    return (_term(jnp, fitness_name, lp, reward) * m).sum() / m.sum()
