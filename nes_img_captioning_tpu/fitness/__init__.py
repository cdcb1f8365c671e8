"""Fitness scoring: CIDEr-D / CIDEr n-gram scorers (host-side) and the
per-token reward-weighting criteria (reference: src/captioning/fitness.py,
src/captioning/policies.py)."""

from .ciderd import CiderScorer
from .criteria import FITNESS_CRITERIA, apply_criterion

__all__ = ["CiderScorer", "FITNESS_CRITERIA", "apply_criterion"]
