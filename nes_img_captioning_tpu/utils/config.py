"""Experiment configuration.

Same public surface as the reference: one experiment JSON per run
(reference: experiments/*.json, schema per README.md:112-257), parsed into a
``Config`` with the reference's exact field set
(reference: src/algorithm/tools/utils.py:14-20). Keys whose name starts with
``_`` are disabled (the reference's convention, README.md:170-177).

One addition: an optional ``"tpu"`` section with knobs that have no reference
counterpart (they configure the SPMD execution, which replaces the Redis
worker fleet): ``pop_chunk`` (members materialized at once per device),
``mesh_shape`` (device mesh), ``precision`` ("f32"|"bf16" rollout compute).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

__all__ = ["Config", "TpuConfig", "load_experiment"]


@dataclasses.dataclass(frozen=True)
class Config:
    """Runtime loop knobs — field-for-field the reference Config namedtuple
    (src/algorithm/tools/utils.py:14-20); None means "not set"."""

    l2coeff: float | None = None
    noise_stdev: float | None = None
    stdev_divisor: float | None = None
    eval_prob: float | None = None
    snapshot_freq: int | None = None
    log_dir: str | None = None
    batch_size: int | None = None
    patience: int | None = None
    val_batch_size: int | None = None
    num_val_batches: int | None = None
    num_val_items: int | None = None
    cuda: bool | None = None  # accepted for config-file compat; ignored on TPU
    max_nb_iterations: int | None = None
    ref_batch_size: int | None = None
    bs_multiplier: float | None = None
    stepsize_divisor: float | None = None
    single_batch: bool | None = None
    schedule_limit: int | None = None
    schedule_start: int | None = None


@dataclasses.dataclass(frozen=True)
class TpuConfig:
    """TPU-execution knobs (no reference counterpart)."""

    pop_chunk: int = 0  # 0 = all pairs at once
    mesh_shape: tuple[int, ...] | None = None
    precision: str = "f32"  # rollout compute dtype: "f32" | "bf16"
    seed: int | None = None  # master RNG seed; None = nondeterministic
    profile: bool = False  # jax.profiler trace of generation 2 into log_dir
    fused_decode: object = "auto"  # Pallas greedy decode: "auto" | True | False
    val_freq: int = 1  # validate every k generations (1 = reference parity)
    device_cider: object = "auto"  # on-chip CIDEr-D fitness: "auto" | True | False
    # MXU precision of the SM-G-SUM Jacobian sweep: "float32" (reference
    # parity, default) | "bfloat16" (~3x faster, ~1e-2 relative error on a
    # noise-scaling heuristic). ES-only hot path; see docs/RESULTS.md.
    sensitivity_precision: str = "float32"
    # SM-G-* cost levers (docs/RESULTS.md "SM-G sensitivity levers"):
    # sensitivity_batch subsamples the generation's batch to its first k
    # rows for the Jacobian only (0 = full batch, reference parity);
    # sensitivity_split widens the vocab-grouping of the captioning
    # sensitivity output (reference hard-codes 100,
    # src/captioning/nets.py:64-70 — fewer groups = fewer VJP rows).
    # NOTE: a wider split computes a COARSER SM-G-SUM (the noise scale on
    # the unclamped tail shifts ~2x at 400) — a semantic knob, not a
    # speed-only one; see docs/RESULTS.md fidelity table.
    sensitivity_batch: int = 0
    sensitivity_split: int = 100
    # randomized SM-G-SUM estimator (0 = exact jacrev, reference parity):
    # R Rademacher probes through one VJP pullback estimate the Jacobian
    # column norms UNBIASEDLY (per-coordinate relative std <= 1/sqrt(2R)),
    # so unlike sensitivity_split this is a speed knob that targets the
    # reference's own split-100 quantity — cost scales with R instead of
    # the 97 grouped-VJP rows. Probe stream: member-0 seed of each
    # generation, fold PROBE_FOLD (deterministic per tpu.seed; identical
    # on the host and in-program paths). SM-G-SUM only; ignored (with a
    # warning) for SM-G-ABS.
    sensitivity_probes: int = 0
    # streaming-softmax greedy decode: tile the vocab axis of the fused
    # kernel's logit/embed passes (a lane multiple dividing the padded
    # vocab; 0 = untiled). Token-exact vs untiled (tested); see
    # docs/RESULTS.md "streaming vocab tiles" for when it wins.
    decode_vocab_tile: int = 0
    # generations chained per device dispatch (fused paths only; one
    # dispatch costs ~100 ms through a tunneled chip, dwarfing ~20 ms of
    # compute). Applies to NES (fused fitness) AND ES (fused generation;
    # the podium merge runs in-program with record_elites' semantics).
    # >1 requires patience=0; blocks never span validation,
    # schedule-annealing, or snapshot boundaries, so cadence semantics are
    # unchanged. 1 = exact reference per-generation driving.
    gens_per_dispatch: int = 1
    # one-dispatch ES generation (parent assembly + SM-G sensitivity sweep
    # + offspring sweep + truncation selection + winner/candidate
    # materialization + in-program candidate validation as a single device
    # program). "auto" = on whenever the task scores fitness AND validation
    # on device (SM-G-* per-parent sensitivities are computed in-program).
    # False = always the host-choreographed plain path.
    fused_es: object = "auto"
    # in-program NES validation + device podium (mirrors the fused ES
    # candidate validation): each generation of a block validates its
    # pre-update theta on device (task.validate_device) and merges it into
    # a device-resident podium with record_elites' exact semantics, so
    # blocks no longer end at validation boundaries — reference-cadence
    # validation (val_freq=1) runs at block rates. "auto" = on when
    # gens_per_dispatch > 1 and the task validates on device; True forces
    # it for per-generation driving too (fuses the validation dispatch
    # into the generation program); requires patience=0 and val_freq=1.
    # Deviations vs the host path (documented): scores are f32, and the
    # per-validation predictions-JSON artifact is not written (same as the
    # fused ES candidate validation).
    fused_validation: object = "auto"
    # decode-ordered ES offspring sweep: build children directly in the
    # fused decode kernel's parameter layout (ops/decode_layout.py), so the
    # per-offspring prep is one elementwise pass instead of
    # unravel+transpose+pad+cast (the NES engine has used this layout since
    # round 2). True = on whenever the task exposes a decode layout (fused
    # kernel + device fitness); "auto"/False = torch-order children — the
    # isolated sweep A/B measured the layout a WASH for plain mutations and
    # ~5% slower for SM-G at mscoco_es dims (scripts/exp_es_layout.py,
    # docs/RESULTS.md), so unlike NES it is an explicit opt-in. NOTE: the
    # layout path draws each child's noise over the padded decode-ordered
    # axis, so trajectories differ from the torch-order path for the same
    # seeds (both are valid reference-semantics streams; winners are
    # replayed from the same lineage either way, equal up to FMA
    # contraction).
    es_decode_layout: object = "auto"
    # in-kernel pair perturbation (NES fused path, greedy fitness kinds):
    # one kernel call decodes BOTH rollouts of an antithetic pair, applying
    # base + sign*delta to the weights inside the kernel — the perturbed
    # parameter vectors never materialize in HBM (they were the ~6 ms of
    # XLA boundary copies at the chunk-map edges, docs/RESULTS.md). Tokens
    # are bitwise-equal to the per-member path (same f32 sum, same cast,
    # same kernel ops; tested). "auto" = on whenever the task supports it
    # (fused kernel + decode layout + device scoring + greedy kind +
    # untiled logits); True forces (warns if unsupported); False = off.
    kernel_perturb: object = "auto"
    # in-kernel noise (NES fused path, on top of kernel_perturb): each
    # pair's delta is GENERATED inside the kernel from the on-chip hardware
    # PRNG (delta = scale * N(0,1), Box-Muller) instead of materializing as
    # ~11.5 MB of HBM operands per pair (~23 GB of write traffic per
    # mscoco_nes generation plus the matching reads); the gradient kernel
    # regenerates the identical streams from the same per-pair seeds
    # (bitwise — verified on chip, scripts/exp_kernel_noise.py). The
    # realized noise stream differs from the host jax.random path exactly
    # as rng_impl choices already differ from each other — same documented
    # seed-lineage deviation class. MEASURED (r5, docs/RESULTS.md): correct
    # on chip but a net loss at the mscoco_nes regime — eval sweep wins
    # +16 ms/gen (Box-Muller eats most of the materialization saving) and
    # the per-pair gradient kernel loses -93 ms/gen to the rbg einsum — so
    # "auto" resolves OFF; True is an explicit opt-in (requires
    # kernel_perturb active on a real TPU; warns otherwise); False = off
    # (delta-operand pair kernel, the CPU/test form).
    kernel_noise: object = "auto"
    # Storage dtype of the realized NES pair delta on the fused
    # decode-layout path: "f32" (default) or "bf16". bf16 HALVES the delta
    # HBM footprint on BOTH sides of a generation (the eval sweep's
    # per-pair materialization + kernel-operand read, and the gradient
    # einsum's regenerated matrix) — the r5 DCE ablation put that traffic
    # at ~1/3 of the true-regime generation (docs/RESULTS.md). The
    # perturbation consumed by eval and gradient stays bitwise IDENTICAL
    # (one shared rounding at generation: delta = bf16(scale * N(0,1)), so
    # the NES estimator is self-consistent; tested); the deviation is
    # distributional only — noise values round to 8-bit mantissa, ~0.4%
    # relative, zero-mean symmetric. f32 = reference-precision noise.
    delta_dtype: str = "f32"
    # PRNG used for on-device noise/init streams: "" = jax default
    # (threefry2x32); "rbg" trades cross-backend stream identity for ~2.5x
    # faster generation on TPU (noise is regenerated twice per generation,
    # so this is measurable on the hot path). Still counter-based and
    # deterministic per seed within an implementation.
    rng_impl: str = ""


def _strip_disabled(d: dict) -> dict:
    return {k: v for k, v in d.items() if not k.startswith("_")}


def parse_config(exp: dict) -> Config:
    known = {f.name for f in dataclasses.fields(Config)}
    cfg = _strip_disabled(exp.get("config", {}))
    unknown = set(cfg) - known
    if unknown:
        raise ValueError(f"unknown config keys: {sorted(unknown)}")
    return Config(**cfg)


def parse_tpu_config(exp: dict) -> TpuConfig:
    cfg = _strip_disabled(exp.get("tpu", {}))
    if "mesh_shape" in cfg and cfg["mesh_shape"] is not None:
        cfg["mesh_shape"] = tuple(cfg["mesh_shape"])
    if "sensitivity_precision" in cfg:
        # accept the sibling precision knob's spellings; fail at parse time
        # rather than deep inside jit tracing
        aliases = {"f32": "float32", "bf16": "bfloat16",
                   "float32": "float32", "bfloat16": "bfloat16"}
        try:
            cfg["sensitivity_precision"] = aliases[cfg["sensitivity_precision"]]
        except KeyError:
            raise ValueError(
                f"tpu.sensitivity_precision={cfg['sensitivity_precision']!r}: "
                f"expected one of {sorted(aliases)}"
            ) from None
    if "delta_dtype" in cfg:
        aliases = {"f32": "f32", "float32": "f32",
                   "bf16": "bf16", "bfloat16": "bf16"}
        try:
            cfg["delta_dtype"] = aliases[cfg["delta_dtype"]]
        except KeyError:
            raise ValueError(
                f"tpu.delta_dtype={cfg['delta_dtype']!r}: "
                f"expected one of {sorted(set(aliases))}"
            ) from None
    if cfg.get("sensitivity_probes") is not None \
            and int(cfg["sensitivity_probes"]) < 0:
        raise ValueError(
            f"tpu.sensitivity_probes={cfg['sensitivity_probes']!r}: "
            "expected 0 (exact) or a positive probe count")
    for knob in ("fused_es", "fused_validation", "es_decode_layout",
                 "kernel_perturb"):
        # the gates test `want is not False`, so near-miss spellings like
        # 0 or "false" would silently leave the fused paths ON — reject them
        # (identity checks: `0 in (True, False)` would be truthy)
        if knob in cfg and not (
            cfg[knob] is True or cfg[knob] is False or cfg[knob] == "auto"
        ):
            raise ValueError(
                f"tpu.{knob}={cfg[knob]!r}: expected true, false, or "
                f"\"auto\""
            )
    return TpuConfig(**cfg)


def load_experiment(path_or_dict: str | dict[str, Any]) -> dict[str, Any]:
    """Load an experiment JSON and strip ``_``-disabled keys (top level and
    inside ``config``)."""
    if isinstance(path_or_dict, dict):
        exp = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            exp = json.load(f)
    exp = _strip_disabled(exp)
    if "config" in exp:
        exp["config"] = _strip_disabled(exp["config"])
    return exp
