"""Indexed CIDEr scoring facade: native C++ core with Python fallback.

``IndexedCiderScorer`` is what the tasks consume: fit once on the per-image
ground-truth list, then score (candidates, image_indices) batches every
generation. It prefers the C++ core (native/ciderd.cpp, built on demand with
g++ — SURVEY.md §2.9 names host CIDEr the one justified native component) and
falls back to the pure-Python scorer (ciderd.py), which is also the test
oracle for the native one.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

from .ciderd import CiderScorer

logger = logging.getLogger(__name__)

__all__ = ["IndexedCiderScorer", "load_native", "native_available",
           "pack_ngram_u64"]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "ciderd.cpp")
_SO = os.path.join(_NATIVE_DIR, "libciderd.so")

_lib = None
_build_failed = False


def load_native():
    """Build (once) and load the native scorer; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or not os.path.isfile(_SRC):
        return None
    if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            logger.info("built native CIDEr scorer: %s", _SO)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            logger.warning("native CIDEr build failed (%s); using python scorer", e)
            _build_failed = True
            return None
    lib = ctypes.CDLL(_SO)
    lib.cider_new.restype = ctypes.c_void_p
    lib.cider_new.argtypes = [ctypes.c_int, ctypes.c_double, ctypes.c_int]
    lib.cider_free.argtypes = [ctypes.c_void_p]
    lib.cider_fit.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.cider_score.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
    ]
    if hasattr(lib, "cider_set_df"):
        lib.cider_set_df.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_double,
        ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return load_native() is not None


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def pack_ngram_u64(g: tuple) -> int:
    """The native core's n-gram key: 16-bit fields of token+1, first token
    highest among the used fields (native/ciderd.cpp pack())."""
    h = 0
    for t in g:
        h = ((h << 16) | ((int(t) + 1) & 0xFFFF)) & 0xFFFFFFFFFFFFFFFF
    return h


class IndexedCiderScorer:
    """Fit on per-image reference lists, score candidates by image index.

    ``frozen_df``: optional ``(df, ref_len)`` from
    :func:`~nes_img_captioning_tpu.fitness.ciderd.load_df_pickle` — score
    against the reference's frozen coco-train-idxs table instead of fitting
    DF from ``gts_list`` (absolute training-fitness parity, reference:
    src/captioning/policies.py:72)."""

    def __init__(self, gts_list: list, variant: str = "cider-d",
                 n: int = 4, sigma: float = 6.0, prefer_native: bool = True,
                 frozen_df: tuple | None = None):
        self.variant = variant
        self.n, self.sigma = n, sigma
        self._gts = [np.asarray(g, dtype=np.int32) for g in gts_list]
        self._native = None
        self._py = None
        native_ok = prefer_native and load_native() is not None
        if native_ok and frozen_df is not None:
            # cider_set_df arrived with this feature; a stale prebuilt .so
            # may lack it — fall back to python rather than mis-score
            native_ok = hasattr(load_native(), "cider_set_df")
        if native_ok:
            self._fit_native(frozen_df)
        else:
            self._fit_python(frozen_df)

    # ---- native path -------------------------------------------------------------

    def _fit_native(self, frozen_df=None):
        lib = load_native()
        self._native = ctypes.c_void_p(lib.cider_new(
            self.n, self.sigma, 1 if self.variant == "cider-d" else 0
        ))
        if frozen_df is not None:
            df, ref_len = frozen_df
            keys, vals, orders = [], [], []
            for n_i, order_df in enumerate(df):
                for g, count in order_df.items():
                    keys.append(pack_ngram_u64(g))
                    vals.append(float(count))
                    orders.append(n_i + 1)
            keys = np.asarray(keys, np.uint64)
            vals = np.asarray(vals, np.float32)
            orders = np.asarray(orders, np.int32)
            lib.cider_set_df(
                self._native,
                keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                orders.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(keys), float(ref_len),
            )
        T = max((g.shape[1] for g in self._gts), default=1)
        rows = []
        ptr = [0]
        for g in self._gts:
            if g.shape[1] < T:
                g = np.pad(g, ((0, 0), (0, T - g.shape[1])))
            rows.append(g)
            ptr.append(ptr[-1] + g.shape[0])
        refs = _as_i32(np.concatenate(rows, axis=0))
        img_ptr = np.asarray(ptr, dtype=np.int64)
        lib.cider_fit(
            self._native,
            refs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            refs.shape[0], T,
            img_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(self._gts),
        )
        self._T = T

    def _fit_python(self, frozen_df=None):
        self._py = CiderScorer(n=self.n, sigma=self.sigma, variant=self.variant)
        if frozen_df is not None:
            self._py.set_df(*frozen_df)
        else:
            self._py.fit_df(self._gts)

    # ---- scoring ------------------------------------------------------------------

    def score(self, cands, img_idx):
        """cands (R, T) int tokens, img_idx (R,) fitted-image indices
        -> (mean, per-candidate scores)."""
        cands = _as_i32(cands)
        img_idx = np.ascontiguousarray(img_idx, dtype=np.int64)
        assert cands.shape[0] == img_idx.shape[0]
        if self._native is not None:
            lib = load_native()
            out = np.zeros(cands.shape[0], np.float64)
            lib.cider_score(
                self._native,
                cands.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                cands.shape[0], cands.shape[1],
                img_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
            return (float(out.mean()) if len(out) else 0.0), out
        gts_per_cand = [self._gts[i] for i in img_idx]
        return self._py.score(cands, gts_per_cand)

    def __del__(self):
        if getattr(self, "_native", None) is not None:
            try:
                load_native().cider_free(self._native)
            except Exception:
                pass
