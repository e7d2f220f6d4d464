"""Dequantization dispatch: native C++ library with NumPy fallback."""

from __future__ import annotations

import ctypes
import os

import numpy as np

from . import dequant_np as DQ

_LIB = None
_LIB_TRIED = False

_NATIVE_FNS = {
    DQ.GGML_F16: "dequant_f16",
    DQ.GGML_Q8_0: "dequant_q8_0",
    DQ.GGML_Q4_K: "dequant_q4_k",
    DQ.GGML_Q5_K: "dequant_q5_k",
    DQ.GGML_Q6_K: "dequant_q6_k",
}


def _load_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.environ.get("CVT_GGUF_DEQUANT_LIB", ""),
        os.path.join(here, "..", "..", "native", "libgguf_dequant.so"),
    ]
    for cand in candidates:
        if cand and os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                for fn in _NATIVE_FNS.values():
                    getattr(lib, fn).argtypes = [
                        ctypes.c_void_p,
                        ctypes.c_void_p,
                        ctypes.c_int64,
                    ]
                    getattr(lib, fn).restype = None
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def dequantize(type_id: int, raw, n_elements: int, prefer_native: bool = True) -> np.ndarray:
    """raw uint8 buffer -> float32 [n_elements]."""
    raw = np.frombuffer(raw, np.uint8) if not isinstance(raw, np.ndarray) else raw
    if type_id == DQ.GGML_F32:
        return raw[: n_elements * 4].view(np.float32).copy()

    lib = _load_lib() if prefer_native else None
    if lib is not None and type_id in _NATIVE_FNS:
        out = np.empty(n_elements, np.float32)
        src = np.ascontiguousarray(raw)
        getattr(lib, _NATIVE_FNS[type_id])(
            src.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(n_elements),
        )
        return out
    return DQ.dequantize_np(type_id, raw, n_elements)


def native_available() -> bool:
    return _load_lib() is not None
