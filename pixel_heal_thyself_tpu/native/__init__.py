"""ctypes bindings for the native host accelerators (native/pht_native.cpp).

The library is built on demand with g++ (no pybind11 in this image) and
degrades gracefully to the pure-Python paths when unavailable. The native
importance sampler operates on the exact CPython `random.Random` Mersenne
state (getstate/setstate round-trip), so Python and C++ paths produce
byte-identical patch sets and leave the RNG stream in the same position.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from random import Random

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libpht_native.so"
_lib = None
_load_failed = False


def _build() -> bool:
    src = _NATIVE_DIR / "pht_native.cpp"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO_PATH), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _SO_PATH.exists() and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        _load_failed = True
        return None
    lib.importance_sample.restype = ctypes.c_int64
    lib.importance_sample.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mt_random_doubles.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
    ]
    lib.mt_randints.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return _lib


def _rng_state(rng: Random) -> tuple[np.ndarray, ctypes.c_int32]:
    state = rng.getstate()[1]
    mt = np.array(state[:624], dtype=np.uint32)
    return mt, ctypes.c_int32(state[624])


def _restore_rng(rng: Random, mt: np.ndarray, pos: ctypes.c_int32) -> None:
    rng.setstate((3, tuple(int(x) for x in mt) + (int(pos.value),), None))


def native_importance_sample(
    img_shape: tuple[int, int],
    patch_size: int,
    num_patches: int,
    rng: Random,
    importance_map: np.ndarray,
    max_iter: int = 5000,
) -> np.ndarray | None:
    """C++ dart throwing + pruning; returns padded (x, y) pairs like
    `preprocessing.importance_sampling`, or None when native is missing."""
    lib = get_lib()
    if lib is None:
        return None
    mt, pos = _rng_state(rng)
    imp = np.ascontiguousarray(importance_map, np.float32)
    out = np.empty(2 * num_patches, np.int64)
    count = lib.importance_sample(
        img_shape[0],
        img_shape[1],
        patch_size,
        num_patches,
        max_iter,
        mt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.byref(pos),
        imp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    _restore_rng(rng, mt, pos)
    return out[: 2 * count].reshape(-1, 2)


def mt_random_doubles(rng: Random, n: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    mt, pos = _rng_state(rng)
    out = np.empty(n, np.float64)
    lib.mt_random_doubles(
        mt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.byref(pos),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    _restore_rng(rng, mt, pos)
    return out


def mt_randints(rng: Random, a: int, b: int, n: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    mt, pos = _rng_state(rng)
    out = np.empty(n, np.int64)
    lib.mt_randints(
        mt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.byref(pos),
        a,
        b,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    _restore_rng(rng, mt, pos)
    return out
