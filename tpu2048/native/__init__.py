"""ctypes bindings for the native C++ bitboard engine.

Builds ``libengine2048.so`` on first use (g++ -O3, cached next to the source).
The binary is never committed; staleness is detected by a content hash of the
source (mtimes are arbitrary after checkout), so the library in use always
matches the reviewable .cpp. The native tier is the host runtime: a
mass-testing oracle and fast host-side playouts — the accelerator path stays
the jitted JAX engine.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "engine2048.cpp"
_LIB = _DIR / "libengine2048.so"
_HASH = _DIR / "libengine2048.srchash"

_lib = None


def _src_hash() -> str:
    return hashlib.sha256(_SRC.read_bytes()).hexdigest()


def _build(src_hash: str) -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
         "-o", str(_LIB), str(_SRC)],
        check=True, capture_output=True,
    )
    _HASH.write_text(src_hash)


def load():
    """Load (building if needed) the native library; raises on toolchain
    failure — callers can fall back to the Python oracle."""
    global _lib
    if _lib is not None:
        return _lib
    h = _src_hash()
    if not _LIB.exists() or not _HASH.exists() or _HASH.read_text().strip() != h:
        _build(h)
    lib = ctypes.CDLL(str(_LIB))
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.engine_init.restype = None
    lib.engine_move.restype = ctypes.c_int
    lib.engine_move.argtypes = [i32p, ctypes.c_int, i32p, i32p, i32p]
    lib.engine_legal_mask.restype = ctypes.c_int
    lib.engine_legal_mask.argtypes = [i32p]
    lib.engine_score.restype = ctypes.c_int64
    lib.engine_score.argtypes = [i32p]
    lib.engine_spawn.restype = None
    lib.engine_spawn.argtypes = [i32p, ctypes.c_uint64]
    lib.engine_move_batch.restype = None
    lib.engine_move_batch.argtypes = [i32p, i32p, ctypes.c_int, i32p, i32p, i32p, i32p]
    lib.engine_legal_mask_batch.restype = None
    lib.engine_legal_mask_batch.argtypes = [i32p, ctypes.c_int, i32p]
    lib.engine_random_playout.restype = None
    lib.engine_random_playout.argtypes = [
        ctypes.c_int, ctypes.c_uint64, i64p, i32p, i32p, i64p,
    ]
    lib.engine_init()
    _lib = lib
    return lib


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def move_batch(boards: np.ndarray, dirs: np.ndarray):
    """boards (N,4,4) int32, dirs (N,) int32 ->
    (new_boards, scores, max_created, changed)."""
    lib = load()
    n = boards.shape[0]
    inb = np.ascontiguousarray(boards.reshape(n, 16), np.int32)
    d = np.ascontiguousarray(dirs, np.int32)
    out = np.empty_like(inb)
    scores = np.empty(n, np.int32)
    maxc = np.empty(n, np.int32)
    changed = np.empty(n, np.int32)
    lib.engine_move_batch(_i32p(inb), _i32p(d), n, _i32p(out), _i32p(scores),
                          _i32p(maxc), _i32p(changed))
    return out.reshape(n, 4, 4), scores, maxc, changed.astype(bool)


def legal_mask_batch(boards: np.ndarray) -> np.ndarray:
    """(N,4,4) -> (N,4) bool legality (True = legal)."""
    lib = load()
    n = boards.shape[0]
    inb = np.ascontiguousarray(boards.reshape(n, 16), np.int32)
    masks = np.empty(n, np.int32)
    lib.engine_legal_mask_batch(_i32p(inb), n, _i32p(masks))
    return (masks[:, None] >> np.arange(4)[None, :]) & 1 == 1


def random_playout(n: int, seed: int = 0):
    """Play n random-policy games natively. Returns dict with final_scores,
    num_moves, max_tiles, total_env_steps."""
    lib = load()
    scores = np.empty(n, np.int64)
    moves = np.empty(n, np.int32)
    tiles = np.empty(n, np.int32)
    total = np.empty(1, np.int64)
    lib.engine_random_playout(
        n, seed,
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _i32p(moves), _i32p(tiles),
        total.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return dict(final_scores=scores, num_moves=moves, max_tiles=tiles,
                total_env_steps=int(total[0]))
