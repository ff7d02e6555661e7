"""Loader for the C++ host data-plane (native/dssm_native.cpp).

Builds the extension on first use with the system toolchain (g++ + the
CPython headers — no pybind11/pip in this environment), caches the .so under
native/build/, and falls back to the pure-Python implementation when a
toolchain isn't available. `dssm_tpu.data.trigram` routes through this module
transparently; tests assert bit-exact parity between the two paths.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
import threading
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "dssm_native.cpp")
_BUILD_DIR = os.path.join(_REPO, "native", "build")

_lock = threading.Lock()
_module = None
_tried = False


def _so_path() -> str:
    tag = sysconfig.get_config_var("SOABI") or "generic"
    return os.path.join(_BUILD_DIR, f"dssm_native.{tag}.so")


def _build() -> Optional[str]:
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    os.makedirs(_BUILD_DIR, exist_ok=True)
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", _SRC, "-o", so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"dssm_native build failed ({e}); using Python hashing",
              file=sys.stderr)
        return None
    return so


def get_module():
    """The compiled module, or None (Python fallback)."""
    global _module, _tried
    if _module is not None or _tried:
        return _module
    with _lock:
        if _module is not None or _tried:
            return _module
        _tried = True
        if os.environ.get("DSSM_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        import importlib.util

        spec = importlib.util.spec_from_file_location("dssm_native", so)
        mod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(mod)
        except ImportError as e:
            print(f"dssm_native load failed ({e}); using Python hashing",
                  file=sys.stderr)
            return None
        _module = mod
    return _module


def hash_batch(
    texts, vocab_size: int, k: int, normalize: bool = False
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    mod = get_module()
    if mod is None:
        return None
    idx_b, wgt_b = mod.hash_batch(list(texts), vocab_size, k, normalize)
    n = len(texts)
    idx = np.frombuffer(idx_b, dtype=np.int32).reshape(n, k).copy()
    wgt = np.frombuffer(wgt_b, dtype=np.float32).reshape(n, k).copy()
    return idx, wgt


def dedupe_two_level(
    idx: np.ndarray, g_cap_rows: int, u2_cap: int, group: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """C++ two-level batch dedupe (see kernels/dedup_embed.dedupe_two_level
    for semantics — bit-exact parity asserted in tests/test_native.py).
    Returns None when the extension isn't available."""
    mod = get_module()
    if mod is None or not hasattr(mod, "dedupe_two_level"):
        return None
    flat = np.ascontiguousarray(idx, dtype=np.int32)
    # numpy arrays satisfy the y* buffer protocol — no .tobytes() copy.
    uniq_b, sel_b, inv_b, keep_b = mod.dedupe_two_level(
        flat.reshape(-1), g_cap_rows, u2_cap, group
    )
    uniq = np.frombuffer(uniq_b, dtype=np.int32).copy()
    sel = np.frombuffer(sel_b, dtype=np.int32).copy()
    # inv2/keep stay zero-copy views over the result bytes (read-only — they
    # are consumed as-is by device_put / arithmetic): at the multihost batch
    # these are 33 MB each and the copy pass costs more than the dedupe.
    inv2 = np.frombuffer(inv_b, dtype=np.int32).reshape(idx.shape)
    keep = np.frombuffer(keep_b, dtype=np.float32).reshape(idx.shape)
    return uniq, sel, inv2, keep


def dedupe_two_level_joint(
    q_idx: np.ndarray, d_idx: np.ndarray, g_cap_rows: int, u2_cap: int,
    group: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """C++ UNION dedupe over both sides without the host-side concatenate
    (q first in inv/keep order — exactly np.concatenate([q, d]) semantics).
    Returns (uniq, sel, inv2 [nq+nd], keep [nq+nd]) or None."""
    mod = get_module()
    if mod is None or not hasattr(mod, "dedupe_two_level_joint"):
        return None
    q = np.ascontiguousarray(q_idx, dtype=np.int32).reshape(-1)
    d = np.ascontiguousarray(d_idx, dtype=np.int32).reshape(-1)
    uniq_b, sel_b, inv_b, keep_b = mod.dedupe_two_level_joint(
        q, d, g_cap_rows, u2_cap, group
    )
    uniq = np.frombuffer(uniq_b, dtype=np.int32).copy()
    sel = np.frombuffer(sel_b, dtype=np.int32).copy()
    inv2 = np.frombuffer(inv_b, dtype=np.int32)
    keep = np.frombuffer(keep_b, dtype=np.float32)
    return uniq, sel, inv2, keep


def hash_batch_sequence(
    texts, vocab_size: int, t: int, kw: int, normalize: bool = False
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    mod = get_module()
    if mod is None:
        return None
    idx_b, wgt_b, mask_b = mod.hash_batch_sequence(
        list(texts), vocab_size, t, kw, normalize
    )
    n = len(texts)
    idx = np.frombuffer(idx_b, dtype=np.int32).reshape(n, t, kw).copy()
    wgt = np.frombuffer(wgt_b, dtype=np.float32).reshape(n, t, kw).copy()
    mask = np.frombuffer(mask_b, dtype=np.float32).reshape(n, t).copy()
    return idx, wgt, mask
