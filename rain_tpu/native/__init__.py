"""Native (C) components, loaded via ctypes with pure-Python fallbacks.

The shared library is compiled on demand from the bundled sources (cc -O2)
and cached next to them; any failure (no compiler, read-only install)
degrades gracefully to the Python implementations in rain_tpu.data.
"""

from __future__ import annotations

import ctypes
import subprocess
import tempfile
from pathlib import Path

_HERE = Path(__file__).parent
_LIB = None
_TRIED = False


def _compile(src: Path, out: Path) -> bool:
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", str(src), "-o", str(out)],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def load() -> ctypes.CDLL | None:
    """The colmap_fast library, or None when unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = _HERE / "colmap_fast.c"
    so = _HERE / "colmap_fast.so"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            target = so
            if not _compile(src, target):
                return None
        lib = ctypes.CDLL(str(so))
    except OSError:
        # read-only package dir: build in a temp location
        try:
            tmp = Path(tempfile.gettempdir()) / "rain_tpu_colmap_fast.so"
            if not _compile(src, tmp):
                return None
            lib = ctypes.CDLL(str(tmp))
        except OSError:
            return None
    lib.colmap_parse_points3d.restype = ctypes.c_long
    lib.colmap_parse_points3d.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_long]
    lib.colmap_parse_images.restype = ctypes.c_long
    lib.colmap_parse_images.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
    _LIB = lib
    return _LIB
