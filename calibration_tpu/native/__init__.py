"""Native (C++) dataset codec bindings.

Builds ``dataset_codec.cpp`` into a shared library on first use (g++ -O3)
and exposes it through ctypes. ``load_detections_packed`` parses a planar
detections JSON payload and returns padded device-ready arrays without
creating per-point Python objects — the native-IO equivalent of the
reference's C++ JSON layer (include/calib/io/json.h) for the hot ingest path.

Falls back to the pure-Python loader when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, NamedTuple, Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "dataset_codec.cpp"
_LIB = _HERE / "_dataset_codec.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[Path]:
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return _LIB
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native codec; None when unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if _build() is None:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _build_failed = True
            return None
        lib.ctpu_parse_detections.restype = ctypes.c_void_p
        lib.ctpu_parse_detections.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        for name in (
            "ctpu_error", "ctpu_sensor_id", "ctpu_feature_type", "ctpu_header_json",
        ):
            getattr(lib, name).restype = ctypes.c_char_p
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.ctpu_num_images.restype = ctypes.c_int64
        lib.ctpu_num_images.argtypes = [ctypes.c_void_p]
        lib.ctpu_max_points.restype = ctypes.c_int64
        lib.ctpu_max_points.argtypes = [ctypes.c_void_p]
        lib.ctpu_num_points.restype = ctypes.c_int64
        lib.ctpu_num_points.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.ctpu_image_file.restype = ctypes.c_char_p
        lib.ctpu_image_file.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.ctpu_num_tags.restype = ctypes.c_int64
        lib.ctpu_num_tags.argtypes = [ctypes.c_void_p]
        lib.ctpu_tag.restype = ctypes.c_char_p
        lib.ctpu_tag.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.ctpu_count_views.restype = ctypes.c_int64
        lib.ctpu_count_views.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.ctpu_pack.restype = ctypes.c_int64
        lib.ctpu_pack.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ctpu_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# fast JSON serializer (fastjson.cpp): artifact writing was the single
# largest host cost of the full-pipeline bench (stdlib json.dumps ~0.6s of a
# 1.3s warm 16-rig run). CPython extension; stdlib fallback keeps behavior
# identical when no compiler is available.

_FJ_SRC = _HERE / "fastjson.cpp"
_FJ_LIB = _HERE / "_fastjson.so"
_fj_mod = None
_fj_failed = False


def _fastjson():
    global _fj_mod, _fj_failed
    with _lock:
        if _fj_mod is not None:
            return _fj_mod
        if _fj_failed:
            return None
        import sysconfig

        if not _FJ_LIB.exists() or _FJ_LIB.stat().st_mtime < _FJ_SRC.stat().st_mtime:
            cmd = [
                "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                f"-I{sysconfig.get_paths()['include']}",
                str(_FJ_SRC), "-o", str(_FJ_LIB),
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            except Exception:
                _fj_failed = True
                return None
        try:
            import importlib.machinery
            import importlib.util

            loader = importlib.machinery.ExtensionFileLoader("_fastjson", str(_FJ_LIB))
            spec = importlib.util.spec_from_file_location(
                "_fastjson", str(_FJ_LIB), loader=loader
            )
            mod = importlib.util.module_from_spec(spec)
            loader.exec_module(mod)
        except Exception:
            _fj_failed = True
            return None
        _fj_mod = mod
        return _fj_mod


def dumps_fast(obj, indent=None) -> str:
    """json.dumps-compatible serialization (ensure_ascii, default
    separators / indent=N) through the native writer; falls back to stdlib
    json on any unsupported input."""
    mod = _fastjson()
    if mod is not None:
        try:
            return mod.dumps(obj, indent=indent)
        except (TypeError, ValueError):
            pass
    import json

    return json.dumps(obj, indent=indent)


class PackedDetections(NamedTuple):
    sensor_id: str
    feature_type: str
    tags: List[str]
    files: List[str]
    obj_xy: np.ndarray  # (V, N, 2)
    img_uv: np.ndarray  # (V, N, 2)
    mask: np.ndarray  # (V, N) bool
    point_ids: np.ndarray  # (V, N) int64
    # top-level JSON object minus "images", re-emitted verbatim by the codec;
    # json.loads of this is O(header) instead of O(payload)
    header_json: str = "{}"


def load_detections_packed(
    source, min_points: int = 0, pad_to: Optional[int] = None
) -> PackedDetections:
    """Parse + pack a detections JSON payload natively.

    source: path or bytes/str JSON payload.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native dataset codec unavailable (no compiler?)")

    if isinstance(source, (str, Path)) and os.path.exists(str(source)):
        data = Path(source).read_bytes()
    elif isinstance(source, bytes):
        data = source
    else:
        data = str(source).encode()

    handle = lib.ctpu_parse_detections(data, len(data))
    try:
        err = lib.ctpu_error(handle).decode()
        if err:
            raise ValueError(f"native dataset codec: {err}")
        num_views = int(lib.ctpu_count_views(handle, min_points))
        n = int(lib.ctpu_max_points(handle))
        if pad_to is not None:
            n = max(n, pad_to)
        n = max(n, 1)
        obj = np.zeros((num_views, n, 2), np.float64)
        uv = np.zeros((num_views, n, 2), np.float64)
        mask = np.zeros((num_views, n), np.uint8)
        ids = np.zeros((num_views, n), np.int64)
        if num_views:
            wrote = lib.ctpu_pack(
                handle, min_points, n,
                obj.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                uv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            if wrote != num_views:
                raise RuntimeError("native dataset codec: packing mismatch")
        files = []
        k = 0
        for i in range(int(lib.ctpu_num_images(handle))):
            if int(lib.ctpu_num_points(handle, i)) >= min_points:
                files.append(lib.ctpu_image_file(handle, i).decode())
                k += 1
        tags = [
            lib.ctpu_tag(handle, i).decode() for i in range(int(lib.ctpu_num_tags(handle)))
        ]
        return PackedDetections(
            sensor_id=lib.ctpu_sensor_id(handle).decode(),
            feature_type=lib.ctpu_feature_type(handle).decode(),
            tags=tags,
            files=files,
            obj_xy=obj,
            img_uv=uv,
            mask=mask.astype(bool),
            point_ids=ids,
            header_json=lib.ctpu_header_json(handle).decode(),
        )
    finally:
        lib.ctpu_free(handle)
