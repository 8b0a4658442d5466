"""Native (C++) runtime components, built lazily with g++ and bound via
ctypes (this image has no pybind11; SURVEY.md §2.3 native inventory)."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build(name: str) -> str:
    src = os.path.join(_DIR, f"{name}.cpp")
    out = os.path.join(_DIR, f"lib{name}.so")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
        logger.info("Building native lib: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    return out


def load(name: str):
    """Load (building if needed) lib<name>.so; returns ctypes CDLL or None
    if the toolchain is unavailable."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        try:
            lib = ctypes.CDLL(_build(name))
        except Exception as e:  # no g++ / build failure -> python fallback
            logger.warning("native %s unavailable (%s); using fallback",
                           name, e)
            lib = None
        _LIBS[name] = lib
        return lib


def coco_match(iou: np.ndarray, crowd: np.ndarray, ignore: np.ndarray,
               thrs: np.ndarray):
    """Greedy COCO matching via the native core. Returns (matched (T, D)
    int64, ignored (T, D) uint8) or None if the lib is unavailable."""
    lib = load("coco_match")
    if lib is None:
        return None
    D, G = iou.shape
    T = len(thrs)
    iou = np.ascontiguousarray(iou, np.float64)
    crowd = np.ascontiguousarray(crowd, np.uint8)
    ignore = np.ascontiguousarray(ignore, np.uint8)
    thrs = np.ascontiguousarray(thrs, np.float64)
    matched = np.zeros((T, D), np.int64)
    ignored = np.zeros((T, D), np.uint8)
    scratch = np.zeros((max(G, 1),), np.uint8)
    p = ctypes.c_void_p
    lib.coco_match(
        p(iou.ctypes.data), p(crowd.ctypes.data), p(ignore.ctypes.data),
        p(thrs.ctypes.data),
        ctypes.c_long(D), ctypes.c_long(G), ctypes.c_long(T),
        p(matched.ctypes.data), p(ignored.ctypes.data), p(scratch.ctypes.data),
    )
    return matched, ignored
