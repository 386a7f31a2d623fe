"""ctypes binding for the native C++ data loader (native/cvloader).

Provides threaded JPEG/PNG decode + INTER_AREA resize + a background
prefetch ring feeding NHWC uint8 batches — the native replacement for the
reference's DataLoader worker processes (train_unet.py:186-205).  Falls
back to cv2/numpy on hosts without the built library.

Build: cmake -S native/cvloader -B build/cvloader && cmake --build build/cvloader
(or python -m chessvision_tpu.native_loader --build)
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_LIB_DIR = Path(__file__).parent / "lib"
_LIB_PATH = _LIB_DIR / "libcvloader.so"
_SRC_DIR = Path(__file__).parent.parent / "native" / "cvloader"

_lib: ctypes.CDLL | None = None


def build_library(force: bool = False) -> bool:
    """Build libcvloader.so via CMake; returns True on success."""
    if _LIB_PATH.exists() and not force:
        return True
    build_dir = Path(__file__).parent.parent / "build" / "cvloader"
    try:
        subprocess.run(
            ["cmake", "-S", str(_SRC_DIR), "-B", str(build_dir), "-DCMAKE_BUILD_TYPE=Release"],
            check=True,
            capture_output=True,
        )
        subprocess.run(
            ["cmake", "--build", str(build_dir), "--parallel"], check=True, capture_output=True
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        out = getattr(e, "stderr", b"")
        logger.warning("cvloader build failed: %s %s", e, out[-500:] if out else "")
        return False
    return _LIB_PATH.exists()


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build_library():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.cvl_load_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.cvl_load_image.restype = ctypes.c_int
    lib.cvl_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.cvl_load_batch.restype = ctypes.c_int
    lib.cvl_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.cvl_prefetcher_create.restype = ctypes.c_void_p
    lib.cvl_prefetcher_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.cvl_prefetcher_next.restype = ctypes.c_int
    lib.cvl_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "cvl_pack_yuv444"):
        lib.cvl_pack_yuv444.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.cvl_pack_yuv444.restype = None
    if hasattr(lib, "cvl_pack_yuv420"):
        lib.cvl_pack_yuv420.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.cvl_pack_yuv420.restype = None
    _lib = lib
    return lib


def has_pack_yuv444() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "cvl_pack_yuv444")


def has_pack_yuv420() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "cvl_pack_yuv420")


def pack_yuv420(
    comp: np.ndarray, gray: np.ndarray, n_threads: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Fused C++ packing for the approximate 4:2:0 mode: (cb, cr)
    subsampled chroma diffs from comp+gray (bit-identical to
    engine.pack_inputs_yuv's numpy fallback)."""
    lib = _load()
    n, ih, iw = comp.shape[0], comp.shape[1], comp.shape[2]
    fh, fw = gray.shape[1] // ih, gray.shape[2] // iw
    comp = np.ascontiguousarray(comp)
    gray = np.ascontiguousarray(gray)
    cb = np.empty((n, ih // 2, iw // 2), np.uint8)
    cr = np.empty((n, ih // 2, iw // 2), np.uint8)
    lib.cvl_pack_yuv420(
        comp.ctypes.data_as(ctypes.c_void_p),
        gray.ctypes.data_as(ctypes.c_void_p),
        n, ih, iw, fh, fw,
        cb.ctypes.data_as(ctypes.c_void_p),
        cr.ctypes.data_as(ctypes.c_void_p),
        n_threads,
    )
    return cb, cr


def pack_yuv444(
    comp: np.ndarray, gray: np.ndarray, n_threads: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fused C++ packing for the engine's bit-exact yuv444 mode: (cb, cr,
    gres) from the exact comp + full-res luma (see engine.pack_inputs_yuv444
    — bit-identical to its numpy fallback, one pass instead of ~10)."""
    lib = _load()
    n, ih, iw = comp.shape[0], comp.shape[1], comp.shape[2]
    fh, fw = gray.shape[1] // ih, gray.shape[2] // iw
    comp = np.ascontiguousarray(comp)
    gray = np.ascontiguousarray(gray)
    cb = np.empty((n, ih, iw), np.uint8)
    cr = np.empty((n, ih, iw), np.uint8)
    gres = np.empty((n, ih, iw // 2), np.uint8)
    lib.cvl_pack_yuv444(
        comp.ctypes.data_as(ctypes.c_void_p),
        gray.ctypes.data_as(ctypes.c_void_p),
        n, ih, iw, fh, fw,
        cb.ctypes.data_as(ctypes.c_void_p),
        cr.ctypes.data_as(ctypes.c_void_p),
        gres.ctypes.data_as(ctypes.c_void_p),
        n_threads,
    )
    return cb, cr, gres


def available() -> bool:
    return _load() is not None


def _paths_array(paths: list[str]) -> ctypes.Array:
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [str(p).encode() for p in paths]
    return arr


def load_image(path: str, h: int, w: int, channels: int = 3) -> np.ndarray:
    """Decode + resize one image to (h, w, channels) uint8 (BGR)."""
    lib = _load()
    if lib is None:
        return _fallback_load(path, h, w, channels)
    out = np.empty((h, w, channels), np.uint8)
    rc = lib.cvl_load_image(str(path).encode(), h, w, channels, out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise IOError(f"cvloader failed to decode {path}")
    return out if channels > 1 else out[..., 0]


def load_batch(paths: list[str], h: int, w: int, channels: int = 3, n_threads: int = 8) -> tuple[np.ndarray, int]:
    """Decode + resize a batch in parallel; returns (batch, n_failures)."""
    lib = _load()
    if lib is None:
        imgs = np.stack([_fallback_load(p, h, w, channels) for p in paths])
        return imgs.reshape(len(paths), h, w, channels), 0
    out = np.empty((len(paths), h, w, channels), np.uint8)
    failures = lib.cvl_load_batch(
        _paths_array(paths), len(paths), h, w, channels,
        out.ctypes.data_as(ctypes.c_void_p), n_threads,
    )
    return out, int(failures)


class Prefetcher:
    """Background batch producer over a file list (bounded ready ring)."""

    def __init__(
        self,
        paths: list[str],
        batch: int,
        h: int,
        w: int,
        channels: int = 3,
        n_threads: int = 8,
        shuffle: bool = True,
        seed: int = 0,
        max_ready: int = 4,
    ) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native cvloader not available")
        self._lib = lib
        self._paths_keepalive = _paths_array(paths)
        self._shape = (batch, h, w, channels)
        self._handle = lib.cvl_prefetcher_create(
            self._paths_keepalive, len(paths), batch, h, w, channels,
            n_threads, int(shuffle), seed, max_ready,
        )

    def next(self) -> tuple[np.ndarray, np.ndarray]:
        """Blocking: (batch uint8 NHWC, source indices int64)."""
        out = np.empty(self._shape, np.uint8)
        idx = np.empty(self._shape[0], np.int64)
        rc = self._lib.cvl_prefetcher_next(
            self._handle, out.ctypes.data_as(ctypes.c_void_p), idx.ctypes.data_as(ctypes.c_void_p)
        )
        if rc != 0:
            raise StopIteration
        return out, idx

    def close(self) -> None:
        if self._handle:
            self._lib.cvl_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self) -> None:
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass


def _fallback_load(path: str, h: int, w: int, channels: int) -> np.ndarray:
    import cv2

    flags = cv2.IMREAD_COLOR if channels == 3 else cv2.IMREAD_GRAYSCALE
    img = cv2.imread(str(path), flags)
    if img is None:
        return np.zeros((h, w, channels) if channels > 1 else (h, w), np.uint8)
    if img.shape[:2] != (h, w):
        interp = cv2.INTER_AREA if img.shape[0] >= h else cv2.INTER_LINEAR
        img = cv2.resize(img, (w, h), interpolation=interp)
    return img


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--build", action="store_true")
    args = parser.parse_args()
    if args.build:
        ok = build_library(force=True)
        print("built" if ok else "FAILED")
