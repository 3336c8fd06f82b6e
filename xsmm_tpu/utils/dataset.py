"""Packed training datasets + native prefetching loader.

The GxM data-layer analog (reference: samples/deeplearning/gxm reads
LMDB/JPEG with background I/O threads; documentation/gxm.md).  Datasets are
a packed uint8 file ("XSD1": header + label/image records); the loader is
the C++ worker pool in native/dataloader.cpp (ctypes ABI), with a pure-
Python fallback reading the same format, so a missing compiler only costs
prefetch overlap.

Usage:
    write_dataset(path, images_u8, labels)         # [N,H,W,C] u8, [N] int
    for x, y in DataLoader(path, batch=256):       # f32 in [-0.5, 0.5]
        engine.train_epoch(...)
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import Iterator, Optional, Tuple

import numpy as np

_MAGIC = 0x31445358  # "XSD1"
_HDR = struct.Struct("<IIQIII")  # magic, nclasses, count, h, w, c


def write_dataset(path: str, images: np.ndarray, labels: np.ndarray,
                  nclasses: Optional[int] = None) -> None:
    """Pack [N,H,W,C] uint8 images + int labels into an XSD1 file."""
    images = np.ascontiguousarray(images, dtype=np.uint8)
    labels = np.asarray(labels, dtype=np.int32)
    assert images.ndim == 4 and labels.shape == (images.shape[0],)
    n, h, w, c = images.shape
    nclasses = int(nclasses if nclasses is not None else labels.max() + 1)
    with open(path, "wb") as f:
        f.write(_HDR.pack(_MAGIC, nclasses, n, h, w, c))
        for i in range(n):
            f.write(struct.pack("<i", int(labels[i])))
            f.write(images[i].tobytes())


def _read_header(path: str):
    with open(path, "rb") as f:
        magic, ncls, count, h, w, c = _HDR.unpack(f.read(_HDR.size))
    if magic != _MAGIC:
        raise ValueError(f"{path}: not an XSD1 dataset")
    return ncls, count, h, w, c


def _native_lib():
    from ..core.native_bridge import get_lib
    lib = get_lib()
    if lib is None or not hasattr(lib, "xsmm_dl_open"):
        return None
    if getattr(lib, "_dl_bound", False):
        return lib
    lib.xsmm_dl_open.restype = ctypes.c_void_p
    lib.xsmm_dl_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_uint64]
    for fn in ("xsmm_dl_count", "xsmm_dl_batches_per_epoch", "xsmm_dl_next"):
        getattr(lib, fn).restype = ctypes.c_int64
    lib.xsmm_dl_count.argtypes = [ctypes.c_void_p]
    lib.xsmm_dl_batches_per_epoch.argtypes = [ctypes.c_void_p]
    for fn in ("xsmm_dl_height", "xsmm_dl_width", "xsmm_dl_channels",
               "xsmm_dl_nclasses"):
        getattr(lib, fn).restype = ctypes.c_int32
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.xsmm_dl_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_void_p]
    lib.xsmm_dl_close.argtypes = [ctypes.c_void_p]
    lib._dl_bound = True
    return lib


class DataLoader:
    """Iterable over (images f32 [B,H,W,C], labels i32 [B]) batches.

    Native path: C++ worker threads prefetch + normalize ahead of the
    consumer.  ``epochs`` bounds iteration; batches are shuffled per epoch.
    """

    def __init__(self, path: str, batch: int, epochs: int = 1,
                 prefetch: int = 4, nthreads: int = 2, seed: int = 42,
                 native: bool = True):
        self.path = path
        self.batch = batch
        self.epochs = epochs
        self.prefetch = prefetch
        self.nthreads = nthreads
        self.seed = seed
        (self.nclasses, self.count, self.h, self.w, self.c) = \
            _read_header(path)
        self.batches_per_epoch = self.count // batch
        if self.batches_per_epoch == 0:
            raise ValueError("batch larger than dataset")
        self._lib = _native_lib() if native else None

    def __len__(self):
        return self.batches_per_epoch * self.epochs

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        if self._lib is not None:
            yield from self._iter_native()
        else:
            yield from self._iter_python()

    # -- native prefetching path ----------------------------------------------
    def _iter_native(self):
        lib = self._lib
        h = lib.xsmm_dl_open(self.path.encode(), self.batch, self.prefetch,
                             self.nthreads, self.seed)
        if not h:
            yield from self._iter_python()
            return
        try:
            for _ in range(len(self)):
                x = np.empty((self.batch, self.h, self.w, self.c), np.float32)
                y = np.empty((self.batch,), np.int32)
                epoch = lib.xsmm_dl_next(
                    h, x.ctypes.data_as(ctypes.c_void_p),
                    y.ctypes.data_as(ctypes.c_void_p))
                if epoch < 0:
                    break
                yield x, y
        finally:
            lib.xsmm_dl_close(h)

    # -- pure-Python fallback (same format, same shuffle-per-epoch) -----------
    def _iter_python(self):
        px = self.h * self.w * self.c
        rec = 4 + px
        with open(self.path, "rb") as f:
            raw = f.read()
        body = np.frombuffer(raw, np.uint8, offset=_HDR.size)
        recs = body[:self.count * rec].reshape(self.count, rec)
        labels = recs[:, :4].copy().view(np.int32).ravel()
        images = recs[:, 4:]
        rng = np.random.default_rng(self.seed)
        for _ in range(self.epochs):
            perm = rng.permutation(self.count)
            for b in range(self.batches_per_epoch):
                idx = perm[b * self.batch:(b + 1) * self.batch]
                x = (images[idx].astype(np.float32) / 255.0 - 0.5).reshape(
                    self.batch, self.h, self.w, self.c)
                yield x, labels[idx].astype(np.int32)
