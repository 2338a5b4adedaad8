"""ctypes bindings for the native C++ host runtime (runtime/cpp).

The shared library is built lazily with g++ on first use and cached next
to the source.  Components:

- NativeBatchQueue: MPMC batching queue (fixed-size byte payloads) backing
  the continuous-batching scheduler off the GIL.
- NativeShardLoader: mmap + threaded-prefetch random-batch sampler over a
  binary float32 shard — the native replacement for the reference's
  file-per-index torch.load dataset (deep_prior/slf_dataset.py:107-110).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cpp", "qsc_runtime.cpp")
_SO = os.path.join(_DIR, "cpp", "libqsc_runtime.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build_runtime(force: bool = False) -> str:
    """Compile the shared library if needed; returns the .so path."""
    with _lock:
        if force or (not os.path.exists(_SO)
                     or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                 "-fPIC", "-o", _SO, _SRC, "-lpthread"],
                check=True, capture_output=True)
    return _SO


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build_runtime())
    lib.qsc_queue_create.restype = ctypes.c_void_p
    lib.qsc_queue_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.qsc_queue_push.restype = ctypes.c_int
    lib.qsc_queue_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_int]
    lib.qsc_queue_pop_batch.restype = ctypes.c_int
    lib.qsc_queue_pop_batch.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_int, ctypes.c_int]
    lib.qsc_queue_close.argtypes = [ctypes.c_void_p]
    lib.qsc_queue_pushed.restype = ctypes.c_uint64
    lib.qsc_queue_pushed.argtypes = [ctypes.c_void_p]
    lib.qsc_queue_popped.restype = ctypes.c_uint64
    lib.qsc_queue_popped.argtypes = [ctypes.c_void_p]
    lib.qsc_queue_destroy.argtypes = [ctypes.c_void_p]
    lib.qsc_loader_open.restype = ctypes.c_void_p
    lib.qsc_loader_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.c_size_t, ctypes.c_int,
                                    ctypes.c_uint64]
    lib.qsc_loader_next.restype = ctypes.c_int
    lib.qsc_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int]
    lib.qsc_loader_num_items.restype = ctypes.c_size_t
    lib.qsc_loader_num_items.argtypes = [ctypes.c_void_p]
    lib.qsc_loader_read.restype = ctypes.c_int
    lib.qsc_loader_read.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                    ctypes.c_size_t, ctypes.c_void_p]
    lib.qsc_loader_batches_served.restype = ctypes.c_uint64
    lib.qsc_loader_batches_served.argtypes = [ctypes.c_void_p]
    lib.qsc_loader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativeBatchQueue:
    """MPMC queue of fixed-size numpy payloads with batched pops."""

    def __init__(self, capacity: int, item_bytes: int):
        self._lib = _load()
        self._item_bytes = item_bytes
        self._q = self._lib.qsc_queue_create(capacity, item_bytes)

    def push(self, item: np.ndarray, timeout_ms: int = -1) -> bool:
        buf = np.ascontiguousarray(item).tobytes()
        assert len(buf) == self._item_bytes, (len(buf), self._item_bytes)
        return bool(self._lib.qsc_queue_push(self._q, buf, timeout_ms))

    def pop_batch(self, max_items: int, timeout_ms: int = -1) -> np.ndarray:
        out = ctypes.create_string_buffer(self._item_bytes * max_items)
        n = self._lib.qsc_queue_pop_batch(self._q, out, max_items, timeout_ms)
        raw = np.frombuffer(out.raw[: n * self._item_bytes], dtype=np.uint8)
        return raw.reshape(n, self._item_bytes)

    @property
    def pushed(self) -> int:
        return int(self._lib.qsc_queue_pushed(self._q))

    @property
    def popped(self) -> int:
        return int(self._lib.qsc_queue_popped(self._q))

    def close(self):
        self._lib.qsc_queue_close(self._q)

    def __del__(self):
        try:
            self._lib.qsc_queue_destroy(self._q)
        except Exception:
            pass


def write_shard(path: str, maps: np.ndarray) -> None:
    """Write maps [N, ...] as a raw float32 shard for NativeShardLoader."""
    arr = np.ascontiguousarray(maps, dtype=np.float32)
    arr.reshape(arr.shape[0], -1).tofile(path)


class NativeShardLoader:
    """Random-batch sampler over a float32 shard with C++ prefetch threads."""

    def __init__(self, path: str, item_shape, batch: int,
                 num_threads: int = 2, seed: int = 0):
        self._lib = _load()
        self._item_shape = tuple(item_shape)
        self._elems = int(np.prod(item_shape))
        self._batch = batch
        self._L = self._lib.qsc_loader_open(
            path.encode(), self._elems, batch, num_threads, seed)
        if not self._L:
            raise OSError(f"cannot open shard {path} "
                          f"(size % item_bytes != 0?)")

    def __len__(self):
        return int(self._lib.qsc_loader_num_items(self._L))

    @property
    def batches_served(self) -> int:
        return int(self._lib.qsc_loader_batches_served(self._L))

    def read(self, start: int, count: int) -> np.ndarray:
        """Ordered read of items [start, start+count) straight off the
        mmap — deterministic per-host feeding (multi-host data path);
        independent of the sampling threads."""
        out = np.empty((count, self._elems), np.float32)
        n = self._lib.qsc_loader_read(
            self._L, start, count, out.ctypes.data_as(ctypes.c_void_p))
        return out[:n].reshape((n,) + self._item_shape)

    def next_batch(self, timeout_ms: int = -1) -> np.ndarray:
        out = np.empty((self._batch, self._elems), np.float32)
        ok = self._lib.qsc_loader_next(
            self._L, out.ctypes.data_as(ctypes.c_void_p), timeout_ms)
        if not ok:
            raise TimeoutError("loader timeout")
        return out.reshape((self._batch,) + self._item_shape)

    def close(self):
        if self._L:
            self._lib.qsc_loader_close(self._L)
            self._L = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
