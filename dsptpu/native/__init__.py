"""Native (C++) runtime components, bound via ctypes.

`StreamReader` — double-buffered prefetching chunk reader
(ringbuffer.cpp): a reader thread keeps N chunks ahead of the
consumer so disk/pipe IO overlaps device compute. Compiled on first
use with the system C++ toolchain and cached next to the source; if
no compiler is available, a numpy.memmap fallback provides the same
API (without the prefetch thread).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["StreamReader", "native_available"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ringbuffer.cpp")
_SO = os.path.join(_DIR, "_ringbuffer.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["c++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", _SRC, "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.rb_open.restype = ctypes.c_void_p
            lib.rb_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.c_int]
            lib.rb_next.restype = ctypes.c_size_t
            lib.rb_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_char_p)]
            lib.rb_release.argtypes = [ctypes.c_void_p]
            lib.rb_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available():
    return _load() is not None


class StreamReader:
    """Iterate numpy chunks of `chunk` samples from a raw sample file.

    with StreamReader(path, chunk=1 << 20, dtype=np.float32,
                      channels=4) as sr:
        for block in sr:       # block: (chunk, channels), last may be
            process(block)     # shorter
    """

    def __init__(self, path, chunk, dtype=np.float32, channels=1, nslots=4):
        self.path = path
        self.dtype = np.dtype(dtype)
        self.channels = int(channels)
        self.chunk = int(chunk)
        self.itemsize = self.dtype.itemsize * self.channels
        self._lib = _load()
        self._h = None
        self._mm = None
        self._pos = 0
        if self._lib is not None:
            self._h = self._lib.rb_open(
                path.encode(), self.chunk * self.itemsize, int(nslots))
            if not self._h:
                raise OSError(f"cannot open {path}")
        else:  # fallback: memmap without prefetch
            self._mm = np.memmap(path, dtype=self.dtype, mode="r")

    def __iter__(self):
        return self

    def __next__(self):
        if self._h is not None:
            ptr = ctypes.c_char_p()
            nbytes = self._lib.rb_next(self._h, ctypes.byref(ptr))
            if nbytes == 0:
                raise StopIteration
            nsamp = nbytes // self.itemsize
            buf = ctypes.string_at(ptr, nsamp * self.itemsize)
            self._lib.rb_release(self._h)
            arr = np.frombuffer(buf, dtype=self.dtype)
        else:
            total = self._mm.shape[0] // self.channels
            if self._pos >= total:
                raise StopIteration
            n = min(self.chunk, total - self._pos)
            arr = np.array(self._mm[self._pos * self.channels:
                                    (self._pos + n) * self.channels])
            self._pos += n
        if self.channels > 1:
            arr = arr.reshape(-1, self.channels)
        return arr

    def close(self):
        if self._h is not None:
            self._lib.rb_close(self._h)
            self._h = None
        self._mm = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
