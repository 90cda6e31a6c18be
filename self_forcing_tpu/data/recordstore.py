"""Record-shard store: Python API over the native C++ mmap reader.

Replaces the reference's LMDB layer (utils/lmdb.py — LMDB's C library is
not in this image) with an in-repo native component:

- :class:`RecordWriter` — offline shard creation (pure Python, used by the
  scripts/ data-prep tools just like the reference's
  store_arrays_to_lmdb, utils/lmdb.py:11-27).
- :class:`RecordReader` — hot-path reads via csrc/recordstore.cpp
  (mmap + FNV hash index, zero-copy numpy views); falls back to a pure
  Python reader if the native library can't be built.

The key conventions match the reference exactly (utils/lmdb.py:4-9,56-72):
``{name}_shape`` holds a space-separated shape string and
``{name}_{i}_data`` holds row i of array ``name``.
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Iterable, Mapping

import numpy as np

_MAGIC = b"SFRS0001"
_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB = None
_LIB_FAILED = False


def _build_native() -> str | None:
    src = os.path.join(_CSRC, "recordstore.cpp")
    out = os.path.join(_CSRC, "build", "librecordstore.so")
    if not os.path.exists(src):
        return None
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    return out


def _native():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    path = _build_native()
    if path is None:
        _LIB_FAILED = True
        return None
    lib = ctypes.CDLL(path)
    lib.rs_open.restype = ctypes.c_void_p
    lib.rs_open.argtypes = [ctypes.c_char_p]
    lib.rs_close.argtypes = [ctypes.c_void_p]
    lib.rs_num_records.restype = ctypes.c_uint64
    lib.rs_num_records.argtypes = [ctypes.c_void_p]
    lib.rs_get.restype = ctypes.c_void_p
    lib.rs_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                           ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint64)]
    lib.rs_key_at.restype = ctypes.c_void_p
    lib.rs_key_at.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                              ctypes.POINTER(ctypes.c_uint32)]
    _LIB = lib
    return lib


class RecordWriter:
    """Append-only shard writer.  Records are 8-byte aligned blobs; the
    index is written at close."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "wb")
        self._f.write(_MAGIC + struct.pack("<QQ", 0, 0))
        self._index: list[tuple[int, int, bytes]] = []

    def put(self, key: str | bytes, value: bytes | np.ndarray) -> None:
        if isinstance(key, str):
            key = key.encode()
        if isinstance(value, np.ndarray):
            value = value.tobytes()
        pos = self._f.tell()
        pad = (-pos) % 8
        if pad:
            self._f.write(b"\0" * pad)
            pos += pad
        self._f.write(value)
        self._index.append((pos, len(value), key))

    def close(self) -> None:
        idx_off = self._f.tell()
        for off, size, key in self._index:
            self._f.write(struct.pack("<QQI", off, size, len(key)) + key)
        self._f.seek(8)
        self._f.write(struct.pack("<QQ", len(self._index), idx_off))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class _PyReader:
    """Pure-Python fallback reader (same file format)."""

    def __init__(self, path: str):
        self._mm = np.memmap(path, dtype=np.uint8, mode="r")
        raw = bytes(self._mm[:24])
        assert raw[:8] == _MAGIC, f"bad magic in {path}"
        n, idx_off = struct.unpack("<QQ", raw[8:24])
        self.index: dict[bytes, tuple[int, int]] = {}
        buf = bytes(self._mm[idx_off:])
        p = 0
        for _ in range(n):
            off, size, klen = struct.unpack_from("<QQI", buf, p)
            p += 20
            key = bytes(buf[p:p + klen])
            p += klen
            self.index[key] = (off, size)

    def get(self, key: bytes):
        hit = self.index.get(key)
        if hit is None:
            return None
        off, size = hit
        return self._mm[off:off + size]

    def keys(self):
        return list(self.index.keys())

    def __len__(self):
        return len(self.index)

    def close(self):
        del self._mm


class RecordReader:
    """Zero-copy reads through the native library (Python fallback)."""

    def __init__(self, path: str):
        self.path = path
        lib = _native()
        self._py = None
        self._h = None
        if lib is not None:
            h = lib.rs_open(path.encode())
            if h:
                self._h = h
                self._lib = lib
        if self._h is None:
            self._py = _PyReader(path)

    def get(self, key: str | bytes) -> np.ndarray | None:
        """Returns a read-only uint8 numpy view of the record (no copy),
        or None.  The view's base chain holds this reader alive, so the
        mmap cannot be unmapped under it by GC; an explicit close() while
        views are outstanding is still the caller's hazard."""
        if isinstance(key, str):
            key = key.encode()
        if self._py is not None:
            return self._py.get(key)
        size = ctypes.c_uint64()
        ptr = self._lib.rs_get(self._h, key, len(key), ctypes.byref(size))
        if not ptr:
            return None
        buf = (ctypes.c_uint8 * size.value).from_address(ptr)
        buf._owner = self  # lifetime: arr.base is buf, buf holds the mmap
        arr = np.frombuffer(buf, dtype=np.uint8)
        arr.flags.writeable = False  # PROT_READ mapping: writes segfault
        return arr

    def __len__(self):
        if self._py is not None:
            return len(self._py)
        return int(self._lib.rs_num_records(self._h))

    def keys(self) -> list[bytes]:
        if self._py is not None:
            return self._py.keys()
        out = []
        klen = ctypes.c_uint32()
        for i in range(len(self)):
            ptr = self._lib.rs_key_at(self._h, i, ctypes.byref(klen))
            out.append(ctypes.string_at(ptr, klen.value))
        return out

    def close(self):
        if self._py is not None:
            self._py.close()
            self._py = None
        elif self._h is not None:
            self._lib.rs_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------
# reference LMDB conventions (utils/lmdb.py) on top of record shards
# ---------------------------------------------------------------------

def get_array_shape(reader: RecordReader, array_name: str) -> tuple:
    """utils/lmdb.py:4-9."""
    raw = reader.get(f"{array_name}_shape")
    assert raw is not None, f"missing {array_name}_shape"
    return tuple(int(x) for x in bytes(raw).decode().split())


def store_arrays(writer: RecordWriter, arrays_dict: Mapping[str, Iterable],
                 start_index: int = 0) -> None:
    """utils/lmdb.py:11-27: store rows of multiple arrays."""
    for name, array in arrays_dict.items():
        for i, row in enumerate(array):
            data = row.encode() if isinstance(row, str) else \
                np.asarray(row).tobytes()
            writer.put(f"{name}_{start_index + i}_data", data)


def write_shape_header(writer: RecordWriter, array_name: str,
                       shape: tuple) -> None:
    writer.put(f"{array_name}_shape", " ".join(str(s) for s in shape).encode())


def retrieve_row(reader: RecordReader, array_name: str, dtype,
                 row_index: int, shape: tuple | None = None):
    """utils/lmdb.py:56-72."""
    raw = reader.get(f"{array_name}_{row_index}_data")
    assert raw is not None, f"missing {array_name}_{row_index}_data"
    if dtype is str:
        return bytes(raw).decode()
    arr = np.frombuffer(bytes(raw), dtype=dtype)
    if shape:
        arr = arr.reshape(shape)
    return arr
