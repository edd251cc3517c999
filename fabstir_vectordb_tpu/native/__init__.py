"""ctypes bindings for the native C++ runtime (libfvdb_native).

Builds the shared library on first import if missing (g++, no external
deps); every consumer has a pure-Python fallback, so import failure is
non-fatal. See src/fvdb_native.cpp for what lives natively and the
reference components it mirrors.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "fvdb_native.cpp")
_LIB = os.path.join(_DIR, "libfvdb_native.so")

_lib = None
_lib_lock = threading.Lock()


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-o", _LIB, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library():
    """Load (building if needed) the native library; raises NativeUnavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        try:
            if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_LIB)
        except Exception as e:  # noqa: BLE001
            raise NativeUnavailable(f"native library unavailable: {e}") from e

        c = ctypes
        lib.fvdb_free.argtypes = [c.c_void_p]
        lib.fvdb_fs_get.argtypes = [c.c_char_p, c.POINTER(c.POINTER(c.c_uint8)),
                                    c.POINTER(c.c_int64)]
        lib.fvdb_fs_put.argtypes = [c.c_char_p, c.c_char_p, c.c_int64]
        lib.fvdb_fs_delete.argtypes = [c.c_char_p]
        lib.fvdb_fs_exists.argtypes = [c.c_char_p]
        lib.fvdb_fs_get_many.argtypes = [
            c.c_char_p, c.c_int, c.POINTER(c.POINTER(c.c_uint8)),
            c.POINTER(c.c_int64), c.POINTER(c.c_int), c.c_int,
        ]
        lib.fvdb_cache_new.argtypes = [c.c_int64]
        lib.fvdb_cache_new.restype = c.c_void_p
        lib.fvdb_cache_destroy.argtypes = [c.c_void_p]
        lib.fvdb_cache_put.argtypes = [c.c_void_p, c.c_char_p, c.c_char_p, c.c_int64]
        lib.fvdb_cache_get.argtypes = [c.c_void_p, c.c_char_p,
                                       c.POINTER(c.POINTER(c.c_uint8)),
                                       c.POINTER(c.c_int64)]
        lib.fvdb_cache_remove.argtypes = [c.c_void_p, c.c_char_p]
        lib.fvdb_cache_stats.argtypes = [c.c_void_p] + [c.POINTER(c.c_int64)] * 5
        lib.fvdb_index_new.argtypes = [c.c_int]
        lib.fvdb_index_new.restype = c.c_void_p
        lib.fvdb_index_destroy.argtypes = [c.c_void_p]
        lib.fvdb_index_add.argtypes = [c.c_void_p, c.c_char_p,
                                       c.POINTER(c.c_float), c.c_int]
        lib.fvdb_index_update.argtypes = lib.fvdb_index_add.argtypes
        lib.fvdb_index_delete.argtypes = [c.c_void_p, c.c_char_p]
        lib.fvdb_index_len.argtypes = [c.c_void_p]
        lib.fvdb_index_search.argtypes = [
            c.c_void_p, c.POINTER(c.c_float), c.c_int, c.c_int,
            c.c_char_p, c.POINTER(c.c_int), c.POINTER(c.c_float),
        ]
        lib.fvdb_index_id.argtypes = [c.c_void_p, c.c_int, c.c_char_p, c.c_int]
        lib.fvdb_index_get.argtypes = [c.c_void_p, c.c_char_p, c.POINTER(c.c_float)]
        fp = c.POINTER(c.c_float)
        lib.fvdb_vec_cosine.argtypes = [fp, fp, c.c_int]
        lib.fvdb_vec_cosine.restype = c.c_float
        lib.fvdb_vec_euclidean.argtypes = [fp, fp, c.c_int]
        lib.fvdb_vec_euclidean.restype = c.c_float
        lib.fvdb_vec_magnitude.argtypes = [fp, c.c_int]
        lib.fvdb_vec_magnitude.restype = c.c_float
        lib.fvdb_vec_batch_cosine.argtypes = [fp, c.c_int, c.c_int, fp, fp, c.c_int]
        lib.fvdb_kmeans_cosine.argtypes = [
            fp, c.c_int, c.c_int, c.c_int, c.c_int, c.POINTER(c.c_int), fp,
        ]
        lib.fvdb_kmeans_cosine.restype = c.c_int
        _lib = lib
        return lib


def available() -> bool:
    try:
        load_library()
        return True
    except NativeUnavailable:
        return False


_WASM_SRC = os.path.join(_DIR, "src", "fvdb_wasm.cpp")
_WASM_LIB = os.path.join(_DIR, "libfvdb_wasm.so")
_wasm_lib = None


def load_wasm_library():
    """The independent C++ WASM interpreter (src/fvdb_wasm.cpp): second
    runtime for the committed browser artifact, differentially tested
    against bindings/wasm/wasm_vm.py. Built on first use."""
    global _wasm_lib
    with _lib_lock:
        if _wasm_lib is not None:
            return _wasm_lib
        try:
            if not os.path.exists(_WASM_LIB) or (
                os.path.getmtime(_WASM_LIB) < os.path.getmtime(_WASM_SRC)
            ):
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                     "-o", _WASM_LIB, _WASM_SRC],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_WASM_LIB)
        except Exception as e:  # noqa: BLE001
            raise NativeUnavailable(f"wasm interpreter unavailable: {e}") from e
        c = ctypes
        lib.fvw_instantiate.argtypes = [c.c_char_p, c.c_int64, c.c_char_p,
                                        c.c_int]
        lib.fvw_instantiate.restype = c.c_void_p
        lib.fvw_destroy.argtypes = [c.c_void_p]
        lib.fvw_call.argtypes = [c.c_void_p, c.c_char_p,
                                 c.POINTER(c.c_double), c.c_int,
                                 c.POINTER(c.c_double), c.c_int64,
                                 c.c_char_p, c.c_int]
        lib.fvw_mem_size.argtypes = [c.c_void_p]
        lib.fvw_mem_size.restype = c.c_int64
        lib.fvw_mem_read.argtypes = [c.c_void_p, c.c_int64,
                                     c.POINTER(c.c_uint8), c.c_int64]
        lib.fvw_mem_write.argtypes = [c.c_void_p, c.c_int64, c.c_char_p,
                                      c.c_int64]
        _wasm_lib = lib
        return lib


class NativeWasmTrap(RuntimeError):
    pass


class NativeWasmInstance:
    """ctypes wrapper over the C++ interpreter, API-compatible with the
    Python one's (call / mem_write_f32 / mem_read_f32 / mem_read_i32) so
    differential tests drive both identically."""

    def __init__(self, data: bytes, fuel: int = -1):
        self._lib = load_wasm_library()
        err = ctypes.create_string_buffer(256)
        self._h = self._lib.fvw_instantiate(data, len(data), err, 256)
        if not self._h:
            raise NativeWasmTrap(err.value.decode() or "instantiate failed")
        self.fuel = fuel

    def call(self, name: str, *args):
        c_args = (ctypes.c_double * max(len(args), 1))(*[float(a) for a in args])
        res = ctypes.c_double()
        err = ctypes.create_string_buffer(256)
        rc = self._lib.fvw_call(self._h, name.encode(), c_args, len(args),
                                ctypes.byref(res), self.fuel, err, 256)
        if rc != 0:
            raise NativeWasmTrap(err.value.decode() or "trap")
        return res.value

    def mem_write(self, off: int, data: bytes) -> None:
        if self._lib.fvw_mem_write(self._h, off, data, len(data)) != 0:
            raise NativeWasmTrap("mem write oob")

    def mem_read(self, off: int, n: int) -> bytes:
        buf = (ctypes.c_uint8 * n)()
        if self._lib.fvw_mem_read(self._h, off, buf, n) != 0:
            raise NativeWasmTrap("mem read oob")
        return bytes(buf)

    def mem_write_f32(self, ptr: int, values) -> None:
        self.mem_write(ptr, np.asarray(values, np.float32).tobytes())

    def mem_read_f32(self, ptr: int, n: int):
        return np.frombuffer(self.mem_read(ptr, 4 * n), np.float32).tolist()

    def mem_read_i32(self, ptr: int, n: int):
        return np.frombuffer(self.mem_read(ptr, 4 * n), np.int32).tolist()

    def __del__(self):
        try:
            self._lib.fvw_destroy(self._h)
        except Exception:
            pass


def _take_buffer(lib, buf_p, length) -> bytes:
    data = ctypes.string_at(buf_p, length)
    lib.fvdb_free(buf_p)
    return data


class NativeByteCache:
    """Byte-bounded LRU cache backed by C++ (chunk_cache.rs equivalent)."""

    def __init__(self, max_bytes: int):
        self._lib = load_library()
        self._h = self._lib.fvdb_cache_new(max_bytes)

    def put(self, key: str, data: bytes) -> None:
        self._lib.fvdb_cache_put(self._h, key.encode(), data, len(data))

    def get(self, key: str) -> bytes | None:
        buf = ctypes.POINTER(ctypes.c_uint8)()
        length = ctypes.c_int64()
        rc = self._lib.fvdb_cache_get(
            self._h, key.encode(), ctypes.byref(buf), ctypes.byref(length)
        )
        if rc != 0:
            return None
        return _take_buffer(self._lib, buf, length.value)

    def remove(self, key: str) -> bool:
        return self._lib.fvdb_cache_remove(self._h, key.encode()) == 0

    def stats(self) -> dict:
        vals = [ctypes.c_int64() for _ in range(5)]
        self._lib.fvdb_cache_stats(self._h, *[ctypes.byref(v) for v in vals])
        hits, misses, evictions, total_bytes, entries = (v.value for v in vals)
        total = hits + misses
        return {
            "hits": hits, "misses": misses, "evictions": evictions,
            "bytes": total_bytes, "entries": entries,
            "hit_rate": hits / total if total else 0.0,
        }

    def __del__(self):
        try:
            self._lib.fvdb_cache_destroy(self._h)
        except Exception:
            pass


class NativeFileSystemObjectStore:
    """Drop-in ObjectStore with native atomic IO + threaded multi-get."""

    def __init__(self, root: str, n_threads: int = 8):
        from ..core.object_store import NotFoundError, StorageError

        self._NotFound = NotFoundError
        self._StorageError = StorageError
        self._lib = load_library()
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self.n_threads = n_threads

    def _path(self, key: str) -> str:
        path = os.path.abspath(os.path.join(self.root, key))
        if not path.startswith(self.root + os.sep) and path != self.root:
            raise self._StorageError(f"key escapes store root: {key}")
        return path

    def get(self, key: str) -> bytes:
        buf = ctypes.POINTER(ctypes.c_uint8)()
        length = ctypes.c_int64()
        rc = self._lib.fvdb_fs_get(
            self._path(key).encode(), ctypes.byref(buf), ctypes.byref(length)
        )
        if rc == 1:
            raise self._NotFound(key)
        if rc != 0:
            raise self._StorageError(f"native get failed for {key}")
        return _take_buffer(self._lib, buf, length.value)

    def get_many(self, keys: list) -> list:
        """Parallel fetch; returns list of bytes|None (missing)."""
        n = len(keys)
        if n == 0:
            return []
        joined = "\n".join(self._path(k) for k in keys).encode()
        bufs = (ctypes.POINTER(ctypes.c_uint8) * n)()
        lens = (ctypes.c_int64 * n)()
        status = (ctypes.c_int * n)()
        self._lib.fvdb_fs_get_many(joined, n, bufs, lens, status, self.n_threads)
        out = []
        for i in range(n):
            if status[i] == 0:
                out.append(_take_buffer(self._lib, bufs[i], lens[i]))
            else:
                out.append(None)
        return out

    def put(self, key: str, data: bytes) -> None:
        rc = self._lib.fvdb_fs_put(self._path(key).encode(), data, len(data))
        if rc != 0:
            raise self._StorageError(f"native put failed for {key}")

    def delete(self, key: str) -> None:
        self._lib.fvdb_fs_delete(self._path(key).encode())

    def exists(self, key: str) -> bool:
        return bool(self._lib.fvdb_fs_exists(self._path(key).encode()))

    def list_keys(self, prefix: str = "") -> list:
        out = []
        for dirpath, _, files in os.walk(self.root):
            for name in files:
                rel = os.path.relpath(os.path.join(dirpath, name), self.root)
                rel = rel.replace(os.sep, "/")
                if rel.startswith(prefix):
                    out.append(rel)
        return sorted(out)


class InMemoryIndex:
    """Brute-force cosine index (native), mirroring the reference WASM
    InMemoryIndex API (add_vector / search / update / delete, distance =
    1 - cosine)."""

    def __init__(self, dim: int):
        self._lib = load_library()
        self._h = self._lib.fvdb_index_new(dim)
        self.dim = dim
        self.metadata: dict = {}

    def __len__(self) -> int:
        return self._lib.fvdb_index_len(self._h)

    def add_vector(self, vid: str, vector, metadata=None) -> None:
        v = np.ascontiguousarray(vector, np.float32)
        if v.shape != (self.dim,):
            raise ValueError(f"expected dim {self.dim}, got {v.shape}")
        rc = self._lib.fvdb_index_add(
            self._h, vid.encode(),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), self.dim,
        )
        if rc == 1:
            raise ValueError(f"duplicate id {vid!r}")
        if rc != 0:
            raise ValueError("dimension mismatch")
        if metadata is not None:
            self.metadata[vid] = metadata

    def update_vector(self, vid: str, vector) -> None:
        v = np.ascontiguousarray(vector, np.float32)
        rc = self._lib.fvdb_index_update(
            self._h, vid.encode(),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), self.dim,
        )
        if rc == 1:
            raise KeyError(vid)
        if rc != 0:
            raise ValueError("dimension mismatch")

    def delete_vector(self, vid: str) -> None:
        if self._lib.fvdb_index_delete(self._h, vid.encode()) != 0:
            raise KeyError(vid)
        self.metadata.pop(vid, None)

    def get_vector(self, vid: str) -> np.ndarray:
        out = np.empty(self.dim, np.float32)
        rc = self._lib.fvdb_index_get(
            self._h, vid.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise KeyError(vid)
        return out

    def _row_id(self, row: int) -> str:
        buf = ctypes.create_string_buffer(512)
        self._lib.fvdb_index_id(self._h, row, buf, 512)
        return buf.value.decode()

    def search(self, query, k: int, search_filter=None) -> list:
        """Returns [(id, distance, metadata)] ascending by cosine distance."""
        q = np.ascontiguousarray(query, np.float32)
        rows = (ctypes.c_int * k)()
        dists = (ctypes.c_float * k)()
        got = self._lib.fvdb_index_search(
            self._h, q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.dim, k, None, rows, dists,
        )
        if got < 0:
            raise ValueError("dimension mismatch")
        out = []
        for i in range(got):
            vid = self._row_id(rows[i])
            meta = self.metadata.get(vid)
            if search_filter is not None and not search_filter.matches(meta):
                continue
            out.append((vid, float(dists[i]), meta))
        return out

    def search_with_filter(self, query, k: int, search_filter) -> list:
        # oversample then post-filter (reference WASM behavior)
        results = self.search(query, max(k * 3, k), search_filter)
        return results[:k]

    def __del__(self):
        try:
            self._lib.fvdb_index_destroy(self._h)
        except Exception:
            pass


class SearchFilter:
    """Imperative scalar filter (reference: bindings/wasm index.rs:259-331):
    string equality + numeric eq/ne/gt/gte/lt/lte, AND of all conditions."""

    def __init__(self):
        self._conds: list = []

    def add_string_equals(self, field: str, value: str) -> "SearchFilter":
        self._conds.append(("seq", field, value))
        return self

    def add_numeric(self, field: str, op: str, value: float) -> "SearchFilter":
        if op not in ("eq", "ne", "gt", "gte", "lt", "lte"):
            raise ValueError(f"unknown op {op!r}")
        self._conds.append(("num", field, op, value))
        return self

    def matches(self, metadata) -> bool:
        if metadata is None:
            return not self._conds
        for cond in self._conds:
            if cond[0] == "seq":
                _, field, value = cond
                if metadata.get(field) != value:
                    return False
            else:
                _, field, op, value = cond
                v = metadata.get(field)
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    return False
                v = float(v)
                ok = {
                    "eq": v == value, "ne": v != value, "gt": v > value,
                    "gte": v >= value, "lt": v < value, "lte": v <= value,
                }[op]
                if not ok:
                    return False
        return True
