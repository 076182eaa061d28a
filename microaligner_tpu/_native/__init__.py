"""Native (C++) codec kernels with Python fallbacks.

``build.sh`` compiles ``tiffcodec.cpp`` into ``libtiffcodec.so`` next to this
file; at import we try to build it on first use (g++ is available in the
target environment) and fall back to numpy/Python implementations otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SO = _HERE / "libtiffcodec.so"


def _try_build() -> bool:
    src = _HERE / "tiffcodec.cpp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    if not _SO.exists() and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.lzw_decode.restype = ctypes.c_long
    lib.lzw_decode.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long]
    lib.packbits_decode.restype = ctypes.c_long
    lib.packbits_decode.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long]
    for fn in (lib.undo_hpredict_u8, lib.undo_hpredict_u16, lib.undo_hpredict_u32):
        fn.restype = None
        fn.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_long]
    return lib


_LIB = _load()


def _load_zstd():
    """System libzstd via ctypes (CPython <3.14 has no stdlib zstd)."""
    for name in ("libzstd.so.1", "libzstd.so"):
        try:
            z = ctypes.CDLL(name)
            break
        except OSError:
            z = None
    if z is None:
        return None
    try:
        z.ZSTD_decompress.restype = ctypes.c_size_t
        z.ZSTD_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ]
        z.ZSTD_compress.restype = ctypes.c_size_t
        z.ZSTD_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_int,
        ]
        z.ZSTD_compressBound.restype = ctypes.c_size_t
        z.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        z.ZSTD_isError.restype = ctypes.c_uint
        z.ZSTD_isError.argtypes = [ctypes.c_size_t]
    except AttributeError:
        return None
    return z


_ZSTD = _load_zstd()


class codec:
    """Static namespace: decode kernels (native when available)."""

    native = _LIB is not None

    @staticmethod
    def lzw_decode(data: bytes, expected: int) -> bytes:
        if _LIB is not None:
            out = ctypes.create_string_buffer(expected)
            n = _LIB.lzw_decode(data, len(data), out, expected)
            if n < 0:
                raise ValueError("malformed LZW stream")
            return out.raw[:n]
        return _py_lzw_decode(data, expected)

    @staticmethod
    def packbits_decode(data: bytes, expected: int) -> bytes:
        if _LIB is not None:
            out = ctypes.create_string_buffer(expected)
            n = _LIB.packbits_decode(data, len(data), out, expected)
            return out.raw[:n]
        return _py_packbits_decode(data, expected)

    zstd_available = _ZSTD is not None

    @staticmethod
    def zstd_decode(data: bytes, expected: int) -> bytes:
        """Decompress one zstd-compressed TIFF strip/tile (COMPRESSION 50000,
        as written by tifffile/imagecodecs — shared_modules/utils.py:69-72
        reads such inputs through tifffile)."""
        if _ZSTD is None:
            raise ValueError(
                "zstd-compressed TIFF but libzstd is not available on this system"
            )
        out = ctypes.create_string_buffer(expected)
        n = _ZSTD.ZSTD_decompress(out, expected, data, len(data))
        if _ZSTD.ZSTD_isError(n):
            raise ValueError("malformed zstd stream in TIFF block")
        return out.raw[:n]

    @staticmethod
    def zstd_encode(data: bytes, level: int = 3) -> bytes:
        """Compress (used by tests to build zstd fixtures without tifffile)."""
        if _ZSTD is None:
            raise ValueError("libzstd is not available on this system")
        cap = _ZSTD.ZSTD_compressBound(len(data))
        out = ctypes.create_string_buffer(cap)
        n = _ZSTD.ZSTD_compress(out, cap, data, len(data), level)
        if _ZSTD.ZSTD_isError(n):
            raise ValueError("zstd compression failed")
        return out.raw[:n]

    @staticmethod
    def undo_horizontal_predictor(arr: np.ndarray) -> np.ndarray:
        """Cumulative sum along the row axis (per sample plane)."""
        a = np.ascontiguousarray(arr)
        if not a.flags.writeable:
            a = a.copy()
        rows = a.shape[0]
        stride = int(np.prod(a.shape[1:]))
        if _LIB is not None and a.dtype.itemsize in (1, 2, 4) and a.dtype.kind in "ui":
            fn = {1: _LIB.undo_hpredict_u8, 2: _LIB.undo_hpredict_u16, 4: _LIB.undo_hpredict_u32}[
                a.dtype.itemsize
            ]
            fn(a.ctypes.data, rows, stride)
            return a
        # numpy fallback: wrap-around cumsum in the unsigned domain
        return np.cumsum(a.reshape(rows, stride), axis=1, dtype=a.dtype).reshape(a.shape)


def _py_lzw_decode(data: bytes, expected: int) -> bytes:
    """Pure-Python TIFF LZW (MSB-first, early change)."""
    CLEAR, EOI, FIRST = 256, 257, 258
    out = bytearray()
    table: list[bytes] = []
    code_bits = 9
    bitpos = 0
    nbits = len(data) * 8
    prev: bytes | None = None

    def reset():
        nonlocal table, code_bits
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        code_bits = 9

    reset()
    while bitpos + code_bits <= nbits and len(out) < expected:
        byte = bitpos >> 3
        chunk = int.from_bytes(data[byte : byte + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - code_bits - (bitpos & 7))) & ((1 << code_bits) - 1)
        bitpos += code_bits
        if code == EOI:
            break
        if code == CLEAR:
            reset()
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("malformed LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << code_bits) - 1 and code_bits < 12:
            code_bits += 1
    return bytes(out[:expected])


def _py_packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i : i + b + 1]
            i += b + 1
        elif b != 128:
            out += data[i : i + 1] * (257 - b)
            i += 1
    return bytes(out[:expected])
