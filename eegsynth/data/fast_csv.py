"""ctypes bindings for the native CSV column parser (native/csv_loader.cpp).

Builds the shared library on first use (g++, cached beside the source) and
falls back to pandas transparently if the toolchain or binary is unavailable.
Semantics match ``pd.read_csv`` + ``to_numeric(errors="coerce")``: selected
columns as float64, malformed/empty fields → NaN.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libeegsynth_csv.so"
_lib = None
_lib_failed = False


def _load_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.csv_open.restype = ctypes.c_void_p
        lib.csv_open.argtypes = [ctypes.c_char_p]
        lib.csv_num_rows.restype = ctypes.c_int64
        lib.csv_num_rows.argtypes = [ctypes.c_void_p]
        lib.csv_num_cols.restype = ctypes.c_int32
        lib.csv_num_cols.argtypes = [ctypes.c_void_p]
        lib.csv_header.restype = ctypes.c_int64
        lib.csv_header.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
        lib.csv_read_columns.restype = ctypes.c_int64
        lib.csv_read_columns.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double)]
        lib.csv_close.restype = None
        lib.csv_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def _clean_header(fields: list[str]) -> list[str]:
    """pandas-parity header normalization: strip a UTF-8 BOM off the first
    name and unquote names that are fully quoted (quote at field start, like
    the csv standard — pandas keeps ` "x"` with a leading space verbatim).
    Commas INSIDE quoted names are not supported — they would shift the
    native parser's comma-indexed columns; Emotiv exports never quote commas."""
    out = []
    for i, name in enumerate(fields):
        if i == 0:
            name = name.lstrip("\ufeff")
        if len(name) >= 2 and name[0] == '"' and name[-1] == '"':
            name = name[1:-1]
        out.append(name)
    return out


def read_header(path) -> list[str]:
    """Column names via the native scanner (fallback: first line split)."""
    lib = _load_lib()
    if lib is None:
        with open(path, "r", encoding="utf-8", errors="replace") as f:
            return _clean_header(f.readline().rstrip("\r\n").split(","))
    h = lib.csv_open(str(path).encode())
    if not h:
        raise OSError(f"csv_open failed: {path}")
    try:
        n = lib.csv_header(h, None, 0)
        buf = ctypes.create_string_buffer(int(n) + 1)
        lib.csv_header(h, buf, n + 1)
        return _clean_header(buf.value.decode("utf-8", errors="replace").split(","))
    finally:
        lib.csv_close(h)


def read_columns(path, column_names: list[str]) -> np.ndarray:
    """Selected columns of a CSV as an (n_rows, n_cols) float64 array.

    Native fast path (mmap + from_chars); pandas fallback with identical
    coerce-to-NaN semantics.
    """
    lib = _load_lib()
    if lib is None:
        import pandas as pd
        df = pd.read_csv(path, engine="python")
        return df[column_names].apply(pd.to_numeric, errors="coerce").values.astype(np.float64)

    h = lib.csv_open(str(path).encode())
    if not h:
        raise OSError(f"csv_open failed: {path}")
    try:
        n_hdr = lib.csv_header(h, None, 0)
        buf = ctypes.create_string_buffer(int(n_hdr) + 1)
        lib.csv_header(h, buf, n_hdr + 1)
        header = _clean_header(buf.value.decode("utf-8", errors="replace").split(","))
        idx_map = {name: i for i, name in enumerate(header)}
        try:
            sel = np.array([idx_map[c] for c in column_names], dtype=np.int32)
        except KeyError as e:
            raise KeyError(f"column {e} not found in {path}") from e
        n_rows = int(lib.csv_num_rows(h))
        out = np.empty((n_rows, len(column_names)), dtype=np.float64)
        got = lib.csv_read_columns(
            h, sel.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(sel),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if got < 0:
            raise OSError(f"csv_read_columns failed: {path}")
        return out[:got]
    finally:
        lib.csv_close(h)
