"""ctypes bindings for the C++ data-path core (`dna_tpu/cpp/dnaio.cpp`).

Builds the shared library on first use (g++, cached next to the source);
every entry point has a pure-numpy fallback so the framework works without a
compiler. `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "cpp")
_SRC = os.path.join(_CPP_DIR, "dnaio.cpp")
_LIB = os.path.join(_CPP_DIR, "libdnaio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return _LIB
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.dnaio_encode_2bit.restype = ctypes.c_int
        lib.dnaio_encode_2bit.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int)]
        lib.dnaio_decode_2bit.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_char_p]
        lib.dnaio_char_tokenize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
        lib.dnaio_char_tokenize_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        lib.dnaio_reverse_complement.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def encode_2bit(seq: str) -> Tuple[bytes, int]:
    """Returns (packed, pad_bits); native or numpy fallback."""
    lib = _load()
    if lib is not None:
        buf = (ctypes.c_uint8 * ((len(seq) * 2 + 7) // 8))()
        pad = ctypes.c_int()
        n = lib.dnaio_encode_2bit(seq.encode("ascii"), len(seq), buf,
                                  ctypes.byref(pad))
        return bytes(buf[:n]), pad.value
    from dna_tpu.data.twobit import encode_row

    packed, _, pad = encode_row(seq)
    return packed, pad


def decode_2bit(data: bytes, nbases: int) -> str:
    lib = _load()
    if lib is not None:
        out = ctypes.create_string_buffer(nbases)
        lib.dnaio_decode_2bit(
            (ctypes.c_uint8 * len(data)).from_buffer_copy(data), nbases, out)
        return out.raw.decode("ascii")
    from dna_tpu.data.twobit import decode_row

    pad = len(data) * 8 - nbases * 2
    return decode_row(data, pad)


def char_tokenize(seq: str) -> np.ndarray:
    lib = _load()
    if lib is not None:
        out = np.empty(len(seq), dtype=np.int32)
        lib.dnaio_char_tokenize(
            seq.encode("ascii"), len(seq),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    from dna_tpu.data.tokenizers import CharTokenizer

    return CharTokenizer().encode(seq)


def char_tokenize_batch(seqs: List[str], max_len: int, *, pad_id: int = 4,
                        pad_left: bool = True) -> np.ndarray:
    """Batched tokenize+pad; one C call for the whole batch."""
    lib = _load()
    if lib is None:
        from dna_tpu.data.tokenizers import CharTokenizer

        tok = CharTokenizer(padding_side="left" if pad_left else "right")
        return np.stack([tok.pad(tok.encode(s), max_len) for s in seqs])
    concat = "".join(seqs).encode("ascii")
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    out = np.empty((len(seqs), max_len), dtype=np.int32)
    lib.dnaio_char_tokenize_batch(
        concat, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(seqs), max_len, pad_id, int(pad_left),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def reverse_complement(seq: str) -> str:
    lib = _load()
    if lib is not None:
        out = ctypes.create_string_buffer(len(seq))
        lib.dnaio_reverse_complement(seq.encode("ascii"), len(seq), out)
        return out.raw.decode("ascii")
    from dna_tpu.data.fasta import reverse_complement as py_rc

    return py_rc(seq)
