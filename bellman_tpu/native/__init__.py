"""Native (C++) host components: the BLS12-381 pairing.

The reference delegates its pairing to the external `bls12_381` crate
(SURVEY.md §2.3). Here the verifier's pairing is a C++ shared library
(native/bls12_381_pairing.cpp), compiled on demand with g++ and loaded
via ctypes; `available()` gates it so pure-Python environments fall back
to the bellman_tpu.algebra.bls12_381 oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LIB = None
_LOCK = threading.Lock()
_SRC = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "bls12_381_pairing.cpp"
)
_SO = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "libbls12_381_pairing.so"
)


def _src_digest(src: str) -> str:
    import hashlib

    with open(src, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def _build() -> bool:
    """Build the .so from source if needed.

    The artifact is never committed (gitignored); staleness is decided by
    a sha256 stamp of the source next to the .so, so a tampered or stale
    binary can't be loaded in place of the reviewed source."""
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    stamp = so + ".sha256"
    if not os.path.exists(src):
        return False
    digest = _src_digest(src)
    if os.path.exists(so) and os.path.exists(stamp):
        try:
            with open(stamp) as fh:
                if fh.read().strip() == digest:
                    return True
        except OSError:
            pass
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
            check=True,
            capture_output=True,
            timeout=240,
        )
        with open(stamp, "w") as fh:
            fh.write(digest + "\n")
        return True
    except Exception:  # noqa: BLE001 - fall back to Python
        return False


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if os.environ.get("BELLMAN_TPU_NO_NATIVE"):
            _LIB = False
            return _LIB
        if not _build():
            _LIB = False
            return _LIB
        try:
            lib = ctypes.CDLL(os.path.abspath(_SO))
            lib.bls_multi_miller_loop.argtypes = [
                ctypes.c_size_t,
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.c_char_p,
            ]
            lib.bls_final_exp.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.bls_pairing.argtypes = [
                ctypes.c_char_p,
                ctypes.c_char_p,
                ctypes.c_char_p,
            ]
            _LIB = lib
        except Exception:  # noqa: BLE001
            _LIB = False
        return _LIB


def available() -> bool:
    return bool(_load())


# -- marshalling --------------------------------------------------------------


def _fq_bytes(v: int) -> bytes:
    return int(v).to_bytes(48, "little")


def _g1_bytes(p) -> bytes:
    if p.is_identity():
        return bytes(97)[:96] + b"\x01"
    return _fq_bytes(int(p.x)) + _fq_bytes(int(p.y)) + b"\x00"


def _g2_bytes(q) -> bytes:
    if q.is_identity():
        return bytes(193)[:192] + b"\x01"
    return (
        _fq_bytes(int(q.x.c0))
        + _fq_bytes(int(q.x.c1))
        + _fq_bytes(int(q.y.c0))
        + _fq_bytes(int(q.y.c1))
        + b"\x00"
    )


def _fq12_from_bytes(data: bytes):
    from ..algebra import bls12_381 as bls

    coeffs = []
    for i in range(6):
        c0 = int.from_bytes(data[i * 96 : i * 96 + 48], "little")
        c1 = int.from_bytes(data[i * 96 + 48 : i * 96 + 96], "little")
        coeffs.append(bls.Fq2(c0, c1))
    return bls.Fq12(coeffs)


def _fq12_to_bytes(f) -> bytes:
    out = bytearray()
    for c in f.c:
        out += _fq_bytes(int(c.c0))
        out += _fq_bytes(int(c.c1))
    return bytes(out)


# -- public API ----------------------------------------------------------------


def multi_miller_loop(pairs):
    """Native multi-Miller-loop; returns a host Fq12 (pre-final-exp).

    ABI contract: the C library performs NO on-curve/subgroup validation
    (off-curve or out-of-subgroup inputs yield a silently wrong value via
    the inv(0)=0 convention in the line functions) — callers must pass
    validated points. All proof/key deserializers in this package
    validate on read (``checked=True`` default), which is the only route
    untrusted points enter."""
    lib = _load()
    assert lib, "native pairing unavailable"
    g1s = b"".join(_g1_bytes(p) for p, _ in pairs)
    g2s = b"".join(_g2_bytes(q) for _, q in pairs)
    out = ctypes.create_string_buffer(576)
    lib.bls_multi_miller_loop(len(pairs), g1s, g2s, out)
    return _fq12_from_bytes(out.raw)


def final_exponentiation(f):
    lib = _load()
    assert lib, "native pairing unavailable"
    out = ctypes.create_string_buffer(576)
    lib.bls_final_exp(_fq12_to_bytes(f), out)
    return _fq12_from_bytes(out.raw)


def pairing(p, q):
    lib = _load()
    assert lib, "native pairing unavailable"
    out = ctypes.create_string_buffer(576)
    lib.bls_pairing(_g1_bytes(p), _g2_bytes(q), out)
    return _fq12_from_bytes(out.raw)
