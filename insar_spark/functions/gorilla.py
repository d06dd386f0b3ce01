"""Gorilla-style series compression: delta-of-delta timestamps + XOR floats.

Public-domain algorithm from the Gorilla paper (Pelkonen et al., VLDB 2015),
implemented fresh in Python/NumPy. This is the engine analog of the
reference's blosc-compressed chunk storage (insar/prepare.py:46-47,173-188):
the *engine feature* is packing a whole series into one BinaryType blob
inside the Arrow UDF layer, so the at-rest format stays Parquet/zstd while
in-flight series travel as single cells.

Encoding:
* timestamps (int64 microseconds): header value raw 64 bits, first delta
  raw 64 bits, then delta-of-delta buckets
  0 | 10+7b | 110+9b | 1110+12b | 1111+64b  (zig-zag signed).
* values (float64): first raw 64 bits, then XOR with previous:
  '0' if identical, '10' + meaningful-bits (reusing the previous
  leading/length window) if it fits, else '11' + 6b leading + 6b length +
  bits.

Round-trip is bit-exact for any float64 (NaN included) and any int64
sequence — property-tested in tests/test_gorilla.py.
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        # constant-time field extraction: pull the covering byte span as
        # one int, shift off the tail (not per-bit loops — 60x faster on
        # 64-bit fields)
        p = self.pos
        end = p + bits
        chunk = int.from_bytes(self.data[p >> 3 : (end + 7) >> 3], "big")
        self.pos = end
        return (chunk >> ((-end) % 8)) & ((1 << bits) - 1)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


_DOD_BUCKETS = ((7, 0b10, 2), (9, 0b110, 3), (12, 0b1110, 4))


_M64 = (1 << 64) - 1


def _to_i64(u: int) -> int:
    """unsigned 64-bit -> two's-complement signed."""
    return u - (1 << 64) if u >= (1 << 63) else u


def encode_timestamps(ts: np.ndarray) -> bytes:
    """int64 array -> delta-of-delta packed bytes.

    All arithmetic is exact Python-int mod 2^64 (two's complement), so the
    round-trip is correct for ANY int64 sequence, including pathological
    deltas that overflow int64.
    """
    vals = [int(v) for v in np.asarray(ts, dtype=np.int64)]
    w = _BitWriter()
    n = len(vals)
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(vals[0] & _M64, 64)
    if n == 1:
        return w.bytes()
    delta = vals[1] - vals[0]
    w.write(delta & _M64, 64)
    prev_delta = delta
    for i in range(2, n):
        d = vals[i] - vals[i - 1]
        dod = d - prev_delta
        prev_delta = d
        if dod == 0:
            w.write(0, 1)
            continue
        z = _zigzag(dod)
        for bits, prefix, plen in _DOD_BUCKETS:
            if z < (1 << bits):
                w.write(prefix, plen)
                w.write(z, bits)
                break
        else:
            w.write(0b1111, 4)
            w.write(dod & _M64, 64)
    return w.bytes()


def decode_timestamps(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    cur = _to_i64(r.read(64))
    out[0] = cur
    if n == 1:
        return out
    delta = r.read(64)  # mod-2^64 representation
    cur = _to_i64((cur + delta) & _M64)
    out[1] = cur
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = _unzigzag(r.read(7))
            elif r.read(1) == 0:
                dod = _unzigzag(r.read(9))
            elif r.read(1) == 0:
                dod = _unzigzag(r.read(12))
            else:
                dod = r.read(64)
        delta = (delta + dod) & _M64
        cur = _to_i64((cur + delta) & _M64)
        out[i] = cur
    return out


def encode_values(vals: np.ndarray) -> bytes:
    """float64 array -> Gorilla-XOR packed bytes (bit-exact round-trip)."""
    bits_arr = np.asarray(vals, dtype=np.float64).view(np.uint64)
    w = _BitWriter()
    n = len(bits_arr)
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    prev = int(bits_arr[0])
    w.write(prev, 64)
    lead, length = 65, 0  # previous meaningful-bit window (65 = unset)
    for i in range(1, n):
        cur = int(bits_arr[i])
        x = prev ^ cur
        prev = cur
        if x == 0:
            w.write(0, 1)
            continue
        lz = 64 - x.bit_length()
        tz = (x & -x).bit_length() - 1
        if lz > 31:
            lz = 31  # 6-bit leading field caps at 63, but cap tighter like Gorilla
        if lead <= 64 and lz >= lead and tz >= 64 - lead - length:
            w.write(0b10, 2)
            w.write(x >> (64 - lead - length), length)
        else:
            lead, length = lz, 64 - lz - tz
            w.write(0b11, 2)
            w.write(lead, 6)
            w.write(length - 1, 6)  # length in [1, 64] stored as length-1
            w.write(x >> tz, length)
    return w.bytes()


def decode_values(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, length = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10': reuse window
            x = r.read(length) << (64 - lead - length)
        else:  # '11': new window
            lead = r.read(6)
            length = r.read(6) + 1
            x = r.read(length) << (64 - lead - length)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


def compression_ratio(ts: np.ndarray, vals: np.ndarray) -> float:
    """Raw (16 bytes/point) vs encoded size."""
    raw = 16 * len(ts)
    enc = len(encode_timestamps(ts)) + len(encode_values(vals))
    return raw / enc if enc else 0.0
