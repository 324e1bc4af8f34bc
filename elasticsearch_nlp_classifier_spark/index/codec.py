"""Vectorized variable-byte codec (numpy; no per-value Python loops).

Classic VByte: 7 data bits per byte, high bit = continuation
(little-endian groups).  Posting lists store docID *deltas* (first value
absolute), so gap magnitudes stay small and dense docIDs compress to
~1 byte/posting — the same layout family Lucene uses for its postings
(public knowledge; the reference's observable surface of that layout is
`_mtermvectors` term statistics only).

Encode: per-value byte counts via searchsorted on power-of-2^7 bounds,
then ≤10 vectorized rounds writing the r-th byte of every value that has
one.  Decode: terminator bytes located with a bitmask, then ≤10 rounds
OR-ing 7-bit groups.  Streams are self-delimiting → concatenating block
payloads and decoding once is valid (the WAND path exploits this).
"""

from __future__ import annotations

import numpy as np

_BOUNDS = np.array([1 << (7 * i) for i in range(1, 10)], dtype=np.uint64)


def vb_encode(values) -> bytes:
    """uint64 array -> varbyte stream."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    nb = (np.searchsorted(_BOUNDS, a, side="right") + 1).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    buf = np.zeros(int(nb.sum()), dtype=np.uint8)
    max_nb = int(nb.max())
    for r in range(max_nb):
        m = nb > r
        byte = ((a[m] >> np.uint64(7 * r)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[m] - 1 > r).astype(np.uint8) << 7
        buf[starts[m] + r] = byte | cont
    return buf.tobytes()


def vb_encode_segmented(values, seg_starts) -> tuple[bytes, np.ndarray]:
    """Encode a whole column once; return (buffer, byte_offsets) where
    ``byte_offsets[i]:byte_offsets[i+1]`` is segment i's slice (segments
    given by their value start indices).  One vectorized pass instead of
    one ``vb_encode`` call per posting block."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    if a.size == 0:
        return b"", np.zeros(len(seg_starts) + 1, dtype=np.int64)
    nb = (np.searchsorted(_BOUNDS, a, side="right") + 1).astype(np.int64)
    byte_pos = np.concatenate(([0], np.cumsum(nb)))
    buf = np.zeros(int(byte_pos[-1]), dtype=np.uint8)
    starts = byte_pos[:-1]
    for r in range(int(nb.max())):
        m = nb > r
        byte = ((a[m] >> np.uint64(7 * r)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[m] - 1 > r).astype(np.uint8) << 7
        buf[starts[m] + r] = byte | cont
    offsets = np.concatenate((byte_pos[seg_starts], [byte_pos[-1]]))
    return buf.tobytes(), offsets


def vb_decode(stream: bytes | np.ndarray) -> np.ndarray:
    """varbyte stream -> uint64 array."""
    b = np.frombuffer(stream, dtype=np.uint8) if isinstance(
        stream, (bytes, bytearray, memoryview)
    ) else np.asarray(stream, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    if not (b & 0x80).any():
        # fast path: every value fits 7 bits (typical for tf payloads
        # and short-doc dl payloads) — the stream IS the values
        return b.astype(np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    out = np.zeros(len(ends), dtype=np.uint64)
    lens = ends - starts + 1
    for r in range(int(lens.max())):
        m = lens > r
        out[m] |= (b[starts[m] + r].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * r)
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int array -> gaps (first value absolute)."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    out = np.empty_like(a)
    if a.size:
        out[0] = a[0]
        np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.int64))


def segmented_delta_decode(
    gaps: np.ndarray, seg_lengths: np.ndarray
) -> np.ndarray:
    """Decode a concatenation of independently delta-encoded segments in
    one vectorized pass (each segment's first gap is absolute)."""
    gaps = np.asarray(gaps, dtype=np.int64)
    seg_lengths = np.asarray(seg_lengths, dtype=np.int64)
    acc = np.cumsum(gaps)
    starts = np.concatenate(([0], np.cumsum(seg_lengths)[:-1]))
    bases = np.where(starts > 0, acc[starts - 1], 0)
    return acc - np.repeat(bases, seg_lengths)
