"""PForDelta block codec for posting lists, in vectorized numpy.

Mirrors the *format semantics* of the reference's
``core/codecs/lucene90/PForUtil.java`` (encode:61-117, decode:120-133) and
``ForUtil.java`` (BLOCK_SIZE=128 at :32): values are FOR-bit-packed at the
bit-width of the (128 - 7)-th largest value, with up to MAX_EXCEPTIONS=7
patch exceptions stored as (position, high-bits) byte pairs; an all-equal
block (bpv==0 after patching) is stored as a single varint run-length.

Byte layout here is our own (numpy bitpacking over a little-endian byte
buffer), since rank/score parity depends on the decoded integers, not the
bytes — tests require a lossless round-trip (TestPForUtil ported in
``tests/test_pfor.py``). Exceptions' high bits must fit one byte, so like the
reference we clamp bpv >= bits_required(max) - 8.

Streams of blocks: `encode_stream`/`decode_stream` handle arbitrary-length
int arrays as full 128-blocks plus a varint tail (Lucene writes tails as
VInts too, Lucene90PostingsWriter.java:353-379).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
MAX_EXCEPTIONS = 7

__all__ = [
    "BLOCK_SIZE",
    "MAX_EXCEPTIONS",
    "encode_stream",
    "decode_stream",
    "encode_vlongs_np",
    "decode_vlongs_np",
    "batch_encode_streams",
]


def encode_vlongs_np(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized LEB128 varint encode of a uint64 array.

    Returns (bytes_array uint8, nbytes_per_value int64). No Python loop over
    values — 10 vectorized passes (one per possible byte position).
    """
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    nb = np.ones(n, dtype=np.int64)
    for j in range(1, 10):
        nb[vals >= (np.uint64(1) << np.uint64(7 * j))] = j + 1
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for j in range(10):
        mask = nb > j
        if not mask.any():
            break
        idx = starts[mask] + j
        byte = ((vals[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = ((nb[mask] > j + 1).astype(np.uint8)) << 7
        out[idx] = byte | cont
    return out, nb


def decode_vlongs_np(buf: np.ndarray, count: int) -> tuple[np.ndarray, int]:
    """Vectorized LEB128 decode of the first `count` varints in `buf`.

    Returns (values uint64, bytes_consumed).
    """
    if count == 0:
        return np.empty(0, dtype=np.uint64), 0
    buf = np.asarray(buf, dtype=np.uint8)
    is_last = (buf & 0x80) == 0
    # value index of each byte: 0-based running count of completed varints
    ends = np.cumsum(is_last)
    # bytes consumed: position of the count-th terminator + 1
    last_pos = int(np.searchsorted(ends, count)) + 1
    buf = buf[:last_pos]
    is_last = is_last[:last_pos]
    value_id = np.concatenate(([0], np.cumsum(is_last)[:-1]))
    starts = np.concatenate(([0], np.nonzero(is_last)[0][:-1] + 1))
    pos_in_value = np.arange(last_pos, dtype=np.int64) - starts[value_id]
    out = np.zeros(count, dtype=np.uint64)
    contrib = (buf & 0x7F).astype(np.uint64) << (np.uint64(7) * pos_in_value.astype(np.uint64))
    np.add.at(out, value_id, contrib)
    return out, last_pos


def _write_vlong(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _read_vlong(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if b < 0x80:
            return result, pos
        shift += 7


def _bits_required(v: int) -> int:
    return max(int(v).bit_length(), 0)


def _pack_bits(values: np.ndarray, bpv: int) -> bytes:
    """Bit-pack uint64 values at bpv bits each, little-endian bit order."""
    n = len(values)
    total_bits = n * bpv
    nbytes = (total_bits + 7) // 8
    # expand each value into its bits, then packbits
    bits = np.zeros(nbytes * 8, dtype=np.uint8)
    v = values.astype(np.uint64)
    positions = np.arange(n, dtype=np.int64) * bpv
    for bit in range(bpv):
        bits[positions + bit] = (v >> np.uint64(bit)) & np.uint64(1)
    return np.packbits(bits, bitorder="little").tobytes()


def _unpack_bits(buf: memoryview, pos: int, n: int, bpv: int) -> tuple[np.ndarray, int]:
    total_bits = n * bpv
    nbytes = (total_bits + 7) // 8
    raw = np.frombuffer(buf[pos : pos + nbytes], dtype=np.uint8)
    bits = np.unpackbits(raw, bitorder="little")
    out = np.zeros(n, dtype=np.uint64)
    positions = np.arange(n, dtype=np.int64) * bpv
    for bit in range(bpv):
        out |= bits[positions + bit].astype(np.uint64) << np.uint64(bit)
    return out, pos + nbytes


def _encode_block(longs: np.ndarray, out: bytearray) -> None:
    """Encode exactly BLOCK_SIZE non-negative ints (PFOR with <=7 patches)."""
    vals = longs.astype(np.uint64).copy()
    # top (MAX_EXCEPTIONS+1) values; topValue = smallest of those
    order = np.argsort(vals, kind="stable")
    top_idx = order[-(MAX_EXCEPTIONS + 1) :]
    top_vals = vals[top_idx]
    top_value = int(top_vals.min())
    max_val = int(top_vals.max())

    max_bits_required = _bits_required(max_val)
    patched_bpv = max(_bits_required(top_value), max_bits_required - 8)
    max_unpatched = (1 << patched_bpv) - 1

    exc_pos = np.nonzero(vals > max_unpatched)[0]
    assert len(exc_pos) <= MAX_EXCEPTIONS
    exc_high = (vals[exc_pos] >> np.uint64(patched_bpv)).astype(np.uint64)
    assert (exc_high <= 0xFF).all()
    vals[exc_pos] &= np.uint64(max_unpatched)

    num_exceptions = len(exc_pos)
    if patched_bpv >= 31:
        # escape: values too wide for the 5-bit bpv token (e.g. >2^31 gid
        # gaps) — store the raw 128 values as vlongs. Token bpv=31 is
        # reserved for this (a real 31-bpv packed block would be bigger
        # than vlongs anyway). Lucene never hits this (int docIDs); our
        # global gids are int64.
        out.append(31)
        for v in longs.astype(np.uint64):
            _write_vlong(out, int(v))
        return

    all_equal = bool((vals == vals[0]).all())
    if all_equal and max_bits_required <= 8:
        # run-length special case: token bpv=0, value as vlong,
        # exception high-bits pre-shifted (PForUtil.java:104-110)
        out.append((num_exceptions << 5) & 0xFF)
        _write_vlong(out, int(vals[0]))
        shifted_high = (exc_high << np.uint64(patched_bpv)) & np.uint64(0xFF)
        for p, h in zip(exc_pos, shifted_high):
            out.append(int(p))
            out.append(int(h))
    else:
        out.append(((num_exceptions << 5) | patched_bpv) & 0xFF)
        out.extend(_pack_bits(vals, patched_bpv))
        for p, h in zip(exc_pos, exc_high):
            out.append(int(p))
            out.append(int(h))


def _decode_block(buf: memoryview, pos: int) -> tuple[np.ndarray, int]:
    token = buf[pos]
    pos += 1
    bpv = token & 0x1F
    num_exceptions = token >> 5
    if bpv == 31:
        out = np.empty(BLOCK_SIZE, dtype=np.uint64)
        for i in range(BLOCK_SIZE):
            v, pos = _read_vlong(buf, pos)
            out[i] = v
        return out, pos
    if bpv == 0:
        v, pos = _read_vlong(buf, pos)
        out = np.full(BLOCK_SIZE, v, dtype=np.uint64)
    else:
        out, pos = _unpack_bits(buf, pos, BLOCK_SIZE, bpv)
    for _ in range(num_exceptions):
        p = buf[pos]
        h = buf[pos + 1]
        pos += 2
        out[p] |= np.uint64(h) << np.uint64(bpv)
    return out, pos


def encode_stream(values: np.ndarray) -> bytes:
    """Encode an arbitrary-length array of non-negative ints.

    Layout: vlong count, then full 128-blocks (PFOR), then tail values as
    vlongs. Lossless: decode_stream(encode_stream(x)) == x.
    """
    values = np.asarray(values, dtype=np.uint64)
    out = bytearray()
    n = len(values)
    _write_vlong(out, n)
    nblocks = n // BLOCK_SIZE
    for i in range(nblocks):
        _encode_block(values[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE], out)
    tail = values[nblocks * BLOCK_SIZE :]
    if len(tail):
        tail_bytes, _ = encode_vlongs_np(tail)
        out.extend(tail_bytes.tobytes())
    return bytes(out)


def decode_stream(data: bytes) -> np.ndarray:
    buf = memoryview(data)
    n, pos = _read_vlong(buf, 0)
    out = np.empty(n, dtype=np.uint64)
    nblocks = n // BLOCK_SIZE
    for i in range(nblocks):
        block, pos = _decode_block(buf, pos)
        out[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE] = block
    n_tail = n - nblocks * BLOCK_SIZE
    if n_tail:
        tail, _ = decode_vlongs_np(np.frombuffer(buf[pos:], dtype=np.uint8), n_tail)
        out[nblocks * BLOCK_SIZE :] = tail
    return out


def batch_encode_streams(values: np.ndarray, row_lengths: np.ndarray) -> list[bytes]:
    """Encode many streams at once; `values` is the concatenation of all
    rows' values, `row_lengths` their lengths.

    Rows shorter than BLOCK_SIZE (the vast majority of posting lists) are
    varint-encoded in ONE vectorized pass over all rows; longer rows fall
    back to per-row `encode_stream` (full PFOR blocks + tail).
    """
    values = np.asarray(values, dtype=np.uint64)
    row_lengths = np.asarray(row_lengths, dtype=np.int64)
    n_rows = len(row_lengths)
    row_starts = np.concatenate(([0], np.cumsum(row_lengths)[:-1]))
    small = row_lengths < BLOCK_SIZE
    out: list[bytes] = [b""] * n_rows

    small_idx = np.nonzero(small)[0]
    if len(small_idx):
        lens = row_lengths[small_idx]
        # interleave per-row [count, v0, v1, ...] into one array
        tot = int((lens + 1).sum())
        arr = np.empty(tot, dtype=np.uint64)
        out_starts = np.concatenate(([0], np.cumsum(lens + 1)[:-1]))
        arr[out_starts] = lens.astype(np.uint64)
        # scatter the values: target positions = out_start + 1 + offset_in_row
        src_index = np.repeat(row_starts[small_idx], lens) + _ranges(lens)
        dst_index = np.repeat(out_starts + 1, lens) + _ranges(lens)
        arr[dst_index] = values[src_index]
        enc, nb = encode_vlongs_np(arr)
        # per-row byte extents
        nb_row = np.add.reduceat(nb, out_starts) if tot else np.zeros(0, dtype=np.int64)
        byte_starts = np.concatenate(([0], np.cumsum(nb_row)[:-1]))
        enc_bytes = enc.tobytes()
        for i, (bs, nbr) in enumerate(zip(byte_starts, nb_row)):
            out[small_idx[i]] = enc_bytes[bs : bs + nbr]

    for i in np.nonzero(~small)[0]:
        s = row_starts[i]
        out[i] = encode_stream(values[s : s + row_lengths[i]])
    return out


def _ranges(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated (vectorized arange per group)."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    idx = np.arange(total, dtype=np.int64)
    return idx - np.repeat(starts, lengths)
