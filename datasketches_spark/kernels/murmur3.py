"""MurmurHash3 x64_128, bit-compatible with Austin Appleby's public-domain
C++ rev 150 and with the reference library's implementation
(/root/reference/Hash/MurmurHash3.cs:346-432: C1/C2 constants, BlockMix128,
FinalMix128, FinalMix64, MixK1/MixK2).

Two forms:

- scalar ``hash128`` over ``bytes`` — used for test vectors and one-off
  hashing (driver-side keys, config digests).
- vectorized NumPy forms over uint64 arrays — the hot path.  Per the
  reference's typed overloads, a ``long[]`` input is hashed in 2-long
  (128-bit) blocks with a possible 1-long tail and total length counted in
  *bytes* (= lengthLongs * 8, MurmurHash3.cs:78-106).  Shingles of N token
  hashes therefore hash as fixed-width uint64 rows — fully vectorizable
  with no per-row Python.

- ``hash128_bytes_vec`` handles variable-length byte strings (token
  hashing): rows are zero-padded to a common width; because the
  reference's little-endian partial-tail load ORs only the available
  bytes (MurmurHash3.cs:482-491), a full 8-byte load of zero-padded data
  is bit-identical, so padding introduces no branches.

All arithmetic is modulo 2^64 (NumPy uint64 wraps), matching C# unchecked
long arithmetic reinterpreted as ulong.
"""

from __future__ import annotations

import numpy as np

C1 = np.uint64(0x87C37B91114253D5)
C2 = np.uint64(0x4CF5AD432745937F)
_M1 = np.uint64(0xFF51AFD7ED558CCD)
_M2 = np.uint64(0xC4CEB9FE1A85EC53)
_FIVE = np.uint64(5)
_A1 = np.uint64(0x52DCE729)
_A2 = np.uint64(0x38495AB5)
U64 = np.uint64
_MASK64 = (1 << 64) - 1


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def _mix_k1(k1: np.ndarray) -> np.ndarray:
    k1 = k1 * C1
    k1 = _rotl(k1, 31)
    return k1 * C2


def _mix_k2(k2: np.ndarray) -> np.ndarray:
    k2 = k2 * C2
    k2 = _rotl(k2, 33)
    return k2 * C1


def _fmix64(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _M1
    h = h ^ (h >> np.uint64(33))
    h = h * _M2
    h = h ^ (h >> np.uint64(33))
    return h


def _block_mix(h1, h2, k1, k2):
    h1 = h1 ^ _mix_k1(k1)
    h1 = _rotl(h1, 27)
    h1 = h1 + h2
    h1 = h1 * _FIVE + _A1
    h2 = h2 ^ _mix_k2(k2)
    h2 = _rotl(h2, 31)
    h2 = h2 + h1
    h2 = h2 * _FIVE + _A2
    return h1, h2


def _final_mix(h1, h2, k1, k2, length_bytes):
    h1 = h1 ^ _mix_k1(k1)
    h2 = h2 ^ _mix_k2(k2)
    h1 = h1 ^ length_bytes
    h2 = h2 ^ length_bytes
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1, h2


# ---------------------------------------------------------------- scalar


def hash128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """128-bit hash of a byte string; returns (h1, h2) as unsigned ints.

    Matches MurmurHash3_x64_128 rev 150 (and the reference's byte[]
    overload, MurmurHash3.cs:253-292). Zero-length input hashes as
    0 blocks + 0 tail (the reference rejects it; we allow it for
    convenience — callers in the sketch path never pass empty).
    """
    n = len(data)
    nblocks = n >> 4
    with np.errstate(over="ignore"):
        h1 = U64(seed & _MASK64)
        h2 = U64(seed & _MASK64)
        if nblocks:
            blocks = np.frombuffer(data, dtype="<u8", count=nblocks * 2)
            for i in range(nblocks):
                h1, h2 = _block_mix(h1, h2, blocks[2 * i], blocks[2 * i + 1])
        tail = nblocks << 4
        rem = n - tail
        buf = bytearray(16)
        buf[:rem] = data[tail:]
        k = np.frombuffer(bytes(buf), dtype="<u8")
        k1 = k[0] if rem > 0 else U64(0)
        k2 = k[1] if rem > 8 else U64(0)
        h1, h2 = _final_mix(h1, h2, k1, k2, U64(n))
    return int(h1), int(h2)


def hash128_longs(key, seed: int = 0) -> tuple[int, int]:
    """Scalar hash of a sequence of 64-bit ints (reference long[] overload,
    MurmurHash3.cs:78-106): 2-long blocks, 1-long tail, length in bytes."""
    arr = np.asarray(key, dtype=np.uint64)
    out1, out2 = hash128_longs_vec(arr.reshape(1, -1), seed)
    return int(out1[0]), int(out2[0])


# ------------------------------------------------------------ vectorized


def hash128_longs_vec(keys: np.ndarray, seed: int = 0):
    """Hash each row of an (n, L) uint64 array. Returns (h1, h2) uint64
    arrays of shape (n,). Fixed L per call → no masks, pure vector ops."""
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    if keys.ndim != 2:
        raise ValueError("keys must be 2-D (n rows, L longs)")
    n, L = keys.shape
    with np.errstate(over="ignore"):
        h1 = np.full(n, seed & _MASK64, dtype=np.uint64)
        h2 = h1.copy()
        nblocks = L >> 1
        for i in range(nblocks):
            h1, h2 = _block_mix(h1, h2, keys[:, 2 * i], keys[:, 2 * i + 1])
        if L & 1:
            k1 = keys[:, L - 1]
        else:
            k1 = np.zeros(n, dtype=np.uint64)
        zero = np.zeros(n, dtype=np.uint64)
        h1, h2 = _final_mix(h1, h2, k1, zero, U64(L << 3))
    return h1, h2


def hash128_bytes_vec(data: list[bytes], seed: int = 0):
    """Hash a batch of variable-length byte strings. Returns (h1, h2)
    uint64 arrays. Vectorized via zero-padding to a common width; block i
    is applied only to rows with nblocks > i (masked select)."""
    n = len(data)
    lengths = np.fromiter((len(d) for d in data), dtype=np.int64, count=n)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    max_len = int(lengths.max())
    # width: room for all full blocks plus a 16-byte zero tail region
    width = ((max_len >> 4) + 1) << 4
    buf = np.zeros((n, width), dtype=np.uint8)
    for i, d in enumerate(data):
        if d:
            buf[i, : lengths[i]] = np.frombuffer(d, dtype=np.uint8)
    words = buf.view("<u8")  # (n, width/8)
    nblocks = lengths >> 4
    max_blocks = int(nblocks.max())
    with np.errstate(over="ignore"):
        h1 = np.full(n, seed & _MASK64, dtype=np.uint64)
        h2 = h1.copy()
        for i in range(max_blocks):
            mask = nblocks > i
            nh1, nh2 = _block_mix(h1, h2, words[:, 2 * i], words[:, 2 * i + 1])
            h1 = np.where(mask, nh1, h1)
            h2 = np.where(mask, nh2, h2)
        tail_word = (nblocks << 1).astype(np.int64)
        rows = np.arange(n)
        rem = lengths - (nblocks << 4)
        # zero-padded loads reproduce the partial little-endian tail loads
        k1 = np.where(rem > 0, words[rows, tail_word], np.uint64(0))
        k2 = np.where(rem > 8, words[rows, tail_word + 1], np.uint64(0))
        h1, h2 = _final_mix(h1, h2, k1, k2, lengths.astype(np.uint64))
    return h1, h2


def sketch_hash_longs_vec(keys: np.ndarray, seed: int) -> np.ndarray:
    """The reference's update-time hash of long[] datums:
    ``MurmurHash3.Hash(key, seed)[0] >>> 1`` (UpdateSketch.cs:205,300),
    mapping into the theta domain [0, 2^63-1]."""
    h1, _ = hash128_longs_vec(keys, seed)
    return h1 >> np.uint64(1)


def sketch_hash_bytes_vec(data: list[bytes], seed: int) -> np.ndarray:
    """Theta-domain hash of byte strings (UpdateSketch.cs:242)."""
    h1, _ = hash128_bytes_vec(data, seed)
    return h1 >> np.uint64(1)


def hash128_ints_vec(data: list[np.ndarray], seed: int = 0):
    """128-bit hash of int[] datums (the reference's Hash(int[]) overload,
    MurmurHash3.cs:129-168). Ints pack little-endian into the same k1/k2
    lanes as the byte[] path (GetLong, MurmurHash3.cs:444-452, packs
    int[i] << 32*i — exactly the LE byte image), and length is counted in
    bytes (lengthInts << 2), so the int[] hash equals the byte[] hash of
    the array's LE image."""
    return hash128_bytes_vec([np.ascontiguousarray(a, dtype="<u4").tobytes() for a in data], seed)


def sketch_hash_ints_vec(data: list[np.ndarray], seed: int) -> np.ndarray:
    """Theta-domain hash of int[] datums (UpdateSketch.cs:285-291)."""
    h1, _ = hash128_ints_vec(data, seed)
    return h1 >> np.uint64(1)


def canonicalize_doubles(vals: np.ndarray) -> np.ndarray:
    """Double-datum canonicalization before hashing (UpdateSketch.cs:219-220):
    -0.0 → +0.0 and every NaN bit pattern collapsed to the canonical quiet
    NaN, so equal-comparing doubles always sketch identically. Returns the
    canonical IEEE-754 bit patterns as uint64 (the long[] datum image)."""
    v = np.asarray(vals, dtype=np.float64).copy()
    v[v == 0.0] = 0.0  # -0.0 == 0.0 compares true; assignment writes +0.0
    v[np.isnan(v)] = np.float64("nan")  # single canonical NaN pattern
    return v.view(np.uint64)


def sketch_hash_doubles_vec(vals: np.ndarray, seed: int) -> np.ndarray:
    """Theta-domain hash of double datums via the canonicalized long-bits
    path (UpdateSketch.cs:217-222)."""
    bits = canonicalize_doubles(vals).reshape(-1, 1)
    return sketch_hash_longs_vec(bits, seed)
