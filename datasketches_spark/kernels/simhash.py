"""SimHash 64-bit fingerprints (SURVEY §2C.2) from the same murmur3
shingle-hash stream: each shingle votes ±1 per bit; the fingerprint takes
the sign of the per-bit sum. Near-duplicates land within a small Hamming
distance. Vectorized with np.unpackbits — no per-shingle Python."""

from __future__ import annotations

import numpy as np


def fingerprint(shingle_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of one document's shingle-hash set (uint64 scalar
    returned as int). Empty documents fingerprint to 0."""
    h = np.asarray(shingle_hashes, dtype=np.uint64)
    if h.shape[0] == 0:
        return 0
    bits = np.unpackbits(h[:, None].view(np.uint8), axis=1, bitorder="little")  # (m, 64)
    if weights is None:
        votes = bits.sum(axis=0, dtype=np.int64) * 2 - h.shape[0]
    else:
        w = np.asarray(weights, dtype=np.int64)
        votes = (bits * w[:, None]).sum(axis=0) * 2 - w.sum()
    out = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
    return int(out.view(np.uint64)[0])


def fingerprints_batch(shingle_sets: list[np.ndarray]) -> np.ndarray:
    """Batched across documents: per-bit votes via a REUSED uint64 bit
    buffer (shift+mask in place) and a native-dtype segment reduceat.
    Avoids both large fresh allocations (pathological page-fault cost in
    sandboxed executors) and reduceat's slow casting path."""
    n = len(shingle_sets)
    out = np.zeros(n, dtype=np.uint64)
    lengths = np.fromiter((s.shape[0] for s in shingle_sets), dtype=np.int64, count=n)
    nonempty = np.flatnonzero(lengths > 0)
    if nonempty.size == 0:
        return out
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    # L2-resident chunk (1024 × 64 × 8 B = 512 KB bit buffer): the
    # shift/mask/reduceat passes stay in-cache — see minhash.signatures_batch
    m_chunk = max(1024, int(lengths.max()))
    bitbuf = np.empty((m_chunk, 64), dtype=np.uint64)
    one = np.uint64(1)
    start = 0
    while start < nonempty.size:
        end = start
        tot = 0
        while end < nonempty.size and (tot == 0 or tot + lengths[nonempty[end]] <= m_chunk):
            tot += lengths[nonempty[end]]
            end += 1
        idx = nonempty[start:end]
        concat = np.concatenate([shingle_sets[i] for i in idx]).astype(np.uint64)
        m = concat.shape[0]
        view = bitbuf[:m]
        np.right_shift(concat[:, None], shifts, out=view)
        np.bitwise_and(view, one, out=view)
        seg = np.zeros(idx.size, dtype=np.int64)
        np.cumsum(lengths[idx][:-1], out=seg[1:])
        sums = np.add.reduceat(view, seg, axis=0)  # uint64, native fast path
        votes = sums.astype(np.int64) * 2 - lengths[idx][:, None]
        packed = np.packbits((votes > 0).astype(np.uint8), axis=1, bitorder="little")
        out[idx] = packed.view(np.uint64).ravel()
        start = end
    return out


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming(a, b) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprints."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    return _POP8[x[..., None].view(np.uint8)].sum(axis=-1).astype(np.int64)
