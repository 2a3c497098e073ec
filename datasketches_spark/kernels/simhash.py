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
    return np.fromiter((fingerprint(s) for s in shingle_sets), dtype=np.uint64, count=len(shingle_sets))


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming(a, b) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprints."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    return _POP8[x[..., None].view(np.uint8)].sum(axis=-1).astype(np.int64)
