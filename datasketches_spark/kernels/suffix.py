"""Exact common-span detection on candidate pairs (SURVEY §2C.3): after LSH
narrows the search to candidate pairs, find the longest common token span
between two documents. Runs only on (small) verified-pair groups inside
applyInPandas, so an O(n log n) suffix-automaton/rolling-hash approach over
token-hash sequences is plenty.

Implementation: binary search on span length L with rolling-hash set
intersection (Rabin-Karp over uint64 token hashes) — O((n+m) log min(n,m)),
fully NumPy-vectorized per probe. A verify step on the winning length
guards against (astronomically unlikely) 64-bit hash collisions.
"""

from __future__ import annotations

import numpy as np

_B = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier for the rolling hash


def _window_hashes(h: np.ndarray, L: int) -> np.ndarray:
    """Polynomial rolling hashes of all length-L windows of h (mod 2^64)."""
    n = h.shape[0]
    if L > n:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # prefix[i] = sum h[j] * B^(i-1-j) — computed via cumulative trick:
        # scale h[j] by B^(n-1-j), cumsum, then rescale windows.
        # To stay in uint64 modular arithmetic we use powers of B mod 2^64.
        pows = np.empty(n + 1, dtype=np.uint64)
        pows[0] = 1
        np.multiply.accumulate(np.full(n, _B, dtype=np.uint64), out=pows[1:])
        scaled = h * pows[n - 1 - np.arange(n)]
        pref = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(scaled, out=pref[1:])
        win = pref[L:] - pref[:-L]  # sum over window, scaled by B^(n-1-j)
        # normalize: divide by B^(n-L-i) == multiply by inverse; B odd -> invertible mod 2^64
        inv = _inv_pow_table(pows, n, L)
        return win * inv


def _inv_pow_table(pows: np.ndarray, n: int, L: int) -> np.ndarray:
    """Inverses of B^(n-L-i) mod 2^64 for window starts i=0..n-L.
    Vectorized exactly like the forward ``pows`` table: one
    ``np.multiply.accumulate`` over the inverse multiplier (a per-element
    Python loop here was the span pass's hot loop — O(n) interpreter
    iterations per binary-search probe)."""
    inv_b = np.uint64(_modinv64(int(_B)))
    m = n - L + 1
    tmp = np.empty(m, dtype=np.uint64)
    tmp[0] = 1
    with np.errstate(over="ignore"):
        if m > 1:
            np.multiply.accumulate(np.full(m - 1, inv_b, dtype=np.uint64), out=tmp[1:])
    return tmp[::-1]  # invp[i] = inv_b^(m-1-i) = inv(B^(n-L-i))


def _modinv64(a: int) -> int:
    """Inverse of odd a mod 2^64 by Newton iteration."""
    x = a  # 3 bits correct
    for _ in range(6):
        x = (x * (2 - a * x)) % (1 << 64)
    return x % (1 << 64)


def _has_common_window(ha: np.ndarray, hb: np.ndarray, L: int) -> bool:
    """True iff some length-L window hash of a also occurs in b, with the
    first few matches exact-verified against the token sequences."""
    wa = _window_hashes(ha, L)
    wb = _window_hashes(hb, L)
    if wa.size == 0 or wb.size == 0:
        return False
    common, ia_idx, ib_idx = np.intersect1d(wa, wb, return_indices=True)
    if common.size == 0:
        return False
    for ia, ib in zip(ia_idx[:8], ib_idx[:8]):
        if np.array_equal(ha[ia : ia + L], hb[ib : ib + L]):
            return True
    # all sampled matches were 64-bit collisions (odds ~2^-64 each):
    # conservatively report no common window.
    return False


def longest_common_span(tokens_a: np.ndarray, tokens_b: np.ndarray) -> int:
    """Length (in tokens) of the longest common contiguous span between two
    token-hash sequences."""
    a = np.asarray(tokens_a, dtype=np.uint64)
    b = np.asarray(tokens_b, dtype=np.uint64)
    lo, hi = 0, min(a.shape[0], b.shape[0])
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if _has_common_window(a, b, mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def containment(tokens_a: np.ndarray, tokens_b: np.ndarray) -> float:
    """Longest-common-span length / shorter document length — the
    embedded-span duplicate score (block-swap/boilerplate detector)."""
    n = min(len(tokens_a), len(tokens_b))
    if n == 0:
        return 0.0
    return longest_common_span(tokens_a, tokens_b) / float(n)
