"""Tokenization and n-gram shingle hashing — the input side of every
signature (KMV, MinHash, SimHash).

The pipeline's parity-critical path (north-star config: 5-gram token
shingles, murmur3 seed 9001):

1. tokenize: split source text on non-alphanumeric runs (identifiers,
   numbers and each remaining punctuation glyph become tokens).
2. hash each distinct token to uint64 with
   murmur3_x64_128(utf8, seed).h1 — the reference's byte[] datum path
   (/root/reference/Theta/UpdateSketch.cs:241-242).
3. form n-gram shingles as fixed-width uint64 rows (the token-hash
   window) and hash each row through the long[] overload
   (/root/reference/Hash/MurmurHash3.cs:78-106) with the same seed,
   ``>>> 1`` into the theta domain (UpdateSketch.cs:205).

Step 3 over fixed-width rows is what makes the whole thing vectorizable:
per document we do one sliding-window view + one batched hash, no Python
loops over shingles.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from datasketches_spark.config import DEFAULT_SEED
from datasketches_spark.kernels.murmur3 import hash128_bytes_vec, sketch_hash_longs_vec

# identifiers/numbers, or any single non-space symbol glyph.
# [0-9] (not \d) so non-ASCII digits tokenize byte-for-byte like the
# Spark/DuckDB SQL twins below (Python \d is Unicode-aware; theirs is not).
_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*|[0-9]+|[^\sA-Za-z_0-9]")

# The same tokenizer, expressible in ANSI SQL for oracle checks:
# regexp_extract_all(text, '[A-Za-z_][A-Za-z_0-9]*|[0-9]+|[^\sA-Za-z_0-9]')
TOKEN_REGEX_SQL = r"[A-Za-z_][A-Za-z_0-9]*|[0-9]+|[^\sA-Za-z_0-9]"


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text)


def hash_tokens_batch(token_lists: list[list[str]], seed: int = DEFAULT_SEED) -> list[np.ndarray]:
    """Hash every token of every document in one vectorized murmur3 call.

    Distinct tokens across the batch are hashed once (vocabulary dedup via
    ``pd.factorize`` — C hash table, first-occurrence order); documents
    then gather their token-hash streams by index.
    """
    n_docs = len(token_lists)
    counts = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=n_docs)
    total = int(counts.sum())
    empty = np.empty(0, dtype=np.uint64)
    if total == 0:
        return [empty] * n_docs
    flat = np.empty(total, dtype=object)
    pos = 0
    for toks in token_lists:
        if toks:
            flat[pos : pos + len(toks)] = toks
            pos += len(toks)
    codes, uniques = pd.factorize(flat, sort=False)
    if (codes < 0).any():
        # factorize maps missing values (None/NaN) to -1; gathering with a
        # negative code would silently alias the LAST unique's hash. Fail
        # loudly instead, naming the offender, like the dict path once did.
        bad = flat[np.flatnonzero(codes < 0)[0]]
        raise TypeError(f"non-string token in token stream: {bad!r}")
    h1, _ = hash128_bytes_vec([t.encode("utf-8") for t in uniques], seed)
    allh = h1[codes]
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    return [allh[offs[i] : offs[i + 1]] if counts[i] else empty for i in range(n_docs)]


def shingle_hashes(token_hashes: np.ndarray, ngram: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Theta-domain hashes of all n-gram shingles of one document's
    token-hash stream. Documents shorter than ``ngram`` tokens contribute a
    single shingle of whatever tokens exist (so tiny files still sign)."""
    n = token_hashes.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < ngram:
        return sketch_hash_longs_vec(token_hashes.reshape(1, -1), seed)
    windows = np.lib.stride_tricks.sliding_window_view(token_hashes, ngram)
    return sketch_hash_longs_vec(np.ascontiguousarray(windows), seed)


def shingle_hashes_batch(token_hash_list: list[np.ndarray], ngram: int,
                         seed: int = DEFAULT_SEED,
                         chunk_windows: int = 1 << 18) -> list[np.ndarray]:
    """``shingle_hashes`` over a whole batch of documents in O(1) NumPy
    dispatches per ~chunk_windows shingle windows (instead of per document
    — small source files make per-doc vector calls overhead-bound).

    Bit-identical to per-doc ``shingle_hashes``: full-width windows of all
    docs are gathered into one (W, ngram) matrix and hashed in bounded
    chunks; short docs (< ngram tokens) are grouped by exact width and
    hashed per width, preserving the single-shingle-of-what-exists rule.
    """
    n_docs = len(token_hash_list)
    counts = np.fromiter((a.shape[0] for a in token_hash_list), dtype=np.int64, count=n_docs)
    out: list[np.ndarray | None] = [None] * n_docs
    empty = np.empty(0, dtype=np.uint64)
    total = int(counts.sum())
    if total == 0:
        return [empty] * n_docs
    allh = np.concatenate([np.asarray(a, dtype=np.uint64) for a in token_hash_list])
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])

    full = np.flatnonzero(counts >= ngram)
    if full.size:
        wcounts = counts[full] - ngram + 1
        woffs = np.zeros(full.size + 1, dtype=np.int64)
        np.cumsum(wcounts, out=woffs[1:])
        total_w = int(woffs[-1])
        # global start index of every window: per-doc base + 0..wcount-1
        starts = np.repeat(offs[full] - woffs[:-1], wcounts) + np.arange(total_w)
        gather = np.arange(ngram, dtype=np.int64)[None, :]
        hashed = np.empty(total_w, dtype=np.uint64)
        for c0 in range(0, total_w, chunk_windows):
            c1 = min(c0 + chunk_windows, total_w)
            win = allh[starts[c0:c1, None] + gather]
            hashed[c0:c1] = sketch_hash_longs_vec(win, seed)
        for j, d in enumerate(full):
            out[d] = hashed[woffs[j] : woffs[j + 1]]

    for w in range(1, ngram):
        idx = np.flatnonzero(counts == w)
        if idx.size:
            rows = allh[offs[idx][:, None] + np.arange(w, dtype=np.int64)]
            h = sketch_hash_longs_vec(rows, seed)
            for j, d in enumerate(idx):
                out[d] = h[j : j + 1]
    for d in np.flatnonzero(counts == 0):
        out[d] = empty
    return out  # type: ignore[return-value]


def unique_sets_batch(streams: list[np.ndarray],
                      segmented_max_mean: int = 16) -> list[np.ndarray]:
    """``[np.unique(s) for s in streams]``, dispatch-adaptive.

    Two regimes, measured on this host: for TINY streams (mean length
    under ~16) the per-document ``np.unique`` python dispatch dominates
    the actual sorting work, and a single segmented sort over
    (doc_idx, hash) + one boundary-diff pass is ~2x faster; for normal
    streams each per-doc sort runs in L1/L2 cache while a global lexsort
    of the concatenation is a cache-missing mergesort that gets WORSE
    with length (measured 1.8x slower at ~40 elements, 17x at ~400) —
    there the per-doc loop is kept. Bit-identical outputs either way
    (sorted ascending, distinct)."""
    n = len(streams)
    counts = np.fromiter((s.shape[0] for s in streams), dtype=np.int64, count=n)
    total = int(counts.sum())
    empty = np.empty(0, dtype=np.uint64)
    if total == 0:
        return [empty] * n
    if total > segmented_max_mean * n:
        return [np.unique(s) for s in streams]
    allh = np.concatenate([np.asarray(s, dtype=np.uint64) for s in streams])
    doc = np.repeat(np.arange(n, dtype=np.int64), counts)
    order = np.lexsort((allh, doc))  # primary: doc, secondary: hash
    hs = allh[order]
    ds = doc[order]
    first = np.ones(total, dtype=bool)
    np.not_equal(hs[1:], hs[:-1], out=first[1:])
    first[1:] |= ds[1:] != ds[:-1]
    uniq = hs[first]
    ucounts = np.bincount(ds[first], minlength=n)
    uoffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(ucounts, out=uoffs[1:])
    return [uniq[uoffs[i]:uoffs[i + 1]] if ucounts[i] else empty for i in range(n)]


def shingle_set(text: str, ngram: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Distinct shingle hashes of one document (convenience/oracle path)."""
    (th,) = hash_tokens_batch([tokenize(text)], seed)
    return np.unique(shingle_hashes(th, ngram, seed))


def exact_jaccard(text_a: str, text_b: str, ngram: int, seed: int = DEFAULT_SEED) -> float:
    """Exact Jaccard over distinct shingle hash sets (test oracle)."""
    a = shingle_set(text_a, ngram, seed)
    b = shingle_set(text_b, ngram, seed)
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / float(a.size + b.size - inter)
