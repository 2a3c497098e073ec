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

    Distinct tokens across the batch are hashed once (vocabulary dedup);
    documents then gather their token-hash streams by index.
    """
    vocab: dict[str, int] = {}
    idx_lists = []
    for toks in token_lists:
        idx_lists.append(np.fromiter((vocab.setdefault(t, len(vocab)) for t in toks), dtype=np.int64, count=len(toks)))
    if vocab:
        h1, _ = hash128_bytes_vec([t.encode("utf-8") for t in vocab], seed)
    else:
        h1 = np.empty(0, dtype=np.uint64)
    return [h1[idx] if idx.size else np.empty(0, dtype=np.uint64) for idx in idx_lists]


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
