"""Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003) —
the candidate-generation side of the common-span pass (SURVEY §2C.3).

Whole-document MinHash cannot surface a 60-token block copied into an
otherwise-unique file: document-level Jaccard is ~|block|/|doc| and the
LSH collision probability vanishes. Winnowing selects, from the POSITIONAL
stream of shingle hashes, the minimum of every ``w``-wide window. The
classic guarantee: any common token run of at least ``w + ngram - 1``
tokens yields at least one identical selected fingerprint in both
documents, at an expected density of ~2/(w+1) of the shingle stream — so
a corpus-wide equi-join on fingerprints finds every long-enough shared
block for ~2% of the cost of a full shingle inverted index.

Pure NumPy, vectorized per document (O(n) block prefix/suffix sliding
min + unique); batched across an Arrow batch by the signature stage.
"""

from __future__ import annotations

import numpy as np


def _sliding_min(a: np.ndarray, w: int) -> np.ndarray:
    """O(n) sliding-window minimum via the block prefix/suffix-min trick:
    split into blocks of width w; the min of window [i, i+w-1] is
    min(suffix_min within i's block, prefix_min within (i+w-1)'s block).
    Two ``np.minimum.accumulate`` passes — no O(n·w) window materialization
    (the former ``sliding_window_view(...).min(axis=1)`` was ~w× the memory
    traffic of the stream and dominated the signature stage at w=50)."""
    n = a.shape[0]
    nblocks = -(-n // w)
    pad = nblocks * w - n
    if pad:
        a = np.concatenate([a, np.full(pad, np.iinfo(a.dtype).max, dtype=a.dtype)])
    blocks = a.reshape(nblocks, w)
    pref = np.minimum.accumulate(blocks, axis=1).ravel()
    suff = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()
    return np.minimum(suff[: n - w + 1], pref[w - 1 : n])


def winnow(shingle_stream: np.ndarray, w: int) -> np.ndarray:
    """Distinct selected fingerprints of one document's positional shingle
    hash stream. Streams shorter than ``w`` select their global minimum
    (every document fingerprints, however small)."""
    n = shingle_stream.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n <= w:
        return shingle_stream.min(keepdims=True).astype(np.uint64)
    return np.unique(_sliding_min(shingle_stream, w))
