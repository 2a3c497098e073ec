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

Pure NumPy, vectorized per document (one sliding-window min + unique);
batched across an Arrow batch by the signature stage.
"""

from __future__ import annotations

import numpy as np


def winnow(shingle_stream: np.ndarray, w: int) -> np.ndarray:
    """Distinct selected fingerprints of one document's positional shingle
    hash stream. Streams shorter than ``w`` select their global minimum
    (every document fingerprints, however small)."""
    n = shingle_stream.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n <= w:
        return shingle_stream.min(keepdims=True).astype(np.uint64)
    mins = np.lib.stride_tricks.sliding_window_view(shingle_stream, w).min(axis=1)
    return np.unique(mins)
