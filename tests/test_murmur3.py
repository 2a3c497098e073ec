"""Layer-1 kernel parity: murmur3 x64_128 bit-exactness.

Anchors:
- published mmh3 vector: hash64("foo") == (-2129773440516405919,
  9128664383759220103)  (mmh3 README; x64_128 seed 0, signed pair)
- independent pure-Python transcription of Appleby rev 150
  (tests/reference_murmur3.py) over randomized inputs covering every
  tail length 0..15 and multi-block bodies
- the reference long[] overload semantics
  (/root/reference/Hash/MurmurHash3.cs:78-106): 2-long blocks, 1-long
  tail, byte length = 8*len — equivalent to hashing the little-endian
  byte image.
"""

import random

import numpy as np
import pytest

from datasketches_spark.config import DEFAULT_SEED
from datasketches_spark.kernels.murmur3 import (
    hash128,
    hash128_bytes_vec,
    hash128_longs,
    hash128_longs_vec,
    sketch_hash_bytes_vec,
)
from tests.reference_murmur3 import murmur3_x64_128

M = (1 << 64) - 1


def to_signed(x):
    return x - (1 << 64) if x >= (1 << 63) else x


def test_published_vector_foo():
    h1, h2 = hash128(b"foo", 0)
    assert (to_signed(h1), to_signed(h2)) == (-2129773440516405919, 9128664383759220103)


def test_empty_seed0():
    assert hash128(b"", 0) == (0, 0)


@pytest.mark.parametrize("seed", [0, 1, DEFAULT_SEED, (1 << 63) - 1, M])
def test_scalar_matches_independent_transcription(seed):
    rng = random.Random(12345 + seed % 97)
    for length in list(range(0, 40)) + [255, 256, 1000]:
        data = bytes(rng.randrange(256) for _ in range(length))
        assert hash128(data, seed) == murmur3_x64_128(data, seed), (length, seed)


def test_bytes_vec_matches_scalar():
    rng = random.Random(7)
    batch = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64))) for _ in range(500)]
    h1, h2 = hash128_bytes_vec(batch, DEFAULT_SEED)
    for i, d in enumerate(batch):
        assert (int(h1[i]), int(h2[i])) == hash128(d, DEFAULT_SEED)


def test_longs_vec_matches_byte_image():
    """long[] overload == hashing the little-endian byte image (the
    reference derives both from the same block mix; MurmurHash3.cs:105
    passes lengthLongs<<3 as the byte length)."""
    rng = np.random.default_rng(42)
    for L in (1, 2, 3, 4, 5, 8, 9):
        keys = rng.integers(0, M, size=(50, L), dtype=np.uint64)
        h1, h2 = hash128_longs_vec(keys, DEFAULT_SEED)
        for i in range(keys.shape[0]):
            img = keys[i].tobytes()  # little-endian on this platform
            exp = murmur3_x64_128(img, DEFAULT_SEED)
            assert (int(h1[i]), int(h2[i])) == exp


def test_scalar_longs_helper():
    h = hash128_longs([1, 2, 3], DEFAULT_SEED)
    img = np.array([1, 2, 3], dtype=np.uint64).tobytes()
    assert h == murmur3_x64_128(img, DEFAULT_SEED)


def test_sketch_hash_domain():
    """Theta-domain hash = h1 >>> 1 (UpdateSketch.cs:205): always < 2^63."""
    batch = [f"token{i}".encode() for i in range(1000)]
    h = sketch_hash_bytes_vec(batch, DEFAULT_SEED)
    assert h.dtype == np.uint64
    assert int(h.max()) < (1 << 63)
    # deterministic across calls
    h2 = sketch_hash_bytes_vec(batch, DEFAULT_SEED)
    assert np.array_equal(h, h2)
    # seed changes the stream
    h3 = sketch_hash_bytes_vec(batch, DEFAULT_SEED + 1)
    assert not np.array_equal(h, h3)
