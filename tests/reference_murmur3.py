"""Independent pure-Python transcription of MurmurHash3_x64_128 (Appleby
rev 150), written directly from the public C++ — structurally unlike the
NumPy implementation under test. Used only as a test oracle."""

M = (1 << 64) - 1
C1 = 0x87C37B91114253D5
C2 = 0x4CF5AD432745937F


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(k):
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & M
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0):
    length = len(data)
    h1 = seed & M
    h2 = seed & M
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * C1) & M
        k1 = _rotl(k1, 31)
        k1 = (k1 * C2) & M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & M
        h1 = (h1 * 5 + 0x52DCE729) & M
        k2 = (k2 * C2) & M
        k2 = _rotl(k2, 33)
        k2 = (k2 * C1) & M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & M
        h2 = (h2 * 5 + 0x38495AB5) & M
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    if t >= 9:
        k2 = int.from_bytes(tail[8:t].ljust(8, b"\0"), "little")
    if t >= 1:
        k1 = int.from_bytes(tail[:min(t, 8)].ljust(8, b"\0"), "little")
    if k2:
        k2 = (k2 * C2) & M
        k2 = _rotl(k2, 33)
        k2 = (k2 * C1) & M
        h2 ^= k2
    if k1:
        k1 = (k1 * C1) & M
        k1 = _rotl(k1, 31)
        k1 = (k1 * C2) & M
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    return h1, h2
