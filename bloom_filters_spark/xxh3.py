"""XXH3-64 / XXH3-128 — byte-parity implementation from the public
xxHash specification (https://github.com/Cyan4973/xxHash,
doc/xxhash_spec.md; constants cross-checked against the BSD-licensed
reference header).  This is the hash the reference library's
HyperLogLog / XorFilter / IBLT use via ``@node-rs/xxhash``
(``xxh3.xxh64(element, seed)`` / ``xxh3.xxh128(element, seed)``), so
byte-parity here makes reference-serialized sketch state (`fromJSON`)
interoperable.

Validated in-sandbox against the system ``libxxhash 0.8.1`` via ctypes
across all length classes (0, 1-3, 4-8, 9-16, 17-128, 129-240, 241+)
and random seeds — see ``tests/test_xxh3.py``; a pinned vector fixture
keeps the tests meaningful on hosts without the library.

Scalar paths are pure Python (used for string elements); the 8-byte
fast path (``xxh3_64_u64``) vectorizes the len-4-to-8 branch with numpy
for integer-column hot loops.
"""

from __future__ import annotations

import numpy as np

MASK64 = 0xFFFFFFFFFFFFFFFF
MASK32 = 0xFFFFFFFF

P32_1 = 0x9E3779B1
P32_2 = 0x85EBCA77
P32_3 = 0xC2B2AE3D
P64_1 = 0x9E3779B185EBCA87
P64_2 = 0xC2B2AE3D27D4EB4F
P64_3 = 0x165667B19E3779F9
P64_4 = 0x85EBCA77C2B2AE63
P64_5 = 0x27D4EB2F165667C5
PRIME_MX1 = 0x165667919E3779F9
PRIME_MX2 = 0x9FB21C651E98DF25

KSECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d3165526 29d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f951604 28afd7fbcabb4b407e"
    .replace(" ", "")
)
assert len(KSECRET) == 192

SECRET_SIZE_MIN = 136
STRIPE_LEN = 64
ACC_NB = 8
SECRET_CONSUME_RATE = 8
SECRET_MERGEACCS_START = 11
SECRET_LASTACC_START = 7
MIDSIZE_STARTOFFSET = 3
MIDSIZE_LASTOFFSET = 17

_INIT_ACC = (P32_3, P64_1, P64_2, P64_3, P64_4, P32_2, P64_5, P32_1)


def _r64(b, i: int) -> int:
    return int.from_bytes(b[i:i + 8], "little")


def _r32(b, i: int) -> int:
    return int.from_bytes(b[i:i + 4], "little")


def _swap32(x: int) -> int:
    return int.from_bytes((x & MASK32).to_bytes(4, "little"), "big")


def _swap64(x: int) -> int:
    return int.from_bytes((x & MASK64).to_bytes(8, "little"), "big")


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _rotl32(x: int, r: int) -> int:
    x &= MASK32
    return ((x << r) | (x >> (32 - r))) & MASK32


def _mult64to128(a: int, b: int) -> tuple[int, int]:
    p = a * b
    return p & MASK64, (p >> 64) & MASK64


def _fold64(a: int, b: int) -> int:
    lo, hi = _mult64to128(a, b)
    return lo ^ hi


def _xxh64_avalanche(h: int) -> int:
    h &= MASK64
    h ^= h >> 33
    h = (h * P64_2) & MASK64
    h ^= h >> 29
    h = (h * P64_3) & MASK64
    h ^= h >> 32
    return h


def _avalanche(h: int) -> int:
    h &= MASK64
    h ^= h >> 37
    h = (h * PRIME_MX1) & MASK64
    h ^= h >> 32
    return h


def _rrmxmx(h: int, length: int) -> int:
    h &= MASK64
    h ^= _rotl64(h, 49) ^ _rotl64(h, 24)
    h = (h * PRIME_MX2) & MASK64
    h = (h ^ ((h >> 35) + length)) & MASK64
    h = (h * PRIME_MX2) & MASK64
    return h ^ (h >> 28)


def _mix16b(data, i: int, sec, s: int, seed: int) -> int:
    return _fold64(
        _r64(data, i) ^ ((_r64(sec, s) + seed) & MASK64),
        _r64(data, i + 8) ^ ((_r64(sec, s + 8) - seed) & MASK64),
    )


# ---------------------------------------------------------------------------
# 64-bit
# ---------------------------------------------------------------------------

def _len_1to3_64(d, n, sec, seed):
    c1, c2, c3 = d[0], d[n >> 1], d[n - 1]
    combined = (c1 << 16) | (c2 << 24) | c3 | (n << 8)
    bitflip = ((_r32(sec, 0) ^ _r32(sec, 4)) + seed) & MASK64
    return _xxh64_avalanche(combined ^ bitflip)


def _len_4to8_64(d, n, sec, seed):
    seed = (seed ^ (_swap32(seed & MASK32) << 32)) & MASK64
    in1 = _r32(d, 0)
    in2 = _r32(d, n - 4)
    bitflip = ((_r64(sec, 8) ^ _r64(sec, 16)) - seed) & MASK64
    keyed = (in2 + (in1 << 32)) ^ bitflip
    return _rrmxmx(keyed, n)


def _len_9to16_64(d, n, sec, seed):
    bitflip1 = ((_r64(sec, 24) ^ _r64(sec, 32)) + seed) & MASK64
    bitflip2 = ((_r64(sec, 40) ^ _r64(sec, 48)) - seed) & MASK64
    lo = _r64(d, 0) ^ bitflip1
    hi = _r64(d, n - 8) ^ bitflip2
    acc = (n + _swap64(lo) + hi + _fold64(lo, hi)) & MASK64
    return _avalanche(acc)


def _len_0to16_64(d, n, sec, seed):
    if n > 8:
        return _len_9to16_64(d, n, sec, seed)
    if n >= 4:
        return _len_4to8_64(d, n, sec, seed)
    if n:
        return _len_1to3_64(d, n, sec, seed)
    return _xxh64_avalanche(seed ^ _r64(sec, 56) ^ _r64(sec, 64))


def _len_17to128_64(d, n, sec, seed):
    acc = (n * P64_1) & MASK64
    i = (n - 1) // 32
    while i >= 0:
        acc = (acc + _mix16b(d, 16 * i, sec, 32 * i, seed)) & MASK64
        acc = (acc + _mix16b(d, n - 16 * (i + 1), sec, 32 * i + 16, seed)) & MASK64
        i -= 1
    return _avalanche(acc)


def _len_129to240_64(d, n, sec, seed):
    acc = (n * P64_1) & MASK64
    for i in range(8):
        acc = (acc + _mix16b(d, 16 * i, sec, 16 * i, seed)) & MASK64
    acc = _avalanche(acc)
    acc_end = _mix16b(d, n - 16, sec, SECRET_SIZE_MIN - MIDSIZE_LASTOFFSET, seed)
    for i in range(8, n // 16):
        acc_end = (
            acc_end + _mix16b(d, 16 * i, sec, 16 * (i - 8) + MIDSIZE_STARTOFFSET, seed)
        ) & MASK64
    return _avalanche((acc + acc_end) & MASK64)


def _custom_secret(seed: int) -> bytes:
    out = bytearray(192)
    for i in range(12):
        lo = (_r64(KSECRET, 16 * i) + seed) & MASK64
        hi = (_r64(KSECRET, 16 * i + 8) - seed) & MASK64
        out[16 * i:16 * i + 8] = lo.to_bytes(8, "little")
        out[16 * i + 8:16 * i + 16] = hi.to_bytes(8, "little")
    return bytes(out)


def _accumulate_512(acc, d, off, sec, soff):
    for lane in range(ACC_NB):
        dv = _r64(d, off + 8 * lane)
        dk = dv ^ _r64(sec, soff + 8 * lane)
        acc[lane ^ 1] = (acc[lane ^ 1] + dv) & MASK64
        acc[lane] = (acc[lane] + (dk & MASK32) * (dk >> 32)) & MASK64


def _scramble(acc, sec, soff):
    for lane in range(ACC_NB):
        a = acc[lane]
        a ^= a >> 47
        a ^= _r64(sec, soff + 8 * lane)
        acc[lane] = (a * P32_1) & MASK64


def _hash_long_accs(d, n, sec):
    acc = list(_INIT_ACC)
    secret_size = len(sec)
    stripes_per_block = (secret_size - STRIPE_LEN) // SECRET_CONSUME_RATE
    block_len = STRIPE_LEN * stripes_per_block
    nb_blocks = (n - 1) // block_len
    for b in range(nb_blocks):
        for s in range(stripes_per_block):
            _accumulate_512(acc, d, b * block_len + s * STRIPE_LEN,
                            sec, s * SECRET_CONSUME_RATE)
        _scramble(acc, sec, secret_size - STRIPE_LEN)
    nb_stripes = ((n - 1) - block_len * nb_blocks) // STRIPE_LEN
    for s in range(nb_stripes):
        _accumulate_512(acc, d, nb_blocks * block_len + s * STRIPE_LEN,
                        sec, s * SECRET_CONSUME_RATE)
    _accumulate_512(acc, d, n - STRIPE_LEN,
                    sec, secret_size - STRIPE_LEN - SECRET_LASTACC_START)
    return acc


def _merge_accs(acc, sec, soff, start):
    r = start & MASK64
    for i in range(4):
        r = (r + _fold64(acc[2 * i] ^ _r64(sec, soff + 16 * i),
                         acc[2 * i + 1] ^ _r64(sec, soff + 16 * i + 8))) & MASK64
    return _avalanche(r)


def xxh3_64(data: bytes | str, seed: int = 0) -> int:
    """XXH3-64 with seed — byte-parity with ``XXH3_64bits_withSeed``."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    seed &= MASK64
    n = len(data)
    if n <= 16:
        return _len_0to16_64(data, n, KSECRET, seed)
    if n <= 128:
        return _len_17to128_64(data, n, KSECRET, seed)
    if n <= 240:
        return _len_129to240_64(data, n, KSECRET, seed)
    sec = KSECRET if seed == 0 else _custom_secret(seed)
    acc = _hash_long_accs(data, n, sec)
    return _merge_accs(acc, sec, SECRET_MERGEACCS_START, (n * P64_1) & MASK64)


# ---------------------------------------------------------------------------
# 128-bit
# ---------------------------------------------------------------------------

def _len_1to3_128(d, n, sec, seed):
    c1, c2, c3 = d[0], d[n >> 1], d[n - 1]
    combinedl = (c1 << 16) | (c2 << 24) | c3 | (n << 8)
    combinedh = _rotl32(_swap32(combinedl), 13)
    bitflipl = ((_r32(sec, 0) ^ _r32(sec, 4)) + seed) & MASK64
    bitfliph = ((_r32(sec, 8) ^ _r32(sec, 12)) - seed) & MASK64
    return (_xxh64_avalanche(combinedl ^ bitflipl),
            _xxh64_avalanche(combinedh ^ bitfliph))


def _len_4to8_128(d, n, sec, seed):
    seed = (seed ^ (_swap32(seed & MASK32) << 32)) & MASK64
    in_lo = _r32(d, 0)
    in_hi = _r32(d, n - 4)
    input64 = in_lo + (in_hi << 32)
    bitflip = ((_r64(sec, 16) ^ _r64(sec, 24)) + seed) & MASK64
    keyed = input64 ^ bitflip
    lo, hi = _mult64to128(keyed, (P64_1 + (n << 2)) & MASK64)
    hi = (hi + (lo << 1)) & MASK64
    lo ^= hi >> 3
    lo ^= lo >> 35
    lo = (lo * PRIME_MX2) & MASK64
    lo ^= lo >> 28
    hi = _avalanche(hi)
    return lo, hi


def _len_9to16_128(d, n, sec, seed):
    bitflipl = ((_r64(sec, 32) ^ _r64(sec, 40)) - seed) & MASK64
    bitfliph = ((_r64(sec, 48) ^ _r64(sec, 56)) + seed) & MASK64
    input_lo = _r64(d, 0)
    input_hi = _r64(d, n - 8)
    m_lo, m_hi = _mult64to128(input_lo ^ input_hi ^ bitflipl, P64_1)
    m_lo = (m_lo + ((n - 1) << 54)) & MASK64
    input_hi ^= bitfliph
    m_hi = (m_hi + input_hi + (input_hi & MASK32) * (P32_2 - 1)) & MASK64
    m_lo ^= _swap64(m_hi)
    h_lo, h_hi = _mult64to128(m_lo, P64_2)
    h_hi = (h_hi + m_hi * P64_2) & MASK64
    return _avalanche(h_lo), _avalanche(h_hi)


def _len_0to16_128(d, n, sec, seed):
    if n > 8:
        return _len_9to16_128(d, n, sec, seed)
    if n >= 4:
        return _len_4to8_128(d, n, sec, seed)
    if n:
        return _len_1to3_128(d, n, sec, seed)
    bitflipl = _r64(sec, 64) ^ _r64(sec, 72)
    bitfliph = _r64(sec, 80) ^ _r64(sec, 88)
    return (_xxh64_avalanche(seed ^ bitflipl),
            _xxh64_avalanche(seed ^ bitfliph))


def _mix32b(acc_lo, acc_hi, d, i1, i2, sec, s, seed):
    acc_lo = (acc_lo + _mix16b(d, i1, sec, s, seed)) & MASK64
    acc_lo ^= (_r64(d, i2) + _r64(d, i2 + 8)) & MASK64
    acc_hi = (acc_hi + _mix16b(d, i2, sec, s + 16, seed)) & MASK64
    acc_hi ^= (_r64(d, i1) + _r64(d, i1 + 8)) & MASK64
    return acc_lo, acc_hi


def _finalize_mid_128(acc_lo, acc_hi, n, seed):
    h_lo = (acc_lo + acc_hi) & MASK64
    h_hi = (acc_lo * P64_1 + acc_hi * P64_4 + ((n - seed) & MASK64) * P64_2) & MASK64
    return _avalanche(h_lo), (0 - _avalanche(h_hi)) & MASK64


def _len_17to128_128(d, n, sec, seed):
    acc_lo = (n * P64_1) & MASK64
    acc_hi = 0
    i = (n - 1) // 32
    while i >= 0:
        acc_lo, acc_hi = _mix32b(acc_lo, acc_hi, d,
                                 16 * i, n - 16 * (i + 1), sec, 32 * i, seed)
        i -= 1
    return _finalize_mid_128(acc_lo, acc_hi, n, seed)


def _len_129to240_128(d, n, sec, seed):
    acc_lo = (n * P64_1) & MASK64
    acc_hi = 0
    for i in range(32, 160, 32):
        acc_lo, acc_hi = _mix32b(acc_lo, acc_hi, d,
                                 i - 32, i - 16, sec, i - 32, seed)
    acc_lo = _avalanche(acc_lo)
    acc_hi = _avalanche(acc_hi)
    i = 160
    while i <= n:
        acc_lo, acc_hi = _mix32b(
            acc_lo, acc_hi, d, i - 32, i - 16,
            sec, MIDSIZE_STARTOFFSET + i - 160, seed,
        )
        i += 32
    acc_lo, acc_hi = _mix32b(
        acc_lo, acc_hi, d, n - 16, n - 32,
        sec, SECRET_SIZE_MIN - MIDSIZE_LASTOFFSET - 16, (0 - seed) & MASK64,
    )
    return _finalize_mid_128(acc_lo, acc_hi, n, seed)


def xxh3_128(data: bytes | str, seed: int = 0) -> int:
    """XXH3-128 with seed → one 128-bit unsigned int
    ``(high64 << 64) | low64`` — parity with ``XXH3_128bits_withSeed``."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    seed &= MASK64
    n = len(data)
    if n <= 16:
        lo, hi = _len_0to16_128(data, n, KSECRET, seed)
    elif n <= 128:
        lo, hi = _len_17to128_128(data, n, KSECRET, seed)
    elif n <= 240:
        lo, hi = _len_129to240_128(data, n, KSECRET, seed)
    else:
        sec = KSECRET if seed == 0 else _custom_secret(seed)
        acc = _hash_long_accs(data, n, sec)
        lo = _merge_accs(acc, sec, SECRET_MERGEACCS_START, (n * P64_1) & MASK64)
        hi = _merge_accs(acc, sec, len(sec) - 64 - SECRET_MERGEACCS_START,
                         (~(n * P64_2)) & MASK64)
    return (hi << 64) | lo


# ---------------------------------------------------------------------------
# vectorized 8-byte fast path (the len-4-to-8 branch specialized to n=8)
# ---------------------------------------------------------------------------

def xxh3_64_u64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized XXH3-64 over uint64 lanes: equals
    ``xxh3_64(v.to_bytes(8, 'little'), seed)`` per element."""
    seed &= MASK64
    seed_mixed = (seed ^ (_swap32(seed & MASK32) << 32)) & MASK64
    bitflip = ((_r64(KSECRET, 8) ^ _r64(KSECRET, 16)) - seed_mixed) & MASK64
    with np.errstate(over="ignore"):
        v = values.astype(np.uint64, copy=False)
        in1 = v & np.uint64(MASK32)          # first 4 LE bytes
        in2 = v >> np.uint64(32)             # last 4 LE bytes
        keyed = (in2 + (in1 << np.uint64(32))) ^ np.uint64(bitflip)
        # rrmxmx(keyed, 8)
        h = keyed
        h = h ^ (((h << np.uint64(49)) | (h >> np.uint64(15)))
                 ^ ((h << np.uint64(24)) | (h >> np.uint64(40))))
        h = h * np.uint64(PRIME_MX2)
        h = h ^ ((h >> np.uint64(35)) + np.uint64(8))
        h = h * np.uint64(PRIME_MX2)
        return h ^ (h >> np.uint64(28))
