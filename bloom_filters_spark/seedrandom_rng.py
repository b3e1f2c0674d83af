"""Pure-Python replica of the npm ``seedrandom`` v3 default PRNG
(David Bau's public ARC4-based generator).

The reference library draws all its runtime randomness from it: every
filter's ``nextInt32()`` / ``random()`` come from
``seedrandom(`${seed}`)`` (reference ``src/base-filter.ts:18,50-52``),
the XOR filter chains retry build seeds through it
(``src/bloom/xor-filter.ts:159-165``), and the cuckoo filter draws its
kick choices from it (``src/cuckoo/cuckoo-filter.ts:191-198``).
Replicating the stream makes those construction paths bit-parity with
the reference, not just functionally equivalent.

Algorithm (all public, from the seedrandom package):
* ``mixkey`` — smear the seed string's UTF-16 code units into a
  <=256-byte key (JS quirk replicated: the first write to a key slot
  XORs ToInt32(undefined*19) = 0 into the smear).
* ARC4 key schedule + RC4-drop[256] (the constructor discards one
  256-byte batch).
* ``int32()`` = next 4 bytes big-endian, ``| 0`` (signed).
* ``random()`` = the 64-bit-double construction: 6 bytes, then extend
  by one byte at a time until the mantissa tops 2^52, halve above
  2^53 — replicated in IEEE-754 double arithmetic so rounding matches
  JS exactly.

Verified against the package's published test vector:
``seedrandom('hello.')() === 0.9282578795792454``.

Only ASCII seeds occur in this engine (stringified integers), so
``ord`` == ``charCodeAt`` for every input we pass.
"""

from __future__ import annotations

_WIDTH = 256
_MASK = 255
_CHUNKS = 6
_SIGNIFICANCE = float(2 ** 52)
_OVERFLOW = float(2 ** 53)
_START_DENOM = float(_WIDTH ** _CHUNKS)


def _to_int32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def _mixkey(seed_str: str) -> list[int]:
    key: dict[int, int] = {}
    smear = 0
    for j, ch in enumerate(seed_str):
        prev = key.get(j & _MASK)
        # JS: smear ^= key[mask & j] * 19 — on a fresh slot the operand
        # is undefined*19 = NaN and ToInt32(NaN) = 0
        smear = _to_int32(smear ^ (0 if prev is None else prev * 19))
        key[j & _MASK] = (smear + ord(ch)) & _MASK
    return [key[i] for i in range(len(key))]


class SeedRandom:
    """One ``seedrandom(seed_str)`` instance: ``random()`` and
    ``int32()`` draw from the shared ARC4 stream in call order, exactly
    like the JS object's methods."""

    __slots__ = ("_s", "_i", "_j")

    def __init__(self, seed: str | int):
        key = _mixkey(str(seed))
        if not key:  # the empty key [] is treated as [0]
            key = [0]
        keylen = len(key)
        s = list(range(_WIDTH))
        j = 0
        for i in range(_WIDTH):
            t = s[i]
            j = (j + key[i % keylen] + t) & _MASK
            s[i] = s[j]
            s[j] = t
        self._s = s
        self._i = 0
        self._j = 0
        self._g(_WIDTH)  # RC4-drop[256]

    def _g(self, count: int) -> int:
        s = self._s
        i, j = self._i, self._j
        r = 0
        for _ in range(count):
            i = (i + 1) & _MASK
            t = s[i]
            j = (j + t) & _MASK
            s[i] = s[j]
            s[j] = t
            r = r * _WIDTH + s[(s[i] + s[j]) & _MASK]
        self._i, self._j = i, j
        return r

    def int32(self) -> int:
        return _to_int32(self._g(4))

    def random(self) -> float:
        n = float(self._g(_CHUNKS))
        d = _START_DENOM
        x = 0
        while n < _SIGNIFICANCE:
            n = (n + x) * _WIDTH
            d *= _WIDTH
            x = self._g(1)
        while n >= _OVERFLOW:
            n /= 2
            d /= 2
            x >>= 1
        return (n + x) / d

    def random_int(self, lo: int, hi: int) -> int:
        """``utils.randomInt(min, max, this.random)`` (utils.ts:34-46):
        uniform integer in [lo, hi] from one double draw."""
        import math

        lo = math.ceil(lo)
        hi = math.floor(hi)
        return math.floor(self.random() * (hi - lo + 1)) + lo
