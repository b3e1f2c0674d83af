// Differential-test harness for bloom_filters_spark/seedrandom_rng.py:
// the default algorithm of the npm `seedrandom` package (David Bau,
// MIT license, https://github.com/davidbau/seedrandom), restated here
// so Node's native JS semantics (ToInt32 coercions of undefined/NaN,
// IEEE-754 double arithmetic) exercise the exact operations the Python
// port emulates.  Test fixture only — not part of the engine.
//
// Usage: node seedrandom_check.js '<json list of seed strings>'
// Prints {seed: {int32: [...x8], random: [...x8]}} per seed (separate
// generator instances for the two streams, like the pytest side).
"use strict";

const width = 256,
  chunks = 6,
  digits = 52,
  startdenom = Math.pow(width, chunks),
  significance = Math.pow(2, digits),
  overflow = significance * 2,
  mask = width - 1;

function ARC4(key) {
  let t,
    keylen = key.length;
  const me = this,
    s = (me.S = []);
  let i = 0,
    j = (me.i = me.j = 0);
  if (!keylen) {
    key = [keylen++];
  }
  while (i < width) {
    s[i] = i++;
  }
  for (i = 0; i < width; i++) {
    s[i] = s[(j = mask & (j + key[i % keylen] + (t = s[i])))];
    s[j] = t;
  }
  (me.g = function (count) {
    let t,
      r = 0,
      i = me.i,
      j = me.j;
    const s = me.S;
    while (count--) {
      t = s[(i = mask & (i + 1))];
      r = r * width + s[mask & ((s[i] = s[(j = mask & (j + t))]) + (s[j] = t))];
    }
    me.i = i;
    me.j = j;
    return r;
  })(width);
}

function mixkey(seed, key) {
  const stringseed = seed + "";
  let smear,
    j = 0;
  while (j < stringseed.length) {
    key[mask & j] =
      mask & ((smear ^= key[mask & j] * 19) + stringseed.charCodeAt(j++));
  }
  return key;
}

function makePrng(seedStr) {
  const key = [];
  mixkey(seedStr, key);
  const arc4 = new ARC4(key);
  const prng = function () {
    let n = arc4.g(chunks),
      d = startdenom,
      x = 0;
    while (n < significance) {
      n = (n + x) * width;
      d *= width;
      x = arc4.g(1);
    }
    while (n >= overflow) {
      n /= 2;
      d /= 2;
      x >>>= 1;
    }
    return (n + x) / d;
  };
  prng.int32 = function () {
    return arc4.g(4) | 0;
  };
  return prng;
}

const seeds = JSON.parse(process.argv[2]);
const out = {};
for (const seed of seeds) {
  const a = makePrng(seed),
    b = makePrng(seed);
  out[seed] = {
    int32: Array.from({ length: 8 }, () => a.int32()),
    random: Array.from({ length: 8 }, () => b()),
  };
}
process.stdout.write(JSON.stringify(out));
