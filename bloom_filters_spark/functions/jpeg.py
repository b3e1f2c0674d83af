"""Baseline JPEG (JFIF) codec — pure stdlib + numpy, from the public
ITU-T T.81 spec.

Scope (the dominant web-corpus envelope):

* **decode_jpeg** — baseline sequential DCT (SOF0), 8-bit, Huffman
  entropy coding, grayscale or YCbCr with any of the common sampling
  factors (4:4:4, 4:2:2, 4:2:0), restart markers (DRI/RSTn).
  Progressive (SOF2), arithmetic coding, and 12-bit precision raise
  ``NotImplementedError`` — they are rare in web corpora and a decoder
  that silently mis-renders them would be worse than an honest error.
* **encode_jpeg** — baseline encoder (grayscale or 4:4:4 YCbCr,
  Annex K example quantization + Huffman tables, quality scaling per
  the common IJG formula).  Used for fixtures and as a legitimate sink
  for small derived images.

Everything is deterministic: the same payload always decodes to the
same pixel array, so decoded features (channel means, phash) can be
pinned-fixture oracled.

Design note for the engine: JPEG decode is per-payload Python work
inside ``mapInPandas`` batches (functions/multimodal.py) — the
parallelism unit is the media row, which is exactly how a 100 TB media
column scales out.  The reference repo has no media path; this module
supports the training-data-pipeline surface (SURVEY.md LLM-ops table).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal 8x8 DCT-II basis: block = C.T @ coeffs @ C inverts it
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )

# Annex K.1 example quantization tables (luminance, chrominance)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 example Huffman tables: (bits[1..16], huffval)
HT_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _build_decode_table(bits, huffval):
    """(bits, huffval) → {(length, code): symbol} per T.81 C.2."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at (and reports) RST/other markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        if self.marker is not None:
            # past a marker: T.81 F.2.2.5 — pad with 1s (EOB behavior)
            self.bitbuf = (self.bitbuf << 8) | 0xFF
            self.nbits += 8
            return
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                self.marker = nxt
                self.pos += 1
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Restart boundary: drop pad bits, advance to and consume the
        RSTn marker (which may not have been buffered yet — the decoder
        stops on MCU count, not on seeing the marker)."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is None:
            while True:
                b = self.data[self.pos]
                self.pos += 1
                if b != 0xFF:
                    continue  # pad byte before the marker
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed 0xFF data byte
                    continue
                self.pos += 1
                break
        self.marker = None

    def decode_huff(self, table) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size``-bit magnitude to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w) or (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], ">u2").astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline(-ish) sequential
            precision, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF type 0x{marker:02x}")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                cnt = sum(bits)
                huffval = list(seg[p + 17:p + 17 + cnt])
                table = _build_decode_table(bits, huffval)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + cnt
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tds = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "td": tds >> 4, "ta": tds & 0xF})
            data_pos = pos + seg_len
            return _decode_scan(payload, data_pos, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += seg_len
    raise ValueError("JPEG without SOS scan")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component pixel planes at component resolution
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in scan
    ]
    reader = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align_to_marker()
                pred = [0] * len(scan)
            for ci, c in enumerate(scan):
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = reader.decode_huff(huff_dc[c["td"]])
                        diff = _extend(reader.receive(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(huff_ac[c["ta"]])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = (zz * q).astype(np.float64)
                        px = _C.T @ block.reshape(8, 8) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline, grayscale or 4:4:4)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s

    def restart_marker(self, n: int):
        """Flush to byte boundary and emit RSTn (markers are raw, never
        byte-stuffed)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (n % 8)])


def _build_encode_table(bits, huffval):
    """(bits, huffval) → {symbol: (code, length)}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size category, ``size``-bit magnitude code)."""
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, block, q, dc_tab, ac_tab, pred):
    coeffs = _C @ (block - 128.0) @ _C.T
    zz = np.round(coeffs.reshape(-1)[ZIGZAG] / q).astype(np.int32)
    diff = int(zz[0]) - pred
    size, mag = _magnitude(diff)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    if size:
        bw.write(mag, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, mag = _magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(mag, size)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w) or (h, w, 3) uint8 → baseline JFIF bytes.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2x2 box-
    averaged chroma — the dominant web-corpus shape).  A non-zero
    ``restart_interval`` emits DRI + RSTn markers every that many MCUs
    (the resumable-scan feature real encoders use for error resilience).
    """
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    imgf = img.astype(np.float64)
    if nc == 3:
        r, g, b = imgf[..., 0], imgf[..., 1], imgf[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    else:
        comps = [imgf[..., 0]]

    sub420 = nc == 3 and subsampling == "420"
    # sampling factors per component
    sampling = [(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * nc
    hmax = max(s[0] for s in sampling[:nc])
    vmax = max(s[1] for s in sampling[:nc])
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    # build per-component planes at component resolution, edge-padded to
    # whole MCUs
    planes = []
    for ci in range(nc):
        sh, sv = sampling[ci]
        plane = comps[ci]
        if sub420 and ci > 0:
            # 2x2 box-average chroma at even dims
            py = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
            plane = py.reshape(py.shape[0] // 2, 2,
                               py.shape[1] // 2, 2).mean(axis=(1, 3))
        th_, tw_ = mcus_y * sv * 8, mcus_x * sh * 8
        plane = np.pad(
            plane,
            ((0, th_ - plane.shape[0]), (0, tw_ - plane.shape[1])),
            mode="edge",
        )
        planes.append(plane)

    qts = [_scale_qt(QT_LUM, quality), _scale_qt(QT_CHROM, quality)]
    dc_tabs = [_build_encode_table(*HT_DC_LUM), _build_encode_table(*HT_DC_CHROM)]
    ac_tabs = [_build_encode_table(*HT_AC_LUM), _build_encode_table(*HT_AC_CHROM)]

    out = bytearray(b"\xff\xd8")  # SOI
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for tq in range(2 if nc == 3 else 1):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(v) for v in qts[tq])
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        tq = 0 if i == 0 else 1
        sh, sv = sampling[i]
        sof += bytes([i + 1, (sh << 4) | sv, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for tc, tables in ((0, (HT_DC_LUM, HT_DC_CHROM)), (1, (HT_AC_LUM, HT_AC_CHROM))):
        for th in range(2 if nc == 3 else 1):
            bits, huffval = tables[th]
            seg = bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval)
            out += b"\xff\xc4" + struct.pack(">H", len(seg) + 2) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    preds = [0] * nc
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.restart_marker(rst_n)
                rst_n += 1
                preds = [0] * nc
            for ci in range(nc):
                t = 0 if ci == 0 else 1
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        preds[ci] = _encode_block(
                            bw, planes[ci][y0:y0 + 8, x0:x0 + 8], qts[t],
                            dc_tabs[t], ac_tabs[t], preds[ci],
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
