"""Baseline JPEG (JFIF) codec — pure stdlib + numpy, from the public
ITU-T T.81 spec.

Scope (the dominant web-corpus envelope):

* **decode_jpeg** — baseline sequential DCT (SOF0/1) AND progressive
  DCT (SOF2, T.81 Annex G: spectral selection, successive
  approximation, EOB runs, per-scan table redefinition), 8-bit,
  Huffman entropy coding, grayscale or YCbCr with any of the common
  sampling factors (4:4:4, 4:2:2, 4:2:0), restart markers (DRI/RSTn).
  Together these cover ~99% of web-corpus JPEGs; arithmetic coding,
  hierarchical, lossless, and 12-bit precision raise
  ``NotImplementedError`` — genuinely rare, and a decoder that
  silently mis-renders them would be worse than an honest error.
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
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
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
    """JPEG bytes → (h, w) or (h, w, 3) uint8 RGB array.

    Baseline sequential (SOF0/1) decodes scan-at-once; progressive
    (SOF2) accumulates DCT coefficients across every scan — spectral
    selection bands, successive-approximation first/refinement passes,
    EOB runs, per-scan table redefinition, restart markers — then
    dequantizes + IDCTs once at the end (T.81 Annex G)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    prog = None  # progressive coefficient state, created at first SOS
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
        # the marker id — skip them so externally-encoded payloads
        # with fill padding parse (our encoder never emits any).
        while payload[pos + 1] == 0xFF:
            pos += 1
            if pos + 1 >= n:
                raise ValueError("truncated JPEG (fill bytes to EOF)")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > n:
            # fill-byte skipping may leave fewer than the 2 length
            # bytes the loop guard otherwise guarantees
            raise ValueError("truncated JPEG segment")
        seg_len = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            precision, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
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
                ci, comp = next(
                    (j, c) for j, c in enumerate(frame["comps"])
                    if c["id"] == cs
                )
                scan.append({**comp, "ci": ci, "td": tds >> 4,
                             "ta": tds & 0xF})
            data_pos = pos + seg_len
            if not frame["progressive"]:
                return _decode_scan(payload, data_pos, frame, scan, qt,
                                    huff_dc, huff_ac, restart_interval)
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            if prog is None:
                prog = _init_progressive(frame)
            reader = _decode_progressive_scan(
                payload, data_pos, frame, prog, scan, ss, se,
                a >> 4, a & 0xF, huff_dc, huff_ac, restart_interval,
            )
            pos = _resync_to_marker(reader)
            continue  # pos already points at the next 0xFF marker
        pos += seg_len
    if prog is not None:
        return _reconstruct_progressive(frame, prog, qt)
    raise ValueError("JPEG without SOS scan")


def _resync_to_marker(reader: "_BitReader") -> int:
    """After a progressive scan's entropy data: return the byte offset
    of the next real marker's 0xFF (skipping stuffed bytes and stray
    RSTn) so the marker loop can resume.  If the reader already
    swallowed the terminating marker during its final fill, rewind to
    its own two bytes."""
    if reader.marker is not None and not (0xD0 <= reader.marker <= 0xD7):
        return reader.pos - 2
    data, p = reader.data, reader.pos
    while True:
        if p + 1 >= len(data):
            raise ValueError("truncated JPEG: no marker after scan data")
        if data[p] != 0xFF:
            p += 1
            continue
        nxt = data[p + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            p += 2
            continue
        return p


def _init_progressive(frame) -> dict:
    """Per-component coefficient planes (zigzag order, MCU-padded) plus
    frame geometry shared by every scan."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    coefs, bw, bh = [], [], []
    for c in comps:
        # true (unpadded) block dims for non-interleaved scans
        cw = -(-frame["w"] * c["h"] // hmax)
        ch = -(-frame["h"] * c["v"] // vmax)
        bw.append(-(-cw // 8))
        bh.append(-(-ch // 8))
        coefs.append(
            np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        )
    return {"coefs": coefs, "bw": bw, "bh": bh, "hmax": hmax,
            "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y}


def _dc_first(reader, cf, table, al, pred):
    t = reader.decode_huff(table)
    diff = _extend(reader.receive(t), t)
    pred += diff
    cf[0] = pred << al
    return pred


def _ac_first(reader, cf, table, ss, se, al, eobrun):
    """Spectral-selection first pass over one block's band (T.81
    G.1.2.2): returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            return eobrun
        k += r
        if k > 63:
            raise ValueError("JPEG AC index overflow")
        cf[k] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _ac_refine(reader, cf, table, ss, se, al, eobrun):
    """Successive-approximation refinement of one block's band (T.81
    G.1.2.3): newly-nonzero coefficients arrive as ±1<<Al; every
    already-nonzero coefficient traversed spends one correction bit."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k):
        v = cf[k]
        if reader.read_bit() and (v & p1) == 0:
            cf[k] = v + (p1 if v >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(table)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:
                    # NB: counts the CURRENT block too (its correction
                    # tail runs below, then the decrement) — unlike
                    # _ac_first, whose early return ends the block
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement size != 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if cf[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                cf[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if cf[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(data, pos, frame, prog, scan, ss, se, ah, al,
                             huff_dc, huff_ac, restart_interval):
    """Decode one progressive scan into prog['coefs']; returns the bit
    reader (its position feeds _resync_to_marker)."""
    # T.81 Table B.3 scan-header bounds: a DC scan is Ss=Se=0, an AC
    # scan is 1<=Ss<=Se<=63; successive-approximation refinements must
    # step one bit (Ah == Al+1) with Al within the 8-bit-sample range.
    # Reject violations instead of mis-decoding (honest-error policy).
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan requires Se == 0")
    elif not ss <= se <= 63:
        raise ValueError("progressive AC scan requires Ss <= Se <= 63")
    if not 0 <= al <= 13:
        raise ValueError("progressive scan Al out of range")
    if ah != 0 and ah != al + 1:
        raise ValueError("successive approximation requires Ah == Al+1")
    reader = _BitReader(data, pos)
    coefs = prog["coefs"]
    eobrun = 0
    preds = [0] * len(scan)
    unit = 0  # restart counter: MCUs (interleaved) or blocks (single)

    def restart_if_due():
        nonlocal eobrun, preds
        if restart_interval and unit and unit % restart_interval == 0:
            reader.align_to_marker()
            preds = [0] * len(scan)
            eobrun = 0

    if len(scan) == 1:
        c = scan[0]
        ci = c["ci"]
        for by in range(prog["bh"][ci]):
            for bx in range(prog["bw"][ci]):
                restart_if_due()
                cf = coefs[ci][by, bx]
                if ss == 0:
                    if ah == 0:
                        preds[0] = _dc_first(
                            reader, cf, huff_dc[c["td"]], al, preds[0]
                        )
                    elif reader.read_bit():
                        cf[0] |= 1 << al
                elif ah == 0:
                    eobrun = _ac_first(
                        reader, cf, huff_ac[c["ta"]], ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine(
                        reader, cf, huff_ac[c["ta"]], ss, se, al, eobrun
                    )
                unit += 1
        return reader

    if ss != 0:
        raise ValueError("progressive AC scan must be single-component")
    for my in range(prog["mcus_y"]):
        for mx in range(prog["mcus_x"]):
            restart_if_due()
            for si, c in enumerate(scan):
                ci = c["ci"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        cf = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                        if ah == 0:
                            preds[si] = _dc_first(
                                reader, cf, huff_dc[c["td"]], al, preds[si]
                            )
                        elif reader.read_bit():
                            cf[0] |= 1 << al
            unit += 1
    return reader


def _idct_plane(zz_blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(by, bx, 64) zigzag coefficients × quant table → pixel plane,
    one vectorized einsum IDCT over every block at once."""
    deq = zz_blocks.astype(np.float64) * q[None, None, :].astype(np.float64)
    nat = np.zeros_like(deq)
    nat[..., ZIGZAG] = deq
    b = nat.reshape(*nat.shape[:2], 8, 8)
    px = np.einsum("ij,yxjk,kl->yxil", _C.T, b, _C) + 128.0
    by, bx = px.shape[:2]
    return px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)


def _finish_planes(full: list, h: int, w: int) -> np.ndarray:
    """Cropped full-resolution planes → uint8 grayscale or RGB."""
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _reconstruct_progressive(frame, prog, qt) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    full = []
    for ci, c in enumerate(frame["comps"]):
        plane = _idct_plane(prog["coefs"][ci], qt[c["tq"]])
        ry = prog["vmax"] // c["v"]
        rx = prog["hmax"] // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    return _finish_planes(full, h, w)


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    """Sequential (SOF0/1) scan: entropy-decode every block's zigzag
    coefficients, then hand off to the SAME vectorized IDCT +
    reconstruct path the progressive decoder uses — so a baseline and
    a progressive stream carrying identical coefficients decode to
    bit-identical pixels (no per-path float summation-order drift)."""
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    coefs = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
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
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
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
            mcu_count += 1
    geom = {"coefs": coefs, "hmax": hmax, "vmax": vmax}
    return _reconstruct_progressive(
        {"h": frame["h"], "w": frame["w"], "comps": scan}, geom, qt
    )


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


def _encode_block(bw, zz, dc_tab, ac_tab, pred):
    """Entropy-code one block's pre-quantized zigzag coefficients.
    The DCT+quant lives in `_plane_coeffs` (shared with the
    progressive encoder) so both stream kinds carry bit-identical
    coefficients for the same pixels."""
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


def _prepare_planes(img: np.ndarray, subsampling: str):
    """Shared encoder front half: color transform, chroma subsampling,
    MCU edge-padding.  Returns (planes, sampling, nc, h, w, mcus_x,
    mcus_y) — the baseline and progressive encoders must produce
    IDENTICAL quantized coefficients from identical pixels, so this
    lives in exactly one place."""
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
    return planes, sampling, nc, h, w, mcus_x, mcus_y


def _write_headers(nc, h, w, sampling, qts, sof_marker: int,
                   restart_interval: int) -> bytearray:
    """SOI through DHT/DRI (everything before the first SOS), shared by
    the baseline (SOF0) and progressive (SOF2) encoders."""
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
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", len(sof) + 2) + sof
    for tc, tables in ((0, (HT_DC_LUM, HT_DC_CHROM)), (1, (HT_AC_LUM, HT_AC_CHROM))):
        for th in range(2 if nc == 3 else 1):
            bits, huffval = tables[th]
            seg = bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval)
            out += b"\xff\xc4" + struct.pack(">H", len(seg) + 2) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    return out


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w) or (h, w, 3) uint8 → baseline JFIF bytes.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2x2 box-
    averaged chroma — the dominant web-corpus shape).  A non-zero
    ``restart_interval`` emits DRI + RSTn markers every that many MCUs
    (the resumable-scan feature real encoders use for error resilience).
    """
    planes, sampling, nc, h, w, mcus_x, mcus_y = _prepare_planes(
        img, subsampling
    )
    qts = [_scale_qt(QT_LUM, quality), _scale_qt(QT_CHROM, quality)]
    dc_tabs = [_build_encode_table(*HT_DC_LUM), _build_encode_table(*HT_DC_CHROM)]
    ac_tabs = [_build_encode_table(*HT_AC_LUM), _build_encode_table(*HT_AC_CHROM)]

    out = _write_headers(nc, h, w, sampling, qts, 0xC0, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    coefs = [
        _plane_coeffs(planes[ci], qts[0 if ci == 0 else 1])
        for ci in range(nc)
    ]
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
                        preds[ci] = _encode_block(
                            bw, coefs[ci][my * sv + by, mx * sh + bx],
                            dc_tabs[t], ac_tabs[t], preds[ci],
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (spectral selection + successive approximation)
# ---------------------------------------------------------------------------

# Annex K's example AC tables have no codes for the EOBn (n>1) run
# symbols progressive scans emit (0x10, 0x20, ... row 0 sizes 0), so the
# progressive encoder ships its own flat canonical AC table: all 256
# symbols, 255 at 9 bits + one at 10 (Kraft 255/512 + 1/1024 < 1, and
# the all-ones code is never assigned).  Bigger than an optimized
# table, but valid for any decoder and trivially correct.
HT_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def _plane_coeffs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """MCU-padded pixel plane → (by, bx, 64) quantized zigzag
    coefficients — the vectorized twin of the baseline `_encode_block`
    DCT+quant (same formula, same np.round), so a progressive stream
    built from these decodes to EXACTLY the baseline encoder's pixels."""
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    b = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coeffs = np.einsum("ij,yxjk,kl->yxil", _C, b - 128.0, _C.T)
    zz = coeffs.reshape(by, bx, 64)[..., ZIGZAG]
    return np.round(zz / q[None, None, :]).astype(np.int32)


def _flush_eobrun(bw: "_BitWriter", ac_tab, state: dict):
    """Emit the pending EOBn symbol (+ its extension bits) and every
    correction bit buffered behind it (T.81 G.1.2.2-3 emit order)."""
    if state["eobrun"] > 0:
        n = state["eobrun"]
        r = n.bit_length() - 1
        code, ln = ac_tab[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(n - (1 << r), r)
        state["eobrun"] = 0
        for b in state["be"]:
            bw.write(b, 1)
        state["be"] = []


def _enc_ac_first(bw, zz, ac_tab, ss, se, al, state):
    """AC spectral-selection first pass for one block's band."""
    r = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        temp = (t if t >= 0 else -t) >> al
        if temp == 0:
            r += 1
            continue
        _flush_eobrun(bw, ac_tab, state)
        while r > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            r -= 16
        size, mag = _magnitude(temp if t >= 0 else -temp)
        code, ln = ac_tab[(r << 4) | size]
        bw.write(code, ln)
        bw.write(mag, size)
        r = 0
    if r > 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, ac_tab, state)


def _enc_ac_refine(bw, zz, ac_tab, ss, se, al, state):
    """AC successive-approximation refinement for one block's band:
    newly-nonzero coefficients emit (run, 1) + sign; already-nonzero
    ones buffer one correction bit each, flushed after the next symbol
    (or carried into the EOB-run buffer)."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # band-relative index AFTER the last newly-nonzero coeff
    for i, a in enumerate(absv):
        if a == 1:
            eob = i + 1
    r = 0
    br: list = []
    for i, temp in enumerate(absv):
        if temp == 0:
            r += 1
            continue
        while r > 15 and i < eob:
            _flush_eobrun(bw, ac_tab, state)
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        if temp > 1:
            br.append(temp & 1)
            continue
        _flush_eobrun(bw, ac_tab, state)
        code, ln = ac_tab[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
        for b in br:
            bw.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        state["eobrun"] += 1
        state["be"].extend(br)
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, ac_tab, state)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            subsampling: str = "444") -> bytes:
    """(h, w) or (h, w, 3) uint8 → progressive (SOF2) JFIF bytes.

    Standard 6/10-scan script: interleaved DC first pass (Al=1), per-
    component AC bands 1-5 then 6-63 (Al=2), per-component AC
    refinement to Al=1, interleaved DC refinement to Al=0, and a final
    per-component AC refinement to Al=0 — exercising spectral
    selection, successive approximation, and EOB runs.  The quantized
    coefficients are bit-identical to `encode_jpeg`'s at the same
    (quality, subsampling), so progressive and baseline streams of the
    same image decode to the SAME pixel array.
    """
    planes, sampling, nc, h, w, mcus_x, mcus_y = _prepare_planes(
        img, subsampling
    )
    qts = [_scale_qt(QT_LUM, quality), _scale_qt(QT_CHROM, quality)]
    dc_tabs = [_build_encode_table(*HT_DC_LUM),
               _build_encode_table(*HT_DC_CHROM)]
    ac_prog_tab = _build_encode_table(*HT_AC_PROG)
    hmax = max(s[0] for s in sampling[:nc])
    vmax = max(s[1] for s in sampling[:nc])
    coefs = [
        _plane_coeffs(planes[ci], qts[0 if ci == 0 else 1])
        for ci in range(nc)
    ]
    # true (unpadded) per-component block dims for non-interleaved scans
    true_bw, true_bh = [], []
    for ci in range(nc):
        cw = -(-w * sampling[ci][0] // hmax)
        ch = -(-h * sampling[ci][1] // vmax)
        true_bw.append(-(-cw // 8))
        true_bh.append(-(-ch // 8))

    out = _write_headers(nc, h, w, sampling, qts, 0xC2, 0)
    # override AC table 0 with the progressive flat table (every AC
    # scan below references Ta=0, whichever component it carries)
    prog_dht = bytes([0x10]) + bytes(HT_AC_PROG[0]) + bytes(HT_AC_PROG[1])
    out += b"\xff\xc4" + struct.pack(">H", len(prog_dht) + 2) + prog_dht

    def sos_header(comp_ids, ss, se, ah, al):
        seg = bytes([len(comp_ids)])
        for ci in comp_ids:
            t = 0 if ci == 0 else 1
            tds = (t << 4) if ss == 0 else 0  # Td for DC scans; Ta=0 AC
            seg += bytes([ci + 1, tds])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(seg) + 2) + seg

    def dc_scan(ah, al):
        nonlocal out
        out += sos_header(list(range(nc)), 0, 0, ah, al)
        bw = _BitWriter()
        preds = [0] * nc
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(nc):
                    sh, sv = sampling[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            v = int(coefs[ci][my * sv + by, mx * sh + bx, 0])
                            t = v >> al  # arithmetic shift (T.81 G.1.2.1)
                            if ah == 0:
                                diff = t - preds[ci]
                                preds[ci] = t
                                size, mag = _magnitude(diff)
                                code, ln = dc_tabs[0 if ci == 0 else 1][size]
                                bw.write(code, ln)
                                if size:
                                    bw.write(mag, size)
                            else:
                                bw.write(t & 1, 1)
        bw.flush()
        out += bw.out

    def ac_scan(ci, ss, se, ah, al):
        nonlocal out
        out += sos_header([ci], ss, se, ah, al)
        bw = _BitWriter()
        state = {"eobrun": 0, "be": []}
        tab = ac_prog_tab
        enc = _enc_ac_first if ah == 0 else _enc_ac_refine
        for by in range(true_bh[ci]):
            for bx in range(true_bw[ci]):
                enc(bw, coefs[ci][by, bx], tab, ss, se, al, state)
        _flush_eobrun(bw, tab, state)
        bw.flush()
        out += bw.out

    dc_scan(0, 1)                       # DC first, Al=1
    for ci in range(nc):
        ac_scan(ci, 1, 5, 0, 2)         # low AC band, first, Al=2
    for ci in range(nc):
        ac_scan(ci, 6, 63, 0, 2)        # high AC band, first, Al=2
    for ci in range(nc):
        ac_scan(ci, 1, 63, 2, 1)        # AC refinement to Al=1
    dc_scan(1, 0)                       # DC refinement to Al=0
    for ci in range(nc):
        ac_scan(ci, 1, 63, 1, 0)        # AC refinement to Al=0
    out += b"\xff\xd9"                  # EOI
    return bytes(out)
