"""Motion-JPEG-in-AVI container codec — pure stdlib RIFF chunk walk.

Closes the engine's video seam without ffmpeg: an MJPEG AVI is just a
RIFF container whose frame chunks are ordinary JPEG streams, which
``functions/jpeg.py`` already decodes from first principles.  The
container layout implemented here is the public AVI 1.0 RIFF form
(Microsoft "AVI RIFF File Reference"): ``RIFF('AVI ')`` holding a
``LIST('hdrl')`` (``avih`` main header + one ``LIST('strl')`` with
``strh``/``strf``), a ``LIST('movi')`` of ``00dc`` frame chunks, and an
``idx1`` index.

Honest-error policy (matches the image/audio decoders): anything that
is not a RIFF/AVI raises ``ValueError``; an AVI whose video stream is
not MJPG-compressed raises ``NotImplementedError`` (we only ship a
JPEG codec) — never a silently wrong decode.

The encoder exists for fixtures/tests; real crawled AVIs from other
muxers parse through the same walk (chunk padding, ``rec `` grouping
LISTs, and ``00db`` uncompressed-named chunks are all handled).
"""

from __future__ import annotations

import struct

import numpy as np

from bloom_filters_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd-sized bodies get a pad byte
    # that is NOT counted in the size field
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 92,
                     subsampling: str = "420") -> bytes:
    """Mux ``frames`` (uint8 arrays, all the same shape, gray or RGB)
    into an MJPEG AVI at ``fps``; each frame is one baseline JPEG from
    the in-repo encoder."""
    frames = list(frames)
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one width/height")
    payloads = [
        encode_jpeg(
            f, quality=quality,
            subsampling=subsampling if f.ndim == 3 else "444",
        )
        for f in frames
    ]
    n = len(payloads)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,              # dwMicroSecPerFrame
        sum(map(len, payloads)) * fps // max(n, 1),  # dwMaxBytesPerSec
        0,                             # dwPaddingGranularity
        0x10,                          # dwFlags: AVIF_HASINDEX
        n,                             # dwTotalFrames
        0,                             # dwInitialFrames
        1,                             # dwStreams
        max(map(len, payloads)),       # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,                    # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG",
        0, 0, 0,                       # flags, priority+language, initial
        0,                             # dwInitialFrames
        1, fps,                        # dwScale / dwRate -> fps
        0, n,                          # dwStart, dwLength (frames)
        max(map(len, payloads)),       # dwSuggestedBufferSize
        0xFFFFFFFF & -1, 0,            # dwQuality (-1 default), sampleSize
        0, 0, w, h,                    # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG",
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = [_chunk(b"00dc", p) for p in payloads]
    movi = _list(b"movi", b"".join(movi_chunks))
    # idx1 offsets are relative to the start of the movi list's type
    # fourcc (offset 4 within the LIST body convention: first chunk at 4)
    idx_entries, off = [], 4
    for p in payloads:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(p)))
        off += 8 + len(p) + (len(p) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each chunk in
    buf[pos:end], honoring word alignment."""
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body = pos + 8
        if body + size > end:
            raise ValueError("truncated AVI chunk")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def decode_avi_mjpeg(payload: bytes):
    """Parse an MJPEG AVI: returns ``(meta, frames)`` where ``meta`` has
    ``fps`` (float), ``n_frames``, ``width``, ``height`` and ``frames``
    is the list of per-frame JPEG byte strings (undecoded — callers
    pick which to decode)."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF payload")
    if payload[8:12] != b"AVI ":
        raise ValueError("RIFF payload is not an AVI")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(8 + riff_size, len(payload))

    meta = {"fps": 0.0, "n_frames": 0, "width": 0, "height": 0}
    # frames keyed by their 2-digit stream id: stream numbers follow
    # strl order in hdrl, so a muxer that lists audio first stores
    # video as "01dc" — collect all, then keep the vids stream's
    all_frames: dict[bytes, list[bytes]] = {}
    saw_vids_mjpg = False
    vids_stream_id = b"00"
    strl_count = 0

    def parse_strl(body, size):
        nonlocal saw_vids_mjpg, vids_stream_id, strl_count
        stream_id = b"%02d" % strl_count
        strl_count += 1
        is_vids = False
        for cc, b, s in _walk_chunks(payload, body, body + size):
            if cc == b"strh" and s >= 48:
                fcc_type, handler = payload[b:b + 4], payload[b + 4:b + 8]
                if fcc_type != b"vids":
                    continue
                is_vids = True
                scale, rate = struct.unpack("<II", payload[b + 20:b + 28])
                (length,) = struct.unpack("<I", payload[b + 32:b + 36])
                meta["fps"] = rate / scale if scale else 0.0
                meta["n_frames"] = length
                if handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00"):
                    raise NotImplementedError(
                        f"AVI video handler {handler!r} is not MJPG"
                    )
            elif cc == b"strf" and is_vids and s >= 40:
                _, w, h = struct.unpack("<Iii", payload[b:b + 12])
                comp = payload[b + 16:b + 20]
                meta["width"], meta["height"] = w, abs(h)
                if comp not in (b"MJPG", b"mjpg"):
                    raise NotImplementedError(
                        f"AVI video compression {comp!r} is not MJPG"
                    )
                saw_vids_mjpg = True
                vids_stream_id = stream_id

    def parse_movi(body, size):
        for cc, b, s in _walk_chunks(payload, body, body + size):
            if cc == b"LIST" and payload[b:b + 4] == b"rec ":
                parse_movi(b + 4, s - 4)
            elif cc[2:] in (b"dc", b"db") and cc[:2].isdigit():
                all_frames.setdefault(cc[:2], []).append(payload[b:b + s])

    for cc, b, s in _walk_chunks(payload, 12, end):
        if cc != b"LIST":
            continue
        ltype = payload[b:b + 4]
        if ltype == b"hdrl":
            for cc2, b2, s2 in _walk_chunks(payload, b + 4, b + s):
                if cc2 == b"LIST" and payload[b2:b2 + 4] == b"strl":
                    parse_strl(b2 + 4, s2 - 4)
        elif ltype == b"movi":
            parse_movi(b + 4, s - 4)

    if not saw_vids_mjpg:
        raise ValueError("AVI has no MJPG video stream")
    frames = all_frames.get(vids_stream_id, [])
    if not frames:
        raise ValueError("AVI movi list has no video frames")
    if not meta["n_frames"]:
        meta["n_frames"] = len(frames)
    return meta, frames


def decode_avi_frame(jpeg_bytes: bytes) -> np.ndarray:
    """Decode one frame chunk (a plain JPEG stream) to pixels."""
    return decode_jpeg(jpeg_bytes)
