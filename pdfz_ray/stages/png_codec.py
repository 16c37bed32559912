"""Minimal pure-Python PNG codec (stdlib zlib + numpy).

Exists so the real-decode hook (``media.decode_real_to_png``) has an
executable branch in containers without PIL: the reference's image save
path (extractor/src/engine/mod.rs:142-162) decodes a compressed payload,
converts to RGBA and re-encodes — PNG is the one format fully decodable
with the standard library.

Scope: 8-bit-depth, non-interlaced PNGs; color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA); all five scanline filters. That covers
everything the reference pipeline itself would emit. Anything else raises
``ValueError`` — which the decode stages count as a per-element failure,
mirroring the reference's error path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

# samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _MAGIC


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND")


def _unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Undo per-scanline filtering (PNG spec §6). ``raw`` is the
    decompressed stream: h rows of (1 filter byte + w*ch sample bytes)."""
    stride = w * ch
    raw = raw.reshape(h, stride + 1)
    ftypes = raw[:, 0]
    data = raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        line = data[y].copy()
        ft = int(ftypes[y])
        if ft == 0:  # None
            pass
        elif ft == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ft == 2:  # Up
            line = (line + prev) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb_ and pa_ <= pc_:
                    pred = a
                elif pb_ <= pc_:
                    pred = b
                else:
                    pred = c
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = line
        prev = line
    return out.astype(np.uint8).reshape(h, w, ch)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 4) uint8 RGBA array."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    w = h = None
    ctype_code = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            w, h, depth, ctype_code, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if ctype_code not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype_code}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.extend(body)
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = _CHANNELS[ctype_code]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if len(raw) != h * (w * ch + 1):
        raise ValueError("PNG pixel data size mismatch")
    px = _unfilter(raw, h, w, ch)
    # normalize to RGBA (the reference converts every decode to RGBA)
    if ctype_code == 6:
        return px
    out = np.empty((h, w, 4), np.uint8)
    if ctype_code == 2:
        out[:, :, :3] = px
        out[:, :, 3] = 255
    elif ctype_code == 0:
        out[:, :, :3] = px
        out[:, :, 3] = 255
    else:  # gray + alpha
        out[:, :, :3] = px[:, :, :1]
        out[:, :, 3] = px[:, :, 1]
    return out


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(rgba: np.ndarray) -> bytes:
    """(h, w, 4) uint8 RGBA array → PNG bytes (filter 0, one IDAT)."""
    if rgba.ndim != 3 or rgba.shape[2] != 4 or rgba.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 4) uint8")
    h, w = rgba.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    scan = np.zeros((h, w * 4 + 1), np.uint8)
    scan[:, 1:] = rgba.reshape(h, w * 4)
    idat = zlib.compress(scan.tobytes(), 6)
    return _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")
