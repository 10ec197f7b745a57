"""Minimal pure-numpy PNG codec (no PIL/torchvision in this image).

read_png: 8-bit RGB(A) decoder with all five scanline filters; write_png:
RGB encoder (filter 0). Used by the dataset readers, sample grids, the
SRFlow eval CLI and prepare_data.py.
"""
from __future__ import annotations

import numpy as np


def read_png(path):
    import struct
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype in (2, 6), "only 8-bit RGB(A) PNG"
            assert payload[12] == 0, "Adam7-interlaced PNG unsupported"
            ch = 3 if ctype == 2 else 4
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * ch
    img = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = np.frombuffer(raw[pos + 1 : pos + 1 + stride], np.uint8).astype(np.int32)
        pos += 1 + stride
        if ft == 0:
            out = row
        elif ft == 1:
            out = row.copy()
            for x in range(ch, stride):
                out[x] = (out[x] + out[x - ch]) & 0xFF
        elif ft == 2:
            out = (row + prev) & 0xFF
        elif ft == 3:
            out = row.copy()
            for x in range(stride):
                left = out[x - ch] if x >= ch else 0
                out[x] = (out[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:
            out = row.copy()
            for x in range(stride):
                a = out[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (out[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {ft}")
        img[y] = out.astype(np.uint8)
        prev = img[y].astype(np.int32)
    img = img.reshape(h, w, ch)
    return img[:, :, :3]


def write_png(path: str, img: np.ndarray):
    """Minimal PNG writer (no PIL in this environment)."""
    import struct
    import zlib

    h, w, c = img.shape
    assert c == 3
    raw = b"".join(b"\x00" + img[i].tobytes() for i in range(h))

    def chunk(tag, data):
        payload = tag + data
        return (struct.pack(">I", len(data)) + payload
                + struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF))

    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", header)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)
