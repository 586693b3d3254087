"""Pure-Python PNG codec (8-bit grayscale) — the FOURTH real image
codec lane, closing the repo's last PIL-gated format (SCALE.md's
deferral note; the JPEG lane in operators/jpeg.py closed the
entropy-coded half in round 9's first wave).

Why this is feasible without PIL: PNG's only compression is DEFLATE,
and ``zlib`` is in the standard library — the gate was never about the
bitstream. What a real decoder still has to get right, and what this
one implements end to end:

- the 8-byte signature and the length/type/data/CRC chunk framing,
  with ``zlib.crc32`` verified over type+data of EVERY chunk;
- IHDR parsing (big-endian geometry, bit depth / color type / interlace
  validation — only 8-bit grayscale, non-interlaced is in scope);
- IDAT reassembly: the DEFLATE stream is the CONCATENATION of all IDAT
  chunk payloads (real encoders split it; ours does too);
- all five scanline filters (None/Sub/Up/Average/Paeth, incl. the
  Paeth predictor's exact tie-breaking order per the spec) — the
  encoder picks a filter per row, so a decoder that botches any of the
  five fails the lossless round-trip.

Scope note (documented, not hidden): 8-bit grayscale covers the repo's
synthesized-lane contract (like jpeg.py's baseline-grayscale scope);
palette/RGBA/16-bit/interlace would be more of the same unfiltering
over wider pixels.

Reference basis: the PNG specification (RFC 2083 / W3C PNG), public
knowledge. No reference-repo analog (the reference has no binary
codecs; its closest surface is the DOT/PNG result sink S6,
/root/reference/Code/mapReduce.erl:133-138, which shells out to
Graphviz for the encode).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor, spec tie-break order (left, above, upper-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytes, prev: bytes) -> bytes:
    """Apply scanline filter ``ftype`` to a raw row (bpp=1, grayscale)."""
    if ftype == 0:
        return bytes(row)
    out = bytearray(len(row))
    for x, v in enumerate(row):
        a = row[x - 1] if x > 0 else 0
        b = prev[x]
        c = prev[x - 1] if x > 0 else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[x] = (v - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, row: bytearray, prev: bytes) -> None:
    """Invert scanline filter ``ftype`` in place (bpp=1, grayscale)."""
    if ftype == 0:
        return
    for x in range(len(row)):
        a = row[x - 1] if x > 0 else 0
        b = prev[x]
        c = prev[x - 1] if x > 0 else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"bad filter type {ftype}")
        row[x] = (row[x] + pred) & 0xFF


_IDAT_SPLIT = 64  # bytes per IDAT chunk — forces multi-IDAT reassembly


def encode_gray(pixels: list[list[int]]) -> bytes:
    """Encode an 8-bit grayscale image (list of rows) to PNG bytes.

    Each row's filter type cycles 0..4 (row index mod 5) and the filter
    MATH is really applied — so a decoder only passes the round-trip if
    all five unfilters are correct. The DEFLATE stream is split across
    multiple IDAT chunks like real encoders do.
    """
    h = len(pixels)
    if h == 0 or len(pixels[0]) == 0:
        raise ValueError("empty image")
    w = len(pixels[0])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, no interlace
    raw = bytearray()
    prev = bytes(w)
    for y, prow in enumerate(pixels):
        if len(prow) != w:
            raise ValueError("ragged image")
        row = bytes(prow)
        ftype = y % 5
        raw.append(ftype)
        raw += _filter_row(ftype, row, prev)
        prev = row
    z = zlib.compress(bytes(raw), 6)
    idats = b"".join(
        _chunk(b"IDAT", z[i : i + _IDAT_SPLIT])
        for i in range(0, len(z), _IDAT_SPLIT)
    )
    return _SIG + _chunk(b"IHDR", ihdr) + idats + _chunk(b"IEND", b"")


def decode_gray(payload: bytes) -> dict:
    """Decode an 8-bit grayscale, non-interlaced PNG.

    Returns ``{"width", "height", "pixels"}`` (pixels = list of rows).
    Verifies the signature, every chunk CRC, IHDR validity, and the
    exact decompressed length; raises ``ValueError`` on any corruption.
    """
    if payload[:8] != _SIG:
        raise ValueError("bad PNG signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    ended = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError("truncated chunk")
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant (only 8-bit grayscale, "
                    "non-interlaced)"
                )
            # Spec-invalid degenerate geometry: the h*(w+1) raw-length
            # check below passes vacuously for 0-area images, so reject
            # here (PNG requires width and height >= 1).
            if w == 0 or h == 0:
                raise ValueError("invalid IHDR geometry (zero dimension)")
            ihdr = (w, h)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not ended:
        raise ValueError("missing IHDR or IEND")
    w, h = ihdr
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w + 1):
        raise ValueError("decompressed size mismatch")
    rows: list[list[int]] = []
    prev = bytes(w)
    for y in range(h):
        off = y * (w + 1)
        ftype = raw[off]
        row = bytearray(raw[off + 1 : off + 1 + w])
        _unfilter_row(ftype, row, prev)
        prev = bytes(row)
        rows.append(list(row))
    return {"width": w, "height": h, "pixels": rows}
