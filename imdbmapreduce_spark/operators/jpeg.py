"""Pure-Python baseline JPEG codec — the third REAL image codec lane.

The container ships no image libraries (PIL is absent — the documented
capability gate in multimodal.py), so this module implements the
baseline-DCT grayscale JPEG pipeline from the public JPEG spec (ITU-T
T.81): marker segments, quantization tables, the Annex-K Huffman tables,
the byte-stuffed entropy bitstream, DC-difference categories, AC
run/size coding with EOB/ZRL, dequantization, zigzag, 2-D IDCT, and
level shift. Decoder restrictions are explicit and validated: baseline
(SOF0), 8-bit, single component or 4:4:4 (no subsampling), no restart
intervals — the same honest-subset stance as the BMP lane's
"uncompressed 24-bit only".

External provability (the repo's codec-lane rule): the registered query
(multimodal.image_features_real_jpeg) synthesizes images whose 8x8
blocks are CONSTANT values derived from the document's md5 — on that
class, with a flat quant table of 8, baseline JPEG is bit-LOSSLESS
(a constant block's DCT is a lone DC coefficient 8*(v-128); quantizing
by 8 keeps it an exact integer; the IDCT of a lone DC is constant), so
the DuckDB oracle computes the decoded pixel statistics directly from
the text without replaying Huffman, and hash equality proves the whole
encode->bitstream->decode loop byte-exact. The codec itself is general
within its subset (any 8-multiple grayscale image round-trips through
encode/decode with standard JPEG loss); the lossless test class is what
makes it ORACLE-checkable, and pytest additionally round-trips
non-constant images against an independent numpy DCT reference.

Reference parity note: the reference engine (HaimCohen96/ImdbMapReduce)
has no multimodal surface at all; this lane belongs to the additive
LLM-pipeline verticals (brief: multimodal columns with real decode
where feasible without codec libs).
"""

from __future__ import annotations

import numpy as np

# --- public constants from ITU-T T.81 Annex K ------------------------------

# Luminance DC: BITS (codes per length 1..16) and HUFFVAL (categories)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# Luminance AC: BITS and HUFFVAL (run/size symbols)
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

FLAT_Q8 = [8] * 64  # the flat quant table the lossless test class uses


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the decoder."""
    return {(l, c): s for s, (c, l) in _huff_codes(bits, vals).items()}


# 8x8 DCT-II basis (orthonormal): block_dct = C @ block @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.sqrt((1 if _u else 0.5) / 4.0) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16.0
        )


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s (spec F.1.2.3)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


def encode_baseline_gray(pixels: np.ndarray, quant: list[int] = FLAT_Q8) -> bytes:
    """Encode an 8-bit grayscale image (dims multiples of 8) as a
    baseline JPEG: real DCT, quantization, zigzag, Annex-K Huffman."""
    h, w = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("encoder subset: dimensions must be multiples of 8")
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    q = np.array(quant, dtype=np.float64)[np.argsort(_ZIGZAG)].reshape(8, 8)
    # q above is the NATURAL-order table (quant is given in zigzag order)
    bw = _BitWriter()
    prev_dc = 0
    shifted = pixels.astype(np.float64) - 128.0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = shifted[by : by + 8, bx : bx + 8]
            coef = _C @ block @ _C.T
            qz = np.round(coef / q).astype(np.int64)
            zz = qz.flatten()[_ZIGZAG]
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            cat = _category(diff)
            code, length = dc_codes[cat]
            bw.write(code, length)
            if cat:
                bw.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    bw.write(c, ln)
                    run -= 16
                cat = _category(v)
                c, ln = ac_codes[(run << 4) | cat]
                bw.write(c, ln)
                bw.write(v if v > 0 else v + (1 << cat) - 1, cat)
                run = 0
            if last_nz < 63:
                c, ln = ac_codes[0x00]  # EOB
                bw.write(c, ln)
    ecs = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)

    out = bytes([0xFF, 0xD8])  # SOI
    out += seg(0xDB, bytes([0]) + bytes(quant))  # DQT, table 0, 8-bit
    out += seg(
        0xC0,  # SOF0: 8-bit, h x w, 1 component, 1x1 sampling, qtable 0
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    out += seg(0xC4, dht(0, 0, _DC_BITS, _DC_VALS))
    out += seg(0xC4, dht(1, 0, _AC_BITS, _AC_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS: comp 1, DC0/AC0
    out += ecs
    out += bytes([0xFF, 0xD9])  # EOI
    return out


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy stream")
                self.pos += 1  # consume the stuffed 0x00
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _read_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if cat == 0 or v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_baseline(payload: bytes) -> dict:
    """Decode a baseline JPEG within the supported subset (8-bit,
    grayscale or 4:4:4, no restarts, no progressive). Returns
    {width, height, n_components, pixels} with pixels a (h, w) or
    (h, w, ncomp) uint8 array of the decoded samples (no color-space
    conversion — YCbCr stays YCbCr; the test class is grayscale)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    while True:
        if pos >= len(payload):
            raise ValueError("truncated marker segment")
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            raise ValueError("truncated marker segment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / RSTn: standalone markers, no length field
        ln = int.from_bytes(payload[pos : pos + 2], "big")
        body = payload[pos + 2 : pos + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                if body[i] >> 4:
                    raise ValueError("decoder subset: 8-bit quant tables only")
                tid = body[i] & 0x0F
                zz = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(
                    np.float64
                )
                nat = np.zeros(64)
                nat[_ZIGZAG] = zz  # zigzag order -> natural order
                qtabs[tid] = nat.reshape(8, 8)
                i += 65
        elif marker == 0xC0:
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise ValueError("decoder subset: no subsampling (4:4:4 only)")
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError("decoder subset: baseline (SOF0) only")
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:
            if int.from_bytes(body, "big") != 0:
                raise ValueError("decoder subset: restart intervals unsupported")
        elif marker == 0xDA:
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0x0F))
            pos += ln
            break
        pos += ln
    if sof is None:
        raise ValueError("missing SOF0")
    h, w, comps = sof
    if len(scan) != len(comps):
        raise ValueError("decoder subset: single interleaved scan only")
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    br = _BitReader(payload[pos:end])
    ncomp = len(comps)
    # planes are MCU-padded: the block loop writes full 8x8 blocks past
    # non-8-aligned edges; the final [:h, :w] clip trims the padding
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = [np.zeros((ph, pw)) for _ in range(ncomp)]
    prev_dc = [0] * ncomp
    qt = {cid: qtabs[tq] for cid, tq in comps}
    for by in range(0, (h + 7) // 8 * 8, 8):
        for bx in range(0, (w + 7) // 8 * 8, 8):
            for ci, (cs, td, ta) in enumerate(scan):
                zz = np.zeros(64, dtype=np.int64)
                cat = _read_huff(br, htabs[(0, td)])
                diff = _extend(br.bits(cat), cat) if cat else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                i = 1
                while i < 64:
                    sym = _read_huff(br, htabs[(1, ta)])
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    i += sym >> 4
                    if i > 63:
                        raise ValueError("AC run past block end")
                    zz[i] = _extend(br.bits(sym & 0x0F), sym & 0x0F)
                    i += 1
                nat = np.zeros(64)
                nat[_ZIGZAG] = zz
                coef = nat.reshape(8, 8) * qt[scan[ci][0]]
                block = _C.T @ coef @ _C + 128.0
                planes[ci][by : by + 8, bx : bx + 8] = block
    out = [np.clip(np.round(p), 0, 255).astype(np.uint8)[:h, :w] for p in planes]
    pixels = out[0] if ncomp == 1 else np.stack(out, axis=-1)
    return {"width": w, "height": h, "n_components": ncomp, "pixels": pixels}
