"""Baseline grayscale JPEG codec — pure python + numpy, no image library.

The last image-codec boundary that was honestly stubbed: JPEG needs real
entropy coding and a real transform, both implementable from the public
spec (ITU-T T.81):

- **Huffman**: canonical code construction from the Annex K.3 luminance
  DC/AC tables, bit-level writer/reader with 0xFF byte stuffing, DC
  difference coding with EXTEND sign magnitude, AC run-length coding
  with ZRL and EOB.
- **Transform**: the orthonormal 8x8 DCT-II matrix (numpy, float64) is
  exactly the JPEG FDCT/IDCT pair; quantization divides by the IJG
  quality-scaled Annex K table with numpy half-even rounding.

Scope (honest): baseline sequential, 8-bit, SINGLE component (grayscale)
— SOF0 with one channel is a fully valid JPEG. Color (subsampling +
interleaved MCUs), progressive scans, and restart intervals raise
NotImplementedError; they are format complexity, not new machinery.

Determinism: encode(quality=100) uses an all-ones quantization table, so
a solid-color image round-trips EXACTLY (the DCT of a constant block is
a lone DC coefficient; float error ~1e-13 is absorbed by the final
round) — which is what lets a decoded-stats registry query sit under the
closed-form value-hash gate. Textured content round-trips within the
quantization error bound (tested).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

# K.1 luminance quantization (natural row-major order)
_Q50 = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# zigzag index: _ZIGZAG[k] = natural index of the k-th zigzag element
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# K.3 luminance DC: counts of codes per length 1..16, then symbols
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

# K.5 luminance AC
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


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical construction (C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


def _quality_table(quality: int) -> list[int]:
    """IJG quality scaling of the Annex K table (quality 100 -> all 1s)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (q * scale + 50) // 100)) for q in _Q50]


def _dct_matrix():
    import numpy as np

    m = np.zeros((8, 8))
    for i in range(8):
        for j in range(8):
            m[i, j] = (0.35355339059327373 if i == 0 else 0.5) * (
                np.cos((2 * j + 1) * i * np.pi / 16)
            )
    return m


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per the spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy data")
                self.pos += 1  # skip the stuffed 0x00
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient (F.1.2)."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _extend(v: int, s: int) -> int:
    """Inverse of _magnitude (F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def encode_jpeg(width: int, height: int, pixels: bytes, *, quality: int = 75) -> bytes:
    """Encode an 8-bit grayscale image as baseline sequential JPEG.
    ``pixels`` is top-down row-major, one byte per pixel; edges pad by
    replication to 8x8 blocks."""
    import numpy as np

    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes (grayscale)")
    q = _quality_table(quality)
    qmat = np.array(q, dtype=np.float64).reshape(8, 8)
    dct = _dct_matrix()
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width).astype(np.float64)
    bw = ((width + 7) // 8) * 8
    bh = ((height + 7) // 8) * 8
    padded = np.pad(img, ((0, bh - height), (0, bw - width)), mode="edge")

    w = _BitWriter()
    prev_dc = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coef = dct @ block @ dct.T
            # numpy half-even rounding — the decoder has no inverse
            # rounding step, so any deterministic rule works; document it
            quant = np.round(coef / qmat).astype(np.int64)
            zz = [int(quant.flat[_ZIGZAG[k]]) for k in range(64)]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            s, bits = _magnitude(diff)
            code, length = dc_codes[s]
            w.write(code, length)
            if s:
                w.write(bits, s)
            run = 0
            last_nz = 0
            for k in range(1, 64):
                if zz[k] != 0:
                    last_nz = k
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, length = ac_codes[0xF0]  # ZRL
                    w.write(code, length)
                    run -= 16
                s, bits = _magnitude(zz[k])
                code, length = ac_codes[(run << 4) | s]
                w.write(code, length)
                w.write(bits, s)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]  # EOB
                w.write(code, length)
    entropy = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, bytes([0]) + bytes(q[_ZIGZAG[k]] for k in range(64)))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"


def decode_jpeg(raw: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline grayscale JPEG: returns (width, height, pixels)
    top-down row-major. ValueError on malformed input (low-level parse
    errors from truncated/corrupt streams are normalized to ValueError so
    the Spark quarantine path catches them); NotImplementedError on
    valid-but-unsupported features (color, progressive, 16-bit tables,
    restart intervals)."""
    from connemara_spark.operators.codecerrors import MALFORMED_ERRORS

    try:
        return _decode_jpeg_inner(raw)
    except MALFORMED_ERRORS as e:
        raise ValueError(f"malformed JPEG: {e}") from e


def _decode_jpeg_inner(raw: bytes) -> tuple[int, int, bytes]:
    import numpy as np

    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_tbl: dict[tuple[int, int], int] | None = None
    ac_tbl: dict[tuple[int, int], int] | None = None
    width = height = None
    comp_q = 0
    entropy_start = None
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = struct.unpack_from(">H", raw, pos)[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack_from(">H", raw, pos + 2)
        body = raw[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                zz = list(body[o + 1 : o + 65])
                nat = [0] * 64
                for k in range(64):
                    nat[_ZIGZAG[k]] = zz[k]
                qtables[tq] = nat
                o += 65
        elif 0xFFC1 <= marker <= 0xFFCF and marker not in (0xFFC4, 0xFFC8, 0xFFCC):
            # every non-baseline SOF variant (extended/progressive/lossless/
            # arithmetic SOF9-SOF15) is VALID-but-unsupported, not malformed
            # — keep the NotImplementedError contract for the whole range,
            # not just SOF1-SOF3 (0xFFC8 is JPG reserved, 0xFFCC is DAC)
            raise NotImplementedError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFCC:
            raise NotImplementedError("arithmetic conditioning (DAC) unsupported")
        elif marker == 0xFFC0:
            precision, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            if ncomp != 1:
                raise NotImplementedError("only single-component (grayscale) JPEG")
            comp_q = body[8]  # body: prec(1) h(2) w(2) ncomp(1) id(1) sampling(1) Tq(1)
        elif marker == 0xFFC4:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                if th != 0:
                    # valid JPEG, multi-table entropy coding — out of the
                    # single-component baseline scope, NOT malformed
                    raise NotImplementedError("DHT table id != 0 unsupported")
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                if tc == 0 and th == 0:
                    dc_tbl = _decode_table(bits, vals)
                elif tc == 1 and th == 0:
                    ac_tbl = _decode_table(bits, vals)
                o += 17 + n
        elif marker == 0xFFDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xFFDA:
            ns = body[0]
            for ci in range(ns):
                if body[2 + 2 * ci] != 0:  # Td/Ta selectors beyond table 0
                    raise NotImplementedError("SOS huffman selector != 0 unsupported")
            entropy_start = pos + 2 + length
            break
        pos += 2 + length
    if entropy_start is None or width is None or dc_tbl is None or ac_tbl is None:
        raise ValueError("missing SOF/DHT/SOS")
    if comp_q not in qtables:
        raise ValueError("missing quantization table")
    # entropy data runs to the EOI marker (stuffed 0xFF00 handled by reader)
    end = raw.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    r = _BitReader(raw[entropy_start:end])

    def read_symbol(tbl: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | r.read_bit()
            length += 1
            if (length, code) in tbl:
                return tbl[(length, code)]
        raise ValueError("invalid huffman code")

    qmat = np.array(qtables[comp_q], dtype=np.float64).reshape(8, 8)
    dct = _dct_matrix()
    bw = ((width + 7) // 8) * 8
    bh = ((height + 7) // 8) * 8
    out = np.zeros((bh, bw))
    prev_dc = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            zz = [0] * 64
            s = read_symbol(dc_tbl)
            diff = _extend(r.read_bits(s), s) if s else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = read_symbol(ac_tbl)
                run, size = rs >> 4, rs & 0x0F
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = _extend(r.read_bits(size), size)
                k += 1
            quant = np.zeros(64)
            for k in range(64):
                quant[_ZIGZAG[k]] = zz[k]
            coef = quant.reshape(8, 8) * qmat
            block = dct.T @ coef @ dct
            out[by : by + 8, bx : bx + 8] = block
    pixels = np.clip(np.round(out[:height, :width] + 128.0), 0, 255).astype(np.uint8)
    return width, height, pixels.tobytes()
