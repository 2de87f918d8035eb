"""Baseline JPEG (JFIF) codec — pure stdlib+numpy, no libjpeg/Pillow.

Decoder: baseline sequential DCT (SOF0), 8-bit, Huffman entropy coding,
grayscale or YCbCr with any sampling factors (2×2/2×1/1×1 chroma
subsampling upsampled nearest), restart intervals honored.  Progressive
(SOF2), arithmetic coding, and 12-bit precision raise
``NotImplementedError`` naming the limitation.

Encoder: baseline, 4:4:4, Annex K example quantization tables scaled by a
quality factor, standard Annex K Huffman tables — enough to round-trip
pipelines and tests without any external codec.

Validation strategy (tests/test_multimodal.py): the IDCT is checked
against a direct O(64²) cosine-sum evaluation of the spec formula, the
Huffman decoder against hand-computed canonical codes, DC-only streams
against closed-form block values — independent anchors, not just
encoder↔decoder self-consistency.

This is deliberately clarity-first numpy; throughput-critical bulk decode
belongs in a native codec.  The Spark side (decode_image) treats it like
any other per-row kernel inside an Arrow batch.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index: zz order position -> natural (row-major) position
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K (K.1) luminance / chrominance example quantization tables
_QTAB_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
_QTAB_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K (K.3) standard Huffman tables: (bits[1..16], huffval)
_STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
_STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8-point DCT-II basis matrix C: C[k, n] = a_k cos((2n+1)kπ/16)
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def idct_8x8(coef: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of one 8×8 coefficient block (spec A.3.3)."""
    return _C.T @ coef @ _C


def fdct_8x8(block: np.ndarray) -> np.ndarray:
    """2-D forward DCT of one 8×8 sample block."""
    return _C @ block @ _C.T


def build_huffman(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table → {(code_length, code): symbol}
    (spec C.2: codes of each length assigned in huffval order)."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at restart/terminating markers (caller handles them)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0  # pad past end (spec allows)
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2  # stuffed FF
                else:
                    # a real marker: virtual zero padding, don't consume
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        # read_bit only decrements nbits, so without truncation acc would
        # accumulate the whole entropy stream as one growing big-int and
        # every shift would be O(bytes consumed) — decode goes quadratic.
        self.acc &= (1 << self.nbits) - 1

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align_to_marker(self) -> None:
        """Drop buffered bits and byte-align at self.pos (restart handling)."""
        self.acc = 0
        self.nbits = 0

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.read_bits(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (height, width, 1|3) uint8."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps = None  # [(cid, h, v, tq)]
    h = w = None
    restart_interval = 0
    pos = 2
    scan_comps = None
    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", buf[pos:pos + 2])
        seg = buf[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                zz = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                tab = np.zeros(64, np.int32)
                tab[_ZIGZAG] = zz
                qtabs[tq] = tab.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                p += 1
                bits = list(seg[p:p + 16])
                p += 16
                nsym = sum(bits)
                huffval = list(seg[p:p + nsym])
                p += nsym
                htabs[(tc, th)] = build_huffman(bits, huffval)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG precision")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker == 0xC2:  # SOF2 progressive — multi-scan decoder
            from cuml_spark.multimodal.jpeg_progressive import \
                decode_jpeg_progressive

            return decode_jpeg_progressive(buf)
        elif marker == 0xC3:  # SOF3 lossless sequential — own decoder
            from cuml_spark.multimodal.jpeg_lossless import \
                decode_jpeg_lossless

            return decode_jpeg_lossless(buf)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (arithmetic/hierarchical) "
                "needs a full codec library (e.g. Pillow); baseline (SOF0/1), "
                "progressive (SOF2) and lossless (SOF3) are supported here")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tdta >> 4, tdta & 0xF))
            pos += seglen
            break
        pos += seglen
    if comps is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8))
    comp_info = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}

    reader = _BitReader(buf, pos)
    dc_pred = {cid: 0 for cid, *_ in scan_comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align and consume the RSTn marker
                reader.align_to_marker()
                p = reader.pos
                while p + 1 < len(reader.data) and not (
                        reader.data[p] == 0xFF and 0xD0 <= reader.data[p + 1] <= 0xD7):
                    p += 1
                reader.pos = p + 2
                for cid in dc_pred:
                    dc_pred[cid] = 0
            for cid, td, ta in scan_comps:
                ch, cv, tq = comp_info[cid]
                for by in range(cv):
                    for bx in range(ch):
                        coef = np.zeros(64, np.int32)
                        s = reader.decode_symbol(htabs[(0, td)])
                        dc_pred[cid] += reader.receive_extend(s)
                        coef[0] = dc_pred[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(htabs[(1, ta)])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coef[_ZIGZAG[k]] = reader.receive_extend(s)
                            k += 1
                        block = idct_8x8(
                            coef.reshape(8, 8) * qtabs[tq]) + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1

    # upsample each component to full resolution (nearest) and crop
    out_planes = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    Y, Cb, Cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = Y + 1.402 * Cr
    g = Y - 0.344136 * Cb - 0.714136 * Cr
    b = Y + 1.772 * Cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4, standard tables)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_bits(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.acc <<= (8 - self.nbits)
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _inv_huffman(bits, huffval) -> dict[int, tuple[int, int]]:
    return {sym: (ln, code)
            for (ln, code), sym in build_huffman(bits, huffval).items()}


def _encode_block(bw: _BitWriter, coef_zz: np.ndarray, dc_prev: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    def category(v: int) -> int:
        return int(v).bit_length() if v > 0 else int(-v).bit_length()

    diff = int(coef_zz[0]) - dc_prev
    s = category(diff)
    ln, code = dc_tab[s]
    bw.write_bits(code, ln)
    if s:
        bw.write_bits(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]
            bw.write_bits(code, ln)
            run -= 16
        s = category(v)
        ln, code = ac_tab[(run << 4) | s]
        bw.write_bits(code, ln)
        bw.write_bits(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ln, code = ac_tab[0x00]
        bw.write_bits(code, ln)
    return int(coef_zz[0])


def _scaled_qtab(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tab = (base.astype(np.int64) * scale + 50) // 100
    return np.clip(tab, 1, 255).astype(np.int32)


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 → baseline JPEG
    bytes (4:4:4, Annex K tables scaled by ``quality``)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc == 1:
        chans = [a[:, :, 0].astype(np.float64)]
    elif nc == 3:
        rgb = a.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128.0
        cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128.0
        chans = [y, cb, cr]
    else:
        raise ValueError("encode_jpeg takes grayscale or RGB")
    q_luma = _scaled_qtab(_QTAB_LUMA.reshape(8, 8), quality)
    q_chroma = _scaled_qtab(_QTAB_CHROMA.reshape(8, 8), quality)
    qtabs = [q_luma] + ([q_chroma] if nc == 3 else [])

    def chunk(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += chunk(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qtabs):
        zz = np.zeros(64, np.uint8)
        zz[:] = q.reshape(64)[_ZIGZAG]
        out += chunk(0xDB, bytes([tid]) + zz.tobytes())
    comp_spec = b"".join(
        bytes([i + 1, 0x11, 0 if i == 0 else 1]) for i in range(nc))
    out += chunk(0xC0, struct.pack(">BHHB", 8, h, w, nc) + comp_spec)
    hts = ([(0x00, _STD_DC_LUMA), (0x10, _STD_AC_LUMA)]
           + ([(0x01, _STD_DC_CHROMA), (0x11, _STD_AC_CHROMA)] if nc == 3 else []))
    for tid, (bits, huffval) in hts:
        out += chunk(0xC4, bytes([tid] + bits + huffval))
    scan_spec = b"".join(
        bytes([i + 1, 0x00 if i == 0 else 0x11]) for i in range(nc))
    out += chunk(0xDA, bytes([nc]) + scan_spec + b"\x00\x3f\x00")

    dc_tabs = [_inv_huffman(*_STD_DC_LUMA)] + (
        [_inv_huffman(*_STD_DC_CHROMA)] if nc == 3 else [])
    ac_tabs = [_inv_huffman(*_STD_AC_LUMA)] + (
        [_inv_huffman(*_STD_AC_CHROMA)] if nc == 3 else [])
    bw = _BitWriter()
    pad_h, pad_w = -(-h // 8) * 8, -(-w // 8) * 8
    padded = [np.pad(c, ((0, pad_h - h), (0, pad_w - w)), mode="edge")
              for c in chans]
    dc_prev = [0] * nc
    for by in range(pad_h // 8):
        for bx in range(pad_w // 8):
            for ci in range(nc):
                ti = 0 if ci == 0 else 1
                block = padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = np.round(fdct_8x8(block) / qtabs[ti]).astype(np.int32)
                zz = coef.reshape(64)[_ZIGZAG]
                dc_prev[ci] = _encode_block(
                    bw, zz, dc_prev[ci], dc_tabs[ti], ac_tabs[ti])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
