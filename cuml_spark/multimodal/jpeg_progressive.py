"""Progressive (SOF2) JPEG decode + encode — ITU-T T.81 §G, pure
stdlib+numpy like the baseline codec (multimodal/jpeg.py), from which the
bit I/O, Huffman, zigzag and IDCT/FDCT pieces are shared.

Progressive streams deliver the 8×8 DCT coefficients over MULTIPLE scans:

* spectral selection — each scan carries one zigzag band [Ss, Se] (DC scans
  are Ss=Se=0 and may be interleaved; AC scans are single-component);
* successive approximation — a "first" scan (Ah=0) sends coefficients
  divided by 2^Al (point transform), and "refinement" scans (Ah>0) append
  one magnitude bit each, using the correction-bit algorithm of §G.1.2.3;
* AC scans run-length EOB runs (EOBn symbols) across blocks.

The decoder accumulates per-component coefficient grids across scans and
dequantizes+IDCTs once at EOI.  The encoder emits the classic scan script
(DC first/refine interleaved; per-component AC bands 1–5 and 6–63, first
then refine), which exercises every decode path and lets round trips be
verified against the baseline codec: the SAME quantized coefficients must
produce the SAME pixels whichever way they were transported.

Reference parity note: the cuML reference contains no codec code at all —
this exists for the multimodal pipeline tier (decode_image over binary
columns), closing the one codec gap round-4 review flagged.
"""

from __future__ import annotations

import struct

import numpy as np

from cuml_spark.multimodal.jpeg import (
    _ZIGZAG,
    _BitReader,
    _BitWriter,
    _inv_huffman,
    build_huffman,
    idct_8x8,
)

# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _next_marker(buf: bytes, pos: int) -> int:
    """Position of the next 0xFF marker (skipping stuffed FF00 pairs)."""
    n = len(buf)
    while pos + 1 < n:
        if buf[pos] == 0xFF and buf[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    return n


def _decode_scan(buf, pos, comps_in_scan, htabs, coefs, dims, Ss, Se, Ah, Al,
                 restart_interval):
    """Decode one progressive scan starting at entropy data offset ``pos``.

    ``comps_in_scan``: list of (cid, td, ta, ch, cv, bw, bh) where (bw, bh)
    is the component's own (non-interleaved) block grid; ``coefs[cid]`` is
    the persistent (grid_h, grid_w, 64) int32 coefficient array (natural
    order).  Returns the byte offset just past the scan's entropy data.
    """
    reader = _BitReader(buf, pos)
    dc_pred = {c[0]: 0 for c in comps_in_scan}
    eobrun = 0
    p1, m1 = 1 << Al, -1 << Al

    interleaved = len(comps_in_scan) > 1
    if not interleaved:
        cid, td, ta, ch, cv, bw, bh = comps_in_scan[0]
        n_units = bw * bh

    def restart():
        nonlocal eobrun
        reader.align_to_marker()
        p = reader.pos
        while p + 1 < len(reader.data) and not (
                reader.data[p] == 0xFF and 0xD0 <= reader.data[p + 1] <= 0xD7):
            p += 1
        reader.pos = p + 2
        for k in dc_pred:
            dc_pred[k] = 0
        eobrun = 0

    def dc_first(block, cid, td):
        s = reader.decode_symbol(htabs[(0, td)])
        dc_pred[cid] += reader.receive_extend(s)
        block[0] = dc_pred[cid] << Al

    def dc_refine(block):
        if reader.read_bit():
            block[0] |= p1

    def ac_first(block, ta):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = Ss
        while k <= Se:
            rs = reader.decode_symbol(htabs[(1, ta)])
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    return
                k += 16  # ZRL
            else:
                k += r
                if k > Se:
                    raise ValueError("JPEG AC index past band end")
                block[_ZIGZAG[k]] = reader.receive_extend(s) << Al
                k += 1

    def _refine_nonzero(block, zig_k):
        """One correction bit for an already-nonzero coefficient."""
        v = block[zig_k]
        if reader.read_bit():
            if v >= 0:
                if not (v & p1):
                    block[zig_k] = v + p1
            else:
                if not (-v & p1):
                    block[zig_k] = v + m1

    def ac_refine(block, ta):
        nonlocal eobrun
        k = Ss
        if eobrun == 0:
            while k <= Se:
                rs = reader.decode_symbol(htabs[(1, ta)])
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r < 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    # r == 15: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("JPEG AC refinement size != 1")
                    val = p1 if reader.read_bit() else m1
                # advance past r zero-history coeffs, refining nonzero ones
                while k <= Se:
                    zk = _ZIGZAG[k]
                    if block[zk] != 0:
                        _refine_nonzero(block, zk)
                    else:
                        if r == 0:
                            if val:
                                block[zk] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun > 0:
            while k <= Se:
                zk = _ZIGZAG[k]
                if block[zk] != 0:
                    _refine_nonzero(block, zk)
                k += 1
            eobrun -= 1

    unit = 0
    if interleaved:
        for my in range(dims["mcus_y"]):
            for mx in range(dims["mcus_x"]):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                for cid, td, ta, ch, cv, bw, bh in comps_in_scan:
                    for by in range(cv):
                        for bx in range(ch):
                            block = coefs[cid][my * cv + by, mx * ch + bx]
                            if Ss == 0:
                                if Ah == 0:
                                    dc_first(block, cid, td)
                                else:
                                    dc_refine(block)
                            else:
                                raise ValueError(
                                    "interleaved AC scan is not legal JPEG")
                unit += 1
    else:
        cid, td, ta, ch, cv, bw, bh = comps_in_scan[0]
        for i in range(n_units):
            if restart_interval and i and i % restart_interval == 0:
                restart()
            block = coefs[cid][i // bw, i % bw]
            if Ss == 0:
                if Ah == 0:
                    dc_first(block, cid, td)
                else:
                    dc_refine(block)
            else:
                if Ah == 0:
                    ac_first(block, ta)
                else:
                    ac_refine(block, ta)

    reader.align_to_marker()
    return _next_marker(buf, reader.pos)


def decode_jpeg_progressive(buf: bytes) -> np.ndarray:
    """Progressive (SOF2) JPEG bytes → (height, width, 1|3) uint8."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = None
    restart_interval = 0
    coefs: dict[int, np.ndarray] = {}
    dims: dict[str, int] = {}
    comp_dims: dict[int, tuple[int, int]] = {}  # cid -> (bw, bh) own grid
    pos = 2
    saw_scan = False
    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01, 0x00, 0xFF) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", buf[pos:pos + 2])
        seg = buf[pos + 2:pos + seglen]
        if marker == 0xDB:
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
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                p += 1
                bits = list(seg[p:p + 16])
                p += 16
                nsym = sum(bits)
                htabs[(tc, th)] = build_huffman(bits, list(seg[p:p + nsym]))
                p += nsym
        elif marker == 0xC2:
            if seg[0] != 8:
                raise NotImplementedError(f"{seg[0]}-bit JPEG precision")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            dims = {"mcus_x": -(-w // (8 * hmax)), "mcus_y": -(-h // (8 * vmax)),
                    "hmax": hmax, "vmax": vmax}
            for cid, ch, cv, _tq in comps:
                # allocate the MCU-padded grid; non-interleaved scans cover
                # only the component's own ceil(dim/8) sub-grid
                gh, gw = dims["mcus_y"] * cv, dims["mcus_x"] * ch
                coefs[cid] = np.zeros((gh, gw, 64), np.int32)
                cw = -(-(w * ch) // hmax)
                chh = -(-(h * cv) // vmax)
                comp_dims[cid] = (-(-cw // 8), -(-chh // 8))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("decode_jpeg_progressive expects SOF2")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            info = {cid: (ch, cv) for cid, ch, cv, _tq in comps}
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                ch, cv = info[cs]
                bw, bh = comp_dims[cs]
                scan.append((cs, tdta >> 4, tdta & 0xF, ch, cv, bw, bh))
            Ss, Se, AhAl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos = _decode_scan(buf, pos + seglen, scan, htabs, coefs, dims,
                               Ss, Se, AhAl >> 4, AhAl & 0xF,
                               restart_interval)
            saw_scan = True
            continue
        pos += seglen
    if comps is None or not saw_scan:
        raise ValueError("JPEG missing SOF2/SOS")

    planes = {}
    for cid, ch, cv, tq in comps:
        grid = coefs[cid]
        gh, gw = grid.shape[:2]
        plane = np.zeros((gh * 8, gw * 8))
        q = qtabs[tq]
        for by in range(gh):
            for bx in range(gw):
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = idct_8x8(
                    grid[by, bx].reshape(8, 8) * q) + 128.0
        planes[cid] = plane

    hmax, vmax = dims["hmax"], dims["vmax"]
    out_planes = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    Y, Cb, Cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    rgb = np.stack(
        [Y + 1.402 * Cr,
         Y - 0.344136 * Cb - 0.714136 * Cr,
         Y + 1.772 * Cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder — classic scan script: DC first (interleaved) + DC refine, then
# per-component AC bands 1-5 / 6-63, first (Al=al) then refine down to 0.
# ---------------------------------------------------------------------------

# Progressive AC scans emit EOBn (r<<4, r=0..14) symbols that the Annex K
# baseline tables simply don't contain (they only define EOB0 and ZRL), so
# the encoder ships a complete flat 8-bit canonical table: every legal AC
# symbol — 15 EOBn + ZRL + 160 (run,size) pairs = 176 codes, all length 8
# (valid: 176 < 256 and the all-ones code is never assigned).  libjpeg
# solves this with per-image optimized tables; a fixed complete table keeps
# the encoder deterministic, which the oracle harness requires.
_PROG_AC_SYMS = ([r << 4 for r in range(15)] + [0xF0]
                 + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_PROG_AC_TABLE = ([0] * 7 + [len(_PROG_AC_SYMS)] + [0] * 8, _PROG_AC_SYMS)


class _ScanWriter:
    """Bit emission for one progressive scan: EOB-run accumulation plus the
    refinement-scan correction-bit buffering of T.81 §G.1.2.3 (the same
    bookkeeping libjpeg's jcphuff does)."""

    def __init__(self, bw: _BitWriter, ac_tab: dict):
        self.bw = bw
        self.ac = ac_tab
        self.eobrun = 0
        self.corr: list[int] = []  # buffered correction bits

    def emit_sym(self, sym: int):
        ln, code = self.ac[sym]
        self.bw.write_bits(code, ln)

    def flush_eobrun(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.emit_sym(r << 4)
            if r:
                self.bw.write_bits(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.corr:
            self.bw.write_bits(b, 1)
        self.corr = []


def _dc_first_scan(bw, blocks_per_comp, dc_tabs, al):
    """Interleaved DC scan: blocks_per_comp[(ci)] iterated in MCU order is
    pre-flattened by the caller into per-MCU component block lists."""
    preds = [0] * len(dc_tabs)

    def category(v):
        return int(v).bit_length() if v > 0 else int(-v).bit_length()

    for mcu in blocks_per_comp:
        for ci, coef0 in mcu:
            v = int(coef0) >> al  # T.81 DC point transform: arithmetic shift
            diff = v - preds[ci]
            preds[ci] = v
            s = category(diff)
            ln, code = dc_tabs[ci][s]
            bw.write_bits(code, ln)
            if s:
                bw.write_bits(diff if diff > 0 else diff + (1 << s) - 1, s)


def _dc_refine_scan(bw, blocks_per_comp, al):
    for mcu in blocks_per_comp:
        for _ci, coef0 in mcu:
            bw.write_bits((int(coef0) >> al) & 1, 1)


def _ac_first_scan(sw: _ScanWriter, blocks, ss, se, al):
    for zz in blocks:
        band = [int(zz[k]) for k in range(ss, se + 1)]
        vals = [v // (1 << al) if v >= 0 else -((-v) >> al) for v in band]
        if not any(vals):
            sw.eobrun += 1
            if sw.eobrun == 0x7FFF:
                sw.flush_eobrun()
            continue
        sw.flush_eobrun()
        run = 0
        last_nz = max(i for i, v in enumerate(vals) if v)
        for i, v in enumerate(vals):
            if i > last_nz:
                sw.eobrun = 1
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                sw.emit_sym(0xF0)
                run -= 16
            s = int(v).bit_length() if v > 0 else int(-v).bit_length()
            sw.emit_sym((run << 4) | s)
            sw.bw.write_bits(v if v > 0 else v + (1 << s) - 1, s)
            run = 0


def _ac_refine_scan(sw: _ScanWriter, blocks, ss, se, al):
    """§G.1.2.3 correction-bit emission (libjpeg jcphuff structure)."""
    for zz in blocks:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        signs = [1 if int(zz[k]) >= 0 else 0 for k in range(ss, se + 1)]
        eob = 0  # index AFTER the last newly-significant coefficient
        for i, a in enumerate(absv):
            if a == 1:
                eob = i + 1
        run = 0
        pend: list[int] = []  # correction bits pending behind the next sym
        for i, a in enumerate(absv):
            if i >= eob:
                break
            if a == 0:
                run += 1
                continue
            while run > 15:
                sw.flush_eobrun()
                sw.emit_sym(0xF0)
                for b in pend:
                    sw.bw.write_bits(b, 1)
                pend = []
                run -= 16
            if a > 1:
                # already significant before this scan: append its next bit
                pend.append(a & 1)
                continue
            # a == 1: newly significant
            sw.flush_eobrun()
            sw.emit_sym((run << 4) | 1)
            sw.bw.write_bits(signs[i], 1)
            for b in pend:
                sw.bw.write_bits(b, 1)
            pend = []
            run = 0
        # trailing region (at/after EOB): correction bits ride the EOB run
        tail = [a & 1 for a in absv[eob:] if a > 1]
        if eob < len(absv) or pend or tail:
            sw.eobrun += 1
            sw.corr.extend(pend + tail)
            if sw.eobrun == 0x7FFF or len(sw.corr) > 900:
                sw.flush_eobrun()
        else:
            # fully covered band with the last coefficient newly significant
            for b in pend:
                sw.bw.write_bits(b, 1)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            al: int = 1) -> bytes:
    """(h, w[, 1|3]) uint8 → progressive (SOF2) JPEG bytes, 4:4:4, with
    ``al`` levels of successive approximation (al=0 → spectral selection
    only).  Quantized coefficients are identical to ``encode_jpeg`` at the
    same quality, so both transports decode to the same pixels."""
    from cuml_spark.multimodal.jpeg import (_QTAB_CHROMA, _QTAB_LUMA,
                                            _STD_DC_CHROMA, _STD_DC_LUMA,
                                            _scaled_qtab, fdct_8x8)

    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc == 1:
        chans = [a[:, :, 0].astype(np.float64)]
    elif nc == 3:
        rgb = a.astype(np.float64)
        chans = [
            0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2],
            -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1]
            + 0.5 * rgb[:, :, 2] + 128.0,
            0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1]
            - 0.081312 * rgb[:, :, 2] + 128.0,
        ]
    else:
        raise ValueError("encode_jpeg_progressive takes grayscale or RGB")
    qtabs = [_scaled_qtab(_QTAB_LUMA.reshape(8, 8), quality)]
    if nc == 3:
        qtabs.append(_scaled_qtab(_QTAB_CHROMA.reshape(8, 8), quality))

    pad_h, pad_w = -(-h // 8) * 8, -(-w // 8) * 8
    nby, nbx = pad_h // 8, pad_w // 8
    zz_blocks: list[list[np.ndarray]] = []  # per comp, raster block order
    for ci in range(nc):
        ti = 0 if ci == 0 else 1
        padded = np.pad(chans[ci], ((0, pad_h - h), (0, pad_w - w)),
                        mode="edge")
        blocks = []
        for by in range(nby):
            for bx in range(nbx):
                block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = np.round(fdct_8x8(block) / qtabs[ti]).astype(np.int32)
                blocks.append(coef.reshape(64)[_ZIGZAG])
        zz_blocks.append(blocks)

    def chunk(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    for tid, q in enumerate(qtabs):
        z = np.zeros(64, np.uint8)
        z[:] = q.reshape(64)[_ZIGZAG]
        out += chunk(0xDB, bytes([tid]) + z.tobytes())
    comp_spec = b"".join(
        bytes([i + 1, 0x11, 0 if i == 0 else 1]) for i in range(nc))
    out += chunk(0xC2, struct.pack(">BHHB", 8, h, w, nc) + comp_spec)
    hts = ([(0x00, _STD_DC_LUMA), (0x10, _PROG_AC_TABLE)]
           + ([(0x01, _STD_DC_CHROMA), (0x11, _PROG_AC_TABLE)]
              if nc == 3 else []))
    for tid, (bits, huffval) in hts:
        out += chunk(0xC4, bytes([tid] + bits + huffval))

    dc_tabs = [_inv_huffman(*_STD_DC_LUMA)] + (
        [_inv_huffman(*_STD_DC_CHROMA)] * (nc - 1))
    ac_tabs = [_inv_huffman(*_PROG_AC_TABLE)] * nc

    # 4:4:4 → every component shares the raster block order; MCU list for
    # the interleaved DC scans is (ci, coef0) per block position
    mcus = [[(ci, zz_blocks[ci][b][0]) for ci in range(nc)]
            for b in range(nby * nbx)]

    def sos(comp_ids, Ss, Se, Ah, Al):
        spec = b"".join(
            bytes([cid + 1, (0x00 if cid == 0 else 0x11)]) for cid in comp_ids)
        return chunk(0xDA, bytes([len(comp_ids)]) + spec
                     + bytes([Ss, Se, (Ah << 4) | Al]))

    # scan 1: DC first, interleaved, Al=al
    out += sos(list(range(nc)), 0, 0, 0, al)
    bw = _BitWriter()
    _dc_first_scan(bw, mcus, dc_tabs, al)
    bw.flush()
    out += bw.out
    # AC first scans: per component, bands 1-5 and 6-63 at Al=al
    bands = [(1, 5), (6, 63)]
    for ci in range(nc):
        for ss, se in bands:
            out += sos([ci], ss, se, 0, al)
            bw = _BitWriter()
            sw = _ScanWriter(bw, ac_tabs[ci])
            _ac_first_scan(sw, zz_blocks[ci], ss, se, al)
            sw.flush_eobrun()
            bw.flush()
            out += bw.out
    # refinement ladder down to Al=0
    for lvl in range(al - 1, -1, -1):
        out += sos(list(range(nc)), 0, 0, lvl + 1, lvl)
        bw = _BitWriter()
        _dc_refine_scan(bw, mcus, lvl)
        bw.flush()
        out += bw.out
        for ci in range(nc):
            for ss, se in bands:
                out += sos([ci], ss, se, lvl + 1, lvl)
                bw = _BitWriter()
                sw = _ScanWriter(bw, ac_tabs[ci])
                _ac_refine_scan(sw, zz_blocks[ci], ss, se, lvl)
                sw.flush_eobrun()
                bw.flush()
                out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
