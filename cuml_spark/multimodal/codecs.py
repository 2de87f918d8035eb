"""Pure stdlib+numpy media codecs — no Pillow/ffmpeg required.

The container has no image/audio codec libraries, but several real formats
are decodable with nothing beyond the standard library:

* PNG   — zlib inflate + per-row unfilter (RFC 2083 filters 0-4); 8-bit
          depth, color types gray / RGB / gray+alpha / RGBA, non-interlaced.
* BMP   — BITMAPINFOHEADER parse, uncompressed 24/32 bpp (bottom-up or
          top-down), 4-byte row padding.
* PPM   — P6 (RGB) and P5 (gray) binary netpbm.
* WAV   — stdlib ``wave``: 8/16/32-bit PCM, any channel count; plus a
          manual RIFF walk for ITU-T G.711 µ-law (format tag 7) and A-law
          (tag 6) telephony audio — the decode is exact integer
          arithmetic, so oracles can replay it in plain SQL.

These back the REAL (non-stub) paths of ``decode_image`` / ``decode_audio``
in :mod:`cuml_spark.multimodal.media`; formats that genuinely need an
external codec (JPEG, MP4, …) still raise ``NotImplementedError`` naming
the dependency.  A matching PNG **encoder** is included so pipelines (and
tests) can round-trip without any external tool.

Reference surface note: the reference engine has no media tier — this is
part of the training-data-pipeline brief layered on top of it.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_format(buf: bytes) -> str | None:
    """Magic-byte detection for the supported container formats."""
    if buf[:8] == _PNG_SIG:
        return "png"
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:2] in (b"P5", b"P6"):
        return "ppm"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        return "avi"
    if buf[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if buf[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
        return "webp"  # dimensions probe-able; pixel decode refused
    if buf[4:8] == b"ftyp" and buf[8:12] in (b"avif", b"avis", b"heic",
                                             b"heix", b"mif1"):
        return "avif"  # dimensions probe-able; pixel decode refused
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → (height, width, channels) uint8 array."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos:pos + 4])
        ctype = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data))
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace} needs a full codec library (e.g. Pillow);"
            " supported here: 8-bit gray/RGB/gray+alpha/RGBA, non-interlaced"
        )
    c = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * c
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:
            rec = row
        elif ftype == 2:  # up — fully vectorized
            rec = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):
            rec = np.zeros(stride, dtype=np.int64)
            pv = prev.astype(np.int64)
            for x in range(stride):
                a = rec[x - c] if x >= c else 0
                b = pv[x]
                if ftype == 1:
                    rec[x] = (row[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (row[x] + (a + b) // 2) & 0xFF
                else:
                    d = pv[x - c] if x >= c else 0
                    rec[x] = (row[x] + _paeth(a, b, d)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return out.reshape(height, width, c)


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 array → PNG bytes (filter 0, one IDAT)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP / PPM
# ---------------------------------------------------------------------------

def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP bytes → (height, width, 3|4) uint8 (BGR[A] reordered to RGB[A])."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", buf[10:14])
    width, height = struct.unpack("<ii", buf[18:26])
    (bpp,) = struct.unpack("<H", buf[28:30])
    (compression,) = struct.unpack("<I", buf[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP compression={compression} bpp={bpp} needs a full codec "
            "library; supported here: uncompressed 24/32 bpp")
    c = bpp // 8
    bottom_up = height > 0
    height = abs(height)
    stride = (width * c + 3) & ~3  # rows pad to 4 bytes
    rows = []
    for y in range(height):
        off = data_off + y * stride
        rows.append(np.frombuffer(buf, dtype=np.uint8, count=width * c,
                                  offset=off).reshape(width, c))
    img = np.stack(rows)
    if bottom_up:
        img = img[::-1]
    # BGR(A) → RGB(A)
    order = [2, 1, 0] + ([3] if c == 4 else [])
    return np.ascontiguousarray(img[:, :, order])


def decode_ppm(buf: bytes) -> np.ndarray:
    """P6/P5 netpbm bytes → (h, w, 3|1) uint8."""
    magic = buf[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    # header: magic, width, height, maxval — whitespace/comment separated
    vals, pos = [], 2
    while len(vals) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm unsupported")
    c = 3 if magic == b"P6" else 1
    return np.frombuffer(buf, dtype=np.uint8, count=w * h * c,
                         offset=pos).reshape(h, w, c).copy()


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width (min+1 .. 12 bits), LSB-first bit
    packing, CLEAR resets the table, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.int64)
    n_out = 0
    acc = nbits = pos = 0

    def reset():
        return {i: (i,) for i in range(clear)}, min_code_size + 1, eoi + 1

    table, width, next_code = reset()
    prev: tuple | None = None
    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width, next_code = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + (prev[0],)
            else:
                raise ValueError("GIF LZW code out of range")
            if next_code < 4096:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = entry[:take]
        n_out += take
        prev = entry
    if n_out < n_pixels:
        raise ValueError("GIF LZW ended before raster complete")
    return out


def decode_gif(buf: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a → (h, w, 3) uint8 RGB (palette resolved;
    interlaced rasters de-interlaced)."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", buf[6:10])
    flags = buf[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(buf, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(buf):
        b0 = buf[pos]
        pos += 1
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _left, _top, w, h = struct.unpack("<HHHH", buf[pos:pos + 8])
            iflags = buf[pos + 8]
            pos += 9
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(buf, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            min_code = buf[pos]
            pos += 1
            stream = bytearray()
            while buf[pos] != 0:
                ln = buf[pos]
                stream += buf[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(bytes(stream), min_code, w * h).reshape(h, w)
            if iflags & 0x40:  # interlaced: 4-pass row order
                order = np.concatenate([
                    np.arange(0, h, 8), np.arange(4, h, 8),
                    np.arange(2, h, 4), np.arange(1, h, 2)])
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            return pal[np.clip(idx, 0, len(pal) - 1)]
        elif b0 == 0x3B:  # trailer
            break
    raise ValueError("GIF contains no image data")


# ---------------------------------------------------------------------------
# TIFF (uncompressed baseline)
# ---------------------------------------------------------------------------

def decode_tiff(buf: bytes) -> np.ndarray:
    """Uncompressed 8-bit TIFF (gray or RGB, either byte order, strip
    layout) → (h, w, 1|3) uint8.  LZW/JPEG-in-TIFF/16-bit raise naming the
    limitation."""
    if buf[:4] == b"II*\x00":
        bo = "<"
    elif buf[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
    (n_entries,) = struct.unpack(bo + "H", buf[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    _TYPE_SIZE = {1: 1, 3: 2, 4: 4}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, typ = struct.unpack(bo + "HH", buf[e:e + 4])
        (count,) = struct.unpack(bo + "I", buf[e + 4:e + 8])
        if typ not in _TYPE_SIZE:
            continue  # rationals etc. — not needed for the raster
        sz = _TYPE_SIZE[typ]
        total = sz * count
        if total <= 4:
            data_off = e + 8
        else:
            (data_off,) = struct.unpack(bo + "I", buf[e + 8:e + 12])
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack(
            bo + fmt * count, buf[data_off:data_off + total]))
    width = tags[256][0]
    height = tags[257][0]
    bits = tags.get(258, [8])
    compression = tags.get(259, [1])[0]
    spp = tags.get(277, [len(bits)])[0]
    if compression != 1 or any(b != 8 for b in bits):
        raise NotImplementedError(
            f"TIFF compression={compression} bits={bits} needs a full codec "
            "library; supported here: uncompressed 8-bit gray/RGB")
    offsets = tags[273]
    rows_per_strip = tags.get(278, [height])[0]
    counts = tags.get(279)
    raster = bytearray()
    for si, off in enumerate(offsets):
        n = (counts[si] if counts else
             min(rows_per_strip, height - si * rows_per_strip) * width * spp)
        raster += buf[off:off + n]
    img = np.frombuffer(bytes(raster), np.uint8, width * height * spp)
    return img.reshape(height, width, spp).copy()


# ---------------------------------------------------------------------------
# AVI (MJPEG) — RIFF container walk; frames are plain JPEGs
# ---------------------------------------------------------------------------

def parse_avi_frames(buf: bytes) -> tuple[list[bytes], float]:
    """Motion-JPEG AVI bytes → (list of per-frame JPEG payloads, fps).

    Lenient RIFF walk: reads ``avih`` for the frame rate, then collects the
    video-stream data chunks (``00dc``/``00db``) inside the ``movi`` LIST.
    Only the container is parsed here — each frame payload is a standalone
    baseline JPEG for :func:`cuml_spark.multimodal.jpeg.decode_jpeg`.
    """
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    fps = 0.0
    frames: list[bytes] = []

    def walk(pos: int, end: int):
        nonlocal fps
        while pos + 8 <= end:
            cid = buf[pos:pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)  # skip list type tag
            elif cid == b"avih" and size >= 4:
                (usec_per_frame,) = struct.unpack(
                    "<I", buf[body_start:body_start + 4])
                if usec_per_frame:
                    fps = 1e6 / usec_per_frame
            elif cid in (b"00dc", b"00db") and size > 0:
                frames.append(buf[body_start:body_start + size])
            pos = body_start + size + (size & 1)  # chunks pad to even

    walk(12, len(buf))
    if not frames:
        raise ValueError("AVI contains no video frames (00dc/00db)")
    return frames, fps


def encode_avi_mjpeg(jpeg_frames: list[bytes], fps: float = 10.0) -> bytes:
    """Wrap standalone JPEG payloads into a minimal MJPEG AVI container."""
    usec = int(round(1e6 / fps)) if fps > 0 else 0
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", usec, 0, 0, 0, len(jpeg_frames), 0, 1, 0, 0, 0, 0, 0, 0, 0)
    hdrl_body = b"hdrl" + avih
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = bytearray(b"movi")
    for f in jpeg_frames:
        movi_body += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + bytes(movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def _riff_chunks(buf: bytes):
    """Walk the chunk list of a RIFF-WAVE container → (fourcc, payload).
    Chunks are word-aligned (odd sizes carry one pad byte)."""
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        size = int.from_bytes(buf[pos + 4:pos + 8], "little")
        yield cid, buf[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)


def ulaw_to_linear(b: np.ndarray) -> np.ndarray:
    """ITU-T G.711 µ-law bytes → int64 linear samples in [-32124, 32124].
    Classic expansion: complement, then ((mant·8 + 132) << exp) − 132."""
    u = (~np.asarray(b, dtype=np.int64)) & 0xFF
    mag = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    mag -= 0x84
    return np.where(u & 0x80, -mag, mag)


def alaw_to_linear(b: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law bytes → int64 linear samples in [-32256, 32256].
    Classic expansion: XOR 0x55, then segment-scaled mantissa."""
    a = np.asarray(b, dtype=np.int64) ^ 0x55
    mant = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    mag = np.where(seg == 0, mant + 8, (mant + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, mag, -mag)


def linear_to_ulaw(x: np.ndarray) -> np.ndarray:
    """int linear samples → canonical G.711 µ-law bytes (encoder, used by
    tests and synthetic-clip generators)."""
    x = np.asarray(x, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int64)
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8)


def linear_to_alaw(x: np.ndarray) -> np.ndarray:
    """int linear samples → canonical G.711 A-law bytes."""
    x = np.asarray(x, dtype=np.int64)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32767)
    exp = np.maximum((np.floor(np.log2(np.maximum(mag, 1))) - 7), 0).astype(np.int64)
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    return (((sign | (exp << 4) | mant) ^ 0x55) & 0xFF).astype(np.uint8)


_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int64)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def adpcm_ima_decode(data: bytes, block_align: int,
                     nch: int = 1) -> np.ndarray:
    """IMA ADPCM (WAV format tag 0x11) → int64 linear samples, channels
    interleaved per sample frame for ``nch > 1``.

    Block-PARALLEL: every block carries its own per-channel
    (predictor, step-index) header, so the sequential nibble recurrence
    runs once per sample POSITION with all (block, channel) states
    advanced together in numpy — decode cost is O(samples_per_block)
    Python steps regardless of clip length.  Stereo payloads interleave
    4-byte (8-nibble) words per channel, per the WAV spec."""
    ba, nch = int(block_align), int(nch)
    if nch < 1:
        raise ValueError("nch must be >= 1")
    if ba < 4 * nch:
        raise ValueError("IMA ADPCM block_align must be >= 4 per channel")
    n_blocks = len(data) // ba
    if n_blocks == 0:
        return np.zeros(0, dtype=np.int64)
    blk = np.frombuffer(data[:n_blocks * ba], dtype=np.uint8).reshape(
        n_blocks, ba)
    # per-channel 4-byte headers: int16 predictor, step index, reserved
    head = blk[:, :4 * nch].reshape(n_blocks, nch, 4).astype(np.int64)
    pred = head[:, :, 0] | (head[:, :, 1] << 8)
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)  # (blocks, nch)
    index = np.clip(head[:, :, 2], 0, 88)
    payload = blk[:, 4 * nch:].astype(np.int64)
    # de-interleave the per-channel 4-byte words, then split nibbles
    # low-first: (blocks, words, nch, 4) -> (blocks, nch, words*4).
    # Mono skips the word regrouping so partial trailing words decode too.
    if nch == 1:
        by_ch = payload[:, None, :]
    else:
        n_words = payload.shape[1] // (4 * nch)
        by_ch = payload[:, :n_words * 4 * nch].reshape(
            n_blocks, n_words, nch, 4).transpose(0, 2, 1, 3).reshape(
            n_blocks, nch, n_words * 4)
    nibbles = np.empty((n_blocks, nch, by_ch.shape[2] * 2), dtype=np.int64)
    nibbles[:, :, 0::2] = by_ch & 0x0F
    nibbles[:, :, 1::2] = by_ch >> 4
    out = np.empty((n_blocks, 1 + nibbles.shape[2], nch), dtype=np.int64)
    out[:, 0, :] = pred  # the header predictor IS sample frame 0
    for t in range(nibbles.shape[2]):
        d = nibbles[:, :, t]
        step = _IMA_STEPS[index]
        diff = (step >> 3)
        diff += np.where(d & 4, step, 0)
        diff += np.where(d & 2, step >> 1, 0)
        diff += np.where(d & 1, step >> 2, 0)
        pred = np.clip(pred + np.where(d & 8, -diff, diff), -32768, 32767)
        index = np.clip(index + _IMA_INDEX_ADJ[d & 7], 0, 88)
        out[:, t + 1, :] = pred
    return out.reshape(-1)  # (blocks · frames · channels), frame-interleaved


def adpcm_ima_encode(samples: np.ndarray, block_align: int = 1024) -> bytes:
    """int linear samples → IMA ADPCM blocks (mono, WAV tag 0x11 layout).
    Sequential reference encoder — used by tests and synthetic clips."""
    x = np.asarray(samples, dtype=np.int64)
    spb = (block_align - 4) * 2 + 1  # samples per block incl. header sample
    out = bytearray()
    pos = 0
    index = 0
    while pos < len(x):
        chunk = x[pos:pos + spb]
        pred = int(np.clip(chunk[0], -32768, 32767))
        out += int(pred & 0xFFFF).to_bytes(2, "little")
        out += bytes([index, 0])
        nibs = []
        for s in chunk[1:]:
            step = int(_IMA_STEPS[index])
            delta = int(s) - pred
            d = 0
            if delta < 0:
                d = 8
                delta = -delta
            diff = step >> 3
            if delta >= step:
                d |= 4
                delta -= step
                diff += step
            if delta >= step >> 1:
                d |= 2
                delta -= step >> 1
                diff += step >> 1
            if delta >= step >> 2:
                d |= 1
                diff += step >> 2
            pred = int(np.clip(pred + (-diff if d & 8 else diff),
                               -32768, 32767))
            index = int(np.clip(index + _IMA_INDEX_ADJ[d & 7], 0, 88))
            nibs.append(d)
        nibs += [0] * ((block_align - 4) * 2 - len(nibs))
        for lo, hi in zip(nibs[0::2], nibs[1::2]):
            out.append(lo | (hi << 4))
        pos += spb
    return bytes(out)


def wrap_wav_adpcm(payload: bytes, rate: int, block_align: int) -> bytes:
    """Raw IMA ADPCM blocks → a WAV container (format tag 0x11, mono;
    fmt extension carries samples_per_block as the spec requires)."""
    spb = (block_align - 4) * 2 + 1
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, rate,
                      rate * block_align // max(spb, 1), block_align, 4,
                      2, spb)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def wrap_wav_g711(payload: bytes, rate: int, tag: int) -> bytes:
    """Raw G.711 bytes → a WAV container (format tag 7 = µ-law, 6 = A-law;
    18-byte fmt chunk with cbSize=0 as non-PCM requires)."""
    if tag not in (6, 7):
        raise ValueError("tag must be 6 (A-law) or 7 (u-law)")
    fmt = struct.pack("<HHIIHHH", tag, 1, rate, rate, 1, 8, 0)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
            + (b"\x00" if len(payload) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def encode_wav_g711(samples: np.ndarray, rate: int, law: str = "ulaw") -> bytes:
    """int linear samples → a G.711 WAV container."""
    if law == "ulaw":
        return wrap_wav_g711(linear_to_ulaw(samples).tobytes(), rate, 7)
    if law == "alaw":
        return wrap_wav_g711(linear_to_alaw(samples).tobytes(), rate, 6)
    raise ValueError("law must be 'ulaw' or 'alaw'")


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 mono samples in [-1, 1], sample_rate).

    PCM (8/16/32-bit) goes through the stdlib ``wave`` reader; G.711
    µ-law/A-law (format tags 7/6) through the exact integer expanders
    above, normalized by /32768.  Other compressed tags (IMA ADPCM 0x11,
    MP3 0x55, …) raise naming the tag rather than mis-parsing."""
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        fmt = data = None
        for cid, payload in _riff_chunks(buf):
            if cid == b"fmt " and fmt is None:
                fmt = payload
            elif cid == b"data" and data is None:
                data = payload
        if fmt is not None and len(fmt) >= 16:
            tag, nch, rate = struct.unpack_from("<HHI", fmt, 0)

            def _norm_mono(lin: np.ndarray) -> np.ndarray:
                # shared by the compressed branches: /32768 normalize,
                # then average interleaved channels down to mono
                x = lin.astype(np.float64) / 32768.0
                if nch > 1:
                    x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
                return x

            if tag in (6, 7, 0x11):
                if data is None:
                    raise ValueError(
                        f"WAV format tag 0x{tag:02x} is supported but the "
                        "container has no 'data' chunk (truncated or "
                        "malformed RIFF)"
                    )
                if tag in (6, 7):
                    raw = np.frombuffer(data, dtype=np.uint8)
                    lin = (ulaw_to_linear(raw) if tag == 7
                           else alaw_to_linear(raw))
                else:
                    nblock = struct.unpack_from("<H", fmt, 12)[0]
                    lin = adpcm_ima_decode(data, nblock, nch=nch)
                return _norm_mono(lin), rate
            if tag not in (1, 3, 0xFFFE):
                raise NotImplementedError(
                    f"WAV format tag 0x{tag:02x} unsupported (PCM, "
                    "G.711 u-law/A-law, IMA ADPCM are; MP3-in-WAV needs "
                    "a codec library)"
                )
    with wave.open(io.BytesIO(buf), "rb") as wf:
        nch, sw, rate, nframes = (wf.getnchannels(), wf.getsampwidth(),
                                  wf.getframerate(), wf.getnframes())
        frames = wf.readframes(nframes)
    if sw == 1:
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} unsupported")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def to_luma(img: np.ndarray) -> np.ndarray:
    """(h, w, c) uint8 → (h, w) int64 luma (BT.601 integer weights; exact
    and engine-replayable: (299 R + 587 G + 114 B) // 1000)."""
    img = np.asarray(img, dtype=np.int64)
    c = img.shape[2]
    if c == 1:
        return img[:, :, 0]
    if c == 2:  # gray + alpha
        return img[:, :, 0]
    return (299 * img[:, :, 0] + 587 * img[:, :, 1] + 114 * img[:, :, 2]) // 1000
