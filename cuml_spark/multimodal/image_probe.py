"""Image HEADER probing — dimensions/format/depth without decoding.

A crawl-scale multimodal pipeline filters images by dimensions and
format long before it decodes pixels (thumbnail cutoffs, aspect-ratio
gates, format routing).  Every mainstream format publishes those in a
fixed header: PNG IHDR, JPEG SOFn segments, the GIF logical screen
descriptor, BMP BITMAPINFOHEADER, netpbm ASCII headers, TIFF IFD tags,
WebP VP8/VP8L/VP8X chunk headers (RFC 9649), and AVIF/HEIF ``ispe``
property boxes inside the ISO-BMFF ``meta`` tree.  Parsing them needs a
few dozen bytes and no codec — so blobs whose pixels this repo cannot
decode (WebP, AVIF/HEIF) still ROUTE correctly; their pixel decode
remains a named-dependency refusal in :mod:`cuml_spark.multimodal.media`.

Spark shape: :func:`probe_image` is a per-partition ``mapInPandas`` —
one metadata row per parseable blob, unparseable blobs filter (the
probe-tier semantic shared with ``probe_media`` / ``probe_audio`` /
``probe_h264``), bytes never shuffle and never reach the driver.

Reference surface note: the reference engine has no media tier — this is
part of the training-data-pipeline brief.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

from cuml_spark.multimodal.mp4 import _find, _walk
from cuml_spark.multimodal.probe_base import probe_map

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# SOF markers carrying frame headers (C0-CF minus DHT C4, DAC CC)
_JPEG_SOFS = set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _probe_png(buf: bytes) -> dict:
    if buf[:8] != _PNG_SIG or len(buf) < 29 or buf[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h, depth, color = struct.unpack(">IIBB", buf[16:26])
    return {"format": "png", "width": w, "height": h, "bit_depth": depth,
            "channels": _PNG_CHANNELS.get(color)}


def _probe_jpeg(buf: bytes) -> dict:
    if buf[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = buf[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2  # standalone markers
            continue
        (seglen,) = struct.unpack(">H", buf[pos + 2:pos + 4])
        if marker in _JPEG_SOFS:
            if pos + 10 > len(buf):  # the unpack below reads [pos+4, pos+10)
                raise ValueError("truncated SOF segment")
            depth, h, w, ncomp = struct.unpack(
                ">BHHB", buf[pos + 4:pos + 10])
            sub = {0xC0: "baseline", 0xC1: "extended", 0xC2: "progressive",
                   0xC3: "lossless"}.get(marker, f"sof{marker - 0xC0}")
            return {"format": f"jpeg-{sub}", "width": w, "height": h,
                    "bit_depth": depth, "channels": ncomp}
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS before any SOF
            break
        pos += 2 + seglen
    raise ValueError("JPEG without a SOF header")


def _probe_gif(buf: bytes) -> dict:
    if buf[:6] not in (b"GIF87a", b"GIF89a") or len(buf) < 11:
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", buf[6:10])
    depth = ((buf[10] >> 4) & 0x7) + 1  # colour resolution bits
    return {"format": "gif", "width": w, "height": h, "bit_depth": depth,
            "channels": None}


def _probe_bmp(buf: bytes) -> dict:
    if buf[:2] != b"BM" or len(buf) < 26:
        raise ValueError("not a BMP")
    # the DIB header SIZE field at 14 selects the layout: 12 = OS/2
    # BITMAPCOREHEADER (u16 w/h), >= 40 = BITMAPINFOHEADER family
    # (i32 w/h) — reading core files with the info layout fuses
    # width|height<<16 into garbage dimensions
    (dib,) = struct.unpack("<I", buf[14:18])
    if dib == 12:
        w, h = struct.unpack("<HH", buf[18:22])
        (bpp,) = struct.unpack("<H", buf[24:26])
    elif dib >= 40 and len(buf) >= 30:
        w, h = struct.unpack("<ii", buf[18:26])
        h = abs(h)
        (bpp,) = struct.unpack("<H", buf[28:30])
    else:
        raise ValueError(f"unsupported BMP DIB header size {dib}")
    return {"format": "bmp", "width": w, "height": h,
            "bit_depth": min(bpp, 8) if bpp else None,
            "channels": bpp // 8 if bpp >= 8 else 1}


def _probe_ppm(buf: bytes) -> dict:
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("not a netpbm image")
    # header: magic, width, height, maxval as whitespace/comment-separated
    # ASCII tokens
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3 and i < len(buf):
        c = buf[i:i + 1]
        if c == b"#":
            while i < len(buf) and buf[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(buf) and not buf[j:j + 1].isspace():
                j += 1
            toks.append(buf[i:j])
            i = j
    if len(toks) < 3:
        raise ValueError("truncated netpbm header")
    if any(len(t) > 9 for t in toks):  # ASCII fields are unbounded —
        # a crafted 10^23 "width" must filter, not overflow int64 later
        raise ValueError("implausible netpbm header field")
    w, h, maxval = (int(t) for t in toks)
    return {"format": "ppm", "width": w, "height": h,
            "bit_depth": 16 if maxval > 255 else 8,
            "channels": 3 if buf[:2] == b"P6" else 1}


def _probe_tiff(buf: bytes) -> dict:
    if buf[:4] == b"II*\x00":
        bo = "<"
    elif buf[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    try:
        (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
        (n,) = struct.unpack(bo + "H", buf[ifd_off:ifd_off + 2])
        tags: dict[int, int] = {}
        for k in range(n):
            e = ifd_off + 2 + 12 * k
            tag, typ, count = struct.unpack(bo + "HHI", buf[e:e + 8])
            if tag in (256, 257, 258, 277) and count == 1:
                fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
                if fmt:
                    tags[tag] = struct.unpack_from(bo + fmt, buf, e + 8)[0]
        return {"format": "tiff", "width": tags[256], "height": tags[257],
                "bit_depth": tags.get(258), "channels": tags.get(277)}
    except (struct.error, KeyError, IndexError):
        raise ValueError("truncated TIFF header") from None


def _probe_webp(buf: bytes) -> dict:
    if buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    pos = 12
    while pos + 8 <= len(buf):
        four = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body = buf[pos + 8:pos + 8 + size]
        if four == b"VP8 " and len(body) >= 10:
            # 3-byte frame tag, 3-byte start code, then 14-bit w/h LE
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("VP8 start code missing")
            w, h = struct.unpack("<HH", body[6:10])
            return {"format": "webp-lossy", "width": w & 0x3FFF,
                    "height": h & 0x3FFF, "bit_depth": 8, "channels": 3}
        if four == b"VP8L" and len(body) >= 5:
            if body[0] != 0x2F:
                raise ValueError("VP8L signature missing")
            bits = int.from_bytes(body[1:5], "little")
            return {"format": "webp-lossless",
                    "width": (bits & 0x3FFF) + 1,
                    "height": ((bits >> 14) & 0x3FFF) + 1, "bit_depth": 8,
                    "channels": 4 if (bits >> 28) & 1 else 3}
        if four == b"VP8X" and len(body) >= 10:
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return {"format": "webp-extended", "width": w, "height": h,
                    "bit_depth": 8,
                    "channels": 4 if body[0] & 0x10 else 3}
        pos += 8 + size + (size & 1)  # RIFF chunks pad to even
    raise ValueError("WebP without a VP8/VP8L/VP8X chunk")


def _probe_avif(buf: bytes) -> dict:
    """AVIF/HEIF: ``ispe`` (image spatial extents) property inside
    ``meta``/``iprp``/``ipco``.  ``meta`` is a FULL box — 4 bytes of
    version/flags precede its children."""
    brand = None
    for four, s, e in _walk(buf, 0, len(buf)):
        if four == b"ftyp":
            brand = buf[s:s + 4].decode("latin1")
            break
    if brand not in ("avif", "avis", "heic", "heix", "mif1", "msf1"):
        raise ValueError("not an AVIF/HEIF file")
    meta = _find(buf, 0, len(buf), b"meta")
    if meta is None:
        raise ValueError("AVIF without a meta box")
    iprp = _find(buf, meta[0] + 4, meta[1], b"iprp")
    ipco = iprp and _find(buf, iprp[0], iprp[1], b"ipco")
    ispe = ipco and _find(buf, ipco[0], ipco[1], b"ispe")
    if not ispe or ispe[1] - ispe[0] < 12:
        raise ValueError("AVIF without an ispe property")
    w, h = struct.unpack(">II", buf[ispe[0] + 4:ispe[0] + 12])
    return {"format": "avif" if brand.startswith("avi") else "heif",
            "width": w, "height": h, "bit_depth": None, "channels": None}


_PROBES = (_probe_png, _probe_jpeg, _probe_gif, _probe_bmp, _probe_ppm,
           _probe_tiff, _probe_webp, _probe_avif)


def probe_image_bytes(buf: bytes) -> dict:
    """Sniff one image blob by magic bytes; ValueError when no format
    claims it."""
    for probe in _PROBES:
        try:
            return probe(buf)
        except ValueError:
            continue
    raise ValueError("unrecognized image format")


IMAGE_PROBE_SCHEMA = ("media_id long, format string, width long, "
                      "height long, bit_depth long, channels long")

_COLS = ["media_id", "format", "width", "height", "bit_depth", "channels"]


def _rows(mid: int, buf: bytes) -> list[tuple]:
    m = probe_image_bytes(buf)
    return [(mid, m["format"], m["width"], m["height"], m["bit_depth"],
             m["channels"])]


def probe_image(df: DataFrame, content_col: str = "content",
                id_col: str = "media_id") -> DataFrame:
    """binary image blobs → one (format, width, height, depth, channels)
    row per parseable blob; NULL/garbage rows filter (the shared
    probe-tier kernel in :mod:`cuml_spark.multimodal.probe_base`).
    Map-only."""
    return probe_map(df, _rows, _COLS, IMAGE_PROBE_SCHEMA, _COLS[2:],
                     content_col=content_col, id_col=id_col)
