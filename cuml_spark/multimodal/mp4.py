"""MP4 / ISO-BMFF container METADATA parsing — no codec, no dependency.

A training-data pipeline routes video by container metadata long before it
decodes a frame: codec fourcc, dimensions, duration, sample counts decide
filtering, bucketing and sampling policy.  All of that lives in the plain
box structure of ISO/IEC 14496-12 (`ftyp`/`moov`/`trak`/`mdia`/`stbl`),
which parses with nothing but ``struct`` — only the `mdat` payload needs a
real codec, and that stays opaque here (frame DECODE still raises in
:mod:`cuml_spark.multimodal.media`, naming the dependency).

Spark shape: :func:`probe_media` is a per-partition ``mapInPandas`` over
binary content — at 100 TB each task probes its own partition's blobs,
reads only the first bytes it needs (`moov` precedes `mdat` in
fast-start files), and emits one small row per track; bytes never shuffle
and never reach the driver.

A matching :func:`build_mp4` writer produces structurally valid skeletons
(empty ``mdat``) so tests and oracles can round-trip without ffmpeg.

Reference surface note: the reference engine (dense-matrix data model) has
no media tier — this is part of the training-data-pipeline brief.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame


# ---------------------------------------------------------------------------
# box walking
# ---------------------------------------------------------------------------

def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for the sibling boxes in
    ``buf[start:end]``.  Handles 64-bit largesize (size == 1) and
    to-end-of-file boxes (size == 0); malformed sizes stop the walk rather
    than loop."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos:pos + 4], "big")
        four = buf[pos + 4:pos + 8]
        head = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(buf[pos + 8:pos + 16], "big")
            head = 16
        elif size == 0:
            size = end - pos
        if size < head or pos + size > end:
            return
        yield four, pos + head, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, four: bytes):
    for f, s, e in _walk(buf, start, end):
        if f == four:
            return s, e
    return None


def parse_mp4(buf: bytes) -> dict:
    """ISO-BMFF bytes → container metadata.

    → ``{"brand", "movie_timescale", "movie_duration", "tracks": [
    {"track_id", "handler", "codec", "width", "height", "timescale",
    "duration", "n_samples"}, ...]}``.  Raises ``ValueError`` when the
    bytes are not ISO-BMFF (no ``ftyp``/``moov``) — including when a
    box is well-sized for the walker but its payload is truncated
    below the fields read here (struct/index errors would otherwise
    escape probe_media's ValueError-only filter and kill the task)."""
    try:
        return _parse_mp4_inner(buf)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated ISO-BMFF box payload: {e}") from None


def _parse_mp4_inner(buf: bytes) -> dict:
    out: dict = {"brand": None, "movie_timescale": None,
                 "movie_duration": None, "tracks": []}
    moov = None
    for four, s, e in _walk(buf, 0, len(buf)):
        if four == b"ftyp":
            out["brand"] = buf[s:s + 4].decode("latin1")
        elif four == b"moov":
            moov = (s, e)
    if out["brand"] is None and moov is None:
        raise ValueError("not an ISO-BMFF container (no ftyp/moov box)")
    if moov is None:
        return out
    ms, me = moov
    mvhd = _find(buf, ms, me, b"mvhd")
    if mvhd:
        v = buf[mvhd[0]]
        if v == 1:  # 64-bit creation/modification/duration
            ts, dur = struct.unpack_from(">IQ", buf, mvhd[0] + 20)
        else:
            ts, dur = struct.unpack_from(">II", buf, mvhd[0] + 12)
        out["movie_timescale"], out["movie_duration"] = ts, dur
    for four, s, e in _walk(buf, ms, me):
        if four != b"trak":
            continue
        trk: dict = {"track_id": None, "handler": None, "codec": None,
                     "width": None, "height": None, "timescale": None,
                     "duration": None, "n_samples": None}
        tkhd = _find(buf, s, e, b"tkhd")
        if tkhd:
            v = buf[tkhd[0]]
            off = tkhd[0] + (4 + 8 + 8 if v == 1 else 4 + 4 + 4)
            trk["track_id"] = struct.unpack_from(">I", buf, off)[0]
            # width/height: 16.16 fixed point, last 8 payload bytes
            w, h = struct.unpack_from(">II", buf, tkhd[1] - 8)
            trk["width"], trk["height"] = w >> 16, h >> 16
        mdia = _find(buf, s, e, b"mdia")
        if mdia:
            mdhd = _find(buf, mdia[0], mdia[1], b"mdhd")
            if mdhd:
                v = buf[mdhd[0]]
                if v == 1:
                    ts, dur = struct.unpack_from(">IQ", buf, mdhd[0] + 20)
                else:
                    ts, dur = struct.unpack_from(">II", buf, mdhd[0] + 12)
                trk["timescale"], trk["duration"] = ts, dur
            hdlr = _find(buf, mdia[0], mdia[1], b"hdlr")
            if hdlr:
                trk["handler"] = buf[hdlr[0] + 8:hdlr[0] + 12].decode("latin1")
            minf = _find(buf, mdia[0], mdia[1], b"minf")
            stbl = minf and _find(buf, minf[0], minf[1], b"stbl")
            if stbl:
                stsd = _find(buf, stbl[0], stbl[1], b"stsd")
                if stsd and struct.unpack_from(">I", buf, stsd[0] + 4)[0] > 0:
                    trk["codec"] = buf[stsd[0] + 12:stsd[0] + 16].decode("latin1")
                stsz = _find(buf, stbl[0], stbl[1], b"stsz")
                if stsz:
                    trk["n_samples"] = struct.unpack_from(
                        ">I", buf, stsz[0] + 8)[0]
        out["tracks"].append(trk)
    return out


# ---------------------------------------------------------------------------
# minimal writer (structural skeletons for tests / oracles)
# ---------------------------------------------------------------------------

def _box(four: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + four + payload


def build_mp4(tracks: list[dict], movie_timescale: int = 1000,
              movie_duration: int = 0, brand: str = "isom") -> bytes:
    """Structurally valid ISO-BMFF skeleton (empty ``mdat``) from track
    specs ``{"handler": "vide"|"soun", "codec": 4cc, "width", "height",
    "timescale", "duration", "n_samples"}`` — enough for
    :func:`parse_mp4` round trips and planted-metadata oracles."""
    ftyp = _box(b"ftyp", brand.encode("latin1")[:4].ljust(4) +
                struct.pack(">I", 0) + b"isom" + b"mp41")
    mvhd = _box(b"mvhd", struct.pack(
        ">BxxxIIIIi", 0, 0, 0, movie_timescale, movie_duration, 0x00010000)
        + b"\x01\x00" + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", len(tracks) + 1))
    traks = b""
    for i, t in enumerate(tracks):
        w, h = int(t.get("width") or 0), int(t.get("height") or 0)
        tkhd = _box(b"tkhd", struct.pack(
            ">BxxxIIIII", 0, 0, 0, i + 1, 0, int(t.get("duration") or 0))
            + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">II", w << 16, h << 16))
        mdhd = _box(b"mdhd", struct.pack(
            ">BxxxIIII", 0, 0, 0, int(t.get("timescale") or movie_timescale),
            int(t.get("duration") or 0)) + struct.pack(">HH", 0x55C4, 0))
        hdlr = _box(b"hdlr", struct.pack(">BxxxI", 0, 0)
                    + t["handler"].encode("latin1")[:4].ljust(4)
                    + b"\x00" * 12 + b"\x00")
        entry = _box(t["codec"].encode("latin1")[:4].ljust(4),
                     b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70)
        stsd = _box(b"stsd", struct.pack(">BxxxI", 0, 1) + entry)
        stsz = _box(b"stsz", struct.pack(
            ">BxxxII", 0, 0, int(t.get("n_samples") or 0)))
        stbl = _box(b"stbl", stsd + stsz)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        traks += _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov + _box(b"mdat", b"")


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_PROBE_SCHEMA = ("media_id long, brand string, movie_timescale long, "
                 "track_id long, handler string, codec string, "
                 "width long, height long, n_samples long, duration long")


_PROBE_COLS = ["media_id", "brand", "movie_timescale", "track_id",
               "handler", "codec", "width", "height", "n_samples",
               "duration"]
_PROBE_INT_COLS = ["movie_timescale", "track_id", "width", "height",
                   "n_samples", "duration"]


def _rows(mid: int, buf: bytes) -> list[tuple]:
    meta = parse_mp4(buf)
    return [(mid, meta["brand"], meta["movie_timescale"],
             trk["track_id"], trk["handler"], trk["codec"], trk["width"],
             trk["height"], trk["n_samples"], trk["duration"])
            for trk in meta["tracks"]]


def probe_media(df: DataFrame, content_col: str = "content",
                id_col: str = "media_id") -> DataFrame:
    """binary ISO-BMFF → one row per TRACK of container metadata.

    Per-partition ``mapInPandas``; unparseable and NULL blobs yield zero
    rows (the probe-tier filter semantic — shared kernel in
    :mod:`cuml_spark.multimodal.probe_base`, which also filters crafted
    u64 header fields past int64 instead of failing the Arrow cast).
    Bytes stay on the executors."""
    from cuml_spark.multimodal.probe_base import probe_map

    return probe_map(df, _rows, _PROBE_COLS, _PROBE_SCHEMA,
                     _PROBE_INT_COLS, content_col=content_col,
                     id_col=id_col)
