"""Compressed-audio HEADER probing (MP3 / ADTS-AAC / FLAC / Ogg) — no
codec, no dependency.

A training-data pipeline routes audio by stream metadata long before it
decodes a sample: codec, sample rate, channel count, frame/sample totals
decide filtering, bucketing and duration quotas.  For the common
compressed formats all of that lives in fixed public header structures —
MP3 frame headers (ISO/IEC 11172-3 / 13818-3) with the de-facto Xing VBR
tag, ADTS AAC headers (ISO/IEC 13818-7 / 14496-3), the FLAC STREAMINFO
metadata block, and Ogg page headers with the Opus (RFC 7845) / Vorbis I
identification packets.  Only the entropy-coded payload needs a real
codec, and that stays opaque here (sample DECODE of these formats still
raises in :mod:`cuml_spark.multimodal.media`, naming the dependency).

Spark shape: :func:`probe_audio` is a per-partition ``mapInPandas`` over
binary content — at 100 TB each task probes its own partition's blobs and
emits one small metadata row per blob; bytes never shuffle and never
reach the driver.  The plan is map-only (plan-gated: zero exchanges).

Matching :func:`build_mp3` / :func:`build_adts` / :func:`build_flac` /
:func:`build_ogg` writers produce structurally valid streams (zeroed
payloads) so tests and oracles can plant every parameter and round-trip
without ffmpeg.

Reference surface note: the reference engine (dense-matrix data model)
has no media tier — this is part of the training-data-pipeline brief.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

from cuml_spark.multimodal.probe_base import probe_map

# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 Layer III) — public header tables
# ---------------------------------------------------------------------------

# bitrate_index 1..14 → kbps (index 0 = "free format", 15 = invalid)
MP3_BITRATES_V1 = (32, 40, 48, 56, 64, 80, 96, 112, 128,
                   160, 192, 224, 256, 320)
MP3_BITRATES_V2 = (8, 16, 24, 32, 40, 48, 56, 64, 80,
                   96, 112, 128, 144, 160)
# sample-rate index 0..2 per version (3 = reserved)
MP3_RATES = {"1": (44100, 48000, 32000),
             "2": (22050, 24000, 16000),
             "2.5": (11025, 12000, 8000)}
_MP3_VERSION_BITS = {0b00: "2.5", 0b10: "2", 0b11: "1"}  # 0b01 reserved
# Layer III side-info size (bytes) by (version == MPEG1, mono)
_MP3_SIDEINFO = {(True, True): 17, (True, False): 32,
                 (False, True): 9, (False, False): 17}


def _mp3_frame_len(version: str, bitrate_kbps: int, sample_rate: int,
                   padding: int) -> int:
    # Layer III: samples_per_frame/8 × bitrate ÷ sample_rate (+1 pad byte)
    coef = 144 if version == "1" else 72  # 1152 vs 576 samples/frame
    return (coef * bitrate_kbps * 1000) // sample_rate + padding


def parse_mp3(buf: bytes) -> dict:
    """Walk every MP3 frame header; return stream metadata.

    Skips a leading ID3v2 tag (syncsafe size).  CBR streams report the
    common ``bitrate_kbps``; mixed-bitrate (VBR) streams report None.  A
    Xing/Info tag in the first frame contributes ``xing_frames`` (the
    encoder's audio-frame count, which by convention excludes the tag
    frame itself).  Raises ValueError on anything that is not a Layer III
    stream."""
    pos = 0
    if buf[:3] == b"ID3" and len(buf) >= 10:
        size = 0
        for b in buf[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    n_frames = n_samples = 0
    sample_rate = channels = None
    version = None
    bitrates: set[int] = set()
    xing_frames = None
    while pos + 4 <= len(buf):
        b0, b1, b2, b3 = buf[pos:pos + 4]
        if not (b0 == 0xFF and (b1 & 0xE0) == 0xE0):
            break
        ver = _MP3_VERSION_BITS.get((b1 >> 3) & 0x3)
        layer = (b1 >> 1) & 0x3
        if ver is None or layer != 0b01:  # only Layer III here
            raise ValueError("not an MPEG Layer III frame")
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("free-format/invalid MP3 header")
        table = MP3_BITRATES_V1 if ver == "1" else MP3_BITRATES_V2
        kbps = table[br_idx - 1]
        sr = MP3_RATES[ver][sr_idx]
        padding = (b2 >> 1) & 0x1
        mono = (b3 >> 6) == 0b11
        if sample_rate is None:
            sample_rate, channels, version = sr, 1 if mono else 2, ver
        if n_frames == 0:
            off = pos + 4 + _MP3_SIDEINFO[(ver == "1", mono)]
            tag = buf[off:off + 4]
            if tag in (b"Xing", b"Info") and off + 12 <= len(buf):
                (flags,) = struct.unpack(">I", buf[off + 4:off + 8])
                if flags & 0x1:
                    (xing_frames,) = struct.unpack(
                        ">I", buf[off + 8:off + 12])
        bitrates.add(kbps)
        n_frames += 1
        n_samples += 1152 if ver == "1" else 576
        pos += _mp3_frame_len(ver, kbps, sr, padding)
    if n_frames == 0:
        raise ValueError("no MP3 frames")
    return {"codec": "mp3", "profile": f"mpeg{version}-layer3",
            "sample_rate": sample_rate, "channels": channels,
            "bits_per_sample": None, "n_frames": n_frames,
            "n_samples": n_samples,
            "bitrate_kbps": bitrates.pop() if len(bitrates) == 1 else None,
            "xing_frames": xing_frames}


def build_mp3(n_frames: int, version: str = "1", bitrate_kbps: int = 128,
              sample_rate: int = 44100, mono: bool = False,
              xing_frames: int | None = None) -> bytes:
    """Structurally valid CBR Layer III stream with zeroed payloads.

    ``xing_frames`` plants a Xing tag at the correct side-info offset of
    the FIRST frame (the extra tag frame is NOT added — callers plant
    whatever count they want the parser to report)."""
    table = MP3_BITRATES_V1 if version == "1" else MP3_BITRATES_V2
    br_idx = table.index(bitrate_kbps) + 1
    sr_idx = MP3_RATES[version].index(sample_rate)
    ver_bits = {"1": 0b11, "2": 0b10, "2.5": 0b00}[version]
    b1 = 0xE0 | (ver_bits << 3) | (0b01 << 1) | 0x1  # L3, no CRC
    b2 = (br_idx << 4) | (sr_idx << 2)  # padding 0
    b3 = (0b11 if mono else 0b00) << 6
    flen = _mp3_frame_len(version, bitrate_kbps, sample_rate, 0)
    frame = bytearray(flen)
    frame[0:4] = bytes((0xFF, b1, b2, b3))
    out = bytearray()
    for i in range(n_frames):
        f = bytearray(frame)
        if i == 0 and xing_frames is not None:
            off = 4 + _MP3_SIDEINFO[(version == "1", mono)]
            if off + 12 > flen:
                raise ValueError(
                    f"frame too small ({flen}B) for a Xing tag at {off}")
            f[off:off + 12] = b"Xing" + struct.pack(">II", 0x1, xing_frames)
        out += f
    return bytes(out)


# ---------------------------------------------------------------------------
# ADTS AAC
# ---------------------------------------------------------------------------

ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
              16000, 12000, 11025, 8000, 7350)
ADTS_PROFILES = ("aac-main", "aac-lc", "aac-ssr", "aac-ltp")


def parse_adts(buf: bytes) -> dict:
    """Walk ADTS frame headers (7 bytes, 9 with CRC); 1024 samples per
    raw data block."""
    pos = 0
    n_frames = n_samples = 0
    sample_rate = channels = profile = None
    while pos + 7 <= len(buf):
        # 12-bit sync AND layer == 00 — an MPEG-audio (MP3) frame also
        # carries a 0xFFF-compatible sync but its layer bits are nonzero
        if not (buf[pos] == 0xFF and (buf[pos + 1] & 0xF6) == 0xF0):
            if n_frames == 0:
                raise ValueError("not an ADTS stream")
            break
        h = buf[pos:pos + 7]
        prof = h[2] >> 6
        sf_idx = (h[2] >> 2) & 0xF
        if sf_idx >= len(ADTS_RATES):
            raise ValueError("reserved ADTS sampling_frequency_index")
        ch = ((h[2] & 0x1) << 2) | (h[3] >> 6)
        flen = ((h[3] & 0x3) << 11) | (h[4] << 3) | (h[5] >> 5)
        rdb = (h[6] & 0x3) + 1
        if flen < 7:
            raise ValueError("ADTS frame_length below header size")
        if sample_rate is None:
            sample_rate = ADTS_RATES[sf_idx]
            channels = ch
            profile = ADTS_PROFILES[prof]
        n_frames += 1
        n_samples += 1024 * rdb
        pos += flen
    if n_frames == 0:
        raise ValueError("no ADTS frames")
    return {"codec": "aac-adts", "profile": profile,
            "sample_rate": sample_rate, "channels": channels,
            "bits_per_sample": None, "n_frames": n_frames,
            "n_samples": n_samples, "bitrate_kbps": None,
            "xing_frames": None}


def build_adts(n_frames: int, profile: int = 1, sample_rate: int = 44100,
               channels: int = 2, payload_len: int = 64) -> bytes:
    """Structurally valid ADTS stream (MPEG-4 ID, no CRC, one raw data
    block per frame) with zeroed payloads."""
    sf_idx = ADTS_RATES.index(sample_rate)
    flen = 7 + payload_len
    hdr = bytearray(7)
    hdr[0] = 0xFF
    hdr[1] = 0xF1  # MPEG-4, layer 00, protection_absent
    hdr[2] = (profile << 6) | (sf_idx << 2) | (channels >> 2)
    hdr[3] = ((channels & 0x3) << 6) | (flen >> 11)
    hdr[4] = (flen >> 3) & 0xFF
    hdr[5] = ((flen & 0x7) << 5) | 0x1F  # buffer fullness high (VBR-ish)
    hdr[6] = 0xFC  # fullness low | rdb-1 = 0
    return bytes(bytes(hdr) + b"\x00" * payload_len) * n_frames


# ---------------------------------------------------------------------------
# FLAC STREAMINFO
# ---------------------------------------------------------------------------

def parse_flac(buf: bytes) -> dict:
    """``fLaC`` magic → STREAMINFO metadata block (always first per the
    spec)."""
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    while pos + 4 <= len(buf):
        btype = buf[pos] & 0x7F
        last = bool(buf[pos] & 0x80)
        (length,) = struct.unpack(">I", b"\x00" + buf[pos + 1:pos + 4])
        body = buf[pos + 4:pos + 4 + length]
        if btype == 0:
            # check the ACTUAL body, not the declared length — a blob
            # truncated mid-STREAMINFO must filter, not yield garbage
            if length < 34 or len(body) < 34:
                raise ValueError("short STREAMINFO")
            packed = int.from_bytes(body[10:18], "big")
            sample_rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            return {"codec": "flac", "profile": None,
                    "sample_rate": sample_rate, "channels": channels,
                    "bits_per_sample": bps, "n_frames": None,
                    "n_samples": total, "bitrate_kbps": None,
                    "xing_frames": None}
        if last:
            break
        pos += 4 + length
    raise ValueError("FLAC missing STREAMINFO")


def build_flac(sample_rate: int, channels: int, bits_per_sample: int,
               n_samples: int) -> bytes:
    """fLaC header + STREAMINFO (zero MD5, no audio frames)."""
    packed = ((sample_rate << 44) | ((channels - 1) << 41)
              | ((bits_per_sample - 1) << 36) | n_samples)
    info = (struct.pack(">HH", 4096, 4096) + b"\x00" * 6
            + packed.to_bytes(8, "big") + b"\x00" * 16)
    assert len(info) == 34
    return b"fLaC" + bytes((0x80,)) + struct.pack(">I", 34)[1:] + info


# ---------------------------------------------------------------------------
# Ogg (Opus / Vorbis identification headers + granule positions)
# ---------------------------------------------------------------------------

def _ogg_pages(buf: bytes):
    pos = 0
    while buf[pos:pos + 4] == b"OggS" and pos + 27 <= len(buf):
        (granule,) = struct.unpack("<q", buf[pos + 6:pos + 14])
        nsegs = buf[pos + 26]
        lacing = buf[pos + 27:pos + 27 + nsegs]
        body = pos + 27 + nsegs
        size = sum(lacing)
        yield granule, buf[body:body + size]
        pos = body + size


def parse_ogg(buf: bytes) -> dict:
    """First-page identification packet + last-page granule position.

    Opus (RFC 7845): granule is 48 kHz samples; ``n_samples`` subtracts
    pre-skip and ``sample_rate`` reports the mandated 48000 decode rate.
    Vorbis I: granule is PCM samples at the stream rate."""
    pages = list(_ogg_pages(buf))
    if not pages:
        raise ValueError("not an Ogg stream")
    ident = pages[0][1]
    last_granule = pages[-1][0]
    if ident[:8] == b"OpusHead":
        if len(ident) < 19:  # RFC 7845 fixed ID-header size
            raise ValueError("truncated OpusHead")
        channels = ident[9]
        (pre_skip,) = struct.unpack("<H", ident[10:12])
        return {"codec": "ogg-opus", "profile": None, "sample_rate": 48000,
                "channels": channels, "bits_per_sample": None,
                "n_frames": None,
                "n_samples": max(0, last_granule - pre_skip),
                "bitrate_kbps": None, "xing_frames": None}
    if ident[:7] == b"\x01vorbis":
        if len(ident) < 16:
            raise ValueError("truncated Vorbis identification header")
        channels = ident[11]
        (rate,) = struct.unpack("<I", ident[12:16])
        return {"codec": "ogg-vorbis", "profile": None, "sample_rate": rate,
                "channels": channels, "bits_per_sample": None,
                "n_frames": None, "n_samples": last_granule,
                "bitrate_kbps": None, "xing_frames": None}
    raise ValueError("unknown Ogg codec identification header")


def _ogg_page(granule: int, serial: int, seq: int, packet: bytes,
              header_type: int = 0) -> bytes:
    lacing = bytes([255] * (len(packet) // 255) + [len(packet) % 255])
    return (b"OggS" + bytes((0, header_type))
            + struct.pack("<qIII", granule, serial, seq, 0)
            + bytes((len(lacing),)) + lacing + packet)


def build_ogg(codec: str, sample_rate: int, channels: int,
              n_samples: int, pre_skip: int = 312) -> bytes:
    """Two-page Ogg stream: identification header page + an EOS page whose
    granule position encodes the planted sample total."""
    if codec == "opus":
        ident = (b"OpusHead" + bytes((1, channels))
                 + struct.pack("<HIh", pre_skip, sample_rate, 0)
                 + bytes((0,)))
        granule = n_samples + pre_skip
    elif codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<IB", 0, channels)
                 + struct.pack("<Iiii", sample_rate, 0, 0, 0)
                 + bytes((0xB8, 0x01)))
        granule = n_samples
    else:
        raise ValueError(f"unknown ogg codec {codec!r}")
    return (_ogg_page(0, 1, 0, ident, header_type=2)
            + _ogg_page(granule, 1, 1, b"\x00" * 8, header_type=4))


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_SNIFFERS = (parse_flac, parse_ogg, parse_adts, parse_mp3)

AUDIO_PROBE_SCHEMA = (
    "media_id long, codec string, profile string, sample_rate long, "
    "channels long, bits_per_sample long, n_frames long, n_samples long, "
    "bitrate_kbps long, xing_frames long")

_PROBE_COLS = ["media_id", "codec", "profile", "sample_rate", "channels",
               "bits_per_sample", "n_frames", "n_samples", "bitrate_kbps",
               "xing_frames"]


def probe_stream(buf: bytes) -> dict:
    """Sniff one compressed-audio blob by magic bytes / syncword; raises
    ValueError when no parser claims it."""
    for sniff in _SNIFFERS:
        try:
            return sniff(buf)
        except ValueError:
            continue
    raise ValueError("unrecognized audio stream")


def _rows(mid: int, buf: bytes) -> list[tuple]:
    meta = probe_stream(buf)
    return [(mid,) + tuple(meta[c] for c in _PROBE_COLS[1:])]


def probe_audio(df: DataFrame, content_col: str = "content",
                id_col: str = "media_id") -> DataFrame:
    """binary compressed-audio → one metadata row per blob.

    Per-partition ``mapInPandas``; unparseable and NULL blobs yield zero
    rows (the probe-tier filter semantic — the shared kernel in
    :mod:`cuml_spark.multimodal.probe_base`).  Bytes stay on the
    executors; the plan is map-only."""
    return probe_map(df, _rows, _PROBE_COLS, AUDIO_PROBE_SCHEMA,
                     _PROBE_COLS[3:], content_col=content_col,
                     id_col=id_col)
