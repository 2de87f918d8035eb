"""H.264/AVC Annex-B elementary-stream METADATA probing — no codec, no
dependency.

Raw ``.h264``/``.264`` elementary streams (Annex-B byte streams: NAL
units delimited by ``00 00 01`` / ``00 00 00 01`` start codes) carry
everything a routing stage needs in their parameter sets: the SPS
(ITU-T H.264 §7.3.2.1, plain exp-Golomb fields) gives profile, level
and the cropped frame dimensions; NAL unit types count coded slices and
IDR random-access points.  Actual slice DECODE (CABAC/CAVLC residuals,
inter prediction) needs a real codec and stays out of scope — consistent
with :mod:`cuml_spark.multimodal.mp4` (containers parse, ``mdat`` stays
opaque) and :mod:`cuml_spark.multimodal.audio`.

Spark shape: :func:`probe_h264` is a per-partition ``mapInPandas`` over
binary content — one metadata row per blob, unparseable blobs filtered
(the probe-tier semantic), bytes never shuffle and never reach the
driver.  A matching :func:`build_h264` writer emits structurally valid
streams (real SPS bit syntax, zeroed slice payloads) so tests can plant
every parameter and round-trip without ffmpeg.

Reference surface note: the reference engine has no media tier — this is
part of the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from cuml_spark.multimodal.probe_base import probe_map

# NAL unit types (Table 7-1)
_NAL_SLICE = 1       # coded slice, non-IDR
_NAL_IDR = 5         # coded slice, IDR
_NAL_SPS = 7
_NAL_PPS = 8

_PROFILES = {66: "baseline", 77: "main", 88: "extended", 100: "high",
             110: "high10", 122: "high422", 244: "high444"}
# profiles whose SPS carries the chroma_format_idc block (§7.3.2.1.1)
_HIGH_PROFILE_IDCS = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138,
                      139, 134, 135}


class _BitReader:
    """MSB-first bit reader with unsigned/signed exp-Golomb (§9.1)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.buf):
                raise ValueError("SPS truncated mid-field")
            out = (out << 1) | ((self.buf[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("invalid exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _strip_emulation(rbsp: bytes) -> bytes:
    """Remove emulation-prevention bytes: 00 00 03 → 00 00 (§7.4.1.1)."""
    return rbsp.replace(b"\x00\x00\x03", b"\x00\x00")


def parse_sps(rbsp: bytes) -> dict:
    """SPS RBSP (emulation bytes already stripped) → profile/level and
    the CROPPED luma dimensions, per §7.3.2.1.1 / equations 7-13..7-22.
    Interlaced (frame_mbs_only_flag = 0) streams are refused by name —
    field-coding halves the per-picture height and the mbaff cases need
    decoder state this probe does not model."""
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1
    if profile_idc in _HIGH_PROFILE_IDCS:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            raise NotImplementedError(
                "SPS scaling matrices are not supported by this probe — "
                "dimensions past them need the full scaling-list syntax"
            )
    r.ue()  # log2_max_frame_num_minus4
    pic_order_cnt_type = r.ue()
    if pic_order_cnt_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif pic_order_cnt_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        raise NotImplementedError(
            "interlaced (frame_mbs_only_flag=0) H.264 streams are not "
            "supported by this probe"
        )
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # crop units for the LUMA plane: 4:2:0 crops in 2-sample units
    # horizontally and (2·(2 - frame_mbs_only)) vertically (7-21/7-22);
    # 4:2:2 crops 2 horizontal / 1 vertical; 4:4:4 and monochrome 1/1
    cw = 2 if chroma_format_idc in (1, 2) else 1
    ch = 2 if chroma_format_idc == 1 else 1
    width = pic_width_in_mbs * 16 - (crop_l + crop_r) * cw
    height = pic_height_in_map_units * 16 - (crop_t + crop_b) * ch
    return {"profile_idc": profile_idc,
            "profile": _PROFILES.get(profile_idc, f"idc{profile_idc}"),
            "level_idc": level_idc, "width": width, "height": height}


def _nal_units(buf: bytes):
    """Yield (nal_type, rbsp_bytes) for each Annex-B NAL unit."""
    i = buf.find(b"\x00\x00\x01")
    if i < 0:
        raise ValueError("no Annex-B start code")
    while i >= 0:
        start = i + 3
        nxt = buf.find(b"\x00\x00\x01", start)
        end = len(buf) if nxt < 0 else (
            nxt - 1 if nxt > start and buf[nxt - 1] == 0 else nxt)
        if start < end:
            hdr = buf[start]
            if hdr & 0x80:
                raise ValueError("forbidden_zero_bit set — not H.264")
            yield hdr & 0x1F, buf[start + 1:end]
        i = nxt


def parse_h264(buf: bytes) -> dict:
    """Annex-B stream → SPS metadata + NAL/slice/IDR counts.

    ``n_frames`` counts coded-slice NAL units (types 1 and 5) — for the
    common one-slice-per-picture layout that IS the picture count; a
    multi-slice encode counts slices, which still upper-bounds and
    scales with the frame count."""
    sps = None
    n_nal = n_slices = n_idr = 0
    for typ, rbsp in _nal_units(buf):
        n_nal += 1
        if typ == _NAL_SPS and sps is None:
            sps = parse_sps(_strip_emulation(rbsp))
        elif typ == _NAL_IDR:
            n_slices += 1
            n_idr += 1
        elif typ == _NAL_SLICE:
            n_slices += 1
    if sps is None:
        raise ValueError("no SPS NAL unit — cannot determine dimensions")
    return {**sps, "n_nal_units": n_nal, "n_frames": n_slices,
            "n_idr": n_idr}


# ---------------------------------------------------------------------------
# writer (structural skeletons for tests / oracles)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, val: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def ue(self, val: int):
        k = val + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def bytes(self) -> bytes:
        bits = self.bits + [1] + [0] * (7 - len(self.bits) % 8)  # rbsp stop
        out = bytearray()
        for i in range(0, len(bits), 8):
            out.append(int("".join(map(str, bits[i:i + 8])), 2))
        return bytes(out)


def build_sps(profile_idc: int, level_idc: int, width_mbs: int,
              height_mbs: int, crop_right: int = 0,
              crop_bottom: int = 0) -> bytes:
    """SPS RBSP with planted dimensions (progressive, 4:2:0)."""
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)
    w.u(level_idc, 8)
    w.ue(0)  # sps id
    if profile_idc in _HIGH_PROFILE_IDCS:
        w.ue(1)  # chroma_format_idc 4:2:0
        w.ue(0)
        w.ue(0)
        w.u(0, 1)
        w.u(0, 1)  # no scaling matrix
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type 2 (no extra fields)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(width_mbs - 1)
    w.ue(height_mbs - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8_inference
    if crop_right or crop_bottom:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_right)
        w.ue(0)
        w.ue(crop_bottom)
    else:
        w.u(0, 1)
    return w.bytes()


def _add_emulation(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes (00 00 0x → 00 00 03 0x for
    x ≤ 3, §7.4.1.1) so planted RBSP bits never fake a start code."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _annexb(nal_type: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + bytes((nal_type,)) + _add_emulation(rbsp)


def build_h264(width_mbs: int, height_mbs: int, n_frames: int,
               profile_idc: int = 66, level_idc: int = 30,
               idr_every: int = 8, crop_right: int = 0,
               crop_bottom: int = 0, slice_payload: int = 16) -> bytes:
    """Structurally valid Annex-B stream: SPS + PPS + coded-slice NAL
    units (zeroed payloads), an IDR every ``idr_every`` frames."""
    out = bytearray()
    out += _annexb(_NAL_SPS, build_sps(profile_idc, level_idc, width_mbs,
                                       height_mbs, crop_right, crop_bottom))
    out += _annexb(_NAL_PPS, b"\xc8\x42")  # minimal pps-ish rbsp
    for i in range(n_frames):
        typ = _NAL_IDR if i % idr_every == 0 else _NAL_SLICE
        # \x01 guard keeps the zero run from faking a start code
        out += _annexb(typ, b"\x01" * slice_payload)
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

H264_PROBE_SCHEMA = ("media_id long, profile string, profile_idc long, "
                     "level_idc long, width long, height long, "
                     "n_nal_units long, n_frames long, n_idr long")

_COLS = ["media_id", "profile", "profile_idc", "level_idc", "width",
         "height", "n_nal_units", "n_frames", "n_idr"]


def _rows(mid: int, buf: bytes) -> list[tuple]:
    m = parse_h264(buf)
    return [(mid, m["profile"], m["profile_idc"], m["level_idc"],
             m["width"], m["height"], m["n_nal_units"], m["n_frames"],
             m["n_idr"])]


def probe_h264(df: DataFrame, content_col: str = "content",
               id_col: str = "media_id") -> DataFrame:
    """binary Annex-B H.264 → one metadata row per blob; unparseable,
    unsupported (interlaced/scaling-matrix) and NULL blobs filter (the
    shared probe-tier kernel).  Map-only."""
    return probe_map(df, _rows, _COLS, H264_PROBE_SCHEMA, _COLS[2:],
                     catch=(ValueError, NotImplementedError),
                     content_col=content_col, id_col=id_col)
