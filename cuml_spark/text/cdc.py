"""Content-defined chunking (CDC): split documents at positions chosen
by a hash of the local content window, so chunk boundaries SURVIVE
insertions and deletions — the dedup-stable chunking used by every
storage dedup system (LBFS/TTTD/FastCDC family) and, in corpus work,
the way to catch shared spans between documents whose fixed-size or
token-budget chunks (text/retrieval.py) would misalign after one edit.

Boundary rule: position ``i`` ends a chunk iff the hash of the
``window``-char span ending at ``i`` is ≡ 0 mod ``2^mask_bits`` —
expected chunk length ``2^mask_bits`` chars.  Because the test at each
position depends ONLY on the trailing window (the defining property of
window-hash CDC — Gear/Rabin rolling hashes are an O(1)-update
optimization of exactly this), boundary detection is embarrassingly
position-parallel: no sequential scan state, so it runs entirely IN-ROW.
This implementation deliberately omits FastCDC's min/max chunk clamps:
those reintroduce left-to-right state (each boundary depends on the
previous accepted one) and with them the whole computation would
serialize; callers needing a hard max can post-split oversize chunks.

Spark shape (100 TB): boundary positions, chunk spans, chunk text and
chunk hashes all compute inside ``transform`` / ``filter`` /
``posexplode`` over the scan — ZERO shuffle, no UDF; text never leaves
its partition, and downstream chunk-level dedup joins carry 16-byte
hashes only (the text/dedup.py contract).

Engine portability: the window hash is the first 8 md5 hex digits of
the raw window substring (the token_bucket idiom), so a DuckDB oracle
replays every boundary and chunk bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cdc_chunks"]


def cdc_chunks(
    df: DataFrame,
    *,
    window: int = 16,
    mask_bits: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (id_col, chunk_id, start, chunk_len, chunk_md5, chunk_text):
    content-defined chunks, 1-based ``start`` char offsets, ``chunk_id``
    numbering chunks left to right from 1.  Documents shorter than
    ``window`` chars (but non-empty) are one whole-document chunk;
    null/empty documents emit nothing.  Expected chunk length is
    ``2^mask_bits`` chars."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if not 1 <= mask_bits <= 24:
        raise ValueError(f"mask_bits must be in [1, 24], got {mask_bits}")
    mod = 1 << mask_bits
    text = F.col(text_col)
    L = F.length(text)
    # candidate boundary positions = window-end offsets window..L
    idx = F.when(L >= window, F.sequence(F.lit(window), L)).otherwise(
        F.array().cast("array<int>")
    )
    bpos = F.filter(
        idx,
        lambda i: (
            F.conv(
                F.substring(
                    F.md5(F.substring(text, i - window + 1, F.lit(window)).cast("binary")),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % mod
            == 0
        ),
    )
    starts = F.concat(F.array(F.lit(1)), F.transform(bpos, lambda b: b + 1))
    ends = F.concat(bpos, F.array(L.cast("int")))
    spans = F.filter(
        F.zip_with(starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))),
        lambda p: p["s"] <= p["e"],  # drops the empty tail when a boundary lands on L
    )
    return (
        df.where(text.isNotNull() & (L >= 1))
        .select(F.col(id_col), text.alias("__t"), F.posexplode(spans).alias("__i", "__p"))
        .select(
            id_col,
            (F.col("__i") + 1).cast("long").alias("chunk_id"),
            F.col("__p.s").cast("long").alias("start"),
            (F.col("__p.e") - F.col("__p.s") + 1).cast("long").alias("chunk_len"),
            F.md5(
                F.substring(F.col("__t"), F.col("__p.s"), F.col("__p.e") - F.col("__p.s") + 1).cast("binary")
            ).alias("chunk_md5"),
            F.substring(F.col("__t"), F.col("__p.s"), F.col("__p.e") - F.col("__p.s") + 1).alias("chunk_text"),
        )
    )
