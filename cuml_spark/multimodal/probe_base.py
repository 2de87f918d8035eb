"""Shared probe-tier kernel: the filter semantic, implemented once.

Every header probe in this package (``probe_media`` / ``probe_audio`` /
``probe_h264`` / ``probe_image``) has the same Spark shape — a map-only
``mapInPandas`` emitting small metadata rows, where anything that cannot
be parsed FILTERS instead of failing the task.  This module implements
that contract once so the four probes cannot drift (r12 review: the
null-id crash, the beyond-int64 Arrow overflow and the catch-tuple
differences each existed in some kernels and not others).

Filter semantics enforced here:

- NULL ``media_id`` or NULL content rows drop (a typed metadata row
  cannot be keyed/emitted for them);
- ``parse_rows`` exceptions in ``catch`` drop the blob;
- any integer field outside int64 drops the blob (a crafted header can
  carry u64/ASCII values past 2^63; ``astype``/Arrow would raise
  OverflowError OUTSIDE a per-blob try, killing the task).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def probe_map(
    df: DataFrame,
    parse_rows: Callable[[int, bytes], list[tuple]],
    cols: list[str],
    schema: str,
    int_cols: list[str],
    catch: tuple[type[BaseException], ...] = (ValueError,),
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """``parse_rows(media_id, buf) -> [row_tuple, ...]`` (one or more
    rows per blob; raise to filter).  ``cols`` lead with ``media_id``;
    ``int_cols`` are nullable-int64 fields (pandas ``Int64``)."""
    int_idx = [cols.index(c) for c in int_cols]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                if mid is None or content is None:
                    continue
                try:
                    blob_rows = parse_rows(int(mid), bytes(content))
                except catch:
                    continue
                if any(
                    r[i] is not None
                    and not (_I64_MIN <= r[i] <= _I64_MAX)
                    for r in blob_rows for i in int_idx
                ):
                    continue  # beyond-int64 header field: filter the blob
                rows.extend(blob_rows)
            out = pd.DataFrame(rows, columns=cols)
            for c in int_cols:
                out[c] = out[c].astype("Int64")
            out["media_id"] = out["media_id"].astype(np.int64)
            yield out

    return df.mapInPandas(kernel, schema)
