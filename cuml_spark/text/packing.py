"""Greedy sequence packing: assign documents to fixed token-budget
training sequences ("sample packing") — the step between a cleaned
corpus and an LLM training shard, where padding waste is real money at
100 TB (a shard of 2k-token sequences filled greedily wastes far less
compute than one-doc-per-sequence padding).

Semantics (deterministic, oracle-replayable): within each PACKING GROUP,
documents are taken in ascending ``id_col`` order and appended to the
current pack while they fit; a document that would overflow
``max_tokens`` starts the next pack.  Documents longer than the budget
get a pack of their own (flagged ``oversize``).  Zero-token documents
(empty/null text) occupy a position in the current pack with n_tokens 0.
This is the classic streaming first-fit — NOT bin-packing-optimal, but
reproducible, order-stable, and what production packers actually run.

Spark shape (100 TB): greedy packing is inherently sequential WITHIN a
pack stream, so scale comes from running many independent streams — one
per group (shard key, source, date bucket): ``applyInPandas`` processes
each group's rows in one vectorized task, groups run fully parallel, and
the only shuffle is the groupBy key.  A single global stream cannot
scale and is refused above ``max_group_rows`` (the ``semantic_prune``
``max_cluster_rows`` pattern): at corpus scale the caller MUST provide a
grouping column, and the guard makes that contract explicit instead of
letting one executor process the whole corpus.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuml_spark.text.lm import _token_array


def pack_documents(
    df: DataFrame,
    max_tokens: int,
    *,
    group_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_sep: str = " ",
    max_group_rows: int | None = 1_000_000,
) -> DataFrame:
    """→ (id_col, group, n_tokens, pack_id, pack_pos, oversize).

    ``pack_id`` numbers packs within each group from 0 in id order;
    ``pack_pos`` is the document's 1-based position inside its pack;
    ``oversize`` marks documents whose own length exceeds the budget
    (they sit alone in their pack).  With ``group_col=None`` every row
    packs into one global stream under the ``max_group_rows`` guard —
    fine for a bounded shard, refused for corpus-scale input (pass a
    real grouping column instead; each group is one independent,
    parallel pack stream).
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    grp = (
        F.col(group_col).cast("string")
        if group_col is not None
        else F.lit("__all__")
    )
    base = df.select(
        grp.alias("group"),
        F.col(id_col),
        F.coalesce(F.size(_token_array(text_col, token_sep)), F.lit(0))
        .cast("long").alias("n_tokens"),
    )
    if max_group_rows is not None:
        biggest = (
            base.groupBy("group").agg(F.count("*").alias("__n"))
            .agg(F.max("__n")).collect()[0][0]
        )
        if biggest is not None and biggest > max_group_rows:
            raise ValueError(
                f"largest packing group has {biggest} rows > "
                f"max_group_rows={max_group_rows}; greedy packing is "
                "sequential within a group — supply a finer group_col "
                "(shard key, source, date bucket) so streams stay "
                "bounded and parallel (or raise the cap deliberately)")

    budget = int(max_tokens)
    id_field = base.schema[id_col].dataType.simpleString()
    out_schema = (
        f"group string, {id_col} {id_field}, n_tokens long, "
        "pack_id long, pack_pos long, oversize boolean"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        pack_ids, positions, fill, pack, pos = [], [], 0, 0, 0
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if not first and fill + n > budget:
                pack += 1
                fill, pos = 0, 0
            first = False
            fill += n
            pos += 1
            pack_ids.append(pack)
            positions.append(pos)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_pos"] = pd.Series(positions, dtype="int64")
        pdf["oversize"] = pdf["n_tokens"] > budget
        return pdf

    return base.groupBy("group").applyInPandas(_pack, out_schema)
