"""Temperature-scaled domain mixture sampling for training corpora.

The standard multi-domain reweighting step LLM pipelines run before
training (multilingual temperature sampling; also the "sampling ratios"
knob of GPT-3/PaLM-style mixtures): domain d with share ``p_d`` is
resampled proportionally to ``p_d**alpha`` renormalized, so ``alpha=1``
keeps natural proportions, ``alpha=0`` gives uniform-over-domains, and
``0<alpha<1`` up-weights the tail.  The reference engine has no
counterpart — this is part of the beyond-reference LLM-data tier.

Spark-first shape (100 TB):

* pass 1 — one shuffle-light ``groupBy(domain).count()`` (result is
  domains-sized, i.e. tiny);
* per-domain keep rates are computed as column expressions over that tiny
  frame and broadcast back;
* pass 2 — one scan of the corpus with an in-row keep decision.  Two scans
  total is the floor for exact-proportion mixing; callers that already
  know the domain histogram can pass ``counts=`` and skip pass 1.

Keep decisions are **deterministic integer modular arithmetic** on the id
column — a Weyl-style ``(id % M) * MULT % M`` pseudo-uniform — NOT
``rand()``: the sample is reproducible run-to-run, partitioning-invariant,
and engine-portable (an ANSI-SQL oracle reproduces it bit-for-bit, which
``rand()``-based sampling can never do).  Rates are rounded to
``rate_decimals`` before thresholding so last-ulp ``pow``/sum-order
divergence between engines cannot flip a keep decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Weyl-style mixing constants: M prime, MULT = 2^32 / phi (Knuth's
# multiplicative-hash constant). (id % M) * MULT stays < 2^52 — exact in
# int64 for both Spark and any ANSI engine.
_MIX_M = 1_000_003
_MIX_MULT = 2_654_435_761


def mix_uniform_expr(id_col: str, seed: int = 0):
    """Deterministic pseudo-uniform in [0, 1) from a non-negative id."""
    return (
        F.pmod(
            F.pmod(F.col(id_col).cast("long") + int(seed), F.lit(_MIX_M))
            * _MIX_MULT,
            F.lit(_MIX_M),
        )
        / float(_MIX_M)
    )


def domain_rates(
    counts: DataFrame,
    domain_col: str,
    *,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    rate_decimals: int = 4,
) -> DataFrame:
    """Per-domain keep rates from a ``(domain, __n_d)`` histogram.

    Target kept rows for domain d: ``budget_frac * N * w_d`` where
    ``w_d = n_d^alpha / Σ n^alpha``; the rate is that target over ``n_d``,
    capped at 1 (a tail domain whose boosted target exceeds its size is
    kept whole — this sampler never duplicates rows; epoch-level
    upsampling is the training loader's job).
    """
    # totals via a whole-frame window, NOT a separate agg + cross-join: the
    # counts subtree would otherwise appear twice in the plan, doubling the
    # corpus histogram pass.  The window's single partition holds one row
    # per DOMAIN — always tiny.
    from pyspark.sql import Window

    w = Window.partitionBy()
    pw = F.pow("__n_d", float(alpha))
    return counts.select(
        domain_col,
        F.col("__n_d"),
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(budget_frac))
                * F.sum("__n_d").over(w)
                * pw
                / (F.sum(pw).over(w) * F.col("__n_d")),
            ),
            rate_decimals,
        ).alias("__rate"),
    )


def temperature_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    *,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    seed: int = 0,
    rate_decimals: int = 4,
    counts: DataFrame | None = None,
    on_missing_domain: str = "error",
) -> DataFrame:
    """Deterministically sample ``df`` to a temperature-``alpha`` mixture.

    ``id_col`` must be a non-negative integer id, unique per row (the same
    precondition the dedup tier documents); ``seed`` offsets the id before
    mixing so independent samples decorrelate.  Returns the kept rows with
    the original schema.

    A caller-supplied ``counts`` histogram must cover every domain in
    ``df``; the rates join is null-safe, so a null domain is a domain
    value like any other — it matches a null histogram row and is
    sampled at that row's rate.  Rows whose domain has NO histogram row
    are governed by ``on_missing_domain``: ``"error"`` (default) raises
    at execution time naming the domain, ``"keep"`` passes them through
    unsampled, ``"drop"`` discards them (the pre-r8 behavior — silent,
    so now opt-in).  Self-computed counts are complete by construction
    (groupBy emits a row for every domain incl. null), so nothing can
    miss on the default path.
    """
    if on_missing_domain not in ("error", "keep", "drop"):
        raise ValueError(
            f"on_missing_domain must be error|keep|drop, "
            f"got {on_missing_domain!r}")
    if counts is None:
        counts = df.groupBy(domain_col).agg(F.count("*").alias("__n_d"))
    rates = domain_rates(
        counts, domain_col, alpha=alpha, budget_frac=budget_frac,
        rate_decimals=rate_decimals,
    ).drop("__n_d")
    u = mix_uniform_expr(id_col, seed)
    joined = df.join(F.broadcast(rates), df[domain_col].eqNullSafe(
        rates[domain_col]), "left").drop(rates[domain_col])
    rate = F.col("__rate")
    if on_missing_domain == "error":
        rate = F.when(rate.isNotNull(), rate).otherwise(
            F.raise_error(F.concat(
                F.lit("temperature_sample: no rate for domain "),
                F.coalesce(F.col(domain_col).cast("string"), F.lit("NULL")),
                F.lit(" — pass a complete counts= histogram or set "
                      "on_missing_domain to keep/drop"),
            )).cast("double"))
    elif on_missing_domain == "keep":
        rate = F.coalesce(rate, F.lit(1.0))
    else:  # drop
        rate = F.coalesce(rate, F.lit(-1.0))  # u >= 0 never passes
    out = joined.where(u < rate)
    return out.drop("__rate").select(*df.columns)
