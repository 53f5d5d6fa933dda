"""End-to-end corpus-curation pipeline report.

The standard pre-training sequence — quality filter → exact dedup →
benchmark decontamination — composed into ONE per-document flag frame
(two pruned corpus scans: one for quality+fingerprint, one for grams),
so a pipeline owner gets the full survivor funnel (how many documents
and characters survive each stage) from a single composed job instead
of running three pipelines and diffing counts.

Everything is deterministic and oracle-reproducible: quality rules are
integer-exact (`textan.default_quality_rules`), the dedup key is
md5(normalized text) with first-occurrence-by-id wins, and contamination
is a distinct-gram-hash hit count against a broadcast eval set — so the
whole report hash-matches a SQL engine bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from moisturizer_spark.operators.textan import (
    default_quality_rules,
    word_ngrams,
)

__all__ = ["curation_report"]


def curation_report(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size_col: str = "n_chars",
    rules: list[tuple[str, Column]] | None = None,
    n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """Survivor funnel for quality → exact-dedup → decontamination.

    Returns 4 rows: (stage, stage_idx, n_docs, n_chars) for ``input``,
    ``quality`` (passes every rule), ``exact_dedup`` (additionally the
    first quality-passing occurrence of its content fingerprint), and
    ``decontaminated`` (additionally shares < ``min_shared`` distinct
    word ``n``-grams with ``eval_df``). Stages compose: each count is a
    subset of the previous, which is exactly what makes the report a
    funnel.

    Scale shape — two pruned corpus scans, three cheap flag paths:

    - quality: a pure CASE projection fused into the first scan;
    - dedup: a row_number window keyed on the 32-byte md5 fingerprint —
      text does NOT cross this shuffle (only id, size, flags, hash);
      quality failures get a per-row unique key so they don't clutter
      the fingerprint partitions;
    - contamination: a second scan grams the corpus and probes the
      broadcast eval gram set map-side (`textan.decontaminate`'s plan);
      only hit rows shuffle, and the per-doc hit count left-joins back
      on the id. Grams deliberately come from the source frame, not the
      window output, so the dedup shuffle runs once and never carries
      text.

    The final aggregation is 4 conditional sums in a single-group
    partial agg. Nothing here is quadratic, and the only corpus-keyed
    shuffles carry (fingerprint, id) and (id, hit-count) pairs — never
    document text.
    """
    rules = default_quality_rules(text_col, size_col) if rules is None else rules
    q_pass = None
    for _, cond in rules:
        q_pass = cond if q_pass is None else (q_pass & cond)

    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    )
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(size_col).alias("_sz"),
        q_pass.alias("_q"),
        F.md5(norm).alias("_fp"),
    )

    # first quality-passing occurrence per fingerprint; failures rank in
    # singleton windows (md5 hex never collides with the 'q:'-prefixed
    # sentinel) so they can't skew a fingerprint partition
    fp_key = F.when(
        F.col("_q"), F.col("_fp")
    ).otherwise(F.concat(F.lit("q:"), F.col("_id").cast("string")))
    rn = F.row_number().over(
        Window.partitionBy(fp_key).orderBy("_id")
    )
    flagged = base.withColumn("_uniq", F.col("_q") & (rn == 1))

    # decontamination hits: distinct gram hashes of the eval set
    # broadcast; corpus side probes map-side (same plan as decontaminate)
    def grams(df: DataFrame, idc: str, txt: str) -> DataFrame:
        return (
            df.select(
                F.col(idc).alias("_gid"),
                F.explode_outer(word_ngrams(F.col(txt), n)).alias("_gram"),
            )
            .filter(F.col("_gram").isNotNull())
            .select("_gid", F.md5("_gram").alias("_gh"))
        )

    ev = grams(eval_df, id_col, text_col).select("_gh").distinct()
    # gram the SOURCE frame, not the window-bearing `flagged`: the hit
    # branch must not re-run (or ship text through) the dedup shuffle —
    # it is a second pruned scan of the source feeding a map-side probe
    hits = (
        grams(docs, id_col, text_col)
        .join(F.broadcast(ev), "_gh")
        .groupBy("_gid")
        .agg(F.count_distinct("_gh").alias("_n_shared"))
        .filter(F.col("_n_shared") >= min_shared)
        .withColumn("_contam", F.lit(True))
        .select("_gid", "_contam")
    )
    full = flagged.join(
        hits, F.col("_id") == F.col("_gid"), "left_outer"
    ).select(
        "_sz",
        "_q",
        "_uniq",
        (F.col("_uniq") & ~F.coalesce(F.col("_contam"), F.lit(False))).alias(
            "_clean"
        ),
    )
    agg = full.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(F.col("_sz")).cast("bigint").alias("c0"),
        F.sum(F.when(F.col("_q"), 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("_q"), F.col("_sz")).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("_uniq"), 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("_uniq"), F.col("_sz")).otherwise(0))
        .cast("bigint")
        .alias("c2"),
        F.sum(F.when(F.col("_clean"), 1).otherwise(0)).cast("bigint").alias("n3"),
        F.sum(F.when(F.col("_clean"), F.col("_sz")).otherwise(0))
        .cast("bigint")
        .alias("c3"),
    )
    return agg.select(
        F.expr(
            "stack(4, 'input', 0, n0, c0, 'quality', 1, n1, c1, "
            "'exact_dedup', 2, n2, c2, 'decontaminated', 3, n3, c3) "
            "AS (stage, stage_idx, n_docs, n_chars)"
        )
    ).select(
        "stage",
        F.col("stage_idx").cast("int").alias("stage_idx"),
        "n_docs",
        "n_chars",
    )
