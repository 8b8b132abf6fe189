"""End-to-end training-data curation pipeline.

The "switch from the reference" capstone: one callable that runs the
full document flow a training-data team runs daily —

    raw documents
      → expectations gate (fail fast on malformed feeds)
      → clean (trim / sentinel→NULL / markup strip)
      → exact dedup (drop byte-identical copies)
      → near-dup dedup (MinHash+LSH candidate pairs → keep one per
        connected cluster)
      → quality filter (language/length/stopword gates)
      → mixture sampling (per-source rates)
      → chunking (overlapping windows for the embedding/training step)
      → snapshot-committed lakehouse table + a metrics report

Every stage is the already-tested operator; this module only composes
and reports. Stage costs at 100 TB: two shuffles for dedup (content
hash; LSH bands), one for clustering iterations (bounded), everything
else is scans with pushable filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import (
    dedup,
    expectations,
    sampling,
    text,
)
from biglake_iceberg_pipeline_spark.operators.cleaning import clean_string
from biglake_iceberg_pipeline_spark.operators.graph import (
    dedup_cluster_assignment,
)
from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable


def curate_documents(
    spark: SparkSession,
    docs: DataFrame,
    table_path: str,
    mixture: dict[str, float] | None = None,
    min_quality: float = 0.3,
    chunk_size: int = 120,
    chunk_overlap: int = 20,
    classifier_label=None,
    classifier_min_score: float = 0.5,
    token_budgets: dict[str, int] | None = None,
    default_token_budget: int = 0,
) -> dict[str, int]:
    """Run the full curation flow; returns per-stage row counts (the
    funnel report every curation run needs).

    Optional r9 stages: ``classifier_label`` (a 0/1 Column over the
    doc frame — the reference-vs-crawl label) switches on the TRAINED
    quality gate (G37): a surrogate-GD linear classifier fits on the
    heuristic-gated survivors and drops docs scoring under
    ``classifier_min_score``. ``token_budgets`` (G39) caps each
    source at a TOKEN budget after mixture sampling — the final
    allocation step real mixes are specified in."""
    metrics: dict[str, int] = {"input": docs.count()}

    # 1. fail fast on malformed feeds. Per-rule violation counts go
    # into the report (the scan would otherwise be wasted work); the
    # funnel metric below counts ROWS dropped, not violations — a row
    # failing both rules must not be counted twice.
    _, gate_metrics = expectations.check(
        docs,
        {
            "doc_id_set": F.col("doc_id").isNotNull(),
            "text_set": F.col("text").isNotNull()
            & (F.length("text") > 0),
        },
        on_violation="warn",
    )
    for rule, n_bad in gate_metrics.items():
        metrics[f"gate_rule_{rule}"] = n_bad
    cleaned = docs.where(
        F.col("doc_id").isNotNull()
        & F.col("text").isNotNull()
        & (F.length("text") > 0)
    ).select(
        "doc_id",
        "source",
        "lang",
        text.strip_markup(clean_string(F.col("text"))).alias("text"),
    )
    n_cleaned = cleaned.count()
    metrics["gate_dropped"] = metrics["input"] - n_cleaned

    # 2. exact dedup: keep the representative id per content hash
    keepers = dedup.exact_dedup(cleaned, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = cleaned.join(keepers, "doc_id", "left_semi")
    metrics["after_exact_dedup"] = deduped.count()

    # 3. near-dup: LSH candidate pairs → connected clusters → keep the
    # cluster minimum
    pairs = dedup.minhash_lsh_pairs(
        deduped, "doc_id", "text", ordered=False
    )
    clusters = dedup_cluster_assignment(
        deduped.select("doc_id"), pairs, "doc_id"
    )
    survivors = deduped.join(
        clusters.where(F.col("is_canonical")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    metrics["after_near_dedup"] = survivors.count()

    # 4. quality gate
    scored = text.quality_features(survivors, "text")
    kept = scored.where(F.col("q_score") >= min_quality).select(
        "doc_id", "source", "lang", "text"
    )
    metrics["after_quality"] = kept.count()

    # 4b. TRAINED quality gate (G37): fit the surrogate-GD linear
    # classifier on the label the caller supplies, drop low scorers
    if classifier_label is not None:
        from biglake_iceberg_pipeline_spark.operators import (
            quality_clf,
        )

        labeled = kept.withColumn(
            "y", classifier_label.cast("double")
        )
        feats = quality_clf.doc_features(
            labeled, label_col="y", df_max=0.5
        ).persist()
        w, b = quality_clf.train_surrogate_gd(
            labeled.select("doc_id", "y"), feats
        )
        model = w.crossJoin(F.broadcast(b)).collect()
        feats.unpersist()
        wdf = spark.createDataFrame(
            [(int(r["bucket"]), float(r["w"])) for r in model],
            "bucket bigint, w double",
        )
        bias = float(model[0]["bias"]) if model else 0.0
        scored_clf = quality_clf.score_documents(
            kept,
            quality_clf.doc_features(labeled, df_max=0.5),
            wdf,
            bias,
        )
        kept = scored_clf.where(
            F.col("quality_score") >= classifier_min_score
        ).select("doc_id", "source", "lang", "text")
        metrics["after_classifier"] = kept.count()

    # 5. mixture sampling (deterministic hash gates)
    if mixture:
        kept = sampling.mixture_sample(
            kept, "source", "doc_id", mixture, default_fraction=1.0
        )
        metrics["after_mixture"] = kept.count()

    # 5b. per-source TOKEN budgets (G39): the final allocation step —
    # real mixes are specified in tokens, not docs
    if token_budgets is not None:
        with_tokens = kept.withColumn(
            "n_tokens",
            F.size(
                F.filter(
                    F.split(F.trim(F.col("text")), r"\s+"),
                    lambda x: x != F.lit(""),
                )
            ),
        )
        kept = sampling.token_budget_sample(
            with_tokens,
            "source",
            "doc_id",
            "n_tokens",
            token_budgets,
            default_token_budget,
        ).select("doc_id", "source", "lang", "text")
        metrics["after_token_budget"] = kept.count()

    # 6. chunk for the embedding/training stage
    chunks = text.chunk_documents(
        kept, "doc_id", "text", chunk_size, chunk_overlap
    )

    # 7. snapshot-committed output
    table = LakehouseTable(table_path)
    table.append(chunks)
    metrics["chunks_written"] = chunks.count()
    return metrics
