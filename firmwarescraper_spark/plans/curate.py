"""The curation pipeline plan: raw documents -> filtered, deduped,
scrubbed, split-assigned training corpus, as ONE declarative Spark job.

This is the chain a pretraining-data pipeline runs between the crawl
(plans/crawl.py) and tokenization, composed from the operator library:

    language gate (textops.langid_col)
      -> quality gate (textops.quality_score)
      -> repetition gates (textops.repetition_signals — Gopher filters)
      -> exact-dedup survivor pick (min doc id per fingerprint)
      -> optional benchmark decontamination (curation.decontaminate)
      -> PII scrub (curation.scrub_pii)
      -> split assignment (curation.assign_splits)

Plan shape at 100 TB (reviewed via explain("formatted"), PLANS.md §4):
the language/quality gates and the fingerprint are narrow column
expressions fused into the document scan; raw text leaves the scan stage
only for the two operators that need cross-row context — the repetition
top-gram aggregation and (if enabled) the decontamination shingle join —
and both hash to fixed-width keys before shuffling. The survivor pick is
a window over the fingerprint, so dedup costs one hash-partition of
(id, fp, gates), never of the text. The scrub and split columns are
again scan-fused map work on the surviving rows.

``curation_report`` computes the per-stage survival funnel in ONE
aggregation pass over the annotated frame (sums of gate booleans), so
auditing the pipeline costs one scan, not one job per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import curation as CU
from ..operators import textops as TX


def annotate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.5,
    max_top_bigram: float = 0.6,
    max_dup_trigram: float = 0.5,
) -> DataFrame:
    """Add the gate columns every later stage keys on: lang_pred,
    quality, repetition signals, fingerprint, and the per-gate booleans
    (cumulative — each gate implies the previous, so the report reads as
    a funnel)."""
    rep = TX.repetition_signals(df, text_col=text_col, id_col=id_col)
    ann = (
        df.select(
            "*",
            TX.langid_col(F.col(text_col)).alias("lang_pred"),
            TX.quality_score(F.col(text_col)).alias("quality"),
            F.md5(TX.normalize_text(F.col(text_col))).alias("fp"),
        )
        .join(rep, id_col)
        .withColumn("lang_ok", F.col("lang_pred") == lang)
        .withColumn(
            "quality_ok", F.col("lang_ok") & (F.col("quality") >= min_quality)
        )
        .withColumn(
            "repetition_ok",
            F.col("quality_ok")
            & (F.col("top_bigram_frac") <= max_top_bigram)
            & (F.col("dup_trigram_frac") <= max_dup_trigram),
        )
    )
    w = Window.partitionBy("fp")
    passing = F.when(F.col("repetition_ok"), F.col(id_col))
    return (
        ann.withColumn("_min_id", F.min(passing).over(w))
        .withColumn(
            "dup_count",
            F.sum(F.col("repetition_ok").cast("int")).over(w).cast("bigint"),
        )
        .withColumn(
            "dedup_ok", F.col("repetition_ok") & (F.col(id_col) == F.col("_min_id"))
        )
        .drop("_min_id")
    )


def curation_report(ann: DataFrame) -> dict:
    """Survival funnel over an annotate_documents frame in one pass."""
    row = ann.agg(
        F.count("*").alias("input_docs"),
        F.sum(F.col("lang_ok").cast("long")).alias("lang_pass"),
        F.sum(F.col("quality_ok").cast("long")).alias("quality_pass"),
        F.sum(F.col("repetition_ok").cast("long")).alias("repetition_pass"),
        F.sum(F.col("dedup_ok").cast("long")).alias("dedup_survivors"),
    ).first()
    return {k: int(row[k] or 0) for k in row.asDict()}


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang: str = "en",
    min_quality: float = 0.5,
    max_top_bigram: float = 0.6,
    max_dup_trigram: float = 0.5,
    benchmark: DataFrame | None = None,
    decontaminate_ngram: int = 8,
    scrub: bool = True,
    val_bps: int = 500,
    test_bps: int = 500,
    neardup: str | None = None,
) -> DataFrame:
    """The full curated corpus as a lazy DataFrame: survivors of the
    gate chain, optionally near-dup-grouped (``neardup`` in
    {"minhash", "simhash"} — LSH pairs -> connected components -> keep
    the min-id canonical per component), optionally decontaminated
    against ``benchmark``, PII scrubbed, with train/val/test split
    labels. Caller writes it (typically
    ``.write.partitionBy("split").parquet(...)``).

    Near-dup runs AFTER the exact-dedup survivor pick on purpose: exact
    dup clusters collapse first (cheap hash window), so the expensive
    pair generation sees each distinct text once."""
    ann = annotate_documents(
        df, text_col=text_col, id_col=id_col, lang=lang,
        min_quality=min_quality, max_top_bigram=max_top_bigram,
        max_dup_trigram=max_dup_trigram,
    )
    out = ann.filter(F.col("dedup_ok"))
    if neardup is not None:
        from ..operators import dedup as DD

        if neardup == "minhash":
            pairs = DD.minhash_lsh_pairs(out, text_col=text_col, id_col=id_col)
        elif neardup == "simhash":
            pairs = DD.simhash_neardup_pairs(
                out, id_col=id_col
            ).select("id_a", "id_b")
        else:
            raise ValueError(f"unknown neardup mode {neardup!r}")
        comp = DD.neardup_components(out, pairs, id_col=id_col)
        canon = comp.filter(F.col(id_col) == F.col("component")).select(id_col)
        out = out.join(canon, id_col, "left_semi")
    if benchmark is not None:
        flags = CU.decontaminate(
            out, benchmark, text_col=text_col, id_col=id_col,
            ngram=decontaminate_ngram,
        ).filter(F.col("contaminated")).select(id_col)
        out = out.join(flags, id_col, "left_anti")
    if scrub:
        out = out.withColumn(text_col, CU.scrub_pii(F.col(text_col)))
    out = CU.assign_splits(out, id_col=id_col, val_bps=val_bps,
                           test_bps=test_bps)
    keep = [id_col, text_col, "lang_pred", "quality", "dup_count", "split"]
    extra = [c for c in df.columns if c not in (id_col, text_col)]
    return out.select(*([id_col] + extra + keep[1:]))


def write_training_shards(
    df: DataFrame,
    path: str,
    sort_col: str = "doc_id",
    shard_rows: int = 100_000,
    shards: int | None = None,
    split_col: str | None = "split",
) -> list:
    """Materialize the curated corpus as range-sharded training files —
    the step between curate_documents and the tokenizer/loader. Data
    loaders want (a) bounded shard sizes (a shard is the unit of loader
    parallelism and of retry), (b) a deterministic global order (resume
    = "start at shard k, row j"), (c) a manifest to audit both.

    Spark-first shapes, in order:
      * global order WITHOUT a global sort: repartitionByRange on
        ``sort_col`` (sampled range boundaries — the exchange is the
        only wide op, there is never a single ordering task) +
        sortWithinPartitions. Files inherit disjoint, contiguous key
        ranges — pinned by test.
      * size bound via ``maxRecordsPerFile``: an oversized range
        partition splits into sequential files, so the bound holds even
        when the range sampler lands a hot key range.
      * ``split_col`` (if present) becomes a hive partition directory
        (train/val/test), so loaders mount one split without listing
        the others and the range invariant holds per split.

    Returns the manifest: a sorted list of
    {file, split, rows, min_key, max_key} dicts, computed by reading
    the written files back (groupBy input_file_name — the manifest
    doubles as a write verification), and also written as one
    ``_manifest.json`` line per shard next to the data. At 100 TB the
    read-back costs one metadata-cheap column scan of (sort_col); rows
    never collect to the driver beyond one dict per shard."""
    import json
    import math
    import os

    spark = df.sparkSession
    n = df.count()
    if shards is None:
        shards = max(1, math.ceil(n / shard_rows))
    cols = [c for c in df.columns]
    parts = (
        df.repartitionByRange(shards, F.col(sort_col))
        .sortWithinPartitions(sort_col)
    )
    writer = (
        parts.write.mode("overwrite")
        .option("maxRecordsPerFile", shard_rows)
    )
    if split_col and split_col in cols:
        writer = writer.partitionBy(split_col)
    writer.parquet(path)

    back = spark.read.parquet(path).select(
        F.col(sort_col).alias("_k"),
        F.input_file_name().alias("_f"),
        *([F.col(split_col).alias("_s")]
          if split_col and split_col in cols else [F.lit("").alias("_s")]),
    )
    rows = (
        back.groupBy("_f", "_s")
        .agg(F.count("*").alias("rows"),
             F.min("_k").alias("min_key"), F.max("_k").alias("max_key"))
        .collect()
    )
    manifest = sorted(
        (
            {
                "file": os.path.basename(r["_f"]),
                "split": r["_s"],
                "rows": r["rows"],
                "min_key": r["min_key"],
                "max_key": r["max_key"],
            }
            for r in rows
        ),
        key=lambda m: (m["split"], m["min_key"]),
    )
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        for m in manifest:
            fh.write(json.dumps(m, default=str) + "\n")
    return manifest
