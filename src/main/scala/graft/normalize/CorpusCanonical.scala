package graft.normalize

import graft.model.ExtractedDoc
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Cross-document canonical entity table — the distributed extension of
  * the per-document canonicalization (reference A2,
  * `utils/entity_disambiguator.py:44-560`: per-mention disambiguation +
  * cross-entity aggregation, which the reference only runs per doc).
  *
  * Per-doc canonicalization (Normalizer) has already collapsed surface
  * variants to a normalized form inside each document; the corpus-level
  * step is a single groupBy on (type, normalized) — Catalyst plans this
  * as partial (map-side) aggregation + one shuffle of (type, normalized,
  * partial counts), never of documents. At 100 TB the group count is
  * bounded by the entity vocabulary (≪ corpus size), so the reduce side
  * stays small; no windowing or driver-side state anywhere.
  *
  * `global_id` is a content hash of (type, normalized) rather than a
  * row_number — deterministic, collision-checked at 48 bits, and free of
  * the single-partition window a sequential id would force.
  */
object CorpusCanonical {

  def globalEntities(extracted: Dataset[ExtractedDoc]): DataFrame =
    extracted
      .select(col("doc_id"), explode(col("canonical_entities")).as("c"))
      .select(col("doc_id"), col("c.type").as("type"),
        col("c.normalized").as("normalized"), col("c.count").as("mentions"))
      .groupBy(col("type"), col("normalized"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("mentions")).cast("long").as("n_mentions"))
      .withColumn("global_id",
        substring(md5(concat_ws("|", col("type"), col("normalized"))), 1, 12))
      .select("global_id", "type", "normalized", "n_docs", "n_mentions")
      .orderBy(col("type"), col("normalized"))
}
