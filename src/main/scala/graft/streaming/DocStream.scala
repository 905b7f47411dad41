package graft.streaming

import graft.model.{ExtractedDoc, RawDoc}
import graft.pipeline.ExtractionPipeline
import org.apache.spark.sql.{Dataset, SparkSession}

/** Streaming twin of the batch extraction job: the SAME fused per-doc
  * function over a streaming `Dataset[RawDoc]` — new documents land in a
  * raw table (file source / Kafka) and extracted span rows append to the
  * sink continuously. Stateless per document, so no watermark is needed;
  * micro-batch parallelism comes from the source's partitioning.
  *
  * Usage shape:
  * {{{
  *   val raw = spark.readStream.schema(rawSchema).parquet(inDir).as[RawDoc]
  *   DocStream.extract(spark, raw)
  *     .writeStream.format("parquet")
  *     .option("checkpointLocation", ckpt)   // exactly-once file sink
  *     .start(outDir)
  * }}}
  */
object DocStream {

  def extract(spark: SparkSession, raw: Dataset[RawDoc]): Dataset[ExtractedDoc] = {
    import spark.implicits._
    raw.mapPartitions(_.map(ExtractionPipeline.processDoc))
  }
}
