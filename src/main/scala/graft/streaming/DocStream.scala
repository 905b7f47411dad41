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

  /** The replay harnesses ([[docReplay]], StreamDedup.dedupReplay) are
    * driver-bounded by construction: MemoryStream can only be fed from
    * the driver, so the corpus is collected. Beyond this many rows the
    * harness refuses (r4 ADVICE: a corpus-scale frame would OOM the
    * driver before any error explained why) — use the production
    * `readStream` shape in the scaladoc instead.
    */
  val MaxReplayRows = 200000

  def extract(spark: SparkSession, raw: Dataset[RawDoc],
      config: ExtractionPipeline.PipelineConfig = ExtractionPipeline.PipelineConfig()): Dataset[ExtractedDoc] = {
    import spark.implicits._
    // ship the driver's active corpus bundle exactly like the batch path
    // (ExtractionPipeline.run): one broadcast, an idempotent install per
    // executor JVM. Without this, a table-loaded gazetteer would apply to
    // batch extraction but not to streamed docs — a silent stream/batch
    // divergence invisible in local mode (driver and executors share a
    // JVM) and on the span-level parity gate (spans are bundle-blind).
    // The config param mirrors run()'s for the same reason: a deployment
    // that batches with html2text must be able to stream with it too.
    val installCorpus = graft.matching.CorpusTable.broadcastInstaller(
      spark, graft.matching.Corpora.bundle)
    raw.mapPartitions { it =>
      installCorpus(); it.map(ExtractionPipeline.processDoc(_, config))
    }
  }

  /** Stream/batch parity replay harness (the q18 pattern): drive the raw
    * corpus through a MemoryStream micro-batch by micro-batch in a child
    * session and return the FULL extracted-doc rows from the memory sink
    * — the caller projects span/entity facets from it, each gated
    * against the same reconstruction oracles as the batch facets, so
    * streaming and batch extraction are proven equal through an
    * independent third reconstruction. Sinking whole documents (not one
    * pre-projected facet) lets one replay feed every parity gate,
    * including the bundle-SENSITIVE entity facet that a span-only gate
    * cannot see diverge.
    *
    * Stateless transform — no watermark or state store. The repartition
    * spreads each micro-batch across the full worker width: a
    * MemoryStream batch arrives as one driver block, which would
    * otherwise serialize the extraction CPU. The collect() is the replay
    * harness's cost (same as q18's event replay); production uses the
    * readStream file/Kafka shape in the scaladoc above and never
    * touches the driver. The result is localCheckpoint'ed: the sink
    * table lives in the child session and the replay must not re-run
    * per downstream facet.
    */
  def docReplay(spark: SparkSession, raw: Dataset[RawDoc], numBatches: Int = 6): org.apache.spark.sql.DataFrame = {
    // limit BEFORE collect: the guard must fire before the driver heap
    // does (limit+1 rows is the most this harness will ever hold)
    val docs = raw.limit(MaxReplayRows + 1).collect()
    require(docs.length <= MaxReplayRows,
      s"docReplay is a driver-memory replay harness (MemoryStream is driver-fed); " +
        s">$MaxReplayRows rows — use the production readStream shape (see DocStream scaladoc)")
    require(docs.nonEmpty, "no docs to replay")
    val width = spark.sparkContext.defaultParallelism
    val ss = spark.newSession()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RawDoc]
    val name = "stream_docs_sink"
    val q = extract(ss, stream.toDS().repartition(width))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val chunk = math.max(1, docs.length / numBatches + 1)
      docs.grouped(chunk).foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    // eager checkpoint, then drop the sink's temp view: otherwise the
    // replayed corpus lives TWICE on the driver for the session lifetime
    // (memory-sink buffer + checkpoint blocks)
    val out = ss.table(name).localCheckpoint()
    ss.catalog.dropTempView(name)
    out
  }
}
