package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact dedup at ingest: the streaming twin of `TextOps.dedupExact`'s
  * keeper selection — an unbounded stateful aggregation
  * `groupBy(fingerprint).agg(min(doc_id), count)` whose final state
  * equals the batch group-by REGARDLESS of arrival order or micro-batch
  * boundaries, because min and count are order-insensitive (a
  * first-row-wins `dropDuplicates` would not be: its keeper depends on
  * task scheduling within a batch). State is O(distinct fingerprints);
  * a production ingest with a time-limited dedup horizon bounds it with
  * a watermark + `dropDuplicatesWithinWatermark` instead.
  */
object StreamDedup {

  /** The streaming transform: works on any (doc_id, text) frame, batch
    * or streaming.
    */
  def dedup(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), graft.textops.TextOps.fingerprintCol.as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_docs"))

  /** Replay harness (the q18 pattern): micro-batch the documents table
    * through a MemoryStream in a child session; the complete-mode
    * memory sink's final table IS the aggregation state, gated against
    * the batch reconstruction oracle.
    */
  def dedupReplay(spark: SparkSession, docs: DataFrame,
      numBatches: Int = 6): DataFrame = {
    // replay DESCENDING by doc_id: each fingerprint's min id then
    // arrives LAST, so the driver gate itself discriminates the
    // min-aggregation from a first-row-wins keeper (ascending arrival
    // would let a dropDuplicates-style regression pass green)
    val rows = docs.select(col("doc_id").cast("long"), col("text"))
      .limit(DocStream.MaxReplayRows + 1).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(-_._1)
    require(rows.length <= DocStream.MaxReplayRows,
      s"dedupReplay is a driver-memory replay harness (MemoryStream is driver-fed); " +
        s">${DocStream.MaxReplayRows} rows — use the production readStream shape (see scaladoc)")
    require(rows.nonEmpty, "no docs to replay")
    val ss = spark.newSession()
    // state-store width sized to the replay, not the session (the q18
    // convention): every micro-batch pays a per-partition state commit
    // AND a complete-mode sink rewrite, so width 4 — the fingerprint key
    // space is small and the per-batch fixed cost scales with width
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val name = "stream_dedup_sink"
    // the docReplay convention: a MemoryStream batch arrives as ONE
    // driver block — spread it before the per-doc fingerprint (the
    // dominant CPU) or the whole map side runs in a single task
    val width = spark.sparkContext.defaultParallelism
    val q = dedup(stream.toDS().toDF("doc_id", "text").repartition(width))
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      val chunk = math.max(1, rows.length / numBatches + 1)
      rows.grouped(chunk).foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()
    // eager checkpoint + drop the sink view (the docReplay convention:
    // never hold the result twice for the session lifetime)
    val out = ss.table(name).orderBy("keeper_id").localCheckpoint()
    ss.catalog.dropTempView(name)
    out
  }
}
