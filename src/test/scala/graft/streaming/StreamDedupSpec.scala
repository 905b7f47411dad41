package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** t19 streaming exact-dedup: the final sink state must equal the batch
  * group-by even when duplicates arrive out of order across batches.
  */
class StreamDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("keeper is the min doc_id per fingerprint, across batch boundaries and arrival order") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // dup pair (1, 7) shares text; the HIGHER id arrives first and in an
    // earlier batch — min-aggregation must still pick 1 as keeper, where
    // a first-row-wins dropDuplicates would have locked in 7
    val b1 = Seq((7L, "alpha beta"), (3L, "gamma"))
    val b2 = Seq((1L, "alpha beta"), (5L, "delta"))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamDedup.dedup(stream.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sd_test").outputMode("complete").start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sd_test").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L, 5L -> 1L), s"got $out")
  }

  test("t20: in-horizon dup dropped, beyond-horizon dup re-admitted (state evicted)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(off: Long) = new java.sql.Timestamp(base + off * 1000L)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamDedup.dedupBounded(
        stream.toDS().toDF("doc_id", "text", "ingest_ts"), "100 seconds")
      .writeStream.format("memory").queryName("sdb_test").outputMode("append").start()
    try {
      // first sightings
      stream.addData(Seq((1L, "alpha", at(0)), (2L, "beta", at(0)))); q.processAllAvailable()
      // in-horizon duplicate of "alpha" -> dropped
      stream.addData(Seq((3L, "alpha", at(10)))); q.processAllAvailable()
      // two watermark ticks push the watermark to T+900 and give the
      // store a batch boundary to evict on
      stream.addData(Seq((-1L, "tick", at(1000)))); q.processAllAvailable()
      stream.addData(Seq((-2L, "tick-two", at(1001)))); q.processAllAvailable()
      // beyond-horizon duplicate of "beta" -> state evicted, re-admitted
      stream.addData(Seq((4L, "beta", at(950)))); q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("sdb_test").collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L) && ids.contains(2L), s"first sightings must emit: $ids")
    assert(!ids.contains(3L), s"in-horizon duplicate must be dropped: $ids")
    assert(ids.contains(4L), s"beyond-horizon duplicate must be re-admitted: $ids")
  }

  test("replay harness equals the direct batch group-by") {
    import spark.implicits._
    val docs = Seq((10L, "x y"), (11L, "x y"), (12L, "z"), (13L, "x y"))
      .toDF("doc_id", "text")
    val streamed = StreamDedup.dedupReplay(spark, docs, numBatches = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = StreamDedup.dedup(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.exists(_._3 == 3L)) // the dup group collapsed
  }
}
