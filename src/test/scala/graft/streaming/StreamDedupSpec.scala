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
