package graft.bench

import graft.pipeline.ResumableJob
import graft.sources.DocGen
import org.apache.spark.sql.SparkSession

/** Resume-at-scale evidence (r4 verdict #8): run the full resumable
  * extraction at sf0.1, simulate a mid-run kill by erasing half the
  * buckets' data partitions and lineage rows (the on-disk state a job
  * killed between per-wave commits leaves behind), resume, and assert:
  *
  *   1. the resume recomputes EXACTLY the missing buckets (return value
  *      + lineage row count are the oracle),
  *   2. the resumed dataset is identical to the uninterrupted run's —
  *      per-bucket (doc_count, span_count, fail_count) lineage triples
  *      match the first run's byte-for-byte,
  *   3. a third invocation is a no-op (idempotence),
  *
  * and print the full-run vs resume cost as one JSON line for BENCH.md.
  */
object ResumeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val buckets = 32
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = DocGen.rawDocs(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft-resume-probe").toString
    val snap = "probe-snap"

    def secs[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
    }

    // full run
    val (nFull, tFull) = secs(ResumableJob.runResumable(spark, raw, out, buckets, snap))
    require(nFull == buckets, s"full run computed $nFull of $buckets buckets")
    val fullLineage = ResumableJob.readLineage(spark, out)
      .select("bucket", "doc_count", "span_count", "fail_count")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val fullCount = ResumableJob.readData(spark, out).count()

    // simulated mid-run kill: odd buckets never committed — their data
    // partitions and lineage rows vanish together (per-wave commit order
    // writes data before lineage, so any prefix of committed waves looks
    // exactly like this)
    val killed = (0 until buckets).filter(_ % 2 == 1).toSet
    killed.foreach { b =>
      val dir = java.nio.file.Paths.get(s"$out/data/bucket=$b")
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(java.nio.file.Files.walk(dir)) {
          _.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
        }
      }
    }
    val keptLineage = ResumableJob.readLineage(spark, out)
      .filter(!org.apache.spark.sql.functions.col("bucket").isin(killed.toSeq: _*))
      .collect()
    val schema = ResumableJob.readLineage(spark, out).schema
    spark.createDataFrame(spark.sparkContext.parallelize(keptLineage.toIndexedSeq), schema)
      .write.mode("overwrite").parquet(s"$out/lineage")

    // resume: exactly the killed buckets recompute
    val (nResume, tResume) = secs(ResumableJob.runResumable(spark, raw, out, buckets, snap))
    require(nResume == killed.size,
      s"resume recomputed $nResume buckets, expected exactly ${killed.size}")

    // integrity: per-bucket lineage equals the uninterrupted run's
    val resumedLineage = ResumableJob.readLineage(spark, out)
      .select("bucket", "doc_count", "span_count", "fail_count")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    require(resumedLineage.toSeq == fullLineage.toSeq,
      "resumed per-bucket lineage differs from the uninterrupted run")
    require(ResumableJob.readData(spark, out).count() == fullCount,
      "resumed data row count differs from the uninterrupted run")

    // idempotence: nothing pending
    val (nAgain, _) = secs(ResumableJob.runResumable(spark, raw, out, buckets, snap))
    require(nAgain == 0, s"third run recomputed $nAgain buckets, expected 0")

    println(s"""{"probe":"resume","sf":"$sfDir","buckets":$buckets,""" +
      s""""full_secs":$tFull,"resume_secs":$tResume,""" +
      s""""resumed_buckets":$nResume,"ratio":${tResume / tFull},"ok":true}""")
    spark.stop()
  }
}
