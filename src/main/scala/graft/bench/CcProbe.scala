package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev probe: CC loop cost over the real t10 pair frame. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pairs = graft.textops.TextOps.minhashLsh(spark, sfDir, 0.5).select("a", "b")
    pairs.count()
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = graft.textops.TextOps.connectedComponents(pairs).count()
      println(s"[ccprobe] iter=$i comp_rows=$c secs=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
