package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Brute-force cosine top-k is the correctness baseline: a broadcast of
  * the (small) query set against the full table — one pass, no shuffle of
  * the big side, codegen'd higher-order expressions for the dot product
  * (`aggregate`/`zip_with`), never a driver-side loop.
  *
  * The scale path is sign-LSH: deterministic pseudo-random hyperplanes
  * (hash-derived, no RNG), bucket on the sign bit-string, search within
  * bucket only — candidate generation is O(bucket size), not O(n).
  */
object Similarity {

  def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** cosine(a, b) as a codegen'd column over two float-array columns. */
  private def cosine(a: String, b: String) = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x AS double) * cast(y AS double)), 0D, (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, 0D, (acc, v) -> acc + cast(v AS double) * cast(v AS double)))
       |  * sqrt(aggregate($b, 0D, (acc, v) -> acc + cast(v AS double) * cast(v AS double))))""".stripMargin)

  /** Brute-force cosine top-k: the first `nQueries` vec_ids against the
    * whole table; top `k` neighbors each (self excluded).
    */
  def cosineTopK(s: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = embeddings(s, dir)
    val queries = broadcast(
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    emb.join(queries, col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(cosine("q_emb", "embedding"), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  val NumPlanes = 12

  /** Deterministic hyperplane component: plane p, dimension d →
    * pseudo-random sign from md5 — reproducible on any cluster, no RNG.
    * plane(p)·v ≈ sum over dims of sign(p,d) * v[d] where
    * sign(p,d) = +1 if bit of md5("p:d") else -1.
    */
  private def planeSignExpr(p: Int): String = {
    // sign vector as an array column expression: md5 of "p:d" low bit
    s"""transform(sequence(0, size(embedding) - 1),
       | d -> CASE WHEN pmod(cast(conv(substring(md5(concat('$p', ':', d)), 1, 8), 16, 10) as bigint), 2) = 1
       |   THEN 1D ELSE -1D END)""".stripMargin
  }

  /** Sign-LSH bucket id per vector: NumPlanes sign bits. */
  def lshBuckets(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    val bitCols = (0 until NumPlanes).map { p =>
      val dot = expr(
        s"aggregate(zip_with(embedding, ${planeSignExpr(p)}, (x, y) -> cast(x AS double) * y), 0D, (acc, v) -> acc + v)")
      when(dot >= 0, lit(1L << p)).otherwise(0L)
    }
    emb.withColumn("bucket", bitCols.reduce(_ + _))
  }

  /** LSH-bucketed ANN: neighbors searched within the query's bucket only.
    * Reports the top-k by true cosine within bucket — at 10^9 vectors the
    * bucket join replaces the full scan.
    */
  def lshTopK(s: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = lshBuckets(s, dir)
    val queries = broadcast(
      bucketed.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket").as("q_bucket")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    bucketed.join(queries, col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(cosine("q_emb", "embedding"), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"), col("bucket"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Centroid (mean vector) per label — the IVF coarse-quantizer step:
    * one groupBy over posexploded components (shuffles label×dim partial
    * sums, not raw vectors).
    */
  def labelCentroids(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("dim", col("dim").cast("long"))
      .groupBy("label", "dim")
      .agg((round(avg(col("v")), 4) + lit(0.0)).as("mean_v"))
      .orderBy("label", "dim")
}
