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

  /** cosine(a, b) over two float-array columns — the native codegen'd
    * CosineSim expression (graft.functions): same ascending sequential
    * fold as the old aggregate/zip_with chain and the DuckDB oracle, but
    * a tight generated loop instead of per-element interpreted lambdas.
    */
  private def cosine(a: String, b: String) = expr(s"cosine_sim($a, $b)")

  /** Brute-force cosine top-k: the first `nQueries` vec_ids against the
    * whole table; top `k` neighbors each (self excluded).
    */
  def cosineTopK(s: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.ensureRegistered(s)
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

  /** Multi-table sign-LSH layout: NumTables independent hash tables of
    * NumPlanes sign bits each. Recall for a neighbor with bit-agreement
    * probability p (= 1 - angle/pi) is 1-(1-p^P)^L; candidates per query
    * ≈ L·n/2^P. This corpus's true neighbors are only cos ≈ 0.38
    * (p ≈ 0.62), so P=4, L=8 targets recall ≈ 1-(1-0.15)^8 ≈ 0.72 at
    * n/16-sized buckets; for a production corpus with cos ≥ 0.85
    * near-dups (p ≈ 0.82) the same layout gives recall ≈ 0.98 — tune P
    * up as similarity rises to shrink the candidate set.
    */
  val NumPlanes = 4
  val NumTables = 8

  /** Deterministic hyperplane sign, computed ONCE on the driver: global
    * plane index i, dim d → low bit of the first 8 hex chars of
    * md5("i:d") — bit-identical to the oracle's SQL md5 derivation, but
    * baked into the plan as literal arrays instead of re-hashing per row
    * (md5-per-dim-per-plane in the expression tree cost ~50s at sf0.1).
    */
  private[sim] def planeSigns(i: Int, dim: Int): Array[Double] = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { d =>
      val digest = md5.digest(s"$i:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // SQL parity of conv(substring(md5, 1, 8), 16, 10) % 2 = low bit of byte 3
      if ((digest(3) & 1) == 1) 1.0 else -1.0
    }
  }

  private def bucketExpr(table: Int, dim: Int) = {
    val bitCols = (0 until NumPlanes).map { p =>
      val i = table * NumPlanes + p
      val signs = planeSigns(i, dim).mkString(",")
      val dot = expr(
        s"aggregate(zip_with(embedding, array($signs), (x, y) -> cast(x AS double) * y), 0D, (acc, v) -> acc + v)")
      when(dot >= 0, lit(1L << p)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** (vec_id, tbl, bucket) — one row per hash table per vector. */
  def lshBuckets(s: SparkSession, dir: String): DataFrame = {
    val emb = embeddings(s, dir)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    emb
      .withColumn("buckets", array((0 until NumTables).map(bucketExpr(_, dim)): _*))
      .select(col("vec_id"), col("label"),
        posexplode(col("buckets")).as(Seq("tbl", "bucket")))
  }

  /** Multi-table LSH ANN: candidates = vectors sharing a (table, bucket)
    * with the query in ANY table, deduped, then exact cosine + top-k.
    * At 10^9 vectors the per-table bucket join + pair dedup replaces the
    * O(n·q) scan; embeddings are re-attached AFTER dedup so the shuffle
    * carries (q_id, vec_id) pairs, not vectors.
    */
  def lshTopK(s: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.ensureRegistered(s)
    val emb = embeddings(s, dir)
    val buckets = lshBuckets(s, dir)
    val qBuckets = broadcast(
      buckets.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("tbl").as("q_tbl"), col("bucket").as("q_bucket")))
    val pairs = buckets
      .join(qBuckets,
        col("tbl") === col("q_tbl") && col("bucket") === col("q_bucket") &&
          col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
    val qEmb = broadcast(
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    pairs
      .join(emb, "vec_id")
      .join(qEmb, "q_id")
      .withColumn("cos", round(cosine("q_emb", "embedding"), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
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
