package graft

import graft.textops.TextOps

/** DuckDB-dialect oracle SQL for the text/similarity operators —
  * generated from the SAME Scala constants the Spark plans use (hash
  * coefficients, stopword lists, band layout), so the two sides cannot
  * drift. Where the dialects differ (hex parse, list lambdas, unnest
  * ordinality) the semantics are kept bit-identical: same operation
  * order for float math, same MD5-derived hashes.
  */
object OracleSql {

  private def sqlList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  val tokenCount: String =
    """SELECT doc_id,
      | len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
      | len(regexp_extract_all(lower(text), '[a-z]+')) AS n_word_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  val qualityScore: String = {
    val stops = sqlList(graft.matching.Corpora.englishStopwords.toSeq.sorted)
    s"""WITH q AS (
       | SELECT doc_id, length(text) AS n_chars,
       |  regexp_extract_all(lower(text), '[a-z]+') AS toks,
       |  length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS punct_len
       | FROM documents),
       |q2 AS (
       | SELECT doc_id, n_chars, len(toks) AS n_tokens,
       |  round(punct_len::DOUBLE / greatest(n_chars, 1), 4) AS punct_ratio,
       |  round(len(list_filter(toks, t -> t IN ($stops)))::DOUBLE
       |    / greatest(len(toks), 1), 4) AS stop_ratio
       | FROM q)
       |SELECT doc_id, n_chars, n_tokens, punct_ratio, stop_ratio,
       | round(least(n_tokens::DOUBLE / 100.0, 1.0) * 0.4
       |   + (1.0 - punct_ratio) * 0.3
       |   + least(stop_ratio * 4.0, 1.0) * 0.3, 4) AS quality_score
       |FROM q2 ORDER BY doc_id""".stripMargin
  }

  val langId: String = {
    def hits(lang: String) =
      s"len(list_filter(regexp_extract_all(lower(text), '[a-z]+'), t -> t IN (${sqlList(TextOps.langStopwords(lang))})))"
    s"""WITH s AS (
       | SELECT doc_id,
       |  ${hits("en")} AS s_en, ${hits("es")} AS s_es,
       |  ${hits("de")} AS s_de, ${hits("fr")} AS s_fr,
       |  length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS s_zh
       | FROM documents),
       |m AS (SELECT *, greatest(s_en, s_es, s_de, s_fr, s_zh) AS mx FROM s)
       |SELECT doc_id, s_en, s_es, s_de, s_fr, s_zh,
       | CASE WHEN mx = 0 THEN 'und'
       |  WHEN s_en = mx THEN 'en' WHEN s_es = mx THEN 'es'
       |  WHEN s_de = mx THEN 'de' WHEN s_fr = mx THEN 'fr'
       |  ELSE 'zh' END AS lang_pred
       |FROM m ORDER BY doc_id""".stripMargin
  }

  private val fpExpr = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"

  val fingerprint: String =
    s"SELECT doc_id, $fpExpr AS fp FROM documents ORDER BY doc_id"

  val dedupExact: String =
    s"""SELECT doc_id, fp, rn, rn > 1 AS is_dup FROM (
       | SELECT doc_id, $fpExpr AS fp,
       |  row_number() OVER (PARTITION BY $fpExpr ORDER BY doc_id) AS rn
       | FROM documents) ORDER BY doc_id""".stripMargin

  /** Shared shingle CTE (distinct word-3-grams). */
  private val shinglesCte =
    """toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t FROM documents),
      |sh_raw AS (SELECT doc_id,
      |  unnest(list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS sh
      | FROM toks WHERE len(t) >= 3),
      |sh AS (SELECT DISTINCT doc_id, sh FROM sh_raw)""".stripMargin

  def ngramJaccard(threshold: Double): String =
    s"""WITH $shinglesCte,
       |keep AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
       | WHERE df <= ${TextOps.MaxShingleDf}),
       |shf AS (SELECT s.doc_id, s.sh FROM sh s JOIN keep k ON s.sh = k.sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
       | FROM shf x JOIN shf y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2)
       |SELECT a, b, round(i::DOUBLE / (sa.n + sb.n - i), 4) AS jaccard
       |FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
       |WHERE round(i::DOUBLE / (sa.n + sb.n - i), 4) >= $threshold
       |ORDER BY a, b""".stripMargin

  def minhashLsh(threshold: Double): String = {
    import TextOps.{MinhashP => p, NumHashes, NumBands, hashA, hashB}
    val r = NumHashes / NumBands
    val mins = (0 until NumHashes).map(i =>
      s"min((${hashA(i)} * h + ${hashB(i)}) % $p) AS m$i").mkString(",\n  ")
    val bandSelects = (0 until NumBands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => s"m$i").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $cols)) AS bh FROM sig"
    }.mkString("\n UNION ALL\n ")
    s"""WITH $shinglesCte,
       |hs AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT % $p AS h FROM sh),
       |sig AS (SELECT doc_id,
       |  $mins
       | FROM hs GROUP BY doc_id),
       |bands AS (
       | $bandSelects),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       | FROM bands x JOIN bands y
       | ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
       | FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id GROUP BY 1, 2)
       |SELECT c.a AS a, c.b AS b, round(i::DOUBLE / (sa.n + sb.n - i), 4) AS jaccard
       |FROM cand c JOIN inter ON inter.a = c.a AND inter.b = c.b
       |JOIN sizes sa ON sa.doc_id = c.a JOIN sizes sb ON sb.doc_id = c.b
       |WHERE round(i::DOUBLE / (sa.n + sb.n - i), 4) >= $threshold
       |ORDER BY c.a, c.b""".stripMargin
  }

  val simhash: String = {
    import TextOps.SimhashBits
    val bitSums = (0 until SimhashBits).map { b =>
      val src = if (b < 31) "h1" else "h2"
      val shift = b % 31
      s"sum(CASE WHEN ($src >> $shift) & 1 = 1 THEN tf ELSE -tf END) AS b$b"
    }.mkString(",\n  ")
    val hashSum = (0 until SimhashBits).map { b =>
      s"CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH toks AS (
       | SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       |h AS (SELECT doc_id, tf,
       |  ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h1,
       |  ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h2 FROM tf),
       |sums AS (SELECT doc_id,
       |  $bitSums
       | FROM h GROUP BY doc_id)
       |SELECT doc_id, $hashSum AS simhash FROM sums ORDER BY doc_id""".stripMargin
  }

  /** DuckDB reconstruction of MediaOps.mediaTable — same deterministic
    * payload bytes derived from doc_id, so the Spark binary path and the
    * SQL arithmetic agree by construction.
    */
  private val mediaCte =
    """media AS (SELECT doc_id,
      |  (['image','audio','video'])[(doc_id % 3 + 1)::INT] AS media_type,
      |  encode('HDR|' || (['image','audio','video'])[(doc_id % 3 + 1)::INT] ||
      |   '|' || doc_id || '|' || repeat('x', (doc_id % 50)::INT * 3 + 8)) AS payload
      | FROM documents)""".stripMargin

  val mediaStats: String =
    s"""WITH $mediaCte
       |SELECT media_type, count(*) AS n,
       | sum(octet_length(payload))::BIGINT AS total_bytes,
       | min(octet_length(payload))::BIGINT AS min_bytes,
       | max(octet_length(payload))::BIGINT AS max_bytes
       |FROM media GROUP BY 1 ORDER BY 1""".stripMargin

  val imageMeta: String =
    """SELECT doc_id,
      | (320 + (doc_id % 10) * 32)::BIGINT AS width,
      | (240 + (doc_id % 10) * 24)::BIGINT AS height,
      | 3::BIGINT AS channels,
      | ((320 + (doc_id % 10) * 32) * (240 + (doc_id % 10) * 24))::BIGINT AS n_pixels
      |FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""".stripMargin

  val audioFeatures: String =
    s"""WITH $mediaCte
       |SELECT doc_id,
       | (16000 + (doc_id % 4) * 8000)::BIGINT AS sample_rate,
       | (octet_length(payload) * 1024)::BIGINT AS n_samples,
       | ((octet_length(payload) * 1024 * 1000) // (16000 + (doc_id % 4) * 8000))::BIGINT AS duration_ms
       |FROM media WHERE media_type = 'audio' ORDER BY doc_id""".stripMargin

  val frameSample: String =
    """WITH v AS (SELECT doc_id, (24 + doc_id % 72)::BIGINT AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (SELECT doc_id, n_frames,
      |  unnest(range(0, n_frames, 12))::BIGINT AS frame_idx FROM v)
      |SELECT doc_id, n_frames, frame_idx,
      | 'frame://' || doc_id || '/' || frame_idx AS frame_ref
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  val resizePlan: String =
    """WITH img AS (SELECT doc_id,
      |  (320 + (doc_id % 10) * 32)::BIGINT AS width,
      |  (240 + (doc_id % 10) * 24)::BIGINT AS height
      | FROM documents WHERE doc_id % 3 = 0),
      |sc AS (SELECT *, least(256.0 / width, 256.0 / height, 1.0) AS scale FROM img)
      |SELECT doc_id, width, height,
      | floor(width * scale)::BIGINT AS out_w,
      | floor(height * scale)::BIGINT AS out_h,
      | (floor(width * scale)::BIGINT * floor(height * scale)::BIGINT * 3) AS out_bytes
      |FROM sc ORDER BY doc_id""".stripMargin

  /** Cosine with the exact same operation order as the Spark
    * aggregate/zip_with plan (sequential left fold over double casts) —
    * bit-identical IEEE math, so round(,4) always agrees.
    */
  private def cosineSql(a: String, b: String): String =
    s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x, y) -> x + y)
       | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x, y) -> x + y))
       |  * sqrt(list_reduce(list_transform(range(len($b)), i -> $b[i+1]::DOUBLE * $b[i+1]::DOUBLE), (x, y) -> x + y))))""".stripMargin

  def cosineTopK(nQueries: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < $nQueries),
       |j AS (SELECT q_id, vec_id,
       |  round(${cosineSql("q_emb", "embedding")}, 4) AS cos
       | FROM embeddings, q WHERE vec_id <> q_id),
       |r AS (SELECT q_id, vec_id, cos,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM j)
       |SELECT q_id, rank, vec_id, cos FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** Sign-LSH bucket rows (one per table per vector) — mirrors
    * Similarity.lshBuckets' md5-derived plane signs.
    */
  private def lshBucketRowsSql: String = {
    import graft.sim.Similarity.{NumPlanes, NumTables}
    def planeBit(i: Int, p: Int): String =
      s"""CASE WHEN list_reduce(list_transform(range(len(embedding)),
         |  d -> embedding[d+1]::DOUBLE *
         |   (CASE WHEN ('0x' || substr(md5('$i' || ':' || d), 1, 8))::BIGINT % 2 = 1 THEN 1.0 ELSE -1.0 END)),
         |  (x, y) -> x + y) >= 0 THEN ${1L << p}::BIGINT ELSE 0::BIGINT END""".stripMargin
    val tableExprs = (0 until NumTables).map { t =>
      (0 until NumPlanes).map(p => planeBit(t * NumPlanes + p, p)).mkString(" + ")
    }
    tableExprs.zipWithIndex.map { case (e, t) =>
      s"SELECT vec_id, $t AS tbl, ($e) AS bucket FROM embeddings"
    }.mkString("\n UNION ALL\n ")
  }

  def lshTopK(nQueries: Int, k: Int): String = {
    val bucketRows = lshBucketRowsSql
    s"""WITH b AS (
       | $bucketRows),
       |qb AS (SELECT vec_id AS q_id, tbl AS q_tbl, bucket AS q_bucket FROM b WHERE vec_id < $nQueries),
       |pairs AS (SELECT DISTINCT q_id, vec_id
       | FROM b JOIN qb ON tbl = q_tbl AND bucket = q_bucket AND vec_id <> q_id),
       |qe AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < $nQueries),
       |j AS (SELECT p.q_id, p.vec_id,
       |  round(${cosineSql("q_emb", "embedding")}, 4) AS cos
       | FROM pairs p JOIN embeddings e ON e.vec_id = p.vec_id
       | JOIN qe ON qe.q_id = p.q_id),
       |r AS (SELECT q_id, vec_id, cos,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM j)
       |SELECT q_id, rank, vec_id, cos FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  def embeddingDedup(threshold: Double): String = {
    val bucketRows = lshBucketRowsSql
    s"""WITH b AS (
       | $bucketRows),
       |pairs AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       | FROM b x JOIN b y ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
       |j AS (SELECT p.a, p.b,
       |  round(${cosineSql("ea.embedding", "eb.embedding")}, 4) AS cos
       | FROM pairs p JOIN embeddings ea ON ea.vec_id = p.a
       | JOIN embeddings eb ON eb.vec_id = p.b)
       |SELECT a, b, cos FROM j WHERE cos >= $threshold ORDER BY a, b""".stripMargin
  }

  /** float[] vs double[] centroid cosine — mirrors Similarity.cosineMixed. */
  private def cosineMixedSql(a: String, c: String): String =
    s"""(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $c[i+1]), (x, y) -> x + y)
       | / (sqrt(list_reduce(list_transform(range(len($a)), i -> $a[i+1]::DOUBLE * $a[i+1]::DOUBLE), (x, y) -> x + y))
       |  * sqrt(list_reduce(list_transform(range(len($c)), i -> $c[i+1] * $c[i+1]), (x, y) -> x + y))))""".stripMargin

  def ivfTopK(nQueries: Int, k: Int): String = {
    import graft.sim.Similarity.NProbe
    s"""WITH exp AS (SELECT label, unnest(embedding) AS v,
       |  generate_subscripts(embedding, 1) - 1 AS dim FROM embeddings),
       |cent AS (SELECT label, dim, round(avg(v), 4) + 0.0 AS mean_v FROM exp GROUP BY 1, 2),
       |centarr AS (SELECT label AS c_label, list(mean_v ORDER BY dim) AS centroid
       | FROM cent GROUP BY 1),
       |asg0 AS (SELECT e.vec_id, e.embedding, c.c_label,
       |  ${cosineMixedSql("e.embedding", "c.centroid")} AS cos_c
       | FROM embeddings e CROSS JOIN centarr c),
       |asg AS (SELECT vec_id, embedding, c_label AS cell FROM (
       | SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, c_label) AS rn
       | FROM asg0) WHERE rn = 1),
       |probes AS (SELECT vec_id AS q_id, embedding AS q_emb, c_label AS probe_cell FROM (
       | SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, c_label) AS rn
       | FROM asg0 WHERE vec_id < $nQueries) WHERE rn <= $NProbe),
       |j AS (SELECT q_id, vec_id, round(${cosineSql("q_emb", "embedding")}, 4) AS cos
       | FROM asg JOIN probes ON cell = probe_cell AND vec_id <> q_id),
       |r AS (SELECT q_id, vec_id, cos,
       | row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank FROM j)
       |SELECT q_id, rank, vec_id, cos FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  }

  val labelCentroids: String =
    """SELECT label, dim, round(avg(v), 4) + 0.0 AS mean_v
      |FROM (SELECT label, unnest(embedding) AS v,
      |  generate_subscripts(embedding, 1) - 1 AS dim FROM embeddings)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
