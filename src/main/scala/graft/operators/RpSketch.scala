package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ScalarFns

/** N3 bit-sketch ANN — sign random projection (random-hyperplane LSH
  * for cosine, Charikar STOC'02), the third approximate-search family
  * next to IVF (bucket pruning) and PQ (code compression): each
  * embedding folds to a [[Bits]]-bit code (bit j = sign of the dot
  * product with hyperplane j), queries rank by CODE Hamming distance
  * and only the Hamming-radius survivors touch float math again in an
  * exact re-rank. Part of the beyond-reference LLM-pipeline family
  * (SURVEY.md §2.11 N3) — the memory-floor variant: 2 bytes per vector
  * here vs 4 code bytes for PQ and full floats for IVF.
  *
  * At 100 TB: codes are 256× smaller than the 64-float vectors, so the
  * WHOLE corpus' sketch fits where even PQ codes strain; the Hamming
  * scan is a map-only sweep of an int column against one broadcast
  * query code (bit_count(code ^ qcode) — codegen'd integer ops, no
  * float loads), and the re-rank touches only the radius survivors.
  * Banding the code (simhash probe-table idiom, [[TextOps]]) turns the
  * scan into an equi-join when even one pass is too much.
  *
  * Determinism: hyperplane weights are ±1 by the top bit of
  * md5("j_d") — a digest both engines compute identically, so the
  * planes are SHARED with the oracle without shipping a single float;
  * projections fold dimensions in fixed order (the [[Similarity]]
  * dot-product discipline), so every code is bit-identical cross-engine.
  */
object RpSketch {
  private[graft] val Bits = 16
  /** Embedding dimensionality of the driver corpus (TESTDATA.md). */
  private[graft] val Dim = 64
  /** Hamming radius of the candidate gate in [[rpTopk]]. */
  private[graft] val Radius = 4

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** ±1 weight of (hyperplane j, 1-BASED dim d): +1 iff the top bit of
    * md5("j_d") is 0 (first hex char ≤ '7'). */
  private[graft] def weight(j: Int, d: Int): Double =
    if (md5hex(s"${j}_${d}").charAt(0) <= '7') 1.0 else -1.0

  /** Left-fold double projection of `embedding` onto hyperplane j —
    * the weights are plan literals (computed once at plan build), the
    * fold order is the oracle's list_reduce order. */
  private def projExpr(j: Int): Column = {
    val arr = (1 to Dim).map(d => s"${weight(j, d)}D").mkString(",")
    expr(s"aggregate(zip_with(embedding, array($arr), " +
      "(x, w) -> CAST(x AS DOUBLE) * w), CAST(0.0 AS DOUBLE), " +
      "(acc, v) -> acc + v)")
  }

  /** The 16-bit sketch: Σⱼ (projⱼ ≥ 0) · 2ʲ. */
  private[graft] def codeExpr: Column =
    (0 until Bits).map(j =>
      when(projExpr(j) >= 0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _).cast("int")

  /** (vec_id, code) for the whole corpus — built once per (session,
    * dir) through the S6 cache; every RP consumer (codes dump, search,
    * recall) reads this one frame. */
  private[graft] def codesFrame(spark: SparkSession, dir: String): DataFrame =
    graft.sources.ResultCache.getOrCompute(
      s"${graft.sources.ResultCache.sessionId(spark)}|rp_codes|$dir",
      ttlSeconds = 300) {
      Tables.fanOut(spark,
          Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding")),
          key = "vec_id")
        .select(col("vec_id"), codeExpr.as("code"))
    }

  /** The graded code table. */
  def rpCodes(spark: SparkSession, dir: String): DataFrame =
    codesFrame(spark, dir).orderBy("vec_id")

  /** Two-stage RP search for query vec_id 0: map-only Hamming gate at
    * radius [[Radius]] over the int codes (no float math), exact
    * cosine re-rank of the survivors, top-10. */
  def rpTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    graft.plans.VectorExpressions.register(spark)
    val codes = codesFrame(spark, dir)
    val qc = codes.filter(col("vec_id") === 0).select(col("code").as("qcode"))
    val e = Tables(spark, dir, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    codes.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qc))
      .withColumn("hamming", expr("bit_count(code ^ qcode)").cast("int"))
      .filter(col("hamming") <= Radius)
      .join(e, Seq("vec_id"))
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("hamming"),
        ScalarFns.roundN(expr("cosine_sim(embedding, qv)"), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Wide (64-plane) sketch banding: [[WideBands]] bands of
    * [[BandBits]] bits. Band WIDTH is the selectivity/recall knob: a
    * band collides with probability ~2^−BandBits, and by pigeonhole
    * any vector within wide Hamming ≤ WideBands−1 shares ≥1 band — 8×8
    * keeps the gate populated at bench corpus sizes while the same
    * machinery runs 4×16 (collision ~N/65536) when 100 TB needs the
    * sharper knife. */
  private[graft] val WideBands = 8
  private[graft] val BandBits = 8

  /** Band k of the wide sketch: its own [[BandBits]]-bit code over
    * planes k·BandBits .. (k+1)·BandBits−1. The wide code is never
    * materialized as one 64-bit integer: per-band int columns sidestep
    * every sign-bit/shift-semantics hazard in both engines. */
  private def bandCodeExpr(k: Int): Column =
    (0 until BandBits).map(i =>
      when(projExpr(BandBits * k + i) >= 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _).cast("int")

  /** (vec_id, b0..b3) — the wide sketch, one cached build per
    * (session, dir). */
  private[graft] def wideCodesFrame(spark: SparkSession, dir: String): DataFrame =
    graft.sources.ResultCache.getOrCompute(
      s"${graft.sources.ResultCache.sessionId(spark)}|rp_codes_wide|$dir",
      ttlSeconds = 300) {
      Tables.fanOut(spark,
          Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding")),
          key = "vec_id")
        .select(Seq(col("vec_id")) ++
          (0 until WideBands).map(k => bandCodeExpr(k).as(s"b$k")): _*)
    }

  /** BANDED candidate generation over the wide sketch — the
    * LSH-banding scale path: a candidate shares at least one
    * [[BandBits]]-bit band with the query, so by pigeonhole every
    * vector within wide Hamming ≤ [[WideBands]]−1 is retained
    * (RpSketchSpec asserts the superset), while expected collisions
    * fall ∝ N/2^BandBits per band — selectivity a full-code Hamming
    * scan cannot reach without reading every row. With ONE query
    * the gate is a broadcast OR-filter (map-only, no float loads); a
    * query BATCH turns it into explode(4 band rows) + equi-join on
    * (band, value) — the cosineTopkBatch shape. Survivors re-rank by
    * exact cosine; n_bands (matching-band count) is the diagnostic. */
  def rpTopkBanded(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    graft.plans.VectorExpressions.register(spark)
    val codes = wideCodesFrame(spark, dir)
    val qb = codes.filter(col("vec_id") === 0)
      .select((0 until WideBands).map(i => col(s"b$i").as(s"q$i")): _*)
    val e = Tables(spark, dir, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val matches = (0 until WideBands).map(i => col(s"b$i") === col(s"q$i"))
    codes.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qb))
      .withColumn("n_bands",
        matches.map(m => when(m, 1).otherwise(0)).reduce(_ + _).cast("int"))
      .filter(col("n_bands") >= 1)
      .join(e, Seq("vec_id"))
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("n_bands"),
        ScalarFns.roundN(expr("cosine_sim(embedding, qv)"), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** The 4×16-bit operating point on the band-width curve (r6 verdict
    * #8): the SAME 64-plane sketch re-banded by pairing adjacent 8-bit
    * bands — no new codes, a pure re-gate. A 16-bit band collides at
    * ~2⁻¹⁶ (vs 2⁻⁸), and the pigeonhole retention bound weakens to
    * wide Hamming ≤ 3 (vs ≤ 7): at bench corpus sizes the gate keeps
    * NOTHING (recall 0 at sf0.01, vs 0.2 for 8×8) — the selectivity/
    * recall cliff the width knob hits when bands outnumber the
    * corpus's collision probability, graded so the diagnostic pins it.
    * A pair-match implies both 8-bit halves match, so candidates here
    * are PROVABLY a subset of the 8×8 gate's (spec-asserted). */
  private[graft] def rpTopkBanded16(spark: SparkSession, dir: String,
      k: Int = 10): DataFrame = {
    graft.plans.VectorExpressions.register(spark)
    val codes = wideCodesFrame(spark, dir)
    val qb = codes.filter(col("vec_id") === 0)
      .select((0 until WideBands).map(i => col(s"b$i").as(s"q$i")): _*)
    val e = Tables(spark, dir, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val pairs = (0 until WideBands / 2).map(i =>
      (col(s"b${2 * i}") === col(s"q${2 * i}")) &&
        (col(s"b${2 * i + 1}") === col(s"q${2 * i + 1}")))
    codes.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qb))
      .withColumn("n_bands",
        pairs.map(m => when(m, 1).otherwise(0)).reduce(_ + _).cast("int"))
      .filter(col("n_bands") >= 1)
      .join(e, Seq("vec_id"))
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("n_bands"),
        ScalarFns.roundN(expr("cosine_sim(embedding, qv)"), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Recall@10 of each RP gate against the exact top-10 — the
    * deployment-quality diagnostic, same contract as `pq_recall`: one
    * row per method (Hamming-radius scan, 8×8 and 4×16 banded
    * equi-gates), so the recall cost of each pruning strategy — and
    * the band-width cliff — is graded side by side. */
  def rpRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = Similarity.cosineTopk(spark, dir).select(col("vec_id"))
    def methodRow(method: String, approx: DataFrame): DataFrame =
      exact.join(approx.select(col("vec_id")), Seq("vec_id"))
        .agg(count(lit(1)).as("n_overlap"))
        .select(lit(method).as("method"),
          col("n_overlap"),
          ScalarFns.roundN(col("n_overlap").cast("double") / 10.0, 4)
            .as("recall_at_10"))
    methodRow(s"rp_hamming_r$Radius", rpTopk(spark, dir))
      .unionByName(
        methodRow(s"rp_banded_${WideBands}x$BandBits", rpTopkBanded(spark, dir)))
      .unionByName(
        methodRow(s"rp_banded_${WideBands / 2}x${BandBits * 2}",
          rpTopkBanded16(spark, dir)))
      .orderBy("method")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rp_codes"       -> (rpCodes(_, _)),
    "rp_topk"        -> ((s: SparkSession, d: String) => rpTopk(s, d)),
    "rp_topk_banded" -> ((s: SparkSession, d: String) => rpTopkBanded(s, d)),
    "rp_recall"      -> (rpRecall(_, _)))

  /** Shared sketch CTE chain: hyperplanes from the same md5 top bit,
    * projections via the same-order list_reduce fold, codes as the
    * same Σ2ʲ. Ends at `codes(vec_id, code)`. */
  private def rpCtes: String =
    s"""WITH w AS (
       |  SELECT j, list_transform(generate_series(1, $Dim), d ->
       |    CASE WHEN substr(md5(CAST(j AS VARCHAR) || '_' ||
       |                        CAST(d AS VARCHAR)), 1, 1)
       |         BETWEEN '0' AND '7' THEN CAST(1.0 AS DOUBLE)
       |         ELSE CAST(-1.0 AS DOUBLE) END) AS wv
       |  FROM (SELECT unnest(generate_series(0, ${Bits - 1})) AS j) jj),
       |proj AS (
       |  SELECT e.vec_id, w.j,
       |    list_reduce(list_transform(generate_series(1, $Dim),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * w.wv[i]),
       |      (x, y) -> x + y) AS p
       |  FROM embeddings e CROSS JOIN w),
       |codes AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN p >= 0 THEN 1 << j ELSE 0 END) AS INT) AS code
       |  FROM proj GROUP BY 1)""".stripMargin

  /** Hamming + re-rank CTEs on top of [[rpCtes]] — ends at
    * `ranked(vec_id, hamming, cosine_sim)` (the top-10). Hamming is a
    * per-bit shift-compare fold (engine-portable; the Spark side uses
    * the equivalent bit_count(xor)). */
  private def rpTopkCtes: String = {
    val cos = ScalarFns.roundSql(
      s"""${Similarity.duckDot("e.embedding", "q.qv")}
         |      / (sqrt(${Similarity.duckDot("e.embedding", "e.embedding")})
         |         * sqrt(${Similarity.duckDot("q.qv", "q.qv")}))""".stripMargin, 6)
    s"""$rpCtes,
       |qc AS (SELECT code AS qcode FROM codes WHERE vec_id = 0),
       |ham AS (
       |  SELECT c.vec_id,
       |    CAST(list_reduce(list_transform(generate_series(0, ${Bits - 1}),
       |      j -> CASE WHEN ((c.code >> j) & 1) <> ((q.qcode >> j) & 1)
       |           THEN 1 ELSE 0 END), (x, y) -> x + y) AS INT) AS hamming
       |  FROM codes c, qc q WHERE c.vec_id <> 0),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |ranked AS (
       |  SELECT h.vec_id, h.hamming, $cos AS cosine_sim
       |  FROM ham h JOIN embeddings e ON h.vec_id = e.vec_id, q
       |  WHERE h.hamming <= $Radius
       |  ORDER BY cosine_sim DESC, h.vec_id LIMIT 10)""".stripMargin
  }

  /** Wide-sketch CTE chain: 64 planes, per-band 16-bit codes — ends at
    * `codesw(vec_id, b0..b3)`. Band values are built bit-by-bit within
    * each band (1 << (j − 16k)), so no 64-bit integer (and no
    * shift-sign semantics) exists in either engine. */
  private def rpWideCtes: String = {
    val bandCols = (0 until WideBands).map { k =>
      s"""    CAST(sum(CASE WHEN p >= 0 AND j BETWEEN ${BandBits * k} AND ${BandBits * k + BandBits - 1}
         |      THEN 1 << (j - ${BandBits * k}) ELSE 0 END) AS INT) AS b$k""".stripMargin
    }.mkString(",\n")
    s"""WITH w64 AS (
       |  SELECT j, list_transform(generate_series(1, $Dim), d ->
       |    CASE WHEN substr(md5(CAST(j AS VARCHAR) || '_' ||
       |                        CAST(d AS VARCHAR)), 1, 1)
       |         BETWEEN '0' AND '7' THEN CAST(1.0 AS DOUBLE)
       |         ELSE CAST(-1.0 AS DOUBLE) END) AS wv
       |  FROM (SELECT unnest(generate_series(0, ${BandBits * WideBands - 1})) AS j) jj),
       |proj64 AS (
       |  SELECT e.vec_id, w64.j,
       |    list_reduce(list_transform(generate_series(1, $Dim),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * w64.wv[i]),
       |      (x, y) -> x + y) AS p
       |  FROM embeddings e CROSS JOIN w64),
       |codesw AS (
       |  SELECT vec_id,
       |$bandCols
       |  FROM proj64 GROUP BY 1)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "rp_topk_banded" -> {
      val cos = ScalarFns.roundSql(
        s"""${Similarity.duckDot("e.embedding", "q.qv")}
           |      / (sqrt(${Similarity.duckDot("e.embedding", "e.embedding")})
           |         * sqrt(${Similarity.duckDot("q.qv", "q.qv")}))""".stripMargin, 6)
      val nb = (0 until WideBands)
        .map(k => s"CASE WHEN c.b$k = qb.b$k THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""$rpWideCtes,
         |qb AS (SELECT ${(0 until WideBands).map(k => s"b$k").mkString(", ")}
         |       FROM codesw WHERE vec_id = 0),
         |gate AS (
         |  SELECT c.vec_id, CAST($nb AS INT) AS n_bands
         |  FROM codesw c, qb
         |  WHERE c.vec_id <> 0),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT g.vec_id, g.n_bands, $cos AS cosine_sim
         |FROM gate g JOIN embeddings e ON g.vec_id = e.vec_id, q
         |WHERE g.n_bands >= 1
         |ORDER BY cosine_sim DESC, g.vec_id LIMIT 10""".stripMargin
    },
    "rp_codes" ->
      s"""$rpCtes
         |SELECT vec_id, code FROM codes ORDER BY vec_id""".stripMargin,
    "rp_topk" ->
      s"""$rpTopkCtes
         |SELECT vec_id, hamming, cosine_sim FROM ranked
         |ORDER BY cosine_sim DESC, vec_id""".stripMargin,
    "rp_recall" -> {
      val cos = ScalarFns.roundSql(
        s"""${Similarity.duckDot("e.embedding", "q.qv")}
           |      / (sqrt(${Similarity.duckDot("e.embedding", "e.embedding")})
           |         * sqrt(${Similarity.duckDot("q.qv", "q.qv")}))""".stripMargin, 6)
      // Both gate chains in one statement: the narrow-sketch CTEs keep
      // their names (w/proj/codes/ranked), the wide chain its own
      // (w64/proj64/codesw) — `q` is shared. The banded top-10 mirrors
      // the rp_topk_banded oracle exactly.
      val nb = (0 until WideBands)
        .map(k => s"CASE WHEN c.b$k = qb.b$k THEN 1 ELSE 0 END")
        .mkString(" + ")
      // 4×16 gate: a band is a PAIR of adjacent 8-bit bands, both equal
      val nb16 = (0 until WideBands / 2)
        .map(i => s"CASE WHEN c.b${2 * i} = qb.b${2 * i} " +
          s"AND c.b${2 * i + 1} = qb.b${2 * i + 1} THEN 1 ELSE 0 END")
        .mkString(" + ")
      val wideBody = rpWideCtes.stripPrefix("WITH ")
      s"""$rpTopkCtes,
         |$wideBody,
         |qb AS (SELECT ${(0 until WideBands).map(k => s"b$k").mkString(", ")}
         |       FROM codesw WHERE vec_id = 0),
         |rankedb AS (
         |  SELECT c.vec_id, $cos AS cosine_sim
         |  FROM codesw c, qb, embeddings e, q
         |  WHERE c.vec_id <> 0 AND c.vec_id = e.vec_id
         |    AND ($nb) >= 1
         |  ORDER BY cosine_sim DESC, c.vec_id LIMIT 10),
         |rankedb16 AS (
         |  SELECT c.vec_id, $cos AS cosine_sim
         |  FROM codesw c, qb, embeddings e, q
         |  WHERE c.vec_id <> 0 AND c.vec_id = e.vec_id
         |    AND ($nb16) >= 1
         |  ORDER BY cosine_sim DESC, c.vec_id LIMIT 10),
         |exact AS (
         |  SELECT e.vec_id, $cos AS cs
         |  FROM embeddings e, q
         |  WHERE e.vec_id <> 0
         |  ORDER BY cs DESC, e.vec_id LIMIT 10)
         |SELECT * FROM (
         |  SELECT 'rp_hamming_r$Radius' AS method,
         |    CAST(count(*) AS BIGINT) AS n_overlap,
         |    ${ScalarFns.roundSql("count(*) / 10.0", 4)} AS recall_at_10
         |  FROM exact JOIN ranked USING (vec_id)
         |  UNION ALL
         |  SELECT 'rp_banded_${WideBands}x$BandBits' AS method,
         |    CAST(count(*) AS BIGINT) AS n_overlap,
         |    ${ScalarFns.roundSql("count(*) / 10.0", 4)} AS recall_at_10
         |  FROM exact JOIN rankedb USING (vec_id)
         |  UNION ALL
         |  SELECT 'rp_banded_${WideBands / 2}x${BandBits * 2}' AS method,
         |    CAST(count(*) AS BIGINT) AS n_overlap,
         |    ${ScalarFns.roundSql("count(*) / 10.0", 4)} AS recall_at_10
         |  FROM exact JOIN rankedb16 USING (vec_id))
         |ORDER BY method""".stripMargin
    })
}
