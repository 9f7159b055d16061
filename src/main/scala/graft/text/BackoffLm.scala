package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._
import graft.functions.NativeExprs

/** Word-trigram Stupid Backoff fluency scoring (q169) — the web-scale
  * n-gram LM filter exactly as published (Brants et al., "Large
  * Language Models in Machine Translation", EMNLP'07): score each
  * trigram by relative frequency, backing off to the bigram at
  * penalty α = 0.4 and to the unigram at α², with NO normalization —
  * the simplification that makes the model one count join instead of
  * a probability table, which is why it scaled to 2T tokens in 2007
  * and why it fits Spark's join machinery unchanged.
  *
  * Unlike q147 (char-bigram LM trained on the corpus itself), this is
  * the HELD-OUT shape: counts are trained on the q97 train split
  * (bucket < [[TextOps.TrainPct]]) and score the val/test documents —
  * so unseen trigrams genuinely occur and every backoff tier fires
  * (the per-tier hit counts are emitted; a tier that never fires
  * would be dead code the oracle couldn't certify). All-integer like
  * q147: tier scores are micro-unit integer divisions
  * (10⁶·c₃ div c₁₂ / [[Alpha1U]]·c₂₃ div c₂ / [[Alpha2U]]·c₁ div N),
  * a document's score is the exact integer mean — no logs, no floats,
  * bit-equal across engines (same 10⁶·count < 2⁶³ bound as q147).
  *
  * Scale shape: counts are three narrow explode→groupBy passes over
  * the train split with map-side combine (positional gram fps from
  * [[NativeExprs.gramHashes]] — ids, never token strings); scoring
  * explodes each held-out document once into fixed-width fp rows
  * (the four context fps ride along via shifted-slice zip, no
  * re-tokenization) and resolves all tiers with fp-keyed left joins.
  * At 100 TB the trigram table is the big side — production prunes
  * singletons (Brants et al. do) and buckets both sides on fp;
  * the unigram/bigram tables broadcast. */
object BackoffLm {

  /** α = 0.4 and α² = 0.16 in micro-units. */
  val Alpha1U = 400000L
  val Alpha2U = 160000L

  private def toks(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), tokensCol(col("text")).as("t"))
      .withColumn("bucket",
        polyHashCol(concat_ws(":", col("source"), col("doc_id"))) % 100)

  def backoffScore(spark: SparkSession, dir: String): DataFrame = {
    val all = toks(spark, dir)
    val train = all.filter(col("bucket") < TextOps.TrainPct)
    def counts(w: Int, name: String) = train
      .select(explode(NativeExprs.gramHashes(col("t"), w, P)).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as(name))
    val uni = counts(1, "cu")
    val bi  = counts(2, "cb")
    val tri = counts(3, "c3")
    val nTok = train.agg(sum(size(col("t"))).cast("long").as("n_train"))
    val scored = all.filter(col("bucket") >= TextOps.TrainPct)
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        NativeExprs.gramHashes(col("t"), 3, P).as("g3"),
        NativeExprs.gramHashes(col("t"), 2, P).as("g2"),
        NativeExprs.gramHashes(col("t"), 1, P).as("g1"))
      .withColumn("n3", size(col("g3")))
      .withColumn("b12", slice(col("g2"), lit(1), col("n3")))
      .withColumn("b23", slice(col("g2"), lit(2), col("n3")))
      .withColumn("u2", slice(col("g1"), lit(2), col("n3")))
      .withColumn("u3", slice(col("g1"), lit(3), col("n3")))
      .select(col("doc_id"), explode(arrays_zip(
        col("g3"), col("b12"), col("b23"), col("u2"), col("u3"))).as("z"))
      .select(col("doc_id"), col("z.g3").as("fp3"), col("z.b12").as("fp12"),
        col("z.b23").as("fp23"), col("z.u2").as("fpw2"), col("z.u3").as("fpw3"))
    val joined = scored
      .join(tri.withColumnRenamed("fp", "fp3"), Seq("fp3"), "left")
      .join(bi.select(col("fp").as("fp12"), col("cb").as("c12")), Seq("fp12"), "left")
      .join(bi.select(col("fp").as("fp23"), col("cb").as("c23")), Seq("fp23"), "left")
      .join(uni.select(col("fp").as("fpw2"), col("cu").as("c1w2")), Seq("fpw2"), "left")
      .join(uni.select(col("fp").as("fpw3"), col("cu").as("c1w3")), Seq("fpw3"), "left")
      .crossJoin(broadcast(nTok))
      .withColumn("s_u",
        when(col("c3").isNotNull, expr("(1000000 * c3) div c12"))
          .when(col("c23").isNotNull, expr(s"($Alpha1U * c23) div c1w2"))
          .when(col("c1w3").isNotNull, expr(s"($Alpha2U * c1w3) div n_train"))
          .otherwise(lit(0L)))
      .withColumn("tier",
        when(col("c3").isNotNull, lit(3L))
          .when(col("c23").isNotNull, lit(2L))
          .when(col("c1w3").isNotNull, lit(1L))
          .otherwise(lit(0L)))
    joined.groupBy("doc_id").agg(
      count(lit(1)).as("n_tri"),
      sum(when(col("tier") === 3, 1L).otherwise(0L)).as("n_hit3"),
      sum(when(col("tier") === 2, 1L).otherwise(0L)).as("n_hit2"),
      sum(when(col("tier") === 1, 1L).otherwise(0L)).as("n_hit1"),
      sum(when(col("tier") === 0, 1L).otherwise(0L)).as("n_miss"),
      sum(col("s_u")).as("total_u"))
      .withColumn("score_u", expr("total_u div n_tri"))
  }

  /** Oracle: fps per position re-derived from explicit token slices
    * (`t[i:i+w-1]` space-joined through the shared polyhash fold),
    * counts and tiers re-joined relationally. */
  val backoffScoreSql: String = {
    def gram(arr: String, a: String, b: String) =
      polyHashSql(s"array_to_string($arr[$a:$b], ' ')")
    s"""WITH tk AS (
       |  SELECT doc_id, ${tokensSql("text")} AS t,
       |         ${polyHashSql("concat(source, ':', CAST(doc_id AS VARCHAR))")} % 100 AS bucket
       |  FROM documents),
       |train AS (SELECT t FROM tk WHERE bucket < ${TextOps.TrainPct}),
       |uni AS (SELECT fp, count(*) AS cu FROM (
       |    SELECT unnest(list_transform(range(1, len(t) + 1),
       |           i -> ${polyHashSql("t[i]")})) AS fp FROM train) GROUP BY 1),
       |bi AS (SELECT fp, count(*) AS cb FROM (
       |    SELECT unnest(list_transform(range(1, len(t)),
       |           i -> ${gram("t", "i", "i+1")})) AS fp FROM train) GROUP BY 1),
       |tri AS (SELECT fp, count(*) AS c3 FROM (
       |    SELECT unnest(list_transform(range(1, len(t) - 1),
       |           i -> ${gram("t", "i", "i+2")})) AS fp FROM train) GROUP BY 1),
       |n AS (SELECT CAST(sum(len(t)) AS BIGINT) AS n_train FROM train),
       |pos AS (
       |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
       |  FROM tk WHERE bucket >= ${TextOps.TrainPct} AND len(t) >= 3),
       |fps AS (
       |  SELECT doc_id,
       |         ${gram("t", "i", "i+2")} AS fp3,
       |         ${gram("t", "i", "i+1")} AS fp12,
       |         ${gram("t", "i+1", "i+2")} AS fp23,
       |         ${polyHashSql("t[i+1]")} AS fpw2,
       |         ${polyHashSql("t[i+2]")} AS fpw3
       |  FROM pos),
       |j AS (
       |  SELECT doc_id,
       |         CASE WHEN tri.c3 IS NOT NULL THEN 3
       |              WHEN b23.cb IS NOT NULL THEN 2
       |              WHEN u3.cu IS NOT NULL THEN 1
       |              ELSE 0 END AS tier,
       |         CASE WHEN tri.c3 IS NOT NULL THEN (1000000 * tri.c3) // b12.cb
       |              WHEN b23.cb IS NOT NULL THEN ($Alpha1U * b23.cb) // u2.cu
       |              WHEN u3.cu IS NOT NULL THEN ($Alpha2U * u3.cu) // n.n_train
       |              ELSE 0 END AS s_u
       |  FROM fps
       |  LEFT JOIN tri ON tri.fp = fps.fp3
       |  LEFT JOIN bi b12 ON b12.fp = fps.fp12
       |  LEFT JOIN bi b23 ON b23.fp = fps.fp23
       |  LEFT JOIN uni u2 ON u2.fp = fps.fpw2
       |  LEFT JOIN uni u3 ON u3.fp = fps.fpw3
       |  CROSS JOIN n)
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_tri,
       |       CAST(sum(CASE WHEN tier = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit3,
       |       CAST(sum(CASE WHEN tier = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit2,
       |       CAST(sum(CASE WHEN tier = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit1,
       |       CAST(sum(CASE WHEN tier = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_miss,
       |       CAST(sum(s_u) AS BIGINT) AS total_u,
       |       CAST(sum(s_u) // count(*) AS BIGINT) AS score_u
       |FROM j GROUP BY 1""".stripMargin
  }
}
