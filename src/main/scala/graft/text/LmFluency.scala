package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._
import graft.functions.NativeExprs

/** Statistical language-model fluency scoring (q147) — the CCNet
  * perplexity-filter stage: train a character-bigram LM on the corpus
  * itself, score every document by how well the model predicts its
  * character transitions, and route documents into head/middle/tail
  * buckets (CCNet trains the LM on trusted text and keeps the head;
  * here the corpus is its own model, the self-perplexity form used for
  * repetition/garbage detection).
  *
  * The score is ALL-INTEGER by design: per distinct bigram (a,b) the
  * add-one-smoothed transition probability P(b|a) = (cnt+1)/(ctx_a+V)
  * is quantized once to micro-units via integer division
  * `(10⁶·(cnt+1)) div (ctx_a+V)`, and a document's score is the exact
  * integer mean of its transition micro-probabilities
  * (`total_u div n_big`). Mean transition likelihood ranks documents
  * like (inverse) perplexity but needs no logarithm — so there is no
  * libm call whose last-ulp could differ between engines, and the
  * oracle's integer arithmetic matches bit-for-bit at any scale.
  * Bucket cuts ([[HeadCut]]/[[MidCut]]) are fixed contract constants,
  * placed at the corpus's outer deciles.
  *
  * Scale shape (100 TB): bigrams are a narrow codegen'd map
  * ([[NativeExprs.charBigrams]] — positional ids, never strings); the
  * count table shuffles (bigram-id, partial count) with map-side
  * combine into a ≤ V² ≈ 1.4 k-row model; context totals and the
  * vocabulary size are aggregates OVER that model table (not the
  * corpus); the model joins back BROADCAST; the per-doc score is one
  * doc_id-keyed aggregate. Two corpus passes total — the same shape as
  * the q133 Zipf vocabulary join, with a model-sized (not vocab-sized)
  * broadcast.
  *
  * Integer-range bound: the quantization `10⁶·(cnt+1)` overflows int64
  * only when a SINGLE bigram's corpus count exceeds ~9.2e12. 9.2e12
  * two-byte transitions is ≳18 TB of one repeated character pair —
  * possible at the 100 TB design point, and Spark (non-ANSI) would
  * wrap while DuckDB errors, silently diverging the engines. Contract:
  * run with `spark.sql.ansi.enabled=true` at production scale so
  * overflow fails loudly in BOTH engines, or pre-shard the count pass
  * (per-shard counts each < 9.2e12, then `p_u` per shard and a
  * count-weighted integer mean) when a pathological corpus is
  * expected. At gate SF the max bigram count is ≤ corpus characters
  * (< 10⁸), 5 orders of magnitude inside the bound. */
object LmFluency {

  /** One past Character.MAX_CODE_POINT — bigram id = cp1·CpBase + cp2
    * is a bijection shared with the oracle's `unicode`-based twin. */
  val CpBase = 1114112L

  /** Bucket cuts in micro-units of mean transition probability. */
  val HeadCut = 260000L
  val MidCut = 240000L

  def lmFluency(spark: SparkSession, dir: String): DataFrame = {
    val norm = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), array_join(tokensCol(col("text")), " ").as("s"))
      .filter(length(col("s")) >= 2)
    val bigs = norm.select(col("doc_id"),
      explode(NativeExprs.charBigrams(col("s"))).as("b"))
    val cnt = bigs.groupBy(col("b")).agg(count(lit(1)).as("c"))
    val ctx = cnt.groupBy(expr(s"b div $CpBase").as("a"))
      .agg(sum(col("c")).as("ca"))
    val vocab = cnt.select(expr(s"b div $CpBase").as("cp"))
      .union(cnt.select((col("b") % CpBase).as("cp")))
      .agg(countDistinct(col("cp")).as("v"))
    val model = cnt
      .join(ctx, expr(s"b div $CpBase") === col("a"))
      .crossJoin(broadcast(vocab))
      .select(col("b"), expr("(1000000 * (c + 1)) div (ca + v)").as("p_u"))
    bigs.join(broadcast(model), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_big"), sum(col("p_u")).as("total_u"))
      .withColumn("score_u", expr("total_u div n_big"))
      .withColumn("bucket",
        when(col("score_u") >= HeadCut, "head")
          .when(col("score_u") >= MidCut, "middle")
          .otherwise("tail"))
  }

  val lmFluencySql: String =
    s"""WITH norm AS (
       |  SELECT doc_id, array_to_string(${tokensSql("text")}, ' ') AS s
       |  FROM documents),
       |big AS (
       |  SELECT doc_id, unnest(list_transform(range(1, length(s)),
       |         i -> CAST(unicode(substr(s, i, 1)) AS BIGINT) * $CpBase
       |              + CAST(unicode(substr(s, i + 1, 1)) AS BIGINT))) AS b
       |  FROM norm WHERE length(s) >= 2),
       |cnt AS (SELECT b, count(*) AS c FROM big GROUP BY 1),
       |ctx AS (SELECT b // $CpBase AS a, CAST(sum(c) AS BIGINT) AS ca
       |        FROM cnt GROUP BY 1),
       |vocab AS (SELECT count(DISTINCT cp) AS v FROM (
       |    SELECT b // $CpBase AS cp FROM cnt
       |    UNION SELECT b % $CpBase FROM cnt)),
       |model AS (
       |  SELECT cnt.b AS mb,
       |         CAST((1000000 * (cnt.c + 1)) // (ctx.ca + vocab.v) AS BIGINT) AS p_u
       |  FROM cnt JOIN ctx ON cnt.b // $CpBase = ctx.a CROSS JOIN vocab)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_big,
       |       CAST(sum(p_u) AS BIGINT) AS total_u,
       |       CAST(sum(p_u) // count(*) AS BIGINT) AS score_u,
       |       CASE WHEN sum(p_u) // count(*) >= $HeadCut THEN 'head'
       |            WHEN sum(p_u) // count(*) >= $MidCut THEN 'middle'
       |            ELSE 'tail' END AS bucket
       |FROM big JOIN model ON b = mb
       |GROUP BY 1""".stripMargin
}
