package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables
import graft.functions.TextExprs._

/** Mixed-language document detection (q185) — the paragraph-level
  * consistency audit CCNet runs because document-level language ID
  * (q16/q149) silently blesses documents whose BODY switches language
  * mid-way (boilerplate in one language wrapping content in another —
  * poison for monolingual training mixes). Each document splits into
  * fixed [[ChunkTok]]-token windows (the q36 chunking lattice), every
  * window ≥ [[MinChunk]] tokens gets the q16 marker vote, and the
  * document verdict aggregates the votes: majority language, majority
  * share, minority share in basis points, and the `is_mixed` flag at
  * [[MixedCutBp]]. Tokenization strips non-Latin script, so the
  * chunk vote covers the four marker languages plus `unknown` — the
  * honest statement of what a stopword vote can see (CJK detection
  * stays doc-level in q16, which reads raw code points).
  *
  * Scale shape: chunking is an in-row slice lattice (no shuffle);
  * chunk votes are codegen'd set-membership counts; the majority
  * argmax is a per-doc window over ≤ docs·chunks rows shuffled once
  * on doc_id; the verdict is one aggregate on the same key. */
object MixedLang {

  val ChunkTok = 40
  val MinChunk = 8
  val MixedCutBp = 2000L

  def mixedLangAudit(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), tokensCol(col("text")).as("t"))
      .filter(size(col("t")) >= MinChunk)
    val chunks = toks
      .select(col("doc_id"), col("lang"),
        explode(transform(
          sequence(lit(0), expr(s"(size(t) - 1) div $ChunkTok")),
          i => slice(col("t"), i * ChunkTok + 1, lit(ChunkTok)))).as("ct"))
      .filter(size(col("ct")) >= MinChunk)
    val tm = TextOps.markers.toMap
    val scored = chunks.select(col("doc_id"), col("lang"),
      TextOps.markerScoreCol(col("ct"), tm("en")).as("en_s"),
      TextOps.markerScoreCol(col("ct"), tm("de")).as("de_s"),
      TextOps.markerScoreCol(col("ct"), tm("fr")).as("fr_s"),
      TextOps.markerScoreCol(col("ct"), tm("es")).as("es_s"))
    val g = greatest(col("en_s"), col("de_s"), col("fr_s"), col("es_s"))
    val voted = scored.withColumn("pred",
      when(g === 0, "unknown")
        .when(col("en_s") === g, "en")
        .when(col("de_s") === g, "de")
        .when(col("fr_s") === g, "fr")
        .otherwise("es"))
    val votes = voted.groupBy("doc_id", "lang", "pred")
      .agg(count(lit(1)).as("nv"))
    val major = Window.partitionBy("doc_id")
      .orderBy(col("nv").desc, col("pred"))
    val tot = Window.partitionBy("doc_id")
    votes
      .withColumn("n_chunks", sum(col("nv")).over(tot))
      .withColumn("rn", row_number().over(major))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("pred").as("major_lang"),
        col("n_chunks"), col("nv").as("n_major"),
        expr("(10000 * (n_chunks - nv)) div n_chunks").as("minority_bp"))
      .withColumn("is_mixed",
        when(col("minority_bp") >= MixedCutBp, 1L).otherwise(0L))
  }

  val mixedLangAuditSql: String = {
    val ms = TextOps.markers.map { case (l, ws) =>
      s"${TextOps.markerScoreSql("ct", ws)} AS ${l}_s"
    }.mkString(",\n       |         ")
    s"""WITH toks AS (
       |  SELECT doc_id, lang, ${tokensSql("text")} AS t FROM documents),
       |ch AS (
       |  SELECT doc_id, lang,
       |         unnest(list_transform(range(0, (len(t) - 1) // $ChunkTok + 1),
       |           i -> t[i * $ChunkTok + 1 : i * $ChunkTok + $ChunkTok])) AS ct
       |  FROM toks WHERE len(t) >= $MinChunk),
       |sc AS (
       |  SELECT doc_id, lang,
       |         $ms
       |  FROM ch WHERE len(ct) >= $MinChunk),
       |voted AS (
       |  SELECT doc_id, lang,
       |         CASE WHEN greatest(en_s, de_s, fr_s, es_s) = 0 THEN 'unknown'
       |              WHEN en_s = greatest(en_s, de_s, fr_s, es_s) THEN 'en'
       |              WHEN de_s = greatest(en_s, de_s, fr_s, es_s) THEN 'de'
       |              WHEN fr_s = greatest(en_s, de_s, fr_s, es_s) THEN 'fr'
       |              ELSE 'es' END AS pred
       |  FROM sc),
       |votes AS (SELECT doc_id, lang, pred, CAST(count(*) AS BIGINT) AS nv
       |          FROM voted GROUP BY 1, 2, 3),
       |agg AS (
       |  SELECT doc_id, lang, pred, nv,
       |         CAST(sum(nv) OVER (PARTITION BY doc_id) AS BIGINT) AS n_chunks,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY nv DESC, pred) AS rn
       |  FROM votes)
       |SELECT doc_id, lang, pred AS major_lang, n_chunks, nv AS n_major,
       |       (10000 * (n_chunks - nv)) // n_chunks AS minority_bp,
       |       CAST(CASE WHEN (10000 * (n_chunks - nv)) // n_chunks >= $MixedCutBp
       |                 THEN 1 ELSE 0 END AS BIGINT) AS is_mixed
       |FROM agg WHERE rn = 1""".stripMargin
  }
}
