package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._
import graft.functions.NativeExprs

/** Learned byte-pair-encoding tokenization (q144) — closes the "priced
  * in words, not tokens" gap: q15's BPE-ish regex approximates subword
  * counts, this learns a REAL merge table from the corpus (Sennrich et
  * al., "Neural Machine Translation of Rare Words with Subword Units",
  * ACL'16 — the published BPE algorithm) and applies it with a native
  * codegen'd expression.
  *
  * TRAINING is distributed and artifact-collecting (the q80 Lloyd
  * convention): the word-frequency dictionary stays a DataFrame — at
  * 100 TB it is vocab-sized, orders of magnitude below the corpus — and
  * each of the [[BpeRounds]] rounds runs ONE map-side-combined pair-
  * count aggregate over it, collecting only the 1-row argmax (count
  * DESC, then (a, b) lexicographic — the published tie-break made
  * deterministic). The merge table (2×[[BpeRounds]] short strings) is
  * the entire collected artifact, the PQ-codebook scale.
  *
  * APPLICATION is a narrow codegen'd map: [[NativeExprs.bpeSegment]]
  * tokenizes and greedily applies the merges per word (memoized —
  * Zipfian corpora hit the memo almost always). The ORACLE re-learns
  * the same merges relationally (chained MATERIALIZED CTEs; one exact
  * greedy merge round = lead/island-parity window pass — the same
  * algebra, an independent engine and formulation) and re-applies them
  * via a vocabulary JOIN, the third independent route. mt_fp pins
  * training equality, seg_fp pins per-document segmentation equality.
  *
  * Precondition: the corpus must sustain [[BpeRounds]] merge rounds
  * (i.e. some multi-symbol word survives every round) — real corpora
  * always do; the trainer `require`s it rather than silently
  * diverging from the oracle's fixed CTE chain. */
object BpeOps {

  /** Merge-table size. 16 rounds on this corpus yields multi-char
    * subwords (er, in, st, mer, par, join, hash, ...) while keeping the
    * oracle's CTE chain compact. */
  val BpeRounds = 16

  /** Learn the merge table: [[BpeRounds]] × (pair-count aggregate +
    * 1-row collect). The dictionary is localCheckpoint'ed once (vocab-
    * sized; cuts the re-tokenize off every round's lineage). */
  def bpeLearn(spark: SparkSession, dir: String): Seq[(String, String)] = {
    val wf = Tables.documents(spark, dir)
      .select(explode(tokensCol(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val w = Window.partitionBy("word").orderBy("i")
    var merges = Vector.empty[(String, String)]
    while (merges.length < BpeRounds) {
      val seg = NativeExprs.bpeSegment(col("word"), merges)
      val best = wf
        .select(col("word"), col("freq"),
          posexplode(split(seg, " ")).as(Seq("i", "pa")))
        .withColumn("pb", lead("pa", 1).over(w))
        .filter(col("pb").isNotNull)
        .groupBy("pa", "pb").agg(sum("freq").as("c"))
        .orderBy(desc("c"), asc("pa"), asc("pb"))
        .limit(1).collect()
      require(best.nonEmpty,
        s"corpus exhausted after ${merges.length} BPE merges (need $BpeRounds)")
      merges :+= ((best(0).getString(0), best(0).getString(1)))
    }
    merges
  }

  /** q144: per-document learned-BPE pricing. n_ws = word count (what
    * q76/q89 price in today), n_bpe = real learned-subword count,
    * seg_fp = polyhash of the full segmentation string, mt_fp =
    * polyhash of the learned merge table itself. */
  def bpeTokenStats(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeLearn(spark, dir)
    val mtFp = graft.functions.PolyHashExpr.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        merges.map { case (a, b) => s"$a $b" }.mkString("|")))
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"),
        NativeExprs.bpeSegment(col("text"), merges).as("segdoc"),
        size(tokensCol(col("text"))).cast("long").as("n_ws"))
      .select(col("doc_id"),
        when(col("segdoc") === "", 0L)
          .otherwise(size(split(col("segdoc"), " ")).cast("long")).as("n_bpe"),
        col("n_ws"),
        polyHashCol(col("segdoc")).as("seg_fp"),
        lit(mtFp).as("mt_fp"))
  }

  // ------------------------------------------------------------- oracle

  /** One exact greedy merge round in SQL: unnest symbols with index,
    * flag (pa, pb) matches via lead(), resolve overlapping matches in
    * runs of identical symbols by island parity (gaps-and-islands:
    * 1st/3rd/... of each consecutive-match run merges — for pa ≠ pb
    * matches cannot be adjacent and every match merges), then drop the
    * consumed right symbol (lag(mg) = 1) and reassemble in order. */
  private def roundSql(r: Int, src: String, dst: String): String =
    s"""e$r AS (
       |  SELECT word, freq, u.x.i AS i, u.x.v AS sym
       |  FROM (SELECT word, freq, string_split(seg, ' ') AS s FROM $src) sp,
       |       UNNEST(list_transform(range(1, len(sp.s) + 1), j -> {'i': j, 'v': sp.s[j]})) AS u(x)),
       |m$r AS (
       |  SELECT e.word, e.freq, e.i, e.sym,
       |         lead(e.sym) OVER (PARTITION BY e.word ORDER BY e.i) AS nxt,
       |         CASE WHEN e.sym = b$r.pa
       |               AND lead(e.sym) OVER (PARTITION BY e.word ORDER BY e.i) = b$r.pb
       |              THEN 1 ELSE 0 END AS mt
       |  FROM e$r e CROSS JOIN b$r),
       |g$r AS (
       |  SELECT *, CASE WHEN mt = 1
       |                 THEN i - row_number() OVER (PARTITION BY word, mt ORDER BY i)
       |            END AS isl
       |  FROM m$r),
       |d$r AS (
       |  SELECT *, CASE WHEN mt = 1
       |                  AND (i - min(i) OVER (PARTITION BY word, isl)) % 2 = 0
       |                 THEN 1 ELSE 0 END AS mg
       |  FROM g$r),
       |n$r AS (
       |  SELECT *, coalesce(lag(mg) OVER (PARTITION BY word ORDER BY i), 0) AS pmg
       |  FROM d$r),
       |$dst AS MATERIALIZED (
       |  SELECT word, min(freq) AS freq,
       |         array_to_string(list(CASE WHEN mg = 1 THEN sym || nxt ELSE sym END
       |                              ORDER BY i), ' ') AS seg
       |  FROM n$r WHERE mg = 1 OR (mg = 0 AND pmg = 0)
       |  GROUP BY word)""".stripMargin

  /** The full re-learn + re-apply oracle. MATERIALIZED CTEs are load-
    * bearing: each round references its predecessor twice (argmax +
    * re-segmentation), so inlined CTEs would expand the chain
    * exponentially. */
  lazy val bpeTokenStatsSql: String = {
    val ctes = new StringBuilder
    ctes ++=
      s"""toks AS (SELECT doc_id, ${tokensSql("text")} AS tk FROM documents),
         |wf AS (SELECT t AS word, count(*) AS freq
         |       FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY 1),
         |seg0 AS MATERIALIZED (
         |  SELECT word, freq,
         |         array_to_string(list_filter(string_split_regex(word, ''), c -> c != ''), ' ') AS seg
         |  FROM wf)""".stripMargin
    for (r <- 0 until BpeRounds) {
      ctes ++= ",\n"
      ctes ++=
        s"""b$r AS MATERIALIZED (
           |  SELECT syms[i] AS pa, syms[i+1] AS pb
           |  FROM (SELECT string_split(seg, ' ') AS syms, freq FROM seg$r) sy,
           |       UNNEST(range(1, len(sy.syms))) AS u(i)
           |  GROUP BY 1, 2 ORDER BY sum(freq) DESC, pa, pb LIMIT 1)""".stripMargin
      ctes ++= ",\n"
      ctes ++= roundSql(r, s"seg$r", s"seg${r + 1}")
    }
    val mergeRows = (0 until BpeRounds)
      .map(r => s"SELECT $r AS ord, pa, pb FROM b$r").mkString(" UNION ALL ")
    s"""WITH $ctes,
       |mt AS (SELECT ${polyHashSql("array_to_string(list(pa || ' ' || pb ORDER BY ord), '|')")} AS fp
       |       FROM ($mergeRows)),
       |tw AS (SELECT doc_id, u.s.w AS word, u.s.i AS idx
       |       FROM toks, UNNEST(list_transform(range(1, len(tk) + 1), i -> {'i': i, 'w': tk[i]})) AS u(s)),
       |applied AS (
       |  SELECT t.doc_id,
       |         CAST(sum(len(string_split(v.seg, ' '))) AS BIGINT) AS n_bpe,
       |         CAST(count(*) AS BIGINT) AS n_ws,
       |         array_to_string(list(v.seg ORDER BY t.idx), ' ') AS segdoc
       |  FROM tw t JOIN seg$BpeRounds v ON t.word = v.word GROUP BY 1)
       |SELECT d.doc_id, coalesce(a.n_bpe, 0) AS n_bpe, coalesce(a.n_ws, 0) AS n_ws,
       |       ${polyHashSql("coalesce(a.segdoc, '')")} AS seg_fp, mt.fp AS mt_fp
       |FROM documents d LEFT JOIN applied a ON d.doc_id = a.doc_id CROSS JOIN mt""".stripMargin
  }
}
