package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._
import graft.functions.NativeExprs

/** Index-accelerated exact substring search (q158) — the
  * decontamination-lookup shape: given a set of probe strings (test-set
  * excerpts, copyrighted passages, canary strings), find EVERY corpus
  * document containing each probe. The naive form is one full corpus
  * scan per probe (`LIKE '%p%'` × P probes); the scale form builds a
  * character-8-gram inverted index ONCE and intersects postings:
  * text containing a probe necessarily contains every one of the
  * probe's 8-gram windows ([[NativeExprs.charGramHashes]]), so
  * candidates = docs whose gram set holds the probe's FIRST and LAST
  * window — a no-false-negative filter — and only candidates pay the
  * exact `contains` verify. The DuckDB oracle IS the naive form
  * (probes × documents, `contains`), so a green hash proves the
  * index path is exactly equivalent to the full scan.
  *
  * Probes are drawn from the corpus itself (every 101st document's
  * chars 21–44), so hits are guaranteed and cross-document repeats of
  * a 24-char span surface as extra matches — both engines derive the
  * probe set identically.
  *
  * Scale notes: the gram index is ~(text × w) keys — the standard
  * inverted-index space trade, built once and amortized over every
  * probe batch; postings join shuffles (gram_fp, doc_id) only; the
  * tiny probe table broadcasts to both postings joins and the verify.
  * For bounded index size at 100 TB, stride the indexed windows by s
  * and enumerate the probe's s alignment hashes (s ≤ probeLen − w + 1
  * keeps the no-miss guarantee); s = 1 here. */
object SearchOps {

  /** Gram width and probe geometry — cross-engine contract. */
  val GramW = 8
  val ProbeEvery = 101
  val ProbeStart = 21 // 1-based
  val ProbeLen = 24

  def substringSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("text"))
    val probes = docs
      .filter(col("doc_id") % ProbeEvery === 0 &&
        length(col("text")) >= ProbeStart + ProbeLen - 1)
      .select(col("doc_id").as("pid"),
        substring(col("text"), ProbeStart, ProbeLen).as("probe"))
      .select(col("pid"), col("probe"),
        polyHashCol(substring(col("probe"), 1, GramW)).as("g1"),
        polyHashCol(substring(col("probe"), ProbeLen - GramW + 1, GramW)).as("g2"))
    val grams = docs.select(col("doc_id"),
      explode(NativeExprs.charGramHashes(col("text"), GramW)).as("g"))
    val c1 = grams.join(broadcast(probes.select(col("pid"), col("g1"))),
      col("g") === col("g1")).select(col("pid"), col("doc_id"))
    val c2 = grams.join(broadcast(probes.select(col("pid"), col("g2"))),
      col("g") === col("g2")).select(col("pid"), col("doc_id"))
    c1.intersect(c2)
      .join(docs, "doc_id")
      .join(broadcast(probes.select(col("pid"), col("probe"))), "pid")
      .filter(col("text").contains(col("probe")))
      .select(col("pid"), col("doc_id"),
        (col("pid") === col("doc_id")).as("is_self"))
  }

  /** Oracle: the naive full-scan form — an independent formulation
    * whose equality proves the index path misses nothing. */
  val substringSearchSql: String =
    s"""WITH p AS (
       |  SELECT doc_id AS pid, substr(text, $ProbeStart, $ProbeLen) AS probe
       |  FROM documents
       |  WHERE doc_id % $ProbeEvery = 0
       |    AND length(text) >= ${ProbeStart + ProbeLen - 1})
       |SELECT p.pid, d.doc_id, p.pid = d.doc_id AS is_self
       |FROM p JOIN documents d ON contains(d.text, p.probe)""".stripMargin

  // ------------------------------------------------------- BM25 retrieval

  /** Fixed query workload for [[bm25Retrieval]] — multi-term lexical
    * queries over the corpus vocabulary (distinct terms per query). */
  val Bm25Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "window", "agg"),
    2L -> Seq("fast", "hash", "join", "stream"),
    3L -> Seq("merge", "batch", "table"),
    4L -> Seq("vector", "scan", "filter", "big"))

  /** Top-k depth per query. */
  val Bm25TopK = 10

  /** q209: BM25-shaped lexical retrieval (Robertson & Walker's
    * Okapi TF saturation, k1 = 1.2, b = 0.75) — the sparse-retrieval
    * half of a hybrid search stack (q190's RRF is the fusion layer;
    * q24/q79 are the dense half). Per (query, term, doc):
    *
    *   tf_part = tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))  — Okapi
    *   saturation with length normalization — made integer-exact by
    *   clearing denominators with 20·T (T = total corpus tokens,
    *   N = docs, avgdl = T/N):
    *     tf_part_u = (tf·44·T·10⁶) div (20·T·tf + 6·T + 18·dl·N)
    *
    *   idf_u = ((2·(N−df)+1)·10⁶) div (2·df+1) — the RATIONAL inside
    *   of the Robertson-Sparck-Jones idf, kept log-free (the repo's
    *   integer-exact discipline: no cross-engine libm). The log is
    *   monotone, so per-term ordering is preserved; multi-term sums
    *   weight rare terms MORE steeply than textbook BM25 — a
    *   documented deviation, priced by q207's MAP harness if it ever
    *   matters.
    *
    * score_u = Σ_terms (idf_u·tf_part_u) div 10⁶; every product is
    * widened through DECIMAL(38,0)/HUGEINT (the q192 no-cliff rule).
    *
    * Scale shape: postings (doc, term, tf) shuffle on the term key to
    * meet the broadcast query terms, then one (query, doc) partial
    * aggregate; N/T are a 1-row broadcast aggregate; the per-query
    * top-10 runs through the bounded-heap [[graft.plans.GroupedTopK]]
    * operator — no global sort, no per-group window sort. */
  def bm25Retrieval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qterms = broadcast(
      Bm25Queries.flatMap { case (q, ts) => ts.map(q -> _) }
        .toDF("query_id", "term"))
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), tokensCol(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("term"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val post = docs.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corp = post.agg(sum(col("tf")).as("tt"),
      countDistinct(col("doc_id")).as("nn"))
    val scored = post.join(qterms, "term").join(dft, "term")
      .crossJoin(broadcast(corp))
      .withColumn("tf_part_u", expr(
        """cast((cast(tf as decimal(38,0)) * 44 * tt * 1000000)
          |  div (cast(20 as decimal(38,0)) * tt * tf + 6 * tt + 18 * dl * nn)
          |  as bigint)""".stripMargin))
      .withColumn("idf_u", expr(
        "cast((cast(2 * (nn - df) + 1 as decimal(38,0)) * 1000000) div (2 * df + 1) as bigint)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr(
        "cast((cast(idf_u as decimal(38,0)) * tf_part_u) div 1000000 as bigint)"))
        .as("score_u"),
        count(lit(1)).as("n_hit"))
    graft.plans.GroupedTopK(scored,
      groupCols = Seq("query_id"),
      orderBy = Seq("score_u" -> false, "doc_id" -> true),
      k = Bm25TopK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_u"), col("n_hit"))
  }

  /** Oracle: same integer formulas, window-ranked. */
  val bm25RetrievalSql: String = {
    val t = tokensSql("text")
    // CAST: a bare VALUES integer literal is 32-bit in DuckDB; Spark's
    // query ids are BIGINT — dtype parity for the strict hash compare
    val qvals = Bm25Queries.flatMap { case (q, ts) =>
      ts.map(term => s"(CAST($q AS BIGINT), '$term')")
    }.mkString(", ")
    s"""WITH qterms(query_id, term) AS (VALUES $qvals),
       |docs AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS term
       |  FROM (SELECT doc_id, $t AS t FROM documents)),
       |post AS (
       |  SELECT doc_id, dl, term, count(*) AS tf FROM docs GROUP BY 1, 2, 3),
       |dft AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
       |corp AS (SELECT sum(tf) AS tt, count(DISTINCT doc_id) AS nn FROM post),
       |scored AS (
       |  SELECT q.query_id, p.doc_id,
       |         CAST(sum((CAST(((2 * (c.nn - f.df) + 1) * CAST(1000000 AS HUGEINT))
       |                          // (2 * f.df + 1) AS HUGEINT)
       |                    * ((CAST(p.tf AS HUGEINT) * 44 * c.tt * 1000000)
       |                       // (CAST(20 AS HUGEINT) * c.tt * p.tf
       |                          + 6 * c.tt + 18 * p.dl * c.nn)))
       |                   // 1000000) AS BIGINT) AS score_u,
       |         count(*) AS n_hit
       |  FROM post p JOIN qterms q ON p.term = q.term
       |  JOIN dft f ON p.term = f.term CROSS JOIN corp c
       |  GROUP BY 1, 2)
       |SELECT query_id, rank, doc_id, score_u, n_hit FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY score_u DESC, doc_id) AS INT) AS rank
       |  FROM scored)
       |WHERE rank <= $Bm25TopK""".stripMargin
  }
}
