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
}
