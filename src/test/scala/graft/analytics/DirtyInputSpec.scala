package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.dedup.DedupOps
import graft.text.TextOps

/** ANSI-mode dirty-input probes: Spark 4 runs with ansi.enabled=true,
  * so an un-guarded cast / element_at / division in any operator throws
  * AT RUNTIME on inputs the clean testdata never exercises. Every
  * documents-table operator must survive: NULL text, empty text,
  * whitespace/punctuation-only text (tokenizes to zero tokens), a
  * single token (below every shingle/gram width), emoji + non-Latin
  * scripts (code-point handling), and a pathologically long token. */
class DirtyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  /** A documents.parquet with only adversarial rows, in a temp dir. */
  private lazy val dirtyDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dirty_").toString
    val rows = Seq(
      (0L, null.asInstanceOf[String], "en", "web", 0L),
      (1L, "", "en", "web", 0L),
      (2L, "   \t\n  ", "en", "web", 7L),
      (3L, "!!! ??? ... ---", "en", "web", 15L),
      (4L, "solo", "en", "web", 4L),
      (5L, "two tokens", "de", "web", 10L),
      (6L, "😀 emoji 🎉 party 🚀 rocket ship launch pad", "en", "web", 40L),
      (7L, "日本語のテキストです これはテストです 機械学習", "ja", "web", 24L),
      (8L, "x" * 10000 + " normal tail of the document here", "en", "web", 10034L),
      (9L, "the quick brown fox jumps over the lazy dog again and again", "en", "books", 60L),
      (10L, "the quick brown fox jumps over the lazy dog again and again", "en", "books", 60L)
    )
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup family survives null/empty/short/unicode text") {
    // exact dedup: null and "" both tokenize to [] -> same fingerprint;
    // the two identical docs form one cluster
    val exact = DedupOps.exactDedup(spark, dirtyDir)
    assert(exact.agg(sum("n_copies")).head().getLong(0) === 11L)
    val best = DedupOps.dedupKeepBest(spark, dirtyDir)
    assert(best.agg(sum("n_copies")).head().getLong(0) === 11L)
    // near-dup families: docs below the shingle width simply drop out
    val lsh = DedupOps.minhashLsh(spark, dirtyDir).collect()
    assert(lsh.exists(r => r.getLong(0) === 9L && r.getLong(1) === 10L
      && r.getDouble(3) === 1.0), "identical docs must pair at jaccard 1.0")
    val sh = DedupOps.simhashNearDup(spark, dirtyDir)
    assert(sh.filter(col("d1") === 9 && col("d2") === 10).count() === 1)
    assert(DedupOps.simhash(spark, dirtyDir).count() === 11)
    // substring ledger: only docs with >= SpanW tokens appear
    val sub = DedupOps.substringDedup(spark, dirtyDir).collect()
    assert(sub.forall(_.getLong(1) > 0))
    assert(sub.exists(r => r.getLong(0) === 10L && r.getLong(3) > 0),
      "the later identical doc must have removable spans")
    // funnel: every doc lands in exactly one stage bucket
    val funnel = DedupOps.dedupFunnel(spark, dirtyDir)
    val tot = funnel.agg(sum("n_docs"), sum(col("drop_exact") + col("drop_near") +
      col("drop_substr") + col("n_kept"))).head()
    assert(tot.getLong(0) === 11L && tot.getLong(1) === 11L)
    // ledger never throws on tiny corpora
    assert(DedupOps.bandBucketLedger(spark, dirtyDir).count() > 0)
  }

  test("text analysis family survives null/empty/short/unicode text") {
    assert(TextOps.tokenStats(spark, dirtyDir).count() === 11)
    // langId emits the (lang, predicted) confusion matrix — every doc
    // must be counted in exactly one cell
    assert(TextOps.langId(spark, dirtyDir).agg(sum("n")).head().getLong(0) === 11L)
    assert(TextOps.qualityScore(spark, dirtyDir).count() === 11)
    assert(TextOps.fingerprint(spark, dirtyDir).count() === 11)
    // repetition is defined over shingle positions: only the 4 docs with
    // >= 3 surviving tokens (emoji doc, long-token doc, the twins) score
    assert(TextOps.repetitionScore(spark, dirtyDir).count() === 4)
    assert(TextOps.hashSplit(spark, dirtyDir).count() === 11)
  }

  test("round-5 document operators survive null/empty/short/unicode text") {
    // quality rules: every doc gets a row; degenerate docs (null/empty/
    // zero-token) must land keep=0 with NULL guarded metrics, not throw
    val qr = TextOps.qualityRules(spark, dirtyDir)
    assert(qr.count() === 11)
    assert(qr.filter(col("doc_id") <= 4 && col("keep") === 1).count() === 0)
    // PPS sample: null text contributes no token mass and cannot be
    // selected; the long-token doc dominates the mass and must be hit
    val pps = TextOps.ppsSample(spark, dirtyDir)
    assert(pps.filter(col("doc_id") === 0).count() === 0)
    assert(pps.filter(col("doc_id") === 8).count() === 1)
    // source overlap: the twin docs share a source, so no cross-source
    // pair exists on the dirty corpus — empty matrix, not a crash
    assert(DedupOps.sourceOverlap(spark, dirtyDir).count() === 0)
  }
}
