package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.functions.NativeExprs

/** NFC normalization (q151) invariants the oracle gate cannot see:
  * the planted composed/decomposed twins COLLAPSE to one fingerprint
  * after normalization (they fingerprint apart before), idempotence,
  * and the ASCII identity fast path. */
class UnicodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def nfc(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(NativeExprs.normalizeNfc(col("t"))).head.getString(0)
  }

  private def fp(s: String): Long = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(graft.functions.TextExprs.polyHashCol(
        NativeExprs.normalizeNfc(col("t")))).head.getLong(0)
  }

  test("composed/decomposed twins share a fingerprint after NFC, differ before") {
    val composed = "report caf\u00e9 m\u00fcnchen end"
    val decomposed = "report café münchen end"
    assert(composed != decomposed, "twins must be byte-distinct inputs")
    assert(graft.functions.PolyHashExpr.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(composed)) !=
      graft.functions.PolyHashExpr.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)),
      "raw fingerprints should differ")
    assert(fp(composed) === fp(decomposed),
      "NFC fingerprints must collapse the twins")
    assert(nfc(decomposed) === composed)
  }

  test("NFC is idempotent and the identity on ASCII") {
    val ascii = "plain ascii text 123"
    assert(nfc(ascii) === ascii)
    val once = nfc("café")
    assert(nfc(once) === once)
  }

  private def repair(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(NativeExprs.mojibakeRepair(col("t"))).head.getString(0)
  }

  test("mojibake repair: double-encoded text repairs; clean text never fires") {
    // UTF-8 bytes of "é" (C3 A9) mis-decoded as Latin-1 → "Ã©"
    assert(repair("cafÃ©") === "café")
    assert(repair(UnicodeOps.MojibakeAccent) === UnicodeOps.CleanAccent)
    // genuine accented text: 0xE9 followed by ASCII is invalid UTF-8 → untouched
    assert(repair(UnicodeOps.CleanAccent) === UnicodeOps.CleanAccent)
    assert(repair("résumé") === "résumé")
    // pure ASCII: untouched
    assert(repair("plain text 42") === "plain text 42")
    // genuine non-Latin-1 text (CJK): untouched
    assert(repair("中文 text") === "中文 text")
    // repair is idempotent: a repaired string no longer fires
    assert(repair(repair("cafÃ©")) === "café")
  }

  test("q154 over the corpus: repaired marks exactly the mojibake rows") {
    val dir = "/root/testdata/sf0.001"
    val rows = UnicodeOps.mojibakeRepair(spark, dir)
      .select("doc_id", "raw_len", "fixed_len", "repaired").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cls = r.getLong(0) % 3
      assert(r.getBoolean(3) === (cls == 2L), s"doc ${r.getLong(0)}")
      if (cls == 2L) // each Ã© pair (2 chars) composes to 1 char
        assert(r.getLong(1) - r.getLong(2) === 3L)
      else assert(r.getLong(1) === r.getLong(2))
    }
  }

  test("q151 over the corpus: changed marks exactly the decomposed rows; lengths contract") {
    val dir = "/root/testdata/sf0.001"
    val rows = UnicodeOps.nfcNormalize(spark, dir)
      .select("doc_id", "raw_len", "nfc_len", "raw_fp", "nfc_fp", "changed")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val odd = r.getLong(0) % 2 == 1
      assert(r.getBoolean(5) === odd,
        s"doc ${r.getLong(0)}: changed flag wrong")
      if (odd) {
        // two combining marks compose away
        assert(r.getLong(1) - r.getLong(2) === 2L)
        assert(r.getLong(3) !== r.getLong(4))
      } else {
        assert(r.getLong(1) === r.getLong(2))
        assert(r.getLong(3) === r.getLong(4))
      }
    }
  }
}
