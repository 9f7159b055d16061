package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.functions.NativeExprs

/** The oracle gate proves value equality; these specs pin the native
  * bigram expression's code-point semantics (the id bijection the
  * DuckDB `unicode`-twin relies on) and that the bucket routing
  * actually partitions the corpus. */
class LmFluencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def bigramsOf(s: String): Seq[Long] =
    Seq(s).toDF("s").select(NativeExprs.charBigrams(col("s")).as("b"))
      .collect()(0).getSeq[Long](0)

  test("charBigrams: positional ids, code-point (not UTF-16) semantics") {
    val B = LmFluency.CpBase
    assert(bigramsOf("abc") === Seq('a'.toLong * B + 'b', 'b'.toLong * B + 'c'))
    assert(bigramsOf("aab") === Seq('a'.toLong * B + 'a', 'a'.toLong * B + 'b'))
    assert(bigramsOf("") === Seq.empty)
    assert(bigramsOf("x") === Seq.empty)
    // supplementary code point (surrogate pair in UTF-16) is ONE char:
    // "a𝄞b" has bigrams (a,𝄞), (𝄞,b) with 𝄞 = U+1D11E
    val clef = 0x1D11E
    assert(bigramsOf("a" + new String(Character.toChars(clef)) + "b") ===
      Seq('a'.toLong * B + clef, clef.toLong * B + 'b'))
  }

  test("fluency buckets partition the corpus and every bucket is populated") {
    val out = LmFluency.lmFluency(spark, "/root/testdata/sf0.01")
      .groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set("head", "middle", "tail"))
    assert(out.values.sum === 500L)
    assert(out.values.forall(_ > 0L))
  }
}
