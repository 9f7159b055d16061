package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tables.Tables
import graft.functions.TextExprs

/** q185 pins the oracle gate cannot see: the chunk lattice is exactly
  * the ⌈n/C⌉ window count (minus sub-[[MixedLang.MinChunk]] tails),
  * the verdict arithmetic conserves, both verdict classes fire, and a
  * PLANTED bilingual document is flagged mixed — the corpus itself is
  * English-bodied (labels are synthetic), so the operator's reason to
  * exist needs a constructed exhibit. */
class MixedLangSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.01"

  test("verdict conserves and both classes fire on the corpus") {
    val rows = MixedLang.mixedLangAudit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, nm, bp) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nm >= 1L && nm <= nc)
      assert(bp === (10000 * (nc - nm)) / nc)
    }
    val flags = rows.map(_.getLong(6)).toSet
    assert(flags === Set(0L, 1L), "both mixed and clean documents must exist")
  }

  test("chunk lattice matches the token count for sampled documents") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextExprs.tokensCol(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val audited = MixedLang.mixedLangAudit(spark, dir)
      .select("doc_id", "n_chunks").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    audited.take(50).foreach { case (id, nChunks) =>
      val n = docs(id)
      val full = n / MixedLang.ChunkTok
      val tail = if (n % MixedLang.ChunkTok >= MixedLang.MinChunk) 1 else 0
      assert(nChunks === (full + tail).toLong, s"doc $id: $n tokens")
    }
  }

  test("q192: collocations beat independence and rank like float PMI") {
    val rows = CalibrateOps.pmiCollocations(spark, dir).collect()
    assert(rows.length === CalibrateOps.PmiTopK)
    rows.foreach { r =>
      assert(r.getLong(3) >= CalibrateOps.MinPairCount)
      assert(r.getLong(6) > 1000000L,
        s"'${r.getString(1)} ${r.getString(2)}' not above independence")
    }
    // integer scores non-increasing down the ranking, and the float
    // PMI ordering agrees wherever the integer scores are distinct
    val sorted = rows.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(hi, lo) =>
        assert(hi.getLong(6) >= lo.getLong(6))
        if (hi.getLong(6) != lo.getLong(6)) {
          def pmi(r: org.apache.spark.sql.Row) =
            math.log(r.getLong(3).toDouble / (r.getLong(4) * r.getLong(5)))
          assert(pmi(hi) > pmi(lo), "integer and float PMI orderings disagree")
        }
      case _ => ()
    }
  }

  test("a planted bilingual document is flagged mixed") {
    import spark.implicits._
    val en = Seq.fill(20)("the cat and the dog is going to the house of friends").mkString(" ")
    val de = Seq.fill(20)("der hund und die katze ist das beste und der tag").mkString(" ")
    val planted = Seq((1L, "en", en + " " + de)).toDF("doc_id", "lang", "text")
    // drive the same pipeline over the planted frame via a temp dir
    val tmp = java.nio.file.Files.createTempDirectory("mixed_lang_spec").toString
    planted.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = MixedLang.mixedLangAudit(spark, tmp).collect().head
    assert(r.getLong(6) === 1L, s"bilingual doc not flagged: $r")
    assert(r.getLong(5) >= 4000L, "half the chunks should vote the minority language")
  }
}
