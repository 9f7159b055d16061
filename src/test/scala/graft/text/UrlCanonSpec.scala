package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.functions.NativeExprs

/** URL canonicalizer (q152) rules pinned one by one, plus the corpus
  * class structure the oracle gate checks only in aggregate. */
class UrlCanonSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def canon(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(NativeExprs.urlCanon(col("u"))).head.getString(0)
  }

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTPS://EXAMPLE.COM/Path/File") === "https://example.com/Path/File")
  }

  test("default ports strip; explicit non-default ports survive") {
    assert(canon("https://example.com:443/a") === "https://example.com/a")
    assert(canon("http://example.com:80/a") === "http://example.com/a")
    assert(canon("http://example.com:8080/a") === "http://example.com:8080/a")
    assert(canon("https://example.com:80/a") === "https://example.com:80/a")
  }

  test("fragment strips, even when it contains '/' or '?'") {
    assert(canon("https://example.com/a#sec") === "https://example.com/a")
    assert(canon("https://example.com/a#x/y?z") === "https://example.com/a")
  }

  test("tracking params drop; real params survive in original order") {
    assert(canon("https://example.com/a?utm_source=x&page=2&utm_medium=y")
      === "https://example.com/a?page=2")
    assert(canon("https://example.com/a?b=2&a=1") === "https://example.com/a?b=2&a=1")
    assert(canon("https://example.com/a?gclid=1&fbclid=2&ref=3")
      === "https://example.com/a")
  }

  test("trailing slash drops (non-root); empty path becomes /") {
    assert(canon("https://example.com/a/") === "https://example.com/a")
    assert(canon("https://example.com/") === "https://example.com/")
    assert(canon("https://example.com") === "https://example.com/")
    assert(canon("https://example.com?utm_source=x") === "https://example.com/")
  }

  test("unparseable strings pass through unchanged") {
    assert(canon("not a url") === "not a url")
    assert(canon("relative/path?x=1") === "relative/path?x=1")
  }

  test("q152 corpus classes: v0/v1/v3 collapse, v2 survives by its real param") {
    val dir = "/root/testdata/sf0.001"
    val rows = UrlOps.urlCanonDedup(spark, dir)
      .select("doc_id", "canon_url", "class_size").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byCanon = rows.groupBy(_._2)
    rows.foreach { case (id, canon, size) =>
      assert(size === byCanon(canon).length.toLong)
      if (id % 4 == 2) {
        assert(canon.endsWith("?page=2"), s"doc $id lost its real param")
        assert(size === 1L, s"doc $id (v2) must not collapse with v0/v1/v3")
      } else assert(!canon.contains("?"))
    }
    // full base groups (all of v0, v1, v3 present) have class size 3
    assert(rows.count(_._3 == 3L) > 0, "no collapsed class found")
  }
}
