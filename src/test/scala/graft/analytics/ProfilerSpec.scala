package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession
import graft.functions.TextExprs

/** q172 pins the oracle gate cannot see: the corpus tables carry no
  * nulls, so the null-counting path is certified here on a frame that
  * has them; and the schema-driven plan builder profiles an arbitrary
  * unseen schema without static column references. */
class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def ph(s: String): Long = {
    val P = TextExprs.P
    s.codePoints().toArray.foldLeft(0L)((acc, c) => (acc * 31 + c) % P)
  }

  test("null and distinct counting on a frame with genuine nulls") {
    import spark.implicits._
    val df = Seq((Option(1L), "a"), (Option.empty[Long], "b"),
        (Option(1L), null: String), (Option(3L), "a"))
      .toDF("x", "s")
    val p = Profiler.profile(df, "t").collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(p("x") === ((4L, 1L, 2L, 1L, 3L)))
    assert(p("s") === ((4L, 1L, 2L, ph("a"), ph("b"))))
  }
}
