package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

/** q177 pins the oracle gate cannot see — the PARSER behaviors the
  * routing depends on, so a Spark/Jackson upgrade that changes them
  * turns a red test, not a silent reclassification:
  *  - Jackson TOLERATES trailing garbage after a complete root
  *    object (why the malformed plant corrupts the HEAD);
  *  - a malformed document lands whole in the corrupt-record column;
  *  - a type-mismatched field nulls out WITH the raw document
  *    recorded (partial-result semantics);
  *  - an absent key is null with NO corrupt record. */
class JsonDeadletterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private def parse(j: String) = {
    import spark.implicits._
    Seq(j).toDF("j")
      .select(from_json(col("j"), "k BIGINT, _bad STRING",
        new java.util.HashMap[String, String] {
          put("mode", "PERMISSIVE"); put("columnNameOfCorruptRecord", "_bad")
        }).as("p"))
      .select(col("p.k"), col("p._bad")).collect().head
  }

  test("trailing garbage after a complete root object parses cleanly") {
    val r = parse("""{"k": 7}{{""")
    assert(r.getLong(0) === 7L && r.isNullAt(1))
  }

  test("head corruption is malformed: whole document in the corrupt column") {
    val r = parse("""{{{"k": 7}""")
    assert(r.isNullAt(0) && r.getString(1) === """{{{"k": 7}""")
  }

  test("type mismatch nulls the field and records the raw document") {
    val r = parse("""{"k": "x"}""")
    assert(r.isNullAt(0) && !r.isNullAt(1))
  }

  test("absent key is null with no corrupt record") {
    val r = parse("{}")
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("every planted class lands in its ledger row for every event type") {
    val rows = EventOps.jsonDeadletter(spark, "/root/testdata/sf0.01").collect()
    val classes = rows.map(_.getString(1)).toSet
    assert(classes === Set("ok", "malformed", "type_mismatch", "missing_key"))
    val types = rows.map(_.getString(0)).distinct
    types.foreach { t =>
      assert(rows.count(_.getString(0) == t) === 4, s"$t missing a class")
    }
  }
}
