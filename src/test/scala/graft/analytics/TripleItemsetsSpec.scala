package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession
import graft.tables.Tables

/** q186 pins the oracle gate cannot see: the Apriori path equals the
  * naive cubic join ON A SECOND corpus (the oracle proves sf0.01;
  * this proves the equality is structural, not a data accident), and
  * the result is downward-closed (every sub-pair of every emitted
  * triple is itself frequent — the property candidate generation
  * relies on). */
class TripleItemsetsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  test("Apriori equals the naive cubic join on sf0.001") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)
    val apriori = Relational.tripleItemsets(spark, dir).collect().map(key).toMap
    val b = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val naive = b.as("a")
      .join(b.as("b2"), col("a.o") === col("b2.o") && col("a.p") < col("b2.p"))
      .join(b.as("c"), col("a.o") === col("c.o") && col("b2.p") < col("c.p"))
      .groupBy(col("a.p").as("pa"), col("b2.p").as("pb"), col("c.p").as("pc"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= Relational.CopurchaseMinSupport)
      .collect().map(key).toMap
    assert(apriori === naive)
  }

  test("emitted triples are downward-closed on sf0.01") {
    val big = "/root/testdata/sf0.01"
    val triples = Relational.tripleItemsets(spark, big).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(triples.nonEmpty)
    val b = Tables.lineitem(spark, big)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val freqPairs = b.as("x")
      .join(b.as("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .groupBy(col("x.p"), col("y.p")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= Relational.CopurchaseMinSupport)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    triples.foreach { case (a, bb, c) =>
      assert(freqPairs((a, bb)) && freqPairs((a, c)) && freqPairs((bb, c)),
        s"triple ($a,$bb,$c) has an infrequent sub-pair")
    }
  }
}
