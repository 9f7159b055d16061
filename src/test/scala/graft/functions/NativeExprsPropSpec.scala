package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** Property specs: every native codegen expression must agree with the
  * built-in (interpreted HOF / regex) formulation it replaced, on
  * generated inputs including empties and unicode. (Null ELEMENTS are
  * deliberately outside the equivalence properties — the native
  * expressions skip them while transform maps null→null; the dedicated
  * null-contract test at the bottom pins the native behavior.) The
  * DuckDB oracle checks the corpus; these check the algebra. Samples
  * are generated with a fixed seed and evaluated as ONE DataFrame per
  * property (zero mismatching rows = pass). */
class NativeExprsPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): List[A] =
    LazyList.iterate((Seed(42L), List.empty[A])) { case (seed, acc) =>
      val r = g.doPureApply(Gen.Parameters.default, seed)
      (r.seed.next, r.retrieve.fold(acc)(_ :: acc))
    }.map(_._2).dropWhile(_.length < n).head

  private val word: Gen[String] =
    Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(8)),
      Gen.numStr.map(_.take(6)),
      Gen.oneOf("the", "and", "der", "niño", "日本語", "", "a-b", "x.y"))
  private val words: Gen[List[String]] = Gen.choose(0, 12).flatMap(Gen.listOfN(_, word))
  private val text: Gen[String] = Gen.choose(0, 20).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(10)),
      Gen.oneOf(" ", "\t", "\n", "…", "é", "中文", "a b", "x;y", "3.14", "  ")))
      .map(_.mkString))

  private def assertAgree(df: org.apache.spark.sql.DataFrame,
                          native: org.apache.spark.sql.Column,
                          reference: org.apache.spark.sql.Column): Unit = {
    val bad = df.select(col("*"), native.as("nat"), reference.as("ref"))
      .filter(!(col("nat") <=> col("ref")))
    val rows = bad.take(3)
    assert(rows.isEmpty, s"native != reference: ${rows.mkString("; ")}")
  }

  test("TokenizeExpr == filter(split(trim(regexp_replace(lower))))") {
    val df = sample(text, 400).map(Tuple1(_)).toDF("s")
    assertAgree(df, NativeExprs.tokenize(col("s")),
      filter(
        split(trim(regexp_replace(lower(col("s")), "[^a-z0-9]+", " ")), " "),
        t => t =!= ""))
  }

  test("TokenHashesExpr == transform(polyHash)") {
    val df = sample(words, 300).map(Tuple1(_)).toDF("t")
    assertAgree(df, NativeExprs.tokenHashes(col("t")),
      transform(col("t"), x => NativeExprs.polyHash(x)))
  }

  test("CountInSetExpr == size(filter(isin))") {
    val set = Seq("the", "and", "der", "niño")
    val df = sample(words, 300).map(Tuple1(_)).toDF("t")
    assertAgree(df, NativeExprs.countInSet(col("t"), set),
      size(filter(col("t"), x => x.isin(set.map(lit): _*))))
  }

  test("CountCpRangeExpr == regexp_count of the single-char class") {
    val df = sample(text, 300).map(Tuple1(_)).toDF("s")
    assertAgree(df, NativeExprs.countCpRange(col("s"), 0x4e00, 0x9fff),
      regexp_count(col("s"), lit("[\\x{4e00}-\\x{9fff}]")).cast("int"))
  }

  test("CountPunctExpr == regexp_count([^a-z0-9\\s]) on lowered text") {
    val df = sample(text, 300).map(Tuple1(_)).toDF("s")
    assertAgree(df, NativeExprs.countPunct(lower(col("s"))),
      regexp_count(lower(col("s")), lit("[^a-z0-9\\s]")).cast("int"))
  }

  test("CountWsTokensExpr == size(filter(split(\\s+)))") {
    val df = sample(text, 300).map(Tuple1(_)).toDF("s")
    assertAgree(df, NativeExprs.countWsTokens(col("s")),
      size(filter(split(col("s"), "\\s+"), t => t =!= "")))
  }

  test("CountBpeTokensExpr == regexp_count of the BPE alternation") {
    val df = sample(text, 300).map(Tuple1(_)).toDF("s")
    assertAgree(df, NativeExprs.countBpeTokens(lower(col("s"))),
      regexp_count(lower(col("s")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("int"))
  }

  test("ShingleHashesExpr == distinct hashes of concat_ws shingles") {
    import graft.functions.TextExprs.{P, ShingleW}
    val df = sample(words, 300).map(Tuple1(_)).toDF("t")
    val hofShingles = when(size(col("t")) >= ShingleW,
      array_distinct(transform(
        sequence(lit(0), size(col("t")) - ShingleW),
        i => NativeExprs.polyHash(concat_ws(" ",
          element_at(col("t"), i + 1), element_at(col("t"), i + 2),
          element_at(col("t"), i + 3))))))
      .otherwise(array().cast("array<bigint>"))
    assertAgree(df, NativeExprs.shingleHashes(col("t"), ShingleW, P), hofShingles)
  }

  test("GramFreqStatsExpr == [positions, modal count, duplicated positions] of gramHashes") {
    import graft.functions.TextExprs.P
    val df = sample(words, 300).map(Tuple1(_)).toDF("t")
    for (w <- Seq(2, 5)) {
      val g = NativeExprs.gramHashes(col("t"), w, P)
      val nPos = size(g).cast("long")
      val topCnt = coalesce(
        array_max(transform(array_distinct(g),
          x => size(filter(g, y => y === x)).cast("long"))), lit(0L))
      val dupPos = size(filter(g,
        x => size(filter(g, y => y === x)) > 1)).cast("long")
      assertAgree(df, NativeExprs.gramFreqStats(col("t"), w, P),
        array(nPos, topCnt, dupPos))
    }
  }

  test("DotProductExpr == zip_with+aggregate fold (exact: same fold order)") {
    val vec = Gen.listOfN(8, Gen.chooseNum(-100.0, 100.0))
    val df = sample(Gen.zip(vec, vec), 300).toDF("x", "y")
    assertAgree(df, NativeExprs.dotProduct(col("x"), col("y")),
      aggregate(zip_with(col("x"), col("y"), (p, q) => p * q),
        lit(0.0), (acc, v) => acc + v))
  }

  test("SimHashExpr == the per-bit majority-vote definition") {
    val hashes = Gen.choose(0, 10).flatMap(Gen.listOfN(_, Gen.chooseNum(0L, 1L << 40)))
    val df = sample(hashes, 200).map(Tuple1(_)).toDF("hs")
    val bits = 16
    val ref = (0 until bits).map { b =>
      val votes = aggregate(col("hs"), lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    assertAgree(df, NativeExprs.simHash(col("hs"), bits), ref)
  }

  test("null elements are skipped, not NPE") {
    val df = spark.sql(
      """SELECT array('a', CAST(NULL AS STRING), 'b') AS t,
        |       array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT), 3) AS hs,
        |       array(1.0, CAST(NULL AS DOUBLE), 2.0) AS v""".stripMargin)
    val r = df.select(
      NativeExprs.tokenHashes(col("t")).as("th"),
      NativeExprs.countInSet(col("t"), Seq("a", "b")).as("cis"),
      NativeExprs.simHash(col("hs"), 8).as("sh"),
      NativeExprs.minhashSig(col("hs"), Seq(3L, 5L), Seq(7L, 11L), 97L).as("ms"),
      NativeExprs.shingleHashes(col("t"), 2, 97L).as("shh"),
      NativeExprs.dotProduct(col("v"), col("v")).as("dp")).head()
    assert(r.getSeq[Long](0).length === 2)   // null token dropped
    assert(r.getInt(1) === 2)
    assert(r.getSeq[Long](3).length === 2)   // K sigs
    assert(r.getDouble(5) === 5.0)           // null slot contributes 0
  }

  test("MisraGriesAggExpr: capacity bound + heavy-hitter guarantee on random skewed streams") {
    // random streams with a few planted hot tokens; for every capacity,
    // every token with count > N/(cap+1) MUST be in the candidate set
    // and the set must never exceed the capacity — regardless of how
    // the stream is partitioned (merge order is adversarial via
    // repartition)
    val hot: Gen[String] = Gen.oneOf("h1", "h2", "h3")
    val cold: Gen[String] = Gen.alphaLowerStr.map("c" + _.take(6))
    val tok: Gen[String] = Gen.frequency(3 -> hot, 2 -> cold)
    for (cap <- Seq(2, 5, 16); parts <- Seq(1, 7)) {
      val toks = sample(tok, 600)
      val n = toks.length
      val exact = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val df = toks.map(t => Tuple1(Seq(t))).toDF("t").repartition(parts)
      val cand = df.agg(NativeExprs.misraGries(col("t"), cap).as("c"))
        .head().getSeq[String](0).toSet
      assert(cand.size <= cap, s"cap=$cap parts=$parts: ${cand.size} candidates")
      val mustHave = exact.filter { case (_, c) => c * (cap + 1) > n }.keySet
      assert(mustHave.subsetOf(cand),
        s"cap=$cap parts=$parts: missing ${mustHave -- cand}")
    }
  }
}
