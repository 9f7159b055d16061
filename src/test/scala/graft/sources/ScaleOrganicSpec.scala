package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession
import graft.tools.ScaleOrganic

/** Invariants of the organic-growth scale generator: the derived
  * corpus must (a) be exactly ×reps in every fact table with FK
  * integrity intact, (b) carry FRESH keys (no replica key reuse),
  * (c) preserve the categorical marginals the 250-query suite keys on
  * (lang/source, embedding labels, event types), and (d) be
  * bit-deterministic across re-runs — the corpus is the round's scale
  * EVIDENCE, so it must be reproducible. Runs on sf0.001 with reps=3;
  * the sf1 run is the same code at different args. */
class ScaleOrganicSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val src = "/root/testdata/sf0.001"

  private lazy val out: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_organic_spec")
    TempDirs.deleteOnExit(d)
    ScaleOrganic.build(spark, src, d.toString, reps = 3)
    d.toString
  }

  private def t(name: String) = spark.read.parquet(s"$out/$name.parquet")
  private def s(name: String) = spark.read.parquet(s"$src/$name.parquet")

  test("fact tables scale ×reps, dimensions ×reps or copied") {
    for (n <- Seq("customer", "supplier", "part", "orders", "events",
                  "documents", "embeddings"))
      assert(t(n).count() === 3 * s(n).count(), n)
    // baskets are BOOTSTRAPPED (donor orders sampled with replacement),
    // so the fresh lineitem total is the sum of sampled basket sizes —
    // ×reps in expectation, not exactly
    val liGot = t("lineitem").count().toDouble
    val liWant = 3.0 * s("lineitem").count()
    assert(math.abs(liGot / liWant - 1.0) < 0.05, s"$liGot vs $liWant")
    for (n <- Seq("region", "nation"))
      assert(t(n).count() === s(n).count(), n)
  }

  test("FK integrity: lineitem→orders→customer, lineitem→part/supplier") {
    val li = t("lineitem"); val ord = t("orders")
    assert(li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")
      .count() === 0)
    assert(ord.join(t("customer"),
      ord("o_custkey") === col("c_custkey"), "left_anti").count() === 0)
    assert(li.join(t("part"),
      li("l_partkey") === col("p_partkey"), "left_anti").count() === 0)
    assert(li.join(t("supplier"),
      li("l_suppkey") === col("s_suppkey"), "left_anti").count() === 0)
    // events users must stay inside the customer key space (the
    // stream-static enrich joins user_id = c_custkey)
    assert(t("events").join(t("customer"),
      col("user_id") === col("c_custkey"), "left_anti").count() === 0)
  }

  test("fresh keys: replicas never reuse an original key") {
    val nOrd = s("orders").count()
    assert(t("orders").filter(col("o_orderkey") >= nOrd).count() === 2 * nOrd)
    val nDoc = s("documents").count()
    assert(t("documents").filter(col("doc_id") >= nDoc).count() === 2 * nDoc)
    // keys unique
    for ((n, k) <- Seq("orders" -> "o_orderkey", "customer" -> "c_custkey",
                       "documents" -> "doc_id", "embeddings" -> "vec_id",
                       "events" -> "event_id", "part" -> "p_partkey"))
      assert(t(n).select(k).distinct().count() === t(n).count(), n)
  }

  test("categorical marginals preserved exactly (identity donors)") {
    val gotLang = t("documents").groupBy("lang", "source").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val srcLang = s("documents").groupBy("lang", "source").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(gotLang === srcLang.map { case (k, v) => k -> 3 * v })
    val gotLab = t("embeddings").groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val srcLab = s("embeddings").groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotLab === srcLab.map { case (k, v) => k -> 3 * v })
  }

  test("fresh embeddings are unit-normalized, fresh docs in-vocab") {
    val nVec = s("embeddings").count()
    val norms = t("embeddings").filter(col("vec_id") >= nVec)
      .select(sqrt(aggregate(transform(col("embedding"),
        x => (x * x).cast("double")), lit(0.0), (a, x) => a + x)))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-3))
    val vocab = s("documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .distinct().collect().map(_.getString(0)).toSet
    val nDoc = s("documents").count()
    val freshToks = t("documents").filter(col("doc_id") >= nDoc)
      .select(explode(split(col("text"), " ")).as("tok"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(freshToks.subsetOf(vocab))
  }

  test("near-dup plant rate is linear, not quadratic") {
    // fresh docs sharing an 8-token shingle with ANY doc: the planted
    // exact+near copies (~4.5% of fresh) plus chance — far below the
    // all-pairs blowup replication produces (every fresh doc dup'd)
    val nDoc = s("documents").count()
    val sh = t("documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 8), i -> concat_ws(' ', slice(t, i + 1, 8)))")).as("s"))
    val dupDocs = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
      .filter(col("a.doc_id") >= nDoc)
      .select(col("a.doc_id")).distinct().count()
    val fresh = 2 * nDoc
    assert(dupDocs < fresh / 5, s"dup-ish fresh docs $dupDocs of $fresh")
    assert(dupDocs > 0, "planting produced no duplicates at all")
  }

  test("co-purchase supports stay pruned: pair census grows sub-×reps") {
    // the regression this generator exists to kill: replication (and a
    // first draft that COPIED donor baskets) multiplies pair supports,
    // exploding the support-2 census ~1000× at ×10; itemwise-resampled
    // baskets keep it at a few × (sf1 measured: 3,573 → 14,747 at ×10)
    def census(df: org.apache.spark.sql.DataFrame): Long = {
      val b = df.select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      b.as("x").join(b.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p"), col("y.p")).count()
        .filter(col("count") >= 2).count()
    }
    val srcC = census(s("lineitem"))
    val gotC = census(t("lineitem"))
    assert(gotC <= math.max(20L, 3 * srcC),
      s"pair census $srcC -> $gotC at ×3: supports are being manufactured")
  }

  test("deterministic: a second build is byte-identical on derived rows") {
    val d2 = java.nio.file.Files.createTempDirectory("graft_organic_spec2")
    TempDirs.deleteOnExit(d2)
    ScaleOrganic.build(spark, src, d2.toString, reps = 3)
    for (n <- Seq("documents", "embeddings", "lineitem", "events")) {
      val a = spark.read.parquet(s"$out/$n.parquet")
      val b = spark.read.parquet(s"$d2/$n.parquet")
      assert(a.exceptAll(b).count() === 0, n)
      assert(b.exceptAll(a).count() === 0, n)
    }
  }
}
