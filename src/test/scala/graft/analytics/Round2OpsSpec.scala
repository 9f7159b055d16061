package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.SparkTestSession

/** Invariant specs for the round-2 operator surface (q35–q45); the
  * driver's DuckDB oracle provides value-exact verification, these
  * cover structural properties at sf0.001. */
class Round2OpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.get

  test("chunking: every doc chunked, chunk sizes bounded, counts consistent") {
    import graft.text.TextOps.{ChunkSize, ChunkStride}
    val docs = graft.tables.Tables.documents(spark, dir)
    val chunks = graft.text.TextOps.chunkDocs(spark, dir).cache()
    assert(chunks.select("doc_id").distinct().count() === docs.count())
    assert(chunks.filter(col("n_chunk_tokens") > ChunkSize).count() === 0)
    // chunk_ids per doc are dense 0..n-1
    val bad = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("chunk_id").as("mx"), min("chunk_id").as("mn"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.count() === 0)
    // overlap: consecutive chunks of a long doc share ChunkSize-ChunkStride tokens
    assert(ChunkSize > ChunkStride)
    chunks.unpersist()
  }

  test("redaction changes the fingerprint exactly when something matched") {
    val red = graft.text.TextOps.redact(spark, dir)
    val fp = graft.text.TextOps.fingerprint(spark, dir)
    val j = red.join(
      graft.tables.Tables.documents(spark, dir)
        .select(col("doc_id"),
          graft.functions.NativeExprs.polyHash(col("text")).as("orig_fp")),
      "doc_id").cache()
    assert(j.filter(col("n_nums") + col("n_emails") > 0 &&
      col("red_fp") === col("orig_fp")).count() === 0)
    assert(j.filter(col("n_nums") + col("n_emails") === 0 &&
      col("red_fp") =!= col("orig_fp")).count() === 0)
    assert(fp.count() > 0)
    j.unpersist()
  }

  test("stratified sample keeps a subset with lang-dependent rates") {
    val s = graft.text.TextOps.stratifiedSample(spark, dir).cache()
    assert(s.filter(col("n_sampled") > col("n_docs")).count() === 0)
    assert(s.agg(sum("n_sampled")).head().getLong(0) > 0)
    s.unpersist()
  }

  test("tfidf emits at most 5 ranked terms per language with positive scores") {
    val t = graft.text.TextOps.tfidfTopTerms(spark, dir).cache()
    val perLang = t.groupBy("lang").agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perLang.filter(col("n") > 5 || col("mx") > 5).count() === 0)
    assert(t.filter(col("score_bp") <= 0 || col("df") <= 0).count() === 0)
    t.unpersist()
  }

  test("IVF ANN: ranked neighbors per probe, never the probe itself") {
    val a = graft.vector.VectorOps.annIvf(spark, dir).cache()
    assert(a.filter(col("query_id") === col("neighbor_id")).count() === 0)
    val perQ = a.groupBy("query_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perQ.filter(col("n") > graft.vector.VectorOps.KLsh).count() === 0)
    assert(perQ.filter(col("mx") =!= col("n")).count() === 0) // dense ranks from 1
    a.unpersist()
  }

  test("semi/anti customers have an F order and no O order") {
    val r = graft.analytics.Relational.semiAntiCustomers(spark, dir)
    val o = graft.tables.Tables.orders(spark, dir)
    val withO = r.join(o.filter(col("o_orderstatus") === "O"),
      r("c_custkey") === o("o_custkey"))
    val withF = r.join(o.filter(col("o_orderstatus") === "F"),
      r("c_custkey") === o("o_custkey"), "left_anti")
    assert(withO.count() === 0)
    assert(withF.count() === 0)
  }

  test("cube grand total equals the table count") {
    val c = graft.analytics.Relational.cubeByStatusPriority(spark, dir)
    val total = c.filter(col("o_orderstatus").isNull && col("o_orderpriority").isNull)
      .select("n_orders").head().getLong(0)
    assert(total === graft.tables.Tables.orders(spark, dir).count())
  }

  test("lead/lag gap counts are bounded by event counts") {
    val l = graft.analytics.EventOps.leadLagDeltas(spark, dir).cache()
    assert(l.filter(col("n_next_up") > col("n_with_next")).count() === 0)
    assert(l.filter(col("avg_gap_ms") > col("max_gap_ms")).count() === 0)
    l.unpersist()
  }

  test("binary metadata: md5 digest shape and positive byte lengths") {
    val b = graft.multimodal.MultimodalOps.binaryMeta(spark, dir).cache()
    assert(b.filter(length(col("digest")) =!= 32).count() === 0)
    assert(b.filter(col("n_bytes") <= 0).count() === 0)
    assert(b.select("kind").distinct().count() <= 3)
    b.unpersist()
  }

  test("int8-quantized kNN finds mostly the same neighbors as exact kNN") {
    val exact = graft.vector.VectorOps.knnBrute(spark, dir)
      .filter(col("rank") <= graft.vector.VectorOps.KLsh)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = graft.vector.VectorOps.knnInt8(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = quant.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall vs exact = $recall")
  }

  test("dedup clusters: every pair co-clustered, reps are component minima") {
    val pairs = graft.dedup.DedupOps.minhashLsh(spark, dir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val rep = graft.dedup.DedupOps.dedupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // both endpoints of every near-dup pair share a representative
    pairs.foreach { case (a, b) => assert(rep(a) === rep(b), s"($a,$b)") }
    // a representative is a member of its own cluster and is minimal
    rep.values.toSet.foreach { (r: Long) => assert(rep(r) === r) }
    rep.foreach { case (doc, r) => assert(r <= doc) }
  }

  test("group MinHash signature == elementwise min of member signatures") {
    import graft.functions.TextExprs._
    val perDoc = graft.tables.Tables.documents(spark, dir)
      .select(col("lang"),
        graft.functions.NativeExprs.shingleHashes(
          tokensCol(col("text")), ShingleW, P).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("lang"), minhashSigCol(col("hs")).as("sig"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (lang, rows) =>
        lang -> rows.map(_.getSeq[Long](1)).reduce((a, b) =>
          a.zip(b).map { case (x, y) => math.min(x, y) })
      }
    // q68 serializes the signature for the driver comparator — parse back
    val grouped = graft.dedup.DedupOps.minhashGroupSig(spark, dir)
      .collect().map(r => r.getString(0) ->
        r.getString(1).split(",").toSeq.map(_.toLong)).toMap
    assert(grouped.keySet === perDoc.keySet)
    grouped.foreach { case (lang, sig) =>
      assert(sig === perDoc(lang), s"lang=$lang")
    }
  }

  test("HLL approx distinct holds its declared error bound") {
    val a = graft.analytics.Relational.approxDistinct(spark, dir)
    assert(a.filter(col("within_bound") =!= 1).count() === 0)
  }

  test("approx percentiles hold their declared error bound") {
    val p = graft.analytics.Relational.approxPercentiles(spark, dir)
    assert(p.filter(col("within_bound") =!= 1).count() === 0)
  }

  test("upsert covers the keyspace: updates+keeps = base, inserts are new keys (q86)") {
    val merged = graft.analytics.Relational.upsertCustomers(spark, dir).cache()
    val base = graft.tables.Tables.customer(spark, dir)
    val nBase = base.count()
    assert(merged.filter(col("op").isin("U", "K")).count() === nBase)
    // inserts carry synthetic keys only, and every row has a balance
    assert(merged.filter(col("op") === "I")
      .filter(col("custkey") < 200000).count() === 0)
    assert(merged.filter(col("acctbal").isNull).count() === 0)
    merged.unpersist()
  }

  test("SCD2 history: one current row per user, contiguous ranges (q87)") {
    import org.apache.spark.sql.expressions.Window
    val h = graft.analytics.EventOps.scd2History(spark, dir).cache()
    val users = graft.tables.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(h.filter(col("is_current") === 1).count() === users)
    // each non-current version ends exactly where its successor starts
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("valid_to"))
    val gaps = h.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to") =!= col("next_from"))
    assert(gaps.count() === 0)
    h.unpersist()
  }
}
