package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get

  private lazy val assets  = MultimodalOps.synthesizeAssets(spark, 200)
  private lazy val decoded = MultimodalOps.decode(assets).cache()

  test("decode recovers the typed metadata for every asset") {
    assert(decoded.count() === 200)
    val byKind = decoded.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind("audio") === 67)  // ids ≡ 0 (mod 3)
    assert(byKind("image") === 133)
    val a5 = decoded.filter(col("asset_id") === 5).head()
    assert(a5.width === 64 + (5 % 8) * 32)
    assert(a5.height === 64 + (5 % 5) * 48)
    assert(a5.byte_len === MultimodalOps.HeaderLen + 5 % 4096)
    val a6 = decoded.filter(col("asset_id") === 6).head()
    assert(a6.kind === "audio")
    assert(a6.sample_rate === 8000)
  }

  test("resize plan fits the target box and keeps aspect ratio") {
    val plan = MultimodalOps.resizePlan(decoded, maxSide = 100)
    val rows = plan.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h)   = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (nw, nh) = (r.getAs[Int]("new_width"), r.getAs[Int]("new_height"))
      assert(nw <= 100 && nh <= 100)
      assert(math.max(nw, nh) === 100 ||
        math.abs(nw - 100.0 * w / math.max(w, h)) < 1)
    }
  }

  test("corpus-derived frame-sample query matches the generator arithmetic (q82)") {
    val dir = "/root/testdata/sf0.001"
    val out = MultimodalOps.frameSamples(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // re-derive expected indices from the generator spec alone
    val docIds = graft.tables.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = for {
      id <- docIds if id % 3 == 0
      f  <- 0 until (100 + (id % 50)).toInt by 7
    } yield (id, f)
    assert(out.sorted.toSeq === expected.sorted.toSeq)
  }

  test("corpus-derived resize query matches the generator arithmetic (q92)") {
    val dir = "/root/testdata/sf0.001"
    val out = MultimodalOps.resizePlans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4))).toSet
    val docIds = graft.tables.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = (for {
      id <- docIds if id % 3 != 0
      w = (64 + (id % 8) * 32).toInt
      h = (64 + (id % 5) * 48).toInt
      if math.max(w, h) > MultimodalOps.MaxSide
      scale = MultimodalOps.MaxSide.toDouble / math.max(w, h)
    } yield (id, math.floor(w * scale).toInt, math.floor(h * scale).toInt)).toSet
    assert(out === expected)
    // the plan never upsizes and always fits the box
    out.foreach { case (_, nw, nh) =>
      assert(nw <= MultimodalOps.MaxSide && nh <= MultimodalOps.MaxSide)
    }
  }

  test("frame sampling emits every stride-th frame index") {
    val sampled = MultimodalOps.frameSample(decoded, stride = 10)
    val perAsset = sampled.groupBy("asset_id").count()
    val joined = decoded.filter(col("n_frames") > 1)
      .join(perAsset, "asset_id")
      .selectExpr("n_frames", "count").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val expect = (r.getAs[Int]("n_frames") + 9) / 10
      assert(r.getAs[Long]("count") === expect)
    }
  }
}
