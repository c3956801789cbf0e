package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("header parse via Column exprs recovers the written metadata") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val parsed = Multimodal.withParsedMeta(assets.toDF())
    val checked = parsed.select("asset_id", "width", "height", "frames")
      .as[(Long, Int, Int, Int)].collect()
    checked.foreach { case (id, w, h, f) =>
      assert(w === 4 + (id % 8).toInt)
      assert(h === 2 + (id % 5).toInt)
      val kind = (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      assert(f === (if (kind == "video") 2 + (id % 6).toInt else 1))
    }
    assert(checked.length === 30)
  }

  test("frame sampling explodes the right indices and byte offsets") {
    val parsed = Multimodal.withParsedMeta(Multimodal.syntheticAssets(spark, 30).toDF())
    val sampled = Multimodal.sampleFrames(parsed, stride = 2)
      .select("asset_id", "frame_idx", "byte_start", "frame_bytes")
      .as[(Long, Int, Int, Int)].collect()
    assert(sampled.nonEmpty)
    sampled.foreach { case (_, idx, start, fb) =>
      assert(idx % 2 === 0)
      assert(start === 12 + idx * fb)
    }
  }

  test("batched feature extraction is deterministic and partition-invariant") {
    val a = Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, 50).repartition(2))
      .collect().sortBy(_.asset_id)
    val b = Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, 50).repartition(7),
        batchSize = 3)
      .collect().sortBy(_.asset_id)
    assert(a.length === 50)
    a.zip(b).foreach { case (x, y) =>
      assert(x.asset_id === y.asset_id)
      assert(x.embedding.toSeq === y.embedding.toSeq)
    }
  }
}
