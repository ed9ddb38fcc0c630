package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "hello world".getBytes("UTF-8")),
    (2L, Array[Byte](10, 20, 30)),
    (3L, Array.empty[Byte])
  ).toDF("id", "payload")

  test("meta computes size/digest/head without decoding") {
    val m = Multimodal.meta(media, "id", "payload")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(m(1L)._1 == 11L)
    assert(m(1L)._2 == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(m(3L)._1 == 0L)
  }

  test("decodeFeatures runs the batched stub decoder per partition") {
    val feats = Multimodal.decodeFeatures(media.repartition(2), "id", "payload")
      .collect().map(f => f.id -> f).toMap
    assert(feats.size == 3)
    assert(feats(2L).width == 11 && feats(2L).height == 21) // 1 + (byte & 0x7f)
    assert(feats(3L).width == 0 && feats(3L).brightness == 0.0)
    // deterministic: same input → same output
    val again = Multimodal.decodeFeatures(media, "id", "payload").collect().map(f => f.id -> f).toMap
    assert(again == feats)
  }
}
