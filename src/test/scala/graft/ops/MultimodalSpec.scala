package graft.ops

import graft.SparkSpec

/** Pins the stub decoder's plumbing: schema shape, determinism, and
  * consistency between metadata, features, and frame layout.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table carries binary payload + prunable struct metadata") {
    val mt = Multimodal.mediaTable(spark, sf0001)
    val schema = mt.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(mt.count() == 500)
  }

  test("decode features are deterministic and consistent with metadata") {
    val f1 = Multimodal.decodeFeatures(spark, sf0001)
      .select("doc_id", "n_bytes", "n_frames", "mean_byte")
      .as[(Long, Long, Int, Double)].collect().sortBy(_._1)
    val f2 = Multimodal.decodeFeatures(spark, sf0001)
      .select("doc_id", "n_bytes", "n_frames", "mean_byte")
      .as[(Long, Long, Int, Double)].collect().sortBy(_._1)
    assert(f1.toSeq == f2.toSeq, "stub decode must be deterministic")
    val meta = Multimodal.mediaMeta(spark, sf0001)
      .select("doc_id", "n_bytes").as[(Long, Long)].collect().toMap
    f1.foreach { case (id, nBytes, nFrames, meanByte) =>
      assert(meta(id) == nBytes)
      assert(nFrames == (nBytes + Multimodal.FrameStride - 1) / Multimodal.FrameStride)
      assert(meanByte > 0 && meanByte < 256)
    }
    val hist = Multimodal.decodeFeatures(spark, sf0001)
      .selectExpr("n_bytes", "aggregate(byte_histogram, 0L, (a, x) -> a + x) AS total")
      .as[(Long, Long)].collect()
    hist.foreach { case (n, total) => assert(total == n, "histogram covers every byte") }
  }

  test("frame sampling covers each payload at the stride") {
    val frames = Multimodal.frameSample(spark, sf0001)
    val meta = Multimodal.mediaMeta(spark, sf0001)
      .select("doc_id", "n_bytes").as[(Long, Long)].collect().toMap
    val grouped = frames.select("doc_id", "frame_idx").as[(Long, Long)]
      .collect().groupBy(_._1)
    grouped.foreach { case (id, rows) =>
      val expected = (meta(id) + Multimodal.FrameStride - 1) / Multimodal.FrameStride
      assert(rows.length == expected, s"doc $id frame count")
      assert(rows.map(_._2).sorted.toSeq == (0L until expected))
    }
  }
}
