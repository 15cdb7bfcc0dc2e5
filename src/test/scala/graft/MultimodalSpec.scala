package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromDocuments(
    graft.core.Tables.documents(spark, sf).limit(30))

  test("media table has binary payload + typed metadata") {
    val df = media
    assert(df.schema("content").dataType.typeName === "binary")
    assert(df.schema("meta").dataType.typeName === "map")
    assert(df.select("modality").distinct().count() === 3L)
  }

  test("feature extraction is deterministic and batch-shaped") {
    val ds = media.as[Multimodal.Media]
    val f1 = Multimodal.extractFeatures(ds, dim = 16).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(ds.repartition(7), dim = 16).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 === f2) // partitioning must not change results
    assert(f1.values.forall(_.length === 16))
  }

  test("frame sampling slices video payloads into fixed windows") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, everyK = 2)
    assert(frames.count() > 0)
    val lens = frames.select(octet_length(col("frame"))).as[Int].collect()
    assert(lens.forall(_ <= 8))
    // frames only from video modality
    val vids = media.filter(col("modality") === "video").select("media_id")
      .as[Long].collect().toSet
    val frameIds = frames.select("media_id").distinct().as[Long].collect().toSet
    assert(frameIds.subsetOf(vids))
  }

  test("near-dup media detection composes features with cosine top-k") {
    val ds = media.as[Multimodal.Media]
    val out = Multimodal.nearDupMedia(ds, k = 2)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every query id gets at most k neighbors
    val grouped = rows.groupBy(_.getLong(0)).values
    assert(grouped.forall(_.length <= 2))
  }

  test("storageReport: exact byte totals, shares, oversize flags, null payloads") {
    val m = Seq(
      ("image", "abc".getBytes("UTF-8")),
      ("image", "abcde".getBytes("UTF-8")),
      ("audio", null.asInstanceOf[Array[Byte]]), // empty blob: a row, 0 bytes
      ("video", "0123456789".getBytes("UTF-8"))
    ).toDF("modality", "content")
    val out = Multimodal.storageReport(m, oversizeBytes = 6L)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // grand total 18 bytes: image 8 (444‰), audio 0, video 10 (555‰, oversize)
    assert(out === Seq(
      ("audio", 1L, 0L, 0L, 0L, 0L),
      ("image", 2L, 8L, 4000L, 444L, 0L),
      ("video", 1L, 10L, 10000L, 555L, 1L)))
  }
}
