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

  test("decodeHeader: generated PNG/BMP/GIF/WAV binaries decode their planted dims") {
    import java.nio.{ByteBuffer, ByteOrder}
    def png(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.BIG_ENDIAN)
      b.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      b.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
      b.array()
    }
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(26).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).position(18)
      b.putInt(w).putInt(h); b.array()
    }
    def gif(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
      b.put("GIF89a".getBytes("US-ASCII"))
      b.putShort(w.toShort).putShort(h.toShort); b.array()
    }
    def wav(channels: Int, rate: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(28).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(20)
      b.put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      b.putShort(1).putShort(channels.toShort).putInt(rate); b.array()
    }
    val fixtures = Seq(
      (1L, "image", png(640, 480), (640, 480)),
      (2L, "image", bmp(320, 200), (320, 200)),
      (3L, "image", gif(13, 11), (13, 11)),
      (4L, "audio", wav(2, 44100), (2, 44100)))
    // the pure parser, directly on the fixture bytes
    for ((_, _, bytes, dims) <- fixtures)
      assert(Multimodal.decodeHeader(bytes) === Some(dims))
    assert(Multimodal.decodeHeader("not a media file".getBytes) === None)
    assert(Multimodal.decodeHeader(Array.emptyByteArray) === None)
    // end-to-end through the Spark path: real bytes in, planted dims out
    val ds = fixtures.map { case (id, mod, bytes, _) =>
      Multimodal.Media(id, mod, bytes, Map.empty)
    }.toDS()
    val out = Multimodal.extractFeatures(ds, dim = 8).collect()
      .map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(out === fixtures.map(f => f._1 -> f._4).toMap)
  }

  /** A COMPLETE uncompressed 24bpp BMP: 54-byte header + padded pixel
    * array (bottom-up unless topDown), built from top-down RGB. */
  private def bmp24(w: Int, h: Int, rgbTopDown: Array[Byte],
                    topDown: Boolean): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val rowSize = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowSize * h
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(if (topDown) -h else h)
    b.putShort(1).putShort(24).putInt(0).putInt(rowSize * h)
    b.putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- 0 until h) {
      val src = if (topDown) row else h - 1 - row
      b.position(54 + row * rowSize)
      for (x <- 0 until w) {
        val o = (src * w + x) * 3
        // container stores BGR
        b.put(rgbTopDown(o + 2)).put(rgbTopDown(o + 1)).put(rgbTopDown(o))
      }
    }
    b.array()
  }

  test("decodeBmpPixels: a real 24bpp BMP round-trips its planted pixels exactly") {
    // 6 distinct pixels, top-down RGB order (rowSize 12 = 9 bytes + 3 pad)
    val rgb = Array[Byte](
      10, 20, 30,   40, 50, 60,   70, 80, 90,     // row 0
      -1, 0, 1,     100, 101, 102, 120, -128, 127) // row 1
    for (topDown <- Seq(false, true)) {
      val got = Multimodal.decodeBmpPixels(bmp24(3, 2, rgb, topDown))
      assert(got.isDefined, s"topDown=$topDown must decode")
      val (w, h, px) = got.get
      assert((w, h) === ((3, 2)))
      assert(px.toSeq === rgb.toSeq,
        s"topDown=$topDown: decoded pixels must match the planted image " +
        "byte-for-byte (padding stripped, BGR swapped, rows top-down)")
    }
    // the full-decode path feeds FEATURES from pixels, not container
    // bytes: histogram(decoded rgb) — header and padding excluded
    val file = bmp24(3, 2, rgb, topDown = false)
    val ds = Seq(Multimodal.Media(1L, "image", file, Map.empty)).toDS()
    val f = Multimodal.extractFeatures(ds, dim = 16).collect().head
    assert((f.width, f.height) === ((3, 2)))
    assert(f.features.toSeq === Multimodal.byteHistogram(rgb, 16).toSeq)
    // non-24bpp / compressed / truncated BMPs refuse the pixel path
    // (dims-only header tier still serves them)
    val bad = file.clone(); bad(28) = 8 // bpp = 8
    assert(Multimodal.decodeBmpPixels(bad).isEmpty)
    assert(Multimodal.decodeBmpPixels(file.take(54 + 5)).isEmpty)
  }

  test("resizeMedia: nearest-neighbor resampling of real BMP pixels, exact; undecodable dropped") {
    val rgb = Array[Byte](
      10, 20, 30,   40, 50, 60,   70, 80, 90,
      -1, 0, 1,     100, 101, 102, 120, -128, 127)
    // 2× upscale: sx = x/2, sy = y/2 — every pixel becomes a 2×2 block
    val up = Multimodal.resizeNearest(rgb, 3, 2, 6, 4)
    def px(a: Array[Byte], w: Int, x: Int, y: Int) =
      (a((y * w + x) * 3), a((y * w + x) * 3 + 1), a((y * w + x) * 3 + 2))
    for (y <- 0 until 4; x <- 0 until 6)
      assert(px(up, 6, x, y) === px(rgb, 3, x / 2, y / 2),
        s"upscaled ($x,$y) must sample source (${x / 2},${y / 2})")
    // degenerate downscale to 1×1 keeps the (0,0) sample
    assert(Multimodal.resizeNearest(rgb, 3, 2, 1, 1).toSeq
      === Seq[Byte](10, 20, 30))
    // the Spark path: one decodable BMP + one opaque payload — the
    // opaque row is DROPPED, the BMP resized exactly
    import spark.implicits._
    val ds = Seq(
      Multimodal.Media(1L, "image", bmp24(3, 2, rgb, topDown = false), Map.empty),
      Multimodal.Media(2L, "image", "not a bmp".getBytes, Map.empty)).toDS()
    val out = Multimodal.resizeMedia(ds, 6, 4).collect()
    assert(out.map(_.media_id).toSeq === Seq(1L))
    assert(out.head.pixels.toSeq === up.toSeq)
    assert((out.head.width, out.head.height) === ((6, 4)))
  }

  test("byteHistogram features are a real content signal: L1-normalized, dup-invariant") {
    val a = Multimodal.byteHistogram("aaaabbbb".getBytes("US-ASCII"), 16)
    assert(math.abs(a.sum - 1.0f) < 1e-6)
    // 'a'=0x61 and 'b'=0x62 share 16-bin bucket 6 — all mass lands there
    assert(a(6) === 1.0f)
    // identical payloads → identical histograms (what nearDupMedia keys on)
    val b = Multimodal.byteHistogram("aaaabbbb".getBytes("US-ASCII"), 16)
    assert(a.toSeq === b.toSeq)
    // empty payload → uniform prior, never a zero vector
    val e = Multimodal.byteHistogram(Array.emptyByteArray, 4)
    assert(e.toSeq === Seq(0.25f, 0.25f, 0.25f, 0.25f))
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
