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

  // ---- PNG fixture encoder: chunk framing + CRC32, Deflater stream,
  // FORWARD filtering (the decoder must invert it) — all JDK-only,
  // independent arithmetic from the decoder's unfilter pass
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  private def png(w: Int, h: Int, rgbTopDown: Array[Byte], colorType: Int,
                  filters: Seq[Int]): Array[Byte] = {
    val bpp = if (colorType == 2) 3 else 4
    val rows = Array.tabulate(h, w * bpp) { (y, i) =>
      val px = i / bpp; val ch = i % bpp
      if (ch < 3) rgbTopDown((y * w + px) * 3 + ch) else 0xAA.toByte
    }
    val raw = new java.io.ByteArrayOutputStream()
    var prior = new Array[Byte](w * bpp)
    for (y <- 0 until h) {
      val cur = rows(y)
      val f = filters(y % filters.size)
      raw.write(f)
      for (x <- 0 until w * bpp) {
        val v = cur(x) & 0xFF
        val a = if (x >= bpp) cur(x - bpp) & 0xFF else 0
        val up = prior(x) & 0xFF
        val c = if (x >= bpp) prior(x - bpp) & 0xFF else 0
        val filt = f match {
          case 0 => v
          case 1 => v - a
          case 2 => v - up
          case 3 => v - ((a + up) >> 1)
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            v - (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        raw.write(filt & 0xFF)
      }
      prior = cur
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.write(pngChunk("IHDR", ihdr.array()))
    val cb = comp.toByteArray // split IDAT to exercise chunk concat
    out.write(pngChunk("IDAT", cb.take(cb.length / 2)))
    out.write(pngChunk("IDAT", cb.drop(cb.length / 2)))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  // ---- GIF fixture encoder: the "uncompressed GIF" trick — a CLEAR
  // code before every literal keeps the LZW dictionary empty and the
  // code width constant, which is spec-legal and provably in sync
  private def gif(w: Int, h: Int, indices: Array[Byte],
                  palette: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le16(w); le16(h)
    val entries = palette.length / 3
    var bits = 1
    while ((1 << bits) < entries) bits += 1
    out.write(0x80 | (bits - 1)); out.write(0); out.write(0)
    out.write(palette)
    for (_ <- entries until (1 << bits)) { out.write(0); out.write(0); out.write(0) }
    out.write(0x21); out.write(0xFE) // a comment extension on the walk path
    out.write(3); out.write("gfx".getBytes("US-ASCII")); out.write(0)
    out.write(0x2C); le16(0); le16(0); le16(w); le16(h); out.write(0)
    out.write(minCodeSize)
    val clear = 1 << minCodeSize
    val codeSize = minCodeSize + 1
    var bitBuf = 0L; var bitCnt = 0
    val data = new java.io.ByteArrayOutputStream()
    def putCode(c: Int): Unit = {
      bitBuf |= c.toLong << bitCnt; bitCnt += codeSize
      while (bitCnt >= 8) { data.write((bitBuf & 0xFF).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    putCode(clear)
    for (i <- indices) { putCode(i & 0xFF); putCode(clear) }
    putCode(clear + 1) // END
    if (bitCnt > 0) data.write((bitBuf & 0xFF).toInt)
    val db = data.toByteArray
    var o = 0
    while (o < db.length) {
      val n = math.min(255, db.length - o)
      out.write(n); out.write(db, o, n); o += n
    }
    out.write(0); out.write(0x3B)
    out.toByteArray
  }

  private def wav(channels: Int, rate: Int, bits: Int,
                  samples: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + samples.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
    bb.putInt(rate).putInt(rate * channels * bits / 8)
    bb.putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    bb.put("data".getBytes).putInt(samples.length).put(samples)
    bb.array()
  }

  test("decodePngPixels: all five scanline filters invert exactly; " +
    "RGBA drops alpha; IDAT split across chunks reassembles") {
    val rgb = Array.tabulate(4 * 3 * 3)(i => ((i * 37 + 11) % 251).toByte)
    // one fixture per filter, plus a mixed one cycling 0..4 by row
    for (f <- 0 to 4) {
      val got = Multimodal.decodePngPixels(png(4, 3, rgb, 2, Seq(f)))
      assert(got.isDefined, s"filter $f must decode")
      assert(got.get._1 === 4 && got.get._2 === 3)
      assert(got.get._3.toSeq === rgb.toSeq, s"filter $f must invert exactly")
    }
    val mixed = Multimodal.decodePngPixels(png(4, 3, rgb, 2, Seq(0, 1, 2, 3, 4)))
    assert(mixed.get._3.toSeq === rgb.toSeq)
    // RGBA: same pixels ride with an alpha channel the decode drops
    val rgba = Multimodal.decodePngPixels(png(4, 3, rgb, 6, Seq(4)))
    assert(rgba.get._3.toSeq === rgb.toSeq)
    // unsupported profiles fall to None (dims-only tier), never throw
    val palette = png(4, 3, rgb, 2, Seq(0)).clone()
    palette(25) = 3 // colorType -> palette
    assert(Multimodal.decodePngPixels(palette).isEmpty)
    assert(Multimodal.decodeHeader(palette).contains((4, 3)))
  }

  test("lzwDecode: hand-packed stream with dictionary growth, KwKwK " +
    "and a mid-stream width bump decodes to the known expansion") {
    // codes [CLEAR=4, 0, 6, 6] at 3 bits then [END=5] at 4 bits decode
    // to "aaaaa" (0 -> a; 6 is the KwKwK case; second 6 uses the new
    // entry; after entry 7 the width grows to 4 bits) — packed
    // LSB-first that is bytes [0x84, 0x5D]
    val got = Multimodal.lzwDecode(Array(0x84.toByte, 0x5D.toByte), 2, 5)
    assert(got.isDefined)
    assert(got.get.toSeq === Seq[Byte](0, 0, 0, 0, 0))
    // truncated stream: no END, fewer pixels than promised -> None
    assert(Multimodal.lzwDecode(Array(0x84.toByte), 2, 5).isEmpty)
  }

  test("decodeGifPixels: palette indices map through the color table; " +
    "extensions skipped; interlace refused to the dims tier") {
    val pal = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val idx = Array[Byte](0, 1, 2, 3, 2, 1) // 3x2 frame
    val file = gif(3, 2, idx, pal, minCodeSize = 2)
    val got = Multimodal.decodeGifPixels(file)
    assert(got.isDefined)
    val (w, h, rgb) = got.get
    assert((w, h) === ((3, 2)))
    assert(rgb.toSeq === idx.flatMap(i =>
      Seq(pal(i * 3), pal(i * 3 + 1), pal(i * 3 + 2))).toSeq)
    // flip the interlace bit in the image descriptor -> dims-only tier
    val pos = file.indexOf(0x2C.toByte, 13)
    val inter = file.clone(); inter(pos + 9) = (inter(pos + 9) | 0x40).toByte
    assert(Multimodal.decodeGifPixels(inter).isEmpty)
    assert(Multimodal.decodeHeader(inter).contains((3, 2)))
  }

  test("decodeWavSamples: PCM data chunk is the samples; lossy formats refused") {
    val samples = Array.tabulate(32)(i => (i * 7).toByte)
    val got = Multimodal.decodeWavSamples(wav(2, 44100, 16, samples))
    assert(got.isDefined)
    assert(got.get._1 === 2 && got.get._2 === 44100)
    assert(got.get._3.toSeq === samples.toSeq)
    val lossy = wav(2, 44100, 16, samples).clone()
    lossy(20) = 85 // audioFormat -> 0x55 (MP3)
    assert(Multimodal.decodeWavSamples(lossy).isEmpty)
    assert(Multimodal.decodeHeader(lossy).contains((2, 44100)))
  }

  test("decoded tiers feed features/resize: PNG and GIF pixels are " +
    "first-class; WAV features come from samples, not container bytes") {
    val rgb = Array.tabulate(4 * 3 * 3)(i => ((i * 53 + 5) % 250).toByte)
    val pngFile = png(4, 3, rgb, 2, Seq(0, 4))
    val pal = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val gifFile = gif(2, 2, Array[Byte](3, 0, 1, 2), pal, 2)
    val samples = Array.tabulate(64)(i => (i * 11).toByte)
    val wavFile = wav(1, 8000, 8, samples)
    val ds = Seq(
      Multimodal.Media(1L, "image", pngFile, Map.empty),
      Multimodal.Media(2L, "image", gifFile, Map.empty),
      Multimodal.Media(3L, "audio", wavFile, Map.empty)).toDS()
    val f = Multimodal.extractFeatures(ds, dim = 16).collect()
      .map(m => m.media_id -> m).toMap
    assert(f(1L).features.toSeq === Multimodal.byteHistogram(rgb, 16).toSeq)
    assert((f(1L).width, f(1L).height) === ((4, 3)))
    val gifRgb = Array[Byte](3, 0, 1, 2).flatMap(i =>
      Seq(pal(i * 3), pal(i * 3 + 1), pal(i * 3 + 2)))
    assert(f(2L).features.toSeq === Multimodal.byteHistogram(gifRgb, 16).toSeq)
    assert(f(3L).features.toSeq === Multimodal.byteHistogram(samples, 16).toSeq)
    assert((f(3L).width, f(3L).height) === ((1, 8000)))
    // resize consumes PNG/GIF pixels through the same dispatcher
    val rs = Multimodal.resizeMedia(ds, 2, 2).collect()
      .map(m => m.media_id -> m).toMap
    assert(rs.keySet === Set(1L, 2L)) // audio has no pixel array
    assert(rs(1L).pixels.toSeq ===
      Multimodal.resizeNearest(rgb, 4, 3, 2, 2).toSeq)
  }

  test("decoders never throw: random bytes and every truncation of " +
    "valid fixtures fall to None") {
    val rnd = new scala.util.Random(1234)
    val rgb = Array.tabulate(3 * 2 * 3)(i => (i * 29).toByte)
    val valid = Seq(
      png(3, 2, rgb, 2, Seq(0, 4)),
      gif(3, 2, Array[Byte](0, 1, 2, 3, 0, 1),
        Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12), 2),
      wav(2, 44100, 16, Array.tabulate(16)(_.toByte)),
      bmp24(3, 2, rgb, topDown = false))
    for (v <- valid; n <- 0 until v.length) {
      val t = v.take(n)
      Multimodal.decodePixels(t) // must not throw
      Multimodal.decodeWavSamples(t)
    }
    for (_ <- 0 until 300) {
      val a = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(a)
      Multimodal.decodePixels(a)
      Multimodal.decodeWavSamples(a)
    }
    // and corrupting single bytes of valid files stays non-throwing
    for (v <- valid; _ <- 0 until 50) {
      val c = v.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Multimodal.decodePixels(c)
      Multimodal.decodeWavSamples(c)
    }
  }

  test("decodeBmpPixels: crafted overflow headers fall to None, not a throw") {
    import java.nio.{ByteBuffer, ByteOrder}
    // r15-ADVICE: width > 715,827,882 wrapped `width * 3 + 3` negative
    // in Int, slipped past the truncation guard, and the allocation
    // threw — one ~60-byte malformed blob failed the whole job instead
    // of falling to the dims-only tier
    def crafted(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(60).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(60).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h)
      b.putShort(1).putShort(24).putInt(0).putInt(0)
      b.array()
    }
    for ((w, h) <- Seq((800000000, 2), (1431655766, 1), (46341, 46341),
                       (Int.MaxValue, Int.MaxValue)))
      assert(Multimodal.decodeBmpPixels(crafted(w, h)).isEmpty,
        s"($w x $h) must refuse the pixel path")
    // and the pipeline serves such a blob from the dims-only tier
    val ds = Seq(Multimodal.Media(1L, "image", crafted(800000000, 2),
      Map.empty)).toDS()
    val f = Multimodal.extractFeatures(ds, dim = 16).collect().head
    assert((f.width, f.height) === ((800000000, 2)))
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
