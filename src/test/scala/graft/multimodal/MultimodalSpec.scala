package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  // ALL payloads are REAL containers: image/video are PGM (video = 10
  // stacked blocks whose rasters DIFFER per frame, so block-walking is
  // actually exercised); audio is a RIFF/WAVE container whose samples
  // are the bytes of "payload-$i" — u8 for odd i, s16le (each byte
  // widened by (b−128)·256) for even i, so the mixed-width decode path
  // runs through every downstream fixture consumer
  private def media(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val (w, h, nf) = (8, 4, 10)
      val pixels = Array.tabulate(w * h)(p => ((p + i) % 256).toByte)
      val payload = kind match {
        case "audio" if i % 2 == 0 =>
          Multimodal.WavCodec.encodeS16(16000, s"payload-$i".getBytes("UTF-8")
            .map(b => (((b & 0xff) - 128) << 8).toShort))
        case "audio" =>
          Multimodal.WavCodec.encode(16000, s"payload-$i".getBytes("UTF-8"))
        case "image" => Multimodal.PgmCodec.encode(w, h, pixels)
        case _ => (0 until nf).toArray.flatMap(f =>
          Multimodal.PgmCodec.encode(w, h, pixels.map(b => (b + f).toByte)))
      }
      Multimodal.Media(i.toLong, kind, payload, w, h, 16000, nf,
        "application/octet-stream")
    }.toDS()
  }

  test("PGM codec: encode/decode round-trip, malformed input throws") {
    val px = Array.tabulate(12)(_.toByte)
    val m = Multimodal.Media(1L, "image", Multimodal.PgmCodec.encode(4, 3, px),
      4, 3, 0, 0, "")
    val d = Multimodal.PgmCodec.decode(m)
    assert(d.width == 4 && d.height == 3 && d.pixels.sameElements(px))
    // header/metadata disagreement and non-PGM bytes both fail loudly
    intercept[IllegalArgumentException] {
      Multimodal.PgmCodec.decode(m.copy(width = 5))
    }
    intercept[IllegalArgumentException] {
      Multimodal.PgmCodec.decode(m.copy(payload = "JFIF....".getBytes("US-ASCII")))
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.PgmCodec.decode(m.copy(payload = m.payload.dropRight(2)))
    }
  }

  test("WAV codec: round-trip, chunk walk skips foreign chunks, bad input throws") {
    val samples = Array.tabulate(300)(i => (i % 251).toByte)
    val wav = Multimodal.WavCodec.encode(16000, samples)
    val m = Multimodal.Media(1L, "audio", wav, 0, 0, 16000, 0, "")
    val d = Multimodal.WavCodec.decode(m)
    assert(d.width == 300 && d.height == 1 && d.pixels.sameElements(samples))

    // a real container may carry LIST/cue/... chunks before `data`; the
    // walk must skip them by declared size WITH word alignment (odd
    // payload → 1 pad byte)
    val junk = Array[Byte]('j', 'u', 'n', 'k', 'y') // odd-size chunk body
    val b = java.nio.ByteBuffer.allocate(wav.length + 8 + junk.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(wav, 0, 36)                               // RIFF..fmt chunk
    b.put("LIST".getBytes("US-ASCII")).putInt(junk.length).put(junk).put(0.toByte)
    b.put(wav, 36, wav.length - 36)                 // data chunk
    val withJunk = b.array()
    val d2 = Multimodal.WavCodec.decode(m.copy(payload = withJunk))
    assert(d2.pixels.sameElements(samples), "chunk walk mis-skipped the LIST chunk")

    // failure modes a real decoder must surface loudly
    intercept[IllegalArgumentException] { // not RIFF
      Multimodal.WavCodec.decode(m.copy(payload = "OggS....".getBytes("US-ASCII")))
    }
    intercept[IllegalArgumentException] { // truncated data chunk
      Multimodal.WavCodec.decode(m.copy(payload = wav.dropRight(5)))
    }
    intercept[IllegalArgumentException] { // metadata sample-rate mismatch
      Multimodal.WavCodec.decode(m.copy(sample_rate = 44100))
    }
    intercept[IllegalArgumentException] { // stereo rejected
      val st = wav.clone(); st(22) = 2 // channels field
      Multimodal.WavCodec.decode(m.copy(payload = st))
    }
    intercept[IllegalArgumentException] { // 24-bit rejected
      val wide = wav.clone(); wide(34) = 24 // bits/sample field
      Multimodal.WavCodec.decode(m.copy(payload = wide))
    }
    intercept[IllegalArgumentException] { // data before fmt
      val noFmt = java.nio.ByteBuffer.allocate(12 + 8 + samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      noFmt.put(wav, 0, 12).put("data".getBytes("US-ASCII"))
        .putInt(samples.length).put(samples)
      Multimodal.WavCodec.decode(m.copy(payload = noFmt.array()))
    }
  }

  test("WAV codec s16le: hand-built container narrows to u8 exactly, odd data throws") {
    // hand-built samples covering the conversion edges: full-scale
    // negative/positive, zero, and values that are NOT exact u8
    // multiples (the >>8 truncation toward -inf is the defined result)
    val shorts = Array[Short](-32768, -256, -1, 0, 255, 256, 1000, 32767)
    val wav = Multimodal.WavCodec.encodeS16(16000, shorts)
    val m = Multimodal.Media(2L, "audio", wav, 0, 0, 16000, 0, "")
    val d = Multimodal.WavCodec.decode(m)
    assert(d.width == shorts.length && d.height == 1)
    val expected = shorts.map(s => ((s >> 8) + 128).toByte)
    assert(d.pixels.sameElements(expected),
      s"s16→u8 narrowing wrong: got ${d.pixels.toSeq}, want ${expected.toSeq}")

    // byte-level layout: 16-bit fmt fields and LE sample order
    assert(wav(34) == 16, "bits/sample field")
    assert(wav(32) == 2, "block align field")
    assert((wav(44) & 0xff) == 0 && (wav(45) & 0xff) == 0x80, "-32768 LE bytes")

    // the u8→s16→u8 round trip is exact for widened u8 signals
    val u8 = "mixed width corpus".getBytes("UTF-8")
    val widened = u8.map(b => (((b & 0xff) - 128) << 8).toShort)
    val rt = Multimodal.WavCodec.decode(
      m.copy(payload = Multimodal.WavCodec.encodeS16(16000, widened)))
    assert(rt.pixels.sameElements(u8), "u8→s16→u8 round trip drifted")

    // an odd-size s16 data chunk is a torn container — must throw; the
    // same byte string under bits=8 walks fine, so the check is real
    val odd = java.nio.ByteBuffer.allocate(44 + 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    odd.put(wav, 0, 40).putInt(3).put(Array[Byte](1, 2, 3))
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode(m.copy(payload = odd.array()))
    }

    // foreign chunks are skipped on the s16 path too
    val junk = Array[Byte]('x', 'y', 'z')
    val b = java.nio.ByteBuffer.allocate(wav.length + 8 + junk.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(wav, 0, 36)
    b.put("LIST".getBytes("US-ASCII")).putInt(junk.length).put(junk).put(0.toByte)
    b.put(wav, 36, wav.length - 36)
    val d2 = Multimodal.WavCodec.decode(m.copy(payload = b.array()))
    assert(d2.pixels.sameElements(expected), "chunk walk mis-skipped on s16")
  }

  test("video frame walk decodes the f-th block's real bytes") {
    val frames = Multimodal.frameSample(media(9), 3).collect()
    frames.foreach { f =>
      val i = f.media_id.toInt
      // fixture: frame f's pixel p is (p + i + f) mod 256
      assert(f.pixels.zipWithIndex.forall { case (b, p) =>
        b == ((p + i + f.frame_idx) % 256).toByte },
        s"frame ${f.frame_idx} of media $i decoded wrong bytes")
    }
  }

  test("decode produces width*height pixel buffers, deterministically") {
    val d1 = Multimodal.decode(media(10)).collect().sortBy(_.media_id)
    val d2 = Multimodal.decode(media(10).repartition(3)).collect().sortBy(_.media_id)
    assert(d1.length == 10)
    d1.foreach(d => assert(d.pixels.length == d.width * d.height))
    d1.zip(d2).foreach { case (a, b) => assert(a.pixels.sameElements(b.pixels)) }
  }

  test("resize maps corner pixels and keeps determinism") {
    val decoded = Multimodal.decode(media(4))
    val resized = Multimodal.resize(decoded, 4, 2).collect().sortBy(_.media_id)
    val orig = decoded.collect().sortBy(_.media_id)
    resized.zip(orig).foreach { case (r, o) =>
      assert(r.pixels.length == 8)
      assert(r.pixels(0) == o.pixels(0)) // (0,0) is always source (0,0)
    }
  }

  test("features: histogram sums to pixel count; std non-negative") {
    val f = Multimodal.extractFeatures(Multimodal.decode(media(10))).collect()
    f.foreach { x =>
      // PGM kinds decode to the 8x4 raster; audio to its sample count
      // (fixture samples are "payload-$i", 9 or 10 bytes)
      val expected = if (x.kind == "audio") s"payload-${x.media_id}".length else 8 * 4
      assert(x.histogram.sum == expected)
      assert(x.std >= 0 && x.mean >= 0 && x.mean <= 255)
    }
  }

  test("frameSample keeps every stride-th frame of videos only") {
    val frames = Multimodal.frameSample(media(9), 3).collect()
    val byMedia = frames.groupBy(_.media_id)
    assert(byMedia.nonEmpty)
    byMedia.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.sameElements(Seq(0, 3, 6, 9))) // n_frames=10, stride 3
    }
    // only kind == video (i % 3 == 2 in the fixture)
    assert(byMedia.keySet.forall(_ % 3 == 2))
  }

  test("mediaFromDocuments: audio round-trips the text; PGM kinds decode to the cycled text") {
    import spark.implicits._
    val m = Multimodal.mediaFromDocuments(spark, sfDir)
    val docs = graft.Tables.load(spark, sfDir, "documents")
    assert(m.count() == docs.count())
    // audio payloads are REAL WAV containers whose decoded samples are
    // the text bytes — and the column-expression construction must agree
    // byte-for-byte with the JVM-side canonical encoder
    val textById = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    val audio = m.filter((x: Multimodal.Media) => x.kind == "audio").collect()
    assert(audio.nonEmpty)
    // the corpus must actually mix both sample widths
    assert(audio.exists(_.media_id % 6 == 1), "no u8 audio in corpus")
    assert(audio.exists(_.media_id % 6 == 4), "no s16 audio in corpus")
    audio.foreach { a =>
      val bytes = textById(a.media_id).getBytes("UTF-8")
      val canonical =
        if (a.media_id % 6 == 4)
          Multimodal.WavCodec.encodeS16(16000,
            bytes.map(b => (((b & 0xff) - 128) << 8).toShort))
        else Multimodal.WavCodec.encode(16000, bytes)
      assert(a.payload.sameElements(canonical),
        s"media ${a.media_id}: columnar WAV construction != canonical encoder")
      assert(Multimodal.WavCodec.decode(a).pixels.sameElements(bytes),
        s"media ${a.media_id}: decoded samples are not the text bytes")
    }
    // PGM kinds: the decoded raster equals the text cycled (and space-
    // padded) to width*height — checked against an independent JVM-side
    // construction, not the SQL that built the payload
    val decoded = Multimodal.decode(
      m.filter((x: Multimodal.Media) => x.kind != "audio")).collect()
    assert(decoded.nonEmpty)
    decoded.foreach { d =>
      val t = textById(d.media_id)
      val expected = Array.tabulate(d.width * d.height)(p =>
        if (t.nonEmpty) t.charAt(p % t.length).toByte else ' '.toByte)
      assert(d.pixels.sameElements(expected),
        s"media ${d.media_id}: decoded raster is not the cycled text")
    }
  }

  test("mediaFeatures query is deterministic across runs") {
    val a = Multimodal.mediaFeatures(spark, sfDir).collect()
    val b = Multimodal.mediaFeatures(spark, sfDir).collect()
    assert(a.sameElements(b))
    assert(a.length > 0)
  }

  test("mediaDedup: survivors = distinct payloads, ids minimal, copies sum to total") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir).toDF().cache()
    val out = Multimodal.mediaDedup(spark, sfDir).cache()
    assert(out.count() == media.select("payload").distinct().count())
    assert(out.agg(sum("n_copies")).collect()(0).getLong(0) == media.count())
    // survivor id is the minimum of its payload group
    val smaller = out.join(media, Seq("media_id"))
      .join(media.select(col("payload"), col("media_id").as("other_id")), Seq("payload"))
      .filter(col("other_id") < col("media_id"))
    assert(smaller.count() == 0)
    out.unpersist(); media.unpersist()
  }

  test("tile manifest covers every image exactly: grid bounds and ragged edges") {
    val out = Multimodal.mediaTiles(spark, sfDir).cache()
    val ts = Multimodal.TileSize
    // the grid covers the image: (tiles-1)·ts < dim <= tiles·ts
    val badGrid = out.filter(
      (col("tiles_x") - 1) * ts >= col("width") || col("tiles_x") * ts < col("width") ||
      (col("tiles_y") - 1) * ts >= col("height") || col("tiles_y") * ts < col("height"))
    assert(badGrid.count() == 0, "tile grid does not cover the image exactly")
    // edge tiles are within (0, ts] and consistent with the grid
    val badEdge = out.filter(
      col("edge_w") < 1 || col("edge_w") > ts || col("edge_h") < 1 || col("edge_h") > ts)
    assert(badEdge.count() == 0, "edge tile out of range")
    // only images are tiled
    assert(out.count() ==
      Multimodal.mediaFromDocuments(spark, sfDir).filter(_.kind == "image").count())
    out.unpersist()
  }

  test("perceptual dedup: near-identical images pair, a different image does not") {
    import spark.implicits._
    // two 32x24 rasters differing in ONE pixel (a speck of sensor
    // noise) and one structurally different raster: the dHash pair must
    // verify at Hamming <= 3, the different image must match neither
    val w = 32; val h = 24
    // textured base (scrambled gradient — horizontally NON-monotone, so
    // the dHash carries real bits; a plain ramp hashes to 0 and
    // everything would collide on the degenerate signature)
    val base = Array.tabulate(w * h)(i => (((i * 131) ^ (i >> 3)) % 251).toByte)
    // one sensor-noise pixel AT A RESIZE SAMPLE POINT (out (2,3) samples
    // source (6,10)), so the perturbation survives the 9x8 downsample
    // and flips at most 2 dHash bits
    val noisy = base.clone(); noisy(w * 6 + 10) = (noisy(w * 6 + 10) + 90).toByte
    val other = Array.tabulate(w * h)(i => (((i / w) * 11) % 256).toByte) // vertical ramp
    def mk(id: Long, px: Array[Byte]) = Multimodal.Media(id, "image",
      Multimodal.PgmCodec.encode(w, h, px), w, h, 16000, 1, "application/octet-stream")
    val media = Seq(mk(1L, base), mk(2L, noisy), mk(3L, other)).toDS()
    val hashes = Multimodal.resize(Multimodal.decode(media),
        Multimodal.DHashW, Multimodal.DHashH)
      .map(d => (d.media_id, Multimodal.dHash60(d.pixels)))
      .toDF("media_id", "dh")
    val out = Multimodal.perceptualNearDups(hashes)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._2 >= 1, s"near-identical pair not detected: $out")
    assert(out(2L)._2 >= 1, s"near-identical pair not detected: $out")
    assert(out(3L)._2 == 0, s"structurally different image matched: $out")
    // and an exact copy rides the n_same convention
    val withCopy = media.union(Seq(mk(4L, base)).toDS())
    val hashes2 = Multimodal.resize(Multimodal.decode(withCopy),
        Multimodal.DHashW, Multimodal.DHashH)
      .map(d => (d.media_id, Multimodal.dHash60(d.pixels)))
      .toDF("media_id", "dh")
    val out2 = Multimodal.perceptualNearDups(hashes2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out2(4L) >= 1 && out2(1L) >= 1,
      s"exact copy must count as a near-dup of its twin: $out2")
    graft.CacheScope.release()
  }

  test("audio perceptual dedup: a noise-perturbed clip pairs with its source; different content does not") {
    import spark.implicits._
    // base clip: amplitude envelope varies per hop block so the
    // energy-gradient signature carries real bits; noisy = one sample
    // nudged (sensor/codec noise — energies barely move, signs hold);
    // other = a different envelope sequence
    val n = 480
    def clip(seed: Int) = Array.tabulate(n) { i =>
      val amp = ((i / 32 * 53 + seed * 31) % 90) + 10
      (128 + (if (i % 2 == 0) amp else -amp)).toByte
    }
    val base = clip(0)
    val noisy = base.clone(); noisy(100) = (noisy(100) + 3).toByte
    val other = clip(7)
    def mk(id: Long, px: Array[Byte]) = Multimodal.Media(id, "audio",
      Multimodal.WavCodec.encode(16000, px), 0, 0, 16000, 0, "application/octet-stream")
    val media = Seq(mk(1L, base), mk(2L, noisy), mk(3L, other)).toDS()
    val hashes = media.map { m =>
      val d = Multimodal.WavCodec.decode(m)
      (m.media_id, Multimodal.audioFingerprint60(d.pixels))
    }.toDF("media_id", "dh")
    val out = Multimodal.perceptualNearDups(hashes)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) >= 1 && out(2L) >= 1,
      s"perturbed clip must pair with its source: $out")
    assert(out(3L) == 0, s"different content matched: $out")
    // short clips are excluded by the query's length gate, not hashed to 0
    val shortOut = Multimodal.audioPerceptualDedup(spark, sfDir)
    val minLen = Multimodal.FpWindow + Multimodal.FpHop
    val shortIds = Multimodal.mediaFromDocuments(spark, sfDir)
      .filter((m: Multimodal.Media) => m.kind == "audio")
      .map(m => (m.media_id, Multimodal.WavCodec.decode(m).pixels.length))
      .filter(_._2 < minLen).map(_._1).collect().toSet
    assert(shortOut.collect().map(_.getLong(0)).toSet.intersect(shortIds).isEmpty,
      "clips below the analysis window must be excluded")
    graft.CacheScope.release()
  }

  test("PPM codec: hand-built color rasters reduce to exact BT.601 luma; malformed input throws") {
    // pure-channel rasters pin the integer weights: (77R+150G+29B+128)>>8
    val w = 3; val h = 2
    def solid(r: Int, g: Int, b: Int): Array[Byte] =
      Array.fill(w * h)(Seq(r, g, b)).flatten.map(_.toByte).toArray
    def lumaOf(r: Int, g: Int, b: Int): Int = {
      val m = Multimodal.Media(1L, "image",
        Multimodal.PpmCodec.encode(w, h, solid(r, g, b)), w, h, 16000, 1, "x")
      val d = Multimodal.PpmCodec.decode(m)
      assert(d.width == w && d.height == h && d.pixels.length == w * h)
      assert(d.pixels.distinct.length == 1, "solid raster must decode to solid luma")
      d.pixels(0) & 0xff
    }
    // pure channels floor to (weight*255+128)>>8: 77, 149, 29
    assert(lumaOf(255, 0, 0) == (77 * 255 + 128) / 256, "pure red luma")
    assert(lumaOf(0, 255, 0) == (150 * 255 + 128) / 256, "pure green luma")
    assert(lumaOf(0, 0, 255) == (29 * 255 + 128) / 256, "pure blue luma")
    assert(lumaOf(255, 255, 255) == 255 && lumaOf(0, 0, 0) == 0)
    assert(lumaOf(100, 200, 50) == (77 * 100 + 150 * 200 + 29 * 50 + 128) / 256)
    // a NON-solid raster: per-pixel reduction, not an average
    val rgb = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 255.toByte, 0, 0, 0, 127, 127, 127, 255.toByte, 255.toByte, 255.toByte)
    val d = Multimodal.PpmCodec.decode(Multimodal.Media(2L, "image",
      Multimodal.PpmCodec.encode(3, 2, rgb), 3, 2, 16000, 1, "x"))
    assert(d.pixels.map(_ & 0xff).toSeq ==
      Seq((77 * 255 + 128) / 256, (150 * 255 + 128) / 256, (29 * 255 + 128) / 256,
        0, (77 * 127 + 150 * 127 + 29 * 127 + 128) / 256, 255))
    // malformed inputs fail loudly, like PgmCodec
    intercept[IllegalArgumentException] {
      Multimodal.PpmCodec.decode(Multimodal.Media(3L, "image",
        "P5\n1 1\n255\nx".getBytes("US-ASCII"), 1, 1, 16000, 1, "x"))
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.PpmCodec.decode(Multimodal.Media(4L, "image",
        "P6\n2 2\n255\nabc".getBytes("US-ASCII"), 2, 2, 16000, 1, "x"))
    }
    intercept[IllegalArgumentException] { // metadata/header disagreement
      Multimodal.PpmCodec.decode(Multimodal.Media(5L, "image",
        Multimodal.PpmCodec.encode(3, 2, rgb), 2, 3, 16000, 1, "x"))
    }
  }

  test("color perceptual dedup: decode dispatches on the P6 magic; near-identical color images pair") {
    import spark.implicits._
    val w = 32; val h = 24
    val baseR = Array.tabulate(w * h)(i => (((i * 131) ^ (i >> 3)) % 251).toByte)
    def rgbOf(r: Array[Byte]): Array[Byte] = {
      val rgb = new Array[Byte](3 * w * h)
      var p = 0
      while (p < w * h) {
        rgb(3 * p) = r(p); rgb(3 * p + 1) = r(w * h - 1 - p); rgb(3 * p + 2) = 64
        p += 1
      }
      rgb
    }
    // one strong sensor-noise pixel at a resize sample point (same
    // geometry as the grayscale spec)
    val noisyR = baseR.clone(); noisyR(w * 6 + 10) = (noisyR(w * 6 + 10) + 90).toByte
    val otherR = Array.tabulate(w * h)(i => (((i / w) * 11) % 256).toByte)
    def mk(id: Long, r: Array[Byte]) = Multimodal.Media(id, "image",
      Multimodal.PpmCodec.encode(w, h, rgbOf(r)), w, h, 16000, 1, "image/x-portable-pixmap")
    val media = Seq(mk(1L, baseR), mk(2L, noisyR), mk(3L, otherR)).toDS()
    val hashes = Multimodal.resize(Multimodal.decode(media),
        Multimodal.DHashW, Multimodal.DHashH)
      .map(d => (d.media_id, Multimodal.dHash60(d.pixels)))
      .toDF("media_id", "dh")
    val out = Multimodal.perceptualNearDups(hashes)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) >= 1 && out(2L) >= 1,
      s"near-identical color pair not detected: $out")
    assert(out(3L) == 0, s"structurally different color image matched: $out")
    // the x162 corpus decodes end-to-end (the P6 exact-length gate holds
    // for every width/height/text combination in the real corpus)
    assert(Multimodal.colorPerceptualDedup(spark, sfDir).count() > 0)
    graft.CacheScope.release()
  }

  test("x161 recall audit: every planted hot-bucket pair verifies; unresolved mass is zero") {
    // the r18 `weak` closed: seeded near-dups whose ONLY shared band
    // is a far-over-cap bucket must still pair (via the sub-band
    // escalation), and nothing may be silently dropped
    val corpus = Multimodal.recallAuditCorpus(spark)
    // precondition: the whole corpus really concentrates in ONE
    // degenerate band-0 bucket (low 15 bits zero), far past the cap
    assert(corpus.filter(col("dh").bitwiseAND(lit(32767L)) =!= 0L).count() == 0,
      "every seeded signature must share band 0 = 0")
    assert(corpus.select("dh").distinct().count() > 300,
      "the hot bucket must hold > 300 DISTINCT classes (cap is 64)")
    val out = Multimodal.perceptualRecallAudit(spark, sfDir).collect()
    val m = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (300L until 330L).foreach { id =>
      assert(m(id)._2 >= 1, s"planted near-dup $id not recovered: ${m(id)}")
      assert(m(id - 300)._2 >= 1, s"plant source ${id - 300} not recovered")
    }
    assert(out.forall(_.getLong(3) == 0),
      "sub-band escalation must resolve the entire hot bucket (zero skipped mass)")
    (330L until 350L).foreach { id =>
      assert(m(id)._2 == 19, s"flat copy $id must ride the n_same class collapse")
    }
    graft.CacheScope.release()
  }

  test("x163 incremental perceptual dedup: snapshot publishes once, fold ends at the full corpus, delta-internal pairs never count") {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(java.nio.file.Files
      .createTempDirectory("percept_inc_spec").resolve("t").toUri)
    val out1 = Multimodal.incrementalPerceptualAt(spark, sfDir, root).collect()
    val imgs = Multimodal.mediaFromDocuments(spark, sfDir)
      .filter((m: Multimodal.Media) => m.kind == "image")
    val nImgs = imgs.count()
    // the fold: v1 = snapshot (even ids only), v2 = full corpus
    assert(graft.etl.Sources.currentManifest(spark, root)._1 == 2L)
    val snap = graft.etl.Sources.manifestReadAt(spark, root, 1L)
    assert(snap.filter(col("media_id") % 2 =!= 0).count() == 0,
      "v1 must hold the even-id snapshot only")
    assert(graft.etl.Sources.manifestRead(spark, root).count() == nImgs,
      "after the fold the table must cover the full image corpus")
    // output rows are the delta only
    assert(out1.nonEmpty && out1.forall(_.getLong(0) % 2 == 1))
    // REOPEN: a pure read — no new commits, identical result
    val out2 = Multimodal.incrementalPerceptualAt(spark, sfDir, root).collect()
    assert(graft.etl.Sources.currentManifest(spark, root)._1 == 2L,
      "a reopen must not commit")
    assert(out1.map(_.toString).sorted.toSeq == out2.map(_.toString).sorted.toSeq)
    // the x124 rule on a hand-built case: two identical DELTA images
    // with no snapshot twin are mutual dups but must count ZERO
    val deltaDf = Seq((1L, 42L), (3L, 42L)).toDF("media_id", "dh")
    val farSnap = Seq((2L, 999999999L)).toDF("media_id", "dh")
    val res = Multimodal.perceptualNearDupsAgainst(deltaDf, farSnap)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(res(1L) == 0 && res(3L) == 0,
      s"delta-internal near-dups must not count: $res")
    // identical snapshot twins DO count, once per snapshot copy
    val twinSnap = Seq((2L, 42L), (4L, 42L)).toDF("media_id", "dh")
    val res2 = Multimodal.perceptualNearDupsAgainst(deltaDf, twinSnap)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(res2(1L) == 2 && res2(3L) == 2,
      s"each delta row must count both identical snapshot copies: $res2")
    graft.CacheScope.release()
  }

  test("x21 oracle precondition: corpus is ASCII (payload byte == codepoint)") {
    // the DuckDB oracles index decoded buffers via ord(char) per
    // character; that equals the UTF-8 payload byte only while the
    // corpus is ASCII — if the testdata ever grows multi-byte chars this
    // must fail loudly (and the oracle switch to a real byte extractor)
    val nonAscii = graft.Tables.load(spark, sfDir, "documents")
      .filter(col("text").rlike("[^\\x00-\\x7f]")).count()
    assert(nonAscii == 0, s"$nonAscii documents contain non-ASCII text")
  }
}
