package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * payloads ride as opaque BINARY columns with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run as partition-local
  * batch transforms over `Dataset[T]` (`mapPartitions` — Scala's analog
  * of a vectorized batch UDF: one JVM call per batch, no per-row
  * serialization boundary).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): `StubCodec.decode` derives a deterministic fake pixel
  * buffer from the payload bytes. Everything AROUND the stub — schema,
  * Dataset encoders, batch shape, partitioning, downstream feature
  * arithmetic — is real and tested; swapping in a real codec changes
  * one function.
  *
  * Scale notes: payloads never shuffle through any operator here — all
  * transforms are narrow (scan → mapPartitions → project); only the
  * small per-media feature/stat rows reach aggregations. Partition
  * sizing for 100 TB of media = `spark.sql.files.maxPartitionBytes`
  * against payload size, not row count.
  */
object Multimodal {

  /** One media row: payload + typed metadata (SURVEY north-star; the
    * metadata struct is what a real ingest would parse from headers). */
  case class Media(
      media_id: Long,
      kind: String,            // image | audio | video
      payload: Array[Byte],
      width: Int, height: Int, // images/video
      sample_rate: Int,        // audio
      n_frames: Int,           // video
      mime: String)

  case class Decoded(media_id: Long, kind: String, width: Int, height: Int,
                     pixels: Array[Byte])

  case class Features(media_id: Long, kind: String, mean: Double, std: Double,
                      histogram: Array[Long])

  case class Frame(media_id: Long, frame_idx: Int, width: Int, height: Int,
                   pixels: Array[Byte])

  // ---- STUB CODEC -----------------------------------------------------

  /** ??? REAL CODEC GOES HERE ???
    * Deterministic stand-in for image/audio decoding: expands payload
    * bytes into a width×height buffer via a splitmix64 stream seeded by
    * the payload hash. Same payload → same "pixels", so every test and
    * oracle downstream is reproducible. */
  object StubCodec {
    /** Fill `n` bytes from a splitmix64 stream — 8 bytes per step, no
      * per-byte boxing (this loop stands in for the codec's inner loop,
      * so it should at least run at memcpy-ish speed). */
    private def fill(seed0: Long, n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var seed = seed0
      var i = 0
      while (i < n) {
        seed += 0x9e3779b97f4a7c15L
        var z = seed
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^= (z >>> 31)
        var k = 0
        while (k < 8 && i < n) { out(i) = (z >>> (k * 8)).toByte; i += 1; k += 1 }
      }
      out
    }

    private def payloadSeed(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      h
    }

    def decode(m: Media): Decoded =
      Decoded(m.media_id, m.kind, m.width, m.height,
        fill(payloadSeed(m.payload), m.width * m.height))

    def decodeFrame(m: Media, frameIdx: Int): Frame =
      Frame(m.media_id, frameIdx, m.width, m.height,
        fill(payloadSeed(m.payload) ^ frameIdx.toLong, m.width * m.height))
  }

  /** Batch size for partition-local decode loops — models the batch
    * shape a vectorized codec (or Arrow batch) would use. */
  val DecodeBatch = 64

  // ---- operators ------------------------------------------------------

  /** Decode every media row, batch-at-a-time within each partition. */
  def decode(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeBatch).flatMap(_.map(StubCodec.decode)))
  }

  /** Nearest-neighbor resize of decoded buffers — REAL arithmetic over
    * the (stub) pixels; unchanged for a real codec. */
  def resize(decoded: Dataset[Decoded], outW: Int, outH: Int): Dataset[Decoded] = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val out = new Array[Byte](outW * outH)
      var y = 0
      while (y < outH) {
        val sy = y * d.height / outH
        var x = 0
        while (x < outW) {
          out(y * outW + x) = d.pixels(sy * d.width + (x * d.width / outW))
          x += 1
        }
        y += 1
      }
      d.copy(width = outW, height = outH, pixels = out)
    }
  }

  /** Per-media features: mean/std + 16-bin byte histogram — real
    * arithmetic, the shape an embedding-model feature step would have. */
  def extractFeatures(decoded: Dataset[Decoded]): Dataset[Features] = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val n = d.pixels.length.max(1)
      var sum = 0.0; var sumSq = 0.0
      val hist = new Array[Long](16)
      d.pixels.foreach { b =>
        val v = b & 0xff
        sum += v; sumSq += v.toDouble * v
        hist(v >> 4) += 1
      }
      val mean = sum / n
      Features(d.media_id, d.kind, mean,
        math.sqrt(math.max(0.0, sumSq / n - mean * mean)), hist)
    }
  }

  /** Sample every `stride`-th frame of each video — the fan-out is a
    * partition-local flatMap (narrow; no shuffle, no driver loop). */
  def frameSample(media: Dataset[Media], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      (0 until m.n_frames by stride).iterator.map(i => StubCodec.decodeFrame(m, i))
    })
  }

  // ---- synthetic media over testdata ---------------------------------

  /** Deterministic media table derived from `documents`: payload =
    * UTF-8 text bytes (a real opaque binary column), kind/dimensions
    * derived from doc_id. This is the ingest-side contract a real
    * pipeline would get from (path, bytes, parsed-header) triples — and
    * a triple with NO bytes is not a media row, so null-text documents
    * are dropped at ingest (the codec cannot seed on a null payload;
    * every oracle mirrors the same `text IS NOT NULL` predicate). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(7)) * 8 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(5)) * 8 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id"), lit(11)) * 4 + 4).cast("int").as("n_frames"),
        lit("application/octet-stream").as("mime"))
      .as[Media]
  }

  // ---- driver-checked queries ----------------------------------------

  /** Ingest-level stats: payload byte sizes per kind — pure metadata
    * SQL both engines can run (oracle-checked). */
  def mediaStats(s: SparkSession, dir: String): DataFrame =
    mediaFromDocuments(s, dir).toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
           sum(length(col("payload"))).cast("long").as("total_bytes"),
           max(col("width") * col("height")).cast("long").as("max_pixels"))
      .orderBy("kind")

  /** Full decode → resize → featurize pass, per media. ORACLE-CHECKED:
    * the stub codec is pure splitmix64 + Horner-31 integer arithmetic,
    * so DuckDB replays it exactly (wrapping 64-bit multiplies via
    * HUGEINT mod 2^64) — the same portable-sketch technique as the
    * KMV/CMS oracles. mean/std are raw doubles, NOT rounded per row
    * (README rule): both derive from exact integer sums over the 256
    * resized pixels (sums < 2^53, /256 is a power-of-two divide, one
    * correctly-rounded sqrt), so the IEEE values agree bit-for-bit. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = extractFeatures(resize(decode(mediaFromDocuments(s, dir)), 16, 16))
    feats.toDF()
      .select(col("media_id"), col("kind"), col("mean").as("mean_px"),
              col("std").as("std_px"),
              element_at(col("histogram"), 1).as("hist_bin0"))
      .orderBy("media_id")
  }

  /** Frame sampling rollup: frames kept per video at stride 2 —
    * metadata-derivable (oracle-checked: ceil(n_frames/2)). */
  def frameSampleStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    frameSample(mediaFromDocuments(s, dir), 2).toDF()
      .groupBy("media_id").agg(count(lit(1)).as("n_sampled_frames"))
      .orderBy("media_id")
  }

  /** Exact binary-payload dedup — the image/audio dedup pass of a
    * multimodal corpus: one surviving media_id per distinct payload plus
    * its copy count. Hash-first: payload identity is the 192-bit
    * (xxhash64, md5) pair computed at the scan, so the payload bytes
    * NEVER enter an exchange — the shuffle carries ~32-byte rows and the
    * output needs no payload at all. Collisions in both hashes at once
    * (p ≈ 2^-192 per pair) are the accepted exactness bound — same
    * contract as the text exact-dedup (x01). */
  def mediaDedup(s: SparkSession, dir: String): DataFrame =
    mediaFromDocuments(s, dir).toDF()
      .select(xxhash64(col("payload")).as("h1"), md5(col("payload")).as("h2"),
              col("media_id"))
      .groupBy("h1", "h2")
      .agg(min("media_id").as("media_id"), count(lit(1)).as("n_copies"))
      .select(col("media_id"), col("n_copies"))
      .orderBy("media_id")

  /** Tile size for [[mediaTiles]] — not a divisor of ALL the synthetic
    * dimensions (multiples of 8: 16/40/56… are indivisible by 12, while
    * 24/48 divide evenly), so the fixture exercises both ragged and
    * exact edge tiles through the ceil/remainder arithmetic. */
  val TileSize = 12L

  /** Vision-preprocessing tile manifest: the patch grid a ViT-style
    * encoder or a tiled-decode path cuts each image into — per image,
    * the tile-grid shape and the ragged edge-tile dimensions. Pure
    * integer metadata arithmetic (ceil-division + remainder) at scan
    * speed; the payload is never touched, and the manifest is exactly
    * reproducible for resume (same contract as the x71 text chunker,
    * applied to the image axis pair). */
  def mediaTiles(s: SparkSession, dir: String): DataFrame =
    mediaFromDocuments(s, dir).toDF()
      .filter(col("kind") === "image")
      .select(col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .withColumn("tiles_x", expr(s"(width + ${TileSize - 1}) div $TileSize"))
      .withColumn("tiles_y", expr(s"(height + ${TileSize - 1}) div $TileSize"))
      .select(col("media_id"), col("width"), col("height"),
        col("tiles_x"), col("tiles_y"),
        (col("tiles_x") * col("tiles_y")).as("n_tiles"),
        (col("width") - (col("tiles_x") - 1) * TileSize).as("edge_w"),
        (col("height") - (col("tiles_y") - 1) * TileSize).as("edge_h"))
      .orderBy("media_id")

  /** STFT framing parameters: 25 ms windows, 10 ms hop at 16 kHz —
    * the standard speech-feature grid. */
  val FrameWindow = 400L
  val FrameHop = 160L

  /** Audio framing manifest — the third modality's chunker next to
    * image tiles (x81) and video frame-sampling (x22): per audio
    * medium, the STFT-style frame count (1 + ⌊(n − window)/hop⌋ for
    * n ≥ window, else 0 full frames) and the duration implied by the
    * sample rate. Payload bytes stand in for samples (the stub-codec
    * contract); the arithmetic is the real one a feature-extraction
    * stage runs, metadata-only and integer-exact — one scan, no
    * shuffle, reproducible for resume. */
  def audioFrames(s: SparkSession, dir: String): DataFrame =
    mediaFromDocuments(s, dir).toDF()
      .filter(col("kind") === "audio")
      .select(col("media_id"),
        length(col("payload")).cast("long").as("n_samples"),
        col("sample_rate").cast("long").as("sample_rate"))
      .withColumn("n_frames",
        when(col("n_samples") >= FrameWindow,
          lit(1L) + expr(s"(n_samples - $FrameWindow) div $FrameHop"))
          .otherwise(lit(0L)))
      .withColumn("duration_s",
        col("n_samples").cast("double") / col("sample_rate").cast("double"))
      .orderBy("media_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x20_media_stats" -> mediaStats,
    "x21_media_features" -> mediaFeatures,
    "x22_media_frame_sample" -> frameSampleStats,
    "x39_media_dedup" -> mediaDedup,
    "x81_media_tiles" -> mediaTiles,
    "x84_audio_frames" -> audioFrames)

  val oracles: Map[String, String] = Map(
    // Exact replay of the stub codec in SQL: payload seed = Horner-31
    // over the UTF-8 bytes (the corpus is ASCII, so ord(char) IS the
    // byte — asserted by MultimodalSpec); pixel p of the decode buffer
    // is byte p%8 of splitmix64(seed + (p/8+1)*GOLDEN); the 16x16
    // nearest-neighbor resize reads only 256 source positions per
    // image. Wrapping 64-bit multiplies split 32/32 in HUGEINT
    // (al*bl + ((al*bh + ah*bl) mod 2^32)*2^32, all < 2^127); >>> is
    // power-of-two floor division on the nonnegative mod-2^64 domain.
    // mean/std come from exact integer sums (see mediaFeatures doc).
    "x21_media_features" -> """
      WITH m AS (
        SELECT doc_id AS media_id,
          ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
          CAST((doc_id % 7) * 8 + 16 AS BIGINT) AS w,
          CAST((doc_id % 5) * 8 + 16 AS BIGINT) AS h,
          text
        FROM documents WHERE text IS NOT NULL),
      seeds AS (
        SELECT media_id, kind, w, h,
          list_reduce(
            list_prepend(CAST(1125899906842597 AS HUGEINT),
              list_transform(split(text, ''), c -> CAST(ord(c) AS HUGEINT))),
            (acc, b) -> (31 * acc + b) % 18446744073709551616) AS seed
        FROM m),
      pos AS (
        SELECT media_id, kind, seed,
          ((i // 16) * h // 16) * w + ((i % 16) * w // 16) AS p
        FROM seeds, (SELECT unnest(range(0, 256)) AS i)),
      mixed AS (
        SELECT media_id, kind, p,
          (seed + (p // 8 + 1) * CAST(11400714819323198485 AS HUGEINT))
            % 18446744073709551616 AS s0
        FROM pos),
      m1 AS (SELECT media_id, kind, p, xor(s0, s0 // 1073741824) AS z0 FROM mixed),
      m2 AS (
        SELECT media_id, kind, p,
          ((z0 % 4294967296) * 484763065
           + (((z0 % 4294967296) * 3210233709 + (z0 // 4294967296) * 484763065)
              % 4294967296) * 4294967296) % 18446744073709551616 AS z1
        FROM m1),
      m3 AS (SELECT media_id, kind, p, xor(z1, z1 // 134217728) AS z2 FROM m2),
      m4 AS (
        SELECT media_id, kind, p,
          ((z2 % 4294967296) * 321982955
           + (((z2 % 4294967296) * 2496678331 + (z2 // 4294967296) * 321982955)
              % 4294967296) * 4294967296) % 18446744073709551616 AS z3
        FROM m3),
      vals AS (
        SELECT media_id, kind,
          CAST((xor(z3, z3 // 2147483648)
            // ([CAST(1 AS HUGEINT), 256, 65536, 16777216, 4294967296,
                 1099511627776, 281474976710656, 72057594037927936])[CAST(p % 8 AS INT) + 1])
            % 256 AS BIGINT) AS v
        FROM m4)
      SELECT media_id, kind,
        CAST(SUM(v) AS DOUBLE) / 256 AS mean_px,
        sqrt(greatest(0.0, CAST(SUM(v * v) AS DOUBLE) / 256
          - (CAST(SUM(v) AS DOUBLE) / 256) * (CAST(SUM(v) AS DOUBLE) / 256))) AS std_px,
        CAST(SUM(CASE WHEN v < 16 THEN 1 ELSE 0 END) AS BIGINT) AS hist_bin0
      FROM vals
      GROUP BY media_id, kind
      ORDER BY media_id""",
    "x20_media_stats" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         COUNT(*) AS n_media,
         CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         CAST(MAX(((doc_id % 7) * 8 + 16) * ((doc_id % 5) * 8 + 16)) AS BIGINT) AS max_pixels
         FROM documents WHERE text IS NOT NULL GROUP BY 1 ORDER BY 1""",
    "x22_media_frame_sample" ->
      """SELECT doc_id AS media_id,
         CAST(ceil(((doc_id % 11) * 4 + 4) / 2.0) AS BIGINT) AS n_sampled_frames
         FROM documents WHERE doc_id % 3 = 2 AND text IS NOT NULL ORDER BY 1""",
    // payload = UTF-8 bytes of text (bijective), so text groups ≡ payload groups
    "x39_media_dedup" ->
      """SELECT MIN(doc_id) AS media_id, COUNT(*) AS n_copies
         FROM documents WHERE text IS NOT NULL GROUP BY text ORDER BY media_id""",
    "x84_audio_frames" -> s"""
      WITH a AS (SELECT doc_id AS media_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
          CAST(16000 AS BIGINT) AS sample_rate
        FROM documents WHERE doc_id % 3 = 1 AND text IS NOT NULL)
      SELECT media_id, n_samples, sample_rate,
        CASE WHEN n_samples >= $FrameWindow
             THEN 1 + (n_samples - $FrameWindow) // $FrameHop
             ELSE 0 END AS n_frames,
        CAST(n_samples AS DOUBLE) / CAST(sample_rate AS DOUBLE) AS duration_s
      FROM a ORDER BY media_id""",
    "x81_media_tiles" -> s"""
      WITH m AS (SELECT doc_id AS media_id,
          (doc_id % 7) * 8 + 16 AS width, (doc_id % 5) * 8 + 16 AS height
        FROM documents WHERE doc_id % 3 = 0 AND text IS NOT NULL),
      t AS (SELECT media_id, width, height,
          (width + ${TileSize - 1}) // $TileSize AS tiles_x,
          (height + ${TileSize - 1}) // $TileSize AS tiles_y FROM m)
      SELECT media_id, width, height, tiles_x, tiles_y,
        tiles_x * tiles_y AS n_tiles,
        width - (tiles_x - 1) * $TileSize AS edge_w,
        height - (tiles_y - 1) * $TileSize AS edge_h
      FROM t ORDER BY media_id""")
}
