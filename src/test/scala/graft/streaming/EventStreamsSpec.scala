package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkStream(events: Seq[EventStreams.Event]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[EventStreams.Event]
    ms.addData(events)
    ms
  }

  private val base = Seq(
    EventStreams.Event(1L, 1L, "view", ts("2024-01-01 10:00:00"), 1.0),
    EventStreams.Event(2L, 1L, "view", ts("2024-01-01 10:10:00"), 2.0),
    EventStreams.Event(3L, 1L, "purchase", ts("2024-01-01 11:05:00"), 3.0), // 55-min gap → new session
    EventStreams.Event(4L, 2L, "view", ts("2024-01-01 10:30:00"), 4.0),
    // sentinel far in the future: advances the watermark past all
    // windows/sessions above so append-mode emits them
    EventStreams.Event(99L, 9L, "view", ts("2024-01-02 00:00:00"), 0.0))

  test("streaming tumbling counts match the batch semantics") {
    val out = EventStreams.runToMemory(
      EventStreams.tumblingCounts(mkStream(base).toDF()), "t_tumble")
      .filter(col("window_start") < ts("2024-01-01 23:00:00"))
      .orderBy("window_start", "event_type").collect()
    // 10:00 window: 3 views (e1, e2 user1 + e4 user2); 11:00: 1 purchase
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 3 && out(0).getAs[String]("event_type") == "view")
    assert(out(0).getAs[Double]("total_value") == 7.0)
    assert(out(1).getAs[Long]("n_events") == 1 && out(1).getAs[String]("event_type") == "purchase")
  }

  test("streaming sliding windows double-count each event") {
    val out = EventStreams.runToMemory(
      EventStreams.slidingCounts(mkStream(base).toDF()), "t_slide")
      .filter(col("window_start") < ts("2024-01-01 23:00:00"))
    val total = out.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == 2 * 4) // 4 real events × 2 windows each
  }

  test("native session windows split on 30-minute gap") {
    val out = EventStreams.runToMemory(
      EventStreams.sessionWindows(mkStream(base).toDF()), "t_sess")
      .filter(col("user_id") < 9).orderBy("user_id", "session_start").collect()
    assert(out.length == 3) // user1: two sessions; user2: one
    assert(out(0).getAs[Long]("n_events") == 2) // user1 10:00+10:10
    assert(out(1).getAs[Long]("n_events") == 1) // user1 11:05
    assert(out(2).getAs[Long]("n_events") == 1) // user2
  }

  test("stateful flatMapGroupsWithState sessionization agrees with session_window") {
    val out = EventStreams.runToMemory(
      EventStreams.sessionizeStateful(mkStream(base).toDS()).toDF(), "t_state")
      .filter(col("user_id") < 9).orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2 && out(0).getAs[Double]("session_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1 && out(1).getAs[Double]("session_value") == 3.0)
    assert(out(2).getAs[Long]("n_events") == 1 && out(2).getAs[Double]("session_value") == 4.0)
  }

  test("late event beyond watermark is dropped from tumbling counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[EventStreams.Event]
    val q = EventStreams.tumblingCounts(ms.toDF())
      .writeStream.format("memory").queryName("t_late").outputMode(OutputMode.Append()).start()
    // batch 1: events + watermark-advancing sentinel (wm → 22:00)
    ms.addData(base)
    q.processAllAvailable()
    // batch 2: an event at 10:20 — far behind the 22:00 watermark
    ms.addData(Seq(EventStreams.Event(100L, 1L, "view", ts("2024-01-01 10:20:00"), 9.0)))
    q.processAllAvailable()
    q.stop()
    val tenOclock = spark.table("t_late")
      .filter(col("window_start") === ts("2024-01-01 10:00:00"))
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(tenOclock == 3, "late event must not re-open the closed 10:00 window")
  }

  test("stream-static join enriches events without stream-side state") {
    import spark.implicits._
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "user_name")
    val out = EventStreams.runToMemory(
      EventStreams.enrichWithStatic(mkStream(base).toDF(), dim), "t_enrich")
    val rows = out.filter(col("user_id") < 9).collect()
    assert(rows.length == 4)
    assert(rows.filter(_.getAs[Long]("user_id") == 1L)
      .forall(_.getAs[String]("user_name") == "alice"))
    // left join: user 9 (no dim row) survives with null name
    assert(out.filter(col("user_id") === 9L).collect()(0).getAs[String]("user_name") == null)
  }

  test("enrichReplay matches the batch join+rollup twin exactly") {
    val out = EventStreams.enrichReplay(spark, sfDir)
    val ev = graft.Tables.load(spark, sfDir, "events")
    val dim = graft.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val batch = ev.join(dim, Seq("user_id"), "left")
      .withColumn("segment", coalesce(col("segment"), lit("UNKNOWN")))
      .groupBy("segment", "event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(round(col("value") * 100, 0).cast("long")).cast("long").as("total_cents"))
      .orderBy("segment", "event_type")
    assert(out.collect().toSeq == batch.collect().toSeq)
    // enrichment must not invent or drop events
    assert(out.agg(sum("n_events")).collect()(0).getLong(0) == ev.count())
  }

  test("streaming blocklist filter drops blocked users with no stream state") {
    import spark.implicits._
    val blocked = Seq(1L).toDF("user_id")
    val out = EventStreams.runToMemory(
      EventStreams.filterBlocklistStream(mkStream(base).toDF(), blocked), "t_block")
    val users = out.select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!users.contains(1L), "blocked user's events must be dropped")
    assert(users.contains(2L), "unblocked users must pass through")
    assert(out.count() == base.count(_.user_id != 1L))
  }

  test("dropDuplicatesWithinWatermark suppresses replayed event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[EventStreams.Event]
    val q = EventStreams.dedupWithinWatermark(ms.toDF())
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode(OutputMode.Append()).start()
    ms.addData(base)                     // includes event_id 1
    q.processAllAvailable()
    ms.addData(Seq(base.head))           // exact replay of event_id 1
    q.processAllAvailable()
    q.stop()
    val n = spark.table("t_dedup").filter(col("event_id") === 1L).count()
    assert(n == 1, s"duplicate event_id surfaced $n times")
  }

  test("stream-stream interval join matches views to in-window purchases") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vs = MemoryStream[EventStreams.Event]
    val ps = MemoryStream[EventStreams.Event]
    val joined = EventStreams.viewToPurchaseJoin(vs.toDF(), ps.toDF())
    val q = joined.writeStream.format("memory").queryName("t_ssj")
      .outputMode(OutputMode.Append()).start()
    vs.addData(Seq(
      EventStreams.Event(1L, 1L, "view", ts("2024-01-01 10:00:00"), 0.0),
      EventStreams.Event(2L, 2L, "view", ts("2024-01-01 10:00:00"), 0.0)))
    ps.addData(Seq(
      EventStreams.Event(10L, 1L, "purchase", ts("2024-01-01 10:30:00"), 5.0), // in window
      EventStreams.Event(11L, 2L, "purchase", ts("2024-01-01 12:00:00"), 7.0), // too late
      EventStreams.Event(12L, 1L, "purchase", ts("2024-01-01 09:30:00"), 9.0))) // before view
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_ssj").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("view_id") == 1L && rows(0).getAs[Long]("purchase_id") == 10L)
  }

  test("left-outer interval join: matched rows + decided-unmatched nulls only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vs = MemoryStream[EventStreams.Event]
    val ps = MemoryStream[EventStreams.Event]
    val joined = EventStreams.viewToPurchaseLeftOuter(vs.toDF(), ps.toDF())
    val q = joined.writeStream.format("memory").queryName("t_ssoj")
      .outputMode(OutputMode.Append()).start()
    vs.addData(Seq(
      EventStreams.Event(1L, 1L, "view", ts("2024-01-01 10:00:00"), 0.0), // converts
      EventStreams.Event(2L, 2L, "view", ts("2024-01-01 10:00:00"), 0.0), // never converts, decided
      EventStreams.Event(3L, 3L, "view", ts("2024-01-01 21:30:00"), 0.0))) // undecided at final wm
    ps.addData(Seq(
      EventStreams.Event(10L, 1L, "purchase", ts("2024-01-01 10:30:00"), 5.0),
      // sentinel purchase far ahead: drives BOTH watermarks to 22:00-1h,
      // past view 2's 11:00 horizon but not past view 3's 22:30 horizon
      EventStreams.Event(11L, 9L, "purchase", ts("2024-01-01 22:00:00"), 1.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_ssoj").collect()
      .map(r => (r.getAs[Long]("view_id"), Option(r.getAs[Any]("purchase_id"))))
      .toSet
    assert(rows == Set((1L, Some(10L)), (2L, None)),
      s"expected matched view 1 + evicted-unmatched view 2 only, got $rows")
  }

  test("watermark truncates event time to milliseconds before the eviction compare") {
    // Boundary-value check for the x119 oracle's date_trunc('milliseconds'):
    // Spark's EventTimeStats floors event time to ms, so a max(ts) with
    // sub-ms micros must NOT push the watermark past a horizon that a
    // full-precision max(ts) - 1h would clear. View horizon = 11:00:00
    // exactly; sentinel at 12:00:00.000500 → Spark watermark =
    // floor_ms(12:00:00.000500) - 1h = 11:00:00, NOT < horizon → view
    // stays undecided. A sentinel one ms later (12:00:00.001500 →
    // watermark 11:00:00.001) DOES evict it.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def run(sentinelTs: String): Set[(Long, Option[Any])] = {
      val vs = MemoryStream[EventStreams.Event]
      val ps = MemoryStream[EventStreams.Event]
      val joined = EventStreams.viewToPurchaseLeftOuter(vs.toDF(), ps.toDF())
      val name = s"t_wm_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      // the global watermark is the MIN over both streams' watermarks,
      // so both sides carry the same sentinel timestamp
      vs.addData(Seq(
        EventStreams.Event(1L, 1L, "view", ts("2024-01-01 10:00:00"), 0.0),
        EventStreams.Event(99L, 8L, "view",
          java.sql.Timestamp.valueOf(sentinelTs), 0.0)))
      ps.addData(Seq(
        EventStreams.Event(10L, 9L, "purchase",
          java.sql.Timestamp.valueOf(sentinelTs), 1.0)))
      q.processAllAvailable()
      // second batch: watermark advances from the PREVIOUS batch's max
      vs.addData(Seq.empty[EventStreams.Event]); q.processAllAvailable()
      q.stop()
      val out = spark.table(name).collect()
        .map(r => (r.getAs[Long]("view_id"), Option(r.getAs[Any]("purchase_id")))).toSet
      spark.catalog.dropTempView(name)
      out
    }
    assert(run("2024-01-01 12:00:00.000500") == Set.empty,
      "sub-ms micros must floor away: watermark 11:00:00 is not past the 11:00:00 horizon")
    assert(run("2024-01-01 12:00:00.001500") == Set((1L, None)),
      "one whole ms past the horizon must evict the unmatched view")
  }

  test("file-stream source over testdata events matches batch row count") {
    val stream = EventStreams.fromParquetDir(spark, sfDir)
    assert(stream.isStreaming)
    val out = EventStreams.runToMemory(
      stream.groupBy("event_type").agg(count(lit(1)).as("n")),
      "t_file", OutputMode.Complete())
    val streamTotal = out.agg(sum("n")).collect()(0).getLong(0)
    val batchTotal = graft.Tables.load(spark, sfDir, "events").count()
    assert(streamTotal == batchTotal)
  }

  test("runToMemory fails loudly past the bounded-replay row cap") {
    // 4 real events pass the watermark sentinel; cap at 2 → must trip.
    val ex = intercept[IllegalStateException] {
      EventStreams.runToMemory(
        mkStream(base).toDF().select(col("event_id"), col("user_id")),
        "t_capped", maxRows = 2L)
    }
    assert(ex.getMessage.contains("BOUNDED replays only"),
      s"guard must name the bounded-replay contract, got: ${ex.getMessage}")
    // and the temp view must not leak after the failure
    assert(!spark.catalog.tableExists("t_capped"))
  }

  test("streaming curation gate equals its batch twin row-for-row") {
    val streamed = EventStreams.curationReplay(spark, sfDir)
    val qs = graft.functions.TextFunctions.qualitySignals(col("text"))
    val batch = graft.Tables.load(spark, sfDir, "documents")
      .filter(graft.functions.TextFunctions.langId(col("text")) === "en")
      .filter(qs.getField("quality") >= 50.0)
      .select(col("doc_id"), col("source"), qs.getField("quality").as("quality"))
    assert(streamed.exceptAll(batch).count() == 0 &&
           batch.exceptAll(streamed).count() == 0,
      "stream and batch curation must select identical rows")
  }

  test("streaming incremental agg equals the from-scratch batch aggregate") {
    val streamed = EventStreams.incrementalAggReplay(spark, sfDir)
    val batch = graft.Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100, 0) as bigint)")).as("total_cents"))
    assert(streamed.exceptAll(batch).count() == 0 &&
           batch.exceptAll(streamed).count() == 0,
      "merged per-batch partials must equal the full aggregate exactly")
  }

  test("idempotent sink: full redelivery leaves exact totals, no duplicates") {
    val out = EventStreams.idempotentSinkReplay(spark, sfDir)
      .agg(sum("n_events")).collect()(0).getLong(0)
    val expected = graft.Tables.load(spark, sfDir, "events").count()
    assert(out == expected,
      s"double-delivered sink holds $out rows, batch truth is $expected")
  }

  test("streaming upsert: table lands on the batch argmax; redelivery a no-op") {
    import org.apache.spark.sql.expressions.Window
    // the streamed CDC merge must land on the per-user global latest —
    // the batch rank window computes the same thing directly
    val streamed = EventStreams.streamingUpsertReplay(spark, sfDir)
      .select("user_id", "event_id")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val batchTruth = graft.Tables.load(spark, sfDir, "events")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "event_id")
    assert(streamed.exceptAll(batchTruth).count() == 0 &&
           batchTruth.exceptAll(streamed).count() == 0,
      "streamed upsert table diverged from the batch argmax")

    // worst-case full redelivery onto the LIVE folded table: every
    // batch re-applies as a no-op (nothing is strictly newer), so the
    // table is unchanged row-for-row
    val key = graft.etl.Sources.dirKey(sfDir)
    val staged = EventStreams.sinkReplayRoot.resolve(s"mor_src_$key").toString
    val tbl = new org.apache.hadoop.fs.Path(
      EventStreams.sinkReplayRoot.resolve(s"mor_tbl_$key").toUri)
    val before = graft.etl.Sources.manifestReadMerged(spark, tbl)
      .select("user_id", "event_id")
    EventStreams.deliverUpserts(spark, staged, tbl)
    val after = graft.etl.Sources.manifestReadMerged(spark, tbl)
      .select("user_id", "event_id")
    assert(after.exceptAll(before).count() == 0 &&
           before.exceptAll(after).count() == 0,
      "redelivery changed the upsert table")
  }

  test("idempotent sink crash window: die AFTER a batch's parquet write, BEFORE its checkpoint commit") {
    // the harder window than x91's full redelivery: the batch's output
    // files are already on disk but the commit log never recorded the
    // batch — a restart MUST redeliver that batch id and the
    // deterministic-path overwrite must absorb the rewrite, or the
    // sink double-counts exactly the rows written in the crash window
    val staged = java.nio.file.Files.createTempDirectory("sink_crash_src").toString
    val out = java.nio.file.Files.createTempDirectory("sink_crash_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sink_crash_ckpt").toString
    val events = graft.Tables.load(spark, sfDir, "events")
      .select("event_id", "event_type", "value")
    events.repartition(4).write.mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)

    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val q1 = stream.writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$out/batch_id=$id")
        if (id == 2L) {
          crashed.set(true)
          throw new RuntimeException("injected crash: write landed, commit did not")
        }
        ()
      }.start()
    scala.util.Try(q1.processAllAvailable())
    scala.util.Try(q1.stop())
    assert(crashed.get, "the injected crash never fired")
    // the window is REAL: batch 2's parquet is on disk...
    assert(new java.io.File(s"$out/batch_id=2").exists(),
      "precondition: batch 2's write must have landed before the crash")
    // ...but the checkpoint committed only batches 0 and 1
    val committed = Option(new java.io.File(s"$ckpt/commits").listFiles())
      .getOrElse(Array()).map(_.getName).filterNot(_.startsWith(".")).sorted
    assert(committed.sameElements(Seq("0", "1")),
      s"commit log should hold exactly batches 0,1 at the crash: ${committed.toSeq}")

    // restart from the SAME checkpoint, no injection: batch 2 is
    // redelivered under ITS OWN id, overwrites its own dir, and the
    // remaining batch completes
    EventStreams.idempotentParquetSink(stream, out, ckpt)
    val got = spark.read.parquet(out)
    assert(got.count() == events.count(),
      "exactly-once violated: row count diverged after crash recovery")
    val diff = got.select("event_id").exceptAll(events.select("event_id")).count() +
      events.select("event_id").exceptAll(got.select("event_id")).count()
    assert(diff == 0, "exactly-once violated: event multiset diverged")
    val batchDirs = Option(new java.io.File(out).listFiles()).getOrElse(Array())
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted
    assert(batchDirs.sameElements((0 to 3).map(i => s"batch_id=$i")),
      s"unexpected batch dirs: ${batchDirs.toSeq}")
  }

  test("CDC upsert crash-recovery: die after a batch's table commit, resume from the checkpoint") {
    import org.apache.spark.sql.expressions.Window
    // crash at the WORST window — batch 1's manifest commits landed,
    // its checkpoint commit did not — then restart from the SAME
    // checkpoint: batch 1 is redelivered (offsets were recorded at
    // batch start) and must re-apply as a no-op; the remaining batches
    // complete. Final table must equal the batch argmax exactly.
    val stageDir = java.nio.file.Files
      .createTempDirectory("mor_crash_src").toString
    val tbl = new org.apache.hadoop.fs.Path(java.nio.file.Files
      .createTempDirectory("mor_crash_tbl").resolve("t").toUri)
    val ckpt = java.nio.file.Files.createTempDirectory("mor_crash_ckpt")
    val events = graft.Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    events.repartition(4).write.mode("overwrite").parquet(stageDir)

    // first delivery dies mid-stream (after batch 1 of 4 commits)
    EventStreams.deliverUpserts(spark, stageDir, tbl, Some(ckpt),
      crashAfterBatch = 1L)
    val (vPartial, _) = graft.etl.Sources.currentManifest(spark, tbl)
    assert(vPartial > 0, "crash landed before any commit — nothing to recover")
    val partial = graft.etl.Sources.manifestReadMerged(spark, tbl).count()

    // resume from the SAME checkpoint — NOT a fresh full redelivery
    EventStreams.deliverUpserts(spark, stageDir, tbl, Some(ckpt))
    graft.etl.Sources.manifestApplyDeletes(spark, tbl, 1)

    val got = graft.etl.Sources.manifestReadMerged(spark, tbl)
      .select("user_id", "event_id")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val expected = events
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "event_id")
    assert(got.exceptAll(expected).count() == 0 &&
           expected.exceptAll(got).count() == 0,
      s"recovered table diverged from the batch argmax " +
        s"(partial rows at crash: $partial)")
  }
}
