package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.ui.enabled", "false")
      // Host-overload tolerance: round 5's run died to executor-heartbeat
      // RPC timeouts (10 s ask on a CPU-starved VM), producing an empty
      // bench artifact. Local-mode heartbeats cross the same RPC layer, so
      // widen both the interval and the network timeout (must be larger
      // than the interval) — a starved heartbeat then waits instead of
      // killing the executor mid-suite.
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: absorb session/codegen/JIT startup so the first timed
    // query isn't charged for it
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // deterministic order + cache isolation: several queries cache
    // sketched frames internally; dropping them between queries keeps
    // each timing independent of what ran before
    // min of N cold runs per query: this VM swings identical self-join
    // queries 2-8× run-to-run (PERF.md), and the minimum is the standard
    // low-noise estimator for a deterministic workload
    val reps = math.max(1,
      scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt).getOrElse(3))
    // optional comma-separated allowlist for isolated re-measurement of
    // a flagged query (empty/unset = the full suite)
    val only = sys.env.getOrElse("SPARK_GRAFT_BENCH_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    // Degrade-don't-die budget: a healthy full suite finishes in ~3-6 min,
    // so the deadline only bites when the host is badly oversubscribed.
    // Past 40% of it remaining queries drop to 1 rep; past 100% they are
    // skipped (and named in the JSON) — partial data beats an rc=124.
    val deadlineSec = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_SEC", "1200").toDouble).getOrElse(1200.0)
    val suiteT0 = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - suiteT0) / 1e9

    val done = new java.util.concurrent.ConcurrentLinkedQueue[(String, (Double, Double))]()
    val skipped = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val printed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def emit(partial: Boolean): Unit = if (printed.compareAndSet(false, true)) {
      import scala.jdk.CollectionConverters._
      val results = done.asScala.toSeq
      // "queries" stays min-of-N (the low-noise estimator for deterministic
      // work on a noisy VM); "spreads" publishes each query's [min, max]
      // across reps so a reader can tell VM weather from a real regression
      // without re-running (PERF.md documents 2-8x single-run swings).
      val qs = results.map { case (k, (mn, _)) => s"\"" + k + "\":" + mn }
        .mkString("{", ",", "}")
      val spreads = results.map { case (k, (mn, mx)) => s"\"" + k + "\":[" + mn + "," + mx + "]" }
        .mkString("{", ",", "}")
      val total = results.map(_._2._1).sum
      val skippedJson = skipped.asScala.toSeq.sorted
        .map("\"" + _ + "\"").mkString("[", ",", "]")
      // provenance (round-7/8 ADVICE): the artifact names the commit
      // and date that produced it — best-effort, never fails the bench
      val commit = scala.util.Try {
        val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
          .redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes()).trim
        p.waitFor(); if (out.matches("[0-9a-f]{6,}")) out else "unknown"
      }.getOrElse("unknown")
      val date = java.time.LocalDate.now().toString
      val line = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"partial":$partial,"skipped":$skippedJson,"queries":$qs,"spreads":$spreads,"sf":"$sfDir","meta":{"commit":"$commit","date":"$date","generator":"graft.Bench"}}"""
      println(line)
      System.out.flush()
      // The round-6/7 perf evidence was lost to stdout tail-capture
      // truncation TWICE (BENCH_r06/r07 "parsed": null with rc=0) — a
      // file copy survives any tail size. Best-effort: never let a
      // read-only cwd kill the stdout contract.
      val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
      scala.util.Try(java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outPath), line + "\n"))
    }
    // If an external `timeout` TERMs the JVM mid-suite, shutdown hooks
    // still run — publish whatever finished so the driver parses a
    // partial line instead of nothing (round-5 failure mode).
    Runtime.getRuntime.addShutdownHook(new Thread(() => emit(partial = true)))

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      if (elapsed() > deadlineSec) { skipped.add(name) }
      else {
        val repsNow = if (elapsed() > 0.4 * deadlineSec) 1 else reps
        // Per-query wall cap: round 6 lost 84 of 106 timings when ONE
        // weather-hit query's three reps ate the whole 1200 s budget (the
        // deadline was only consulted between queries). Re-check between
        // reps and stop a query once it has consumed deadline/10 — a
        // partial spread beats starving every query after it.
        val queryCapSec = deadlineSec / 10
        val queryT0 = System.nanoTime()
        def queryElapsed(): Double = (System.nanoTime() - queryT0) / 1e9
        val times = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Double)]
        var rep = 0
        while (rep < repsNow &&
               (rep == 0 || (queryElapsed() < queryCapSec && elapsed() < deadlineSec))) {
          val t0 = System.nanoTime()
          // noop sink: materializes EVERY output column (count() would let
          // Catalyst prune the projections we're trying to measure)
          val ok =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch { case _: Throwable => false }
          val dt = (System.nanoTime() - t0) / 1e9
          // several queries cache sketched frames internally; dropping them
          // keeps each rep (and each query) independent of what ran before
          spark.catalog.clearCache()
          times += ((ok, dt))
          rep += 1
        }
        // a failed rep finishes fast — stats over SUCCESSFUL reps only, so a
        // transient failure can't masquerade as a great time; if every rep
        // failed, report the max elapsed (visibly odd, never flattering)
        val succ = times.collect { case (true, dt) => dt }
        val pool = if (succ.nonEmpty) succ else Seq(times.map(_._2).max)
        done.add(name -> ((pool.min, pool.max)))
      }
    }
    emit(partial = false)
    spark.stop()
  }
}
