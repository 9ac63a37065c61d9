package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Repeated-round OCC storm. One storm round rarely hits the narrow
  * races; five rounds reliably caught both bugs this spec exists for:
  * the non-atomic local create(overwrite=false) claim (two racers both
  * "won" a version and one append vanished — fixed by the O_EXCL NIO
  * claim in manifestCommit) and the stale-pointer-swap regression
  * (fixed by swapPointer's post-rename repair loop). On failure the
  * assert dumps the manifest dir + pointer state. */
class OccStormSpec extends SparkSpec {
  test("repeated OCC storms: every append lands, pointer converges to the max commit") {
    val df = spark.range(4000).toDF("id")
      .withColumn("payload", md5(col("id").cast("string")))
    (0 until 5).foreach { round =>
      val root = new org.apache.hadoop.fs.Path(
        java.nio.file.Files.createTempDirectory(s"occ_dbg_$round").resolve("t").toUri)
      Sources.manifestAppend(spark, root, df.filter(col("id") < 1000), 1)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val rest = df.filter(col("id") >= 1000)
      val threads = (0 until 8).map { i =>
        val t = new Thread(() => {
          try { Sources.manifestAppend(spark, root,
            rest.filter(pmod(col("id"), lit(8L)) === i), 1); () }
          catch { case e: Throwable => failures.add(e); () }
        })
        t.start(); t
      }
      threads.foreach(_.join())
      assert(failures.isEmpty, s"round $round: ${failures.peek()}")
      assert(Sources.manifestRead(spark, root).count() == 4000,
        s"round $round: an append's rows were lost")
      val (v, _) = Sources.currentManifest(spark, root)
      if (v != 9L) {
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val names = fs.listStatus(new org.apache.hadoop.fs.Path(root, "_manifests"))
          .map(_.getPath.getName).sorted.toSeq
        val ptr = try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(new java.net.URI(
            new org.apache.hadoop.fs.Path(root, "_current").toString))), "UTF-8").trim
          catch { case e: Exception => s"<${e.getMessage}>" }
        val bodies = names.filter(_.startsWith("m-")).map { n =>
          val b = try new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(new java.net.URI(
              new org.apache.hadoop.fs.Path(root, s"_manifests/$n").toString))), "UTF-8")
            catch { case e: Exception => s"<${e.getMessage}>" }
          val lines = b.linesIterator.toSeq
          s"$n: ${lines.length} lines, eof=${lines.exists(_.trim == "#eof")}"
        }
        fail(s"round $round: v=$v ptr='$ptr'\n  files: $names\n  " +
          bodies.mkString("\n  "))
      }
    }
  }

  test("claim storm: 8 racers per exact version, exactly one winner each, no duplicate rows") {
    // manifestAppendExactly is the ONE-WINNER building block the IVF
    // lifecycle builds on; a storm of racers all targeting the same
    // version must admit exactly one (the O_EXCL claim), the losers
    // must stage-and-discard cleanly, and the table must hold exactly
    // the winners' rows — a duplicate here is the ADVICE-r17
    // double-build corruption
    val df = spark.range(800).toDF("id")
      .withColumn("who", pmod(col("id"), lit(8L)))
    (0 until 3).foreach { round =>
      val root = new org.apache.hadoop.fs.Path(
        java.nio.file.Files.createTempDirectory(s"claim_storm_$round").resolve("t").toUri)
      (1L to 3L).foreach { v =>
        val wins = new java.util.concurrent.atomic.AtomicInteger(0)
        val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
        val threads = (0 until 8).map { i =>
          val t = new Thread(() => {
            try {
              if (Sources.manifestAppendExactly(spark, root,
                  df.filter(col("who") === i), 1, v)) { wins.incrementAndGet(); () }
            } catch { case e: Throwable => failures.add(e); () }
          })
          t.start(); t
        }
        threads.foreach(_.join())
        assert(failures.isEmpty, s"round $round v$v: ${failures.peek()}")
        assert(wins.get() == 1, s"round $round v$v: ${wins.get()} winners (want exactly 1)")
        assert(Sources.currentManifest(spark, root)._1 == v,
          s"round $round: table not at v$v after the storm")
      }
      // three versions committed → exactly three winners' row sets, one
      // per version, each of exactly 100 rows and internally consistent
      val rows = Sources.manifestRead(spark, root)
      assert(rows.count() == 300, s"round $round: duplicate or lost winner rows")
      assert(rows.groupBy("who").count().count() <= 3,
        s"round $round: more distinct writers than versions — a loser's rows leaked")
    }
  }
}
