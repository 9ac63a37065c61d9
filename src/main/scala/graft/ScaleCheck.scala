package graft

import org.apache.spark.sql.SparkSession

/** Measured scale-up check: the same operators, the same generator, two
  * volumes 10× apart — does runtime grow ~linearly (the 100 TB design
  * claim) or worse?
  *
  * The driver's testdata tops out at sf0.1, so scale claims beyond that
  * were plan-reading until this harness: it generates distribution-
  * matched 1× and 10× slices of documents/events/embeddings
  * (etl.DataGen.writeScaleSlice — same vocab, lengths, dup rates, user
  * scaling), runs the hottest document/event/embedding operators on
  * both, and prints one JSON line with per-query seconds and the
  * 10×/1× runtime ratio. A sub-11× ratio on a 10× volume is linear
  * scaling within noise (the constant per-query overhead — session,
  * planning, tiny dims — dilutes, so ratios usually land UNDER 10).
  *
  * Generated slices are a measurement rig only — correctness oracles
  * always run on the driver's own testdata.
  *
  * Usage: Test/runMain graft.ScaleCheck [workDir] [mult] [reps] [q1,q2,…]
  * (the optional 4th arg restricts the measured set — used for the
  * 30×+ confirmation slices where running all twelve would take hours)
  */
object ScaleCheck {

  // The measured set: the operators that dominate BENCH totals and whose
  // cost is driven by the scaled tables (documents/events/embeddings).
  // Memory-sink streaming replays are excluded — their micro-batch
  // scheduling floor is constant-dominated at these volumes and the
  // underlying operators' batch twins are all here. The two
  // foreachBatch replays (x91/x105) ARE measured: their sinks are
  // distributed parquet, so a 10× slice answers whether redelivery +
  // versioned-merge cost tracks volume (expected: yes, linearly in the
  // staged files) rather than hitting a state cliff.
  private val Hot = Seq(
    "x03_dedup_minhash",
    "x04_dedup_simhash",
    "x05_dedup_ngram_jaccard",
    "x06_dedup_embedding",
    "x14_text_fingerprints",
    "x17_events_sessionize",
    "x29_events_asof_native",
    "x34_contamination",
    "x43_dup_clusters",
    "x50_source_overlap",
    "x66_tfidf_terms",
    "x79_split_leakage",
    "x88_global_rank",
    "x91_stream_idempotent_sink",
    "x96_dedup_canonical",
    "x98_novelty",
    "x104_cluster_source_matrix",
    "x105_stream_incremental_agg")
  // x80_sql_surface is excluded only because it registers the full
  // testdata catalog (registerAll) and the scale slices carry just the
  // three scaled tables; its per-doc work is the x11/x12 expression set
  // already covered above.

  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/root/repo/tmp/scalecheck")
    val mult = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 2
    val measured =
      if (args.length > 3) Hot.filter(args(3).split(",").map(_.trim).toSet)
      else Hot
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir1 = s"$workDir/x1"
    val dirN = s"$workDir/x$mult"
    // both slices from the SAME generator so the ratio isolates volume —
    // comparing driver sf0.1 to a generated slice would confound
    // generator differences with scaling
    if (!new java.io.File(s"$dir1/documents.parquet").exists())
      etl.DataGen.writeScaleSlice(spark, dir1, 1)
    if (!new java.io.File(s"$dirN/documents.parquet").exists())
      etl.DataGen.writeScaleSlice(spark, dirN, mult)

    def run(dir: String, name: String): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      times.min
    }
    // warmup on the small slice
    run(dir1, measured.head)

    val rows = measured.map { name =>
      val t1 = run(dir1, name)
      val tN = run(dirN, name)
      (name, t1, tN, tN / t1)
    }
    val qjson = rows.map { case (n, t1, tN, r) =>
      f""""$n":{"t1":$t1%.3f,"t$mult":$tN%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val worst = rows.maxBy(_._4)
    println(s"""{"metric":"scale_ratio_p50","value":${median(rows.map(_._4))},"mult":$mult,"reps":$reps,"worst":"${worst._1}","worst_ratio":${f"${worst._4}%.2f"},"queries":$qjson}""")
    spark.stop()
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }
}
