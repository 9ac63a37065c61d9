package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("stratifiedSample is deterministic and respects per-lang thresholds") {
    val a = Sampling.stratifiedSample(spark, sfDir).collect()
    val b = Sampling.stratifiedSample(spark, sfDir).collect()
    assert(a.sameElements(b), "selection must be identical across runs")

    val docs = graft.Tables.load(spark, sfDir, "documents")
    val total = docs.filter(col("lang") === "en").count()
    val kept = a.count(_.getString(1) == "en")
    // u32 is equidistributed: en rate 0.4 ± slack on small strata
    assert(kept < total, "en must actually be downsampled")
    assert(math.abs(kept.toDouble / total - 0.4) < 0.15,
      s"en keep rate ${kept.toDouble / total} far from 0.4")
    // non-sampled langs keep every row
    val deTotal = docs.filter(col("lang") === "de").count()
    assert(a.count(_.getString(1) == "de") == deTotal)
  }

  test("budgetFill: threshold-refinement plan equals the naive global-prefix spec") {
    import org.apache.spark.sql.expressions.Window
    // the spec, computed the naive way (global-sort windows) in Spark —
    // the DuckDB oracle states the same thing; this pins the equivalence
    // inside one engine so an oracle-side quirk can't mask a plan bug
    val qs = graft.functions.TextFunctions.qualitySignals(col("text"))
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        qs.getField("quality").as("q"))
    val srcW = Window.partitionBy("source").orderBy(desc("q"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gW = Window.orderBy(desc("q"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = docs.withColumn("src_cum", sum("n_tokens").over(srcW))
      .filter(col("src_cum") <= TextAnalysis.SourceCapTokens)
      .withColumn("cum", sum("n_tokens").over(gW))
      .filter(col("cum") <= TextAnalysis.BudgetTokens)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val out = TextAnalysis.budgetFill(spark, sfDir).collect()
    val got = out.map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected,
      s"plan/spec diverge: extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    assert(got.nonEmpty)
    // the two hard constraints, re-checked from the output itself
    assert(out.map(_.getAs[Long]("n_tokens")).sum <= TextAnalysis.BudgetTokens)
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      assert(rows.map(_.getAs[Long]("n_tokens")).sum <= TextAnalysis.SourceCapTokens,
        s"source $src exceeds its cap")
    }
    // the one deliberate unpartitioned running sum runs over the quality
    // HISTOGRAM — assert its documented ≤1001-row bound from the data
    val nBuckets = docs.select(floor(col("q") * lit(10)).as("qb"))
      .distinct().count()
    assert(nBuckets <= 1001L,
      s"quality histogram outgrew its documented bound: $nBuckets buckets")
    // window shape: every window in the plan is either source-partitioned
    // (stage 1 caps), the ≤1001-row histogram frame (qb order), or the
    // __go_bucket-partitioned prefixSum — never a bare global window over
    // corpus rows (the r15 boundary-bucket regression)
    val p = TextAnalysis.budgetFill(spark, sfDir)
      .queryExecution.executedPlan.toString
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty && windows.forall(l =>
      l.contains("__go_bucket") || l.contains("source") || l.contains("qb")),
      s"corpus-scale unpartitioned window leaked back into budgetFill:\n$p")
  }

  test("mixtureSample hits exact integer quotas and never exceeds supply") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = Sampling.mixtureWeightsPm.toMap
    val n = w.map { case (l, pm) => counts(l) * 1000L / pm }.min
    val quotas = w.map { case (l, pm) => l -> n * pm / 1000L }

    val out = Sampling.mixtureSample(spark, sfDir).collect()
    val got = out.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    quotas.foreach { case (l, q) =>
      assert(got.getOrElse(l, 0L) == q, s"lang $l: got ${got.getOrElse(l, 0L)}, quota $q")
      assert(q <= counts(l), s"quota for $l exceeds supply")
    }
  }

  test("splitAssignment is stable under corpus growth (no document moves splits)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = Sampling.splitAssignment(spark, sfDir).collect()
    // partitions the corpus exactly
    assert(out.map(_.getLong(2)).sum == docs.count())
    val bySplit = out.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // stability: assignment of a doc computed on a SUBSET is identical —
    // membership depends only on the key, never on the rest of the corpus
    import org.apache.spark.sql.functions._
    val h = Sampling.u32(col("doc_id"))
    val split = when(h < lit(3865470566L), "train")
      .when(h < lit(4080218931L), "val").otherwise("test")
    val subset = docs.filter(col("doc_id") % 3 === 0).withColumn("s1", split)
    val full = docs.withColumn("s2", split).select(col("doc_id"), col("s2"))
    assert(subset.join(full, "doc_id").filter(col("s1") =!= col("s2")).count() == 0)
  }

  test("packSequences: pack manifest partitions each source's docs exactly once") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = Sampling.packSequences(spark, sfDir).cache()
    // every doc lands in exactly one pack
    assert(out.agg(sum("n_docs")).collect()(0).getLong(0) == docs.count())
    // pack token totals sum to the corpus token total
    val totalTokens = docs
      .agg(sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long")))
      .collect()(0).getLong(0)
    assert(out.agg(sum("pack_tokens")).collect()(0).getLong(0) == totalTokens)
    // pack ids are dense from 0 within each source
    val bad = out.groupBy("source")
      .agg(min("pack_id").as("mn"), max("pack_id").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("n") =!= col("mx") + 1)
    assert(bad.count() == 0, "pack ids must be dense per source")
    // a pack never starts beyond the running total: first pack >= budget-1 docs
    // spot-check monotonicity: doc spans of consecutive packs don't overlap
    val overlap = out.alias("a").join(out.alias("b"),
      col("a.source") === col("b.source") && (col("a.pack_id") + 1 === col("b.pack_id")) &&
        col("a.last_doc") > col("b.first_doc"))
    assert(overlap.count() == 0, "doc_id spans of consecutive packs must not overlap")
    out.unpersist()
  }

  test("k-fold assignment: 5 folds cover the corpus, roughly balanced, growth-stable") {
    val rows = Sampling.kfoldAssignment(spark, sfDir).collect()
    val total = graft.Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 4L))
    assert(rows.map(_.getLong(1)).sum == total)
    // hash-uniform folds: no fold more than 2x the smallest on 500 docs
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max <= 2 * sizes.min, s"folds badly imbalanced: ${sizes.toSeq}")
    // growth-stable: recomputing on a subset never moves a doc's fold —
    // fold depends only on the doc's own hash, asserted by determinism
    val again = Sampling.kfoldAssignment(spark, sfDir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).sameElements(
           again.map(r => (r.getLong(0), r.getLong(1)))))
  }

  test("split drift: shares are exact ppm fractions, drift is their difference") {
    val rows = Sampling.splitTermDrift(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val (tr, va, drift) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(tr >= 0 && tr <= 1000000 && va >= 0 && va <= 1000000)
      assert(drift == math.abs(tr - va))
    }
    // ordering: most frequent corpus terms first
    val nAll = rows.map(_.getLong(1))
    assert(nAll.sameElements(nAll.sorted.reverse))
  }

  test("PPS sample: ~k docs, deterministic, and no zero-weight selections") {
    val out = Sampling.ppsSample(spark, sfDir).cache()
    val n = out.count()
    // systematic PPS yields exactly k when every weight < step; the
    // fixture's quality weights are far below total/50
    assert(n == 50, s"expected 50 selections, got $n")
    assert(out.filter(col("w") <= 0).count() == 0, "zero-weight doc selected")
    val again = Sampling.ppsSample(spark, sfDir)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0,
      "selection must be deterministic")
    out.unpersist()
  }

  test("padding audit: bins cover the corpus, efficiency bounded by construction") {
    val rows = Sampling.paddingAudit(spark, sfDir).collect()
    val docs = graft.Tables.load(spark, sfDir, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "real tokens cannot exceed padded")
      // every length in bin [b, b+32) is > b*32/ (b+31)... the bin width
      // bounds worst-case efficiency: max/min within a 32-token bin
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 100.0)
    }
  }

  test("importance scoring: one score per doc, selection rule exact, target favored") {
    val out = Sampling.importanceScores(spark, sfDir).cache()
    val docs = graft.Tables.load(spark, sfDir, "documents")
    assert(out.count() == docs.count(), "every document scores exactly once")
    assert(out.select("doc_id").distinct().count() == out.count())
    // selected is literally (score > 0) — no drifting second definition
    assert(out.filter(col("selected") =!=
      when(col("score") > 0, 1).otherwise(0)).count() == 0)
    // the scorer exists to pull the target domain upward: the labeled-en
    // slice must out-score the background in aggregate (by construction —
    // its own term rates define the positive weights)
    val en = out.filter(col("lang") === "en")
      .agg(avg(col("score"))).head().getDouble(0)
    val rest = out.filter(col("lang") =!= "en")
      .agg(avg(col("score"))).head().getDouble(0)
    assert(en > rest, s"target slice does not out-score background: $en <= $rest")
    out.unpersist()
  }

  test("mixture plan: guardrails hold and the arithmetic is self-consistent") {
    val rows = Sampling.mixturePlan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val budget = Sampling.MixBudgetTokens
    rows.foreach { r =>
      val supply = r.getAs[Long]("supply_tokens")
      val req = r.getAs[Long]("requested_tokens")
      val granted = r.getAs[Long]("granted_tokens")
      val epochs = r.getAs[Long]("epochs_milli")
      assert(granted <= req, "granted more than requested")
      assert(granted <= supply * Sampling.MixEpochCap, "epoch cap violated")
      assert(epochs <= Sampling.MixEpochCap * 1000, "milli-epochs exceed the cap")
      assert(r.getAs[Long]("shortfall_tokens") == req - granted)
      assert(req <= budget, "one source requested more than the whole budget")
    }
    // uniform weights: requests are equal across sources (integer div)
    assert(rows.map(_.getAs[Long]("requested_tokens")).distinct.length == 1)
    // total grant never exceeds the budget
    assert(rows.map(_.getAs[Long]("granted_tokens")).sum <= budget)
  }

  test("x164 shard publish: budget binds, packs never straddle shards, reopen is exactly-once") {
    import graft.etl.Sources
    val root = new org.apache.hadoop.fs.Path(java.nio.file.Files
      .createTempDirectory("train_shards_spec").resolve("t").toUri)
    val out1 = Sampling.trainingShardPublishAt(spark, sfDir, root).collect()
    assert(out1.nonEmpty)
    assert(Sources.currentManifest(spark, root)._1 == 1L)
    // provenance self-consistency + the quota actually BINDING: the
    // selection is a strict subset of the corpus, bounded by budget
    val total = out1.head.getAs[Long]("total_tokens")
    assert(out1.forall(_.getAs[Long]("total_tokens") == total))
    assert(total <= Sampling.TrainShardBudgetTokens, "budget exceeded")
    assert(out1.map(_.getAs[Long]("shard_tokens")).sum == total)
    val corpusDocs = graft.Tables.load(spark, sfDir, "documents").count()
    assert(out1.map(_.getAs[Long]("n_docs")).sum < corpusDocs,
      "quota did not bind — the whole corpus was selected")
    // packs are atomic: every (source, pack_id) lives in exactly one
    // shard (training reads a pack's docs contiguously)
    val pub = Sources.manifestReadAt(spark, root, 1L)
    assert(pub.groupBy("source", "pack_id")
      .agg(countDistinct(col("shard")).as("s")).filter(col("s") =!= 1)
      .count() == 0, "a pack straddles shards")
    // REOPEN: pure read, no second commit, identical artifact
    val out2 = Sampling.trainingShardPublishAt(spark, sfDir, root).collect()
    assert(Sources.currentManifest(spark, root)._1 == 1L, "reopen committed")
    assert(out1.map(_.toString).sorted.toSeq == out2.map(_.toString).sorted.toSeq)
  }

  test("x164 crash windows on the publish boundary: lost pointer swap and orphaned stage both recover") {
    import graft.etl.Sources
    // window A — crash AFTER the manifest body committed but BEFORE
    // (or during) the pointer swap: the pointer is missing, the
    // complete m-1.txt is the table. A reopen must resolve it via the
    // complete-manifest fallback, NOT re-publish at v1/v2.
    val rootA = new org.apache.hadoop.fs.Path(java.nio.file.Files
      .createTempDirectory("train_shards_crashA").resolve("t").toUri)
    val clean = Sampling.trainingShardPublishAt(spark, sfDir, rootA).collect()
    val fs = rootA.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new org.apache.hadoop.fs.Path(rootA, "_current")
    assert(fs.exists(ptr)); fs.delete(ptr, false)
    val reopened = Sampling.trainingShardPublishAt(spark, sfDir, rootA).collect()
    assert(Sources.currentManifest(spark, root = rootA)._1 == 1L,
      "pointer-loss reopen must not commit a new version")
    assert(clean.map(_.toString).sorted.toSeq ==
      reopened.map(_.toString).sorted.toSeq)
    // window B — crash BEFORE the claim: a stranded staged dir under
    // data/ must be invisible to the publish (the manifest references
    // only its own files) and reclaimable by vacuum afterwards.
    val rootB = new org.apache.hadoop.fs.Path(java.nio.file.Files
      .createTempDirectory("train_shards_crashB").resolve("t").toUri)
    val orphanDir = new org.apache.hadoop.fs.Path(rootB, "data/a-orphan")
    spark.range(5).toDF("doc_id").write.parquet(orphanDir.toString)
    val orphanFiles = {
      val it = fs.listFiles(orphanDir, true)
      val b = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
      while (it.hasNext) { val p = it.next().getPath
        if (!p.getName.startsWith("_") && !p.getName.startsWith(".")) b += p }
      b.toSeq
    }
    assert(orphanFiles.nonEmpty)
    val outB = Sampling.trainingShardPublishAt(spark, sfDir, rootB).collect()
    assert(outB.map(_.toString).sorted.toSeq ==
      clean.map(_.toString).sorted.toSeq,
      "an orphaned staged dir leaked into the published shard set")
    Sources.manifestVacuum(spark, rootB, graceMs = 0L)
    assert(orphanFiles.forall(p => !fs.exists(p)),
      "vacuum left the crashed publisher's staged files behind")
    assert(Sampling.trainingShardPublishAt(spark, sfDir, rootB).collect()
      .map(_.toString).sorted.toSeq == clean.map(_.toString).sorted.toSeq)
  }
}
