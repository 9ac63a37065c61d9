package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for x144 power-iteration spectral audit: exact integer
  * convergence on an axis-aligned corpus (every division replayed by
  * hand) and structural invariants on the real table. */
class SpectralSpec extends SparkSpec {

  private def embDir(vecs: Seq[(Long, Array[Float])]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_spec_").toString
    import spark.implicits._
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("x144: exact convergence on an axis-aligned corpus") {
    // all variance on dim 0: quantized (±1000, ±500), mean 0 per dim.
    // it1: s = c0·1000 → w = (1000·Σc0², 0, 0, 0), Σc0² = 2.5e6 →
    // mx = 2.5e9, v1 = (2.5e9 // (2.5e9 // 1000 = 2.5e6), 0,0,0) =
    // (1000, 0,0,0); iterations 2,3 are fixed points. Final
    // projections sd//1000 = c0 → lambda_q = 2.5e6 // 4 = 625000 =
    // trace_q (ALL energy on the direction — ratio exactly 1).
    val out = Spectral.powerIteration(spark, embDir(Seq(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(-1f, 0f, 0f, 0f),
      3L -> Array(0.5f, 0f, 0f, 0f),
      4L -> Array(-0.5f, 0f, 0f, 0f)))).collect()
    graft.CacheScope.release()
    assert(out.length == 4)
    assert(out.map(_.getAs[Long]("mu")).forall(_ == 0L))
    assert(out.map(_.getAs[Long]("v_dir")).toSeq == Seq(1000L, 0L, 0L, 0L))
    assert(out.forall(_.getAs[Long]("lambda_q") == 625000L))
    assert(out.forall(_.getAs[Long]("trace_q") == 625000L))
  }

  test("x144 corpus invariants: shape, normalization band, energy bounds") {
    val rows = Spectral.powerIteration(spark, sfDir).collect()
    graft.CacheScope.release()
    assert(rows.length == 64)
    assert(rows.map(_.getAs[Long]("dim_idx")).toSeq == (0L to 63L))
    val lam = rows.map(_.getAs[Long]("lambda_q")).distinct
    val tr = rows.map(_.getAs[Long]("trace_q")).distinct
    assert(lam.length == 1 && tr.length == 1, "energy scalars not constant")
    assert(lam.head >= 0L && tr.head > 0L)
    // Cauchy–Schwarz in the quantized units: (s/1000)² ≤ ‖c‖²·V2/10⁶,
    // V2 ≤ 64·1010² → λ_q ≤ trace_q·66
    assert(lam.head <= tr.head * 66)
    val vs = rows.map(_.getAs[Long]("v_dir"))
    // renormalization lands max|v| in [1000, ~1010]; nothing exceeds it
    assert(vs.map(math.abs).max >= 1000L && vs.map(math.abs).max <= 1010L)
  }

  test("x144 determinism: identical frames across runs") {
    val a = Spectral.powerIteration(spark, sfDir).collect().toSeq
    graft.CacheScope.release()
    val b = Spectral.powerIteration(spark, sfDir).collect().toSeq
    graft.CacheScope.release()
    assert(a == b)
  }
}
