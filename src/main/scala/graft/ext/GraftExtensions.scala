package graft.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{Sketches, TextExpressions, VectorExpressions}

/** SQL surface for the engine's custom expressions, installed via the
  * standard extension mechanism:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.ext.GraftExtensions")
  *   ...
  * spark.sql("SELECT graft_dot(a, b), graft_lang_id(text) FROM t")
  * }}}
  *
  * Each function maps 1:1 onto the codegen expressions in
  * graft.functions — DataFrame DSL users call those directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom physical operator: AsOfJoinPlan → AsOfJoinExec
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)

    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[VectorExpressions.DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => VectorExpressions.DotProduct(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[VectorExpressions.DotProduct].getName, "graft_cosine"),
      (args: Seq[Expression]) => {
        // raw catalyst nodes (a Column round-trip would embed unresolved
        // ColumnNode wrappers that the function injection path never
        // re-analyzes)
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        val (a, b) = (args(0), args(1))
        Divide(VectorExpressions.DotProduct(a, b),
          Multiply(Sqrt(VectorExpressions.DotProduct(a, a)),
                   Sqrt(VectorExpressions.DotProduct(b, b))))
      }))

    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[TextExpressions.WordShingleHashes].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) =>
        TextExpressions.WordShingleHashes(args(0), intArg(args(1), "shingle width"))))

    ext.injectFunction((
      new FunctionIdentifier("graft_lang_id"),
      new ExpressionInfo(classOf[TextExpressions.LangId].getName, "graft_lang_id"),
      (args: Seq[Expression]) => TextExpressions.LangId(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[TextExpressions.WordShingleStrings].getName, "graft_shingles"),
      (args: Seq[Expression]) =>
        TextExpressions.WordShingleStrings(args(0), intArg(args(1), "shingle width"))))

    ext.injectFunction((
      new FunctionIdentifier("graft_top_token_share"),
      new ExpressionInfo(classOf[TextExpressions.TopTokenShare].getName, "graft_top_token_share"),
      (args: Seq[Expression]) => TextExpressions.TopTokenShare(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("graft_quality"),
      new ExpressionInfo(classOf[TextExpressions.QualitySignals].getName, "graft_quality"),
      (args: Seq[Expression]) => TextExpressions.QualitySignals(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[TextExpressions.FingerprintSketch].getName, "graft_fingerprint"),
      (args: Seq[Expression]) => TextExpressions.FingerprintSketch(args(0),
        intArg(args(1), "gram width"), intArg(args(2), "sketch size"))))

    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[VectorExpressions.MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.graftshim.{toColumn, toExpression}
        toExpression(Sketches.minhashSignature(
          toColumn(args(0)), intArg(args(1), "k"),
          if (args.size > 2) intArg(args(2), "seed").toLong else 42L))
      }))
  }
}
