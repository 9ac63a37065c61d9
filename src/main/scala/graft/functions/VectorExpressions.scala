package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions (with codegen) for the vector hot paths:
  * dot products, hyperplane LSH signatures, and MinHash signatures.
  *
  * The higher-order-function formulations in [[Sketches]] (aggregate/
  * zip_with/transform) evaluate their lambdas interpreted, row by row —
  * fine for cold paths, dominant cost for O(k·dim) sketch math on every
  * row of a 100 TB corpus. These expressions compile to tight Java
  * loops inside whole-stage codegen (interpreted `eval` kept for
  * completeness/fallback), turning sketching back into a scan-speed map.
  */
object VectorExpressions {

  /** dot(a, b) over array<double> — codegen'd multiply-add loop. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val s = ctx.freshName("sum")
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |double $s = 0.0;
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Sign bits of <v, plane_b> for `nBits` constant hyperplanes
    * (flattened row-major into `planes`). Output: array<int> of 0/1. */
  case class HyperplaneSignBits(child: Expression, planes: Array[Double],
                                nBits: Int, dim: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val out = new Array[Int](nBits)
      var b = 0
      while (b < nBits) {
        var s = 0.0
        var i = 0
        while (i < dim) { s += x.getDouble(i) * planes(b * dim + i); i += 1 }
        out(b) = if (s > 0) 1 else 0
        b += 1
      }
      new GenericArrayData(out)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val out = ctx.freshName("bits")
        val s = ctx.freshName("s")
        val b = ctx.freshName("b")
        val i = ctx.freshName("i")
        s"""
           |int[] $out = new int[$nBits];
           |for (int $b = 0; $b < $nBits; $b++) {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $dim; $i++) {
           |    $s += $v.getDouble($i) * $planesRef[$b * $dim + $i];
           |  }
           |  $out[$b] = $s > 0 ? 1 : 0;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** k-slot MinHash signature of an array of 64-bit element hashes,
    * identical arithmetic to Sketches.minhashSignature: fold each
    * element to [0, P) then slot_j = min over elements of
    * (a_j·h' + b_j) mod P; empty input → Long.MaxValue per slot. */
  case class MinHashSignature(child: Expression, as: Array[Long], bs: Array[Long])
      extends UnaryExpression {

    private val P = 2147483647L
    private def k = as.length

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val n = x.numElements()
      val out = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = x.getLong(i)
        val f = ((h % P) + P) % P
        var j = 0
        while (j < k) {
          val c = (as(j) * f + bs(j)) % P
          if (c < out(j)) out(j) = c
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val asRef = ctx.addReferenceObj("as", as, "long[]")
      val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
      nullSafeCodeGen(ctx, ev, v => {
        val out = ctx.freshName("sig")
        val n = ctx.freshName("n")
        val f = ctx.freshName("f")
        val c = ctx.freshName("c")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        s"""
           |long[] $out = new long[$k];
           |java.util.Arrays.fill($out, Long.MAX_VALUE);
           |int $n = $v.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  long $f = (($v.getLong($i) % ${P}L) + ${P}L) % ${P}L;
           |  for (int $j = 0; $j < $k; $j++) {
           |    long $c = ($asRef[$j] * $f + $bsRef[$j]) % ${P}L;
           |    if ($c < $out[$j]) $out[$j] = $c;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Widen PCM-u8 bytes to s16le sample data: per byte, sample
    * (b−128)·256, whose little-endian bytes are [0x00, b ^ 0x80] — the
    * standard offset-binary width conversion, exact inverse of the
    * decoder's (s >> 8) + 128 narrowing. One codegen byte loop; the
    * pure-column spelling (regexp over the hex expansion) allocated a
    * match object per byte pair and doubled the media family's bench
    * cost. Java arrays zero-initialize, so the low bytes are free. */
  case class U8ToS16Le(child: Expression) extends UnaryExpression {

    override def dataType: DataType = BinaryType

    override def nullSafeEval(v: Any): Any = {
      val in = v.asInstanceOf[Array[Byte]]
      val out = new Array[Byte](in.length * 2)
      var i = 0
      while (i < in.length) { out(2 * i + 1) = (in(i) ^ 0x80).toByte; i += 1 }
      out
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        s"""
           |byte[] $out = new byte[$v.length * 2];
           |for (int $i = 0; $i < $v.length; $i++) {
           |  $out[2 * $i + 1] = (byte) ($v[$i] ^ 0x80);
           |}
           |${ev.value} = $out;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ---- Column wrappers -----------------------------------------------

  import org.apache.spark.sql.graftshim.{toColumn => column, toExpression => expression}

  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def hyperplaneSignBits(v: Column, planes: Seq[Seq[Double]]): Column = {
    val dim = planes.head.size
    column(HyperplaneSignBits(expression(v), planes.flatten.toArray, planes.size, dim))
  }

  def minhashSignature(hashes: Column, as: Seq[Long], bs: Seq[Long]): Column =
    column(MinHashSignature(expression(hashes), as.toArray, bs.toArray))

  def u8ToS16Le(bytes: Column): Column =
    column(U8ToS16Le(expression(bytes)))
}
