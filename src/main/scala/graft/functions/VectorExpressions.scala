package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for embedding-vector math.
  *
  * Rationale (SURVEY §7.4): Spark's higher-order functions
  * (`zip_with` + `aggregate`) can express a dot product, but they
  * evaluate an interpreted lambda per element with boxed accumulators —
  * at 64 floats x millions of rows that dominates the ANN scan. These
  * expressions read the underlying primitive arrays directly and
  * generate a tight Java loop via `doGenCode`, keeping the whole
  * similarity scan inside whole-stage codegen.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> args, " +
          s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Pull a primitive double[] out of either array element type. */
  protected def toDoubles(a: Any, isFloat: Boolean): Array[Double] = {
    val arr = a.asInstanceOf[ArrayData]
    if (isFloat) {
      val f = arr.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
      out
    } else arr.toDoubleArray()
  }

  /** Codegen snippet producing a double[] local named `out`. */
  protected def genToDoubles(
      ctx: CodegenContext, in: String, out: String, isFloat: Boolean): String =
    if (isFloat) {
      val f = ctx.freshName("f")
      val i = ctx.freshName("i")
      s"""
         |float[] $f = $in.toFloatArray();
         |double[] $out = new double[$f.length];
         |for (int $i = 0; $i < $f.length; $i++) { $out[$i] = (double) $f[$i]; }
       """.stripMargin
    } else s"double[] $out = $in.toDoubleArray();\n"
}

/** cosine(a, b) = dot(a,b) / (||a|| * ||b||), computed in double.
  * Null if either input is null; NaN if either norm is 0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = toDoubles(a, leftIsFloat)
    val ya = toDoubles(b, rightIsFloat)
    val n = math.min(xa.length, ya.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      dot += xa(i) * ya(i); nx += xa(i) * xa(i); ny += ya(i) * ya(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xa = ctx.freshName("xa")
      val ya = ctx.freshName("ya")
      s"""
         |${genToDoubles(ctx, x, xa, leftIsFloat)}
         |${genToDoubles(ctx, y, ya, rightIsFloat)}
         |int $n = Math.min($xa.length, $ya.length);
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $xa[$i] * $ya[$i];
         |  $nx += $xa[$i] * $xa[$i];
         |  $ny += $ya[$i] * $ya[$i];
         |}
         |${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b) in double — same codegen structure as cosine. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = toDoubles(a, leftIsFloat)
    val ya = toDoubles(b, rightIsFloat)
    val n = math.min(xa.length, ya.length)
    var dot = 0.0; var i = 0
    while (i < n) { dot += xa(i) * ya(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val xa = ctx.freshName("xa")
      val ya = ctx.freshName("ya")
      s"""
         |${genToDoubles(ctx, x, xa, leftIsFloat)}
         |${genToDoubles(ctx, y, ya, rightIsFloat)}
         |int $n = Math.min($xa.length, $ya.length);
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $xa[$i] * $ya[$i];
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| for two SORTED long arrays (single merge pass, primitive
  * arrays, codegen'd). The set-similarity kernel behind n-gram Jaccard
  * dedup: `ArrayIntersect` builds a boxed hash set per evaluation,
  * which dominates pair-join dedup at scale; this is O(n+m) with zero
  * allocation.
  *
  * Inputs MUST be sorted ascending and duplicate-free
  * (`sort_array(array_distinct(...))`) — the caller owns that
  * invariant; it is computed once per document, not per pair.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> args, " +
          s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    var i = 0; var j = 0; var n = 0L
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { n += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      s"""
         |long[] $x = $a.toLongArray();
         |long[] $y = $b.toLongArray();
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $x.length && $j < $y.length) {
         |  if ($x[$i] == $y[$j]) { $n++; $i++; $j++; }
         |  else if ($x[$i] < $y[$j]) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points. */
object vector {
  import org.apache.spark.sql.graftbridge.Bridge

  def cosine_similarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def sorted_intersect_count(a: Column, b: Column): Column =
    Bridge.column(
      SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
