package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  /** In-place element read (no per-evaluation array copy: a
    * toFloatArray()/toDoubleArray() here would allocate per PAIR in the
    * similarity joins — getFloat/getDouble on UnsafeArrayData is a
    * direct word read).
    */
  protected def elemAt(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Codegen snippet for an in-place element read as double. */
  protected def genElemAt(in: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $in.getFloat($i)" else s"$in.getDouble($i)"
}

/** cosine(a, b) = dot(a,b) / (||a|| * ||b||), computed in double.
  * Null if either input is null; NaN if either norm is 0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val ya = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), ya.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val x = elemAt(xa, i, leftIsFloat); val y = elemAt(ya, i, rightIsFloat)
      dot += x * y; nx += x * x; ny += y * y; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = Math.min($xa.numElements(), $ya.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${genElemAt(xa, i, leftIsFloat)};
         |  double $y = ${genElemAt(ya, i, rightIsFloat)};
         |  $dot += $x * $y;
         |  $nx += $x * $x;
         |  $ny += $y * $y;
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
    val xa = a.asInstanceOf[ArrayData]
    val ya = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), ya.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      dot += elemAt(xa, i, leftIsFloat) * elemAt(ya, i, rightIsFloat); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($xa.numElements(), $ya.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (${genElemAt(xa, i, leftIsFloat)}) * (${genElemAt(ya, i, rightIsFloat)});
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

  // Reads ArrayData elements in place (getLong is a direct word read on
  // UnsafeArrayData) — a toLongArray() per evaluation would copy both
  // operands per PAIR, and that allocation churn, not the merge itself,
  // dominated the pair join (observed ~2x on the sf0.1 jaccard query).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $n++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity |A∩B| / |A∪B| for two SORTED duplicate-free long
  * arrays — [[SortedIntersectCount]] fused with the union-size
  * arithmetic so the pair join evaluates ONE expression per pair
  * (intersect + two size() + div as separate plan nodes measurably
  * drag the 600k-pair sf0.1 join). Empty∪empty yields NaN, matching
  * 0/0 double division.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sorted_jaccard"
  override def dataType: DataType = DoubleType

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
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n.toDouble / (nx.toLong + ny.toLong - n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $n++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = (double) $n / ((long) $nx + (long) $ny - $n);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** FIRST common element of two SORTED duplicate-free long arrays, or
  * -1 if none (callers use non-negative domains — dense ranks). The
  * deduplication primitive of the prefix-filter pair join: a candidate
  * pair is generated once per shared prefix element, and keeping only
  * the row whose join key equals the smallest shared element emits each
  * pair EXACTLY once — no distinct(), no post-join shuffle. Same
  * zero-allocation O(n+m) merge discipline as [[SortedIntersectCount]],
  * but with early exit at the first match (for near-dup pairs that is
  * typically after one or two comparisons).
  */
case class SortedFirstCommon(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sorted_first_common"
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
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) return xv
      else if (xv < yv) i += 1
      else j += 1
    }
    -1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0;
         |${ev.value} = -1L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { ${ev.value} = $xv; break; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b) for two `array<bigint>` operands in EXACT long arithmetic
  * — the scoring kernel for int8-quantized ANN (reference capability:
  * similarity scoring; quantized variant per FAISS-style SQ8 scan). A
  * 64-dim unit-scaled int8 pair peaks at 64 * 127^2 ≈ 1.03e6, so the
  * long accumulator can never overflow for any realistic embedding
  * width, and — unlike the float kernel — the result is
  * order-independent, which is what lets a DuckDB oracle replay the
  * whole ANN query bit-for-bit.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "long_dot_product"
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
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // strict, like DuckDB's list_dot_product: a silent min-length dot
    // would quietly score a dim-mismatched corpus with wrong buckets
    // while the oracle errors loudly — fail the same way on both sides
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"$prettyName: length mismatch $n vs ${y.numElements()}")
    var dot = 0L; var i = 0
    while (i < n) { dot += x.getLong(i) * y.getLong(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n)
         |  throw new IllegalArgumentException(
         |    "long_dot_product: length mismatch " + $n + " vs " + $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** array<bigint> (int8-range values) → binary, one signed byte per
  * element — the wire format of the int8 ANN joins. An UnsafeArrayData
  * of longs costs 8 bytes per element on the shuffle; packed bytes cost
  * one: 8x smaller candidate-join rows (4x vs the float32 original).
  * Values MUST be in [-128, 127] (the unit-int8 quantizer guarantees
  * [-127, 127]); out-of-range input throws rather than silently
  * truncating.
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def prettyName: String = "pack_int8"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${dt.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = x.getLong(i)
      if (v < Byte.MinValue || v > Byte.MaxValue)
        throw new IllegalArgumentException(s"pack_int8: $v out of byte range")
      out(i) = v.toByte; i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i);
         |  if ($v < -128L || $v > 127L)
         |    throw new IllegalArgumentException("pack_int8: out of byte range");
         |  $out[$i] = (byte) $v;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** dot(a, b) over two packed-int8 `binary` operands in exact long
  * arithmetic — the pair-scoring kernel of the int8 ANN joins
  * ([[PackInt8]] is the producer). Bytes are SIGNED, matching the
  * packer; the long accumulator is overflow-free for any realistic
  * width (127^2 per element).
  */
case class ByteDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "byte_dot_product"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary args, " +
          s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = x.length
    // strict for the same reason as long_dot_product
    if (y.length != n)
      throw new IllegalArgumentException(
        s"$prettyName: length mismatch $n vs ${y.length}")
    var dot = 0L; var i = 0
    while (i < n) { dot += x(i).toLong * y(i).toLong; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.length;
         |if ($b.length != $n)
         |  throw new IllegalArgumentException(
         |    "byte_dot_product: length mismatch " + $n + " vs " + $b.length);
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Kernel behind [[IvfProbesInt8]] — kept as a plain static-shaped
  * method so generated code can call it.
  */
object VectorKernels {

  /** Ids of the `nProbe` nearest IVF cells for a unit-quantized vector
    * by the exact long metric d(c) = |m_c|^2 - 2 x·m_c, ties broken by
    * lower cell id — the identical ordering to sorting (d, i) structs,
    * which is what the DuckDB oracle replays. `mm` carries the
    * precomputed |m_c|^2 terms. Partial selection is O(nCells x
    * nProbe), fine for any realistic probe count.
    */
  def ivfNearestCells(
      x: ArrayData, cents: Array[Array[Long]], mm: Array[Long],
      nProbe: Int): ArrayData = {
    val k = cents.length
    val n = math.min(nProbe, k)
    val ds = new Array[Long](k)
    var c = 0
    while (c < k) {
      val m = cents(c)
      val len = math.min(m.length, x.numElements())
      var dot = 0L
      var i = 0
      while (i < len) { dot += x.getLong(i) * m(i); i += 1 }
      ds(c) = mm(c) - 2L * dot
      c += 1
    }
    val out = new Array[Int](n)
    val used = new Array[Boolean](k)
    var j = 0
    while (j < n) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!used(c2) && (best < 0 || ds(c2) < ds(best))) best = c2
        c2 += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Kernel behind [[UnitQuantizeInt8]]: qn[i] = round(v[i] / ||v||_2
    * * 127) in EXACTLY the arithmetic sequence of the former HOF chain
    * (and of the DuckDB replay): elements widened to double, the norm
    * accumulated as an IN-ORDER left fold of doubles, each element
    * scaled as (d / nrm) * 127.0, rounded with Spark `round(double,
    * 0)` semantics — BigDecimal.valueOf(x).setScale(0, HALF_UP)
    * .toDouble — then narrowed to long (integral after rounding, so
    * exact). Returns NULL exactly where the chain's row was
    * dropped/nulled: a null element (poisons the fold through
    * `acc + null`) or a zero norm (the nullif guard). A NaN/Infinite
    * scaled value (only reachable from non-finite embedding input)
    * fails loudly, as the chain's ANSI bigint cast did.
    */
  def unitQuantizeInt8(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val d = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      s += d * d
      i += 1
    }
    val nrm = math.sqrt(s)
    if (nrm == 0.0) return null
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      val d = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val x = d / nrm * 127.0
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
        throw new ArithmeticException(
          s"unit_quantize_int8: non-finite scaled value $x " +
            "(non-finite embedding input)")
      out(i) = java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** unit_quantize_int8(embedding): the whole [[Similarity
  * .withUnitQuantized]] per-row pipeline — widen to double, L2
  * normalize, scale to int8 range, HALF_UP round — as ONE codegen'd
  * kernel call. The former spelling was a chain of higher-order
  * functions (transform / aggregate), which evaluate an INTERPRETED
  * lambda per element with boxed accumulators and a per-element
  * BigDecimal round: measured ~0.3 ms/row (r19 probe: a 2000-row
  * quantize pass cost ~0.6 s, and the codebook-training loop that
  * replays it per iteration ~2 s per iteration), multiplied again
  * wherever projection collapse duplicated the chain into several
  * consumers (the `cell` projection AND the posexplode generator).
  * Arithmetic is bit-identical to the chain — see
  * [[VectorKernels.unitQuantizeInt8]]; pinned by FunctionsSpec
  * (kernel == HOF chain element-wise) and the unchanged DuckDB
  * oracles over the whole knn/embed family.
  */
case class UnitQuantizeInt8(child: Expression) extends UnaryExpression {

  override def prettyName: String = "unit_quantize_int8"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>/array<double>, " +
            s"got ${dt.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    VectorKernels.unitQuantizeInt8(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.VectorKernels.unitQuantizeInt8($c, $isFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ivf_probes_int8(qn): the `nProbe` nearest IVF cell ids for a
  * unit-quantized vector — the REPLACEMENT for unrolling one
  * `struct(|m|^2 - 2 x·m, i)` expression PER CELL and array_sort-ing
  * the lot: that expression tree is O(nCells) operators, so past ~100
  * cells it bursts whole-stage codegen's method limits and the whole
  * projection falls back to interpreted eval (measured: a 256-cell
  * assignment over 250k vectors effectively hung — this kernel does it
  * in seconds). nCells is THE scale knob for IVF at corpus size, so
  * assignment cost must not be an expression-tree size. Codebook rides
  * along as a reference object (driver-sized, k x dim longs);
  * coefficients are Seq for value equality so identical calls
  * canonicalize together for subplan reuse.
  */
case class IvfProbesInt8(
    child: Expression, cents: Seq[Seq[Long]], nProbe: Int)
    extends UnaryExpression {
  require(cents.nonEmpty && nProbe >= 1, "need cells and nProbe >= 1")

  override def prettyName: String = "ivf_probes_int8"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${dt.catalogString}")
    }

  @transient private lazy val centArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  @transient private lazy val mmArr: Array[Long] =
    centArr.map(m => m.map(v => v * v).sum)

  override def nullSafeEval(a: Any): Any =
    VectorKernels.ivfNearestCells(
      a.asInstanceOf[ArrayData], centArr, mmArr, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", centArr, "long[][]")
    val mRef = ctx.addReferenceObj("ivfMm", mmArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.ivfNearestCells($c, $cRef, $mRef, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

  def sorted_jaccard(a: Column, b: Column): Column =
    Bridge.column(SortedJaccard(Bridge.expression(a), Bridge.expression(b)))

  def sorted_first_common(a: Column, b: Column): Column =
    Bridge.column(SortedFirstCommon(Bridge.expression(a), Bridge.expression(b)))

  def long_dot_product(a: Column, b: Column): Column =
    Bridge.column(LongDotProduct(Bridge.expression(a), Bridge.expression(b)))

  def pack_int8(a: Column): Column =
    Bridge.column(PackInt8(Bridge.expression(a)))

  def byte_dot_product(a: Column, b: Column): Column =
    Bridge.column(ByteDotProduct(Bridge.expression(a), Bridge.expression(b)))

  def ivf_probes_int8(
      a: Column, cents: Seq[Seq[Long]], nProbe: Int): Column =
    Bridge.column(IvfProbesInt8(Bridge.expression(a), cents, nProbe))

  def unit_quantize_int8(a: Column): Column =
    Bridge.column(UnitQuantizeInt8(Bridge.expression(a)))
}
