package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels for the ANN/dedup hot paths.
  *
  * Every corpus-sized similarity scan previously ran its inner product /
  * squared distance through `aggregate(zip_with(...))`: higher-order
  * functions are interpreted (no `doGenCode`), and `zip_with` materializes
  * an intermediate array per ROW before the fold walks it — per-element
  * lambda dispatch plus an allocation, multiplied by |corpus| × |queries|
  * rows on the brute-force paths. Each kernel here is a tight primitive
  * loop over the two `ArrayData` (no boxing, no intermediate array) that
  * stays inside whole-stage codegen, with an interpreted `nullSafeEval`
  * mirror for the fallback paths.
  *
  * Numeric parity with the HOFs they replace is exact: the loop
  * accumulates left-to-right in index order — the same fold order as
  * `aggregate` — and multiplies/casts identical per-element operands, so
  * every e6-rounded driver hash is unchanged by the swap.
  *
  * Null semantics: SQL-null result when either input is null, the
  * lengths disagree (`zip_with` pads the shorter side with nulls, which
  * nulls the fold — length mismatch was already a null upstream), or any
  * ELEMENT is null — the same result the `aggregate` fold produces when
  * a null element poisons its accumulator. The element check is gated
  * statically on the input types' `containsNull`, so the engine's own
  * null-free arrays (`transform` products over non-null lambdas) pay no
  * per-element branch; arrays that may carry nulls (parquet reads, the
  * public SQL registration) get the check instead of silently reading
  * null slots as 0 (r10 review finding).
  */
object VectorKernels {

  /** Java code reading element `i` of `arr` as double, per element type. */
  private[functions] def readAsDouble(arr: String, i: String, et: DataType): String =
    et match {
      case FloatType  => s"(double) $arr.getFloat($i)"
      case DoubleType => s"$arr.getDouble($i)"
      case LongType   => s"(double) $arr.getLong($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case other => throw new IllegalStateException(s"unsupported element type $other")
    }

  private[functions] def numericElem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (FloatType | DoubleType | LongType | IntegerType), _) => Some(et)
    case _ => None
  }

  private[functions] def mayHaveNullElems(dt: DataType): Boolean = dt match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  private[functions] def getAsDouble(a: ArrayData, i: Int, et: DataType): Double =
    et match {
      case FloatType  => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case LongType   => a.getLong(i).toDouble
      case IntegerType => a.getInt(i).toDouble
      case other => throw new IllegalStateException(s"unsupported element type $other")
    }
}

/** Σᵢ aᵢ·bᵢ as double over two numeric arrays (float/double/long/int
  * elements, independently typed per side — both cast to double before the
  * multiply, exactly the HOF's `cast(x as double) * cast(y as double)`).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => VectorKernels.numericElem(e.dataType).isDefined)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two numeric-element array inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private lazy val leftElem = VectorKernels.numericElem(left.dataType).get
  private lazy val rightElem = VectorKernels.numericElem(right.dataType).get
  private lazy val checkNulls =
    VectorKernels.mayHaveNullElems(left.dataType) ||
      VectorKernels.mayHaveNullElems(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
        acc += VectorKernels.getAsDouble(x, i, leftElem) *
          VectorKernels.getAsDouble(y, i, rightElem)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nullCheck = if (checkNulls)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += (${VectorKernels.readAsDouble(a, i, leftElem)})
         |      * (${VectorKernels.readAsDouble(b, i, rightElem)});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Σᵢ (aᵢ−bᵢ)² as long over two array<bigint> — the exact integer squared
  * distance of the e6-quantized unit vectors (IVF assignment, PQ Lloyd
  * assignment and query tables). Bounds: |aᵢ−bᵢ| ≤ 2e6 ⇒ each term ≤
  * 4e12, ≤ dim·4e12 total — no overflow at any dim the engine ships.
  */
case class LongSqDist(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_sq_dist"

  private lazy val checkNulls =
    VectorKernels.mayHaveNullElems(left.dataType) ||
      VectorKernels.mayHaveNullElems(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0L
      var i = 0
      while (i < n) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullCheck = if (checkNulls)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSqDist =
    copy(left = newLeft, right = newRight)
}

/** Σᵢ tabs[i][codes[i]] as long — the PQ asymmetric-distance scan: m
  * table lookups per compressed vector against the query's broadcast
  * per-subspace distance tables. codes is array<int> (or array<bigint>),
  * tabs array<array<bigint>>; codes are 0-based. SQL-null on length
  * mismatch, an out-of-range code, or a null table row (`element_at`'s
  * null, never an error — the scan must not die on a malformed code).
  */
case class AdcLookupSum(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(IntegerType | LongType, _) => true
      case _ => false
    }
    val tabsOk = right.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    if (codesOk && tabsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int|bigint> codes, array<array<bigint>> tabs), " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_lookup_sum"

  private lazy val codeIsLong = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tabs = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (n != tabs.numElements()) null
    else {
      var acc = 0L
      var i = 0
      while (i < n) {
        if (codes.isNullAt(i) || tabs.isNullAt(i)) return null
        val t = tabs.getArray(i)
        val c = if (codeIsLong) codes.getLong(i).toInt else codes.getInt(i)
        if (c < 0 || c >= t.numElements() || t.isNullAt(c)) return null
        acc += t.getLong(c)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val readCode =
        if (codeIsLong) s"(int) $a.getLong($i)" else s"$a.getInt($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    org.apache.spark.sql.catalyst.util.ArrayData $t = $b.getArray($i);
         |    int $c = $readCode;
         |    if ($c < 0 || $c >= $t.numElements() || $t.isNullAt($c)) { $bad = true; break; }
         |    $acc += $t.getLong($c);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookupSum =
    copy(left = newLeft, right = newRight)
}

/** All `nOut` deterministic-hyperplane projections of a numeric vector in
  * ONE pass: out[h] = Σᵢ xᵢ · ((i·a + (h+off)·c) mod m − s), i 1-based —
  * the shared shape of the LSH bucket planes (a=31, off=0, c=17, m=7,
  * s=3; h = t·4+p) and the Johnson–Lindenstrauss projection matrix
  * (a=37, off=41, c=23, m=11, s=5). Replaces a per-(row, plane)
  * interpreted `aggregate(zip_with(embedding, sequence(...)))` — nOut
  * HOF evaluations each allocating an index array and re-walking the
  * vector — with a single codegen'd nested loop. Inner loop ascends i,
  * the HOF's fold order, so every projection is bit-identical to the
  * spelling it replaces. Weights are exact small ints (all operands
  * ≥ 0, so Java % == SQL %).
  */
case class ModProjAll(
    child: Expression, nOut: Int, a: Int, off: Int, c: Int, m: Int, s: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(nOut >= 1, s"$prettyName needs nOut >= 1, got $nOut")

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorKernels.numericElem(child.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric-element array input, " +
        s"got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mod_proj_all"

  private lazy val elem = VectorKernels.numericElem(child.dataType).get
  private lazy val checkNulls = VectorKernels.mayHaveNullElems(child.dataType)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val d = x.numElements()
    if (checkNulls) {
      var i = 0
      while (i < d) { if (x.isNullAt(i)) return null; i += 1 }
    }
    val out = new Array[Double](nOut)
    var h = 0
    while (h < nOut) {
      var acc = 0.0
      var i = 0
      while (i < d) {
        val w = ((i + 1) * a + (h + off) * c) % m - s
        acc += VectorKernels.getAsDouble(x, i, elem) * w
        i += 1
      }
      out(h) = acc
      h += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      val nullCheck = if (checkNulls)
        s"""for (int $i = 0; $i < $d && !${ev.isNull}; $i++) {
           |  if ($x.isNullAt($i)) { ${ev.isNull} = true; }
           |}""".stripMargin
      else ""
      s"""
         |int $d = $x.numElements();
         |$nullCheck
         |if (!${ev.isNull}) {
         |double[] $out = new double[$nOut];
         |for (int $h = 0; $h < $nOut; $h++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    int $w = (($i + 1) * $a + ($h + $off) * $c) % $m - $s;
         |    $acc += (${VectorKernels.readAsDouble(x, i, elem)}) * $w;
         |  }
         |  $out[$h] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ModProjAll =
    copy(child = newChild)
}

/** Scalar-quantization (SQ8) asymmetric squared distance: the corpus side
  * is an `array<int>` of per-dimension 8-bit codes, the query side the
  * e6-quantized unit vector (`array<bigint>`), and `mn`/`span` are the
  * trained per-dimension quantizer bounds baked in as constants (they are
  * index parameters, not data — embedded like ModProjAll's plane params so
  * the corpus × queries scan carries no extra column). Per dimension the
  * code dequantizes by integer round-half-up
  * `recon = mn + (code·span·2 + 255) / 510` (numerator non-negative, so
  * truncating and flooring division agree across engines) and the kernel
  * accumulates Σ (q − recon)² as exact long arithmetic — the same
  * integer-oracle discipline as the PQ/IVF paths, inside whole-stage
  * codegen.
  */
case class Sq8Dist(left: Expression, right: Expression,
    mn: Seq[Long], span: Seq[Long]) extends BinaryExpression {

  require(mn.length == span.length,
    s"$prettyName: mn/span length mismatch (${mn.length} vs ${span.length})")

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(IntegerType | LongType, _) => true
      case _ => false
    }
    val qOk = right.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (codesOk && qOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int|bigint> codes, array<bigint> query), " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_dist"

  private lazy val codeIsLong = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  @transient private lazy val mnArr: Array[Long] = mn.toArray
  @transient private lazy val spanArr: Array[Long] = span.toArray

  private lazy val checkNulls =
    VectorKernels.mayHaveNullElems(left.dataType) ||
      VectorKernels.mayHaveNullElems(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val q = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (n != q.numElements() || n != mnArr.length) null
    else {
      var acc = 0L
      var i = 0
      while (i < n) {
        if (checkNulls && (codes.isNullAt(i) || q.isNullAt(i))) return null
        val c = if (codeIsLong) codes.getLong(i) else codes.getInt(i).toLong
        val sp = spanArr(i)
        val recon = mnArr(i) + (if (sp == 0L) 0L else (c * sp * 2L + 255L) / 510L)
        val diff = q.getLong(i) - recon
        acc += diff * diff
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mnRef = ctx.addReferenceObj("sq8mn", mnArr, "long[]")
      val spRef = ctx.addReferenceObj("sq8span", spanArr, "long[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      val sp = ctx.freshName("sp")
      val recon = ctx.freshName("recon")
      val diff = ctx.freshName("diff")
      val readCode =
        if (codeIsLong) s"$a.getLong($i)" else s"(long) $a.getInt($i)"
      val nullCheck = if (checkNulls)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n != $mnRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    long $c = $readCode;
         |    long $sp = $spRef[$i];
         |    long $recon = $mnRef[$i] + ($sp == 0L ? 0L : ($c * $sp * 2L + 255L) / 510L);
         |    long $diff = $b.getLong($i) - $recon;
         |    $acc += $diff * $diff;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Dist =
    copy(left = newLeft, right = newRight)
}
