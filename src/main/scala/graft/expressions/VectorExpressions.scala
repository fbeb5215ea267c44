package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd cosine similarity over two `array<float>` columns.
  *
  * The composed higher-order-function form ([[graft.functions.VectorOps]])
  * is CodegenFallback-interpreted and allocates a lambda frame per element —
  * measured 45 s for the 2M-pair near-dup self-join at sf0.1. This fused
  * whole-stage-codegen kernel is the hot-path replacement; it keeps the
  * exact same accumulation order (left-to-right per accumulator, all math
  * in double) so results are bit-identical with the HOF form and the
  * DuckDB oracle.
  *
  * Semantics: cosine over the common prefix for the dot product, each
  * array's full length for its own norm (arrays are same-dim in practice);
  * zero-norm input → 0.0 (matches VectorOps.cosineSim).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<float> (ExpectsInputTypes needs private[sql]
  // AbstractDataType, so the contract is enforced by the callers in
  // VectorExpressions / operators instead of the analyzer).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    var j = n
    while (j < nx) { val v = x.getFloat(j).toDouble; na += v * v; j += 1 }
    j = n
    while (j < ny) { val v = y.getFloat(j).toDouble; nb += v * v; j += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val den = ctx.freshName("den")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |final int $n = java.lang.Math.min($nx, $ny);
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = (double) $a.getFloat($i);
         |  final double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv;
         |  $na += $xv * $xv;
         |  $nb += $yv * $yv;
         |}
         |for (int $j = $n; $j < $nx; $j++) {
         |  final double $xv = (double) $a.getFloat($j);
         |  $na += $xv * $xv;
         |}
         |for (int $j = $n; $j < $ny; $j++) {
         |  final double $yv = (double) $b.getFloat($j);
         |  $nb += $yv * $yv;
         |}
         |final double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd PQ subspace encoder: the argmin-distance centroid code of
  * one `dsub`-wide slice (starting at `offset`) of an `array<float>`
  * embedding against a literal codebook (`cents`, row-major flattened —
  * centroid `c`'s dims at `c*dsub until (c+1)*dsub`). Ties break to the
  * LOWEST code (strict `<` keeps the first argmin), matching the HOF
  * form's `array_position(d, array_min(d))` first-occurrence rule and
  * the oracle's `ORDER BY dist, code`.
  *
  * Exists for the same reason as [[CosineSimilarity]]: the
  * transform/zip_with/aggregate encode tree is CodegenFallback — every
  * encoded row paid k* × dsub interpreted, boxed ops per subspace,
  * which is the dominant cost of an IVF-PQ layout build at corpus
  * scale. The IEEE op order is identical (per-dim float→double cast,
  * subtract, square, left-fold add; centroids already double), so codes
  * are bit-identical — the hash-exact oracle mirror of
  * `ann_pq_adc_topk` exercises encode end-to-end and pins this.
  */
case class PqSubspaceCode(
    child: Expression, cents: Seq[Double], dsub: Int, offset: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val centArr: Array[Double] = cents.toArray

  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_subspace_code"

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val k = centArr.length / dsub
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < k) {
      var acc = 0.0
      var j = 0
      while (j < dsub) {
        val d = x.getFloat(offset + j).toDouble - centArr(c * dsub + j)
        acc += d * d
        j += 1
      }
      if (acc < bd) { bd = acc; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centsRef = ctx.addReferenceObj("pqCents", centArr, "double[]")
      val k = centArr.length / dsub
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      s"""
         |int $best = 0;
         |double $bd = Double.MAX_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $dsub; $j++) {
         |    final double $d = (double) $a.getFloat($offset + $j) - $centsRef[$c * $dsub + $j];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $bd) { $bd = $acc; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqSubspaceCode =
    copy(child = newChild)
}

/** Codegen'd IVF cell assignment: the argmax-cosine centroid index of an
  * `array<float>` embedding against a literal centroid set (`cents`,
  * row-major flattened floats widened exactly to double — centroid `c`'s
  * dims at `c*dim until (c+1)*dim`). Strict `>` keeps the FIRST
  * maximizer (lowest cell), zero denominator scores 0.0 — both matching
  * the oracle's `ORDER BY sim DESC, c` / zero-den CASE
  * ([[graft.AnnOracle]] `cellCtes`) and the Scala-closure form this
  * kernel replaced.
  *
  * Exists for the same reason as [[PqSubspaceCode]]: the closure UDF
  * deserialized every embedding to a boxed `Seq[Float]` per row — at the
  * 10⁶-vector ANN build the assignment pass was 326.5 s of the 437.7 s
  * total (SCALE_EVIDENCE `ann_build`, r15), pure (de)boxing around
  * ~512 flops/row. The IEEE op order is identical (per-dim float→double
  * cast, dot/na/nb accumulated left to right, per-cell den =
  * sqrt(na)·sqrt(nb)), so assignments are bit-identical — spec-pinned
  * against the closure form, and every hash-green IVF oracle row
  * exercises it end to end.
  */
case class IvfCellAssign(child: Expression, cents: Seq[Double], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val centArr: Array[Double] = cents.toArray

  /** √‖centroid_c‖², hoisted to construction: the centroid norm is a
    * per-centroid constant and the embedding norm a per-row constant, so
    * the per-(row, cell) inner loop carries ONLY the dot product — one
    * multiply-add per dim instead of the three the first cut streamed.
    * Bit-identical to the fused form: each norm is the same left fold of
    * yv·yv (resp. xv·xv) in ascending dim order the fused loop ran —
    * interleaving three independent accumulators never changes any of
    * them — and √ of the same double is the same double.
    */
  @transient private lazy val centSqrtNorm: Array[Double] = {
    val k = centArr.length / dim
    Array.tabulate(k) { c =>
      var nb = 0.0
      var i = 0
      while (i < dim) { val yv = centArr(c * dim + i); nb += yv * yv; i += 1 }
      math.sqrt(nb)
    }
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_cell_assign"

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    // A row shorter than the trained dim must fail loudly: UnsafeArrayData
    // getFloat past numElements() reads arbitrary buffer bytes, so without
    // this guard a corrupt/mixed-dim embedding silently lands in an
    // arbitrary cell (the closure UDF this kernel replaced threw
    // IndexOutOfBoundsException — keep that contract).
    if (x.numElements() < dim) {
      throw new IllegalArgumentException(
        s"ivf_cell_assign: embedding has ${x.numElements()} dims, trained dim is $dim")
    }
    val k = centArr.length / dim
    var na = 0.0
    var i0 = 0
    while (i0 < dim) {
      val xv = x.getFloat(i0).toDouble; na += xv * xv; i0 += 1
    }
    val sqrtNa = math.sqrt(na)
    var best = 0
    var bestSim = -Double.MaxValue
    var c = 0
    while (c < k) {
      var dot = 0.0
      var i = 0
      while (i < dim) {
        dot += x.getFloat(i).toDouble * centArr(c * dim + i)
        i += 1
      }
      val den = sqrtNa * centSqrtNorm(c)
      val sim = if (den == 0.0) 0.0 else dot / den
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centsRef = ctx.addReferenceObj("ivfCents", centArr, "double[]")
      val normsRef = ctx.addReferenceObj("ivfCentNorms", centSqrtNorm, "double[]")
      val k = centArr.length / dim
      val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val xv = ctx.freshName("xv")
      val sqrtNa = ctx.freshName("sqrtNa")
      val den = ctx.freshName("den")
      val sim = ctx.freshName("sim")
      s"""
         |if ($a.numElements() < $dim) {
         |  throw new IllegalArgumentException(
         |    "ivf_cell_assign: embedding has " + $a.numElements() +
         |    " dims, trained dim is $dim");
         |}
         |double $na = 0.0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  final double $xv = (double) $a.getFloat($i);
         |  $na += $xv * $xv;
         |}
         |final double $sqrtNa = java.lang.Math.sqrt($na);
         |int $best = 0;
         |double $bestSim = -Double.MAX_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $dot += (double) $a.getFloat($i) * $centsRef[$c * $dim + $i];
         |  }
         |  final double $den = $sqrtNa * $normsRef[$c];
         |  final double $sim = ($den == 0.0) ? 0.0 : $dot / $den;
         |  if ($sim > $bestSim) { $bestSim = $sim; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IvfCellAssign =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.graftshim.GraftSqlShim

  /** Column form of [[CosineSimilarity]] for DataFrame pipelines. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlShim.column(
      CosineSimilarity(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** Column form of [[PqSubspaceCode]]: `cents` row-major flattened. */
  def pqSubspaceCode(
      emb: Column, cents: Seq[Double], dsub: Int, offset: Int): Column =
    GraftSqlShim.column(
      PqSubspaceCode(GraftSqlShim.expression(emb), cents, dsub, offset))

  /** Column form of [[IvfCellAssign]]: `centroids` as trained (floats,
    * widened exactly inside).
    */
  def ivfCellAssign(emb: Column, centroids: Array[Array[Float]]): Column =
    GraftSqlShim.column(IvfCellAssign(
      GraftSqlShim.expression(emb),
      centroids.iterator.flatten.map(_.toDouble).toSeq,
      centroids.head.length))
}
