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

/** Codegen'd murmur-hyperplane LSH signature of an `array<float>`
  * embedding — [[graft.operators.Ann.signature]] as a native kernel.
  *
  * Exists for the join tier ([[graft.operators.Ann.lshJoin]]) and the
  * signature-partitioned layout writers, whose QUERY/CORPUS sides are
  * corpus-sized: the closure UDF this replaces deserialized every
  * embedding to a boxed `Seq[Float]` per row — the same boxing class
  * [[IvfCellAssign]] removed from the IVF build for 22.6× (r17 verdict
  * "What's wrong" #2). The plane matrix is the memoized pure-murmur
  * constant table ([[graft.operators.Ann.planes]], fetched per row by a
  * map hit — nanoseconds against the nBits×dim flops). The IEEE op
  * order is identical to [[graft.operators.Ann.signature]]: per-dim
  * `Float * Float` product (single precision, widened AFTER rounding —
  * the form the DuckDB mirror replays) accumulated into a double left
  * fold in ascending dim order, bit b set iff dot >= 0 — spec-pinned
  * bit-identical against the Scala form, and every hash-green murmur
  * LSH oracle row replays it.
  */
case class LshSignature(child: Expression, nBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_signature"

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dim = x.numElements()
    val p = graft.operators.Ann.planes(nBits, dim)
    var sig = 0
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += x.getFloat(i) * p(b * dim + i); i += 1 }
      if (dot >= 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val dim = ctx.freshName("dim")
      val p = ctx.freshName("planes")
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |final int $dim = $a.numElements();
         |final float[] $p =
         |  graft.operators.Ann$$.MODULE$$.planes($nBits, $dim);
         |int $sig = 0;
         |for (int $b = 0; $b < $nBits; $b++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $dot += $a.getFloat($i) * $p[$b * $dim + $i];
         |  }
         |  if ($dot >= 0) $sig |= (1 << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

/** Codegen'd top-`nProbe` IVF cell probe: the `nProbe` highest-cosine
  * centroid indices of an `array<float>` embedding —
  * [[graft.operators.Ann.nearestCells]] as a native kernel, the
  * [[IvfCellAssign]] treatment extended from argmax to top-n for the
  * distributed-join tier ([[graft.operators.Ann.ivfJoin]] /
  * [[graft.operators.Ann.ivfPqJoin]]), whose query side is corpus-sized
  * by contract (r17 verdict "What's wrong" #2).
  *
  * Bit-identical to `nearestCells`: same per-cell cosine (per-dim
  * float→double cast, left folds in ascending dim order; the embedding
  * norm and per-centroid norms are hoisted exactly like
  * [[IvfCellAssign]] — independent accumulators, value-identical), and
  * the top-n selection replays the `sortBy((-(sim + 0.0), c))` order: a
  * strict primitive `>` treats ±0.0 as equal (which is what the `+ 0.0`
  * normalization buys the boxed sort) and keeps the LOWEST cell on
  * ties, round by round. Spec-pinned against `nearestCells` on
  * adversarial vectors; rows shorter than the trained dim throw (the
  * IvfCellAssign bounds contract).
  *
  * With `ratio > 0` the probe set is QUERY-ADAPTIVE (dynamic nProbe —
  * the IVF analog of the margin-ordered LSH multiprobe): cells are
  * taken in the same best-first order but emission stops once a cell's
  * cosine distance exceeds `ratio × (1 − s₁)` (s₁ = the best cell's
  * cosine), so a query deep inside a cell pays one probe while a
  * boundary query spends the full `nProbe` budget where recall is
  * actually at risk. The cut is monotone along the probe order, so the
  * SQL mirror replays it as a rank + predicate over the same floored
  * arithmetic; ratio = 0 is exactly the fixed top-`nProbe` kernel.
  */
case class IvfCellProbes(
    child: Expression, cents: Seq[Double], dim: Int, nProbe: Int,
    ratio: Double = 0.0)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val centArr: Array[Double] = cents.toArray

  @transient private lazy val centSqrtNorm: Array[Double] = {
    val k = centArr.length / dim
    Array.tabulate(k) { c =>
      var nb = 0.0
      var i = 0
      while (i < dim) { val yv = centArr(c * dim + i); nb += yv * yv; i += 1 }
      math.sqrt(nb)
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_cell_probes"

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < dim) {
      throw new IllegalArgumentException(
        s"ivf_cell_probes: embedding has ${x.numElements()} dims, trained dim is $dim")
    }
    val k = centArr.length / dim
    var na = 0.0
    var i0 = 0
    while (i0 < dim) { val xv = x.getFloat(i0).toDouble; na += xv * xv; i0 += 1 }
    val sqrtNa = math.sqrt(na)
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += x.getFloat(i).toDouble * centArr(c * dim + i); i += 1 }
      val den = sqrtNa * centSqrtNorm(c)
      sims(c) = if (den == 0.0) 0.0 else dot / den
      c += 1
    }
    val n = math.min(nProbe, k)
    val out = new Array[Int](n)
    val chosen = new Array[Boolean](k)
    var firstDist = 0.0
    var taken = 0
    var r = 0
    while (r < n) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!chosen(c2) && (best < 0 || sims(c2) > sims(best))) best = c2
        c2 += 1
      }
      if (r == 0) firstDist = 1.0 - sims(best)
      if (r > 0 && ratio > 0.0 && (1.0 - sims(best)) > ratio * firstDist) {
        r = n // adaptive cut: probes are best-first, so stop at the first miss
      } else {
        chosen(best) = true
        out(r) = best
        taken += 1
        r += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      if (taken == n) out else java.util.Arrays.copyOf(out, taken))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val centsRef = ctx.addReferenceObj("ivfProbeCents", centArr, "double[]")
      val normsRef = ctx.addReferenceObj("ivfProbeNorms", centSqrtNorm, "double[]")
      val k = centArr.length / dim
      val n = math.min(nProbe, k)
      val na = ctx.freshName("na")
      val xv = ctx.freshName("xv")
      val sqrtNa = ctx.freshName("sqrtNa")
      val sims = ctx.freshName("sims")
      val chosen = ctx.freshName("chosen")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val c2 = ctx.freshName("c2")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val den = ctx.freshName("den")
      val r = ctx.freshName("r")
      val best = ctx.freshName("best")
      val firstDist = ctx.freshName("firstDist")
      val taken = ctx.freshName("taken")
      s"""
         |if ($a.numElements() < $dim) {
         |  throw new IllegalArgumentException(
         |    "ivf_cell_probes: embedding has " + $a.numElements() +
         |    " dims, trained dim is $dim");
         |}
         |double $na = 0.0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  final double $xv = (double) $a.getFloat($i);
         |  $na += $xv * $xv;
         |}
         |final double $sqrtNa = java.lang.Math.sqrt($na);
         |final double[] $sims = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $dot += (double) $a.getFloat($i) * $centsRef[$c * $dim + $i];
         |  }
         |  final double $den = $sqrtNa * $normsRef[$c];
         |  $sims[$c] = ($den == 0.0) ? 0.0 : $dot / $den;
         |}
         |final boolean[] $chosen = new boolean[$k];
         |final int[] $out = new int[$n];
         |double $firstDist = 0.0;
         |int $taken = 0;
         |for (int $r = 0; $r < $n; $r++) {
         |  int $best = -1;
         |  for (int $c2 = 0; $c2 < $k; $c2++) {
         |    if (!$chosen[$c2] && ($best < 0 || $sims[$c2] > $sims[$best])) $best = $c2;
         |  }
         |  if ($r == 0) $firstDist = 1.0 - $sims[$best];
         |  if ($r > 0 && $ratio > 0.0 && (1.0 - $sims[$best]) > $ratio * $firstDist) {
         |    break; // adaptive cut: probes are best-first — stop at the first miss
         |  }
         |  $chosen[$best] = true;
         |  $out[$r] = $best;
         |  $taken++;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(($taken == $n)
         |    ? $out : java.util.Arrays.copyOf($out, $taken));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IvfCellProbes =
    copy(child = newChild)
}

/** Codegen'd hashed-feature margin for the quality classifier
  * ([[graft.operators.QualityModel]]): Σ cn·w(bucket) over an
  * `array<struct<bucket:int, cn:bigint>>` feature row against a LITERAL
  * micro-grid weight vector. Replaces the interpreted HOF fold
  * (`aggregate(feats, 0L, acc + cn * element_at(w, bucket + 1))`, a
  * CodegenFallback that allocates a lambda frame per feature and
  * carries a 4097-element array literal in the plan). Exact Long
  * arithmetic, identical accumulation — Long sums are order-free, so
  * the result is bit-identical to the HOF form and the DuckDB oracle.
  */
case class MarginMicros(child: Expression, weights: Seq[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val wArr: Array[Long] = weights.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "margin_micros"

  protected override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val f = x.getStruct(i, 2)
      acc += f.getLong(1) * wArr(f.getInt(0))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wRef = ctx.addReferenceObj("marginWeights", wArr, "long[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val f = ctx.freshName("f")
      s"""
         |final int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final org.apache.spark.sql.catalyst.InternalRow $f = $a.getStruct($i, 2);
         |  $acc += $f.getLong(1) * $wRef[$f.getInt(0)];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MarginMicros =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.graftshim.GraftSqlShim

  /** Column form of [[CosineSimilarity]] for DataFrame pipelines. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlShim.column(
      CosineSimilarity(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  /** Column form of [[MarginMicros]] for the quality-model paths. */
  def marginMicros(feats: Column, weights: Seq[Long]): Column =
    GraftSqlShim.column(MarginMicros(GraftSqlShim.expression(feats), weights))

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

  /** Column form of [[LshSignature]]. */
  def lshSignature(emb: Column, nBits: Int): Column =
    GraftSqlShim.column(LshSignature(GraftSqlShim.expression(emb), nBits))

  /** Column form of [[IvfCellProbes]]: `centroids` as trained. */
  def ivfCellProbes(
      emb: Column, centroids: Array[Array[Float]], nProbe: Int): Column =
    GraftSqlShim.column(IvfCellProbes(
      GraftSqlShim.expression(emb),
      centroids.iterator.flatten.map(_.toDouble).toSeq,
      centroids.head.length,
      nProbe))

  /** Column form of [[IvfCellProbes]] with the query-adaptive
    * distance-ratio cut (`ratio` × the best cell's cosine distance,
    * probes capped at `nProbeMax`).
    */
  def ivfCellProbesAdaptive(
      emb: Column, centroids: Array[Array[Float]],
      nProbeMax: Int, ratio: Double): Column =
    GraftSqlShim.column(IvfCellProbes(
      GraftSqlShim.expression(emb),
      centroids.iterator.flatten.map(_.toDouble).toSeq,
      centroids.head.length,
      nProbeMax,
      ratio))
}
