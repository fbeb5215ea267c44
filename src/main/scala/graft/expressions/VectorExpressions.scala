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

object VectorExpressions {
  import org.apache.spark.sql.graftshim.GraftSqlShim

  /** Column form of [[CosineSimilarity]] for DataFrame pipelines. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlShim.column(
      CosineSimilarity(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
