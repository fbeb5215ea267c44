package graft.expressions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression

/** Argument validation for the SQL-facing expression builders.
  *
  * An injected function builder runs at plan time on raw parsed
  * expressions: calling `eval()` on a non-foldable argument throws an
  * opaque UnsupportedOperationException (or NPE for a null literal, or
  * ClassCastException for a string) deep inside analysis. These helpers
  * turn every such misuse into a clean AnalysisException naming the
  * function and the offense, through Spark's own error classes.
  */
private[graft] object SqlArgs {

  def arity(fn: String, exprs: Seq[Expression], min: Int, max: Int): Unit =
    if (exprs.length < min || exprs.length > max)
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$fn`",
          "expectedNum" -> (if (min == max) s"$min" else s"[$min, $max]"),
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Argument `i` as a constant Int: must be foldable and evaluate to a
    * non-null integral value; `default` when absent. */
  def foldableInt(fn: String, exprs: Seq[Expression], i: Int, default: => Int): Int =
    if (exprs.length <= i) default
    else {
      val e = exprs(i)
      if (!e.foldable)
        throw new AnalysisException(
          errorClass = "NON_FOLDABLE_ARGUMENT",
          messageParameters = Map(
            "funcName" -> s"`$fn`",
            "paramName" -> s"`arg${i + 1}`",
            "paramType" -> "\"INT\""))
      def bad(got: Any): Nothing =
        throw new AnalysisException(
          errorClass = "DATATYPE_MISMATCH.INVALID_ARG_VALUE",
          messageParameters = Map(
            "sqlExpr" -> s"\"$fn(${exprs.map(_.sql).mkString(", ")})\"",
            "inputName" -> s"`arg${i + 1}`",
            "requireType" -> "\"INT\"",
            "validValues" -> "integers",
            "inputValue" -> String.valueOf(got)))
      e.eval(null) match {
        case n: java.lang.Integer => n.intValue
        case n: java.lang.Long =>
          // range-check before narrowing: silently truncating a BIGINT
          // (char_shingles(text, 4294967297) -> width 1) would be
          // exactly the wrong-results misuse this helper exists to stop
          if (n.longValue < Int.MinValue || n.longValue > Int.MaxValue) bad(n)
          else n.intValue
        case n: java.lang.Short => n.intValue
        case n: java.lang.Byte => n.intValue
        case other => bad(other)
      }
    }
}
