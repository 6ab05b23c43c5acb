package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `in_count(toks, list)` ≡ `size(filter(toks, t -> t IN (list...)))`
  * for a FOLDABLE null-free string list — the stopword-hit counter on
  * the language-ID / quality hot path (r22, guide §4). The HOF form
  * evaluates an interpreted lambda per token per list — q_text_langid
  * runs FOUR of them over every token of every document — while this
  * expression is one codegen hash-set probe per token.
  *
  * Semantics, token by token (TextExprSpec pins both eval paths):
  *  - a token counts iff it string-equals some list element — exact
  *    binary UTF8 equality, the same comparison IN performs;
  *  - a NULL token never counts (IN yields NULL, filter drops it);
  *  - a NULL list element could only ever turn a non-match into NULL,
  *    and for COUNTING null and false are the same outcome, so the
  *    set simply skips null list slots — no divergence is possible;
  *  - NULL toks array → NULL (size(null) = NULL with the non-legacy
  *    sizeOfNull default this engine runs everywhere).
  * The list must be foldable (it is a literal stop list at every call
  * site) so the probe set is built once per plan, not per row —
  * enforced at analysis time, not silently per-row-rebuilt.
  */
case class InCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "in_count requires a foldable (literal) list argument")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"in_count requires (array<string>, array<string>), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  override def dataType: DataType = IntegerType

  /** The probe set, built once from the foldable list (null slots
    * skipped — see scaladoc). UTF8String hashCode/equals are
    * byte-exact, the same equality IN uses.
    */
  @transient private lazy val probeSet: java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) set.add(arr.getUTF8String(i))
        i += 1
      }
    }
    set
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && probeSet.contains(toks.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("inCountSet", probeSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, (toks, _) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $toks.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$toks.isNullAt($i) && $setRef.contains($toks.getUTF8String($i))) {
         |    $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "in_count"
}

/** Registration for SQL-expression use (`expr("in_count(toks, array(...))")`). */
object TextExprs {
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "in_count", exprs => InCount(exprs(0), exprs(1)), "built-in")
}
