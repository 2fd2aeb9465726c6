package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Positional match count over two array<bigint> columns — the
  * signature-agreement kernel of the MinHash Jaccard estimator
  * (est = graft_match_count(sig_a, sig_b) / NumPerms). Replaces an
  * interpreted `aggregate(zip_with(...))` chain that cost ~64
  * interpreted lambda steps per candidate pair on millions of pairs.
  */
case class ArrayMatchCount(left: Expression, right: Expression)
  extends BinaryExpression {

  // operands are array<bigint> by construction at call sites
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_match_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |int ${ev.value}_n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int ${ev.value}_c = 0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  if ($x.getLong(${ev.value}_i) == $y.getLong(${ev.value}_i)) ${ev.value}_c++;
         |}
         |${ev.value} = ${ev.value}_c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayMatchCount {
  def matchCount(a: Column, b: Column): Column =
    Bridge.column(ArrayMatchCount(Bridge.expression(a), Bridge.expression(b)))
}
