package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sliding-window token n-grams over an array<string> column —
  * the codegen'd replacement for the interpreted
  * `transform(sequence(1, size(t) - n + 1), i -> concat_ws(" ",
  * slice(t, i, n)))` higher-order chain in the n-gram queries
  * (near-dup candidate grams, decontamination grams, repetition
  * windows, bigram scoring). Higher-order functions are
  * CodegenFallback in Spark — every element pays an interpreted
  * lambda round-trip plus a slice allocation; this expression emits
  * one fused loop and stays inside whole-stage codegen.
  *
  * Semantics are IDENTICAL to the HOF chain: max(0, size - n + 1)
  * windows, each the space-joined window tokens with NULL elements
  * skipped (concat_ws contract), so swapping call forms cannot change
  * oracle-verified output. A NULL array yields NULL.
  */
case class TokenNGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  // operand is array<string> by construction at every call site
  // (split() output); Spark's private[sql] AbstractDataType keeps
  // ExpectsInputTypes out of reach for third-party expressions
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val cnt = math.max(0, a.numElements() - n + 1)
    val out = new Array[Any](cnt)
    val win = new Array[UTF8String](n)
    var i = 0
    while (i < cnt) {
      var j = 0
      while (j < n) {
        win(j) = if (a.isNullAt(i + j)) null else a.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, win: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val u8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val win = ctx.freshName("win")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val sepRef = ctx.addReferenceObj("ngramSep", sep, u8)
      s"""
         |int $cnt = java.lang.Math.max(0, $c.numElements() - ${n - 1});
         |Object[] $out = new Object[$cnt];
         |$u8[] $win = new $u8[$n];
         |for (int $i = 0; $i < $cnt; $i++) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $win[$j] = $c.isNullAt($i + $j) ? null : $c.getUTF8String($i + $j);
         |  }
         |  $out[$i] = $u8.concatWs($sepRef, $win);
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenNGrams {
  /** Column API: the array of space-joined `n`-token windows of
    * `tokens` (array<string>), in order, with duplicates kept. */
  def ngrams(tokens: Column, n: Int): Column =
    Bridge.column(TokenNGrams(Bridge.expression(tokens), n))
}
