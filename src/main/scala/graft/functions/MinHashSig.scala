package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native row-local MinHash signature over an array<string> token-set
  * column — the codegen'd sibling of the [[graft.MinHash]] Aggregator:
  * the SAME 64 seeded MurmurHash3 "permutations"
  * ([[graft.MinHash.hashToken]] is called from the generated code), so
  * the two forms produce BIT-IDENTICAL signatures — the Aggregator
  * remains the streaming/token-at-a-time merging variant, this
  * expression the batch form where the token set is already an array
  * on the row.
  *
  * Why an expression and not the `transform(sequence(0,63), p ->
  * array_min(transform(toks, t -> hash(p,t))))` HOF chain: HOFs are
  * CodegenFallback — measured ~15% SLOWER end-to-end than even the
  * explode→UDAF path on q_dedup_minhash, because every permutation
  * materializes an intermediate hash array per row. This emits one
  * fused two-level loop (tokens outer, permutations inner; each token
  * converted from UTF8String once), no intermediate allocation beyond
  * the 64-long output. Replacing explode→groupBy(UDAF) with a
  * row-local projection also removes one corpus-scale token shuffle
  * from the MinHash pipeline — the 100 TB win. A NULL array yields
  * NULL; NULL tokens are skipped (cannot occur from `split`).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // explicit input type check so a non-array<string> child fails at
  // ANALYSIS time (the NfcNormalize discipline: without it the
  // generated getUTF8String call dies with a ClassCastException on an
  // executor mid-job — or forces a codegen compile fallback — instead
  // of a plan-time error; Spark's private[sql] AbstractDataType keeps
  // ExpectsInputTypes out of reach for third-party expressions)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires an ARRAY<STRING> child, got ${other.sql}")
  }
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val sig = Array.fill(graft.MinHash.NumPerms)(Long.MaxValue)
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) {
        val s = a.getUTF8String(i).toString
        var p = 0
        while (p < graft.MinHash.NumPerms) {
          val h = graft.MinHash.hashToken(s, p)
          if (h < sig(p)) sig(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val gad = classOf[GenericArrayData].getName
      val np = graft.MinHash.NumPerms
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
         |long[] $sig = new long[$np];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    String $s = $c.getUTF8String($i).toString();
         |    for (int $p = 0; $p < $np; $p++) {
         |      long $h = graft.MinHash.hashToken($s, $p);
         |      if ($h < $sig[$p]) $sig[$p] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-API entry: `MinHashSig.sig(tokensCol)`. */
  def sig(tokens: Column): Column = Bridge.column(MinHashSig(Bridge.expression(tokens)))
}
