package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * text-canonicalization primitive Spark SQL ships without (DuckDB
  * has `nfc_normalize`, Trino `normalize`; Spark has neither, and a
  * Scala UDF here would pay serialization on every row of a corpus
  * scan). Used by the normalization-accounting query to detect and
  * price decomposed sequences (e.g. `e` + COMBINING ACUTE U+0301 →
  * `é` U+00E9) before a dedup pass — two byte-wise-different spellings
  * of the same canonical text otherwise defeat exact dedup and
  * fingerprinting.
  *
  * Fast path: `Normalizer.isNormalized` is a scan without allocation,
  * and on an already-NFC string (ASCII in particular — the common
  * case for web text by volume) the input `UTF8String` is returned
  * as-is, so the hot loop allocates nothing. Both eval and codegen
  * call the same JDK `java.text.Normalizer` (ICU-independent,
  * deterministic for a given JDK's Unicode version; the combining
  * sequences this suite injects are Unicode-1.1-era and stable across
  * every JDK and utf8proc/DuckDB version in play — pinned
  * cross-engine by the oracle). A NULL input yields NULL.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  // explicit input type check so a non-string child fails at ANALYSIS
  // time (review catch: without it, generated Java calls .toString()
  // on a primitive and dies mid-job on an executor instead; Spark's
  // private[sql] AbstractDataType keeps ExpectsInputTypes out of
  // reach for third-party expressions — the TokenNGrams note)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a STRING child, got ${child.dataType.sql}")
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any = {
    val j = s.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val u8 = classOf[UTF8String].getName
      val js = ctx.freshName("jstr")
      // generated Java calls the JDK Normalizer directly — no Scala
      // object forwarder in the hot path, same two-branch shape as
      // nullSafeEval so interpreted and compiled results are
      // bit-identical
      s"""
         |java.lang.String $js = $c.toString();
         |if (java.text.Normalizer.isNormalized($js, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = $u8.fromString(
         |    java.text.Normalizer.normalize($js, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column API: the NFC-canonical form of `s` (NULL-safe). */
  def nfc(s: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(s)))
}
