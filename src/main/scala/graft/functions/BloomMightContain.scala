package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] — the semi-join
  * pre-filter kernel (SURVEY §2.3 q_bloom_join): at 100 TB the win of
  * a bloom-prefiltered join is that fact rows whose key cannot be on
  * the build side are dropped AT THE SCAN, before the shuffle, so the
  * exchange ships ~selectivity× the bytes. False positives only cost
  * a little extra shuffle — the exact join behind the filter keeps the
  * result exact; false negatives are impossible by the sketch's
  * contract, which is what makes the rewrite semantics-preserving.
  *
  * The filter travels as its serialized bytes (one broadcast-sized
  * blob per expression instance, built once on the driver by a
  * distributed `treeAggregate` — `DataFrameStatFunctions.bloomFilter`)
  * and is deserialized lazily once per executor/codegen instance, not
  * per row. Both the interpreted path and `doGenCode` call the same
  * `mightContainLong`, so eval/codegen parity is structural.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  // operand is LongType by construction at the call site (key cast
  // before the call) — same convention as DotProduct/ArrayMatchCount,
  // since ExpectsInputTypes' AbstractDataType is private[sql]
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(bloomBytes)

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the referenced object is the DESERIALIZED filter: it rides the
    // generated class's references array (BloomFilterImpl is
    // java.io.Serializable), so per-row code is one bit-probe call
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column API: true iff `key` (long) might be in the serialized
    * filter — no false negatives. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(key), bloomBytes))
}
