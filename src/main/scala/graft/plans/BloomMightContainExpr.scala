package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: probe a BROADCAST Bloom filter with a
  * long key.
  *
  * Why it exists: the Bloom prefilter of
  * [[graft.operators.Decontaminate.scanBloom]] runs on the corpus's
  * hottest map stage (every shingle row of a 100 TB corpus passes
  * through it), and a Scala UDF there breaks whole-stage codegen AND
  * pays a per-row boxing + closure call. This expression keeps the
  * stage in one codegen span: the generated code resolves the broadcast
  * ONCE per task instance into a mutable-state field and then calls
  * `BloomFilter.mightContainLong` directly per row.
  *
  * The filter travels as a `Broadcast` handle — the serialized plan
  * ships the lightweight handle, executors fetch the bit array once via
  * torrent blocks (embedding the filter object itself in the expression
  * would re-ship it inside every task closure: ~1.2 GB per task at the
  * motivating 10⁹-shingle scale).
  *
  * Not SQL-registered: the expression closes over a runtime broadcast
  * object, so it has no literal-only SQL form.
  */
case class BloomMightContainLong(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires an integral key, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter = bloom.value

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcName = classOf[Broadcast[_]].getName
    val bfName = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom, bcName)
    // resolved once per generated-class instance (i.e. per task), not per row
    val filterTerm = ctx.addMutableState(bfName, "graftBloomFilter",
      v => s"$v = ($bfName) $bcRef.value();")
    defineCodeGen(ctx, ev, v => s"$filterTerm.mightContainLong((long) $v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainLong {
  /** Column-API entry point. */
  def apply(key: Column, bloom: Broadcast[BloomFilter]): Column =
    Bridge.toColumn(BloomMightContainLong(Bridge.toExpression(key), bloom))
}
