package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** The PDQ broadcast-kernel similarity join as a FIRST-CLASS physical
  * operator — tier (c) of the extension ladder (custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`), promoting the engine's one
  * documented `mapPartitions` exception into a plan node the optimizer
  * and EXPLAIN can see.
  *
  * Semantics: all (left, right) row pairs whose 256-bit hashes — the
  * hexToWords packed-word layout per side — lie within Hamming distance
  * `maxDist`, emitted as (id_a, id_b, dist). The right side must be
  * KERNEL-SIZED (the stats-gated small side of the auto dispatch): it
  * is collected once on the driver, packed to two primitive arrays
  * (~32 B/hash, no row objects), broadcast, and the left side streams
  * against it with short-circuited XOR+popcount words per candidate — the same
  * measured kernel as `PdqDuplicates`' θ-join fast path (row-iterator
  * BNLJ overhead ~5× the popcount work), now with its own Exec node
  * instead of an opaque lambda.
  *
  * Planning: [[HammingKernelStrategy]] maps the logical node 1:1 to
  * [[HammingKernelJoinExec]]; registered via `SparkSessionExtensions`
  * (GraftExtensions) and, for ad-hoc sessions, injected idempotently
  * by the [[HammingKernelJoin.join]] API through
  * `spark.experimental.extraStrategies` (the same hook the optimizer-
  * rule specs use).
  */
case class HammingKernelJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    maxDist: Int,
    output: Seq[Attribute]
) extends BinaryNode {
  // output rides as a constructor value so transformations (copy /
  // withNewChildrenInternal) KEEP the attribute ids — regenerating them
  // per copy would orphan any parent references during analysis
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): HammingKernelJoinPlan =
    copy(left = newLeft, right = newRight)

  // the pair attributes are GENERATED here, not forwarded from the
  // children — without this the analyzer's missing-input check rejects
  // the node
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  // the node consumes BOTH child columns positionally (id, words) even
  // though no expression mentions them — without declaring the
  // references, ColumnPruning rewrites the children to empty projects
  // and the kernel reads garbage (caught by the word-count runtime check)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
}

/** Physical node: driver-collected packed broadcast + streamed popcount. */
case class HammingKernelJoinExec(
    maxDist: Int,
    output: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan
) extends BinaryExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val rightRows = right.executeCollect()
    require(rightRows.length <= HammingKernelJoin.MaxKernelRows,
      s"kernel side has ${rightRows.length} rows — above the " +
        s"${HammingKernelJoin.MaxKernelRows} broadcast cap; use the banded join for large sides")
    val W = HammingKernelJoin.WordsPerHash
    val n = rightRows.length
    val ids = new Array[Long](n)
    val words = new Array[Long](n * W)
    var i = 0
    while (i < n) {
      val r = rightRows(i)
      ids(i) = r.getLong(0)
      val arr = r.getArray(1)
      require(arr.numElements() == W,
        s"hash words column must hold exactly $W words (256 bits, the hexToWords layout)")
      var j = 0
      while (j < W) { words(i * W + j) = arr.getLong(j); j += 1 }
      i += 1
    }
    val bc = sparkContext.broadcast((ids, words))
    val md = maxDist
    left.execute().mapPartitions { iter =>
      val (bIds, bWords) = bc.value
      val k = bIds.length
      // downstream operators (and executeCollect) expect UnsafeRow; the
      // projection's buffer is reused per row, the consumer copies when
      // it buffers — the standard Exec contract
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(Array[org.apache.spark.sql.types.DataType](LongType, LongType, IntegerType))
      val W = HammingKernelJoin.WordsPerHash
      val aw = new Array[Long](W)
      iter.flatMap { row =>
        val idA = row.getLong(0)
        val a = row.getArray(1)
        require(a.numElements() == W,
          s"hash words column must hold exactly $W words (256 bits, the hexToWords layout)")
        var j = 0
        while (j < W) { aw(j) = a.getLong(j); j += 1 }
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        var c = 0
        while (c < k) {
          val base = c * W
          // short-circuit word-by-word: most candidates blow the budget
          // within the first words
          var d = 0
          var w = 0
          while (d <= md && w < W) {
            d += java.lang.Long.bitCount(aw(w) ^ bWords(base + w))
            w += 1
          }
          if (d <= md) out += new GenericInternalRow(Array[Any](idA, bIds(c), d))
          c += 1
        }
        out.iterator.map(proj)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): HammingKernelJoinExec =
    copy(left = newLeft, right = newRight)

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
}

object HammingKernelStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case HammingKernelJoinPlan(l, r, d, out) =>
      HammingKernelJoinExec(d, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object HammingKernelJoin {

  /** Driver-collect bound for the kernel side — the same order as the
    * stats-gated PdqDuplicates cap (~10 MB broadcast). */
  val MaxKernelRows = 300000

  /** Words per 256-bit hash — the `HashFunctions.hexToWords` layout
    * (8 hex chars per word, so eight 32-bit values in longs). */
  val WordsPerHash: Int = graft.functions.HashFunctions.WordsPerHash

  private def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("id_a", LongType, nullable = false)(),
    AttributeReference("id_b", LongType, nullable = false)(),
    AttributeReference("dist", IntegerType, nullable = false)())

  /** All cross pairs within `maxDist`, as (id_a, id_b, dist). Both
    * inputs must project exactly (id BIGINT, w ARRAY<BIGINT> of WordsPerHash);
    * `right` is the kernel (small, collected + broadcast) side. */
  def join(left: DataFrame, right: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 256, s"maxDist must be in [0, 256], got $maxDist")
    def checkSchema(df: DataFrame, side: String): Unit = {
      val t = df.schema.fields.map(_.dataType)
      require(t.length == 2 && t(0) == LongType &&
        t(1).isInstanceOf[ArrayType] &&
        t(1).asInstanceOf[ArrayType].elementType == LongType,
        s"$side side must project (id BIGINT, w ARRAY<BIGINT>), got ${df.schema.simpleString}")
    }
    checkSchema(left, "left"); checkSchema(right, "right")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(HammingKernelStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ HammingKernelStrategy
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      HammingKernelJoinPlan(left.queryExecution.analyzed,
        right.queryExecution.analyzed, maxDist, freshOutput()))
  }
}
