package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Per-document text-statistic kernels: one whole-stage-codegen'd pass
  * over a document's token (or n-gram) array replaces an explode →
  * shuffle → aggregate → join-back relational detour. Every kernel
  * computes EXACT integer statistics (order-independent sums/counts),
  * so the map-only formulation is bit-identical to the relational one
  * it replaces — each has a spec asserting exactly that, and the
  * DuckDB oracle twins are untouched.
  *
  * Shared semantics (the poison convention of [[ShingleHash60]]):
  * null array → null; null ELEMENT → null (tokenizers never produce
  * null tokens; poisoning flags a broken upstream).
  */
object TextKernels {

  private def checkWords(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<string>, got ${other.simpleString}")
  }

  // -------------------------------------------------------------------
  // simhash_sig60
  // -------------------------------------------------------------------

  /** 60-bit SimHash of a word array — `array<string> → long`: bit j of
    * the signature is set iff Σ_words (2·bit_j(hash60(w)) − 1) > 0.
    * Bit-identical to [[graft.operators.Dedup.simhashSigs]]'s previous
    * explode → 60-column conditional-sum aggregate (the per-bit sums
    * are order-independent integers) and to the DuckDB twin
    * `TextFunctions.simhash60Sql`. Empty array → the empty-sum
    * signature 0 (callers that must drop zero-word docs — explode
    * semantics — filter `size(ws) > 0` first, as simhashSigs does). */
  case class SimhashSig60(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkWords(child.dataType, prettyName)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "simhash_sig60"
    override protected def nullSafeEval(ws: Any): Any =
      TextKernels.simhashSig60(ws.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, ws => s"""
        Long ${ev.value}_r = graft.plans.TextKernels.simhashSig60($ws);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.longValue(); }
      """)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Boxed-null return signals a null token (poisoning). */
  def simhashSig60(ws: ArrayData): java.lang.Long = {
    val n = ws.numElements()
    val sums = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (ws.isNullAt(i)) return null
      val h = Hash60.hash(ws.getUTF8String(i))
      var j = 0
      while (j < 60) {
        sums(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (sums(j) > 0) sig |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  def simhashSig60(ws: Column): Column =
    Bridge.toColumn(SimhashSig60(Bridge.toExpression(ws)))

  // -------------------------------------------------------------------
  // hashed_embed
  // -------------------------------------------------------------------

  private val EmbPrefix = "emb:".getBytes("UTF-8")

  /** Feature-hashed embedding from a char-n-gram array —
    * `(array<string>, dim) → array<double>`: each gram adds
    * `sign = ±1` (bit `hash60("emb:"||g) / dim mod 2`) to dimension
    * `hash60("emb:"||g) mod dim`; counts stay exact BIGINTs until the
    * final per-dimension cast. Bit-identical to
    * [[graft.operators.TextAnalysis.hashedEmbedding]]'s previous
    * explode → (id,dim) aggregate → map-assembly → join-back (the
    * per-dimension sums are order-independent integers) and to the
    * DuckDB twin `hashedEmbeddingSql`. Empty array → the zero vector
    * (the left-join coalesce of the relational shape). */
  case class HashedEmbed(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
      case ArrayType(StringType, _) =>
        if (right.dataType != IntegerType || !right.foldable)
          TypeCheckResult.TypeCheckFailure(
            "hashed_embed dim must be a foldable int literal")
        else if (right.eval() == null || right.eval().asInstanceOf[Int] < 2)
          TypeCheckResult.TypeCheckFailure(
            s"hashed_embed dim must be >= 2, got ${right.eval()}")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hashed_embed requires array<string>, got ${other.simpleString}")
    }
    private lazy val dim: Int = right.eval().asInstanceOf[Int]
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "hashed_embed"
    override protected def nullSafeEval(gs: Any, d: Any): Any =
      TextKernels.hashedEmbed(gs.asInstanceOf[ArrayData], dim)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (gs, _) => s"""
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
          graft.plans.TextKernels.hashedEmbed($gs, $dim);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r; }
      """)
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Null return signals a null gram (poisoning). */
  def hashedEmbed(gs: ArrayData, dim: Int): ArrayData = {
    val n = gs.numElements()
    val acc = new Array[Long](dim)
    var i = 0
    while (i < n) {
      if (gs.isNullAt(i)) return null
      val h = Hash60.hashPrefixed(EmbPrefix, gs.getUTF8String(i))
      val d = (h % dim).toInt
      acc(d) += (if ((h / dim) % 2 == 0) 1L else -1L)
      i += 1
    }
    val out = new Array[Double](dim)
    i = 0
    while (i < dim) { out(i) = acc(i).toDouble; i += 1 }
    new GenericArrayData(out)
  }

  def hashedEmbed(gs: Column, dim: Int): Column =
    Bridge.toColumn(HashedEmbed(Bridge.toExpression(gs),
      org.apache.spark.sql.catalyst.expressions.Literal(dim)))

  // -------------------------------------------------------------------
  // quality_word_stats
  // -------------------------------------------------------------------

  private val W8Prefix = "w8:".getBytes("UTF-8")

  /** Hashed-linear-scorer sufficient statistics —
    * `array<string> → struct<zsum: long, nw: long>` with
    * `zsum = Σ_words (hash60("w8:"||w) mod 2001 − 1000)`, `nw` = word
    * count. Bit-identical to the sums behind
    * [[graft.operators.TextAnalysis.hashedQualityScore]]'s previous
    * explode → aggregate → join-back (exact integers; the sigmoid
    * stays in the caller, expression-for-expression unchanged).
    * Empty array → (0, 0), the left-join coalesce values. */
  case class QualityWordStats(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkWords(child.dataType, prettyName)
    override def dataType: DataType = StructType(Seq(
      StructField("zsum", LongType, nullable = false),
      StructField("nw", LongType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "quality_word_stats"
    override protected def nullSafeEval(ws: Any): Any =
      TextKernels.qualityWordStats(ws.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, ws => s"""
        org.apache.spark.sql.catalyst.InternalRow ${ev.value}_r = graft.plans.TextKernels.qualityWordStats($ws);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r; }
      """)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Null return signals a null token (poisoning). */
  def qualityWordStats(ws: ArrayData): InternalRow = {
    val n = ws.numElements()
    var zsum = 0L
    var i = 0
    while (i < n) {
      if (ws.isNullAt(i)) return null
      zsum += Hash60.hashPrefixed(W8Prefix, ws.getUTF8String(i)) % 2001L - 1000L
      i += 1
    }
    new GenericInternalRow(Array[Any](zsum, n.toLong))
  }

  def qualityWordStats(ws: Column): Column =
    Bridge.toColumn(QualityWordStats(Bridge.toExpression(ws)))

  // -------------------------------------------------------------------
  // repetition_stats
  // -------------------------------------------------------------------

  /** Gopher repetition-signal counts — `array<string> →
    * struct<topw, nw, nd, topb, nb: long>`: occurrences of the most
    * frequent word, total words, distinct words, occurrences of the
    * most frequent adjacent word bigram, total bigrams (= nw−1, 0 for
    * sub-2-word docs). Bit-identical to the counts behind
    * [[graft.operators.TextAnalysis.repetition]]'s previous
    * posexplode → two aggregate chains (+ window `lead`) → join-back:
    * every statistic is an exact integer count over the same multiset
    * of words/bigrams (the final ratio divisions stay in the caller,
    * expression-for-expression unchanged). Empty array → all zeros,
    * the left-join coalesce values. The bigram join key `w1 || ' ' ||
    * w2` is unambiguous because tokens cannot contain the space
    * delimiter. */
  case class RepetitionStats(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkWords(child.dataType, prettyName)
    override def dataType: DataType = StructType(Seq(
      StructField("topw", LongType, nullable = false),
      StructField("nw", LongType, nullable = false),
      StructField("nd", LongType, nullable = false),
      StructField("topb", LongType, nullable = false),
      StructField("nb", LongType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "repetition_stats"
    override protected def nullSafeEval(ws: Any): Any =
      TextKernels.repetitionStats(ws.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, ws => s"""
        org.apache.spark.sql.catalyst.InternalRow ${ev.value}_r = graft.plans.TextKernels.repetitionStats($ws);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r; }
      """)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Null return signals a null token (poisoning). */
  def repetitionStats(ws: ArrayData): InternalRow = {
    val n = ws.numElements()
    val words = new Array[String](n)
    var i = 0
    while (i < n) {
      if (ws.isNullAt(i)) return null
      words(i) = ws.getUTF8String(i).toString
      i += 1
    }
    val wc = new java.util.HashMap[String, Int](math.max(16, n * 2))
    var topw = 0L
    i = 0
    while (i < n) {
      val c = wc.merge(words(i), 1, (a, b) => a + b)
      if (c > topw) topw = c
      i += 1
    }
    var topb = 0L
    if (n >= 2) {
      val bc = new java.util.HashMap[String, Int](math.max(16, n * 2))
      i = 0
      while (i < n - 1) {
        val c = bc.merge(words(i) + " " + words(i + 1), 1, (a, b) => a + b)
        if (c > topb) topb = c
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](
      topw, n.toLong, wc.size.toLong, topb, if (n >= 2) (n - 1).toLong else 0L))
  }

  def repetitionStats(ws: Column): Column =
    Bridge.toColumn(RepetitionStats(Bridge.toExpression(ws)))
}
