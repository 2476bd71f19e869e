package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: subword token count of a word array
  * under GREEDY LONGEST-PREFIX-MATCH segmentation against a fixed
  * vocabulary — the BPE-inference tokenization rule (merge-free
  * approximation: a trained BPE/WordPiece vocab applied greedily, the
  * way production tokenizers segment at inference time). Characters
  * with no vocab match consume one character as an unknown token.
  *
  * `vocab_token_count(words, array('the','ing',...))` → BIGINT total
  * tokens across all words.
  *
  * Why a native expression: token counting is the budget column of LLM
  * data work — it runs over every document of the corpus. The greedy
  * loop cannot be expressed in built-in column functions (it is a
  * per-character stateful walk), and a Scala UDF would break
  * whole-stage codegen on a corpus-wide map. This expression compiles
  * the vocab ONCE per expression instance into a character trie
  * (terminal-depth tracking, so the longest match falls out of one
  * forward walk per position) and the generated code calls one
  * JIT-friendly method per row.
  *
  * Determinism/oracle contract: vocab pieces match per UTF-16 char,
  * but an UNMATCHED position advances by one CODE POINT — so for the
  * supported ASCII/BMP vocabularies, token counts agree with the
  * per-codepoint DuckDB recursive-CTE twin on ARBITRARY unicode text
  * (an astral emoji is one unknown token on both engines); see
  * [[graft.operators.TextAnalysis.bpeTokenCounts]].
  *
  * The vocab must be a foldable (literal) array — it is part of the
  * query, not a joined relation. Vocabularies up to a few thousand
  * pieces are fine (trie build is one-time, per-row cost is O(chars ·
  * max piece length)); a 50k-piece production vocab would instead ship
  * via broadcast like [[BloomMightContainLong]]'s filter.
  */
case class VocabTokenCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckFailure("vocab_token_count requires a literal (foldable) vocab array")
    case other => TypeCheckResult.TypeCheckFailure(
      s"vocab_token_count requires (array<string>, array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "vocab_token_count"

  // terminal-depth trie over the literal vocab, built once per instance
  @transient private lazy val trie: VocabTokenCount.Node = {
    val root = new VocabTokenCount.Node
    val arr = right.eval().asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val piece = arr.getUTF8String(i).toString
        if (piece.nonEmpty) {
          var node = root
          var j = 0
          while (j < piece.length) {
            node = node.child(piece.charAt(j))
            j += 1
          }
          node.terminal = true
        }
      }
      i += 1
    }
    root
  }

  /** Total greedy-match token count over all words; public for the
    * generated code. */
  def countWords(words: ArrayData): Long = {
    var total = 0L
    var i = 0
    while (i < words.numElements()) {
      if (!words.isNullAt(i)) total += countWord(words.getUTF8String(i).toString)
      i += 1
    }
    total
  }

  private def countWord(w: String): Long = {
    var tokens = 0L
    var i = 0
    while (i < w.length) {
      // one forward walk from i; remember the deepest terminal seen.
      // Iteration is per CODE POINT (a supplementary-plane char is ONE
      // unknown token, matching DuckDB's per-codepoint substr in the
      // oracle twin), while BMP vocab pieces walk per char as before.
      var node = trie
      var j = i
      var best = 0
      var walking = true
      while (walking && j < w.length) {
        val next = node.lookup(w.charAt(j))
        if (next == null) walking = false
        else {
          node = next
          j += 1
          if (node.terminal) best = j - i
        }
      }
      i += (if (best > 0) best else Character.charCount(w.codePointAt(i)))
      tokens += 1
    }
    tokens
  }

  override protected def nullSafeEval(wordsVal: Any, vocabVal: Any): Any =
    countWords(wordsVal.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabTokenCount", this, classOf[VocabTokenCount].getName)
    defineCodeGen(ctx, ev, (a, _) => s"$ref.countWords($a)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VocabTokenCount {

  private[plans] final class Node {
    var terminal: Boolean = false
    private var keys: Array[Char] = new Array[Char](0)
    private var kids: Array[Node] = new Array[Node](0)

    def lookup(c: Char): Node = {
      var i = 0
      while (i < keys.length) { // vocab alphabets are small; linear scan wins
        if (keys(i) == c) return kids(i)
        i += 1
      }
      null
    }

    def child(c: Char): Node = {
      val existing = lookup(c)
      if (existing != null) existing
      else {
        val n = new Node
        keys = keys :+ c
        kids = kids :+ n
        n
      }
    }
  }

  /** Column-API entry point: `vocab` must be a literal array column. */
  def apply(words: Column, vocab: Column): Column =
    Bridge.toColumn(VocabTokenCount(Bridge.toExpression(words), Bridge.toExpression(vocab)))
}
