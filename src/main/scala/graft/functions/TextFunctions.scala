package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar layer for the text-pipeline operators (dedup, fingerprinting,
  * quality). Everything here is engine-portable by construction: the only
  * hash primitive is md5 (identical hex output in Spark and DuckDB), and
  * all arithmetic stays inside signed-64-bit with explicit moduli so the
  * DuckDB oracle can replay it bit-for-bit.
  *
  * Hash domains:
  *  - [[portableHash60]]: 60-bit positive (15 hex chars of md5) — general
  *    identity hashing. Spark `conv(_,16,10)` / DuckDB `'0x'||_::BIGINT`.
  *  - [[portableHash30]]: 30-bit reduction used inside MinHash
  *    permutations so `a*h+b` never overflows int64.
  */
object TextFunctions {

  /** 2^31 - 1 (prime): modulus of the MinHash permutation family. */
  val MinhashPrime = 2147483647L

  /** First 15 hex chars of md5 as a non-negative long (60 bits).
    * Runs in the native [[graft.plans.Hash60]] kernel — one md5
    * straight out of the digest bytes instead of the built-in
    * hex-encode → substring → conv re-parse chain (bit-identical to
    * `conv(substring(md5(s), 1, 15), 16, 10).cast("long")`,
    * spec-asserted in Hash60Spec). */
  def portableHash60(s: Column): Column =
    graft.plans.Hash60(s.cast("string"))

  /** DuckDB twin of [[portableHash60]] over SQL expression `e`. */
  def portableHash60Sql(e: String): String =
    s"CAST('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 15) AS BIGINT)"

  def portableHash30(s: Column): Column = portableHash60(s) % 1073741824L

  def portableHash30Sql(e: String): String =
    s"(${portableHash60Sql(e)} % 1073741824)"

  /** Whitespace tokenization; empty tokens dropped (split on ' +'). */
  def words(text: Column): Column =
    filter(split(text, " +"), w => length(w) > 0)

  def wordsSql(e: String): String =
    s"list_filter(regexp_split_to_array($e, ' +'), w -> len(w) > 0)"

  /** Nonempty trimmed lines of `text` — CRLF, CR and LF all delimit
    * (web corpora mix them; a space-only `trim` after an LF split
    * would leave every CRLF line with a trailing `\r`, defeating both
    * terminal-punctuation rules and line-hash equality). Shared by the
    * C4 cleaner and the corpus line dedup so their line definition is
    * provably identical. */
  def lines(text: Column): Column =
    filter(transform(split(text, "\r\n|\r|\n"), l => trim(l)), t => length(t) > 0)

  /** DuckDB twin of [[lines]] (RE2 alternation, same pattern). */
  def linesSql(e: String): String =
    s"list_filter(list_transform(regexp_split_to_array($e, '\\r\\n|\\r|\\n'), " +
      "l -> trim(l)), t -> len(t) > 0)"

  /** Half-up-rounded fixed-point ratio in EXACT integer arithmetic —
    * `round(num/den · scale)` as `(2·num·scale + den) div (2·den)`,
    * computed in DECIMAL(38,0) so quadratic pair-count numerators can't
    * overflow int64 (2·9e18·1e9 ≈ 1.8e28 « 1e38). Integer-exact on both
    * engines, so it is tie-PROOF: `round(x, 9)` on a double hits
    * engine-divergent 10th-decimal ties when the denominator carries
    * 2^10 (observed at sf0.1 on lm_score). Returns a Spark SQL
    * expression string (for `expr`); result type BIGINT micro-units —
    * divide by `scale` (one exact FP op) for the double. `den` must be
    * guarded positive by the caller (`greatest(x, 1)`). */
  def ratioScaled(num: String, den: String, scale: Long): String =
    s"CAST((2 * CAST(($num) AS DECIMAL(38, 0)) * $scale + ($den)) div (2 * ($den)) AS BIGINT)"

  /** DuckDB twin of [[ratioScaled]] (HUGEINT instead of DECIMAL(38)). */
  def ratioScaledSql(num: String, den: String, scale: Long): String =
    s"CAST((2 * CAST(($num) AS HUGEINT) * $scale + ($den)) // (2 * ($den)) AS BIGINT)"

  /** n-word shingles as space-joined strings:
    * shingle(i) = words[i..i+n-1], for i in 0 .. size-n. Empty when the
    * document has fewer than n words.
    *
    * Implemented as ONE fold carrying a sliding window of the previous
    * n-1 words, so the input column is referenced exactly once. The
    * index-based shape (element_at(ws, i+j) × n per shingle) references
    * `ws` 3n× per row; when Catalyst inlines an upstream derivation
    * (split+filter) through CollapseProject that multiplies into ~100
    * re-evaluations of the tokenizer per document — measured 12× slower
    * end-to-end. */
  def shingles(ws: Column, n: Int): Column = {
    require(n >= 1, s"shingle length must be >= 1, got $n")
    if (n == 1) coalesce(ws, array().cast("array<string>"))
    else {
      val emptyArr = array().cast("array<string>")
      val folded = aggregate(
        ws,
        struct(emptyArr.as("win"), emptyArr.as("sh")),
        (acc, w) => {
          val win = acc.getField("win")
          val sh = acc.getField("sh")
          val full = concat(win, array(w))
          struct(
            when(size(win) < n - 1, full)
              .otherwise(slice(full, 2, n - 1)).as("win"),
            when(size(win) === n - 1, concat(sh, array(concat_ws(" ", full))))
              .otherwise(sh).as("sh")
          )
        },
        acc => acc.getField("sh")
      )
      coalesce(folded, emptyArr)
    }
  }

  /** DuckDB twin (1-based list indexing). */
  def shinglesSql(wsExpr: String, n: Int): String = {
    val parts = (0 until n).map(j => s"($wsExpr)[i + $j]").mkString(" || ' ' || ")
    s"CASE WHEN len($wsExpr) >= $n THEN list_transform(generate_series(1, len($wsExpr) - ${n - 1}), i -> $parts) " +
      s"ELSE CAST([] AS VARCHAR[]) END"
  }

  /** MinHash permutation i of a 30-bit hash column:
    * ((2i+1) * h + 12345 i + 7) mod (2^31-1). Multiplier odd, modulus
    * prime; products stay ≤ 2^31 * 2^30 < 2^62. */
  def minhashPerm(h30: Column, i: Int): Column =
    (h30 * lit(2L * i + 1) + lit(12345L * i + 7)) % lit(MinhashPrime)

  /** MinHash signature: k minima over the document's shingle hashes.
    * Null/empty shingle sets yield null (caller filters). */
  def minhashSig(shingleHashes30: Column, k: Int): Column =
    // Single fold with an array<long> accumulator — the input column is
    // referenced exactly once, so even after Catalyst inlines an
    // expensive upstream derivation (shingling + md5) through
    // CollapseProject, that derivation evaluates once per row, not once
    // per permutation (the k-separate-array_min shape was k× slower).
    when(size(shingleHashes30) > 0,
      aggregate(
        shingleHashes30,
        array_repeat(lit(MinhashPrime), lit(k)),
        (acc, h) => zip_with(acc, sequence(lit(0), lit(k - 1)),
          (a, i) => least(a, (h * (i * lit(2L) + lit(1L)) + i * lit(12345L) + lit(7L)) % lit(MinhashPrime))))
    )

  /** DuckDB twin over a LIST(BIGINT) expression of 30-bit hashes. */
  def minhashSigSql(hs30: String, k: Int): String =
    s"CASE WHEN len($hs30) > 0 THEN list_transform(generate_series(0, ${k - 1}), i -> " +
      s"list_min(list_transform($hs30, h -> (h * (2*i + 1) + 12345*i + 7) % $MinhashPrime))) END"

  /** Exact n-gram Jaccard between two distinct-shingle arrays:
    * |A ∩ B| / |A ∪ B| as double. Fold-order-free (set cardinalities are
    * integers; single double division at the end). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }

  /** 60-bit SimHash from an array of 60-bit word hashes: bit j is set iff
    * sum over words of (2*bit_j(h) - 1) > 0.
    *
    * Implemented as ONE fold over the word array with an array<long>
    * accumulator of the 60 per-bit sums — each word hash is evaluated
    * exactly once even after Catalyst collapses surrounding projections
    * (the naive 60-separate-folds shape re-evaluates the hash per bit). */
  def simhash60(wordHashes: Column): Column = {
    val bitSums = aggregate(
      wordHashes,
      array_repeat(lit(0L), lit(60)),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(59)),
        (a, j) => a + (call_function("shiftright", h, j).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)))
    )
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(59)),
        (s, j) => when(s > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (x, y) => x + y)
  }

  /** DuckDB twin over a LIST(BIGINT) expression of 60-bit word hashes. */
  def simhash60Sql(hs: String): String =
    s"CAST(list_sum(list_transform(generate_series(0, 59), j -> " +
      s"CASE WHEN list_sum(list_transform($hs, h -> ((h >> j) & 1) * 2 - 1)) > 0 " +
      s"THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT)"

  /** Hamming distance between two 60-bit SimHash longs. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowing fingerprints (Schleimer et al. 2003, public algorithm):
    * min hash of each sliding window of `w` consecutive shingle hashes,
    * distinct + sorted. Documents shorter than one window fall back to
    * their global min.
    *
    * Runs on the native codegen'd [[graft.plans.WinnowMins]] expression
    * (monotonic-deque O(n) sliding min, distinct+sort fused) — the HOF
    * formulation below computes the identical value but walks the lambda
    * interpreter and allocates a slice per window, O(n·w) per document;
    * it was the heaviest non-output-bound bench stage (9.2 s at sf0.1). */
  def winnow(shingleHashes: Column, w: Int): Column =
    graft.plans.WinnowMins(shingleHashes, w)

  /** The original higher-order-function formulation of [[winnow]], kept
    * as the executable specification the native expression is asserted
    * against (WinnowMinsSpec). The input array is LET-BOUND once via a
    * single-element-array transform: lambda variables are materialized
    * values, whereas a free column reference inside an HOF lambda
    * re-evaluates its whole upstream derivation (tokenize → shingle →
    * md5) on every lambda call — that shape made the sliding window
    * O(n²·chain) per document (measured 229 s for the fingerprints query
    * at sf0.1; this one runs the chain once per row). */
  def winnowHof(shingleHashes: Column, w: Int): Column =
    element_at(
      transform(array(shingleHashes), hs =>
        when(size(hs) === 0, array().cast("array<bigint>"))
          .when(size(hs) < w, array_sort(array_distinct(array(array_min(hs)))))
          .otherwise(array_sort(array_distinct(
            transform(sequence(lit(0), size(hs) - w),
              i => array_min(slice(hs, i + 1, lit(w)))))))),
      1)

  def winnowSql(hs: String, w: Int): String =
    s"CASE WHEN len($hs) = 0 THEN CAST([] AS BIGINT[]) " +
      s"WHEN len($hs) < $w THEN [list_min($hs)] " +
      s"ELSE list_sort(list_distinct(list_transform(generate_series(1, len($hs) - ${w - 1}), " +
      s"i -> list_min(($hs)[i:i+${w - 1}])))) END"
}
