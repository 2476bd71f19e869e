package graft.operators

import graft.functions.TextFunctions.{words, wordsSql}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation (the SentencePiece/WordPiece
  * inference family, Kudo ACL'18) — the OTHER tokenizer next to
  * [[BpeLearn]]'s merge learning: a vocabulary of substring pieces with
  * negative-log-probability costs, and per word the MINIMUM-COST
  * segmentation by dynamic programming. BPE applies a learned merge
  * order greedily; unigram picks the globally cheapest piece cover —
  * the difference shows on words where a greedy merge strands an
  * expensive tail.
  *
  * Everything is exact-integer and corpus-derived (no external model):
  * piece costs are floor-10⁶ fixed-point −ln(p) (the lm_score
  * discipline — the one transcendental exits through the floor grid
  * per PIECE, before any per-word arithmetic), and the DP compares
  * (cost, n_pieces) pairs lexicographically, so every per-word VALUE
  * (min cost, piece count at that cost) is deterministic and
  * engine-replayable even where multiple segmentations tie — the
  * operators return DP values, never a tie-dependent path.
  *
  * Scale shape: the vocabulary fit touches word TYPES (one groupBy of
  * the corpus), candidate-piece expansion is O(maxLen²) per type, and
  * segmentation is a broadcast join (vocab is parameter-bounded) plus
  * a map-only in-row fold — ⌈L⌉ steps over a ≤ L+1-entry table per
  * word, no shuffle after the join.
  */
object Unigram {

  private val Inf = 1000000000000000L // 1e15: safely above any real cost sum

  /** Word types with total corpus occurrence counts. */
  private def wordTypes(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** All (piece, occurrences) over the corpus: every substring of
    * length ≤ maxPieceLen of every word type, weighted by the type's
    * corpus count. */
  private def pieceCounts(types: DataFrame, maxPieceLen: Int): DataFrame =
    types
      .select(col("word"), col("wc"), explode(sequence(lit(0), length(col("word")) - 1)).as("s"))
      .select(col("wc"), col("s"),
        explode(expr(s"sequence(1, least($maxPieceLen, length(word) - s))")).as("len"),
        col("word"))
      .select(expr("substring(word, s + 1, len)").as("piece"), col("wc"))
      .groupBy("piece").agg(sum("wc").as("c"))

  /** Fit the piece vocabulary: substrings of length ≤ `maxPieceLen`
    * with ≥ `minFreq` weighted occurrences (single characters always
    * survive — they are the segmentability floor), top `vocabSize` by
    * (count desc, piece asc), costed at floor(10⁶·ln(total/count)).
    *
    * @return (piece, c, cost) — cost in micro-nats */
  def fitVocab(df: DataFrame, textCol: String, maxPieceLen: Int = 6,
      minFreq: Long = 2L, vocabSize: Int = 4096): DataFrame = {
    require(maxPieceLen >= 1 && minFreq >= 1 && vocabSize >= 1,
      s"need maxPieceLen >= 1, minFreq >= 1, vocabSize >= 1")
    val counts = Materialize(pieceCounts(wordTypes(df, textCol), maxPieceLen))
    val kept = counts.filter(length(col("piece")) === 1 || col("c") >= minFreq)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("piece").asc)
    // rank cut over the TYPE-bounded candidate relation (word types ×
    // maxPieceLen² pieces, not corpus rows) — a fit-time model operation
    val top = kept
      .withColumn("__rk", row_number().over(w))
      .filter(length(col("piece")) === 1 || col("__rk") <= vocabSize)
      .drop("__rk")
    val total = top.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    top.select(col("piece"), col("c"),
      expr(s"CAST(floor(ln(CAST($total AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000) AS BIGINT)")
        .as("cost"))
  }

  /** Minimum-cost segmentation VALUES per word type of `df` under
    * `vocab` (piece, cost): the DP table best[i] = min over pieces
    * ending at i of (best[start] + cost, pieces + 1), compared
    * lexicographically — an in-row fold over positions after one
    * broadcast join of candidate substrings to the vocabulary. Words
    * containing a character absent from the vocabulary report the
    * `Inf` sentinel via unreachable = true.
    *
    * @return (word, wc, cost_micro, n_pieces, unreachable) */
  def segmentWords(df: DataFrame, textCol: String, vocab: DataFrame,
      maxPieceLen: Int = 6): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1")
    val types = wordTypes(df, textCol)
    val cand = types
      .select(col("word"), col("wc"), explode(sequence(lit(0), length(col("word")) - 1)).as("s"))
      .select(col("word"), col("wc"), col("s"),
        explode(expr(s"sequence(1, least($maxPieceLen, length(word) - s))")).as("len"))
      .select(col("word"), col("wc"), col("s"), (col("s") + col("len")).as("e"),
        expr("substring(word, s + 1, len)").as("piece"))
    // LEFT join back onto the types: a word with NO vocab piece at all
    // (an out-of-alphabet string) must still emit — as unreachable —
    // not silently vanish at the inner join
    val matched = cand
      .join(broadcast(vocab.select(col("piece"), col("cost"))), Seq("piece"))
      .groupBy("word", "wc")
      .agg(collect_list(struct(col("s").cast("long").as("s"),
        col("e").cast("long").as("e"), col("cost").as("c"))).as("entries"))
    val entries = types.join(matched, Seq("word", "wc"), "left")
      .withColumn("entries", coalesce(col("entries"),
        expr("CAST(array() AS ARRAY<STRUCT<s: BIGINT, e: BIGINT, c: BIGINT>>)")))
    // the fold: acc starts as [best0]; step i appends best[i] = the
    // lexicographic (cost, pieces) minimum over entries ending at i
    val folded = entries.select(col("word"), col("wc"),
      aggregate(
        sequence(lit(1), length(col("word"))),
        array(struct(lit(0L).as("c"), lit(0L).as("n"))),
        (acc, i) => concat(acc, array(coalesce(
          array_min(transform(
            filter(col("entries"), e => e.getField("e") === i),
            e => struct(
              (element_at(acc, (e.getField("s") + 1).cast("int")).getField("c") + e.getField("c")).as("c"),
              (element_at(acc, (e.getField("s") + 1).cast("int")).getField("n") + 1L).as("n")))),
          struct(lit(Inf).as("c"), lit(Inf).as("n")))))
      ).as("table"))
    folded.select(col("word"), col("wc"),
      element_at(col("table"), length(col("word")) + 1).getField("c").as("cost_micro"),
      element_at(col("table"), length(col("word")) + 1).getField("n").as("n_pieces"))
      .withColumn("unreachable", col("cost_micro") >= Inf)
  }

  /** The actual piece SEQUENCE per word — [[segmentWords]] with the
    * tie broken all the way: best[i] minimizes (cost, n_pieces, start)
    * lexicographically, so among equal-cost equal-count segmentations
    * the one whose FINAL piece is longest wins at every position and
    * the backtrace is unique. Two in-row folds: the DP forward pass
    * (as in [[segmentWords]], with the chosen start recorded), then a
    * backtrace fold jumping pos → start at most L times. Unreachable
    * words emit an empty piece string.
    *
    * @return (word, wc, pieces) — pieces '|'-joined */
  def segmentPieces(df: DataFrame, textCol: String, vocab: DataFrame,
      maxPieceLen: Int = 6): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1")
    val types = wordTypes(df, textCol)
    val cand = types
      .select(col("word"), col("wc"), explode(sequence(lit(0), length(col("word")) - 1)).as("s"))
      .select(col("word"), col("wc"), col("s"),
        explode(expr(s"sequence(1, least($maxPieceLen, length(word) - s))")).as("len"))
      .select(col("word"), col("wc"), col("s"), (col("s") + col("len")).as("e"),
        expr("substring(word, s + 1, len)").as("piece"))
    val matched = cand
      .join(broadcast(vocab.select(col("piece"), col("cost"))), Seq("piece"))
      .groupBy("word", "wc")
      .agg(collect_list(struct(col("s").cast("long").as("s"),
        col("e").cast("long").as("e"), col("cost").as("c"))).as("entries"))
    val entries = types.join(matched, Seq("word", "wc"), "left")
      .withColumn("entries", coalesce(col("entries"),
        expr("CAST(array() AS ARRAY<STRUCT<s: BIGINT, e: BIGINT, c: BIGINT>>)")))
    val folded = entries.select(col("word"), col("wc"),
      aggregate(
        sequence(lit(1), length(col("word"))),
        array(struct(lit(0L).as("c"), lit(0L).as("n"), lit(0L).as("s"))),
        (acc, i) => concat(acc, array(coalesce(
          array_min(transform(
            filter(col("entries"), e => e.getField("e") === i),
            e => struct(
              (element_at(acc, (e.getField("s") + 1).cast("int")).getField("c") + e.getField("c")).as("c"),
              (element_at(acc, (e.getField("s") + 1).cast("int")).getField("n") + 1L).as("n"),
              e.getField("s").as("s")))),
          struct(lit(Inf).as("c"), lit(Inf).as("n"), lit(0L).as("s")))))
      ).as("tbl"))
    // backtrace: jump pos -> tbl[pos].s, prepending the covered piece;
    // at most L jumps, identity once pos hits 0
    folded.select(col("word"), col("wc"),
      when(element_at(col("tbl"), length(col("word")) + 1).getField("c") >= Inf, lit(""))
        .otherwise(array_join(aggregate(
          sequence(lit(1), length(col("word"))),
          struct(length(col("word")).cast("long").as("pos"),
            expr("CAST(array() AS ARRAY<STRING>)").as("ps")),
          (st, _) => {
            val pos = st.getField("pos")
            val start = element_at(col("tbl"), (pos + 1).cast("int")).getField("s")
            when(pos === 0L, st).otherwise(struct(
              start.as("pos"),
              concat(array(expr("word").substr((start + 1).cast("int"),
                (pos - start).cast("int"))), st.getField("ps")).as("ps")))
          },
          st => st.getField("ps")), "|")).as("pieces"))
  }

  /** One HARD-EM refit round (the SentencePiece training loop, hard
    * assignment): segment every word type under the current vocab with
    * the deterministic tiebreak, count each piece's usage weighted by
    * word frequency, and re-cost the vocabulary from those usage
    * counts (floor-10⁶ −ln(usage/total)). Pieces the segmentation
    * never uses drop out — the EM-style pruning that shrinks an
    * over-complete candidate vocabulary toward pieces that actually
    * win segmentations.
    *
    * @return (piece, used, cost) — the refit vocabulary */
  def refitVocab(df: DataFrame, textCol: String, vocab: DataFrame,
      maxPieceLen: Int = 6): DataFrame = {
    val segs = segmentPieces(df, textCol, vocab, maxPieceLen)
    val usage = segs.filter(col("pieces") =!= "")
      .select(col("wc"), explode(split(col("pieces"), "\\|")).as("piece"))
      .groupBy("piece").agg(sum("wc").as("used"))
    val total = usage.agg(coalesce(sum("used"), lit(0L))).head().getLong(0)
    usage.select(col("piece"), col("used"),
      expr(s"CAST(floor(ln(CAST($total AS DOUBLE) / CAST(used AS DOUBLE)) * 1000000) AS BIGINT)")
        .as("cost"))
  }

  // ---- DuckDB twins ----------------------------------------------------

  private def wordTypesSql(input: String, textExpr: String): String =
    s"""SELECT word, count(*) AS wc FROM (
          SELECT unnest(${wordsSql(textExpr)}) AS word FROM ($input))
        GROUP BY word"""

  private def pieceCountsSql(typesCte: String, maxPieceLen: Int): String =
    s"""SELECT piece, CAST(sum(wc) AS BIGINT) AS c FROM (
          SELECT substring(word, s + 1, len) AS piece, wc FROM (
            SELECT word, wc, s.g AS s, l.g AS len
            FROM ($typesCte) t
            CROSS JOIN LATERAL (SELECT unnest(generate_series(0, length(t.word) - 1)) AS g) s
            CROSS JOIN LATERAL (SELECT unnest(generate_series(1, least($maxPieceLen, length(t.word) - s.g))) AS g) l))
        GROUP BY piece"""

  /** DuckDB twin of [[fitVocab]]. `input` projects the corpus rows;
    * `textExpr` names the text column. */
  def fitVocabSql(input: String, textExpr: String, maxPieceLen: Int,
      minFreq: Long, vocabSize: Int): String =
    s"""WITH ug_t AS (${wordTypesSql(input, textExpr)}),
      ug_pc AS (${pieceCountsSql("SELECT * FROM ug_t", maxPieceLen)}),
      ug_kept AS (SELECT piece, c FROM ug_pc WHERE length(piece) = 1 OR c >= $minFreq),
      ug_rk AS (SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece ASC) AS rk FROM ug_kept),
      ug_top AS (SELECT piece, c FROM ug_rk WHERE length(piece) = 1 OR rk <= $vocabSize),
      ug_tot AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS total FROM ug_top)
    SELECT piece, c,
      CAST(floor(ln(CAST(total AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS cost
    FROM ug_top CROSS JOIN ug_tot"""

  /** DuckDB twin of [[segmentPieces]] — the forward fold with the
    * recorded start (list_reduce, list-of-structs accumulator: the
    * shape `unigram_segment` pins), then the backtrace as a RECURSIVE
    * CTE over the flattened DP table. The backtrace deliberately does
    * NOT reuse list_reduce: DuckDB 1.0 mis-binds a lambda that mixes a
    * struct accumulator, CASE and several outer columns (adjacent
    * rows' strings leak in — found building this twin), while the
    * relational jump pos → start is immune and equally sequential. */
  def segmentPiecesSql(input: String, textExpr: String, vocabSql: String,
      maxPieceLen: Int): String =
    s"""WITH RECURSIVE up_t AS (${wordTypesSql(input, textExpr)}),
      up_v AS ($vocabSql),
      up_cand AS (
        SELECT t.word, t.wc, s.g AS s, s.g + l.g AS e,
               substring(t.word, s.g + 1, l.g) AS piece
        FROM up_t t
        CROSS JOIN LATERAL (SELECT unnest(generate_series(0, length(t.word) - 1)) AS g) s
        CROSS JOIN LATERAL (SELECT unnest(generate_series(1, least($maxPieceLen, length(t.word) - s.g))) AS g) l),
      up_m AS (
        SELECT c.word, c.wc,
          list({'s': c.s, 'e': c.e, 'c': v.cost}) AS entries
        FROM up_cand c JOIN up_v v USING (piece)
        GROUP BY c.word, c.wc),
      up_e AS (
        SELECT t.word, t.wc,
          COALESCE(m.entries, CAST([] AS STRUCT(s BIGINT, e BIGINT, c BIGINT)[])) AS entries
        FROM up_t t LEFT JOIN up_m m ON m.word = t.word),
      up_f AS (
        SELECT word, wc,
          list_reduce(
            list_concat(
              [[{'c': CAST(0 AS BIGINT), 'n': CAST(0 AS BIGINT), 's': CAST(0 AS BIGINT)}]],
              list_transform(generate_series(1, length(word)),
                z -> [{'c': CAST(0 AS BIGINT), 'n': CAST(0 AS BIGINT), 's': CAST(0 AS BIGINT)}])),
            (acc, x) -> list_append(acc,
              COALESCE(
                list_sort(list_transform(
                  list_filter(entries, en -> en.e = len(acc)),
                  en -> {'c': acc[en.s + 1].c + en.c, 'n': acc[en.s + 1].n + 1, 's': en.s}))[1],
                {'c': CAST($Inf AS BIGINT), 'n': CAST($Inf AS BIGINT), 's': CAST(0 AS BIGINT)}))) AS tbl
        FROM up_e),
      up_tbl AS (
        SELECT f.word, f.wc, CAST(p.g AS BIGINT) AS pos, f.tbl[p.g + 1].s AS s
        FROM up_f f
        CROSS JOIN LATERAL (SELECT unnest(generate_series(1, length(f.word))) AS g) p
        WHERE f.tbl[length(f.word) + 1].c < $Inf),
      up_bt AS (
        SELECT word, wc, CAST(length(word) AS BIGINT) AS pos, CAST('' AS VARCHAR) AS ps
        FROM up_f WHERE tbl[length(word) + 1].c < $Inf
        UNION ALL
        SELECT b.word, b.wc, t.s AS pos,
          substring(b.word, CAST(t.s + 1 AS INT), CAST(b.pos - t.s AS INT))
            || (CASE WHEN b.ps = '' THEN '' ELSE '|' END) || b.ps AS ps
        FROM up_bt b JOIN up_tbl t ON t.word = b.word AND t.pos = b.pos
        WHERE b.pos > 0)
      SELECT word, wc, pieces FROM (
        SELECT f.word AS word, f.wc AS wc, COALESCE(bt.ps, '') AS pieces
        FROM up_f f
        LEFT JOIN (SELECT word, ps FROM up_bt WHERE pos = 0) bt ON bt.word = f.word)"""

  /** DuckDB twin of [[refitVocab]] — segmentation usage counts →
    * re-costed vocabulary. */
  def refitVocabSql(input: String, textExpr: String, vocabSql: String,
      maxPieceLen: Int): String =
    s"""WITH ur_seg AS (${segmentPiecesSql(input, textExpr, vocabSql, maxPieceLen)}),
      ur_u AS (
        SELECT piece, CAST(sum(wc) AS BIGINT) AS used FROM (
          SELECT wc, unnest(string_split(pieces, '|')) AS piece
          FROM ur_seg WHERE pieces <> '')
        GROUP BY piece),
      ur_tot AS (SELECT CAST(COALESCE(sum(used), 0) AS BIGINT) AS total FROM ur_u)
    SELECT piece, used,
      CAST(floor(ln(CAST(total AS DOUBLE) / CAST(used AS DOUBLE)) * 1000000) AS BIGINT) AS cost
    FROM ur_u CROSS JOIN ur_tot"""

  /** DuckDB twin of [[segmentWords]] under the [[fitVocabSql]] vocab —
    * the SAME fold, element-for-element: a list-of-structs accumulator
    * whose first element is best[0], `len(acc)` as the position, and
    * lexicographic struct ordering as the (cost, pieces) comparison. */
  def segmentWordsSql(input: String, textExpr: String, vocabSql: String,
      maxPieceLen: Int): String =
    s"""WITH us_t AS (${wordTypesSql(input, textExpr)}),
      us_v AS ($vocabSql),
      us_cand AS (
        SELECT t.word, t.wc, s.g AS s, s.g + l.g AS e,
               substring(t.word, s.g + 1, l.g) AS piece
        FROM us_t t
        CROSS JOIN LATERAL (SELECT unnest(generate_series(0, length(t.word) - 1)) AS g) s
        CROSS JOIN LATERAL (SELECT unnest(generate_series(1, least($maxPieceLen, length(t.word) - s.g))) AS g) l),
      us_m AS (
        SELECT c.word, c.wc,
          list({'s': c.s, 'e': c.e, 'c': v.cost}) AS entries
        FROM us_cand c JOIN us_v v USING (piece)
        GROUP BY c.word, c.wc),
      us_e AS (
        SELECT t.word, t.wc,
          COALESCE(m.entries, CAST([] AS STRUCT(s BIGINT, e BIGINT, c BIGINT)[])) AS entries
        FROM us_t t LEFT JOIN us_m m ON m.word = t.word),
      us_f AS (
        SELECT word, wc,
          list_reduce(
            list_concat(
              [[{'c': CAST(0 AS BIGINT), 'n': CAST(0 AS BIGINT)}]],
              list_transform(generate_series(1, length(word)),
                z -> [{'c': CAST(0 AS BIGINT), 'n': CAST(0 AS BIGINT)}])),
            (acc, x) -> list_append(acc,
              COALESCE(
                list_sort(list_transform(
                  list_filter(entries, en -> en.e = len(acc)),
                  en -> {'c': acc[en.s + 1].c + en.c, 'n': acc[en.s + 1].n + 1}))[1],
                {'c': CAST($Inf AS BIGINT), 'n': CAST($Inf AS BIGINT)}))) AS tbl
        FROM us_e)
      SELECT word, wc, tbl[length(word) + 1].c AS cost_micro,
        tbl[length(word) + 1].n AS n_pieces,
        tbl[length(word) + 1].c >= $Inf AS unreachable
      FROM us_f"""
}
