package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: quality scoring,
  * token counting, n-gram language ID, and winnowing fingerprints.
  * Pure column expressions (codegen-friendly, oracle-replayable).
  */
object TextAnalysis {

  /** Per-language marker lexicons for the heuristic language scorer.
    * Deterministic, tiny, and embedded in the plan (broadcast as
    * literals) — the structure of a real n-gram LID model at none of
    * the weight; swap the arrays for real profiles in production. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "is", "and", "of"),
    "es" -> Seq("el", "la", "es", "y", "de"),
    "fr" -> Seq("le", "la", "et", "est", "de"),
    "zh" -> Seq("de", "shi", "he", "zai", "le")
  )

  private val Stopwords = Seq("the", "a", "and", "of", "is", "in", "to")

  /** Mojibake repair — the ftfy move for the single most common crawl
    * corruption: UTF-8 bytes once mis-decoded as Latin-1 ("café" →
    * "cafÃ©"). The inverse is exact and Column-only: re-encode the
    * string as Latin-1 and decode the bytes as UTF-8. Applied only
    * when it is SAFE and USEFUL: the Latin-1 bytes must form VALID
    * UTF-8 (`is_valid_utf8` — pure Latin-1 text is never mangled, its
    * byte stream is invalid UTF-8 and the original is kept; Spark 4's
    * strict `decode` would throw on it otherwise), the repair must
    * change the string, and the original must carry a UTF-8 lead-byte
    * signature character (Ã/Â/â/Ä/Å/Ë — cheap prefilter so the
    * codegen'd common case is a single rlike). Map-only, no UDF. */
  def repairMojibakeCol(textCol: Column): Column = {
    // Spark 4's strict encode/decode THROW on unrepresentable input,
    // and conditional guards do NOT protect them: codegen's common-
    // subexpression elimination hoists shared subtrees out of CaseWhen
    // branches. So the charset work is made TOTAL instead: encode sees
    // the text only when it is signature-bearing AND entirely
    // Latin-1-range (genuine mojibake always is) and the empty string
    // otherwise; decode only ever sees validated UTF-8 bytes.
    val candidate = when(
      textCol.rlike("[\u00c2\u00c3\u00e2\u00c4\u00c5\u00cb]") &&
        !textCol.rlike("[^\\x00-\\xff]"), textCol)
      .otherwise(lit(""))
    val bytes = encode(candidate, "ISO-8859-1")
    val redecoded = decode(
      when(is_valid_utf8(bytes), bytes).otherwise(encode(lit(""), "UTF-8")), "UTF-8")
    when(redecoded =!= lit("") && redecoded =!= textCol, redecoded).otherwise(textCol)
  }

  /** The [[quality]] metric expressions over a text column, keyed by
    * output name — exposed so composers ([[CurationFunnel]]) can
    * evaluate several metric families in ONE projection instead of
    * joining per-family frames. */
  def qualityExprs(textCol: Column): Seq[(String, Column)] = {
    val ws = words(textCol)
    Seq(
      "n_chars" -> length(textCol),
      "n_words" -> size(ws),
      "stopword_ratio" -> (size(filter(ws, w => w.isin(Stopwords: _*))).cast("double") /
        greatest(size(ws), lit(1)).cast("double")),
      "punct_ratio" -> (length(regexp_replace(textCol, "[a-z0-9 ]", "")).cast("double") /
        greatest(length(textCol), lit(1)).cast("double")),
      "avg_word_len" -> (aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        greatest(size(ws), lit(1)).cast("double"))
    )
  }

  /** Quality metrics per document. Ratios are single double divisions of
    * integer counts (engine-exact). */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id") +:
      qualityExprs(col(textCol)).map { case (n, c) => c.as(n) }: _*)

  /** DuckDB twin of [[quality]]'s metric expressions, keyed by output
    * column name, over text expression `t`. */
  def qualitySql(t: String): Seq[(String, String)] = {
    val ws = wordsSql(t)
    val stop = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    Seq(
      "n_chars" -> s"length($t)",
      "n_words" -> s"len($ws)",
      "stopword_ratio" -> s"(CAST(len(list_filter($ws, w -> list_contains($stop, w))) AS DOUBLE) / greatest(len($ws), 1))",
      "punct_ratio" -> s"(CAST(length(regexp_replace($t, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / greatest(length($t), 1))",
      "avg_word_len" -> s"(CAST(list_sum(list_transform($ws, w -> length(w))) AS DOUBLE) / greatest(len($ws), 1))"
    )
  }

  /** Whitespace token count + regex token count (BPE-ish pre-token
    * split: letter runs, digit runs, single other glyphs). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      size(words(col(textCol))).as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("n_re_tokens")
    )

  /** A compact demonstration subword vocabulary: frequent English
    * subwords + single letters/digits as the character fallback floor
    * (ASCII only — the oracle contract of
    * [[graft.plans.VocabTokenCount]]). Production use passes a trained
    * BPE/WordPiece vocab's pieces instead; the counting rule (greedy
    * longest match) is exactly inference-time segmentation. */
  val DefaultBpeVocab: Seq[String] = Seq(
    "the", "and", "ing", "ion", "tion", "ent", "ati", "for", "her", "ter",
    "ate", "est", "all", "int", "ver", "with", "ment", "ere", "igh", "ous",
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti", "es",
    "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to", "nt", "ng",
    "se", "ha", "as", "ou", "io", "le", "ve", "co", "me", "de", "hi", "ri",
    "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch", "ll", "be", "ma", "si",
    "om", "ur") ++ ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString)

  /** Subword token counts under greedy longest-match segmentation
    * against `vocab` — the budget column LLM data work plans by (chunk
    * packing, per-source token caps, training-mix accounting). Counting
    * runs in the native codegen'd [[graft.plans.VocabTokenCount]]
    * expression: map-only, one trie walk per character, no shuffle —
    * feed the output straight to [[Packing.packChunks]] as `tokenCol`.
    *
    * @return (id, n_bpe_tokens) */
  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String] = DefaultBpeVocab): DataFrame =
    df.select(col(idCol).as("id"),
      // null text budgets 0 tokens (the oracle's left-join+coalesce
      // contract), not null — downstream packing drops 0-budget rows
      coalesce(
        graft.plans.VocabTokenCount(words(col(textCol)), typedLit(vocab)),
        lit(0L)).as("n_bpe_tokens"))

  /** DuckDB twin of [[bpeTokenCounts]]: a `WITH RECURSIVE` greedy
    * longest-prefix-match over the DISTINCT words of `input` (id, text),
    * joined back per document — returns the full SELECT (id,
    * n_bpe_tokens). The distinct-word dedupe keeps the recursion
    * proportional to vocabulary size, not corpus size. */
  def bpeTokenCountsSql(input: String, vocab: Seq[String] = DefaultBpeVocab): String = {
    val values = vocab.map(p => s"('${p.replace("'", "''")}')").mkString(", ")
    s"""WITH RECURSIVE
      bpedocs AS (SELECT id, ${wordsSql("text")} AS ws FROM ($input)),
      bpew AS (SELECT id, unnest(ws) AS word FROM bpedocs),
      bpedw AS (SELECT DISTINCT word FROM bpew),
      bpevocab(piece) AS (SELECT * FROM (VALUES $values) v(p)),
      bperec(word, rest, cnt) AS (
        SELECT word, word, 0 FROM bpedw
        UNION ALL
        SELECT word, substr(rest, m + 1), cnt + 1
        FROM (
          SELECT word, rest, cnt,
            coalesce((SELECT max(len(piece)) FROM bpevocab
                      WHERE substr(rest, 1, len(piece)) = piece), 1) AS m
          FROM bperec WHERE len(rest) > 0)
      ),
      bpewtok AS (SELECT word, cnt FROM bperec WHERE rest = ''),
      bpehits AS (
        SELECT b.id, CAST(sum(t.cnt) AS BIGINT) AS n
        FROM bpew b JOIN bpewtok t ON b.word = t.word GROUP BY b.id
      )
      SELECT d.id AS id, coalesce(h.n, 0) AS n_bpe_tokens
      FROM bpedocs d LEFT JOIN bpehits h ON d.id = h.id"""
  }

  /** Language-ID scores: per-language marker hit count / word count;
    * prediction = argmax (ties break to the alphabetically first
    * language — the fold order below). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id") +: langScoreCols(col(textCol)): _*)
    base.withColumn("pred_lang", langPredCol)
  }

  /** The per-language score expressions (`score_<lang>` columns). */
  def langScoreCols(textCol: Column): Seq[Column] = {
    val ws = words(textCol)
    LangMarkers.map { case (lang, markers) =>
      (size(filter(ws, w => w.isin(markers: _*))).cast("double") /
        greatest(size(ws), lit(1)).cast("double")).as(s"score_$lang")
    }
  }

  /** The argmax prediction over already-projected `score_<lang>` columns
    * — argmax via left fold in declaration order: strictly-greater wins,
    * so the earliest language keeps ties. */
  def langPredCol: Column =
    LangMarkers.map(_._1).tail.foldLeft(
      (lit(LangMarkers.head._1), col(s"score_${LangMarkers.head._1}"))
    ) { case ((bestLang, bestScore), lang) =>
      val s = col(s"score_$lang")
      (when(s > bestScore, lit(lang)).otherwise(bestLang),
        when(s > bestScore, s).otherwise(bestScore))
    }._1

  /** DuckDB twin: (score columns, pred_lang expression) over text `t`. */
  def langIdSql(t: String): (Seq[(String, String)], String) = {
    val ws = wordsSql(t)
    val scores = LangMarkers.map { case (lang, markers) =>
      val m = markers.map(s => s"'$s'").mkString("[", ", ", "]")
      lang -> s"(CAST(len(list_filter($ws, w -> list_contains($m, w))) AS DOUBLE) / greatest(len($ws), 1))"
    }
    val pred = scores.tail.foldLeft((s"'${LangMarkers.head._1}'", s"score_${LangMarkers.head._1}")) {
      case ((bl, bs), (lang, _)) =>
        (s"(CASE WHEN score_$lang > $bs THEN '$lang' ELSE $bl END)",
          s"(CASE WHEN score_$lang > $bs THEN score_$lang ELSE $bs END)")
    }._1
    (scores.map { case (l, e) => s"score_$l" -> e }, pred)
  }

  /** Repetition signals (the Gopher-style quality gates for
    * machine-generated / boilerplate text): per document,
    *
    *  - `top_word_frac`   — occurrences of the most frequent word over
    *    total words;
    *  - `top_bigram_frac` — occurrences of the most frequent word
    *    bigram over total bigrams (0 for sub-2-word docs);
    *  - `ttr`             — type-token ratio (distinct words / words).
    *
    * Shape: MAP-ONLY — the [[graft.plans.TextKernels.RepetitionStats]]
    * kernel counts words, distinct words and adjacent bigrams in one
    * whole-stage-codegen'd pass per document (the previous posexplode
    * → two aggregate chains + window `lead` → join-back shape cost a
    * text-carrying repartition plus three more shuffles; bit-identical
    * per TextKernelsSpec — every statistic is an exact integer count
    * over the same word/bigram multiset). All ratios are single
    * divisions of integer counts (engine-exact, so the DuckDB twin
    * matches bit-for-bit). */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        graft.plans.TextKernels.repetitionStats(words(col(textCol))).as("st"))
      .select(
        col("id"),
        (coalesce(col("st.topw"), lit(0L)).cast("double") /
          greatest(coalesce(col("st.nw"), lit(0L)), lit(1L)).cast("double")).as("top_word_frac"),
        (coalesce(col("st.topb"), lit(0L)).cast("double") /
          greatest(coalesce(col("st.nb"), lit(0L)), lit(1L)).cast("double")).as("top_bigram_frac"),
        (coalesce(col("st.nd"), lit(0L)).cast("double") /
          greatest(coalesce(col("st.nw"), lit(0L)), lit(1L)).cast("double")).as("ttr")
      )

  /** DuckDB twin of [[repetition]] as a CTE chain over `input`
    * (must yield (id, text)); final relation `rep` has the four output
    * columns. */
  def repetitionCtes(input: String): String = {
    val ws = wordsSql("text")
    s"""rw AS (SELECT id, $ws AS ws FROM ($input)),
        ruw AS (SELECT id, unnest(ws) AS w FROM rw),
        rwc AS (SELECT id, w, count(*) AS c FROM ruw GROUP BY id, w),
        rwa AS (SELECT id, max(c) AS topw, sum(c) AS nw, count(*) AS nd FROM rwc GROUP BY id),
        rub AS (SELECT id, unnest(list_transform(generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1])) AS b
                FROM rw WHERE len(ws) >= 2),
        rbc AS (SELECT id, b, count(*) AS c FROM rub GROUP BY id, b),
        rba AS (SELECT id, max(c) AS topb, sum(c) AS nb FROM rbc GROUP BY id),
        rep AS (
          SELECT rw.id,
            CAST(coalesce(topw, 0) AS DOUBLE) / greatest(coalesce(nw, 0), 1) AS top_word_frac,
            CAST(coalesce(topb, 0) AS DOUBLE) / greatest(coalesce(nb, 0), 1) AS top_bigram_frac,
            CAST(coalesce(nd, 0) AS DOUBLE) / greatest(coalesce(nw, 0), 1) AS ttr
          FROM rw LEFT JOIN rwa ON rw.id = rwa.id LEFT JOIN rba ON rw.id = rba.id
        )"""
  }

  /** Corpus-wide vocabulary heavy hitters: the `k` most frequent words
    * with their document frequency — the review relation behind
    * stopword lists, boilerplate detection, and tokenizer vocab checks.
    * One explode feeding a (word)-keyed count aggregate with map-side
    * combine (per-word partial counts, never the text, cross the
    * shuffle), then a global top-k (`orderBy.limit` plans a
    * TakeOrderedAndProject — per-partition top-k, no total sort).
    * Deterministic: ties break by the word ascending. No input
    * repartition: unlike [[repetition]] nothing downstream consumes an
    * id-partitioning, and shuffling full document text for scan
    * parallelism is the wrong trade — size scan splits via
    * `spark.sql.files.maxPartitionBytes` instead. */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("id"), explode(words(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n_occurrences"), count_distinct(col("id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("word"))
      .limit(k)

  /** TF-IDF top-k terms per document — the classic salience relation
    * behind keyword extraction, near-dup triage, and topic tagging
    * (Salton & Buckley 1988; smoothing follows the standard
    * `ln((N+1)/(df+1)) + 1` formulation).
    *
    * Relational shape: one explode feeds (id, word) counts (map-side
    * combinable, the shuffle carries count rows); document frequency is
    * a second aggregate over the SLIM tf relation (never the text); the
    * corpus size N is a one-row aggregate broadcast into the scoring
    * projection (no driver collect); the per-document top-k plans a
    * WindowGroupLimit (map-side partial top-k). The tf relation feeds
    * three consumers — materialized once.
    *
    * Scores are `round(tf * idf, 9)`: tf/df/N are exact integers, so
    * the only FP steps are one division, one `ln`, one multiply —
    * identical scalar sequences on any IEEE engine, rounded the same
    * way the cosine tiers are.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = Materialize(
      df.select(col(idCol).as("id"), explode(words(col(textCol))).as("word"))
        .groupBy("id", "word").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("dfreq"))
    val n = tf.agg(count_distinct(col("id")).as("n_docs"))
    val idf = log((col("n_docs") + lit(1)).cast("double") / (col("dfreq") + lit(1)).cast("double")) + lit(1.0)
    val scored = tf.join(dfreq, Seq("word")).crossJoin(broadcast(n))
      .select(col("id"), col("word"), col("tf"),
        round(col("tf").cast("double") * idf, 9).as("score"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("score").desc, col("word"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** DuckDB twin of [[tfidfTopTerms]] as a CTE chain over `input`
    * (must yield (id, text)); final relation `tfr` has columns
    * (id, word, tf, score, rank). */
  def tfidfCtes(input: String): String = {
    val ws = wordsSql("text")
    s"""tuw AS (SELECT id, unnest($ws) AS word FROM ($input)),
        ttf AS (SELECT id, word, count(*) AS tf FROM tuw GROUP BY id, word),
        tdf AS (SELECT word, count(*) AS dfreq FROM ttf GROUP BY word),
        tn AS (SELECT count(DISTINCT id) AS n_docs FROM ttf),
        tsc AS (
          SELECT ttf.id, ttf.word, ttf.tf,
            round(CAST(ttf.tf AS DOUBLE) *
              (ln(CAST(n_docs + 1 AS DOUBLE) / CAST(dfreq + 1 AS DOUBLE)) + 1.0), 9) AS score
          FROM ttf JOIN tdf ON ttf.word = tdf.word CROSS JOIN tn
        ),
        tfr AS (
          SELECT id, word, tf, score,
            CAST(row_number() OVER (PARTITION BY id ORDER BY score DESC, word) AS BIGINT) AS rank
          FROM tsc
        )"""
  }

  /** Sliding-window document chunking — the RAG/embedding prep step:
    * split each document into token windows of `window` tokens starting
    * every `stride` tokens, so consecutive chunks overlap by
    * `window - stride` (context preserved across boundaries). Start
    * positions are 0, stride, 2·stride, …, the last start being the
    * smallest multiple that lets the final chunk reach the document's
    * end (`ceil(max(n-window, 0)/stride)`·stride) — full coverage, no
    * trailing overlap-only slivers; a doc with ≤ window tokens is one
    * chunk; wordless docs emit nothing. Map-only: one tokenize, one
    * posexplode over a computed start sequence, integral arithmetic
    * throughout (the chunk COUNT uses integer ceil-div — fp division
    * would misplace boundaries on long docs).
    *
    * @return (id, chunk_id 0-based, start_token, n_tokens, chunk_text) */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    val n = size(col("ws"))
    val nChunks = expr(s"(greatest(size(ws) - $window, 0) + $stride - 1) DIV $stride").cast("int") + lit(1)
    df.select(col(idCol).as("id"), words(col(textCol)).as("ws"))
      .filter(n > 0)
      .select(col("id"), col("ws"),
        posexplode(transform(sequence(lit(0), nChunks - 1), i => i * stride)))
      .select(col("id"), col("pos").cast("long").as("chunk_id"),
        col("col").cast("long").as("start_token"),
        least(lit(window), size(col("ws")) - col("col")).cast("long").as("n_tokens"),
        array_join(slice(col("ws"), col("col") + 1, lit(window)), " ").as("chunk_text"))
  }

  /** DuckDB twin of [[chunkText]] over `input` (id, text). */
  def chunkTextSql(input: String, window: Int, stride: Int): String =
    s"""WITH cw AS (SELECT id, ${wordsSql("text")} AS ws FROM ($input)),
      cnz AS (SELECT id, ws, len(ws) AS n FROM cw WHERE len(ws) > 0),
      cst AS (
        SELECT id, ws, n, CAST(i AS BIGINT) AS chunk_id, CAST(i * $stride AS BIGINT) AS start_token
        FROM cnz CROSS JOIN unnest(generate_series(0,
          (greatest(n - $window, 0) + $stride - 1) // $stride)) AS t(i)
      )
      SELECT id, chunk_id, start_token,
        CAST(least($window, n - start_token) AS BIGINT) AS n_tokens,
        array_to_string(ws[start_token + 1 : start_token + $window], ' ') AS chunk_text
      FROM cst"""

  /** BM25 relevance of every document against a literal query-term set
    * (Robertson & Zaragoza 2009) — the retrieval scorer a curation
    * pipeline uses to mine topic-relevant training data from a raw
    * corpus ("find docs about X at 100 TB"). Only documents matching at
    * least one term are returned.
    *
    * Per matched (doc, term):
    * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))` (Lucene's non-negative
    * formulation) and
    * `w = idf · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`.
    *
    * Determinism: tf/df/dl/N are exact integers; each term weight is a
    * fixed scalar-op sequence (one ln — same cross-engine precedent as
    * the tf-idf tier), quantized to 1e-9 BIGINT so the PER-DOC SUM over
    * matched terms is exact integer arithmetic (order-proof), with one
    * double division at the end.
    *
    * Relational shape: the explode filters to the literal term set
    * BEFORE the tf shuffle (the slim relation carries only query-term
    * hits, ~|terms|·N_matched rows, not the corpus vocabulary); df is
    * an aggregate of that slim relation; doc lengths come from a
    * map-side-combinable count; the ≤|terms|-row df table and the
    * one-row stats broadcast into the scoring join.
    *
    * @return (id, n_terms_hit, score) */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct.size == queryTerms.size, "duplicate query term")
    val base = df.select(col(idCol).as("id"), words(col(textCol)).as("ws"))
    // dl feeds TWO consumers (the corpus stats aggregate and the scoring
    // join) — materialized so the corpus tokenizes once for the length
    // pass instead of once per consumer; the slim (id, dl) relation is
    // cheap to hold. The tf branch keeps its own (filtered) pass.
    val dl = Materialize(base.select(col("id"), size(col("ws")).as("dl")))
    val tf = base.select(col("id"), explode(col("ws")).as("word"))
      .filter(col("word").isin(queryTerms: _*))
      .groupBy("id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("dfreq"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double")).as("avgdl"))
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("dfreq")).cast("double") + lit(0.5)) /
        (col("dfreq").cast("double") + lit(0.5)))
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / col("avgdl")))
    val termW = idf * (col("tf").cast("double") * lit(k1 + 1.0) / denom)
    tf.join(broadcast(dfreq), Seq("word"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .select(col("id"), floor(termW * lit(1e9)).cast("long").as("fw"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("fw")).as("fsum"))
      .select(col("id"), col("n_terms_hit"),
        (col("fsum").cast("double") / lit(1e9)).as("score"))
  }

  /** DuckDB twin of [[bm25Scores]] over `input` (id, text). */
  def bm25Sql(input: String, queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): String = {
    val terms = queryTerms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    val idf = "ln(1.0 + (CAST(n_docs - dfreq AS DOUBLE) + 0.5) / (CAST(dfreq AS DOUBLE) + 0.5))"
    val denom = s"CAST(tf AS DOUBLE) + $k1 * (1.0 - $b + $b * (CAST(dl AS DOUBLE) / avgdl))"
    val termW = s"$idf * (CAST(tf AS DOUBLE) * ${k1 + 1.0} / ($denom))"
    s"""WITH bsrc AS (SELECT id, ${wordsSql("text")} AS ws FROM ($input)),
      bdl AS (SELECT id, len(ws) AS dl FROM bsrc),
      btf AS (
        SELECT id, word, count(*) AS tf
        FROM (SELECT id, unnest(ws) AS word FROM bsrc)
        WHERE word IN ($terms) GROUP BY id, word
      ),
      bdf AS (SELECT word, count(*) AS dfreq FROM btf GROUP BY word),
      bst AS (SELECT count(*) AS n_docs,
                CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
              FROM bdl),
      bfw AS (
        SELECT btf.id, CAST(floor(($termW) * 1000000000) AS BIGINT) AS fw
        FROM btf JOIN bdf USING (word) JOIN bdl ON btf.id = bdl.id CROSS JOIN bst
      )
      SELECT id, CAST(count(*) AS BIGINT) AS n_terms_hit,
        CAST(CAST(sum(fw) AS BIGINT) AS DOUBLE) / 1000000000.0 AS score
      FROM bfw GROUP BY id"""
  }

  /** Feature-hashing linear quality scorer — the SHAPE of a fastText /
    * logistic-regression quality filter (hashing trick: Weinberger et
    * al., ICML'09) with a deterministic md5-derived weight table, so
    * the pipeline slot is real and swapping in trained weights is a
    * one-line change. Per document:
    * `z = Σ w(word) / (1000 · n_words)`, `score = σ(z)`,
    * where `w(word) = (portable_hash60("w8:" + word) mod 2001) − 1000`
    * ∈ [−1000, 1000].
    *
    * Determinism: the weight SUM is integral (exact, order-independent
    * — FP accumulation over row sets is partition-order-dependent and
    * banned by the oracle rules); the only FP steps are one division
    * and one sigmoid, rounded at 9 dp like the ln/cosine tiers.
    * Shape: MAP-ONLY — the [[graft.plans.TextKernels.QualityWordStats]]
    * kernel folds the integer weight sum and word count in one
    * whole-stage-codegen'd pass per document (the previous explode →
    * aggregate → join-back shape cost a shuffle and a join;
    * bit-identical per TextKernelsSpec — same exact integer sums into
    * the SAME sigmoid expression); wordless documents score σ(0) = 0.5.
    */
  def hashedQualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        graft.plans.TextKernels.qualityWordStats(words(col(textCol))).as("st"))
      .select(col("id"),
        round(lit(1.0) / (lit(1.0) + exp(-(coalesce(col("st.zsum"), lit(0L)).cast("double") /
          (lit(1000.0) * greatest(coalesce(col("st.nw"), lit(0L)), lit(1L)).cast("double"))))), 9)
          .as("quality_score"))

  /** DuckDB twin of [[hashedQualityScore]] over text expression `t` —
    * per-row list fold (sequential, integer-exact) instead of the
    * distributed aggregate; identical values. */
  def hashedQualityScoreSql(t: String): String = {
    val ws = wordsSql(t)
    val w = s"(CAST('0x' || substr(md5('w8:' || w), 1, 15) AS BIGINT) % 2001 - 1000)"
    s"""round(1.0 / (1.0 + exp(-(CAST(coalesce(list_sum(list_transform($ws, w -> $w)), 0) AS DOUBLE)
        / (1000.0 * greatest(len($ws), 1))))), 9)"""
  }

  /** PII patterns shared by the Spark operator and the SQL twin —
    * deliberately restricted to constructs with identical semantics in
    * Java regex and RE2 (no lookaround, no backrefs). */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "[EMAIL]"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[SSN]"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]")
  )

  /** PII scrubbing: per-pattern match counts plus the redacted text
    * (every match replaced by its tag, applied in [[PiiPatterns]]
    * order). Each pattern's COUNT is evaluated on the text with the
    * EARLIER patterns already applied — the same text its own rewrite
    * sees — so counts always reconcile with the tags in `redacted`
    * even when patterns overlap (an SSN-shaped local part inside an
    * email address counts as the email that swallowed it, not as a
    * phantom un-tagged SSN). Map-only — no shuffle. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (redacted, counts) =
      PiiPatterns.foldLeft((col(textCol), Seq.empty[org.apache.spark.sql.Column])) {
        case ((c, acc), (name, re, tag)) =>
          (regexp_replace(c, re, java.util.regex.Matcher.quoteReplacement(tag)),
            acc :+ size(regexp_extract_all(c, lit(re), lit(0))).as(s"n_$name"))
      }
    df.select(col(idCol).as("id") +: counts :+ redacted.as("redacted"): _*)
  }

  /** HTML table extraction — scraped pages carry their structured
    * payload in <table> markup that plain tag-stripping reduces to
    * word soup; this pulls the cell RELATION out instead:
    * (id, row_no, col_no, cell), one row per <td>/<th>, in document
    * order. Non-greedy RE2-safe patterns ((?is), no lookaround — the
    * engine-parity rule all graft regexes follow), map-only double
    * posexplode. Rows outside tables and malformed fragments simply
    * contribute no cells — extraction, not validation. */
  def htmlTables(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val trPat = "(?is)<tr[^>]*>(.*?)</tr>"
    val cellPat = "(?is)<t[dh][^>]*>(.*?)</t[dh]>"
    df.select(col(idCol).as("id"),
        posexplode(regexp_extract_all(col(htmlCol), lit(trPat), lit(1))))
      .select(col("id"), col("pos").cast("long").as("row_no"), col("col").as("tr"))
      .select(col("id"), col("row_no"),
        posexplode(regexp_extract_all(col("tr"), lit(cellPat), lit(1))))
      .select(col("id"), col("row_no"), col("pos").cast("long").as("col_no"),
        trim(col("col")).as("cell"))
  }

  /** Zipf's-law fit over the corpus word-frequency distribution — the
    * statistical fingerprint that catches template-generated or
    * deduplication-damaged corpora (natural text has slope ≈ −1;
    * boilerplate floods flatten the head, aggressive dedup starves
    * it). Least squares of ln(freq) on ln(rank) over the top-K terms,
    * done ENTIRELY in integer arithmetic: each ln quantizes to
    * milli-units (floor ·1e3 — small enough that the K·Σ products and
    * their squares stay inside DECIMAL(38)), the regression sums are
    * exact decimal sums, and the outputs are half-up micro-unit
    * ratios. Order-proof and DuckDB-replayable like the other
    * fixed-point analytics; the one float per term (`ln` of an integer
    * < 2^31) renders identically on both engines in practice and any
    * disagreement is bounded by the milli grid.
    *
    * Shape: word count = one map-combinable shuffle; ranking is a
    * window over the VOCABULARY relation (≪ corpus); the fit is one
    * ≤K-row aggregate.
    *
    * @return one row: (n_terms, slope_micro, intercept_micro,
    *         r2_micro) */
  def zipfFit(df: DataFrame, textCol: String, topK: Int = 500): DataFrame = {
    require(topK >= 2, s"topK must be >= 2, got $topK")
    val wc = df.select(explode(words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val ranked = wc.withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("c").desc, col("w").asc)))
      .filter(col("r") <= topK)
      .select(floor(log(col("r").cast("double")) * 1000).cast("decimal(38,0)").as("x"),
        floor(log(col("c").cast("double")) * 1000).cast("decimal(38,0)").as("y"))
    val s = ranked.agg(count(lit(1)).cast("decimal(38,0)").as("k"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    s.select(
        col("k").cast("long").as("n_terms"),
        (col("k") * col("sxy") - col("sx") * col("sy")).as("cov"),
        (col("k") * col("sxx") - col("sx") * col("sx")).as("varx"),
        (col("k") * col("syy") - col("sy") * col("sy")).as("vary"),
        col("sx"), col("sy"), col("k"))
      .selectExpr("n_terms",
        // degenerate variances (single term / all-equal frequencies)
        // define a flat fit rather than divide by zero under ANSI
        "CASE WHEN varx = 0 THEN CAST(0 AS BIGINT) ELSE " +
          graft.functions.TextFunctions.ratioScaled("cov", "varx", 1000000L) +
          " END AS slope_micro",
        // intercept = (Σy − slope·Σx)/K, micro-units of the milli-ln scale
        "CASE WHEN varx = 0 THEN " +
          graft.functions.TextFunctions.ratioScaled("sy", "k", 1000L) + " ELSE " +
          graft.functions.TextFunctions.ratioScaled(
            "sy * varx - cov * sx", "k * varx", 1000L) + " END AS intercept_micro",
        "CASE WHEN varx = 0 OR vary = 0 THEN CAST(0 AS BIGINT) ELSE " +
          graft.functions.TextFunctions.ratioScaled(
            "cov * cov", "varx * vary", 1000000L) + " END AS r2_micro")
  }

  /** DuckDB twin of [[zipfFit]] over text expression column `text` of
    * `input`. */
  def zipfFitSql(input: String, topK: Int): String = {
    val rs = graft.functions.TextFunctions.ratioScaledSql _
    s"""
      WITH zwc AS (
        SELECT w, count(*) AS c
        FROM (SELECT unnest(${wordsSql("text")}) AS w FROM ($input)) GROUP BY w),
      zrk AS (
        SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000) AS HUGEINT) AS x,
               CAST(floor(ln(CAST(c AS DOUBLE)) * 1000) AS HUGEINT) AS y
        FROM (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r FROM zwc)
        WHERE r <= $topK),
      zs AS (
        SELECT CAST(count(*) AS HUGEINT) AS k,
          CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
          CAST(SUM(x * x) AS HUGEINT) AS sxx, CAST(SUM(y * y) AS HUGEINT) AS syy,
          CAST(SUM(x * y) AS HUGEINT) AS sxy
        FROM zrk),
      zt AS (
        SELECT CAST(k AS BIGINT) AS n_terms,
          k * sxy - sx * sy AS cov, k * sxx - sx * sx AS varx,
          k * syy - sy * sy AS vary, sx, sy, k
        FROM zs)
      SELECT n_terms,
        CASE WHEN varx = 0 THEN CAST(0 AS BIGINT)
             ELSE ${rs("cov", "varx", 1000000L)} END AS slope_micro,
        CASE WHEN varx = 0 THEN ${rs("sy", "k", 1000L)}
             ELSE ${rs("sy * varx - cov * sx", "k * varx", 1000L)} END AS intercept_micro,
        CASE WHEN varx = 0 OR vary = 0 THEN CAST(0 AS BIGINT)
             ELSE ${rs("cov * cov", "varx * vary", 1000000L)} END AS r2_micro
      FROM zt"""
  }

  /** Candidate payment-card pattern: 13–19 digits with optional
    * single space/dash separators, word-bounded. Restricted to
    * constructs with identical leftmost-greedy semantics in Java regex
    * and RE2, like [[PiiPatterns]]. */
  val CcCandidatePattern = "\\b[0-9][0-9 -]{11,21}[0-9]\\b"

  /** Luhn checksum over a digits-only string Column — entirely
    * built-in expressions (no UDF): processing from the RIGHT, odd
    * positions double (−9 above 9), total ≡ 0 (mod 10), length 13–19.
    * Digits decode as `ascii(ch) − 48` — TOTAL under ANSI mode (a
    * string cast would THROW on non-digit input; Spark 4 defaults ANSI
    * on); any out-of-range character trips the `bad` counter and the
    * verdict is false, never an error. */
  def luhnValid(digits: Column): Column = {
    val n = length(digits)
    val folded = aggregate(
      sequence(lit(0), greatest(n - 1, lit(0))),
      struct(lit(0L).as("total"), lit(0L).as("bad")),
      (acc, i) => {
        val d = (ascii(substring(digits, (n - i).cast("int"), lit(1))) - lit(48)).cast("long")
        struct(
          (acc.getField("total") + when(i % 2 === 0, d)
            .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))).as("total"),
          (acc.getField("bad") + when(d.between(0, 9), lit(0L)).otherwise(lit(1L))).as("bad"))
      })
    n.between(13, 19) && folded.getField("bad") === 0 &&
      folded.getField("total") % 10 === 0
  }

  /** Credit-card PII with CHECKSUM validation — the rigor regex-only
    * scanners lack: card-shaped digit runs are only redacted when the
    * Luhn checksum holds, so order ids and phone-length numerics
    * survive while real card numbers (any separator style) become
    * `[CC]`. Per doc: valid/invalid candidate counts plus the
    * redacted text (literal replacement of each valid candidate; a
    * candidate string occurring twice counts twice and both
    * occurrences redact on its first replacement). Map-only. */
  def redactCreditCards(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val all = regexp_extract_all(col(textCol), lit(CcCandidatePattern), lit(0))
    val valid = filter(all, c => luhnValid(regexp_replace(c, "[ -]", "")))
    df.select(col(idCol).as("id"),
      size(valid).cast("long").as("n_cc_valid"),
      (size(all) - size(valid)).cast("long").as("n_cc_invalid"),
      aggregate(valid, col(textCol),
        (acc, c) => replace(acc, c, lit("[CC]"))).as("redacted"))
  }

  /** DuckDB twin of [[redactCreditCards]], keyed by output column. */
  def redactCreditCardsSql(t: String): Seq[(String, String)] = {
    // DuckDB single-quoted literals keep backslashes literal, so the
    // Java-escaped pattern embeds as-is (\b reaches RE2 unmangled)
    val pat = CcCandidatePattern
    val digits = "regexp_replace(c, '[ -]', '', 'g')"
    // ascii(ch) - 48, like the Column path: total, no CAST-throw class
    val dd = s"(ascii(substring($digits, len($digits) - i, 1)) - 48)"
    val luhn =
      s"""(len($digits) BETWEEN 13 AND 19 AND
          list_sum(list_transform(generate_series(0, len($digits) - 1), i ->
            CASE WHEN i % 2 = 0 THEN $dd
                 WHEN 2 * $dd > 9 THEN 2 * $dd - 9
                 ELSE 2 * $dd END)) % 10 = 0)"""
        .linesIterator.map(_.trim).mkString(" ")
    val allE = s"regexp_extract_all($t, '$pat')"
    val validE = s"list_filter($allE, c -> $luhn)"
    Seq(
      "n_cc_valid" -> s"CAST(len($validE) AS BIGINT)",
      "n_cc_invalid" -> s"CAST(len($allE) - len($validE) AS BIGINT)",
      "redacted" -> s"list_reduce(list_prepend($t, $validE), (acc, c) -> replace(acc, c, '[CC]'))")
  }

  /** DuckDB twin of [[redactPii]], keyed by output column, over text
    * expression `t`. */
  def redactPiiSql(t: String): Seq[(String, String)] = {
    // DuckDB single-quoted literals keep backslashes literal (Postgres
    // style) — only quotes need escaping
    def esc(re: String) = re.replace("'", "''")
    val (redacted, counts) = PiiPatterns.foldLeft((t, Seq.empty[(String, String)])) {
      case ((e, acc), (name, re, tag)) =>
        (s"regexp_replace($e, '${esc(re)}', '$tag', 'g')",
          acc :+ (s"n_$name" -> s"len(regexp_extract_all($e, '${esc(re)}'))"))
    }
    counts :+ ("redacted" -> redacted)
  }

  /** Case-insensitive tag-name pattern via explicit char classes — NOT
    * the (?i) flag: RE2's (?i) does Unicode case folding (U+017F 'ſ'
    * matches 's') while Java's is ASCII-only; explicit classes are
    * identical on both engines. */
  private def tagPat(tag: String): String =
    tag.map(c => s"[$c${c.toUpper}]").mkString

  /** Engine-identical whitespace class: Java's \s includes \x0B, RE2's
    * does not — spell the set out. */
  private val WsClass = "[ \\t\\n\\f\\r\\x0B]"

  /** HTML → text cleaning, the web-scrape ingest step: drop
    * script/style elements WITH their contents (closed blocks first;
    * a remaining UNCLOSED open tag — a truncated scrape — drops
    * everything to end-of-text rather than leaking raw JS/CSS into the
    * corpus), strip remaining tags to spaces, decode the five
    * predefined entities (&amp;amp; last, so double-encoded entities
    * decode exactly one level — the standard rule), collapse
    * whitespace. Pure regexp/replace column exprs — map-only,
    * codegen'd, and every pattern is written in the Java∩RE2 common
    * subset (explicit case classes not (?i), explicit whitespace class
    * not \s, lazy quantifiers, no backreferences) so the DuckDB twin
    * replays byte-for-byte. NOT a sanitizer: this is corpus text
    * extraction, not XSS defense.
    *
    * @return (id, text_clean) */
  def stripHtml(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), stripHtmlExpr(col(textCol)).as("text_clean"))

  private def stripHtmlExpr(t: Column): Column = {
    // per-tag literal passes, not one backreferenced pattern: the
    // DuckDB twin runs RE2, which has no backreferences
    val noScript = Seq("script", "style").foldLeft(t) { (c, tag) =>
      val p = tagPat(tag)
      val closed = regexp_replace(c, lit(s"(?s)<$p\\b[^>]*>.*?</$p$WsClass*>"), lit(" "))
      // any <script...> still present is unclosed: truncate to EOT
      regexp_replace(closed, lit(s"(?s)<$p\\b[^>]*>.*$$"), lit(" "))
    }
    val noTags = regexp_replace(noScript, lit("(?s)<[^>]*>"), lit(" "))
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, lit(s"$WsClass+"), lit(" ")))
  }

  /** DuckDB twin of [[stripHtml]] over text expression `t`. */
  def stripHtmlSql(t: String): String = {
    val noScript = Seq("script", "style").foldLeft(t) { (c, tag) =>
      val p = tagPat(tag)
      val closed = s"regexp_replace($c, '(?s)<$p\\b[^>]*>.*?</$p$WsClass*>', ' ', 'g')"
      s"regexp_replace($closed, '(?s)<$p\\b[^>]*>.*$$', ' ', 'g')"
    }
    val noTags = s"regexp_replace($noScript, '(?s)<[^>]*>', ' ', 'g')"
    // SQL-literal escaping: '' is one quote char; " needs none
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "''", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => s"replace($c, '$from', '$to')" }
    s"trim(regexp_replace($decoded, '$WsClass+', ' ', 'g'))"
  }

  /** Winnowing document fingerprints: (id, fingerprints array<bigint>).
    * shingleLen-gram rolling hashes, min per window of `window`.
    *
    * Map-only: tokenize → shingle → hash → native winnow, one projection
    * per row, ZERO shuffles — at corpus scale the cost is exactly one
    * pass over the text. This shape is only viable because
    * [[graft.plans.WinnowMins]] references its input array ONCE (a prior
    * formulation detoured through the exploded
    * [[Dedup.shingleHashRows]] relation plus a regroup shuffle to dodge
    * the interpreted HOF winnow re-evaluating the hash chain per
    * window). Documents shorter than one shingle yield an empty array. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   shingleLen: Int = 3, window: Int = 4): DataFrame =
    df.select(col(idCol).as("id"),
      // null text -> empty fingerprint set (not null): the contract the
      // oracle's left-join+coalesce shape establishes — without this,
      // words(null) poisons the whole chain to null
      coalesce(
        winnow(
          graft.plans.ShingleHash60(words(col(textCol)), shingleLen),
          window),
        typedLit(Seq.empty[Long])).as("fingerprints"))

  // -------------------------------------------------------------------
  // C4-style line-level cleaning (Raffel et al., JMLR'20 §2.2)
  // -------------------------------------------------------------------

  /** Phrases whose presence (lowercase contains) disqualifies a line —
    * the C4 boilerplate markers. */
  val C4BannedPhrases: Seq[String] =
    Seq("javascript", "cookie policy", "lorem ipsum", "terms of use", "privacy policy")

  /** The banned-phrase alternation (the phrases are plain literals, so
    * the pattern is Java∩RE2-safe): ONE lower + ONE regex scan per line
    * instead of a lower+contains pair per phrase. */
  private val C4BannedPattern: String = C4BannedPhrases.mkString("|")

  /** Terminal punctuation accepted by the C4 line rule — ONE definition
    * rendered into both the Spark operator and the SQL twin (the
    * C4BannedPhrases / gopherRules convention). */
  private val C4TerminalPunct: Seq[String] = Seq(".", "!", "?", "\"")

  /** Line-keep rule shared by [[c4Clean]] and its SQL twin: terminal
    * punctuation, a word floor, no boilerplate phrase, no `{`. */
  private def c4LineKeep(t: Column, minWordsPerLine: Int): Column = {
    val terminal = C4TerminalPunct.map(p => t.endsWith(lit(p))).reduce(_ || _)
    terminal && size(words(t)) >= minWordsPerLine &&
      !lower(t).rlike(C4BannedPattern) && !t.contains(lit("{"))
  }

  /** C4-style line-level cleaning (Raffel et al., JMLR'20 §2.2): split
    * on newlines, drop empty-after-trim lines BEFORE any rule runs,
    * keep a line iff it ends in terminal punctuation (`. ! ? "`), has
    * ≥ `minWordsPerLine` words, contains no [[C4BannedPhrases]] marker
    * (case-insensitive) and no `{`; then keep a DOCUMENT iff at least
    * `minLinesPerDoc` lines survive (C4's three-sentence floor).
    *
    * Map-only — one projection, zero shuffles; dropped documents exit
    * the relation (a survivor relation, composable with the funnel and
    * dedup tiers). Null-text docs have no lines and drop. ASCII
    * contract like the other text tiers.
    *
    * @return (id, text_clean, n_lines, n_lines_kept), surviving docs only */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      minWordsPerLine: Int = 5, minLinesPerDoc: Int = 3): DataFrame = {
    val ls = lines(col(textCol))
    val kept = filter(ls, t => c4LineKeep(t, minWordsPerLine))
    df.select(col(idCol).as("id"),
        array_join(kept, "\n").as("text_clean"),
        size(ls).as("n_lines"),
        size(kept).as("n_lines_kept"))
      .filter(col("n_lines_kept") >= minLinesPerDoc)
  }

  /** DuckDB twin of [[c4Clean]] over `input` (id, text) — a full SELECT
    * with the same four output columns. */
  def c4CleanSql(input: String, minWordsPerLine: Int = 5, minLinesPerDoc: Int = 3): String = {
    val terminal = C4TerminalPunct.map(p => s"ends_with(t, '$p')")
      .mkString("(", " OR ", ")")
    val keep = s"$terminal AND len(${wordsSql("t")}) >= $minWordsPerLine " +
      s"AND NOT regexp_matches(lower(t), '$C4BannedPattern') AND NOT contains(t, '{')"
    s"""SELECT id, array_to_string(kept, chr(10)) AS text_clean,
         len(lines) AS n_lines, len(kept) AS n_lines_kept
       FROM (
         SELECT id, lines, list_filter(lines, t -> $keep) AS kept
         FROM (SELECT id, ${linesSql("text")} AS lines FROM ($input))
       ) WHERE len(kept) >= $minLinesPerDoc"""
  }

  // -------------------------------------------------------------------
  // Character-trigram LM score (the CCNet perplexity-filter slot)
  // -------------------------------------------------------------------

  /** ln(2) as a shared literal: embedding the CONSTANT (not `ln(2.0)`
    * evaluated per engine) removes the one place a last-ulp libm
    * difference could enter the weight formula. */
  private val Ln2 = 0.6931471805599453

  /** Character trigrams of `t`; sub-3-char or null text yields the
    * empty array. Runs in the native codegen'd
    * [[graft.plans.CharNgrams]] kernel — one byte walk per document
    * instead of an interpreted `sequence` + lambda-`substr` pair per
    * trigram (bit-identical to that formulation, spec-asserted). */
  def charTrigrams(t: Column): Column =
    coalesce(graft.plans.CharNgrams(t, 3), array().cast("array<string>"))

  /** Feature-hashed text embeddings (the hashing trick, Weinberger et
    * al., ICML'09): each char trigram hashes to a dimension and a ±1
    * sign, and the document's vector is the signed occurrence count
    * per dimension — a model-free dense representation whose cosine
    * tracks trigram-profile overlap, good enough to drive the ANN /
    * near-dup / SemDeDup tiers end-to-end from raw text with zero
    * external artifacts.
    *
    * Everything is content-addressed integers until the final cast
    * (counts in BIGINT, dimensions/signs from the md5 hash), so the
    * DuckDB twin replays vectors exactly and cosines computed from
    * them are bit-identical. MAP-ONLY end to end: the
    * [[graft.plans.TextKernels.HashedEmbed]] kernel hashes each
    * trigram and accumulates the per-dimension BIGINT sums in one
    * whole-stage-codegen'd pass per document (the previous explode →
    * (id, dim) aggregate → map assembly → join-back shape cost two
    * shuffles and a join; bit-identical per TextKernelsSpec — the
    * per-dimension sums are order-independent integers). Documents
    * with no trigrams embed as the zero vector (cosine guards apply
    * downstream).
    *
    * @return (id, embedding: array<double> of length `dim`) */
  def hashedEmbedding(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 64): DataFrame = {
    require(dim >= 2 && dim <= 4096, s"dim must be in [2, 4096], got $dim")
    df.select(col(idCol).as("id"),
      graft.plans.TextKernels.hashedEmbed(charTrigrams(col(textCol)), dim)
        .as("embedding"))
  }

  /** DuckDB twin of [[hashedEmbedding]] over `input` (id, text):
    * emits `hemb(id, vec)`. */
  def hashedEmbeddingSql(input: String, dim: Int): String =
    s"""hsrc AS (SELECT id, text FROM ($input)),
      htri AS (SELECT id, unnest(list_transform(generate_series(1, length(text) - 2),
                 i -> substr(text, i, 3))) AS g
               FROM hsrc WHERE length(text) >= 3),
      hhx AS (SELECT id, ${graft.functions.TextFunctions.portableHash60Sql("'emb:' || g")} AS h FROM htri),
      hcell AS (SELECT id, h % $dim AS d,
                  CAST(SUM(CASE WHEN (h // $dim) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
                FROM hhx GROUP BY 1, 2),
      hgrid AS (SELECT s.id, t.d FROM hsrc s CROSS JOIN range($dim) t(d)),
      hemb AS (SELECT g.id, list(CAST(COALESCE(c.v, 0) AS DOUBLE) ORDER BY g.d) AS vec
               FROM hgrid g LEFT JOIN hcell c ON c.id = g.id AND c.d = g.d
               GROUP BY g.id)"""

  /** Character-trigram LM quality score — the CCNet perplexity-filter
    * slot (Wenzek et al., LREC'20), self-trained: fit add-one-smoothed
    * conditional trigram counts on `fitDf`, then score each document of
    * `df` by mean bits per trigram:
    * `bits(d) = Σ_t log2((c2(t[0:2]) + V) / (c3(t) + 1)) / n_tri(d)`,
    * with V = fit-corpus alphabet size (distinct trailing chars). Low
    * bits = predictable/common text, high = gibberish — CCNet buckets
    * by perplexity and thresholds a tail. The gate fits and scores the
    * same corpus; production fits on a reference slice.
    *
    * Determinism: c3/c2/V are exact integers; each DISTINCT trigram's
    * bit-weight is one ln + one division quantized to 1e-6 BIGINT
    * (coarser than BM25's 1e-9 on purpose: the model carries a weight
    * per distinct trigram, so floor-boundary exposure scales with
    * vocabulary; 1e-6 bits is far below any threshold's resolution);
    * per-doc sums AND the mean stay exact integer arithmetic
    * (order-proof) down to half-up-rounded micro-bits; the only FP step
    * is one exact division by 1e6.
    *
    * Shape: fit = one slim map-side-combinable count shuffle over the
    * trigram explode; the model (≤ alphabet³ rows — bounded by the
    * charset, not the corpus) BROADCASTS into the scoring explode, and
    * the per-doc aggregate is the only other shuffle, carrying slim
    * (id, count, sum) partials. A trigram absent from the model (only
    * possible when fitDf ≠ df) backs off to its bigram context:
    * add-one gives bits = log2(c2 + V), degrading to the log2(V) floor
    * when the bigram is unseen too.
    *
    * @return (id, n_trigrams, bits_per_trigram) for every doc of `df`
    *         (trigram-less docs score 0.0) */
  def lmScore(df: DataFrame, idCol: String, textCol: String, fitDf: DataFrame): DataFrame = {
    // self-fit (the common corpus-curation shape, and the gate's): the
    // trigram explode — the expensive interpreted-HOF pass — runs ONCE,
    // materialized for both the fit aggregate and the scoring join, and
    // the model join tightens to INNER with no default-weight fallback
    // (every scored trigram is in the model by construction), dropping
    // the 1-row broadcast product from the hot path. Under
    // spark.graft.materialize=none the explode recomputes per consumer
    // instead — the right trade at 100 TB, where checkpointing the
    // exploded corpus would dwarf the recompute.
    val sameCorpus = fitDf eq df
    val scoreTris = df.select(col(idCol).as("id"), explode(charTrigrams(col(textCol))).as("tri"))
    val shared = if (sameCorpus) Materialize(scoreTris) else null
    val fitTris =
      if (sameCorpus) shared.select(col("tri"))
      else fitDf.select(explode(charTrigrams(col(textCol))).as("tri"))
    val c3 = fitTris.groupBy("tri").agg(count(lit(1)).as("c3"))
    val c2 = c3.groupBy(substring(col("tri"), 1, 2).as("big")).agg(sum(col("c3")).as("c2"))
    val v = c3.agg(count_distinct(substring(col("tri"), 3, 1)).as("v"))
    val model = c3.withColumn("big", substring(col("tri"), 1, 2))
      // c2 is ≤ alphabet² rows — broadcast, the model build never shuffles c3
      .join(broadcast(c2), Seq("big"))
      .crossJoin(broadcast(v))
      .select(col("tri"),
        floor(log((col("c2") + col("v")).cast("double") /
            (col("c3") + lit(1L)).cast("double")) / lit(Ln2) * lit(1e6))
          .cast("long").as("w"))
    val joined =
      if (sameCorpus) shared.join(broadcast(model), Seq("tri"))
        .select(col("id"), col("w"))
      else {
        // cross-fit: an unseen trigram backs off to its BIGRAM context —
        // add-one gives p = (0+1)/(c2+V), i.e. bits = log2(c2+V), with
        // c2 = 0 when the bigram is unseen too (the log2(V) floor).
        // Falling straight to log2(V) for every miss would score
        // gibberish with common prefixes as predictable text.
        val unseenW = floor(log((coalesce(col("c2"), lit(0L)) + col("v")).cast("double")) /
          lit(Ln2) * lit(1e6)).cast("long")
        scoreTris
          .join(broadcast(model), Seq("tri"), "left")
          .join(broadcast(c2), substring(col("tri"), 1, 2) === col("big"), "left")
          .crossJoin(broadcast(v))
          .select(col("id"), coalesce(col("w"), unseenW).as("w"))
      }
    val scored = joined
      .groupBy("id").agg(count(lit(1)).as("n_trigrams"), sum(col("w")).as("wsum"))
    // the mean stays in INTEGER arithmetic to the end: half-up-rounded
    // micro-bits = (2·wsum + n) div (2·n), then ONE exact division by
    // 1e6. A `round(x, 9)` here is a trap: wsum/(1e6·n) lands exactly on
    // a 10th-decimal tie whenever n divides wsum·10⁹ half-way, and
    // Spark's BigDecimal HALF_UP vs DuckDB's float-multiply rounding
    // then disagree (observed at sf0.1: one doc in 5000)
    df.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        greatest(coalesce(col("n_trigrams"), lit(0L)), lit(1L)).as("nt"),
        coalesce(col("wsum"), lit(0L)).as("ws"))
      .select(col("id"), col("n_trigrams"),
        (expr(ratioScaled("ws", "nt", 1L)).cast("double") / lit(1e6))
          .as("bits_per_trigram"))
  }

  /** Fit-and-score-the-same-corpus convenience (the gate's shape). */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    lmScore(df, idCol, textCol, df)

  /** DuckDB twin of the self-fit [[lmScore]] over `input` (id, text) —
    * a full SELECT. */
  def lmScoreSql(input: String): String =
    s"""WITH lmsrc AS (SELECT id, text FROM ($input)),
      lmtri AS (SELECT id, unnest(list_transform(generate_series(1, length(text) - 2),
                  i -> substr(text, i, 3))) AS tri
                FROM lmsrc WHERE length(text) >= 3),
      lmc3 AS (SELECT tri, count(*) AS c3 FROM lmtri GROUP BY tri),
      lmc2 AS (SELECT substr(tri, 1, 2) AS big, CAST(sum(c3) AS BIGINT) AS c2
               FROM lmc3 GROUP BY 1),
      lmv AS (SELECT count(DISTINCT substr(tri, 3, 1)) AS v FROM lmc3),
      lmmod AS (SELECT tri,
                  CAST(floor(ln(CAST(c2 + v AS DOUBLE) / CAST(c3 + 1 AS DOUBLE)) / $Ln2 * 1000000.0) AS BIGINT) AS w
                FROM lmc3 JOIN lmc2 ON substr(tri, 1, 2) = big CROSS JOIN lmv),
      lmsc AS (SELECT id, CAST(count(*) AS BIGINT) AS n_trigrams, CAST(sum(w) AS BIGINT) AS wsum
               FROM lmtri JOIN lmmod USING (tri) GROUP BY id)
    SELECT id, n_trigrams,
      CAST(${ratioScaledSql("ws", "nt", 1L)} AS DOUBLE) / 1000000.0 AS bits_per_trigram
    FROM (SELECT s.id, coalesce(n_trigrams, 0) AS n_trigrams,
            greatest(coalesce(n_trigrams, 0), 1) AS nt, coalesce(wsum, 0) AS ws
          FROM lmsrc s LEFT JOIN lmsc ON s.id = lmsc.id)"""

  // -------------------------------------------------------------------
  // Gopher composite document filter (Rae et al., arXiv 2112.11446)
  // -------------------------------------------------------------------

  /** The Gopher rule list as (name, SQL-violation-predicate builder) —
    * shared between the Spark operator and the twin so thresholds
    * render identically. Predicates reference the joined metric
    * columns; evaluation order is list order and `reason` is the FIRST
    * failing rule. */
  private def gopherRules(minWords: Int, maxWords: Int,
      minAvgWordLen: Double, maxAvgWordLen: Double,
      maxPunctRatio: Double, minStopwordRatio: Double,
      maxTopWordFrac: Double, maxTopBigramFrac: Double,
      minTtr: Double): Seq[(String, String)] = Seq(
    "too_few_words" -> s"n_words < $minWords",
    "too_many_words" -> s"n_words > $maxWords",
    "bad_avg_word_len" -> s"(avg_word_len < $minAvgWordLen OR avg_word_len > $maxAvgWordLen)",
    "high_punct_ratio" -> s"punct_ratio > $maxPunctRatio",
    "low_stopword_ratio" -> s"stopword_ratio < $minStopwordRatio",
    "repetitive_top_word" -> s"top_word_frac > $maxTopWordFrac",
    "repetitive_top_bigram" -> s"top_bigram_frac > $maxTopBigramFrac",
    "low_ttr" -> s"ttr < $minTtr")

  /** Gopher-rule composite document filter (Rae et al., arXiv
    * 2112.11446 Table A1; thresholds as parameters): evaluates the
    * [[quality]] and [[repetition]] signal families and classifies
    * every document keep/drop with the FIRST failing rule as `reason`
    * (`''` when kept) — the relation a curation dashboard reads and the
    * predicate the funnel applies. All comparisons are on engine-exact
    * metrics (single divisions of integer counts) against shared
    * literal thresholds, so keep/reason replay bit-identically.
    *
    * Shape: the quality family is map-only; repetition is the one
    * shuffled branch; one id-equi-join marries them. `keep` is int
    * 0/1 (the gate's scalar-column contract).
    *
    * @return (id, n_words, keep, reason) for every input doc */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minAvgWordLen: Double = 3.0, maxAvgWordLen: Double = 10.0,
      maxPunctRatio: Double = 0.1, minStopwordRatio: Double = 0.01,
      maxTopWordFrac: Double = 0.2, maxTopBigramFrac: Double = 0.18,
      minTtr: Double = 0.2): DataFrame = {
    val rules = gopherRules(minWords, maxWords, minAvgWordLen, maxAvgWordLen,
      maxPunctRatio, minStopwordRatio, maxTopWordFrac, maxTopBigramFrac, minTtr)
    val reason = rules.foldRight(lit(""): Column) { case ((n, pred), acc) =>
      when(expr(pred), lit(n)).otherwise(acc)
    }
    // null text nulls every quality metric, which would NULL-skip rules
    // 1-5 and misattribute the drop to the first repetition rule —
    // coalesce to the zero-word readings so too_few_words fires first
    // (the twin coalesces identically)
    val q = quality(df, idCol, textCol).select(col("id"),
      coalesce(col("n_words"), lit(0)).as("n_words"),
      coalesce(col("avg_word_len"), lit(0.0)).as("avg_word_len"),
      coalesce(col("punct_ratio"), lit(0.0)).as("punct_ratio"),
      coalesce(col("stopword_ratio"), lit(0.0)).as("stopword_ratio"))
    q.join(repetition(df, idCol, textCol), Seq("id"))
      .select(col("id"), col("n_words"),
        when(reason === "", lit(1)).otherwise(lit(0)).as("keep"),
        reason.as("reason"))
  }

  /** DuckDB twin of [[gopherFilter]] (default thresholds) over `input`
    * (id, text) — a full SELECT. */
  def gopherFilterSql(input: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minAvgWordLen: Double = 3.0, maxAvgWordLen: Double = 10.0,
      maxPunctRatio: Double = 0.1, minStopwordRatio: Double = 0.01,
      maxTopWordFrac: Double = 0.2, maxTopBigramFrac: Double = 0.18,
      minTtr: Double = 0.2): String = {
    val rules = gopherRules(minWords, maxWords, minAvgWordLen, maxAvgWordLen,
      maxPunctRatio, minStopwordRatio, maxTopWordFrac, maxTopBigramFrac, minTtr)
    val reason = rules.map { case (n, pred) => s"WHEN $pred THEN '$n'" }
      .mkString("CASE ", " ", " ELSE '' END")
    val qCols = qualitySql("text").map { case (n, e) => s"$e AS $n" }.mkString(",\n        ")
    s"""WITH ${repetitionCtes(input)},
      gq AS (SELECT id, $qCols FROM ($input)),
      gj AS (SELECT gq.id, coalesce(n_words, 0) AS n_words,
               coalesce(avg_word_len, 0.0) AS avg_word_len,
               coalesce(punct_ratio, 0.0) AS punct_ratio,
               coalesce(stopword_ratio, 0.0) AS stopword_ratio,
               top_word_frac, top_bigram_frac, ttr
             FROM gq JOIN rep ON gq.id = rep.id)
    SELECT id, n_words,
      (CASE WHEN ($reason) = '' THEN 1 ELSE 0 END) AS keep,
      ($reason) AS reason
    FROM gj"""
  }
}
