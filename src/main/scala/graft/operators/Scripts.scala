package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode script detection — the routing signal ABOVE language ID:
  * `lang_id`'s n-gram tables assume the text is already in a script
  * they know, and a Cyrillic page scored against Latin stopword
  * n-grams is garbage-in. At crawl scale the script histogram is the
  * first fork in the multilingual pipeline (which tokenizer, which
  * stoplist, which quality battery), and it's computable as pure
  * counting — no model, no ambiguity, bit-identical across engines.
  *
  * Counts per Unicode BLOCK class (BMP ranges spelled as `\\x{…}`
  * classes — the syntax Java and RE2 share; all ranges are BMP so
  * UTF-16 code units and code points agree), dominant script by exact
  * integer argmax with fixed-order tie-break, `mixed` when the top
  * script is not a strict majority of letter-class chars, `none` when
  * no letter-class chars at all. Map-only, codegen'd. */
object Scripts {

  /** (name, character-class body) in tie-break priority order. */
  val Classes: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z\\x{00C0}-\\x{024F}",
    "cyrillic" -> "\\x{0400}-\\x{04FF}",
    "greek" -> "\\x{0370}-\\x{03FF}",
    "arabic" -> "\\x{0600}-\\x{06FF}",
    "hebrew" -> "\\x{0590}-\\x{05FF}",
    "devanagari" -> "\\x{0900}-\\x{097F}",
    "han" -> "\\x{4E00}-\\x{9FFF}",
    "kana" -> "\\x{3040}-\\x{30FF}",
    "hangul" -> "\\x{AC00}-\\x{D7AF}",
    "thai" -> "\\x{0E00}-\\x{0E7F}",
    "bengali" -> "\\x{0980}-\\x{09FF}",
    "tamil" -> "\\x{0B80}-\\x{0BFF}",
    "telugu" -> "\\x{0C00}-\\x{0C7F}",
    "lao" -> "\\x{0E80}-\\x{0EFF}",
    "myanmar" -> "\\x{1000}-\\x{109F}",
    "khmer" -> "\\x{1780}-\\x{17FF}",
    "georgian" -> "\\x{10A0}-\\x{10FF}",
    "ethiopic" -> "\\x{1200}-\\x{137F}")

  private def countExpr(t: Column, cls: String): Column =
    size(regexp_extract_all(t, lit(s"[$cls]"), lit(0)))

  /** (id, n_<script>…, n_letters, script) — `script` ∈ class names ∪
    * {mixed, none}. */
  def detect(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counted = Classes.foldLeft(df.select(col(idCol).as("id"), col(textCol).as("t"))) {
      case (d, (name, cls)) => d.withColumn(s"n_$name", countExpr(col("t"), cls))
    }
    val total = Classes.map(c => col(s"n_${c._1}")).reduce(_ + _)
    // first class holding the max — fixed-order tie-break
    val maxCount = Classes.map(c => col(s"n_${c._1}")).reduce((a, b) => greatest(a, b))
    val winner = Classes.reverse.foldLeft(lit("none")) { case (acc, (name, _)) =>
      when(col(s"n_$name") === col("_max"), name).otherwise(acc)
    }
    counted
      .withColumn("n_letters", total)
      .withColumn("_max", maxCount)
      .withColumn("script",
        when(col("n_letters") === 0, "none")
          .when(col("_max") * 2 > col("n_letters"), winner)
          .otherwise("mixed"))
      .drop("t", "_max")
  }

  /** DuckDB twin over `(id, text)` rows from `src`: emits a `scripts`
    * CTE with the same columns. */
  /** Per-script marker tables for [[langIdRouted]] — the r10 follow-up
    * to [[detect]]: script routing happens FIRST, then a family-local
    * marker table separates languages that share the script. Markers
    * are high-frequency function words chosen to be distinctive WITHIN
    * the family (e.g. ru "что"/uk "що"/bg "че"). CJK needs no marker
    * table: hangul→ko, kana→ja, han→ja-if-kana-present-else-zh. */
  val LangMarkersByScript: Seq[(String, Seq[(String, Seq[String])])] = Seq(
    "latin" -> Seq(
      "de" -> Seq("der", "die", "und", "ist", "nicht"),
      "en" -> Seq("the", "a", "is", "and", "of"),
      "es" -> Seq("el", "la", "es", "y", "de"),
      "fr" -> Seq("le", "la", "et", "est", "de"),
      "it" -> Seq("che", "di", "il", "per", "sono"),
      "nl" -> Seq("het", "een", "van", "niet", "zijn"),
      "pt" -> Seq("que", "não", "uma", "para", "com"),
      "vi" -> Seq("của", "và", "là", "không", "người"),
      "pl" -> Seq("się", "nie", "jest", "oraz", "czy"),
      "tr" -> Seq("bir", "ve", "için", "değil", "olarak"),
      "id" -> Seq("yang", "dan", "untuk", "tidak", "dengan")),
    "cyrillic" -> Seq(
      "bg" -> Seq("че", "това", "да", "се", "той"),
      "ru" -> Seq("и", "не", "это", "что", "он"),
      "uk" -> Seq("і", "не", "це", "що", "він")),
    "arabic" -> Seq(
      "ar" -> Seq("في", "من", "على", "أن", "إلى"),
      "fa" -> Seq("در", "از", "به", "که", "را"),
      "ur" -> Seq("میں", "سے", "کے", "کی", "ہے")),
    "greek" -> Seq("el" -> Seq("και", "το", "να", "της", "είναι")),
    "hebrew" -> Seq("he" -> Seq("של", "את", "על", "הוא", "זה")),
    "devanagari" -> Seq("hi" -> Seq("है", "और", "के", "में", "की")),
    "thai" -> Seq("th" -> Seq("และ", "ที่", "ไม่", "ใน", "ของ")),
    "bengali" -> Seq("bn" -> Seq("এবং", "এই", "না", "আমি", "তার")),
    "tamil" -> Seq("ta" -> Seq("மற்றும்", "அது", "இல்லை", "என்", "வீடு")),
    "telugu" -> Seq("te" -> Seq("మరియు", "అది", "కాదు", "నా", "ఇల్లు")),
    "lao" -> Seq("lo" -> Seq("ແລະ", "ທີ່", "ບໍ່", "ໃນ", "ຂອງ")),
    "myanmar" -> Seq("my" -> Seq("နှင့်", "သည်", "များ", "ကို", "တွင်")),
    "khmer" -> Seq("km" -> Seq("និង", "នៅ", "ជា", "បាន", "របស់")),
    "georgian" -> Seq("ka" -> Seq("და", "არის", "რომ", "არ", "ეს")),
    "ethiopic" -> Seq("am" -> Seq("እና", "ነው", "ላይ", "ይህ", "ነበር")))

  /** (id, script, pred_lang): [[detect]]'s routing plus per-family
    * marker argmax (ties to the family's first language). Unroutable
    * scripts (mixed/none or no family table) predict "und". Pure
    * Column algebra — map-only, codegen'd, replayed exactly by
    * [[langIdRoutedSql]]. */
  def langIdRouted(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counted = Classes.foldLeft(df.select(col(idCol).as("id"), col(textCol).as("t"))) {
      case (d, (name, cls)) => d.withColumn(s"n_$name", countExpr(col("t"), cls))
    }
    val total = Classes.map(c => col(s"n_${c._1}")).reduce(_ + _)
    val maxCount = Classes.map(c => col(s"n_${c._1}")).reduce((a, b) => greatest(a, b))
    val winner = Classes.reverse.foldLeft(lit("none")) { case (acc, (name, _)) =>
      when(col(s"n_$name") === col("_max"), name).otherwise(acc)
    }
    val routed = counted
      .withColumn("n_letters", total)
      .withColumn("_max", maxCount)
      .withColumn("script",
        when(col("n_letters") === 0, "none")
          .when(col("_max") * 2 > col("n_letters"), winner)
          .otherwise("mixed"))
    val ws = graft.functions.TextFunctions.words(col("t"))
    // Every family score is BOUND ONCE as a named projection before the
    // argmax. The previous running-max fold inlined each score
    // expression into both branches of its `when` (bs' = when(s0 > bs,
    // s0).otherwise(bs) doubles the tree per language), so the
    // 30-language table compiled an exponentially-sized plan — the
    // r11 lang-ID breadth growth took this gate from ~1 s to ~14 s at
    // sf0.1. Scores referenced more than once stay un-collapsed by
    // CollapseProject, so each is computed exactly once per row.
    val scoreCols: Seq[(String, Column)] = for {
      (script, fam) <- LangMarkersByScript
      (l, ms) <- fam
    } yield (s"__lir_${script}_$l",
      size(filter(ws, w => w.isin(ms: _*))).cast("double") /
        greatest(size(ws), lit(1)).cast("double"))
    val scored = scoreCols.foldLeft(routed) { case (d, (n, c)) => d.withColumn(n, c) }
    // argmax with first-wins ties, LINEARLY: the running-max fold keeps
    // the earlier language on equal scores, which is exactly "first
    // language whose score equals the family max" — greatest() + a
    // first-match CASE chain over plain column references (values
    // identical, tree linear in family size).
    def famPred(script: String, fam: Seq[(String, Seq[String])]): Column = {
      val refs = fam.map { case (l, _) => (l, col(s"__lir_${script}_$l")) }
      val best = refs.map(_._2) match {
        case Seq(one) => one
        case many     => greatest(many: _*)
      }
      // first-wins: families are walked in order, the FIRST score equal
      // to the max claims the row; the final otherwise is unreachable
      // (best equals at least one score — no NaN: denominators are
      // guarded ≥ 1) and lands on the head language like the old fold
      refs.foldRight(lit(refs.head._1): Column) { case ((l, r), rest) =>
        when(r === best, lit(l)).otherwise(rest)
      }
    }
    val pred = LangMarkersByScript.foldLeft(
      when(col("script") === "hangul", lit("ko"))
        .when(col("script") === "kana", lit("ja"))
        .when(col("script") === "han",
          when(col("n_kana") > 0, lit("ja")).otherwise(lit("zh")))
    ) { case (acc, (script, fam)) =>
      acc.when(col("script") === script, famPred(script, fam))
    }.otherwise(lit("und"))
    scored.select(col("id"), col("script"), pred.as("pred_lang"))
  }

  /** DuckDB twin of [[langIdRouted]] over `(id, text)` rows from
    * `src`: a full SELECT (id, script, pred_lang). */
  def langIdRoutedSql(src: String): String = {
    val counts = Classes.map { case (name, cls) =>
      s"len(regexp_extract_all(text, '[$cls]')) AS n_$name"
    }.mkString(",\n          ")
    val total = Classes.map(c => s"n_${c._1}").mkString(" + ")
    val maxE = "greatest(" + Classes.map(c => s"n_${c._1}").mkString(", ") + ")"
    val winner = Classes.foldRight("'none'") { case ((name, _), acc) =>
      s"CASE WHEN n_$name = m THEN '$name' ELSE $acc END"
    }
    val ws = graft.functions.TextFunctions.wordsSql("text")
    def famPredSql(fam: Seq[(String, Seq[String])]): String = {
      def score(ms: Seq[String]): String = {
        val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
        s"(CAST(len(list_filter($ws, w -> list_contains($lst, w))) AS DOUBLE) / greatest(len($ws), 1))"
      }
      fam.tail.foldLeft((s"'${fam.head._1}'", score(fam.head._2))) {
        case ((bl, bs), (l, ms)) =>
          val s0 = score(ms)
          (s"(CASE WHEN $s0 > $bs THEN '$l' ELSE $bl END)",
            s"(CASE WHEN $s0 > $bs THEN $s0 ELSE $bs END)")
      }._1
    }
    val pred = LangMarkersByScript.foldRight("'und'") { case ((script, fam), acc) =>
      s"CASE WHEN script = '$script' THEN ${famPredSql(fam)} ELSE $acc END"
    }
    s"""
      SELECT id, script,
        CASE WHEN script = 'hangul' THEN 'ko'
             WHEN script = 'kana' THEN 'ja'
             WHEN script = 'han' THEN (CASE WHEN n_kana > 0 THEN 'ja' ELSE 'zh' END)
             ELSE ($pred) END AS pred_lang
      FROM (
        SELECT id, text, n_kana,
          CASE WHEN n_letters = 0 THEN 'none'
               WHEN m * 2 > n_letters THEN ($winner)
               ELSE 'mixed' END AS script
        FROM (
          SELECT *, $total AS n_letters, $maxE AS m FROM (
            SELECT id, text,
              $counts
            FROM $src)))
    """.trim
  }

  def detectSql(src: String): String = {
    val counts = Classes.map { case (name, cls) =>
      s"len(regexp_extract_all(text, '[$cls]')) AS n_$name"
    }.mkString(",\n          ")
    val total = Classes.map(c => s"n_${c._1}").mkString(" + ")
    val maxE = "greatest(" + Classes.map(c => s"n_${c._1}").mkString(", ") + ")"
    val winner = Classes.foldRight("'none'") { case ((name, _), acc) =>
      s"CASE WHEN n_$name = m THEN '$name' ELSE $acc END"
    }
    s"""
      counts AS (
        SELECT id,
          $counts
        FROM $src),
      scripts AS (
        SELECT *, $total AS n_letters, $maxE AS m FROM counts)
      SELECT id, ${Classes.map(c => s"n_${c._1}").mkString(", ")}, n_letters,
        CASE WHEN n_letters = 0 THEN 'none'
             WHEN m * 2 > n_letters THEN ($winner)
             ELSE 'mixed' END AS script
      FROM scripts
    """.trim
  }
}
