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
    "hangul" -> "\\x{AC00}-\\x{D7AF}")

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
