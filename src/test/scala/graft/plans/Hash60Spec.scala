package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The native [[Hash60]] kernel is the engine's portableHash60 — it
  * must be bit-identical to the built-in formulation
  * `conv(substring(md5(s), 1, 15), 16, 10).cast(long)` it replaced
  * (the DuckDB twin `CAST('0x' || substr(md5(e),1,15) AS BIGINT)` is
  * pinned against that formulation by the oracle sweep). */
class Hash60Spec extends SparkTestBase {
  import spark.implicits._

  test("bit-identical to conv(substring(md5)) on ASCII, unicode, empty, long strings") {
    val rng = new scala.util.Random(61)
    val pool = "abc déà 漢字🙂xyz0123-_:|"
    val data = Seq("", "a", "emb:abc", "w8:the", "v1:42", " ", "  double  space  ") ++
      Seq.fill(500)(Seq.fill(rng.nextInt(40))(pool(rng.nextInt(pool.length))).mkString)
    val got = data.toDF("s").select(col("s"),
      Hash60(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("builtin")).collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), r.getString(0)))
  }

  test("null → null; non-negative 60-bit range; non-string rejected") {
    assert(Seq(Option.empty[String]).toDF("s")
      .select(Hash60(col("s"))).collect().head.isNullAt(0))
    val hs = Seq("a", "b", "c").toDF("s").select(Hash60(col("s"))).collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0L && h < (1L << 60)))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("i").select(Hash60(col("i"))).collect()
    }
  }
}
