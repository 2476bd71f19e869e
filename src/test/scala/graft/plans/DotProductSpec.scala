package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  test("bit-identical to the HOF fold on random float vectors (the swap-in guarantee)") {
    val rng = new scala.util.Random(11)
    def vec = Seq.fill(64)(rng.nextFloat() * 2 - 1)
    val df = Seq.fill(100)((vec, vec)).toDF("a", "b")
    val rows = df.select(
      DotProduct(col("a"), col("b")).as("native"),
      graft.operators.SimilaritySearch.dotFold(col("a"), col("b")).as("fold")
    ).collect()
    // == not ≈ : the expression must replay the identical IEEE fold
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }

  test("mixed element types widen like cast(double): float×long, int×double") {
    val df = Seq((Seq(1.5f, -2.0f), Seq(3L, 4L), Seq(2, 10), Seq(0.5, 0.25))).toDF("f", "l", "i", "d")
    val r = df.select(
      DotProduct(col("f"), col("l")).as("fl"),
      DotProduct(col("i"), col("d")).as("id")).collect().head
    assert(r.getDouble(0) == (1.5 * 3 + -2.0 * 4))
    assert(r.getDouble(1) == (2 * 0.5 + 10 * 0.25))
  }

  test("null semantics match zip_with padding: mismatch, null element, null array") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),              // length mismatch
      (Some(Seq(1.0, 2.0)), None),                        // null array
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0)))          // clean
    ).toDF("a", "b")
    val native = df.select(DotProduct(col("a"), col("b"))).collect().map(r => r.isNullAt(0))
    val fold = df.select(graft.operators.SimilaritySearch.dotFold(col("a"), col("b")))
      .collect().map(r => r.isNullAt(0))
    assert(native.toSeq == fold.toSeq && native.toSeq == Seq(true, true, false))
    // null ELEMENT poisons both formulations identically
    val withNullElem = spark.sql("SELECT array(1.0d, NULL, 3.0d) AS a, array(1.0d, 2.0d, 3.0d) AS b")
    assert(withNullElem.select(DotProduct(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("SQL registration and type rejection") {
    val (ident, info, builder) = GraftExtensions.dotProductDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    val r = spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect().head
    assert(r.getDouble(0) == 11.0)
    val e = intercept[Exception](spark.sql("SELECT dot_product('x', 'y')").collect())
    assert(e.getMessage.toLowerCase.contains("array") || e.getMessage.contains("DATATYPE"))
  }
}
