package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (suites run forked in
  * a single JVM; getOrCreate dedupes). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session

  /** Collect to a deterministic, comparable form: rows sorted by
    * toString, arrays as Seq. */
  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect()
      .toSeq
      .map(r => (0 until r.length).map(i => normalize(r.get(i))))
      .sortBy(_.mkString("|"))

  private def normalize(v: Any): Any = v match {
    case s: scala.collection.Seq[_] => s.toList.map(normalize)
    case other                      => other
  }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
