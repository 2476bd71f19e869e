package graft.operators

import org.apache.spark.sql.DataFrame

/** The `indexes_to_check` probe restriction (reference `url.py:32-43`,
  * `pdq_hash.py:76-110` accepts a Series of arbitrary size).
  *
  *  - [[Checked.All]]: no restriction (reference default `None`).
  *  - [[Checked.Literals]]: a small driver-side list — planned as an
  *    `isin` predicate, which Catalyst pushes into the scan.
  *  - [[Checked.Frame]]: a DataFrame with an `index` column — planned
  *    as a LEFT SEMI join, the scalable form for million-entry checked
  *    sets that would break an `isin` literal list (Catalyst broadcasts
  *    it automatically when it is small). No empty-input short-circuit:
  *    an empty frame flows through the joins to an empty, correctly
  *    typed result without a driver-side action.
  */
sealed trait Checked
object Checked {
  case object All extends Checked
  final case class Literals(indexes: Seq[String]) extends Checked
  final case class Frame(df: DataFrame) extends Checked

  def from(opt: Option[Seq[String]]): Checked = opt.fold[Checked](All)(Literals(_))
}
