package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed UDAF (SURVEY §2.4 / §2.11): merge per-row token histograms
  * (map<string,int>) by summing counts — the distributed aggregation form
  * of the reference's histogram/trie-style token statistics
  * (cleaning/steps/term_frequencies.py builds these via DuckDB
  * list_aggregate + SQL re-aggregation). An Aggregator gets map-side
  * partial aggregation for free: partial histograms merge associatively on
  * the map side before the shuffle, so the shuffled volume is one
  * vocabulary-bounded map per (group, partition) instead of one entry per
  * token occurrence — the property that matters at 100 TB.
  */
object HistMerge extends Aggregator[Map[String, Int], Map[String, Int], Map[String, Int]] {

  override def zero: Map[String, Int] = Map.empty

  override def reduce(b: Map[String, Int], a: Map[String, Int]): Map[String, Int] =
    merge(b, if (a == null) Map.empty else a)

  override def merge(b1: Map[String, Int], b2: Map[String, Int]): Map[String, Int] = {
    // fold the smaller into the larger: O(min) map updates per merge
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    small.foldLeft(large) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0) + v)
    }
  }

  override def finish(r: Map[String, Int]): Map[String, Int] = r

  override def bufferEncoder: Encoder[Map[String, Int]] =
    ExpressionEncoder[Map[String, Int]]()
  override def outputEncoder: Encoder[Map[String, Int]] =
    ExpressionEncoder[Map[String, Int]]()

  /** Column form: histMerge(mapCol) usable in DataFrame .agg(...). */
  val asUdaf = udaf(this)
  def apply(c: Column): Column = asUdaf(c)
}
