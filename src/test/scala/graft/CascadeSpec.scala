package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.resolve.ExactCascade

/** Port of the reference's deterministic-cascade semantics tests
  * (reference: tests/test_exact_matching.py:113-181): exact expected
  * (id, resolved, reason) tuples, stage precedence, row-count preservation.
  */
class CascadeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val canonical = Seq(
    ("k1", "HELLO WORLD HOW ARE YOU TODAY FRIEND", "B1"),
    ("k2", "COMPLETELY DIFFERENT CANONICAL TEXT HERE OKAY", "B1"),
    ("k3", "A THIRD CANONICAL RECORD WITH UNIQUE WORDING", "B2"),
    // duplicate canonical rows: dedupe-then-join must not explode matches
    ("k4", "HELLO WORLD HOW ARE YOU TODAY FRIEND", "B1")
  ).toDF("conv_id", "sig_text", "block_key")

  private val messy = Seq(
    ("m1", "HELLO WORLD HOW ARE YOU TODAY FRIEND", "B1"), // exact (to k1, min id)
    ("m2", "A THIRD CANONICAL RECORD WITH UNIQUE WORDING", "B2"), // exact k3
    ("m3", "COMPLETELY DIFFERENT CANONIKAL TEXT HERE OKAY", "B1"), // near-miss -> shingle k2
    ("m4", "ZEBRA XYLOPHONE QUANTUM FLUX JUMBLE VORTEX", "B1") // unmatched
  ).toDF("conv_id", "sig_text", "block_key")

  test("exact expected tuples, stage precedence, dedupe") {
    val got = ExactCascade.run(messy, canonical)
      .as[(String, String, String)].collect().toSet
    assert(got.contains(("m1", "k1", "exact_match")))
    assert(got.contains(("m2", "k3", "exact_match")))
    assert(got.contains(("m3", "k2", "unique_shingle")))
    assert(!got.exists(_._1 == "m4"))
    // m1 matched exactly once despite duplicate canonical rows
    assert(got.count(_._1 == "m1") === 1)
  }

  test("annotate preserves row count and marks unmatched null") {
    val ann = ExactCascade.annotate(messy, canonical)
    assert(ann.count() === messy.count())
    assert(ann.filter(col("conv_id") === "m4" && col("match_reason").isNull).count() === 1)
  }
}
