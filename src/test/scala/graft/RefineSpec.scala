package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.refine.DistinguishingTokens

/** Port of the reference's second-pass semantics tests (reference:
  * tests/test_bigrams.py:156-247): hand-built candidate groups with
  * hand-computed expected overlap / punishment / missing maps and the
  * resulting mw adjustment.
  */
class RefineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // one messy record r1 with two candidates a, b
  // r text: "ALPHA BETA GAMMA"
  // a text: "ALPHA BETA GAMMA"      (perfect)
  // b text: "ALPHA DELTA GAMMA"     (DELTA not in r; BETA missing)
  private val pairs = Seq(
    ("a", "r1", 5.0, "ALPHA BETA GAMMA", "ALPHA BETA GAMMA"),
    ("b", "r1", 4.0, "ALPHA DELTA GAMMA", "ALPHA BETA GAMMA")
  ).toDF("conv_id_l", "conv_id_r", "match_weight", "sig_text_l", "sig_text_r")

  test("token + bigram rewards and punishments match hand computation") {
    val out = DistinguishingTokens.improve(pairs,
      DistinguishingTokens.Params(matchWeightThreshold = -20, topNMatches = 5))
      .select("conv_id_l", "mw_adjustment")
      .as[(String, Double)].collect().toMap

    // block pool (l tokens): ALPHA BETA GAMMA ALPHA DELTA GAMMA
    //   hist: ALPHA->2, BETA->1, GAMMA->2, DELTA->1
    // --- candidate a ---
    // overlap(this l and r) = {ALPHA:2, BETA:1, GAMMA:2}
    //   reward = 3 * (1/4 + 1 + 1/4) = 4.5
    // tokens elsewhere-not-this = {} (r's tokens all in a) -> punish 0
    // missing = {} -> 0
    // block bigrams (zip of flattened pool): "ALPHA BETA","BETA GAMMA",
    //   "GAMMA ALPHA","ALPHA DELTA","DELTA GAMMA"
    //   -> hist all 1
    // bigrams_r = "ALPHA BETA","BETA GAMMA"; overlap w/ block = both cnt 1
    // a's bigrams contain both -> overlapping_bigrams_this = both cnt 1
    //   unigram-cover filter: e.g. "ALPHA BETA": ALPHA cnt2<=1? no -> kept
    //   BETA cnt1<=1 yes, but needs BOTH covered -> kept. Both kept.
    //   bigram reward = 3 * (1 + 1) = 6
    // bigrams elsewhere-not-this = {} -> 0
    // total a = 4.5 + 6 = 10.5
    assert(math.abs(out("a") - 10.5) < 1e-9)

    // --- candidate b ---  (tokens ALPHA DELTA GAMMA)
    // overlap(this l and r) = {ALPHA:2, GAMMA:2} -> reward = 3*(1/4+1/4)=1.5
    // tokens elsewhere-not-this: r tokens not in b = {BETA} in block hist
    //   (cnt 1) -> punish = 1.5 * 1 = 1.5
    // missing = tokens of b not in r = {DELTA} -> penalty 0.1
    // b bigrams: "ALPHA DELTA","DELTA GAMMA"; overlapping with r's -> none
    // bigrams elsewhere-not-this: r bigrams not in b present in block:
    //   "ALPHA BETA" (1), "BETA GAMMA" (1)
    //   unigram-cover filter vs tokens_elsewhere {BETA:1}:
    //   "ALPHA BETA": ALPHA not in map -> covered1 false -> kept
    //   "BETA GAMMA": GAMMA not in map -> kept
    //   punish = 1.5 * 2 = 3
    // total b = 1.5 - 1.5 - 0.1 - 3 = -3.1
    assert(math.abs(out("b") - (-3.1)) < 1e-9)
  }

  test("threshold filters and topN caps the group") {
    val many = (1 to 8).map(i =>
      (f"c$i", "r1", 10.0 - i, s"TEXT NUMBER $i", "TEXT NUMBER 1")).toSeq
      .toDF("conv_id_l", "conv_id_r", "match_weight", "sig_text_l", "sig_text_r")
    val out = DistinguishingTokens.improve(many,
      DistinguishingTokens.Params(matchWeightThreshold = 0.5, topNMatches = 3))
    // threshold 0.5 keeps mw in {9..2} minus those <= 0.5 -> c1..c8 have
    // mw 9,8,...,2 all > 0.5; topN=3 keeps the 3 best
    assert(out.count() === 3)
    assert(out.select("conv_id_l").as[String].collect().toSet === Set("c1", "c2", "c3"))
  }
}
