package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions.cosine
import graft.queries.DedupQueries.annBandKeys

/** Multi-band hyperplane ANN (q20c's kernel) on planted near-duplicates:
  * a perturbation that flips no sign bit leaves every band key unchanged,
  * so the near-dup pair is GUARANTEED a shared bucket — recall on the
  * planted set must be 100% for any band config. Unrelated random vectors
  * collide on an 8-bit band with p ~ 2^-8 per band, so candidate volume
  * must stay far below n^2.
  */
class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // deterministic pseudo-random base vectors (splitmix64-style mixing — a
  // linear-congruential form leaves vectors affine in the seed, i.e.
  // near-parallel) + sign-preserving perturbed copies
  private def vec(seed: Int, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      var x = seed.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
      x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
      x ^= (x >>> 27); x *= 0x94D049BB133111EBL
      x ^= (x >>> 31)
      ((x >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 2.0
    }
  private def perturb(v: Seq[Double]): Seq[Double] =
    v.map(x => x + math.signum(x) * 0.01) // moves AWAY from zero: no sign flips

  private val dim = 64
  private val nBase = 200
  private lazy val data = {
    val base = (0 until nBase).map(i => (i.toLong, vec(i + 1, dim)))
    val dups = (0 until nBase by 10).map(i => (1000L + i, perturb(vec(i + 1, dim))))
    (base ++ dups).toDF("vec_id", "v")
  }

  private def candidates(bands: Int, bits: Int) = {
    val keyed = data.select(col("vec_id"), explode(annBandKeys(col("v"), bands, bits)).as("bk"))
    keyed.as("l").join(keyed.as("r"),
        col("l.bk") === col("r.bk") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b")).distinct()
  }

  test("planted near-dups share a bucket in every band config; volume stays sub-quadratic") {
    for ((bands, bits) <- Seq((3, 8), (2, 12))) {
      val cand = candidates(bands, bits).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val planted = (0 until nBase by 10).map(i => (i.toLong, 1000L + i)).toSet
      assert(planted.subsetOf(cand),
        s"config ($bands x $bits): missing planted pairs ${planted -- cand}")
      val n = nBase + planted.size
      assert(cand.size < n.toLong * (n - 1) / 2 / 10,
        s"config ($bands x $bits): candidate volume ${cand.size} is near-quadratic")
    }
  }

  test("planted near-dup cosine is ~1 and ANN scoring ranks it first") {
    val pairs = candidates(3, 8)
      .join(data.select(col("vec_id").as("a"), col("v").as("va")), Seq("a"))
      .join(data.select(col("vec_id").as("b"), col("v").as("vb")), Seq("b"))
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a")).orderBy(col("cos").desc, col("b").asc)
    val top = pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("a") % 10 === 0 && col("a") < lit(nBase.toLong))
      .select("a", "b", "cos").as[(Long, Long, Double)].collect()
    top.foreach { case (a, b, cos) =>
      assert(b === 1000L + a, s"query $a: nearest candidate $b (cos=$cos)")
      assert(cos > 0.99)
    }
  }
}
