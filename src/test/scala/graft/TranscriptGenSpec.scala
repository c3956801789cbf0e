package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.TranscriptGen

class TranscriptGenSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("generator is deterministic and independent of parallelism") {
    val a = TranscriptGen.turns(spark, 80).repartition(2).collect().sortBy(t => (t.conv_id, t.turn_idx))
    val b = TranscriptGen.turns(spark, 80).repartition(8).collect().sortBy(t => (t.conv_id, t.turn_idx))
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }

  test("row invariant: dense 0-based turn_idx, monotone ts, non-null text") {
    val t = TranscriptGen.turnsDF(spark, 120)
    val bad = t.groupBy("conv_id")
      .agg(
        count("*").as("n"),
        max("turn_idx").as("mx"),
        min("turn_idx").as("mn"),
        countDistinct("turn_idx").as("d"),
        (max("ts").cast("long") - min("ts").cast("long")).as("span"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1).otherwise(0)).as("nulls"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 || col("d") =!= col("n") ||
        col("nulls") > 0 || col("span") < 0)
    assert(bad.count() === 0)
  }

  test("labels: every conv labeled, canonical is its own label, clusters 1-4") {
    val labels = TranscriptGen.labels(spark, 200).cache()
    val turns = TranscriptGen.turnsDF(spark, 200)
    val convs = turns.select("conv_id").distinct()
    assert(labels.count() === convs.count())
    // canonical variant labels itself
    assert(labels.filter($"conv_id" === $"correct_conv_id").count() > 0)
    val sizes = labels.groupBy("correct_conv_id").count().agg(max("count"), min("count"))
      .as[(Long, Long)].head()
    assert(sizes._1 <= 4 && sizes._2 >= 1)
    // some clusters of size > 1 and some singletons exist
    val dist = labels.groupBy("correct_conv_id").count()
      .groupBy("count").count().as[(Long, Long)].collect().toMap
    assert(dist.contains(1L) && dist.keys.exists(_ > 1L))
  }

  test("duplicates share vocabulary with canonical (paraphrase keeps most tokens)") {
    val t = TranscriptGen.turnsDF(spark, 40)
    val l = TranscriptGen.labels(spark, 40).toDF()
    val sig = t.groupBy("conv_id")
      .agg(array_distinct(flatten(collect_list(split(upper(col("text")), "\\s+")))).as("toks"))
    val joined = sig.join(l, "conv_id")
      .join(sig.select(col("conv_id").as("correct_conv_id"), col("toks").as("ctoks")), "correct_conv_id")
      .filter(col("conv_id") =!= col("correct_conv_id"))
      .select((size(array_intersect(col("toks"), col("ctoks"))).cast("double") /
        size(array_union(col("toks"), col("ctoks")))).as("jac"))
    val mean = joined.agg(avg("jac")).as[Double].head()
    assert(mean > 0.5, s"mean token jaccard between variant and canonical = $mean")
  }
}
