package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every oracle-checked query on the driver's
  * SF dir plus the end-to-end transcript ER pipeline on synthetic turns.
  * Prints ONE JSON line (driver contract).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = SparkEntry.allDefs.map { d =>
      val t0 = System.nanoTime()
      try { d.fn(spark, sfDir).count() } catch { case _: Throwable => () }
      d.name -> (System.nanoTime() - t0) / 1e9
    }

    // end-to-end ER pipeline benchmark on deterministic synthetic turns:
    // ~30k conversation slots -> ~23k conversations, ~150k turns.
    val nConvIds = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "30000").toLong
    val tPipe0 = System.nanoTime()
    val turns = graft.ingest.TranscriptGen.turnsDF(spark, nConvIds)
      .repartition(cpus.toInt).cache()
    val nTurns = turns.count()
    val res = Pipeline.run(spark, turns)
    val nPairs = res.pairs.count()
    val nClusters = res.clusters.select("cluster_id").distinct().count()
    val pipeSec = (System.nanoTime() - tPipe0) / 1e9
    // isolated scoring throughput (BASELINE gate: candidate-pairs-scored/sec):
    // res.pairs is already materialised, so this times scoring alone
    val tScore0 = System.nanoTime()
    graft.score.Scoring.scoreDefault(res.pairs, 1e-6)
      .agg(org.apache.spark.sql.functions.sum("match_weight")).collect()
    val scoreSec = (System.nanoTime() - tScore0) / 1e9
    val pairsPerSec = nPairs / scoreSec
    turns.unpersist()

    val all = results :+ ("er_pipeline" -> pipeSec)
    val qs = all.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val total = all.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","er_turns":$nTurns,"er_candidate_pairs":$nPairs,"er_clusters":$nClusters,"er_pairs_scored_per_sec":$pairsPerSec%.1f,"cpus":$cpus}""")
    spark.stop()
  }
}
