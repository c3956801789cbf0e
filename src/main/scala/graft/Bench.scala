package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every oracle-checked query on the driver's
  * SF dir plus the end-to-end transcript ER pipeline on synthetic turns.
  * Prints ONE JSON line (driver contract).
  *
  * A query that throws is recorded with time -1 and listed under "failed"
  * (never silently reported as a normal-looking timing). The ER pipeline
  * runs SPARK_GRAFT_BENCH_REPS times (median reported, all runs listed) —
  * wall-clock on this host varies with CPU steal, so one sample is noise.
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

    // q19 is the intentionally-quadratic exact-parity baseline whose scale
    // path is q19b; it stays in the sf0.01 oracle gate but is skipped at
    // bench time by default (~45-163 s of every sf0.1 run for a declared
    // non-scale-path — VERDICT r2 #4). SPARK_GRAFT_BENCH_SKIP="" restores it.
    val skip = sys.env.getOrElse("SPARK_GRAFT_BENCH_SKIP", "q19_ngram_jaccard")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val results = SparkEntry.allDefs.filterNot(d => skip(d.name)).map { d =>
      val t0 = System.nanoTime()
      val ok =
        try { d.fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${d.name} FAILED: ${e.getMessage}"); false
        }
      (d.name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
    }
    val failed = results.filterNot(_._3).map(_._1)

    // end-to-end ER pipeline benchmark on deterministic synthetic turns:
    // ~30k conversation slots -> ~23k conversations, ~150k turns.
    val nConvIds = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "30000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val turns = graft.ingest.TranscriptGen.turnsDF(spark, nConvIds)
      .repartition(cpus.toInt).cache()
    val nTurns = turns.count()

    var nPairs = 0L
    var nClusters = 0L
    val runPairs = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val res = Pipeline.run(spark, turns)
      nPairs = res.pairs.count()
      nClusters = res.clusters.select("cluster_id").distinct().count()
      res.refined.count() // second pass is part of the pipeline's work
      val sec = (System.nanoTime() - t0) / 1e9
      // isolated scoring throughput (BASELINE gate: candidate-pairs-scored/
      // sec): pairs + signatures are materialised above, so this times the
      // feature-attach joins + scoring projection alone
      val tScore0 = System.nanoTime()
      Pipeline.scorePairs(res.signatures, res.signatures, res.pairs, 1e-6)
        .agg(org.apache.spark.sql.functions.sum("match_weight")).collect()
      val scoreSec = (System.nanoTime() - tScore0) / 1e9
      res.signatures.unpersist()
      (sec, scoreSec)
    }
    // median BOTH series (upper for even n) — one steal episode must not
    // drive either headline number (VERDICT r2 #5)
    val pipeSecs = runPairs.map(_._1).sorted
    val scoreSecs = runPairs.map(_._2).sorted
    val pipeSec = pipeSecs(pipeSecs.length / 2)
    val pairsPerSec = nPairs / scoreSecs(scoreSecs.length / 2)
    turns.unpersist()

    val all = results.map(r => r._1 -> r._2) :+ ("er_pipeline" -> pipeSec)
    val qs = all.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val runsJson = pipeSecs.map(s => f"$s%.3f").mkString("[", ",", "]")
    val scoreRunsJson = scoreSecs.map(s => f"$s%.3f").mkString("[", ",", "]")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val skippedJson = skip.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = all.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"skipped":$skippedJson,"sf":"$sfDir","er_turns":$nTurns,"er_candidate_pairs":$nPairs,"er_clusters":$nClusters,"er_pairs_scored_per_sec":$pairsPerSec%.1f,"er_pipeline_runs":$runsJson,"er_score_runs":$scoreRunsJson,"cpus":$cpus}""")
    spark.stop()
  }
}
