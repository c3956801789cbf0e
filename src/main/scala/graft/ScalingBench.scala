package graft

import org.apache.spark.sql.SparkSession

/** N-vs-4N scaling benchmark (BASELINE.json gate: throughput scaling
  * efficiency >= 0.8 from N to 4N). No real cluster exists in this sandbox,
  * so per the driver's stated methodology we run the identical job at
  * local[8] and local[32] on the same deterministic input and report
  * throughput at both; efficiency = (T8 / T32) / 4.
  *
  * Usage: sbt "runMain graft.ScalingBench [nConvIds]"
  * Emits one JSON line; also suitable for pasting into BENCH/BASELINE.md.
  */
object ScalingBench {

  private def runAt(cores: Int, nConvIds: Long): (Double, Long, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val turns = graft.ingest.TranscriptGen.turnsDF(spark, nConvIds)
        .repartition(cores).cache()
      val nTurns = turns.count()
      val t0 = System.nanoTime()
      val res = Pipeline.run(spark, turns)
      val nPairs = res.pairs.count()
      // force every stage including the second pass (stages are lazy
      // checkpoints — the measured job must be the full pipeline)
      res.refined.count()
      res.clusters.select("cluster_id").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      turns.unpersist()
      (sec, nTurns, nPairs)
    } finally {
      spark.stop()
      // allow a fresh master on the next call
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val nConvIds = args.headOption.map(_.toLong).getOrElse(30000L)
    // warm JVM/JIT with a small run so the N-core run isn't penalised
    runAt(8, 2000L)
    val (t8, turns, pairs) = runAt(8, nConvIds)
    val (t32, _, _) = runAt(32, nConvIds)
    val efficiency = (t8 / t32) / 4.0
    println(
      f"""{"bench":"scaling","n_conv_ids":$nConvIds,"turns":$turns,"candidate_pairs":$pairs,"local8_sec":$t8%.2f,"local32_sec":$t32%.2f,"local8_turns_per_sec":${turns / t8}%.1f,"local32_turns_per_sec":${turns / t32}%.1f,"speedup":${t8 / t32}%.3f,"scaling_efficiency":$efficiency%.3f}""")
  }
}
