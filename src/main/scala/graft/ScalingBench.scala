package graft

import org.apache.spark.sql.SparkSession

/** N-vs-4N scaling benchmark (BASELINE.json gate: throughput scaling
  * efficiency >= 0.8 from N to 4N). No real cluster exists in this sandbox,
  * so per the driver's stated methodology we run the identical job at
  * local[8] and local[32] on the same deterministic input.
  *
  * Steal-resistant methodology (VERDICT r2 #2 — single pairs on this
  * shared host are dominated by CPU steal, with the same local[8] job
  * measuring 204 s / 296 s / 1,017 s within three hours):
  *
  *   - >= `pairs` INTERLEAVED back-to-back (local[8], local[32]) pairs on
  *     the same cached input, so any steal episode hits both configs;
  *   - wall efficiency computed from the PER-CONFIG MINIMA (the minimum is
  *     the least-stolen sample — an unbiased upper bound on true wall that
  *     converges as any sample lands in a quiet window);
  *   - executor-CPU-time totals reported alongside wall: CPU time is
  *     steal-robust, so cpu32/cpu8 exposes work inflation and
  *     busy-cores = cpu/wall exposes actual parallel occupancy at each
  *     config (occupancy ratio / 4 is a wall-independent efficiency check).
  *
  * Usage: sbt "runMain graft.ScalingBench [nConvIds] [pairs]"
  * Emits one JSON line; the table for BENCH/BASELINE.md is derived from it.
  */
object ScalingBench {

  /** Sums executor CPU time over all completed tasks of a session. */
  private final class CpuListener extends org.apache.spark.scheduler.SparkListener {
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) cpuNs.addAndGet(m.executorCpuTime)
    }
  }

  final case class Sample(wallSec: Double, cpuSec: Double, turns: Long, pairs: Long)

  private def runAt(cores: Int, nConvIds: Long): Sample = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      // same RULE at both parallelism levels: 2x cores initial shuffle
      // partitions (standard task-granularity practice — >1 wave absorbs
      // stragglers); AQE coalesces small partitions back down, so this is
      // an upper bound, not a fixed fan-out
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new CpuListener
    spark.sparkContext.addSparkListener(cpu)
    try {
      val turns = graft.ingest.TranscriptGen.turnsDF(spark, nConvIds)
        .repartition(cores).cache()
      val nTurns = turns.count()
      val cpu0 = cpu.cpuNs.get() // exclude input generation from the job
      val t0 = System.nanoTime()
      val res = Pipeline.run(spark, turns)
      val nPairs = res.pairs.count()
      // force every stage including the second pass (stages are lazy
      // checkpoints — the measured job must be the full pipeline)
      res.refined.count()
      res.clusters.select("cluster_id").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      turns.unpersist()
      Sample(sec, (cpu.cpuNs.get() - cpu0) / 1e9, nTurns, nPairs)
    } finally {
      spark.stop()
      // allow a fresh master on the next call
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }

  private def fmtArr(xs: Seq[Double]): String =
    xs.map(x => f"$x%.2f").mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val nConvIds = args.headOption.map(_.toLong).getOrElse(100000L)
    val nPairs = args.drop(1).headOption.map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_SCALING_PAIRS").map(_.toInt))
      .getOrElse(5)
    // warm JVM/JIT at both configs so neither side pays first-run JIT
    runAt(8, 2000L)
    runAt(32, 2000L)

    val samples = (1 to nPairs).map { i =>
      val s8 = runAt(8, nConvIds)
      val s32 = runAt(32, nConvIds)
      System.err.println(
        f"[scaling] pair $i/$nPairs: local[8] ${s8.wallSec}%.1f s " +
          f"(cpu ${s8.cpuSec}%.1f) | local[32] ${s32.wallSec}%.1f s (cpu ${s32.cpuSec}%.1f)")
      (s8, s32)
    }
    val w8 = samples.map(_._1.wallSec)
    val w32 = samples.map(_._2.wallSec)
    val c8 = samples.map(_._1.cpuSec)
    val c32 = samples.map(_._2.cpuSec)
    val turns = samples.head._1.turns
    val pairsN = samples.head._1.pairs

    val min8 = w8.min
    val min32 = w32.min
    val effWallMin = (min8 / min32) / 4.0
    // least-stolen CPU totals; busy cores = cpu / the wall of that same run
    val i8 = w8.indexOf(min8); val i32 = w32.indexOf(min32)
    val busy8 = c8(i8) / min8
    val busy32 = c32(i32) / min32
    val effOccupancy = (busy32 / busy8) / 4.0
    val cpuInflation = c32.min / c8.min

    println(
      f"""{"bench":"scaling","n_conv_ids":$nConvIds,"turns":$turns,"candidate_pairs":$pairsN,"pairs_run":$nPairs,"local8_wall_secs":${fmtArr(w8)},"local32_wall_secs":${fmtArr(w32)},"local8_cpu_secs":${fmtArr(c8)},"local32_cpu_secs":${fmtArr(c32)},"local8_min_sec":$min8%.2f,"local32_min_sec":$min32%.2f,"local8_turns_per_sec":${turns / min8}%.1f,"local32_turns_per_sec":${turns / min32}%.1f,"speedup_min":${min8 / min32}%.3f,"scaling_efficiency_wall_min":$effWallMin%.3f,"busy_cores_local8":$busy8%.2f,"busy_cores_local32":$busy32%.2f,"occupancy_efficiency":$effOccupancy%.3f,"cpu_inflation_32_vs_8":$cpuInflation%.3f}""")
  }
}
