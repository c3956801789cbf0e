package graft.runtime

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-checkpoint manager: each named stage is committed as a parquet
  * table + manifest entry; a re-run resumes from the last committed stage
  * (BASELINE.json north_rule "resumable from checkpoint with per-partition
  * lineage + metrics"; reference analogue: temp-table checkpoint
  * materialisation, sql_pipeline/runner.py:471-491).
  *
  * Layout: <dir>/<stage>/ parquet + Spark's _SUCCESS marker;
  *         <dir>/manifest.jsonl one line per committed stage with rows,
  *         partition count and wall-clock ms (the per-stage metrics).
  */
final class Checkpoints(spark: SparkSession, dir: String) {

  private val manifestPath = Paths.get(s"$dir/manifest.jsonl")
  Files.createDirectories(Paths.get(dir))

  def isCommitted(stage: String): Boolean =
    Files.exists(Paths.get(s"$dir/$stage/_SUCCESS"))

  /** Run (or resume) a stage: if previously committed, read it back instead
    * of recomputing — truncating lineage exactly like the reference's
    * checkpointed CTE segments.
    */
  def stage(name: String)(compute: => DataFrame): DataFrame = {
    val path = s"$dir/$name"
    if (isCommitted(name)) {
      spark.read.parquet(path)
    } else {
      val t0 = System.nanoTime()
      val df = compute
      df.write.mode("overwrite").parquet(path)
      val committed = spark.read.parquet(path)
      val rows = committed.count()
      val parts = committed.rdd.getNumPartitions
      val ms = (System.nanoTime() - t0) / 1000000
      appendManifest(
        s"""{"stage":"$name","rows":$rows,"partitions":$parts,"wall_ms":$ms,"path":"$path"}""")
      committed
    }
  }

  private def appendManifest(line: String): Unit = synchronized {
    Files.write(manifestPath, (line + "\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Stages committed so far, in manifest order. */
  def committedStages(): Seq[String] =
    if (!Files.exists(manifestPath)) Nil
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(manifestPath).asScala.toSeq
        .flatMap(l => "\"stage\":\"([^\"]+)\"".r.findFirstMatchIn(l).map(_.group(1)))
    }
}

/** Per-partition lineage + per-stage metrics via SparkListener (north_rule:
  * "emit per-partition lineage and stage metrics"). Collects task-level
  * records-read/written and bytes per stage; dump with `report()`.
  */
final class StageMetricsListener extends org.apache.spark.scheduler.SparkListener {
  import scala.collection.mutable

  final case class StageAgg(
      var tasks: Int = 0, var recordsRead: Long = 0, var recordsWritten: Long = 0,
      var shuffleReadBytes: Long = 0, var shuffleWriteBytes: Long = 0,
      var cpuTimeNs: Long = 0)

  val stages: mutable.Map[Int, StageAgg] = mutable.Map()
  /** per (stageId, partitionId) record counts — the per-partition lineage */
  val partitions: mutable.Map[(Int, Int), Long] = mutable.Map()

  override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
    synchronized {
      val agg = stages.getOrElseUpdate(te.stageId, StageAgg())
      val m = te.taskMetrics
      if (m != null) {
        agg.tasks += 1
        agg.recordsRead += m.inputMetrics.recordsRead
        agg.recordsWritten += m.outputMetrics.recordsWritten
        agg.shuffleReadBytes += m.shuffleReadMetrics.totalBytesRead
        agg.shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
        agg.cpuTimeNs += m.executorCpuTime
        partitions((te.stageId, te.taskInfo.index)) =
          m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
      }
    }

  def report(): String = synchronized {
    val lines = stages.toSeq.sortBy(_._1).map { case (id, a) =>
      s"""{"stage":$id,"tasks":${a.tasks},"recordsRead":${a.recordsRead},""" +
        s""""recordsWritten":${a.recordsWritten},"shuffleReadBytes":${a.shuffleReadBytes},""" +
        s""""shuffleWriteBytes":${a.shuffleWriteBytes},"cpuMs":${a.cpuTimeNs / 1000000}}"""
    }
    lines.mkString("\n")
  }

  /** Per-partition lineage lines: records seen by each (stage, partition). */
  def partitionLineage(): String = synchronized {
    partitions.toSeq.sorted.map { case ((stage, part), recs) =>
      s"""{"stage":$stage,"partition":$part,"records":$recs}"""
    }.mkString("\n")
  }
}
