package graft.runtime

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-checkpoint manager: each named stage is committed as a parquet
  * table + a manifest entry; a re-run resumes from the last committed stage
  * (BASELINE.json north_rule "resumable from checkpoint with per-partition
  * lineage + metrics"; reference analogue: temp-table checkpoint
  * materialisation, sql_pipeline/runner.py:471-491).
  *
  * Layout: <dir>/<stage>/ parquet + Spark's _SUCCESS marker;
  *         <dir>/_manifest_<stage>.json per committed stage with rows,
  *         partition count, wall-clock ms and a caller-supplied
  *         FINGERPRINT (config hash). A stage is only reused when both the
  *         _SUCCESS marker exists and the recorded fingerprint matches —
  *         rerunning with a different config against the same checkpointDir
  *         recomputes instead of silently returning stale results.
  *
  * All filesystem access goes through the Hadoop FileSystem API, so
  * checkpoint dirs work on HDFS/S3A exactly as they do on local paths
  * (the spark-submit deployment surface).
  */
final class Checkpoints(spark: SparkSession, dir: String) {

  private val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
  fs.mkdirs(new Path(dir))

  def isCommitted(stage: String): Boolean =
    fs.exists(new Path(s"$dir/$stage/_SUCCESS"))

  private def manifestPath(stage: String) = new Path(s"$dir/_manifest_$stage.json")

  private def readManifest(stage: String): Option[String] = {
    val p = manifestPath(stage)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  private def writeManifest(stage: String, json: String): Unit = {
    val out = fs.create(manifestPath(stage), true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Fingerprint recorded when the stage was committed (empty for stages
    * committed by older layouts with no manifest).
    */
  def committedFingerprint(stage: String): Option[String] =
    readManifest(stage).map { json =>
      "\"fingerprint\":\"([^\"]*)\"".r.findFirstMatchIn(json)
        .map(_.group(1)).getOrElse("")
    }

  /** Run (or resume) a stage: reused only when committed AND the recorded
    * fingerprint matches `fingerprint` — a config change invalidates the
    * checkpoint instead of silently serving stale results.
    */
  def stage(name: String, fingerprint: String = "")(compute: => DataFrame): DataFrame = {
    val path = s"$dir/$name"
    // An ABSENT manifest is a fingerprint MISMATCH when the caller supplies
    // one: a stage committed by an older layout (or whose manifest was
    // deleted) is unverifiable and must be recomputed, not silently reused
    // under any config (ADVICE r2). Legacy no-fingerprint callers still
    // reuse manifest-less commits.
    val reusable = isCommitted(name) && (committedFingerprint(name) match {
      case Some(fp) => fp == fingerprint
      case None => fingerprint.isEmpty
    })
    if (reusable) {
      spark.read.parquet(path)
    } else {
      val t0 = System.nanoTime()
      val df = compute
      df.write.mode("overwrite").parquet(path)
      val committed = spark.read.parquet(path)
      val rows = committed.count()
      val parts = committed.rdd.getNumPartitions
      val ms = (System.nanoTime() - t0) / 1000000
      writeManifest(name,
        s"""{"stage":"$name","rows":$rows,"partitions":$parts,"wall_ms":$ms,""" +
          s""""path":"$path","fingerprint":"$fingerprint"}""")
      committed
    }
  }

  /** Attach a caller-supplied JSON sidecar to a stage (e.g. the blocking
    * stage's skew-tier stats) — written as <dir>/_info_<stage>.json so run
    * metrics survive in the checkpoint dir alongside the manifest.
    */
  def writeInfo(stage: String, json: String): Unit = {
    val out = fs.create(new Path(s"$dir/_info_$stage.json"), true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def readInfo(stage: String): Option[String] = {
    val p = new Path(s"$dir/_info_$stage.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** Stages committed so far (manifest files present), by modification time. */
  def committedStages(): Seq[String] = {
    val st = fs.listStatus(new Path(dir))
    st.filter(s => s.getPath.getName.startsWith("_manifest_"))
      .sortBy(_.getModificationTime)
      .map(_.getPath.getName.stripPrefix("_manifest_").stripSuffix(".json"))
      .toSeq
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
