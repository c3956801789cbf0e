package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator surface (relational core, text
  * analysis, dedup/similarity, events, ER stages); `entry` is the flagship
  * end-to-end transcript entity-resolution pipeline on synthetic data.
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ TextQueries.defs ++ DedupQueries.defs ++
      EventsQueries.defs ++ ErQueries.defs ++ BinaryQueries.defs ++ SamplingQueries.defs

  /** Flagship: full transcript ER pipeline (signatures -> blocking ->
    * scoring -> clustering) on deterministic synthetic transcripts;
    * driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val turns = graft.ingest.TranscriptGen.turnsDF(spark, 200)
    Pipeline.run(spark, turns).clusters
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(sql => d.name -> sql.trim)).toMap
}
