package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Turn

/** Structured-Streaming ingestion for transcript turns (the reference is
  * pure batch — SURVEY.md §2.10 — but a 10^12-turn store is fed
  * incrementally; this is the streaming front door that keeps conversation
  * state until a conversation goes quiet, then emits its signature row for
  * the batch ER pipeline).
  *
  * Shapes:
  *  - `readTurnStream`: file-source stream with the Turn schema.
  *  - `windowedTurnCounts`: watermarked tumbling-window counts per role —
  *    the monitoring aggregate.
  *  - `incrementalConversationState`: KeyValueGroupedDataset
  *    .mapGroupsWithState accumulating per-conversation turn state; emits
  *    the running (n_turns, last_turn_idx, char_count, text_fingerprint)
  *    per update. State is bounded per conversation; at cluster scale the
  *    state store shards by conv_id.
  */
object StreamingIngest {

  final case class ConvState(nTurns: Int, lastTurnIdx: Int, chars: Long, fp: Long)
  final case class ConvUpdate(conv_id: String, n_turns: Int, last_turn_idx: Int,
      chars: Long, fingerprint: Long)

  val turnSchema = org.apache.spark.sql.Encoders.product[Turn].schema

  /** File-source turn stream from a directory of parquet files. */
  def readTurnStream(spark: SparkSession, dir: String): Dataset[Turn] = {
    import spark.implicits._
    spark.readStream.schema(turnSchema).parquet(dir).as[Turn]
  }

  /** Watermarked tumbling-window per-role turn counts (late data beyond 10
    * minutes dropped).
    */
  def windowedTurnCounts(turns: Dataset[Turn]): DataFrame =
    turns.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("role"))
      .agg(count(lit(1)).as("n_turns"), approx_count_distinct(col("conv_id")).as("n_convs"))

  /** Incremental per-conversation state: order-insensitive rolling
    * fingerprint (sum of per-turn hashes — commutative so arrival order
    * doesn't matter) + counters. Emits one update row per conversation per
    * micro-batch.
    */
  def incrementalConversationState(turns: Dataset[Turn]): Dataset[ConvUpdate] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(_.conv_id)
      .mapGroupsWithState[ConvState, ConvUpdate](GroupStateTimeout.NoTimeout) {
        (convId: String, rows: Iterator[Turn], state: GroupState[ConvState]) =>
          val prev = state.getOption.getOrElse(ConvState(0, -1, 0L, 0L))
          var n = prev.nTurns
          var last = prev.lastTurnIdx
          var chars = prev.chars
          var fp = prev.fp
          rows.foreach { t =>
            n += 1
            last = math.max(last, t.turn_idx)
            chars += Option(t.text).map(_.length.toLong).getOrElse(0L)
            // commutative combine => deterministic under any arrival order
            fp = fp + (scala.util.hashing.MurmurHash3.stringHash(
              s"${t.turn_idx}|${t.text}") & 0xffffffffL)
          }
          val next = ConvState(n, last, chars, fp)
          state.update(next)
          ConvUpdate(convId, n, last, chars, fp)
      }
  }

  /** Run a finite stream from `inputDir` through the stateful aggregation
    * into an in-memory table, synchronously (test/bench harness).
    */
  def runToMemory(spark: SparkSession, inputDir: String, tableName: String): Unit = {
    val q = incrementalConversationState(readTurnStream(spark, inputDir))
      .writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(tableName)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
