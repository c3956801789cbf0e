package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.TranscriptGen
import graft.streaming.StreamingIngest

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("stateful streaming ingestion matches the batch aggregate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val turns = TranscriptGen.turns(spark, 60)
    // two files => at least one multi-batch boundary for the state store
    turns.filter(_.conv_id < "c0000000030").toDF().write.parquet(s"$dir/in/batch1")
    turns.filter(_.conv_id >= "c0000000030").toDF().write.parquet(s"$dir/in/batch2")

    StreamingIngest.runToMemory(spark, s"$dir/in/*", "conv_updates")

    // last update per conversation == batch ground truth
    val lastUpdate = spark.table("conv_updates")
      .groupBy("conv_id")
      .agg(max("n_turns").as("n_turns"), max("chars").as("chars"))
    val batch = turns.toDF().groupBy("conv_id")
      .agg(count(lit(1)).cast("int").as("n_turns"),
        sum(length(col("text"))).as("chars"))
    val mismatches = lastUpdate.join(batch, "conv_id")
      .filter(lastUpdate("n_turns") =!= batch("n_turns") || lastUpdate("chars") =!= batch("chars"))
    assert(mismatches.count() === 0)
    assert(lastUpdate.count() === batch.count())
  }

  test("watermarked windowed counts run and produce rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    TranscriptGen.turnsDF(spark, 40).write.parquet(s"$dir/in")
    val q = StreamingIngest.windowedTurnCounts(
        StreamingIngest.readTurnStream(spark, s"$dir/in"))
      .writeStream.outputMode("update").format("memory").queryName("win_counts").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("win_counts").count() > 0)
    assert(spark.table("win_counts").columns.toSet ===
      Set("window", "role", "n_turns", "n_convs"))
  }
}
