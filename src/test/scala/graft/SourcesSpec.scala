package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source-format coverage beyond parquet (SURVEY.md §2.1): CSV and JSON
  * round-trips with explicit schemas — the reference reads CSV/parquet via
  * DuckDB's scanners; Spark's DataSource V2 covers the same surface.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rows = Seq(
    ("c1", 0, "user", "hello world", 3.5),
    ("c1", 1, "assistant", "hi, there | escaped \"quote\"", -1.25),
    ("c2", 0, "user", "plain text row", 0.0))

  test("CSV round-trip with explicit schema (header, quoting, pushdown-able filter)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val df = rows.toDF("conv_id", "turn_idx", "role", "text", "score")
    df.write.mode("overwrite").option("header", "true").csv(dir)

    val schema = StructType(Seq(
      StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
      StructField("role", StringType), StructField("text", StringType),
      StructField("score", DoubleType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.orderBy("conv_id", "turn_idx").collect().toSeq ===
      df.orderBy("conv_id", "turn_idx").collect().toSeq)
    // filters prune rows at the CSV scan
    assert(back.filter($"turn_idx" === 0).count() === 2)
  }

  test("JSON lines round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val df = rows.toDF("conv_id", "turn_idx", "role", "text", "score")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(df.schema).json(dir)
    assert(back.orderBy("conv_id", "turn_idx").collect().toSeq ===
      df.orderBy("conv_id", "turn_idx").collect().toSeq)
  }
}
