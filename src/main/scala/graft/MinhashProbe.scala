package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Ad-hoc probe: time the internal phases of the MinHash-LSH kernel
  * (q17/q19b/q29's dominant cost) on the documents table.
  * Usage: sbt "runMain graft.MinhashProbe [sfDir] [cpus]"
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $n%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = d.select(col("doc_id"),
      array_distinct(wordNgrams(tokens(col("text")), 3)).as("__sh"))
    val shM = timed("shingles_mat")(sh.localCheckpoint(true))
    println(s"  docs=${shM.count()} shingle_rows=" +
      shM.select(explode(col("__sh"))).count())
    val ex = shM.select(col("doc_id"), explode(col("__sh")).as("__e"))
    timed("explode_count")(ex.count())
    timed("md5_16_hashes") {
      val hashCols = (0 until 16).map(s => portableKmHash64(col("__e"), s).as(s"__h$s"))
      ex.select(col("doc_id") +: hashCols: _*)
        .agg(sum(col("__h0").cast("decimal(38,0)"))).collect()
    }
    timed("minhashAgg_16")(
      minhashAggregate(shM, "doc_id", col("__sh"), 16, portable = true).count())
    val sig = timed("sig_mat")(
      minhashAggregate(shM, "doc_id", col("__sh"), 16, portable = true)
        .select(col("doc_id"), minhashBandKeys(col("minhash_sig"), 8, 2).as("bands"))
        .localCheckpoint(true))
    timed("bands_join_distinct") {
      val bex = sig.select(col("doc_id"), explode(col("bands")).as("band_key"))
      val c = bex.as("l").join(bex.as("r"),
          col("l.band_key") === col("r.band_key") && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct().count()
      println(s"  cands=$c")
    }
    spark.stop()
  }
}
