package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe: time the internal phases of blocking at a given size.
  * Usage: sbt "runMain graft.BlockProbe [nConvIds] [cpus]"
  */
object BlockProbe {
  def main(args: Array[String]): Unit = {
    val nConvIds = args.lift(0).map(_.toLong).getOrElse(250000L)
    val cpus = args.lift(1).getOrElse("8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val turns = graft.ingest.TranscriptGen.turnsDF(spark, nConvIds).repartition(cpus.toInt)
    val sigs = timed("sigs") {
      val s0 = graft.signature.Signatures.signatures(turns)
      val s = graft.signature.Signatures.attachTf(s0, graft.signature.Signatures.tokenFrequencies(s0))
        .withColumn("block_key", col("bk_role_len")).localCheckpoint(true)
      s
    }
    println(s"  sigs=${sigs.count()}")
    val rules = graft.blocking.Blocking.defaultRules(graft.signature.Signatures.Bands)
    val lKeyed = {
      val l = sigs.toDF(sigs.columns.map(_ + "_l"): _*)
      rules.zipWithIndex.foldLeft(l) { case (df, (rule, i)) =>
        df.withColumn(s"__bk_$i", rule.leftKey.cast("string"))
      }.select((col("conv_id_l") +: rules.indices.map(i => col(s"__bk_$i"))): _*)
        .localCheckpoint(true)
    }
    println(s"  lKeyed=${lKeyed.count()}")
    val counts = timed("keyCounts agg") {
      val c = lKeyed
        .select(explode(array(rules.indices.map(i =>
          struct(lit(i).as("rule"), col(s"__bk_$i").as("key"))): _*)).as("rk"))
        .filter(col("rk.key").isNotNull)
        .groupBy(col("rk.rule").as("rule"), col("rk.key").as("key"))
        .count().localCheckpoint(true)
      println(s"  distinct (rule,key)=${c.count()}")
      c
    }
    val hot = timed("hot stats") {
      val h = counts.filter(col("count") > 200).localCheckpoint(true)
      println(s"  hot=${h.count()}")
      h.groupBy(col("rule")).agg(sum(when(col("count") <= 1600, 1L).otherwise(0L)),
        sum(when(col("count") > 1600, 1L).otherwise(0L))).collect()
        .foreach(r => println(s"  rule=${r.getInt(0)} salt=${r.getLong(1)} ultra=${r.getLong(2)}"))
      h
    }
    val kArr = array(rules.indices.map(i => col(s"__bk_$i")): _*)
    val lEx = lKeyed.withColumn("__karr_l", kArr)
      .select(col("conv_id_l"), col("__karr_l"), posexplode(col("__karr_l")).as(Seq("rule", "key")))
      .filter(col("key").isNotNull)
    timed("explode count") {
      println(s"  exploded=${lEx.count()}")
    }
    val rExploded = lKeyed.toDF(("conv_id_r" +: rules.indices.map(i => s"__bk_$i")): _*)
      .withColumn("__karr_r", kArr)
      .select(col("conv_id_r"), col("__karr_r"), posexplode(col("__karr_r")).as(Seq("rule", "key")))
      .filter(col("key").isNotNull)
    val joined = timed("unified join+filter") {
      val j = lEx.join(rExploded, Seq("rule", "key"))
        .filter(col("conv_id_l") < col("conv_id_r"))
      def eq(jj: Int) = coalesce(
        element_at(col("__karr_l"), jj + 1) === element_at(col("__karr_r"), jj + 1), lit(false))
      val keep = rules.indices.foldLeft(lit(false)) { (acc, rI) =>
        val noEarlier = (0 until rI).foldLeft(lit(true))((a, b) => a && not(eq(b)))
        when(col("rule") === rI, noEarlier).otherwise(acc)
      }
      val p = j.filter(keep).select(col("conv_id_l"), col("conv_id_r"), col("rule"))
      println(s"  pairs=${p.count()}")
      p
    }
    val carry = Seq("sig_text", "turn_texts", "role_seq", "len_band",
      "salient_token_1", "salient_token_2", "salient_token_3", "token_freq_hist",
      "very_unusual_tokens", "extremely_unusual_tokens", "n_turns",
      "numeric_token_1", "numeric_token_2", "numeric_token_3")
    timed("full candidatePairsSelf") {
      val p = graft.blocking.Blocking.candidatePairsSelf(
        sigs, "conv_id", rules,
        graft.blocking.Blocking.SkewConfig(200, 8, 20, Some("sig_text")),
        carryCols = carry)
      println(s"  fullPairs=${p.count()}")
    }
    timed("full without carry") {
      val p = graft.blocking.Blocking.candidatePairsSelf(
        sigs, "conv_id", rules,
        graft.blocking.Blocking.SkewConfig(200, 8, 20, Some("sig_text")))
      println(s"  noCarryPairs=${p.count()}")
    }
    spark.stop()
  }
}
