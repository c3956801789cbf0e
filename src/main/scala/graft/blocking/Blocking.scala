package graft.blocking

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Candidate-pair generation: union of equi-join blocking rules with
  * Splink-style earlier-rule exclusion so every pair is emitted exactly
  * once, tagged `match_key` (reference: linking_model/blocking.py +
  * data/splink_model.json:16-89; SURVEY.md §2.3 "THE scalability-critical
  * operator").
  *
  * Scale design (10^12 turns / ~10^11 conversations):
  *  - every rule is a single string-keyed equi-join => Catalyst picks
  *    sort-merge (or broadcast for a small canonical side), AQE handles
  *    residual skew;
  *  - stop-block capping: keys whose block size exceeds `maxBlockRows` are
  *    dropped (LSH stop-word analogue) — an O(pairs) guard, since a single
  *    hot key at 10^6 rows would otherwise emit 10^12 pairs;
  *  - explicit repartition on the join key before the join keeps the
  *    exchange reusable across rules that share a key.
  */
final case class BlockingRule(name: String, leftKey: Column, rightKey: Column)

object Blocking {

  /** Key separator for composite keys; ASCII unit separator avoids
    * accidental collisions with token text.
    */
  val Sep = ""

  def compositeKey(parts: Column*): Column = {
    // any null part nulls the whole key (reference rules: an equality on a
    // NULL feature never matches)
    val joined = concat_ws(Sep, parts.map(_.cast("string")): _*)
    when(parts.map(_.isNotNull).reduce(_ && _), joined).otherwise(lit(null))
  }

  /** Default transcript blocking rules over a signature table
    * (north_star: role-sequence shingles + MinHash bands + salient tokens).
    * MinHash band rules are expanded one-rule-per-band so each stays a
    * plain equi-join.
    */
  def defaultRules(bands: Int): Seq[BlockingRule] = {
    // Every non-LSH rule composes a salient (rare) token with a second
    // feature — the reference's rule shape (numeric_token x unusual-token x
    // postcode-part composites, blocking.py:1-25). A bare role-sequence/
    // length rule was measured to emit 98% of all candidate pairs while
    // contributing no unique recall (every variant type is covered by a
    // salient or MinHash rule) — pure-cheap-key rules do not survive scale.
    val base = Seq(
      BlockingRule("salient12",
        compositeKey(col("salient_token_1_l"), col("salient_token_2_l")),
        compositeKey(col("salient_token_1_r"), col("salient_token_2_r"))),
      BlockingRule("salient_inv",
        compositeKey(col("salient_token_1_l"), col("salient_token_2_l")),
        compositeKey(col("salient_token_2_r"), col("salient_token_1_r"))),
      BlockingRule("salient1_role",
        compositeKey(col("salient_token_1_l"), col("role_seq_l")),
        compositeKey(col("salient_token_1_r"), col("role_seq_r"))),
      BlockingRule("salient1_len",
        compositeKey(col("salient_token_1_l"), col("len_band_l")),
        compositeKey(col("salient_token_1_r"), col("len_band_r")))
    )
    val bandRules = (0 until bands).map { b =>
      BlockingRule(s"minhash_band_$b",
        element_at(col("minhash_bands_l"), b + 1),
        element_at(col("minhash_bands_r"), b + 1))
    }
    base ++ bandRules
  }

  /** Generate candidate pairs for self-dedup: `id_l < id_r`, one row per
    * pair with the first matching rule's index as `match_key`.
    *
    * @param sigs          signature table with an `idCol` unique id
    * @param rules         blocking rules (keys written against _l/_r column names)
    * @param maxBlockRows  stop-block cap per rule key (skew guard)
    */
  def candidatePairsSelf(
      sigs: DataFrame,
      idCol: String,
      rules: Seq[BlockingRule],
      maxBlockRows: Int = 1000,
      carryCols: Seq[String] = Nil): DataFrame = {
    val l = sigs.toDF(sigs.columns.map(_ + "_l"): _*)
    val r = sigs.toDF(sigs.columns.map(_ + "_r"): _*)
    candidatePairs(l, r, idCol, rules, maxBlockRows, selfDedup = true, carryCols)
  }

  /** Link-mode (messy x canonical) pair generation. */
  def candidatePairsLink(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      rules: Seq[BlockingRule],
      maxBlockRows: Int = 1000,
      carryCols: Seq[String] = Nil): DataFrame = {
    val l = left.toDF(left.columns.map(_ + "_l"): _*)
    val r = right.toDF(right.columns.map(_ + "_r"): _*)
    candidatePairs(l, r, idCol, rules, maxBlockRows, selfDedup = false, carryCols)
  }

  /** Sorted-neighborhood pairing inside a (possibly hot) block: sort block
    * members by a secondary key and pair only rows within `windowSize`
    * positions of each other. Output is O(n * window) instead of O(n^2) —
    * the salvage path for blocks the stop-block cap would otherwise drop
    * entirely (classic ER sorted-neighborhood method; complements the
    * reference's hard group-size caps).
    */
  def sortedNeighborhoodPairs(
      df: DataFrame,
      idCol: String,
      blockKey: Column,
      sortKey: Column,
      windowSize: Int): DataFrame = {
    val ranked = df
      .withColumn("__bk", blockKey)
      .withColumn("__sk", sortKey)
      .filter(col("__bk").isNotNull)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__bk")).orderBy(col("__sk").asc, col(idCol).asc)))
    val l = ranked.select(col("__bk").as("__bk_l"), col("__rn").as("__rn_l"),
      col(idCol).as(s"${idCol}_l"))
    val r = ranked.select(col("__bk").as("__bk_r"), col("__rn").as("__rn_r"),
      col(idCol).as(s"${idCol}_r"))
    l.join(r, col("__bk_l") === col("__bk_r") && col("__rn_r") > col("__rn_l") &&
        col("__rn_r") <= col("__rn_l") + windowSize)
      .select(
        least(col(s"${idCol}_l"), col(s"${idCol}_r")).as(s"${idCol}_l"),
        greatest(col(s"${idCol}_l"), col(s"${idCol}_r")).as(s"${idCol}_r"))
      .distinct()
  }

  /** Size-based join-side hint (north_star: "skew-aware broadcast-or-sort-
    * merge block join"): broadcast the smaller side when it fits, else let
    * Catalyst/AQE pick sort-merge. `rowsHint` should come from a cheap
    * count on an already-materialised stage boundary.
    */
  def broadcastIfSmall(df: DataFrame, rowsHint: Long, maxBroadcastRows: Long = 1000000L): DataFrame =
    if (rowsHint >= 0 && rowsHint <= maxBroadcastRows) broadcast(df) else df

  private def candidatePairs(
      l: DataFrame,
      r: DataFrame,
      idCol: String,
      rules: Seq[BlockingRule],
      maxBlockRows: Int,
      selfDedup: Boolean,
      carryCols: Seq[String]): DataFrame = {

    // materialise every rule's key as a column once per side, so the
    // earlier-rule exclusion predicates are cheap column references.
    val lKeyed = rules.zipWithIndex.foldLeft(l) { case (df, (rule, i)) =>
      df.withColumn(s"__bk_$i", rule.leftKey)
    }
    val rKeyed = rules.zipWithIndex.foldLeft(r) { case (df, (rule, i)) =>
      df.withColumn(s"__bk_$i", rule.rightKey)
    }

    val outCols =
      Seq(col(s"${idCol}_l"), col(s"${idCol}_r"), col("match_key")) ++
        carryCols.flatMap(c => Seq(col(c + "_l"), col(c + "_r")))

    // stop-block capping (skew guard): keys whose block exceeds the cap are
    // dropped — mirrors the reference's group-size bounding (top_n per
    // group) and standard LSH stop-block practice. ALL rules' hot keys are
    // found in ONE pass over the exploded (rule, key) stream per side —
    // a single scan regardless of rule count (matters at 100 TB).
    def hotKeys(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(array(rules.indices.map(i =>
        struct(lit(i).as("rule"), col(s"__bk_$i").as("key"))): _*)).as("rk"))
      .filter(col("rk.key").isNotNull)
      .groupBy(col("rk.rule").as("rule"), col("rk.key").as("key"))
      .count()
      .filter(col("count") > maxBlockRows)
      .select(col("rule"), col("key"))
    val hotL = hotKeys(lKeyed).persist()
    val hotR = if (selfDedup) hotL else hotKeys(rKeyed).persist()

    val perRule = rules.indices.map { i =>
      val hotLKeys = broadcast(hotL.filter(col("rule") === i).select(col("key").as(s"__bk_$i")))
      val hotRKeys = broadcast(hotR.filter(col("rule") === i).select(col("key").as(s"__bk_$i")))
      val lSide = lKeyed.filter(col(s"__bk_$i").isNotNull)
        .join(hotLKeys, Seq(s"__bk_$i"), "left_anti")
      val rSide = rKeyed.filter(col(s"__bk_$i").isNotNull)
        .join(hotRKeys, Seq(s"__bk_$i"), "left_anti")

      val joinCond =
        if (selfDedup)
          lSide(s"__bk_$i") === rSide(s"__bk_$i") && col(s"${idCol}_l") < col(s"${idCol}_r")
        else lSide(s"__bk_$i") === rSide(s"__bk_$i")

      val joined = lSide.join(rSide, joinCond)
      val excluded = (0 until i).foldLeft(joined) { (df, j) =>
        df.filter(not(coalesce(lSide(s"__bk_$j") === rSide(s"__bk_$j"), lit(false))))
      }
      excluded.withColumn("match_key", lit(i)).select(outCols: _*)
    }

    perRule.reduce(_ unionByName _)
  }
}
