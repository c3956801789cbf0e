package graft.refine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Second pass: adjust pairwise match weights using tokens that distinguish
  * candidates within each candidate group (reference:
  * post_linkage/identify_distinguishing_tokens.py:4-476, semantics traced
  * in SURVEY.md §3.3 step 3).
  *
  * Convention (as in the reference): the _r side is the "messy" record
  * whose candidate group we analyse; the _l side are its candidates.
  *
  * adjustment = REWARD * sum(1/cnt^2 over tokens shared by this l and r)
  *            - PUNISH * |tokens present elsewhere in the block but not in this l|
  *            - MISSING_PENALTY * |tokens of this l absent from r|
  *            + bigram analogues (bigrams keyed "tok1 tok2"; reference keys
  *              maps by token arrays — string keys are the Spark remodel,
  *              SURVEY.md §1.4).
  *
  * Scale shape: one window (top-N per messy id) + one groupBy over the
  * messy id + two equi-joins back — all shuffles are on the messy-record
  * key, bounded by top_n_matches (block size <= N, reference caps at 5).
  */
object DistinguishingTokens {

  final case class Params(
      matchWeightThreshold: Double = -20,
      topNMatches: Int = 5,
      useBigrams: Boolean = true,
      rewardMultiplier: Double = 3,
      punishmentMultiplier: Double = 1.5,
      bigramRewardMultiplier: Double = 3,
      bigramPunishmentMultiplier: Double = 1.5,
      missingTokenPenalty: Double = 0.1,
      /** tokens stripped (up to twice) from each side's tail before the
        * analysis — the reference's remove_common_end_tokens step
        * (identify_distinguishing_tokens.py:58-113; the double list_filter
        * removes at most two trailing common tokens).
        */
      commonEndTokens: Seq[String] = Nil)

  /** Filter a count-map to keys contained in `keys` array. */
  private def mapKeepKeysIn(m: Column, keys: Column): Column =
    map_filter(m, (k, _) => array_contains(keys, k))

  /** improve predictions. `pairs` must contain: conv_id_l, conv_id_r,
    * match_weight plus sig_text_l / sig_text_r (normalised record texts).
    */
  def improve(pairs: DataFrame, params: Params = Params()): DataFrame = {
    // Step 1-2: threshold + top-N per messy record with the reference's
    // exact tie-break (ORDER BY match_weight DESC, unique_id_l DESC)
    // (identify_distinguishing_tokens.py:40-56).
    val good = pairs.filter(col("match_weight") > params.matchWeightThreshold)
    val w = Window.partitionBy(col("conv_id_r"))
      .orderBy(col("match_weight").desc, col("conv_id_l").desc)
    val topN = good.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= params.topNMatches).drop("__rn")

    // Step 3-4: tokenise both sides. sig_text is already in normal form
    // (uppercase, punctuation-free — it is a concat_ws of normText outputs,
    // and normText is idempotent, property-tested), so a whitespace split
    // is EXACTLY GraftFunctions.tokens here at none of its regex cost —
    // the full normalisation chain ran per pair and dominated refine CPU.
    // Trailing common end tokens stripped up to twice per side (reference
    // applies its tail filter twice — identify_distinguishing_tokens.py:93-94).
    def fastToks(c: Column): Column =
      when(length(c) === 0, array().cast("array<string>"))
        .otherwise(split(c, "\\s+"))
    def stripCommonTail(toks: Column): Column =
      if (params.commonEndTokens.isEmpty) toks
      else {
        def stripOnce(c: Column): Column =
          when(try_element_at(c, lit(-1)).isin(params.commonEndTokens: _*),
            slice(c, lit(1), size(c) - 1)).otherwise(c)
        stripOnce(stripOnce(toks))
      }
    val tokenised = topN
      .withColumn("tokens_l", stripCommonTail(fastToks(col("sig_text_l"))))
      .withColumn("tokens_r", stripCommonTail(fastToks(col("sig_text_r"))))

    // Step 5: per-messy-record block pool histograms, computed RELATIONALLY
    // (explode -> map-side-combinable groupBy count -> sorted
    // map_from_entries) instead of a per-row fold over the flattened pool:
    // the fold form was an interpreted O(distinct^2) giant-array HOF that
    // dominated refine wall and anti-scaled with cores
    // (identify_distinguishing_tokens.py:130-201).
    def poolHist(elems: Column, out: String): DataFrame = tokenised
      .select(col("conv_id_r"), explode(elems).as("e"))
      .groupBy(col("conv_id_r"), col("e"))
      .agg(count(lit(1)).cast("int").as("cnt"))
      .groupBy(col("conv_id_r"))
      // sort entries so downstream map_values folds are order-deterministic
      .agg(map_from_entries(array_sort(collect_list(struct(col("e"), col("cnt")))))
        .as(out))
    val emptyHist = map_from_arrays(
      array().cast("array<string>"), array().cast("array<int>"))

    // NB: the reference's bigram pool zips the *flattened* candidate list,
    // creating spurious cross-record bigrams at list boundaries whose
    // identity depends on the candidate ordering of a Python list
    // (identify_distinguishing_tokens.py:164-171). A distributed
    // collect_list order is not deterministic, so reproducing that quirk
    // faithfully is impossible; we count within-candidate bigrams only —
    // deterministic, and a strict subset of the reference's pool.
    val blockAgg = tokenised
      .groupBy(col("conv_id_r"))
      .agg(first(col("tokens_r")).as("g_tokens_r"))
      .join(poolHist(col("tokens_l"), "hist_all_tokens_in_block_l"),
        Seq("conv_id_r"), "left")
      .join(poolHist(wordNgrams(col("tokens_l"), 2), "hist_all_bigrams_in_block_l"),
        Seq("conv_id_r"), "left")
      .withColumn("hist_all_tokens_in_block_l",
        coalesce(col("hist_all_tokens_in_block_l"), emptyHist))
      .withColumn("hist_all_bigrams_in_block_l",
        coalesce(col("hist_all_bigrams_in_block_l"), emptyHist))
      .withColumn("hist_overlapping_tokens_r_block_l",
        mapKeepKeysIn(col("hist_all_tokens_in_block_l"), col("g_tokens_r")))
      .withColumn("bigrams_r", wordNgrams(col("g_tokens_r"), 2))
      .withColumn("hist_overlapping_bigrams_r_block_l",
        mapKeepKeysIn(col("hist_all_bigrams_in_block_l"), col("bigrams_r")))
      .select("conv_id_r", "hist_all_tokens_in_block_l",
        "hist_overlapping_tokens_r_block_l", "hist_all_bigrams_in_block_l",
        "hist_overlapping_bigrams_r_block_l", "bigrams_r")

    // Step 6: per-pair maps (identify_distinguishing_tokens.py:204-301).
    val joined = tokenised.join(blockAgg, Seq("conv_id_r"), "left")
      .withColumn("overlapping_tokens_this_l_and_r",
        mapKeepKeysIn(col("hist_overlapping_tokens_r_block_l"), col("tokens_l")))
      .withColumn("tokens_r_not_in_l",
        filter(col("tokens_r"), t => not(array_contains(col("tokens_l"), t))))
      .withColumn("missing_tokens",
        filter(col("tokens_l"), t => not(array_contains(col("tokens_r"), t))))
      .withColumn("bigrams_l", wordNgrams(col("tokens_l"), 2))
      .withColumn("overlapping_bigrams_this_l_and_r",
        mapKeepKeysIn(col("hist_overlapping_bigrams_r_block_l"), col("bigrams_l")))
      .withColumn("bigrams_r_not_in_l",
        filter(col("bigrams_r"), b => not(array_contains(col("bigrams_l"), b))))

    // Step 7: elsewhere-but-not-this maps + bigram unigram-cover filter
    // (identify_distinguishing_tokens.py:304-396).
    val windowed = joined
      .withColumn("tokens_elsewhere_in_block_but_not_this",
        mapKeepKeysIn(col("hist_all_tokens_in_block_l"), col("tokens_r_not_in_l")))
      .withColumn("bigrams_elsewhere_in_block_but_not_this",
        mapKeepKeysIn(col("hist_all_bigrams_in_block_l"), col("bigrams_r_not_in_l")))
      .withColumn("overlapping_bigrams_this_l_and_r_filtered",
        bigramUnigramCoverFilter(col("overlapping_bigrams_this_l_and_r"),
          col("overlapping_tokens_this_l_and_r")))
      .withColumn("bigrams_elsewhere_in_block_but_not_this_filtered",
        bigramUnigramCoverFilter(col("bigrams_elsewhere_in_block_but_not_this"),
          col("tokens_elsewhere_in_block_but_not_this")))

    // Final: mw adjustment (identify_distinguishing_tokens.py:407-445).
    def rewardSum(m: Column): Column =
      coalesce(aggregate(map_values(m), lit(0.0),
        (acc, v) => acc + lit(1.0) / (v.cast("double") * v.cast("double"))), lit(0.0))
    def punishCount(m: Column): Column = coalesce(size(map_values(m)).cast("double"), lit(0.0))

    val tokenAdj =
      rewardSum(col("overlapping_tokens_this_l_and_r")) * params.rewardMultiplier -
        punishCount(col("tokens_elsewhere_in_block_but_not_this")) * params.punishmentMultiplier -
        size(col("missing_tokens")).cast("double") * params.missingTokenPenalty
    val bigramAdj =
      if (!params.useBigrams) lit(0.0)
      else rewardSum(col("overlapping_bigrams_this_l_and_r_filtered")) * params.bigramRewardMultiplier -
        punishCount(col("bigrams_elsewhere_in_block_but_not_this_filtered")) *
          params.bigramPunishmentMultiplier

    windowed
      .withColumn("mw_adjustment", tokenAdj + bigramAdj)
      .withColumn("match_weight_original", col("match_weight"))
      .withColumn("match_weight", col("match_weight_original") + col("mw_adjustment"))
  }

  /** Keep a bigram entry unless BOTH of its unigrams are already covered by
    * the unigram map with count <= the bigram's count
    * (identify_distinguishing_tokens.py:359-392).
    */
  private def bigramUnigramCoverFilter(bigramMap: Column, unigramMap: Column): Column =
    map_filter(bigramMap, (k, v) => {
      val t1 = try_element_at(split(k, " "), lit(1))
      val t2 = try_element_at(split(k, " "), lit(2))
      val covered1 = map_contains_key(unigramMap, t1) && try_element_at(unigramMap, t1) <= v
      val covered2 = map_contains_key(unigramMap, t2) && try_element_at(unigramMap, t2) <= v
      not(covered1 && covered2)
    })
}
