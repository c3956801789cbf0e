package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.blocking.Blocking
import graft.refine.DistinguishingTokens
import graft.resolve.{ConnectedComponents, ExactCascade}
import graft.runtime.Checkpoints
import graft.score.Scoring
import graft.signature.Signatures

/** End-to-end transcript deduplication pipeline (BASELINE.json north_star):
  *
  *   turns -> per-conversation signatures (+ on-the-fly TF features)
  *         -> deterministic exact cascade (cheap wins first,
  *            reference matching_stages.py design)
  *         -> union-of-rules blocking (role-seq/salient/MinHash bands)
  *         -> Fellegi-Sunter scoring (JW + TF-product + cascades)
  *         -> distinguishing-token second pass
  *         -> threshold -> edges -> large-star/small-star clustering
  *
  * Every stage is a DataFrame => DataFrame function; with a checkpoint dir
  * the inter-stage boundaries commit to parquet and a rerun resumes from
  * the last committed stage.
  */
object Pipeline {

  final case class Config(
      predictThreshold: Double = -12,
      improveThreshold: Double = -20,
      /** clustering-edge gate on the FIRST-pass match_weight. The second
        * pass re-ranks candidates per record (reference usage: best-match
        * selection) but its magnitude scales with record length, so it is
        * not used to gate transitive merges.
        */
      edgeThreshold: Double = -6.0,
      topN: Int = 5,
      prior: Double = 1e-6,
      /** hot-block tiering (north_rule "salted hot-block splitting"):
        * blocks <= maxBlockRows join plainly, <= maxBlockRows*maxSaltFactor
        * join salted (no recall loss), above that sorted-neighborhood
        * salvage on sig_text order replaces the round-1 drop-at-cap.
        */
      maxBlockRows: Int = 200,
      maxSaltFactor: Int = 8,
      snmWindow: Int = 20,
      useSecondPass: Boolean = true,
      /** trie-fallback cascade stage (deepest-unique token suffix) in LINK
        * mode. Self-dedup mode ignores it: each record is its own deepest
        * suffix match there, so the stage can only re-find exact dups that
        * stage 1 already caught.
        */
      useSuffixStage: Boolean = false,
      /** edge-count gate for the exact driver-side union-find CC finish.
        * The conservative default assumes a 1g spark-submit driver
        * (ADVICE r3); callers that KNOW their driver heap (e.g. the
        * cluster bench's --driver-memory 8g) should raise it — a string
        * edge is ~150-300 B of driver Rows + union-find map, so ~2M edges
        * per spare GB is safe.
        */
      ccDriverFinishMaxEdges: Long = ConnectedComponents.DriverFinishMaxEdges,
      checkpointDir: Option[String] = None)

  final case class Result(
      signatures: DataFrame,
      pairs: DataFrame,
      scored: DataFrame,
      refined: DataFrame,
      clusters: DataFrame,
      /** per-rule skew-tier stats from the blocking stage (empty when the
        * pairs stage was resumed from checkpoint — then the stats live in
        * the checkpoint's `_info_pairs.json` sidecar)
        */
      tierStats: Seq[blocking.RuleTierStats] = Nil,
      nBlockingRules: Int = 0) {
    /** Pairs that took the SNM salvage path (match_key >= #rules) — the
      * observable volume of lossy ultra-hot handling in this run. Counting
      * scans the (narrow, materialised) pairs boundary.
      */
    def salvagePairCount: Long = pairs.filter(col("match_key") >= nBlockingRules).count()
    def saltedKeyCount: Long = tierStats.map(_.nSaltKeys).sum
    def ultraKeyCount: Long = tierStats.map(_.nUltraKeys).sum
  }

  final case class LinkResult(
      messySignatures: DataFrame,
      canonicalSignatures: DataFrame,
      deterministic: DataFrame,
      pairs: DataFrame,
      scored: DataFrame,
      bestMatches: DataFrame,
      merged: DataFrame,
      tierStats: Seq[blocking.RuleTierStats] = Nil,
      nBlockingRules: Int = 0) {
    def salvagePairCount: Long = pairs.filter(col("match_key") >= nBlockingRules).count()
  }

  /** Checkpoint-invalidation fingerprint: every config knob except the
    * checkpoint location itself. 128-bit MD5 — a 32-bit String.hashCode
    * collides with ~50% chance after ~77k distinct configs (ADVICE r2),
    * silently reusing a stale stage; MD5 makes that effectively impossible.
    */
  private def configFingerprint(cfg: Config): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(cfg.copy(checkpointDir = None).toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def tierStatsJson(stats: Seq[blocking.RuleTierStats]): String =
    stats.map(t =>
      s"""{"rule":${t.rule},"n_salt_keys":${t.nSaltKeys},"n_ultra_keys":${t.nUltraKeys},""" +
        s""""n_one_sided_hot_keys":${t.nOneSidedHotKeys}}""")
      .mkString("[", ",", "]")

  /** Feature columns the score model reads (joined onto narrow pairs). */
  private val scoreCols = Seq(
    "sig_text", "turn_texts", "role_seq", "len_band",
    "salient_token_1", "salient_token_2", "salient_token_3", "token_freq_hist",
        "very_unusual_tokens", "extremely_unusual_tokens", "n_turns",
        "numeric_token_1", "numeric_token_2", "numeric_token_3")

  /** Attach the score-model feature columns to narrow (id_l, id_r,
    * match_key) pairs from the signature tables (one row per id).
    */
  def attachScoreCols(lSigs: DataFrame, rSigs: DataFrame, pairs: DataFrame): DataFrame = {
    val lCarry = lSigs.select(
      (col("conv_id").as("conv_id_l") +: scoreCols.map(c => col(c).as(c + "_l"))): _*)
    val rCarry = rSigs.select(
      (col("conv_id").as("conv_id_r") +: scoreCols.map(c => col(c).as(c + "_r"))): _*)
    pairs.join(lCarry, Seq("conv_id_l")).join(rCarry, Seq("conv_id_r"))
  }

  /** Score narrow pairs against their signature features (the isolated
    * scoring surface used by the benchmark's throughput metric).
    */
  def scorePairs(lSigs: DataFrame, rSigs: DataFrame, pairs: DataFrame, prior: Double): DataFrame =
    Scoring.scoreDefault(attachScoreCols(lSigs, rSigs, pairs), prior)

  def run(spark: SparkSession, turnsIn: DataFrame, cfg: Config = Config()): Result = {
    // fail fast with ALL schema problems aggregated (reference:
    // validation.py enforced before the deterministic pass)
    val turns = runtime.SchemaValidation.validateOrThrow(
      turnsIn, runtime.SchemaValidation.turnsSchema, "turns")
    val ckpt = cfg.checkpointDir.map(new Checkpoints(spark, _))
    // Stage boundaries truncate lineage: parquet commit when resumable
    // checkpointing is on (keyed by a config fingerprint so a config change
    // recomputes instead of serving stale stages), LAZY localCheckpoint
    // otherwise — each stage materialises exactly once at its first action
    // and is reused after, but without eager per-stage driver barriers
    // (round-1 bench showed the serial barriers dominating local wall).
    // Reference analogue: per-stage temp-table materialisation,
    // sql_pipeline/runner.py:471-491.
    val fp = configFingerprint(cfg)
    def staged(name: String)(compute: => DataFrame): DataFrame =
      ckpt.map(_.stage(name, fp)(compute)).getOrElse(compute.localCheckpoint(false))

    // 1. signatures (+ TF attach). s0 is materialised once inside the
    // stage: tokenFrequencies, attachTf's per-token explode and the final
    // feature join are three more instances of the signatures subplan —
    // exchange reuse shares the conversation shuffle but each instance
    // recomputed the heavy post-aggregate projection (measured as the
    // dominant pipeline stage at 30k convs).
    val sigs = staged("signatures") {
      val s0 = Signatures.signatures(turns).localCheckpoint(false)
      val tf = Signatures.tokenFrequencies(s0)
      Signatures.attachTf(s0, tf)
        .withColumn("block_key", col("bk_role_len"))
    }.persist()

    // 2. deterministic cascade (self-dedup: canonical side = all records;
    // exact duplicates collapse to the min id immediately). Self mode uses
    // the proven one-shuffle collapse of the full cascade — identical
    // output (ExactCascade.selfExactLinks doc + CascadeSpec equivalence
    // test), ~10 fewer serial stages (VERDICT r3 #4).
    val cascade = staged("cascade") {
      ExactCascade.selfExactLinks(
        sigs.select(col("conv_id"), col("sig_text"), col("block_key")))
    }

    // 3. blocking on everything (cascade edges merge in at the end).
    // The pairs boundary stays NARROW (ids + match_key): materialising
    // carry-fattened pairs (turn texts + TF maps per side) at a stage
    // boundary measured ~100 s at 250k convs — the features are attached
    // inside the scoring stage instead, which emits a narrow result.
    val rules = Blocking.defaultRules(Signatures.Bands)
    var tierStats: Seq[blocking.RuleTierStats] = Nil
    val pairs = staged("pairs") {
      val res = Blocking.candidatePairsSelfWithStats(
        sigs, "conv_id", rules,
        Blocking.SkewConfig(cfg.maxBlockRows, cfg.maxSaltFactor, cfg.snmWindow,
          snmSortCol = Some("sig_text")))
      tierStats = res.tierStats
      res.pairs
    }
    // skew observability survives in the checkpoint dir next to the stage
    if (tierStats.nonEmpty) ckpt.foreach(_.writeInfo("pairs", tierStatsJson(tierStats)))

    // 4. score (carry features joined in from the persisted signatures)
    val scored = staged("scored") {
      Scoring.scoreDefault(attachScoreCols(sigs, sigs, pairs), cfg.prior)
        .filter(col("match_weight") > cfg.predictThreshold)
        .select("conv_id_l", "conv_id_r", "match_key", "match_weight",
          "match_probability", "sig_text_l", "sig_text_r")
    }

    // 5. second pass
    val refined = staged("refined") {
      if (!cfg.useSecondPass) scored
      else DistinguishingTokens.improve(scored,
        DistinguishingTokens.Params(
          matchWeightThreshold = cfg.improveThreshold, topNMatches = cfg.topN))
        .select("conv_id_l", "conv_id_r", "match_weight", "match_weight_original",
          "mw_adjustment")
    }

    // 6. edges = confident first-pass pairs + deterministic cascade links
    val clusters = staged("clusters") {
      val scoredEdges = scored.filter(col("match_weight") > cfg.edgeThreshold)
        .select(col("conv_id_l"), col("conv_id_r"))
      val cascadeEdges = cascade.select(
        col("conv_id").as("conv_id_l"), col("resolved_canonical_id").as("conv_id_r"))
      // no .distinct() here: ConnectedComponents.run canonicalises and
      // dedups the edge set itself — a pipeline-level distinct was a full
      // extra shuffle for nothing (VERDICT r3 #4 stage-floor audit)
      val edges = scoredEdges.unionByName(cascadeEdges)
      ConnectedComponents.assignAll(
        spark, sigs.select("conv_id"), edges,
        checkpointDir = cfg.checkpointDir.map(_ + "/cc"),
        driverFinishMaxEdges = cfg.ccDriverFinishMaxEdges)
    }

    Result(sigs, pairs, scored, refined, clusters, tierStats, rules.length)
  }

  /** Link-mode pipeline: match each messy conversation to its best
    * canonical counterpart (the reference's primary entrypoint —
    * examples/example_matching.py:99-111 composed over
    * matching_stages.py + splink_model.py + match_candidate_selection.py):
    *
    *   1. signatures for both sides, TF table from the canonical corpus
    *      (the stable side — messy batches come and go);
    *   2. deterministic exact cascade messy -> canonical;
    *   3. blocking (canonical = _l, messy = _r) for UNMATCHED messy only
    *      (carry-forward semi-filter, reference input_filters.py);
    *   4. Fellegi-Sunter score + distinguishing-token second pass;
    *   5. best match per messy record (threshold + tie-break);
    *   6. merge: deterministic wins, probabilistic fills the rest
    *      (match_candidate_selection.py:100-130).
    */
  def runLink(
      spark: SparkSession,
      messyTurnsIn: DataFrame,
      canonicalTurnsIn: DataFrame,
      cfg: Config = Config()): LinkResult = {
    val messyTurns = runtime.SchemaValidation.validateOrThrow(
      messyTurnsIn, runtime.SchemaValidation.turnsSchema, "messy turns")
    val canonicalTurns = runtime.SchemaValidation.validateOrThrow(
      canonicalTurnsIn, runtime.SchemaValidation.turnsSchema, "canonical turns")
    val ckpt = cfg.checkpointDir.map(new Checkpoints(spark, _))
    val fp = configFingerprint(cfg)
    def staged(name: String)(compute: => DataFrame): DataFrame =
      ckpt.map(_.stage(name, fp)(compute)).getOrElse(compute.localCheckpoint(false))

    // 1. signatures; one TF table (canonical corpus) applied to both sides
    // so a token's rarity means the same thing on each side of a pair.
    val canonSigs = staged("link_canon_sigs") {
      // s0 materialised once — see run()'s signatures stage note
      val s0 = Signatures.signatures(canonicalTurns).localCheckpoint(false)
      Signatures.attachTf(s0, Signatures.tokenFrequencies(s0))
        .withColumn("block_key", col("bk_role_len"))
    }.persist()
    val messySigs = staged("link_messy_sigs") {
      val s0 = Signatures.signatures(messyTurns).localCheckpoint(false)
      // TF from the already-materialised canonical signatures (tokens col)
      Signatures.attachTf(s0, Signatures.tokenFrequencies(canonSigs))
        .withColumn("block_key", col("bk_role_len"))
    }.persist()

    // 2. deterministic cascade
    val det = staged("link_cascade") {
      ExactCascade.run(
        messySigs.select(col("conv_id"), col("sig_text"), col("block_key")),
        canonSigs.select(col("conv_id"), col("sig_text"), col("block_key")),
        useSuffixStage = cfg.useSuffixStage)
    }

    // 3. blocking on the carry-forward (unmatched messy records only);
    // narrow pairs boundary, features joined at scoring time (see run()).
    val rules = Blocking.defaultRules(Signatures.Bands)
    var tierStats: Seq[blocking.RuleTierStats] = Nil
    val pairs = staged("link_pairs") {
      val remaining = messySigs.join(det.select("conv_id"), Seq("conv_id"), "left_anti")
      val res = Blocking.candidatePairsLinkWithStats(
        canonSigs, remaining, "conv_id", rules,
        Blocking.SkewConfig(cfg.maxBlockRows, cfg.maxSaltFactor, cfg.snmWindow,
          snmSortCol = Some("sig_text")))
      tierStats = res.tierStats
      res.pairs
    }
    if (tierStats.nonEmpty) ckpt.foreach(_.writeInfo("link_pairs", tierStatsJson(tierStats)))

    // 4. score + second pass
    val scored = staged("link_scored") {
      Scoring.scoreDefault(attachScoreCols(canonSigs, messySigs, pairs), cfg.prior)
        .filter(col("match_weight") > cfg.predictThreshold)
        .select("conv_id_l", "conv_id_r", "match_key", "match_weight",
          "match_probability", "sig_text_l", "sig_text_r")
    }
    val refined = staged("link_refined") {
      if (!cfg.useSecondPass) scored
      else DistinguishingTokens.improve(scored,
        DistinguishingTokens.Params(
          matchWeightThreshold = cfg.improveThreshold, topNMatches = cfg.topN))
        .select("conv_id_l", "conv_id_r", "match_weight")
    }

    // 5-6. best match + merge
    val best = staged("link_best") {
      graft.evaluate.Evaluate.bestMatches(refined)
    }
    val merged = staged("link_merged") {
      graft.evaluate.Evaluate.mergeMatches(det, best)
    }
    LinkResult(messySigs, canonSigs, det, pairs, scored, best, merged, tierStats, rules.length)
  }
}
