package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.functions.JaroWinkler.jaroWinkler

/** Entity-resolution pipeline stages expressed as oracle-checkable queries
  * over `documents` (stand-in records): union-of-rules blocking with
  * match_key dedup (reference: linking_model/blocking.py + Splink blocking
  * semantics), Fellegi-Sunter log2-Bayes-factor scoring (reference:
  * data/splink_model.json comparison cascades), and best-match selection
  * with distinguishability (reference: post_linkage/analyse_results.py:48-161).
  */
object ErQueries {
  import Tables.load
  import TextQueries.duckToks

  // ---- shared feature projection -------------------------------------
  private def features(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents")
    val toks = tokens(col("text"))
    d.select(
      col("doc_id"), col("lang"), col("n_chars"),
      normText(col("text")).as("norm_text"),
      toks.as("toks"),
      array_join(slice(toks, 1, 3), " ").as("head3"),
      array_join(when(size(toks) >= 3, slice(toks, -3, 3)).otherwise(toks), " ").as("tail3"))
  }

  private val duckFeatures: String = s"""
    SELECT doc_id, lang, n_chars,
           trim(regexp_replace(regexp_replace(upper(text), '[[:punct:]]', ' ', 'g'),
                '\\s+', ' ', 'g')) AS norm_text,
           $duckToks AS toks,
           array_to_string(($duckToks)[1:3], ' ') AS head3,
           array_to_string(CASE WHEN len($duckToks) >= 3
             THEN ($duckToks)[-3:] ELSE $duckToks END, ' ') AS tail3
    FROM documents"""

  /** Union-of-equi-join blocking with Splink-style earlier-rule exclusion:
    * rule i only emits pairs NOT matched by any rule j < i, so each pair
    * appears exactly once, tagged with its first matching rule.
    */
  private def blockedPairs(s: SparkSession, dir: String): DataFrame = {
    val f = features(s, dir)
    // rule keys (null keys never join)
    val keyed = f.select(col("doc_id"),
      col("norm_text"), col("toks"), col("lang"), col("n_chars"),
      col("head3").as("k0"),
      concat_ws("#", col("lang"), col("n_chars")).as("k1"),
      col("tail3").as("k2"))
    val l = keyed.toDF(keyed.columns.map(_ + "_l"): _*)
    val r = keyed.toDF(keyed.columns.map(_ + "_r"): _*)
    def pairsFor(i: Int): DataFrame = {
      val joined = l.join(r,
        col(s"k${i}_l") === col(s"k${i}_r") && col("doc_id_l") < col("doc_id_r"))
      val excluded = (0 until i).foldLeft(joined) { (df, j) =>
        df.filter(not(coalesce(col(s"k${j}_l") === col(s"k${j}_r"), lit(false))))
      }
      excluded.withColumn("match_key", lit(i))
    }
    (0 until 3).map(pairsFor).reduce(_ unionByName _)
      .select(col("doc_id_l"), col("doc_id_r"), col("match_key"),
        col("norm_text_l"), col("norm_text_r"), col("toks_l"), col("toks_r"))
  }

  private val duckBlockedPairs: String = s"""
    WITH f AS ($duckFeatures),
    keyed AS (
      SELECT doc_id, norm_text, toks, lang, n_chars,
             head3 AS k0,
             concat_ws('#', lang, CAST(n_chars AS VARCHAR)) AS k1,
             tail3 AS k2
      FROM f),
    pairs AS (
      SELECT l.doc_id AS doc_id_l, r.doc_id AS doc_id_r, 0 AS match_key,
             l.norm_text AS norm_text_l, r.norm_text AS norm_text_r,
             l.toks AS toks_l, r.toks AS toks_r
      FROM keyed l JOIN keyed r ON l.k0 = r.k0 AND l.doc_id < r.doc_id
      UNION ALL
      SELECT l.doc_id, r.doc_id, 1,
             l.norm_text, r.norm_text, l.toks, r.toks
      FROM keyed l JOIN keyed r ON l.k1 = r.k1 AND l.doc_id < r.doc_id
      WHERE NOT coalesce(l.k0 = r.k0, FALSE)
      UNION ALL
      SELECT l.doc_id, r.doc_id, 2,
             l.norm_text, r.norm_text, l.toks, r.toks
      FROM keyed l JOIN keyed r ON l.k2 = r.k2 AND l.doc_id < r.doc_id
      WHERE NOT coalesce(l.k0 = r.k0, FALSE) AND NOT coalesce(l.k1 = r.k1, FALSE))
    SELECT * FROM pairs"""

  // ---- Fellegi-Sunter scoring -----------------------------------------
  // log2 prior odds with prior = 1e-3: log2(p/(1-p))
  private val PriorLog2 = "log2(0.001 / 0.999)"

  /** Spark-side score columns; mirrors the DuckDB SQL in duckScore. */
  private def scoreCols(df: DataFrame): DataFrame = {
    val jw = jaroWinkler(substring(col("norm_text_l"), 1, 80), substring(col("norm_text_r"), 1, 80))
    val bfText = when(col("norm_text_l") === col("norm_text_r"), lit(1024.0))
      .when(jw > 0.95, lit(128.0))
      .when(jw > 0.9, lit(32.0))
      .when(jw > 0.8, lit(4.0))
      .otherwise(lit(0.25))
    val jac = jaccard(array_distinct(col("toks_l")), array_distinct(col("toks_r")))
    val bfJac = when(jac >= 0.9, lit(256.0))
      .when(jac >= 0.7, lit(64.0))
      .when(jac >= 0.5, lit(16.0))
      .when(jac >= 0.3, lit(2.0))
      .otherwise(lit(0.125))
    val num1l = try_element_at(regexp_extract_all(col("norm_text_l"), lit("[0-9]+"), lit(0)), lit(1))
    val num1r = try_element_at(regexp_extract_all(col("norm_text_r"), lit("[0-9]+"), lit(0)), lit(1))
    val bfNum = when(num1l.isNull || num1r.isNull, lit(1.0))
      .when(num1l === num1r, lit(64.0))
      .otherwise(lit(0.0625))
    df.withColumn("match_weight",
        round(log2(lit(0.001) / lit(0.999)) + log2(bfText) + log2(bfJac) + log2(bfNum), 6))
      .withColumn("match_probability",
        round(pow(lit(2.0), col("match_weight")) / (lit(1.0) + pow(lit(2.0), col("match_weight"))), 8))
  }

  private val duckScore: String = s"""
    SELECT doc_id_l, doc_id_r, match_key,
      round($PriorLog2
        + log2(CASE WHEN norm_text_l = norm_text_r THEN 1024.0
                    WHEN jaro_winkler_similarity(substr(norm_text_l, 1, 80),
                                                 substr(norm_text_r, 1, 80)) > 0.95 THEN 128.0
                    WHEN jaro_winkler_similarity(substr(norm_text_l, 1, 80),
                                                 substr(norm_text_r, 1, 80)) > 0.9 THEN 32.0
                    WHEN jaro_winkler_similarity(substr(norm_text_l, 1, 80),
                                                 substr(norm_text_r, 1, 80)) > 0.8 THEN 4.0
                    ELSE 0.25 END)
        + log2(CASE WHEN jac >= 0.9 THEN 256.0 WHEN jac >= 0.7 THEN 64.0
                    WHEN jac >= 0.5 THEN 16.0 WHEN jac >= 0.3 THEN 2.0
                    ELSE 0.125 END)
        + log2(CASE WHEN num1_l IS NULL OR num1_r IS NULL THEN 1.0
                    WHEN num1_l = num1_r THEN 64.0 ELSE 0.0625 END), 6) AS match_weight
    FROM (
      SELECT *,
        len(list_intersect(list_distinct(toks_l), list_distinct(toks_r)))::DOUBLE /
          greatest(len(list_distinct(toks_l || toks_r)), 1) AS jac,
        regexp_extract_all(norm_text_l, '[0-9]+')[1] AS num1_l,
        regexp_extract_all(norm_text_r, '[0-9]+')[1] AS num1_r
      FROM pairs) p"""

  val defs: Seq[QueryDef] = Seq(
    // --- q26: blocking pair generation with match_key.
    QueryDef(
      "q26_blocking_pairs",
      (s, dir) => blockedPairs(s, dir).select("doc_id_l", "doc_id_r", "match_key"),
      Some(s"""
        WITH base AS ($duckBlockedPairs)
        SELECT doc_id_l, doc_id_r, match_key FROM base
      """)
    ),

    // --- q27: Fellegi-Sunter match weights on blocked pairs.
    QueryDef(
      "q27_fs_scores",
      (s, dir) => scoreCols(blockedPairs(s, dir))
        .select(col("doc_id_l"), col("doc_id_r"), col("match_key"),
          col("match_weight"), col("match_probability")),
      Some(s"""
        WITH pairs AS ($duckBlockedPairs),
        scored AS ($duckScore)
        SELECT doc_id_l, doc_id_r, match_key, match_weight,
               round(pow(2.0, match_weight) / (1.0 + pow(2.0, match_weight)), 8)
                 AS match_probability
        FROM scored
      """)
    ),

    // --- q28: best match per right-record with distinguishability
    // (reference: analyse_results.py:106-140 — rn=1 with tie-break on
    // doc_id_l, LEAD gap, category ladder).
    QueryDef(
      "q28_best_match",
      (s, dir) => {
        val scored = scoreCols(blockedPairs(s, dir))
          .select(col("doc_id_l"), col("doc_id_r"), col("match_weight"))
        val w = Window.partitionBy(col("doc_id_r"))
          .orderBy(col("match_weight").desc, col("doc_id_l").asc)
        val withWin = scored
          .withColumn("rn", row_number().over(w))
          .withColumn("distinguishability",
            round(col("match_weight") - lead(col("match_weight"), 1).over(w), 6))
          .withColumn("match_count", count(lit(1)).over(Window.partitionBy(col("doc_id_r"))))
        withWin.filter(col("rn") === 1)
          .withColumn("d_category",
            when(col("match_count") === 1, "01: one match only")
              .when(col("distinguishability").isNull, "05: nan")
              .when(col("distinguishability") > 10, "02: d > 10")
              .when(col("distinguishability") > 5, "03: d > 5")
              .when(col("distinguishability") > 0, "04: d > 0")
              .otherwise("06: d = 0"))
          .select(col("doc_id_r"), col("doc_id_l"), col("match_weight"),
            col("distinguishability"), col("match_count"), col("d_category"))
      },
      Some(s"""
        WITH pairs AS ($duckBlockedPairs),
        scored AS ($duckScore),
        win AS (
          SELECT doc_id_r, doc_id_l, match_weight,
            ROW_NUMBER() OVER (PARTITION BY doc_id_r
                               ORDER BY match_weight DESC, doc_id_l ASC) AS rn,
            round(match_weight - LEAD(match_weight) OVER (PARTITION BY doc_id_r
                               ORDER BY match_weight DESC, doc_id_l ASC), 6)
              AS distinguishability,
            COUNT(*) OVER (PARTITION BY doc_id_r) AS match_count
          FROM scored)
        SELECT doc_id_r, doc_id_l, match_weight, distinguishability, match_count,
          CASE WHEN match_count = 1 THEN '01: one match only'
               WHEN distinguishability IS NULL THEN '05: nan'
               WHEN distinguishability > 10 THEN '02: d > 10'
               WHEN distinguishability > 5 THEN '03: d > 5'
               WHEN distinguishability > 0 THEN '04: d > 0'
               ELSE '06: d = 0' END AS d_category
        FROM win WHERE rn = 1
      """)
    )
  )
}
