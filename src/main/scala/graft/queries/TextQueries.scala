package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Text-analysis operators over the `documents` table: tokenisation, token
  * histograms, TF tables, n-grams, language-ID heuristic, quality scoring,
  * token counting, fingerprinting (training-data-pipeline surface; also the
  * transcript-signature machinery re-expressed — reference:
  * cleaning/steps/tokenisation.py + term_frequencies.py).
  */
object TextQueries {
  import Tables.load

  /** Shared oracle fragment: DuckDB equivalent of GraftFunctions.normText +
    * tokens (upper, punct->space, collapse ws, trim, split on single space).
    */
  val duckToks: String =
    "string_split(trim(regexp_replace(regexp_replace(upper(text), '[[:punct:]]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"

  private def docToks(d: Column): Column = tokens(d)

  val stopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  val defs: Seq[QueryDef] = Seq(
    // --- q11: tokenisation + array ops (size, distinct, slice, reverse,
    // join — SURVEY §2.9 list-function surface).
    QueryDef(
      "q11_tokens_arrays",
      (s, dir) => {
        val d = load(s, dir, "documents")
        val toks = docToks(col("text"))
        d.select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct"),
          array_join(slice(toks, 1, 3), " ").as("first3"),
          array_join(reverse(slice(toks, 1, 3)), " ").as("first3_rev"),
          array_join(array_sort(array_distinct(slice(toks, 1, 10))), ",").as("sorted_first10"))
      },
      Some(s"""
        WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents)
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct,
               array_to_string(toks[1:3], ' ') AS first3,
               array_to_string(list_reverse(toks[1:3]), ' ') AS first3_rev,
               array_to_string(list_sort(list_distinct(toks[1:10])), ',') AS sorted_first10
        FROM t
      """)
    ),

    // --- q12: per-document token histogram, exploded to rows (reference
    // list_aggregate(arr,'histogram'), SURVEY §2.4 — exploded so the map is
    // order-independent for the compare).
    QueryDef(
      "q12_token_hist",
      (s, dir) => {
        val d = load(s, dir, "documents")
        d.select(col("doc_id"), explode(docToks(col("text"))).as("token"))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("cnt"))
      },
      Some(s"""
        SELECT doc_id, token, count(*) AS cnt
        FROM (SELECT doc_id, unnest($duckToks) AS token FROM documents) t
        GROUP BY doc_id, token
      """)
    ),

    // --- q13: corpus-level token relative-frequency table (reference:
    // cleaning/steps/term_frequencies.py:20-30 count(*)/sum(count(*)) OVER()).
    QueryDef(
      "q13_tf_table",
      (s, dir) => {
        val d = load(s, dir, "documents")
        val counted = d.select(explode(docToks(col("text"))).as("token"))
          .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        counted
          .withColumn("rel_freq", round(col("cnt") / sum(col("cnt")).over(Window.partitionBy()), 10))
          .filter(col("cnt") >= 3)
      },
      Some(s"""
        WITH tok AS (SELECT unnest($duckToks) AS token FROM documents),
        counted AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token)
        SELECT token, cnt, round(cnt / sum(cnt) OVER (), 10) AS rel_freq
        FROM counted WHERE cnt >= 3
      """)
    ),

    // --- q14: word bigrams + top-5 per lang (reference bigram machinery,
    // identify_distinguishing_tokens.py:164-191, as an n-gram query).
    QueryDef(
      "q14_bigrams_top",
      (s, dir) => {
        val d = load(s, dir, "documents")
        val bg = d.select(col("lang"), explode(wordNgrams(docToks(col("text")), 2)).as("bigram"))
          .groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("bigram").asc)
        bg.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      },
      Some(s"""
        WITH t AS (SELECT lang, $duckToks AS toks FROM documents),
        bg AS (
          SELECT lang, unnest(list_transform(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                 x -> x[1] || ' ' || x[2])) AS bigram
          FROM t WHERE len(toks) >= 2),
        counted AS (SELECT lang, bigram, count(*) AS cnt FROM bg GROUP BY lang, bigram)
        SELECT lang, bigram, cnt, rn FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram ASC) AS rn
          FROM counted) q
        WHERE rn <= 5
      """)
    ),

    // --- q15: rolling-hash document fingerprint (portable modular fold).
    QueryDef(
      "q15_fingerprint",
      (s, dir) => {
        val d = load(s, dir, "documents")
        d.select(col("doc_id"), rollingFingerprint(docToks(col("text"))).as("fingerprint"))
      },
      Some(s"""
        WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents)
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT), list_transform(toks,
                   tok -> CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT))),
                 (acc, h) -> (acc * 31 + h % 1000003) % 900719925474099) AS fingerprint
        FROM t
      """)
    ),

    // --- q21: n-gram-heuristic language ID: per-language stopword-set hit
    // ratio, argmax with deterministic tie-break.
    QueryDef(
      "q21_langid",
      (s, dir) => {
        val d = load(s, dir, "documents")
        val toks = docToks(lower(col("text")))
        // score per lang = fraction of tokens in that lang's marker set
        val markers: Map[String, Seq[String]] = Map(
          "en" -> Seq("THE", "A", "OF", "AND", "TO", "IS"),
          "fr" -> Seq("LE", "LA", "DE", "ET", "UN", "EST"),
          "es" -> Seq("EL", "LA", "DE", "Y", "UN", "ES"),
          "de" -> Seq("DER", "DIE", "DAS", "UND", "EIN", "IST"))
        def score(m: Seq[String]): Column =
          round(size(filter(toks, t => t.isin(m: _*))) / greatest(size(toks), lit(1)).cast("double"), 8)
        val scored = d.select(col("doc_id"), col("lang"),
          score(markers("en")).as("score_en"), score(markers("fr")).as("score_fr"),
          score(markers("es")).as("score_es"), score(markers("de")).as("score_de"))
        scored.withColumn("predicted_lang",
          when(col("score_en") >= col("score_fr") && col("score_en") >= col("score_es") &&
            col("score_en") >= col("score_de"), lit("en"))
            .when(col("score_fr") >= col("score_es") && col("score_fr") >= col("score_de"), lit("fr"))
            .when(col("score_es") >= col("score_de"), lit("es"))
            .otherwise(lit("de")))
      },
      Some(s"""
        WITH t AS (SELECT doc_id, lang, $duckToks AS toks FROM documents),
        scored AS (
          SELECT doc_id, lang,
            round(len(list_filter(toks, x -> list_contains(['THE','A','OF','AND','TO','IS'], x)))
              / greatest(len(toks), 1)::DOUBLE, 8) AS score_en,
            round(len(list_filter(toks, x -> list_contains(['LE','LA','DE','ET','UN','EST'], x)))
              / greatest(len(toks), 1)::DOUBLE, 8) AS score_fr,
            round(len(list_filter(toks, x -> list_contains(['EL','LA','DE','Y','UN','ES'], x)))
              / greatest(len(toks), 1)::DOUBLE, 8) AS score_es,
            round(len(list_filter(toks, x -> list_contains(['DER','DIE','DAS','UND','EIN','IST'], x)))
              / greatest(len(toks), 1)::DOUBLE, 8) AS score_de
          FROM t)
        SELECT *,
          CASE WHEN score_en >= score_fr AND score_en >= score_es AND score_en >= score_de THEN 'en'
               WHEN score_fr >= score_es AND score_fr >= score_de THEN 'fr'
               WHEN score_es >= score_de THEN 'es'
               ELSE 'de' END AS predicted_lang
        FROM scored
      """)
    ),

    // --- q22: document quality scoring (length / punctuation / stopword
    // ratios — training-data filtering surface).
    QueryDef(
      "q22_quality",
      (s, dir) => {
        val d = load(s, dir, "documents")
        val toks = docToks(col("text"))
        val nTok = greatest(size(toks), lit(1)).cast("double")
        d.select(
          col("doc_id"),
          length(col("text")).as("len_chars"),
          size(toks).as("n_tokens"),
          round(size(filter(toks, t => t.isin(stopwordsEn.map(_.toUpperCase): _*))) / nTok, 8)
            .as("stopword_ratio"),
          round((length(col("text")) -
            length(regexp_replace(col("text"), "[\\p{Punct}]", ""))).cast("double") /
            greatest(length(col("text")), lit(1)), 8).as("punct_ratio"),
          round(aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / nTok, 8)
            .as("mean_token_len"),
          (size(toks) >= 20 && size(array_distinct(toks)) / nTok > 0.3).as("quality_pass"))
      },
      Some(s"""
        WITH t AS (SELECT doc_id, text, $duckToks AS toks FROM documents)
        SELECT doc_id,
          length(text) AS len_chars,
          len(toks) AS n_tokens,
          round(len(list_filter(toks, x -> list_contains(['THE','A','OF','AND','TO','IN','IS','ON','FOR','WITH'], x)))
            / greatest(len(toks), 1)::DOUBLE, 8) AS stopword_ratio,
          round((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
            / greatest(length(text), 1), 8) AS punct_ratio,
          round(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> length(x)::BIGINT)),
            (a, b) -> a + b)::DOUBLE / greatest(len(toks), 1), 8) AS mean_token_len,
          (len(toks) >= 20 AND len(list_distinct(toks)) / greatest(len(toks), 1)::DOUBLE > 0.3)
            AS quality_pass
        FROM t
      """)
    ),

    // --- q23: token counting, whitespace + BPE-ish regex classes.
    QueryDef(
      "q23_token_count",
      (s, dir) => {
        val d = load(s, dir, "documents")
        d.select(
          col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
            .as("bpeish_tokens"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("numeric_tokens"))
      },
      Some("""
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpeish_tokens,
               len(regexp_extract_all(text, '[0-9]+')) AS numeric_tokens
        FROM documents
      """)
    ),

    // --- q38: custom typed UDAF — per-language token histogram by merging
    // per-document histMaps with graft.functions.HistMerge (map-side
    // combinable partial maps; SURVEY §2.4 custom-UDAF row). Oracle = the
    // plain unnest + GROUP BY, which must agree exactly.
    QueryDef(
      "q38_hist_udaf",
      (s, dir) => {
        val d = load(s, dir, "documents")
        d.select(col("lang"), histMap(tokens(col("text"))).as("h"))
          .groupBy(col("lang"))
          .agg(graft.functions.HistMerge(col("h")).as("h"))
          .select(col("lang"), explode(col("h")).as(Seq("token", "cnt")))
      },
      Some(s"""
        SELECT lang, token, count(*)::INT AS cnt
        FROM (SELECT lang, unnest($duckToks) AS token FROM documents) t
        GROUP BY lang, token
      """)
    ),

    // --- q39: LAG of ARRAYS — adjacent-record comparison in (lang, doc_id)
    // order: token-set jaccard vs the previous document plus the common-
    // suffix length of the token arrays (the reference's adjacent-records
    // suffix variant, token_parsing.py lag/lead of list columns).
    QueryDef(
      "q39_adjacent_suffix",
      (s, dir) => {
        val d = load(s, dir, "documents")
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id").asc)
        // two projections separated by the Window operator: toks/prev_toks
        // are ATTRIBUTES in the outer select, so the HOF lambdas below do
        // not re-inline the tokenisation regex chain per element
        val withPrev = d
          .select(col("lang"), col("doc_id"), docToks(col("text")).as("toks"))
          .withColumn("prev_toks", lag(col("toks"), 1).over(w))
        val a = col("toks")
        val b = col("prev_toks")
        val m = least(size(a), size(b))
        val suffixLen = aggregate(
          sequence(lit(1), m),
          struct(lit(true).as("ok"), lit(0).as("n")),
          (acc, i) =>
            when(acc.getField("ok") && element_at(a, -i) === element_at(b, -i),
              struct(lit(true).as("ok"), (acc.getField("n") + 1).as("n")))
              .otherwise(struct(lit(false).as("ok"), acc.getField("n").as("n"))),
          acc => acc.getField("n"))
        withPrev.select(
          col("lang"), col("doc_id"),
          size(col("toks")).as("n_tokens"),
          when(b.isNull, lit(null).cast("double"))
            .otherwise(round(jaccard(array_distinct(a), array_distinct(b)), 8))
            .as("jaccard_prev"),
          when(b.isNull, lit(null).cast("int"))
            .when(m === 0, lit(0))
            .otherwise(suffixLen).as("common_suffix_len"))
      },
      Some(s"""
        WITH t AS (SELECT lang, doc_id, $duckToks AS toks FROM documents),
        w AS (SELECT lang, doc_id, toks,
                     LAG(toks, 1) OVER (PARTITION BY lang ORDER BY doc_id ASC) AS prev_toks
              FROM t)
        SELECT lang, doc_id, len(toks) AS n_tokens,
               CASE WHEN prev_toks IS NULL THEN NULL
                    ELSE round(len(list_intersect(list_distinct(toks), list_distinct(prev_toks)))::DOUBLE /
                         greatest(len(list_distinct(toks || prev_toks)), 1), 8) END AS jaccard_prev,
               CASE WHEN prev_toks IS NULL THEN NULL
                    WHEN least(len(toks), len(prev_toks)) = 0 THEN 0
                    ELSE len(list_filter(range(1, least(len(toks), len(prev_toks)) + 1),
                         k -> toks[len(toks)-k+1:] = prev_toks[len(prev_toks)-k+1:])) END
                 AS common_suffix_len
        FROM w
      """)
    )
  )
}
