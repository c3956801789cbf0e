package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Sampling + bounded-blocking operators: deterministic hash sampling
  * (reproducible across engines, unlike ORDER BY RANDOM(); the reference
  * samples with RANDOM() — examples/example_matching.py:144-151 — which we
  * make deterministic by hashing, SURVEY.md §2.6) and sorted-neighborhood
  * pairing (the bounded alternative to dropping hot blocks).
  */
object SamplingQueries {
  import Tables.load

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q32_hash_sample",
      (s, dir) => {
        val d = load(s, dir, "documents")
        d.filter(portableHash64(col("doc_id").cast("string")) % 20 === 0)
          .select(col("doc_id"), col("lang"), col("n_chars"))
      },
      Some("""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 20 = 0
      """)
    ),

    QueryDef(
      "q33_sorted_neighborhood",
      (s, dir) => {
        val d = load(s, dir, "documents")
        graft.blocking.Blocking.sortedNeighborhoodPairs(
          d, "doc_id", col("lang"), col("n_chars"), windowSize = 2)
      },
      Some("""
        WITH ranked AS (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY n_chars ASC, doc_id ASC) AS rn
          FROM documents WHERE lang IS NOT NULL)
        SELECT DISTINCT least(l.doc_id, r.doc_id) AS doc_id_l,
               greatest(l.doc_id, r.doc_id) AS doc_id_r
        FROM ranked l JOIN ranked r
          ON l.lang = r.lang AND r.rn > l.rn AND r.rn <= l.rn + 2
      """)
    )
  )
}
