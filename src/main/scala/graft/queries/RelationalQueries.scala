package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.2-§2.7): aggregation, joins
  * (broadcast/semi/anti), windows (top-N, lead/lag), cube, set ops, string
  * scalars, sort/limit — each with a DuckDB oracle.
  *
  * Conventions for oracle parity: NO emitted doubles — money/ratio outputs
  * are integer-scaled BIGINTs (cents / e4 / e6; README "Oracle-parity
  * notes"); dates emitted as strings; every output deterministic including
  * tie-breaks.
  */
object RelationalQueries {
  import Tables.load

  val defs: Seq[QueryDef] = Seq(
    // --- q01: hash aggregate with multiple aggregates (ref: term_frequencies
    // count/sum pattern; SURVEY §2.4).
    QueryDef(
      "q01_agg_lineitem",
      (s, dir) => {
        val li = load(s, dir, "lineitem")
        // Integer-scaled outputs: emitting any rounded DOUBLE risks ulp-level
        // representation divergence between Spark (BigDecimal HALF_UP on the
        // exact binary expansion) and DuckDB (float-math round) even when the
        // decimal sums are exact — the q24/q30/q36 driver-hash class from
        // CORRECTNESS_r02. Money columns are 2-dp-exact, so cents (×100) and
        // basis-point (×1e4) BIGINTs are exact on both engines; ratios use the
        // shared round-half-up identity (2a+b) div (2b).
        val revenue = col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))
        li.filter(col("l_quantity") > 5)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            (sum(col("l_quantity").cast("decimal(20,2)")) * 100).cast("long").as("sum_qty_c"),
            (sum(revenue) * 10000).cast("long").as("revenue_e4"),
            (sum(col("l_discount").cast("decimal(20,2)")) * 100).cast("long").as("disc_c"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty_c"), col("revenue_e4"),
            // avg_disc at 6 dp, scaled 1e6: disc_c/100/n * 1e6 = disc_c*1e4/n, half-up
            expr("(2 * disc_c * 10000 + n) div (2 * n)").as("avg_disc_e6"),
            col("n"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) * 100 AS BIGINT) AS sum_qty_c,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) * 10000 AS BIGINT)
                 AS revenue_e4,
               CAST((2 * CAST(sum(CAST(l_discount AS DECIMAL(20,2))) * 100 AS BIGINT) * 10000
                     + count(*)) // (2 * count(*)) AS BIGINT) AS avg_disc_e6,
               count(*) AS n
        FROM lineitem WHERE l_quantity > 5
        GROUP BY l_returnflag, l_linestatus
      """)
    ),

    // --- q02: multi-way join with broadcast dims + filter/projection
    // pushdown (SURVEY §2.3 enrichment joins).
    QueryDef(
      "q02_join_revenue_by_nation",
      (s, dir) => {
        val li = load(s, dir, "lineitem")
        val o = load(s, dir, "orders")
        val c = load(s, dir, "customer")
        val n = load(s, dir, "nation")
        val r = load(s, dir, "region")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .filter(col("o_orderstatus") === "F")
          .groupBy(col("r_name"), col("n_name"))
          .agg((sum(col("l_extendedprice").cast("decimal(12,2)") *
              (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
              * 10000).cast("long").as("revenue_e4"),
            count(lit(1)).as("n_lines"))
      },
      Some("""
        SELECT r_name, n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) * 10000 AS BIGINT)
                 AS revenue_e4,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderstatus = 'F'
        GROUP BY r_name, n_name
      """)
    ),

    // --- q03: left-semi join (ref: input_filters.py semi-join reduction).
    QueryDef(
      "q03_semi_join",
      (s, dir) => {
        val c = load(s, dir, "customer")
        val o = load(s, dir, "orders").filter(col("o_totalprice") > 100000)
        c.join(o.select("o_custkey").distinct(), col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      """)
    ),

    // --- q04: left-anti join (ref: matching_stages.py:173-183 carry-forward
    // of unmatched records).
    QueryDef(
      "q04_anti_join",
      (s, dir) => {
        val c = load(s, dir, "customer")
        val o = load(s, dir, "orders").filter(col("o_orderstatus") === "O")
        c.join(o.select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      """)
    ),

    // --- q05: top-N per group via row_number with deterministic tie-break
    // (ref: identify_distinguishing_tokens.py:47-56 QUALIFY <= 5).
    QueryDef(
      "q05_topn_per_group",
      (s, dir) => {
        val o = load(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        // price emitted as exact cents (never a rounded DOUBLE — r2 ulp class)
        o.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"),
            (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("o_totalprice_c"),
            col("rn"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS o_totalprice_c, rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders) t
        WHERE rn <= 3
      """)
    ),

    // --- q06: lead/lag over ordered partitions (ref:
    // analyse_results.py:119-127 distinguishability via LEAD).
    QueryDef(
      "q06_lead_lag",
      (s, dir) => {
        val o = load(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        o.select(
          col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          datediff(lead(col("o_orderdate"), 1).over(w), col("o_orderdate"))
            .as("days_to_next"),
          lag((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"), 1).over(w)
            .as("prev_price_c"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                 CAST(LEAD(o_orderdate, 1) OVER w AS DATE)) AS INT) AS days_to_next,
               LAG(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT), 1) OVER w
                 AS prev_price_c
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      """)
    ),

    // --- q07: CUBE rollup (ref: accuracy_from_labels.py:352-368).
    QueryDef(
      "q07_cube",
      (s, dir) => {
        val o = load(s, dir, "orders")
        o.cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            (sum(col("o_totalprice").cast("decimal(20,2)")) * 100).cast("long").as("total_c"))
          .select(
            coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
            coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
            col("n"), col("total_c"))
      },
      Some("""
        SELECT coalesce(o_orderstatus, '<all>') AS status,
               coalesce(o_orderpriority, '<all>') AS priority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) * 100 AS BIGINT) AS total_c
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      """)
    ),

    // --- q08: set operations union-all / except (ref:
    // match_candidate_selection.py:108-130 union + NOT IN).
    QueryDef(
      "q08_setops",
      (s, dir) => {
        val o = load(s, dir, "orders")
        val hi = o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
        val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        hi.distinct().withColumn("tag", lit("high_value"))
          .unionByName(urgent.distinct().withColumn("tag", lit("urgent")))
          .unionByName(hi.except(urgent).withColumn("tag", lit("high_not_urgent")))
      },
      Some("""
        SELECT DISTINCT o_custkey, 'high_value' AS tag FROM orders WHERE o_totalprice > 150000
        UNION ALL
        SELECT DISTINCT o_custkey, 'urgent' AS tag FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_custkey, 'high_not_urgent' AS tag FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000
          EXCEPT
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') t
      """)
    ),

    // --- q09: string scalar functions incl. levenshtein (ref: cleaning
    // regex/scalar audit, SURVEY §2.8).
    QueryDef(
      "q09_string_scalars",
      (s, dir) => {
        val p = load(s, dir, "part")
        p.select(
          col("p_partkey"),
          upper(trim(col("p_name"))).as("name_upper"),
          regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("type_first_word"),
          substring(col("p_brand"), 1, 5).as("brand_prefix"),
          levenshtein(col("p_brand"), lit("Brand#35")).as("lev_to_brand35"),
          length(col("p_name")).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          reverse(col("p_brand")).as("brand_rev"))
      },
      Some("""
        SELECT p_partkey,
               upper(trim(p_name)) AS name_upper,
               coalesce(regexp_extract(p_type, '^([A-Z]+)', 1), '') AS type_first_word,
               substr(p_brand, 1, 5) AS brand_prefix,
               levenshtein(p_brand, 'Brand#35') AS lev_to_brand35,
               length(p_name) AS name_len,
               concat_ws('|', p_brand, p_type) AS brand_type,
               reverse(p_brand) AS brand_rev
        FROM part
      """)
    ),

    // --- q10: global sort + limit with total tie-break determinism (ref:
    // SURVEY §2.6).
    QueryDef(
      "q10_sort_limit",
      (s, dir) => {
        val li = load(s, dir, "lineitem")
        li.orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
          .limit(20)
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
              .as("l_extendedprice_c"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS l_extendedprice_c
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 20
      """)
    ),

    // --- q30: GROUPING SETS with grouping() id (ref:
    // benchmarking/analysis/accuracy.py:29-66 per-reason + OVERALL rows).
    QueryDef(
      "q30_grouping_sets",
      (s, dir) => {
        val d = load(s, dir, "documents")
        // All-integer avg-of-avg: per-group mean chars at 4 dp scaled 1e4
        // ((2·1e4·sum + n) div 2n = round-half-up), then the outer mean of
        // those integers — no DOUBLE ever emitted, so Spark and DuckDB agree
        // bit-for-bit (the CORRECTNESS_r02 ulp class).
        d.groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
          .withColumn("avg_chars_e4", expr("(20000 * sum_chars + n) div (2 * n)"))
          .groupingSets(Seq(Seq(col("lang")), Seq(col("source")), Seq()), col("lang"), col("source"))
          .agg(sum(col("n")).as("n_docs"),
            sum(col("avg_chars_e4")).as("sum_avg_e4"),
            count(col("avg_chars_e4")).as("n_groups"))
          .select(
            coalesce(col("lang"), lit("<all>")).as("lang"),
            coalesce(col("source"), lit("<all>")).as("source"),
            col("n_docs"),
            expr("(2 * sum_avg_e4 + n_groups) div (2 * n_groups)").as("avg_of_avg_e4"))
      },
      Some("""
        WITH base AS (
          SELECT lang, source, count(*) AS n,
                 CAST((20000 * sum(n_chars) + count(*)) // (2 * count(*)) AS BIGINT)
                   AS avg_chars_e4
          FROM documents GROUP BY lang, source)
        SELECT coalesce(lang, '<all>') AS lang,
               coalesce(source, '<all>') AS source,
               CAST(sum(n) AS BIGINT) AS n_docs,
               CAST((2 * sum(avg_chars_e4) + count(avg_chars_e4))
                    // (2 * count(avg_chars_e4)) AS BIGINT) AS avg_of_avg_e4
        FROM base GROUP BY GROUPING SETS ((lang), (source), ())
      """)
    ),

    // --- q41: GLOBAL-ORDER row_number WITHOUT a single-partition window —
    // the scale-safe form of the reference's global-sort surrogate-id
    // window (SURVEY §2.5 flags `ROW_NUMBER() OVER (ORDER BY ...)` as THE
    // scale hazard: Spark's WindowExec with no PARTITION BY moves every row
    // to one partition). Pattern: range-repartition on the sort key (total
    // order across partitions), rank within each partition, then add
    // per-partition offsets (prefix sums of partition counts — driver-side
    // state bounded by the PARTITION COUNT, not the row count). Output is
    // invariant to the sampled range bounds.
    QueryDef(
      "q41_global_rownum",
      (s, dir) => {
        val d = load(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        // eager localCheckpoint pins ONE materialised partition assignment:
        // the counts pass and the ranking pass must see identical ranges
        val pinned = d.repartitionByRange(8, col("n_chars").desc, col("doc_id").asc)
          .withColumn("__pid", spark_partition_id())
          .localCheckpoint(true)
        val counts = pinned.groupBy(col("__pid")).count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        var acc = 0L
        val offsets = counts.map { case (pid, n) => val o = (pid, acc); acc += n; o }
        import s.implicits._
        val offsetDf = broadcast(offsets.toSeq.toDF("__pid", "__offset"))
        val w = Window.partitionBy(col("__pid"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)
        pinned.withColumn("__rn", row_number().over(w))
          .join(offsetDf, Seq("__pid"))
          .select(col("doc_id"), col("n_chars"),
            (col("__rn") + col("__offset")).cast("long").as("global_rank"))
      },
      Some("""
        SELECT doc_id, n_chars,
               CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) AS BIGINT)
                 AS global_rank
        FROM documents
      """)
    )
  )
}
