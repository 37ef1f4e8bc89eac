package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import graft.operators.{AsOfJoin, RangeJoin, SaltedAgg}

/** Relational analogs of the reference's query surface, expressed over the
  * driver testdata. Each query mirrors one operator family from SURVEY.md §2:
  * filters (§2.3), point-lookup / range / merge joins (§2.4), aggregations
  * (§2.5), derived-key projections (§2.2), set ops (§2.8), scalar functions
  * (§2.9).
  *
  * Oracle-parity rules used throughout (DuckDB hash-compare):
  *  - NEVER emit DECIMAL result columns. The driver's hash distinguishes
  *    decimals even at identical declared width/scale (round-2 lesson:
  *    every DECIMAL(38,2)-output query failed hash with values and declared
  *    types equal, while every BIGINT/DOUBLE output passed). Money inputs
  *    sit on an exact 2-decimal grid, so sums run on integer cents
  *    (round(x*100) as BIGINT) and present as DOUBLE via one exact
  *    int->double conversion + one division — bit-identical across engines;
  *  - double aggregates that would be summation-order-dependent are instead
  *    computed as integer aggregates or single divisions of exact integers;
  *  - every LIMIT / row_number has a total (tie-free) ordering.
  */
object Relational extends QueryModule {

  /** Exact integer cents from a 2-decimal money DOUBLE. */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  /** Present an integer-cents sum as DOUBLE units (exact conversion, one
    * correctly-rounded division — deterministic on both engines). */
  private def asUnits(c: Column, scale: Double = 100.0): Column =
    c.cast("double") / scale

  // --- q01: grouped multi-aggregate fusion (SURVEY §2.5 seqGetAF_AC_Missing:
  // several aggregates over one scan, map-side partial agg). ---------------
  private val q01 = Q("q01_agg_pricing",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          asUnits(sum(cents(col("l_quantity")))).as("sum_qty"),
          asUnits(sum(cents(col("l_extendedprice")))).as("sum_base_price"),
          asUnits(sum(cents(col("l_extendedprice")) *
              (lit(100L) - cents(col("l_discount")))), 10000.0)
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS sum_qty,
      CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        / 100.0 AS sum_base_price,
      CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) *
          (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
        / 10000.0 AS sum_disc_price,
      COUNT(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus"""))

  // --- q02: id-set membership filter (SURVEY §2.3 seqSetFilter(variant.id=)).
  // At scale: broadcast left-semi join against the id list, no shuffle of the
  // fact side. -------------------------------------------------------------
  private val q02 = Q("q02_filter_ids",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val ids = Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 997 === 0)
        .select(col("o_orderkey"))
      li.join(broadcast(ids), li("l_orderkey") === ids("o_orderkey"),
          "left_semi")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_orderkey IN
        (SELECT o_orderkey FROM orders WHERE o_orderkey % 997 = 0)"""))

  // --- q03: chrom+range filter with a union of disjoint intervals (SURVEY
  // §2.3 seqSetFilterChrom / CRangeSet). Partition-prunable when the table is
  // partitioned by the category column. ------------------------------------
  private val q03 = Q("q03_filter_range",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.filter(col("l_returnflag").isin("A", "R") &&
          (col("l_shipdate").between("1994-01-01", "1994-06-30 23:59:59") ||
           col("l_shipdate").between("1996-01-01", "1996-06-30 23:59:59")))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          asUnits(sum(cents(col("l_quantity")))).as("sum_qty"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n_rows,
      CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS sum_qty
      FROM lineitem
      WHERE l_returnflag IN ('A','R') AND (
        (l_shipdate BETWEEN TIMESTAMP '1994-01-01'
                        AND TIMESTAMP '1994-06-30 23:59:59') OR
        (l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                        AND TIMESTAMP '1996-06-30 23:59:59'))
      GROUP BY l_returnflag"""))

  // --- q04: point-lookup join on a composite key (SURVEY §2.3/§2.4
  // seqSetFilterPos: probe list ⨝ variants on (chrom,pos[,ref,alt])).
  // Probe side is small → broadcast hash join. ------------------------------
  private val q04 = Q("q04_point_lookup",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val probes = li.filter(col("l_orderkey") % 211 === 0)
        .select(col("l_orderkey").as("p_ok"), col("l_linenumber").as("p_ln"))
        .distinct()
      li.join(broadcast(probes),
          col("l_orderkey") === col("p_ok") &&
          col("l_linenumber") === col("p_ln"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
    },
    Some("""SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice
      FROM lineitem l
      JOIN (SELECT DISTINCT l_orderkey AS p_ok, l_linenumber AS p_ln
            FROM lineitem WHERE l_orderkey % 211 = 0) p
        ON l.l_orderkey = p.p_ok AND l.l_linenumber = p.p_ln"""))

  // --- q05: filter by computed aggregate (SURVEY §2.3 seqSetFilterCond:
  // two-phase — aggregate, then threshold). Decimal compare keeps the
  // threshold exact (mean qty >= 30 without a double division). -------------
  private val q05 = Q("q05_filter_cond",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_quantity"))).as("__qc"))
        .filter(col("__qc") >= col("n") * 3000)
        .select(col("l_partkey"), col("n"),
          asUnits(col("__qc")).as("sum_qty"))
    },
    Some("""SELECT l_partkey, COUNT(*) AS n,
      CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS sum_qty
      FROM lineitem GROUP BY l_partkey
      HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT))
        >= COUNT(*) * 3000"""))

  // --- q06: derived join keys + duplicate suffix (SURVEY §2.2 $chrom_pos /
  // $chrom_pos2: concat key plus row_number over the key). ------------------
  private val q06 = Q("q06_derived_keys",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val w = Window
        .partitionBy(col("l_returnflag"), to_date(col("l_shipdate")))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
      li.withColumn("dup_seq", row_number().over(w))
        .select(
          concat_ws(":", col("l_returnflag"),
            date_format(col("l_shipdate"), "yyyy-MM-dd")).as("key"),
          col("l_orderkey"), col("l_linenumber"), col("dup_seq"))
    },
    Some("""SELECT l_returnflag || ':' || strftime(l_shipdate, '%Y-%m-%d')
        AS key,
      l_orderkey, l_linenumber,
      ROW_NUMBER() OVER (
        PARTITION BY l_returnflag, CAST(l_shipdate AS DATE)
        ORDER BY l_orderkey, l_linenumber) AS dup_seq
      FROM lineitem"""))

  // --- q07: two-dataset merge via full outer join on a shared key (SURVEY
  // §2.4 seqMerge variant-union mode: align on key, NA-fill the missing
  // side). ------------------------------------------------------------------
  private val q07 = Q("q07_merge_outer",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      val a = o.filter(col("o_orderdate") < "1995-07-01")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_early"))
      val b = o.filter(col("o_orderdate") >= "1995-07-01")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_late"))
      a.join(b, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("n_early"), lit(0L)).as("n_early"),
          coalesce(col("n_late"), lit(0L)).as("n_late"))
    },
    Some("""SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
      COALESCE(a.n_early, 0) AS n_early, COALESCE(b.n_late, 0) AS n_late
      FROM
        (SELECT o_custkey, COUNT(*) AS n_early FROM orders
         WHERE o_orderdate < TIMESTAMP '1995-07-01' GROUP BY o_custkey) a
      FULL OUTER JOIN
        (SELECT o_custkey, COUNT(*) AS n_late FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-07-01' GROUP BY o_custkey) b
      ON a.o_custkey = b.o_custkey"""))

  // --- q08: banded interval join (SURVEY §2.4 GRanges containment). The
  // RangeJoin operator turns the non-equi predicate into an equi-join on a
  // band key — see operators/RangeJoin.scala. -------------------------------
  private val q08 = Q("q08_range_join",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val iv = Tables(s, dir, "part")
        .filter(col("p_partkey") % 40 === 0)
        .select(col("p_partkey").as("iv_id"),
          (col("p_size") * 100L).cast("long").as("lo"),
          (col("p_size") * 100L + 800L).cast("long").as("hi"))
      RangeJoin.pointInInterval(
          li.select(col("l_extendedprice")), col("l_extendedprice"),
          iv, col("lo"), col("hi"), bandWidth = 800L)
        .groupBy(col("iv_id"))
        .agg(count(lit(1)).as("n_hits"))
    },
    Some("""SELECT p.p_partkey AS iv_id, COUNT(*) AS n_hits
      FROM (SELECT p_partkey, p_size * 100 AS lo, p_size * 100 + 800 AS hi
            FROM part WHERE p_partkey % 40 = 0) p
      JOIN lineitem l
        ON l.l_extendedprice >= p.lo AND l.l_extendedprice < p.hi
      GROUP BY p.p_partkey"""))

  // --- q09: event-time range window (SURVEY §2.6 sliding windows:
  // per-partition ordered range frame). Sums are over exact integers
  // (floor(value*1000)) so frame-internal order cannot change the result. ---
  private val q09 = Q("q09_window_range",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("epoch_s"))
        .rangeBetween(-3600, Window.currentRow)
      // ts arrives as long nanos (see Tables); integer div keeps it exact —
      // double division would lose precision at 1e18 magnitudes.
      ev.select(col("user_id"), col("event_id"),
          expr("ts div 1000000000").as("epoch_s"),
          floor(col("value") * 1000).cast("long").as("value_mil"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", sum(col("value_mil")).over(w))
        .drop("value_mil")
    },
    Some("""SELECT user_id, event_id, epoch_s,
      COUNT(*) OVER w AS n_1h,
      CAST(SUM(value_mil) OVER w AS BIGINT) AS sum_1h
      FROM (SELECT user_id, event_id,
              epoch_ns(ts) // 1000000000 AS epoch_s,
              CAST(floor(value * 1000) AS BIGINT) AS value_mil
            FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)"""))

  // --- q10: top-k with total ordering (SURVEY §2.7 — the reference has no
  // ORDER BY/LIMIT; Spark's TakeOrderedAndProject does this without a full
  // sort). ------------------------------------------------------------------
  private val q10 = Q("q10_topk",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"""))

  // --- q11: set operations on key sets (SURVEY §2.8 — filter intersect /
  // unit merge & setdiff). --------------------------------------------------
  private val q11 = Q("q11_setops",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      val a = o.filter(col("o_orderdate") < "1995-07-01")
        .select(col("o_custkey")).distinct()
      val b = o.filter(col("o_orderdate") >= "1995-07-01")
        .select(col("o_custkey")).distinct()
      a.intersect(b).withColumn("tag", lit("both"))
        .unionByName(a.except(b).withColumn("tag", lit("only_early")))
    },
    Some("""SELECT o_custkey, 'both' AS tag FROM
        (SELECT o_custkey FROM orders
         WHERE o_orderdate < TIMESTAMP '1995-07-01'
         INTERSECT
         SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-07-01')
      UNION ALL
      SELECT o_custkey, 'only_early' AS tag FROM
        (SELECT o_custkey FROM orders
         WHERE o_orderdate < TIMESTAMP '1995-07-01'
         EXCEPT
         SELECT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1995-07-01')"""))

  // --- q12: scalar string functions (SURVEY §2.9 — split / regexp_replace /
  // concat keys / substring, all codegen'd builtins). -----------------------
  private val q12 = Q("q12_scalar_fns",
    (s, dir) => {
      val p = Tables(s, dir, "part")
      p.select(col("p_partkey"),
        size(split(col("p_name"), " ")).as("n_words"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_replace(col("p_type"), "[aeiou]", "").as("consonants"),
        concat_ws(":", col("p_brand"), col("p_size")).as("brand_key"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        upper(col("p_brand")).as("brand_uc"))
    },
    Some("""SELECT p_partkey,
      len(string_split(p_name, ' ')) AS n_words,
      string_split(p_name, ' ')[1] AS first_word,
      regexp_replace(p_type, '[aeiou]', '', 'g') AS consonants,
      concat_ws(':', p_brand, p_size) AS brand_key,
      substring(p_name, 1, 5) AS prefix5,
      upper(p_brand) AS brand_uc
      FROM part"""))

  // --- q13: grouped tabulation over a categorical + exact-integer stats
  // (SURVEY §2.5 chromosome/allele tabulation) plus a JSON-ish scalar
  // extract (props is a JSON string; regexp keeps both engines in builtins).
  private val q13 = Q("q13_tabulate_events",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      ev.select(col("event_type"),
          floor(col("value") * 1000).cast("long").as("value_mil"),
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long")
            .as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value_mil")).as("sum_value_mil"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          sum(col("k")).as("sum_k"))
    },
    Some("""SELECT event_type, COUNT(*) AS n,
      CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
        AS sum_value_mil,
      MIN(k) AS min_k, MAX(k) AS max_k,
      CAST(SUM(k) AS BIGINT) AS sum_k
      FROM (SELECT event_type, value,
              CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k
            FROM events)
      GROUP BY event_type"""))

  // --- q14: multi-table star join with broadcast dims (SURVEY §2.4 —
  // the samples-table join pattern: small dims broadcast, fact never
  // re-shuffled for the dim join). ------------------------------------------
  private val q14 = Q("q14_star_join",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      val o = Tables(s, dir, "orders")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          asUnits(sum(cents(col("o_totalprice")))).as("sum_price"))
    },
    Some("""SELECT r_name, n_name, COUNT(*) AS n_orders,
      CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS sum_price
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name"""))

  // --- q15: hierarchical ROLLUP aggregation (absent in the reference —
  // SURVEY §2.5 "built-in when we need them"; part of a complete engine
  // surface). ---------------------------------------------------------------
  private val q15 = Q("q15_rollup",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          asUnits(sum(cents(col("l_quantity")))).as("sum_qty"))
    },
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""))

  // --- q16: anti join (SURVEY §2.4 notes semi/anti absent in the
  // reference; the complement of the q02 membership filter). ---------------
  private val q16 = Q("q16_anti_join",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate").between("1995-01-01",
          "1995-12-31 23:59:59"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_nationkey"))
    },
    Some("""SELECT c_custkey, c_nationkey FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                                AND TIMESTAMP '1995-12-31 23:59:59')"""))

  // --- q17: as-of join (brief's custom-operator example; DuckDB's native
  // ASOF JOIN is the oracle). Each event picks up the latest prior "mark"
  // of its user via one keyed window — see operators/AsOfJoin.scala. -------
  private val q17 = Q("q17_asof_join",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000000000").as("epoch_s"))
      val marks = Tables(s, dir, "events")
        .filter(col("event_id") % 37 === 0)
        .select(col("user_id").as("m_user"),
          expr("ts div 1000000000").as("m_t"),
          floor(col("value") * 1000).cast("long").as("m_val"))
        .groupBy(col("m_user"), col("m_t"))
        .agg(min(col("m_val")).as("mark_val"))
      AsOfJoin.lastPrior(
        ev, col("user_id"), col("epoch_s"),
        marks, col("m_user"), col("m_t"),
        Seq("mark_val" -> col("mark_val"), "mark_t" -> col("m_t")))
    },
    Some("""SELECT l.user_id, l.event_id, l.epoch_s, r.mark_val, r.m_t AS mark_t
      FROM (SELECT user_id, event_id,
              epoch_ns(ts) // 1000000000 AS epoch_s FROM events) l
      ASOF LEFT JOIN
        (SELECT m_user, m_t, MIN(m_val) AS mark_val
         FROM (SELECT user_id AS m_user, epoch_ns(ts) // 1000000000 AS m_t,
                 CAST(floor(value * 1000) AS BIGINT) AS m_val
               FROM events WHERE event_id % 37 = 0)
         GROUP BY m_user, m_t) r
      ON l.user_id = r.m_user AND l.epoch_s >= r.m_t"""))

  // --- q18: analytic window functions (absent in the reference, SURVEY
  // §2.6 — "ranking/analytic window functions: absent"; part of a complete
  // engine surface). Total ordering makes every function deterministic. ----
  private val q18 = Q("q18_analytic_windows",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("seq"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        ntile(4).over(w).as("quartile"),
        first(col("o_orderkey")).over(w).as("first_order"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      ROW_NUMBER() OVER w AS seq,
      LAG(o_orderkey, 1) OVER w AS prev_order,
      LEAD(o_orderkey, 1) OVER w AS next_order,
      NTILE(4) OVER w AS quartile,
      FIRST_VALUE(o_orderkey) OVER w AS first_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)"""))

  // --- q19: skew-safe salted aggregation (brief: "salting for skew").
  // l_returnflag has 3 heavy keys; the salted two-stage plan splits each
  // into 16 parallel sub-aggregations — see operators/SaltedAgg.scala. The
  // oracle is the plain GROUP BY, proving the decomposition is exact. ------
  private val q19 = Q("q19_salted_agg",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      SaltedAgg.sumCountByKey(li, col("l_returnflag"), col("l_orderkey"),
          cents(col("l_quantity")), salts = 16)
        .withColumn("sum_value", asUnits(col("sum_value")))
    },
    Some("""SELECT l_returnflag AS key,
      CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS sum_value,
      COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag"""))

  // --- q138: batch sessionization (the gaps-and-islands twin of the
  // streaming sessionizer in streaming/EventStream): per user, ordered
  // events split into sessions at >30 min silence; per session the
  // event count, bounds, duration, and exact milli-value sum. One
  // (user_id) exchange serves the lag window, the running sum, and the
  // aggregation — parallelism grows with users. ------------------------
  private val SESSION_GAP_S = 1800L
  private val q138 = Q("q138_sessionize",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000000000").as("epoch_s"),
          floor(col("value") * 1000).cast("long").as("value_mil"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("epoch_s"), col("event_id"))
      ev
        .withColumn("start",
          coalesce(col("epoch_s") - lag(col("epoch_s"), 1).over(w)
            > SESSION_GAP_S, lit(true)))
        .withColumn("sid",
          sum(when(col("start"), 1L).otherwise(0L)).over(w))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          min(col("epoch_s")).as("start_s"),
          max(col("epoch_s")).as("end_s"),
          sum(col("value_mil")).as("sum_mil"))
        .withColumn("duration_s", col("end_s") - col("start_s"))
    },
    Some(s"""SELECT user_id, sid, COUNT(*) AS n_events,
      CAST(MIN(epoch_s) AS BIGINT) AS start_s,
      CAST(MAX(epoch_s) AS BIGINT) AS end_s,
      CAST(SUM(value_mil) AS BIGINT) AS sum_mil,
      CAST(MAX(epoch_s) - MIN(epoch_s) AS BIGINT) AS duration_s
      FROM (SELECT user_id, epoch_s, value_mil,
          CAST(SUM(CASE WHEN strt THEN 1 ELSE 0 END) OVER w2 AS BIGINT)
            AS sid
        FROM (SELECT user_id, event_id, epoch_s, value_mil,
            COALESCE(epoch_s - LAG(epoch_s, 1)
              OVER (PARTITION BY user_id ORDER BY epoch_s, event_id)
              > $SESSION_GAP_S, TRUE) AS strt
          FROM (SELECT user_id, event_id,
              epoch_ns(ts) // 1000000000 AS epoch_s,
              CAST(floor(value * 1000) AS BIGINT) AS value_mil
            FROM events))
        WINDOW w2 AS (PARTITION BY user_id ORDER BY epoch_s, event_id))
      GROUP BY user_id, sid"""))

  // --- q139: ordered funnel (view → click → purchase): per user the
  // earliest time each stage is reached IN ORDER (stage k counts only
  // after stage k−1's time). Three conditional-min aggregations chained
  // through user-keyed joins — each side is one row per user, so the
  // exchanges carry users, never events; no window over the event
  // stream. Nanos stay integral end to end. ----------------------------
  private val q139 = Q("q139_funnel",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val t1 = ev.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"))
      val t2 = ev.join(t1, Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "click"
          && col("ts") > col("t1"), col("ts"))).as("t2"))
      val t3 = ev.join(t2, Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "purchase"
          && col("ts") > col("t2"), col("ts"))).as("t3"))
      t1.join(t2, Seq("user_id")).join(t3, Seq("user_id"))
        .withColumn("stage",
          when(col("t3").isNotNull, 3)
            .when(col("t2").isNotNull, 2)
            .when(col("t1").isNotNull, 1).otherwise(0))
    },
    Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts
        FROM events),
      s1 AS (SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
        FROM e GROUP BY user_id),
      s2 AS (SELECT e.user_id,
          MIN(CASE WHEN event_type = 'click' AND e.ts > t1 THEN e.ts END)
            AS t2
        FROM e JOIN s1 ON e.user_id = s1.user_id GROUP BY e.user_id),
      s3 AS (SELECT e.user_id,
          MIN(CASE WHEN event_type = 'purchase' AND e.ts > t2 THEN e.ts END)
            AS t3
        FROM e JOIN s2 ON e.user_id = s2.user_id GROUP BY e.user_id)
      SELECT user_id, t1, t2, t3,
        CASE WHEN t3 IS NOT NULL THEN 3
             WHEN t2 IS NOT NULL THEN 2
             WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
      FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)"""))

  // --- q140: retention cohorts: users cohorted by first-activity day,
  // counted per day offset — two map-side-combined aggregations, exact
  // integer day arithmetic. --------------------------------------------
  private val q140 = Q("q140_retention",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      val first = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      ev.join(first, Seq("user_id"))
        .select(col("user_id"), col("cohort_day"),
          (col("day") - col("cohort_day")).as("offset"))
        .distinct()
        .groupBy(col("cohort_day"), col("offset"))
        .agg(count(lit(1)).as("n_users"))
    },
    Some("""WITH e AS (SELECT user_id,
          epoch_ns(ts) // 86400000000000 AS ed
        FROM events),
      f AS (SELECT user_id, MIN(ed) AS cohort_day FROM e
        GROUP BY user_id),
      a AS (SELECT DISTINCT e.user_id, cohort_day,
          ed - cohort_day AS "offset"
        FROM e JOIN f ON e.user_id = f.user_id)
      SELECT cohort_day, "offset", COUNT(*) AS n_users
      FROM a GROUP BY cohort_day, "offset""""))

  // --- hourly anomaly flagging over the event stream (the ops-dashboard
  // "hot hour" detector): per (event_type, hour) exact counts, flagged
  // when an hour carries more than HOT_X times its type's mean hourly
  // load — the gate is integer cross-multiplication (n·n_hours >
  // HOT_X·type_total), so it replays engine-exact where a double mean
  // would drift. Two partial-aggregated exchanges (hour grid, then the
  // tiny per-type totals broadcast back); nanos stay integral. ----------
  private val HOT_X = 3

  private val q154 = Q("q154_event_anomaly",
    (s, dir) => {
      val hourly = Tables(s, dir, "events")
        .select(col("event_type"),
          expr("(ts div 1000000000) div 3600").as("hour"))
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"))
      val totals = hourly.groupBy(col("event_type"))
        .agg(sum(col("n")).as("type_total"),
          count(lit(1)).as("n_hours"))
      hourly.join(broadcast(totals), "event_type")
        .select(col("event_type"), col("hour"), col("n"),
          col("type_total"), col("n_hours"),
          (col("n") * col("n_hours") > lit(HOT_X) * col("type_total"))
            .as("hot"))
    },
    Some(s"""WITH h AS (SELECT event_type,
          (epoch_ns(ts) // 1000000000) // 3600 AS hour,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
      t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS type_total,
          CAST(COUNT(*) AS BIGINT) AS n_hours
        FROM h GROUP BY 1)
      SELECT h.event_type, h.hour, h.n, t.type_total, t.n_hours,
        h.n * t.n_hours > $HOT_X * t.type_total AS hot
      FROM h JOIN t ON h.event_type = t.event_type"""))

  // --- q158: interval×interval overlap join with a reciprocal gate
  // (bedtools intersect -f 0.5 -r — SURVEY §2.4's GRanges surface beyond
  // point containment): both interval sets explode to covering bands,
  // pairs meet in a shared band, survive only in the overlap's FIRST
  // band (dedup without a shuffle), and the ≥ 50%-of-BOTH gate is
  // integer cross-multiplication. ----------------------------------------
  private val q158 = Q("q158_interval_overlap",
    (s, dir) => {
      val p = Tables(s, dir, "part")
      val a = p.filter(col("p_partkey") % 30 === 0)
        .select(col("p_partkey").as("a_id"),
          (col("p_size") * 100L).cast("long").as("lo_a"),
          (col("p_size") * 100L + 1000L + (col("p_partkey") % 3) * 100L)
            .cast("long").as("hi_a"))
      val b = p.filter(col("p_partkey") % 7 === 0)
        .select(col("p_partkey").as("b_id"),
          (col("p_size") * 100L + (col("p_partkey") % 5) * 100L)
            .cast("long").as("lo_b"),
          (col("p_size") * 100L + (col("p_partkey") % 5) * 100L + 900L)
            .cast("long").as("hi_b"))
      graft.operators.RangeJoin.intervalOverlap(
          a, col("lo_a"), col("hi_a"), b, col("lo_b"), col("hi_b"),
          bandWidth = 1000L, minNum = 1, minDen = 2)
        .select(col("a_id"), col("b_id"), col("ov_len"),
          (col("hi_a") - col("lo_a")).as("len_a"),
          (col("hi_b") - col("lo_b")).as("len_b"))
    },
    Some("""WITH a AS (SELECT p_partkey AS a_id,
          CAST(p_size * 100 AS BIGINT) AS lo_a,
          CAST(p_size * 100 + 1000 + (p_partkey % 3) * 100 AS BIGINT) AS hi_a
        FROM part WHERE p_partkey % 30 = 0),
      b AS (SELECT p_partkey AS b_id,
          CAST(p_size * 100 + (p_partkey % 5) * 100 AS BIGINT) AS lo_b,
          CAST(p_size * 100 + (p_partkey % 5) * 100 + 900 AS BIGINT) AS hi_b
        FROM part WHERE p_partkey % 7 = 0)
      SELECT a_id, b_id,
        least(hi_a, hi_b) - greatest(lo_a, lo_b) AS ov_len,
        hi_a - lo_a AS len_a, hi_b - lo_b AS len_b
      FROM a JOIN b ON lo_a < hi_b AND lo_b < hi_a
      WHERE (least(hi_a, hi_b) - greatest(lo_a, lo_b)) * 2
              >= (hi_a - lo_a)
        AND (least(hi_a, hi_b) - greatest(lo_a, lo_b)) * 2
              >= (hi_b - lo_b)"""))

  // --- q194: gap-based sessionization (the classic event-stream
  // rollup; the batch twin of EventStream.sessionWindows). A session
  // breaks after ≥30 min of silence — the same boundary convention as
  // session_window, whose [start, last+gap) span excludes an event at
  // exactly gap distance; session ids are a running sum of break flags
  // over the user-PARTITIONED (ts, event_id) order — no global window
  // anywhere; three linear user-keyed stages. All counts exact; one
  // final division. ----------------------------------------------------
  private val q194 = Q("q194_sessionize",
    (s, dir) => {
      val gapNs = 30L * 60 * 1000000000L
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val run = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("brk",
          when(col("ts") - lag(col("ts"), 1).over(ord) >= gapNs, 1L)
            .otherwise(0L))
        .withColumn("sess", sum(col("brk")).over(run))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("len")).as("n_events"),
          max(col("len")).as("max_session"))
        .withColumn("mean_session",
          col("n_events").cast("double") / col("n_sessions").cast("double"))
    },
    Some("""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        CAST(SUM(len) AS BIGINT) AS n_events,
        CAST(MAX(len) AS BIGINT) AS max_session,
        CAST(SUM(len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS mean_session
      FROM (SELECT user_id, sess, COUNT(*) AS len
        FROM (SELECT user_id, event_id,
            SUM(brk) OVER (PARTITION BY user_id ORDER BY tns, event_id
              ROWS UNBOUNDED PRECEDING) AS sess
          FROM (SELECT user_id, event_id, tns,
              CASE WHEN tns - LAG(tns) OVER (PARTITION BY user_id
                  ORDER BY tns, event_id) >= 1800000000000
                THEN 1 ELSE 0 END AS brk
            FROM (SELECT user_id, event_id, epoch_ns(ts) AS tns
              FROM events)))
        GROUP BY 1, 2)
      GROUP BY user_id"""))

  // --- q198: retention cohort matrix (the other classic event rollup):
  // cohort = a user's first active week; per (cohort, week offset) the
  // count of active users. Week ids are exact integer divisions of the
  // nano timestamps; one distinct + one user-keyed min + one user-keyed
  // join + one cell rollup — all linear. -------------------------------
  private val q198 = Q("q198_retention",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), expr("ts div 604800000000000").as("wk"))
        .distinct()
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort"))
      ev.join(cohort, Seq("user_id"))
        .groupBy(col("cohort"), (col("wk") - col("cohort")).as("offset"))
        .agg(count(lit(1)).as("n_users"))
    },
    Some("""WITH e AS (SELECT DISTINCT user_id,
          epoch_ns(ts) // 604800000000000 AS wk FROM events),
      c AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY 1)
      SELECT cohort, wk - cohort AS offset,
        CAST(COUNT(*) AS BIGINT) AS n_users
      FROM e JOIN c USING (user_id)
      GROUP BY 1, 2"""))

  // --- q202: pivot / crosstab (event_type × weekday counts through
  // Spark's RelationalGroupedDataset.pivot with EXPLICIT values — no
  // value-discovery job, stable schema at any scale): weekday from the
  // exact integer epoch-day (epoch day 0 = Thursday ⇒ Monday-0 index
  // is (day + 3) mod 7). One aggregation; 7 fixed output columns. -----
  private val q202 = Q("q202_pivot_weekday",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_type"),
          expr("(ts div 86400000000000 + 3) % 7").as("wd"))
      ev.groupBy(col("event_type"))
        .pivot("wd", 0 to 6)
        .count()
        .select(col("event_type") +: (0 to 6).map(i =>
          coalesce(col(s"`$i`"), lit(0L)).as(s"d$i")): _*)
    },
    Some {
      val cols = (0 to 6).map(i =>
        s"CAST(SUM(CASE WHEN wd = $i THEN 1 ELSE 0 END) AS BIGINT) AS d$i")
        .mkString(",\n        ")
      s"""SELECT event_type,
        $cols
      FROM (SELECT event_type,
          (epoch_ns(ts) // 86400000000000 + 3) % 7 AS wd FROM events)
      GROUP BY event_type"""
    })

  // --- q205: CUBE over (event_type, weekday) — all four grouping
  // sets in ONE pass through Spark's native Expand operator (no
  // self-union of aggregates), with per-dimension GROUPING flags so
  // subtotal NULLs are unambiguous. Value sums on the exact
  // milli-grid (floor(value·1000) BIGINT) — no double accumulation. --
  private val q205 = Q("q205_cube_events",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_type"),
          expr("(ts div 86400000000000 + 3) % 7").as("wd"),
          floor(col("value") * 1000).cast("long").as("vmil"))
      ev.cube(col("event_type"), col("wd"))
        .agg(grouping(col("event_type")).cast("long").as("g_et"),
          grouping(col("wd")).cast("long").as("g_wd"),
          count(lit(1)).as("n"), sum(col("vmil")).as("sum_vmil"))
    },
    Some("""SELECT event_type, wd,
        CAST(GROUPING(event_type) AS BIGINT) AS g_et,
        CAST(GROUPING(wd) AS BIGINT) AS g_wd,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(vmil) AS BIGINT) AS sum_vmil
      FROM (SELECT event_type,
          (epoch_ns(ts) // 86400000000000 + 3) % 7 AS wd,
          CAST(FLOOR(value * 1000) AS BIGINT) AS vmil FROM events)
      GROUP BY CUBE (event_type, wd)"""))

  // --- q214: event-type transition matrix (first-order Markov
  // behavior model): per user, consecutive event pairs on the
  // tie-free (ts, event_id) order, rolled up to (prev, next) counts
  // with the row-probability as one division. User-partitioned window
  // — never global — then one pair-key aggregate. --------------------
  private val q214 = Q("q214_event_transitions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
      val pairs = ev.groupBy(col("prev_type"),
          col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy(col("prev_type"))
        .agg(sum(col("n")).as("n_from"))
      pairs.join(broadcast(totals), "prev_type")
        .withColumn("p", col("n").cast("double")
          / col("n_from").cast("double"))
    },
    Some("""SELECT prev_type, next_type, n,
        CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from,
        CAST(n AS DOUBLE)
          / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
      FROM (SELECT prev_type, event_type AS next_type,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT user_id, event_type,
            LAG(event_type, 1) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_type
          FROM events)
        WHERE prev_type IS NOT NULL
        GROUP BY 1, 2)"""))

  // --- q215: exact decile profile per event_type — ntile(10) on the
  // tie-free (vmil, event_id) order (the standard-SQL floor
  // distribution both engines implement), then per-cell count and
  // exact milli-grid bounds. One partitioned window + one aggregate. --
  private val q215 = Q("q215_value_deciles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("vmil"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 1000).cast("long").as("vmil"))
        .withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy(col("event_type"), col("decile"))
        .agg(count(lit(1)).as("n"), min(col("vmil")).as("lo_vmil"),
          max(col("vmil")).as("hi_vmil"))
    },
    Some("""SELECT event_type, CAST(decile AS BIGINT) AS decile,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(MIN(vmil) AS BIGINT) AS lo_vmil,
        CAST(MAX(vmil) AS BIGINT) AS hi_vmil
      FROM (SELECT event_type, event_id, vmil,
          NTILE(10) OVER (PARTITION BY event_type
            ORDER BY vmil, event_id) AS decile
        FROM (SELECT event_type, event_id,
            CAST(FLOOR(value * 1000) AS BIGINT) AS vmil FROM events))
      GROUP BY 1, 2"""))

  // --- q217: RFM segmentation — per customer, Recency (days from
  // last order to the corpus-max order date, bucketed), Frequency
  // (order count, bucketed) and Monetary (exact total cents,
  // bucketed), rolled up to segment populations. The corpus-max date
  // is a 1-row broadcast aggregate (the documented benign
  // broadcast-scalar shape); everything else is one customer-keyed
  // aggregate + one ≤125-cell rollup. ---------------------------------
  private val q217 = Q("q217_rfm_segments",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_custkey"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
            .as("d"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val maxD = o.agg(max(col("d")).as("max_d"))
      val per = o.groupBy(col("o_custkey"))
        .agg(max(col("d")).as("last_d"), count(lit(1)).as("n_orders"),
          sum(col("cents")).as("tot_cents"))
        .crossJoin(broadcast(maxD))
      val rb = least(lit(4L), expr("(max_d - last_d) div 180"))
      val fb = least(lit(4L), col("n_orders") - 1)
      val mb = least(lit(4L), expr("tot_cents div 20000000"))
      per.select(rb.cast("long").as("r_bucket"),
          fb.cast("long").as("f_bucket"), mb.cast("long").as("m_bucket"))
        .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
        .agg(count(lit(1)).as("n_customers"))
    },
    Some("""SELECT LEAST(4, (max_d - last_d) // 180) AS r_bucket,
        LEAST(4, n_orders - 1) AS f_bucket,
        LEAST(4, tot_cents // 20000000) AS m_bucket,
        CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM (SELECT o_custkey,
            CAST(MAX(d) AS BIGINT) AS last_d,
            CAST(COUNT(*) AS BIGINT) AS n_orders,
            CAST(SUM(cents) AS BIGINT) AS tot_cents
          FROM (SELECT o_custkey,
              datediff('day', DATE '1970-01-01', o_orderdate) AS d,
              CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders)
          GROUP BY 1),
        (SELECT CAST(MAX(datediff('day', DATE '1970-01-01',
            o_orderdate)) AS BIGINT) AS max_d FROM orders)
      GROUP BY 1, 2, 3"""))

  // --- q219: order-total integrity audit (the referential data-
  // quality check a warehouse runs): per order, o_totalprice vs the
  // recomputed Σ extendedprice·(1−discount)·(1+tax) from its line
  // items — ALL in exact integer micro-cents (prices on the 2-decimal
  // grid, discount/tax on the 2-decimal rate grid ⇒ cents·rate·rate
  // is exact in ×10⁸ units), deviation bucketed by magnitude. One
  // orderkey aggregate + one broadcast-size rollup. -------------------
  private val q219 = Q("q219_order_audit",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long"))
            * (lit(100L) + round(col("l_tax") * 100).cast("long")))
            .as("micro"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("micro")).as("li_micro"),
          count(lit(1)).as("n_lines"))
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          (round(col("o_totalprice") * 100).cast("long") * 10000L)
            .as("o_micro"))
      val diff = abs(col("o_micro") - col("li_micro"))
      val mag = when(col("li_micro").isNull, lit(-1L))
        .when(diff === 0, lit(0L)).when(diff < 10L, lit(1L))
        .when(diff < 100L, lit(2L)).when(diff < 1000L, lit(3L))
        .when(diff < 10000L, lit(4L)).when(diff < 100000L, lit(5L))
        .otherwise(lit(6L))
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .select(mag.as("dev_mag"),
          coalesce(col("n_lines"), lit(0L)).as("n_lines"))
        .groupBy(col("dev_mag"), col("n_lines"))
        .agg(count(lit(1)).as("n_orders"))
    },
    Some("""SELECT dev_mag, n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM (SELECT
          CASE WHEN li_micro IS NULL THEN -1
            WHEN ABS(o_micro - li_micro) = 0 THEN 0
            WHEN ABS(o_micro - li_micro) < 10 THEN 1
            WHEN ABS(o_micro - li_micro) < 100 THEN 2
            WHEN ABS(o_micro - li_micro) < 1000 THEN 3
            WHEN ABS(o_micro - li_micro) < 10000 THEN 4
            WHEN ABS(o_micro - li_micro) < 100000 THEN 5
            ELSE 6 END AS dev_mag,
          COALESCE(n_lines, 0) AS n_lines
        FROM (SELECT o_orderkey,
            CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000 AS o_micro
          FROM orders) o
        LEFT JOIN (SELECT l_orderkey,
            CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
              * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)))
              AS BIGINT) AS li_micro,
            CAST(COUNT(*) AS BIGINT) AS n_lines
          FROM lineitem GROUP BY 1) l
          ON o.o_orderkey = l.l_orderkey)
      GROUP BY 1, 2"""))

  // --- q221: market-basket part co-occurrence — top-25 part pairs
  // ordered together. The self-join is ORDER-KEYED (orders have ≤ 7
  // lines, so the pair fan-out is bounded ×~3 per order, never
  // quadratic in the catalog), i < j dedupes within the order, one
  // pair-key aggregate, tie-free (n DESC, pa, pb) top-k. -------------
  private val q221 = Q("q221_part_pairs",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val a = li.select(col("ok"), col("pk").as("pa"))
      val b = li.select(col("ok").as("ok2"), col("pk").as("pb"))
      val pairs = a.join(b,
          col("ok") === col("ok2") && col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb"))
        .agg(count(lit(1)).as("n"))
      // sort+limit plans as distributed TakeOrderedAndProject (per-
      // partition top-25, merged on the driver) — never a global sort
      // of the pair table; the rank window then runs over ≤ 25 rows
      val top = pairs
        .orderBy(col("n").desc, col("pa"), col("pb")).limit(25)
      val w = Window.orderBy(col("n").desc, col("pa"), col("pb"))
      top.withColumn("rank", row_number().over(w).cast("long"))
    },
    Some("""SELECT pa, pb, n, CAST(rank AS BIGINT) AS rank
      FROM (SELECT pa, pb, n,
          ROW_NUMBER() OVER (ORDER BY n DESC, pa, pb) AS rank
        FROM (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
            CAST(COUNT(*) AS BIGINT) AS n
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2))
      WHERE rank <= 25"""))

  // --- q222: order-to-ship latency histogram (the TPC-H Q12 flavor
  // on this schema): days from o_orderdate to each line's l_shipdate,
  // exact integer day buckets per (returnflag, week-of-latency) cell.
  // One orderkey equi-join (fact-to-fact — the bucketed-table
  // candidate BucketedJoinSpec pins) + one small-key aggregate. ------
  private val q222 = Q("q222_ship_latency",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"),
          col("l_shipdate"))
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_returnflag"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("lat_days"))
        .withColumn("lat_week", expr("lat_days div 7"))
        .groupBy(col("l_returnflag"), col("lat_week"))
        .agg(count(lit(1)).as("n"), min(col("lat_days")).as("min_days"),
          max(col("lat_days")).as("max_days"))
    },
    Some("""SELECT l_returnflag, lat_days // 7 AS lat_week,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(MIN(lat_days) AS BIGINT) AS min_days,
        CAST(MAX(lat_days) AS BIGINT) AS max_days
      FROM (SELECT l_returnflag,
          CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT)
            AS lat_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      GROUP BY 1, 2"""))

  // --- q228: EXACT Gini concentration of per-user event activity —
  // the whale-vs-long-tail inequality metric. Needs every user's
  // GLOBAL rank by activity; computed scale-safely with the two-level
  // cumsum pattern (rank inside a per-count bucket + a broadcast
  // prefix over the tiny distinct-count table — no single-partition
  // row window; the packSequences discipline). All integer:
  // Σ(2·rank − n − 1)·x over n·Σx, ONE final division. --------------
  private val q228 = Q("q228_user_gini",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val uc = Tables(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
      val wIn = Window.partitionBy(col("x")).orderBy(col("user_id"))
      // distinct activity levels ≤ max-events-per-user: summary-table
      // sized, so the bucket-prefix window is broadcast-bounded
      val wB = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prefix = uc.groupBy(col("x")).agg(count(lit(1)).as("__nb"))
        .withColumn("__pre", sum(col("__nb")).over(wB) - col("__nb"))
        .select(col("x"), col("__pre"))
      val totals = uc.agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("sum_events"))
      val ranked = uc
        .withColumn("__r", row_number().over(wIn).cast("long"))
        .join(broadcast(prefix), "x")
        .withColumn("rank", col("__pre") + col("__r"))
        .crossJoin(broadcast(totals))
      ranked
        .select(col("n_users"), col("sum_events"),
          ((lit(2L) * col("rank") - col("n_users") - 1L) * col("x"))
            .as("t"))
        .groupBy(col("n_users"), col("sum_events"))
        .agg(sum(col("t")).as("gini_num"))
        .withColumn("gini_den", col("n_users") * col("sum_events"))
        .withColumn("gini", col("gini_num").cast("double")
          / col("gini_den").cast("double"))
    },
    Some("""SELECT n_users, sum_events,
        CAST(SUM((2 * rank - n_users - 1) * x) AS BIGINT) AS gini_num,
        CAST(n_users * sum_events AS BIGINT) AS gini_den,
        CAST(SUM((2 * rank - n_users - 1) * x) AS DOUBLE)
          / CAST(n_users * sum_events AS DOUBLE) AS gini
      FROM (SELECT x,
          ROW_NUMBER() OVER (ORDER BY x, user_id) AS rank,
          CAST(COUNT(*) OVER () AS BIGINT) AS n_users,
          CAST(SUM(x) OVER () AS BIGINT) AS sum_events
        FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1))
      GROUP BY 1, 2"""))

  // --- q231: EXACT weighted median line price per (returnflag,
  // linestatus), weighted by quantity — the robust centre a mean-based
  // q01 profile can't give. Delegates to the two-level bucket-cumsum
  // operator (`operators/WeightedMedian`): the only data-sized shuffle
  // collapses to the cents grid; every window runs over the ≤#buckets
  // summary or ONE median bucket's grid points — no global sort, no
  // per-group data-sized partition at any scale. Exact integer
  // cross-multiplied comparisons; ONE final division presents dollars. ---
  private val MEDIAN_BUCKET = 100000L // $1,000 of cents per bucket
  private val q231 = Q("q231_weighted_median",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"),
          round(col("l_quantity")).cast("long").as("qty"))
      graft.operators.WeightedMedian.exact(li,
          Seq("l_returnflag", "l_linestatus"), "cents", "qty",
          MEDIAN_BUCKET)
        .withColumn("median_price",
          col("median_v").cast("double") / 100.0)
        .select(col("l_returnflag"), col("l_linestatus"), col("w_total"),
          col("median_v").as("median_cents"), col("median_price"))
    },
    Some("""WITH pv AS (SELECT l_returnflag, l_linestatus,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
          CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2, 3),
      c AS (SELECT l_returnflag, l_linestatus, v,
          SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus
            ORDER BY v) AS cum,
          SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus) AS tot
        FROM pv)
      SELECT l_returnflag, l_linestatus,
        CAST(MIN(tot) AS BIGINT) AS w_total,
        CAST(MIN(CASE WHEN 2 * cum >= tot THEN v END) AS BIGINT)
          AS median_cents,
        CAST(MIN(CASE WHEN 2 * cum >= tot THEN v END) AS DOUBLE) / 100.0
          AS median_price
      FROM c GROUP BY 1, 2"""))

  // --- q234: EXACT ship-latency SLO percentiles (p50/p90/p99) per
  // returnflag — the tail-latency report approx-percentile sketches
  // only estimate. Same latency definition as q222; delegates to
  // `WeightedMedian.exactQuantiles`, so the bucket cumulative stage
  // runs once and all three levels descend into their target buckets
  // in ONE data-sized join — no global sort, no per-group data-sized
  // window at any scale. --------------------------------------------
  private val q234 = Q("q234_latency_quantiles",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      val lat = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_returnflag"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("lat_days"), lit(1L).as("one"))
      graft.operators.WeightedMedian.exactQuantiles(lat,
          Seq("l_returnflag"), "lat_days", "one", 8L,
          Seq((1, 2), (9, 10), (99, 100)))
        .select(col("l_returnflag"), col("q_num"), col("q_den"),
          col("w_total").as("n_lines"), col("quantile_v").as("lat_days"))
    },
    Some("""WITH lat AS (SELECT l_returnflag,
          CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT)
            AS lat_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      c AS (SELECT l_returnflag, lat_days,
          SUM(1) OVER (PARTITION BY l_returnflag ORDER BY lat_days
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          COUNT(*) OVER (PARTITION BY l_returnflag) AS tot
        FROM lat),
      q(q_num, q_den) AS (VALUES (1, 2), (9, 10), (99, 100))
      SELECT l_returnflag, CAST(q_num AS BIGINT) AS q_num,
        CAST(q_den AS BIGINT) AS q_den,
        CAST(MIN(tot) AS BIGINT) AS n_lines,
        CAST(MIN(CASE WHEN cum * q_den >= tot * q_num THEN lat_days END)
          AS BIGINT) AS lat_days
      FROM c CROSS JOIN q
      GROUP BY 1, 2, 3"""))

  // --- q235: k-anonymity audit over quasi-identifiers — the privacy
  // gate a training-data release runs before publishing user-derived
  // records: equivalence classes on (nation, market segment, $1000
  // balance band), then per k ∈ {2,5,10} how many classes and rows sit
  // below the threshold. One QI-grid-bounded shuffle builds the class
  // sizes; the k fan-out explodes a 3-element literal over the SUMMARY
  // table only. The band uses the identical double floor both engines.
  private val q235 = Q("q235_k_anonymity",
    (s, dir) => {
      val classes = Tables(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
        .groupBy(col("nation"), col("segment"), col("bal_band"))
        .agg(count(lit(1)).as("sz"))
      classes
        .select(explode(array(lit(2L), lit(5L), lit(10L))).as("k"),
          col("sz"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("sz")).as("n_rows"),
          sum(when(col("sz") < col("k"), 1L).otherwise(0L))
            .as("n_small_classes"),
          sum(when(col("sz") < col("k"), col("sz")).otherwise(0L))
            .as("n_rows_at_risk"))
        .withColumn("pct_at_risk", col("n_rows_at_risk").cast("double")
          / col("n_rows").cast("double"))
    },
    Some("""WITH classes AS (SELECT
          CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
          CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
          CAST(COUNT(*) AS BIGINT) AS sz
        FROM customer GROUP BY 1, 2, 3),
      ks(k) AS (VALUES (CAST(2 AS BIGINT)), (5), (10))
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(SUM(sz) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
          AS n_small_classes,
        CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
          AS n_rows_at_risk,
        CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS DOUBLE)
          / CAST(SUM(sz) AS DOUBLE) AS pct_at_risk
      FROM classes CROSS JOIN ks GROUP BY 1"""))

  // --- q237: Benford first-digit audit of order totals — the classic
  // fabricated-data screen. The leading digit comes from the INTEGER
  // cents rendered as a string (no log10 in the hash path); the Benford
  // expectations log10(1+1/d) are computed ONCE in Scala and handed to
  // both engines as identical literals (the q213 shared-constant
  // discipline), so the only runtime doubles are one share division and
  // one literal subtraction. One 9-row aggregate; the share window runs
  // over the 9-row summary. ----------------------------------------------
  private val benfordExp: Map[Int, Double] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d)).toMap
  private val q237 = Q("q237_benford_audit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val expCol = benfordExp.foldLeft(lit(null).cast("double")) {
        case (acc, (d, p)) => when(col("digit") === d, lit(p)).otherwise(acc)
      }
      Tables(s, dir, "orders")
        .select(substring(round(col("o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .withColumn("obs_share",
          col("n").cast("double") / sum(col("n")).over(wAll).cast("double"))
        .withColumn("exp_share", expCol)
        .withColumn("dev", col("obs_share") - col("exp_share"))
    },
    Some {
      // e0-suffixed literals parse directly as DOUBLE in DuckDB (the
      // q213 shared-constant trick) — a bare decimal literal would land
      // as DECIMAL and its decimal→double cast is not correctly rounded
      // (1-ulp drift observed on log10(4/3))
      val expVals = (1 to 9)
        .map(d => s"($d, ${benfordExp(d)}e0)")
        .mkString(", ")
      s"""WITH digits AS (SELECT
          CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
            AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders),
      c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM digits GROUP BY 1),
      e(digit, exp_share) AS (VALUES $expVals)
      SELECT c.digit, n,
        CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS obs_share,
        exp_share,
        CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) - exp_share
          AS dev
      FROM c JOIN e ON c.digit = e.digit"""
    })

  // --- q240: EXACT distributed Spearman rank correlation between line
  // quantity and price — the monotone-association screen, with textbook
  // midrank ties, computed exactly at any scale (operators/Spearman:
  // two-level cumsum rank assignment, five BIGINT sums, and only
  // IEEE-correctly-rounded sqrt/division at the end — bit-identical
  // across engines). -----------------------------------------------------
  private val q240 = Q("q240_spearman",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(round(col("l_quantity")).cast("long").as("qty"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      graft.operators.Spearman.corr(li, "qty", "cents", 8L, 100000L)
    },
    Some("""WITH src AS (SELECT
          CAST(round(l_quantity) AS BIGINT) AS x,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem),
      cx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM src GROUP BY 1),
      rx AS (SELECT x,
          2 * (SUM(cnt) OVER (ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
            + cnt + 1 AS mr2 FROM cx),
      cy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM src GROUP BY 1),
      ry AS (SELECT y,
          2 * (SUM(cnt) OVER (ORDER BY y
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
            + cnt + 1 AS mr2 FROM cy),
      j AS (SELECT rx.mr2 AS a, ry.mr2 AS b,
          CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM src JOIN rx ON src.x = rx.x JOIN ry ON src.y = ry.y),
      s AS (SELECT n,
          CAST(SUM((a - (n + 1)) * (b - (n + 1))) AS BIGINT) AS num,
          CAST(SUM((a - (n + 1)) * (a - (n + 1))) AS BIGINT) AS vx,
          CAST(SUM((b - (n + 1)) * (b - (n + 1))) AS BIGINT) AS vy
        FROM j GROUP BY n)
      SELECT n, num, vx, vy,
        CASE WHEN vx > 0 AND vy > 0 THEN
          CAST(num AS DOUBLE)
            / (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE))) END
          AS rho
      FROM s"""))

  // --- q241: chi-square standardized residuals of the event_type ×
  // weekday contingency table — WHICH cells drive a dependence, not
  // just whether one exists. Every margin (R, C, T) comes from windows
  // over the 35-cell summary; the residual (O·T − R·C)/√(T·R·C) uses
  // one exact integer numerator, one IEEE sqrt and one division —
  // bit-identical across engines (same q240 discipline). ----------------
  private val q241 = Q("q241_contingency_resid",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wR = Window.partitionBy(col("event_type"))
      val wC = Window.partitionBy(col("wd"))
      val wT = Window.partitionBy()
      Tables(s, dir, "events")
        .select(col("event_type"),
          expr("(ts div 86400000000000 + 3) % 7").as("wd"))
        .groupBy(col("event_type"), col("wd"))
        .agg(count(lit(1)).as("o"))
        .withColumn("r", sum(col("o")).over(wR))
        .withColumn("c", sum(col("o")).over(wC))
        .withColumn("t", sum(col("o")).over(wT))
        .select(col("event_type"), col("wd"), col("o"),
          col("r"), col("c"),
          (col("r").cast("double") * col("c").cast("double")
            / col("t").cast("double")).as("e"),
          ((col("o") * col("t") - col("r") * col("c")).cast("double")
            / sqrt((col("t") * col("r") * col("c")).cast("double")))
            .as("resid"))
    },
    Some("""WITH cells AS (SELECT event_type,
          (epoch_ns(ts) // 86400000000000 + 3) % 7 AS wd,
          CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2),
      m AS (SELECT event_type, wd, o,
          CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
          CAST(SUM(o) OVER (PARTITION BY wd) AS BIGINT) AS c,
          CAST(SUM(o) OVER () AS BIGINT) AS t
        FROM cells)
      SELECT event_type, wd, o, r, c,
        CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS e,
        CAST(o * t - r * c AS DOUBLE) / sqrt(CAST(t * r * c AS DOUBLE))
          AS resid
      FROM m"""))

  // --- q242: EXACT two-sample Kolmogorov–Smirnov distance between the
  // click and view value distributions — the distribution-drift test,
  // with the supremum found by exact integer cross-multiplication
  // (|cum₁·n₂ − cum₂·n₁| avoids every per-step division): D and its
  // location are grid-exact, the one division happens at the end. The
  // ECDF scan runs over the distinct-cents summary (grid-bounded, the
  // q228 two-level pattern applies wider); cross-products stay ≤ n₁·n₂
  // (int64-safe through ~10⁹ rows per side). ----------------------------
  private val q242 = Q("q242_ks_test",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wCum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val wPick = Window.orderBy(col("d_num").desc, col("v"))
      Tables(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(round(col("value") * 100).cast("long").as("v"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("a"))
        .groupBy(col("v"))
        .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
        .withColumn("cum_a", sum(col("ca")).over(wCum))
        .withColumn("cum_b", sum(col("cb")).over(wCum))
        .withColumn("n_a", sum(col("ca")).over(wAll))
        .withColumn("n_b", sum(col("cb")).over(wAll))
        .withColumn("d_num",
          abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("n_a"), col("n_b"), col("d_num"),
          col("v").as("at_cents"),
          (col("d_num").cast("double")
            / (col("n_a") * col("n_b")).cast("double")).as("d"))
    },
    Some("""WITH src AS (SELECT
          CAST(round(value * 100) AS BIGINT) AS v,
          CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a
        FROM events WHERE event_type IN ('click', 'view')),
      g AS (SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
          CAST(SUM(1 - a) AS BIGINT) AS cb
        FROM src GROUP BY 1),
      c AS (SELECT v,
          SUM(ca) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
          SUM(cb) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
          SUM(ca) OVER () AS n_a, SUM(cb) OVER () AS n_b
        FROM g),
      d AS (SELECT v, n_a, n_b,
          abs(cum_a * n_b - cum_b * n_a) AS d_num,
          ROW_NUMBER() OVER (ORDER BY abs(cum_a * n_b - cum_b * n_a)
            DESC, v) AS rn
        FROM c)
      SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        CAST(d_num AS BIGINT) AS d_num, v AS at_cents,
        CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS d
      FROM d WHERE rn = 1"""))

  // --- q244: Lorenz curve decile points for user event activity — the
  // curve behind q228's Gini scalar: for each user-count decile
  // (users ordered by activity), the exact share of total events that
  // decile's bottom holds. Users rank scale-safely with the SAME
  // two-level pattern as q228 (per-activity-level bucket rank +
  // broadcast prefix); decile boundaries are integer cross-products
  // (rank·10 ≤ n_users·k); shares are one division each. ----------------
  private val q244 = Q("q244_lorenz_deciles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val uc = Tables(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
      val wIn = Window.partitionBy(col("x")).orderBy(col("user_id"))
      val wB = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prefix = uc.groupBy(col("x")).agg(count(lit(1)).as("__nb"),
          sum(col("x")).as("__xb"))
        .withColumn("__pre", sum(col("__nb")).over(wB) - col("__nb"))
        .withColumn("__xpre", sum(col("__xb")).over(wB) - col("__xb"))
        .select(col("x"), col("__pre"), col("__xpre"))
      val totals = uc.agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("sum_events"))
      // per user: rank and the cumulative events up to and incl. them
      val wCumIn = Window.partitionBy(col("x")).orderBy(col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = uc
        .withColumn("__r", row_number().over(wIn).cast("long"))
        .withColumn("__cx", sum(col("x")).over(wCumIn))
        .join(broadcast(prefix), "x")
        .withColumn("rank", col("__pre") + col("__r"))
        .withColumn("cum_events", col("__xpre") + col("__cx"))
        .crossJoin(broadcast(totals))
      // a user closes decile k when it is the LAST rank with
      // rank·10 ≤ n_users·k — equivalently rank = n_users·k div 10
      ranked
        .select(col("rank"), col("cum_events"), col("n_users"),
          col("sum_events"),
          explode(array((1 to 10).map(lit): _*)).as("decile"))
        .filter(col("rank") === expr("(n_users * decile) div 10"))
        .select(col("decile").cast("long"), col("rank").as("cum_users"),
          col("cum_events"),
          (col("cum_events").cast("double")
            / col("sum_events").cast("double")).as("share"))
    },
    Some("""WITH uc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1),
      r AS (SELECT
          ROW_NUMBER() OVER (ORDER BY x, user_id) AS rank,
          SUM(x) OVER (ORDER BY x, user_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS cum_events,
          CAST(COUNT(*) OVER () AS BIGINT) AS n_users,
          CAST(SUM(x) OVER () AS BIGINT) AS sum_events
        FROM uc),
      d AS (SELECT unnest(range(1, 11)) AS decile)
      SELECT CAST(decile AS BIGINT) AS decile,
        CAST(rank AS BIGINT) AS cum_users,
        CAST(cum_events AS BIGINT) AS cum_events,
        CAST(cum_events AS DOUBLE) / CAST(sum_events AS DOUBLE) AS share
      FROM r JOIN d ON rank = (n_users * decile) // 10"""))

  // --- q246: EXACT inter-event gap percentiles per event type — the
  // user-cadence profile (how long until the next click/view/...),
  // p50/p90/p99 through `WeightedMedian.exactQuantiles` again (second
  // consumer of the operator — gaps in ms, 10-minute buckets). The lag
  // runs under per-user windows (bounded per-user history, the q138
  // sessionize shape); the gap is attributed to the EARLIER event's
  // type. Tie-free order: (ts, event_id). ------------------------------
  private val q246 = Q("q246_gap_quantiles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wU = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = Tables(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("next_ts", lead(col("ts"), 1).over(wU))
        .filter(col("next_ts").isNotNull)
        .select(col("event_type"),
          expr("(next_ts - ts) div 1000000").as("gap_ms"),
          lit(1L).as("one"))
      graft.operators.WeightedMedian.exactQuantiles(gaps,
          Seq("event_type"), "gap_ms", "one", 600000L,
          Seq((1, 2), (9, 10), (99, 100)))
        .select(col("event_type"), col("q_num"), col("q_den"),
          col("w_total").as("n_gaps"), col("quantile_v").as("gap_ms"))
    },
    Some("""WITH g AS (SELECT event_type,
          (LEAD(epoch_ns(ts)) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) - epoch_ns(ts)) // 1000000 AS gap_ms
        FROM events),
      gg AS (SELECT event_type, gap_ms FROM g WHERE gap_ms IS NOT NULL),
      c AS (SELECT event_type, gap_ms,
          SUM(1) OVER (PARTITION BY event_type ORDER BY gap_ms
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          COUNT(*) OVER (PARTITION BY event_type) AS tot
        FROM gg),
      q(q_num, q_den) AS (VALUES (1, 2), (9, 10), (99, 100))
      SELECT event_type, CAST(q_num AS BIGINT) AS q_num,
        CAST(q_den AS BIGINT) AS q_den,
        CAST(MIN(tot) AS BIGINT) AS n_gaps,
        CAST(MIN(CASE WHEN cum * q_den >= tot * q_num THEN gap_ms END)
          AS BIGINT) AS gap_ms
      FROM c CROSS JOIN q
      GROUP BY 1, 2, 3"""))

  // --- q249: association RULES over order baskets — q221's pair counts
  // upgraded to directional confidence and lift (the "customers who buy
  // A also buy B" miner). Baskets dedup to (order, part) first so a
  // part repeated across lines counts once; supports are distinct-order
  // counts; conf = n_ab/n_a and lift = T·n_ab/(n_a·n_b) are each ONE
  // exact division. The order-keyed self-join bounds fan-out by basket
  // width (never catalog-quadratic); the 1-row order-count broadcast is
  // the documented benign scalar shape; top-20 rides a distributed
  // TakeOrdered, no global sort. ----------------------------------------
  private val q249 = Q("q249_basket_rules",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // examined for the wave-3 materialization (bk is referenced four
      // times, `half` twice) — checkpointing both MEASURED SLOWER
      // (2.7 s → 5.4 s: unlike q257's 35-scan plan, AQE's exchange
      // reuse already folds these copies, so the eager materialization
      // is pure added cost), so the direct form stays
      val bk = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val itemN = bk.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
      val half = bk.as("a").join(bk.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
        .agg(count(lit(1)).as("n_ab"))
      val rules = half.unionByName(half.select(col("pb").as("pa"),
        col("pa").as("pb"), col("n_ab")))
      val tot = bk.select(col("ok")).distinct()
        .agg(count(lit(1)).as("t"))
      val w = Window.orderBy(col("conf").desc, col("pa"), col("pb"))
      rules.filter(col("n_ab") >= 3)
        .join(itemN.withColumnRenamed("pk", "pa")
          .withColumnRenamed("n_item", "n_a"), "pa")
        .join(itemN.withColumnRenamed("pk", "pb")
          .withColumnRenamed("n_item", "n_b"), "pb")
        .crossJoin(broadcast(tot))
        .withColumn("conf",
          col("n_ab").cast("double") / col("n_a").cast("double"))
        .withColumn("lift", (col("t") * col("n_ab")).cast("double")
          / (col("n_a") * col("n_b")).cast("double"))
        .orderBy(col("conf").desc, col("pa"), col("pb")).limit(20)
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(col("rank"), col("pa"), col("pb"), col("n_ab"),
          col("n_a"), col("n_b"), col("t"), col("conf"), col("lift"))
    },
    Some("""WITH bk AS (SELECT DISTINCT l_orderkey AS ok,
          l_partkey AS pk FROM lineitem),
      itemn AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_item
        FROM bk GROUP BY 1),
      half AS (SELECT a.pk AS pa, b.pk AS pb,
          CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM bk a JOIN bk b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2),
      rules AS (SELECT pa, pb, n_ab FROM half
        UNION ALL SELECT pb, pa, n_ab FROM half),
      tot AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS t FROM bk),
      scored AS (SELECT pa, pb, n_ab, na.n_item AS n_a,
          nb.n_item AS n_b, t,
          CAST(n_ab AS DOUBLE) / CAST(na.n_item AS DOUBLE) AS conf,
          CAST(t * n_ab AS DOUBLE)
            / CAST(na.n_item * nb.n_item AS DOUBLE) AS lift
        FROM rules
        JOIN itemn na ON na.pk = rules.pa
        JOIN itemn nb ON nb.pk = rules.pb
        CROSS JOIN tot
        WHERE n_ab >= 3),
      r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY conf DESC, pa, pb)
          AS rank FROM scored)
      SELECT CAST(rank AS BIGINT) AS rank, pa, pb, n_ab, n_a, n_b, t,
        conf, lift
      FROM r WHERE rank <= 20"""))

  // --- q250: activity-decile MIGRATION matrix between the two halves
  // of the event window — who climbs, who churns (decile 0 = absent in
  // that half). Each half's deciles come from EXACT global ranks via
  // the q228 two-level pattern (per-(half, activity) bucket rank +
  // broadcast prefix — no data-sized single-partition window); the
  // decile is pure integer arithmetic on (rank, n_users). The midpoint
  // is a 1-row broadcast (documented benign scalar). ---------------------
  private val q250 = Q("q250_decile_migration",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events").select(col("user_id"), col("ts"))
      // integer div — a double /2 would lose precision above 2^53 nanos
      val mid = ev.agg(min(col("ts")).as("__mn"), max(col("ts")).as("__mx"))
        .select(expr("(__mn + __mx) div 2").as("mid"))
      val uc = ev.crossJoin(broadcast(mid))
        .select(col("user_id"),
          when(col("ts") < col("mid"), 1L).otherwise(2L).as("half"))
        .groupBy(col("half"), col("user_id"))
        .agg(count(lit(1)).as("x"))
      val wIn = Window.partitionBy(col("half"), col("x"))
        .orderBy(col("user_id"))
      val wB = Window.partitionBy(col("half")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wH = Window.partitionBy(col("half"))
      val prefix = uc.groupBy(col("half"), col("x"))
        .agg(count(lit(1)).as("__nb"))
        .withColumn("__pre", sum(col("__nb")).over(wB) - col("__nb"))
        .withColumn("n_h", sum(col("__nb")).over(wH))
        .select(col("half"), col("x"), col("__pre"), col("n_h"))
      val dec = uc
        .withColumn("__r", row_number().over(wIn).cast("long"))
        .join(broadcast(prefix), Seq("half", "x"))
        .withColumn("decile",
          expr("(__pre + __r - 1) * 10 div n_h + 1"))
        .select(col("user_id"), col("half"), col("decile"))
      val h1 = dec.filter(col("half") === 1L)
        .select(col("user_id"), col("decile").as("d1"))
      val h2 = dec.filter(col("half") === 2L)
        .select(col("user_id"), col("decile").as("d2"))
      h1.join(h2, Seq("user_id"), "full_outer")
        .select(coalesce(col("d1"), lit(0L)).as("d1"),
          coalesce(col("d2"), lit(0L)).as("d2"))
        .groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).as("n_users"))
    },
    Some("""WITH mid AS (SELECT
          (MIN(epoch_ns(ts)) + MAX(epoch_ns(ts))) // 2 AS mid FROM events),
      uc AS (SELECT CASE WHEN epoch_ns(ts) < mid THEN 1 ELSE 2 END
            AS half, user_id, CAST(COUNT(*) AS BIGINT) AS x
        FROM events CROSS JOIN mid GROUP BY 1, 2),
      r AS (SELECT half, user_id,
          ROW_NUMBER() OVER (PARTITION BY half ORDER BY x, user_id)
            AS rank,
          CAST(COUNT(*) OVER (PARTITION BY half) AS BIGINT) AS n_h
        FROM uc),
      dec AS (SELECT half, user_id,
          (rank - 1) * 10 // n_h + 1 AS decile FROM r),
      m AS (SELECT COALESCE(a.decile, 0) AS d1, COALESCE(b.decile, 0)
            AS d2
        FROM (SELECT user_id, decile FROM dec WHERE half = 1) a
        FULL OUTER JOIN
          (SELECT user_id, decile FROM dec WHERE half = 2) b
          USING (user_id))
      SELECT CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
        CAST(COUNT(*) AS BIGINT) AS n_users
      FROM m GROUP BY 1, 2"""))

  // --- q251: small-quantity-line revenue by brand (the TPC-H Q17
  // correlated-scalar-subquery shape): lines whose quantity is below
  // 20% of their part's average, i.e. 5·qty·cnt < Σqty CROSS-MULTIPLIED
  // so the "0.2·avg" comparison is exact integer. Catalyst decorrelates
  // to one partkey aggregate + one partkey equi-join (AQE broadcasts
  // the per-part stats when small); revenue in exact cents (q219's
  // rounding contract). --------------------------------------------
  private val q251 = Q("q251_small_qty_revenue",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_partkey"),
          round(col("l_quantity")).cast("long").as("qty"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val pstats = li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("cnt"), sum(col("qty")).as("sqty"))
      val p = Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      li.join(pstats, "l_partkey")
        .filter(lit(5L) * col("qty") * col("cnt") < col("sqty"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("cents")).as("rev_cents"))
    },
    Some("""SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
        CAST(SUM(cents) AS BIGINT) AS rev_cents
      FROM (SELECT l_partkey, CAST(ROUND(l_quantity) AS BIGINT) AS qty,
          CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem) l
      JOIN (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt,
          CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sqty
        FROM lineitem GROUP BY 1) st USING (l_partkey)
      JOIN part ON p_partkey = l_partkey
      WHERE 5 * qty * cnt < sqty
      GROUP BY 1"""))

  // --- q252: high-volume part suppliers (the TPC-H Q20 nested-
  // aggregate semi-join shape): suppliers that shipped ≥ 60 units of
  // at least one part in 1996 — the correlated `> SUM(...)` subquery
  // decorrelated into one (supp, part) aggregate, a HAVING filter, and
  // a per-supplier rollup joined to the broadcast supplier dim. ------
  private val q252 = Q("q252_part_promo",
    (s, dir) => {
      val hot = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01")
          && col("l_shipdate") < lit("1997-01-01"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("q"))
        .filter(col("q") >= 60L)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_hot_parts"), max(col("q")).as("max_q"))
      val sup = Tables(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))
      hot.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_hot_parts"),
          col("max_q"))
    },
    Some("""SELECT s_suppkey, s_name,
        CAST(n_hot_parts AS BIGINT) AS n_hot_parts,
        CAST(max_q AS BIGINT) AS max_q
      FROM (SELECT l_suppkey, COUNT(*) AS n_hot_parts, MAX(q) AS max_q
        FROM (SELECT l_suppkey, l_partkey,
            SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS q
          FROM lineitem
          WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          GROUP BY 1, 2)
        WHERE q >= 60 GROUP BY 1) h
      JOIN supplier ON s_suppkey = l_suppkey"""))

  // --- q253: sole-blame returned orders (the TPC-H Q21
  // EXISTS + NOT-EXISTS shape): suppliers with a returned line on a
  // multi-supplier order where NO other supplier's line was returned.
  // The two correlated existentials collapse into two order-keyed
  // aggregates (distinct suppliers; distinct RETURNING suppliers) —
  // both map-side combined — and the blame test becomes n_supp > 1 AND
  // n_ret_supp = 1; the oracle keeps the EXISTS form to prove the
  // rewrite. One orderkey shuffle + a broadcast supplier dim. --------
  private val q253 = Q("q253_waiting_suppliers",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          col("l_returnflag"))
      val ret = li.filter(col("l_returnflag") === "R")
        .select(col("ok"), col("sk")).distinct()
      val nSupp = li.groupBy(col("ok"))
        .agg(countDistinct(col("sk")).as("n_supp"))
      val nRet = ret.groupBy(col("ok"))
        .agg(count(lit(1)).as("n_ret_supp"))
      val sup = Tables(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))
      ret.join(nSupp, "ok").join(nRet, "ok")
        .filter(col("n_supp") > 1 && col("n_ret_supp") === 1)
        .groupBy(col("sk")).agg(count(lit(1)).as("numwait"))
        .join(broadcast(sup), col("sk") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
    },
    Some("""SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        WHERE l_returnflag = 'R') r
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE EXISTS (SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = r.l_orderkey
            AND l2.l_suppkey <> r.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = r.l_orderkey
            AND l3.l_suppkey <> r.l_suppkey AND l3.l_returnflag = 'R')
      GROUP BY 1, 2"""))

  // --- q254: l-diversity audit — the companion privacy gate to q235's
  // k-anonymity: a class of identical quasi-identifiers (nation, $1000
  // balance band) is safe only if its SENSITIVE attribute (market
  // segment) takes ≥ l distinct values; homogeneous classes leak the
  // attribute even when k-anonymous. Per l ∈ {2,3,5}: classes and rows
  // below the bar. One QI-grid-bounded aggregate; the l fan-out
  // explodes a 3-element literal over the summary table only. --------
  private val q254 = Q("q254_l_diversity",
    (s, dir) => {
      val classes = Tables(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nation"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"),
          col("c_mktsegment"))
        .groupBy(col("nation"), col("bal_band"))
        .agg(count(lit(1)).as("sz"),
          countDistinct(col("c_mktsegment")).as("n_distinct"))
      classes
        .select(explode(array(lit(2L), lit(3L), lit(5L))).as("l"),
          col("sz"), col("n_distinct"))
        .groupBy(col("l"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("sz")).as("n_rows"),
          sum(when(col("n_distinct") < col("l"), 1L).otherwise(0L))
            .as("n_homogeneous"),
          sum(when(col("n_distinct") < col("l"), col("sz"))
            .otherwise(0L)).as("n_rows_at_risk"))
        .withColumn("pct_at_risk", col("n_rows_at_risk").cast("double")
          / col("n_rows").cast("double"))
    },
    Some("""WITH classes AS (SELECT
          CAST(c_nationkey AS BIGINT) AS nation,
          CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
          CAST(COUNT(*) AS BIGINT) AS sz,
          CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_distinct
        FROM customer GROUP BY 1, 2),
      ls(l) AS (VALUES (CAST(2 AS BIGINT)), (3), (5))
      SELECT l, CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(SUM(sz) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN n_distinct < l THEN 1 ELSE 0 END) AS BIGINT)
          AS n_homogeneous,
        CAST(SUM(CASE WHEN n_distinct < l THEN sz ELSE 0 END) AS BIGINT)
          AS n_rows_at_risk,
        CAST(SUM(CASE WHEN n_distinct < l THEN sz ELSE 0 END) AS DOUBLE)
          / CAST(SUM(sz) AS DOUBLE) AS pct_at_risk
      FROM classes CROSS JOIN ls GROUP BY 1"""))

  // --- q257: EXACT triangle census of the part co-purchase graph —
  // the graph-analytics closer over q221's order-keyed pair stage.
  // Edges = part pairs co-ordered ≥ 2 times; counting uses the
  // degree-ordered orientation (Suri & Vassilvitskii 2011): each edge
  // points from its lower (degree, id) endpoint, so every out-degree
  // is O(√m) and the wedge self-join's fan-out is bounded — the
  // standard distributed-triangle shape, never the naive cube. Global
  // clustering coefficient = 3·triangles / wedges as an exact
  // integer pair + one division. -------------------------------------
  private val q257 = Q("q257_triangle_count",
    (s, dir) => {
      val d = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val pairs = d.select(col("ok"), col("pk").as("pa"))
        .join(d.select(col("ok").as("ok2"), col("pk").as("pb")),
          col("ok") === col("ok2") && col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2L)
        .select(col("pa"), col("pb"))
      // materialize = true: THIS caller's edge derivation is the
      // distinct + self-join + aggregate whose inlined copies ran 35
      // lineitem scans (round-11 plan evidence); cheap-edge callers
      // keep the default off
      graft.operators.Graphs.triangleCensus(pairs, materialize = true)
    },
    Some("""WITH d AS (SELECT DISTINCT l_orderkey AS ok,
          l_partkey AS pk FROM lineitem),
      e AS (SELECT pa, pb FROM (SELECT a.pk AS pa, b.pk AS pb,
            COUNT(*) AS n
          FROM d a JOIN d b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY 1, 2) WHERE n >= 2),
      deg AS (SELECT node, COUNT(*) AS deg
        FROM (SELECT pa AS node FROM e
          UNION ALL SELECT pb AS node FROM e)
        GROUP BY 1),
      o AS (SELECT
          CASE WHEN da < db OR (da = db AND pa < pb)
            THEN pa ELSE pb END AS src,
          CASE WHEN da < db OR (da = db AND pa < pb)
            THEN pb ELSE pa END AS dst,
          CASE WHEN da < db OR (da = db AND pa < pb)
            THEN db ELSE da END AS ddeg
        FROM (SELECT pa, pb, x.deg AS da, y.deg AS db
          FROM e JOIN deg x ON x.node = pa JOIN deg y ON y.node = pb)),
      tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (SELECT e1.dst AS v, e2.dst AS w
            FROM o e1 JOIN o e2 ON e1.src = e2.src
            WHERE e1.ddeg < e2.ddeg
              OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst)) wdg
        JOIN o ON o.src = wdg.v AND o.dst = wdg.w),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
          CAST(SUM(deg * (deg - 1)) // 2 AS BIGINT) AS n_wedges,
          CAST(SUM(deg) // 2 AS BIGINT) AS n_edges
        FROM deg)
      SELECT n_nodes, n_wedges, n_edges, n_triangles,
        CASE WHEN n_wedges > 0 THEN CAST(3 * n_triangles AS DOUBLE)
          / CAST(n_wedges AS DOUBLE) END AS gcc
      FROM st CROSS JOIN tri"""))

  // --- q259: EXACT CUSUM changepoint per event type — where did the
  // daily event rate shift? For the daily-count series x_1..x_T the
  // CUSUM deviation at day k is |Σ_{i≤k} x_i − (k/T)·Σx|; cross-
  // multiplied by T it is the exact BIGINT |T·S_k − k·S|. The argmax
  // (ties → earliest day) is the changepoint. The data-sized work is
  // ONE (type, day) aggregate; the cumulative and rank windows run
  // over the #types×#days summary table only. -----------------------
  private val q259 = Q("q259_changepoint",
    (s, dir) => {
      val daily = Tables(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("x"))
      val wc = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = daily.groupBy(col("event_type"))
        .agg(sum(col("x")).as("s_total"), count(lit(1)).as("t_days"),
          min(col("day")).as("d0"))
      val dev = daily
        .withColumn("s_k", sum(col("x")).over(wc))
        .join(broadcast(tot), "event_type")
        .withColumn("k", col("day") - col("d0") + 1L)
        .withColumn("dev", abs(col("t_days") * col("s_k")
          - col("k") * col("s_total")))
      val wr = Window.partitionBy(col("event_type"))
        .orderBy(col("dev").desc, col("day"))
      dev.withColumn("rk", row_number().over(wr))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("t_days"), col("s_total"),
          col("day").as("cp_day"), col("dev").as("cp_dev"),
          (col("dev").cast("double")
            / (col("t_days") * col("s_total")).cast("double"))
            .as("cp_stat"))
    },
    Some("""WITH daily AS (SELECT event_type,
          epoch_ns(ts) // 86400000000000 AS day,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
      tot AS (SELECT event_type, SUM(x) AS s_total,
          CAST(COUNT(*) AS BIGINT) AS t_days, MIN(day) AS d0
        FROM daily GROUP BY 1),
      dev AS (SELECT daily.event_type, day, t_days, s_total,
          abs(t_days * SUM(x) OVER (PARTITION BY daily.event_type
              ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW)
            - (day - d0 + 1) * s_total) AS dev
        FROM daily JOIN tot ON daily.event_type = tot.event_type)
      SELECT event_type, t_days, CAST(s_total AS BIGINT) AS s_total,
        CAST(day AS BIGINT) AS cp_day, CAST(dev AS BIGINT) AS cp_dev,
        CAST(dev AS DOUBLE) / CAST(t_days * s_total AS DOUBLE) AS cp_stat
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
          ORDER BY dev DESC, day) AS rk FROM dev)
      WHERE rk = 1"""))

  // --- q260: supplier SKYLINE (Pareto frontier) on (total revenue ↑,
  // worst ship latency ↓) — the classic multi-criteria "not dominated"
  // operator. Scale shape: NO pairwise dominance join. Both attributes
  // are exact integers, so dominance reduces to prefix maxima over the
  // latency order: a supplier is dominated iff a strictly-faster
  // latency class reaches ≥ its revenue, or its own class reaches more.
  // The per-class maxima table is DISTINCT-latency-sized (bounded by
  // the latency domain, not the supplier count), so the one ordered
  // window runs over a broadcast-size summary — the two-level-cumsum
  // discipline applied to prefix-max. ---------------------------------
  private val q260 = Q("q260_skyline",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"),
          col("l_shipdate"))
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      val per = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey"), col("cents"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("lat"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("cents")).as("rev_cents"),
          max(col("lat")).as("worst_lat"))
      graft.operators.Skyline.maxMin(per, "rev_cents", "worst_lat")
        .select(col("l_suppkey"), col("rev_cents"), col("worst_lat"))
    },
    Some("""WITH per AS (SELECT l_suppkey,
          CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
            AS BIGINT) AS rev_cents,
          CAST(MAX(datediff('day', o_orderdate, l_shipdate)) AS BIGINT)
            AS worst_lat
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1)
      SELECT a.l_suppkey, a.rev_cents, a.worst_lat FROM per a
      WHERE NOT EXISTS (SELECT 1 FROM per b
        WHERE b.rev_cents >= a.rev_cents AND b.worst_lat <= a.worst_lat
          AND (b.rev_cents > a.rev_cents OR b.worst_lat < a.worst_lat))"""))

  // --- q265: leakage-safe per-user ML feature extraction — the
  // train-a-churn-model frame: for every event, lag-1 value, the
  // rolling sum of the PREVIOUS 3 values (exclusive window — the
  // current row can never see itself: the classic leakage bug), the
  // count of prior events, and the NEXT event's value as the label.
  // Values in exact integer cents (the data's 2-decimal grid); all
  // windows partition by user — never global. -------------------------
  private val q265 = Q("q265_lag_features",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRoll = w.rowsBetween(-3, -1)
      val wCnt = w.rowsBetween(Window.unboundedPreceding, -1)
      ev.select(col("event_id"), col("user_id"),
          lag(col("cents"), 1).over(w).as("lag1_cents"),
          sum(col("cents")).over(wRoll).as("roll3_cents"),
          count(lit(1)).over(wCnt).as("n_prior"),
          lead(col("cents"), 1).over(w).as("label_cents"))
    },
    Some("""SELECT event_id, user_id,
        LAG(cents, 1) OVER w AS lag1_cents,
        CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT)
          AS roll3_cents,
        CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)
          AS n_prior,
        LEAD(cents, 1) OVER w AS label_cents
      FROM (SELECT event_id, user_id, epoch_ns(ts) AS ts,
          CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""))

  // --- q269: per-group EXACT linear trend — is each event type's
  // daily volume rising or falling? OLS slope over (day index, daily
  // count) kept as one integer numerator/denominator pair per group:
  // slope = (nΣxy − ΣxΣy) / (nΣxx − (Σx)²) — the q129 GWAS sums on
  // relational data. The data-sized work is ONE (type, day) aggregate;
  // the five sums fold the #days summary. -----------------------------
  private val q269 = Q("q269_group_trend",
    (s, dir) => {
      val daily = Tables(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("y"))
      daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("day")).as("sx"), sum(col("y")).as("sy"),
          sum(col("day") * col("day")).as("sxx"),
          sum(col("day") * col("y")).as("sxy"))
        .withColumn("slope_num",
          col("n_days") * col("sxy") - col("sx") * col("sy"))
        .withColumn("slope_den",
          col("n_days") * col("sxx") - col("sx") * col("sx"))
        .withColumn("slope", when(col("slope_den") =!= 0,
          col("slope_num").cast("double")
            / col("slope_den").cast("double")))
        .select(col("event_type"), col("n_days"), col("sy").as("total"),
          col("slope_num"), col("slope_den"), col("slope"))
    },
    Some("""SELECT event_type, n_days, total, slope_num, slope_den,
        CASE WHEN slope_den <> 0 THEN CAST(slope_num AS DOUBLE)
          / CAST(slope_den AS DOUBLE) END AS slope
      FROM (SELECT event_type,
          CAST(COUNT(*) AS BIGINT) AS n_days,
          CAST(SUM(y) AS BIGINT) AS total,
          CAST(COUNT(*) * SUM(day * y) - SUM(day) * SUM(y) AS BIGINT)
            AS slope_num,
          CAST(COUNT(*) * SUM(day * day) - SUM(day) * SUM(day)
            AS BIGINT) AS slope_den
        FROM (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2)
        GROUP BY 1)"""))

  // --- q270: view→purchase attribution pairs (the BATCH twin of the
  // watermarked stream-stream interval join, run through the IDENTICAL
  // `EventStream.attributionJoin` plan — watermarks no-op in batch):
  // every purchase matched to the same user's views within the
  // preceding hour, exact millisecond gaps. The oracle prices the
  // interval join straight. One user-keyed join; event-time bounds cap
  // the pair fan-out (and, streaming, the join state). ---------------
  private val q270 = Q("q270_attribution_pairs",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("timestamp_micros(ts div 1000)").as("ts"))
      graft.streaming.EventStream.attributionJoin(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"),
        horizon = "1 HOUR", lateness = "10 minutes")
    },
    Some("""SELECT p.user_id, p.event_id AS purchase_id,
        v.event_id AS view_id,
        ((epoch_ns(p.ts) - epoch_ns(v.ts)) // 1000000) AS gap_ms
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id
        AND v.ts <= p.ts
        AND v.ts >= p.ts - INTERVAL 1 HOUR"""))

  // --- q272: peak-concurrency profile — how many 30-minute sessions
  // overlap at once, per day? The classic ±1 boundary sweep: every
  // event opens (+1 at ts) and closes (−1 at ts+30 min, half-open so a
  // close and an open at the same instant DON'T overlap — the −1 sorts
  // first), and depth(t) is the running sum over the global boundary
  // order. Computed scale-safely with the two-level prefix: an
  // hour-bucket partitioned running sum plus a broadcast exclusive
  // prefix over the per-bucket totals (the bucket key is a monotone
  // function of the sort key, so bucket order composed with in-bucket
  // order IS the global order). Per day: max depth and the first
  // instant reaching it. ------------------------------------------------
  private val q272 = Q("q272_concurrency_profile",
    (s, dir) => {
      val HourNs = 3600L * 1000000000L
      val SessNs = 1800L * 1000000000L
      val DayNs = 86400L * 1000000000L
      val ev = Tables(s, dir, "events").select(col("ts"))
      val bounds = ev.select(col("ts").as("t"), lit(1L).as("delta"))
        .unionByName(ev.select((col("ts") + SessNs).as("t"),
          lit(-1L).as("delta")))
        .withColumn("__b", expr(s"t div ${HourNs}L"))
      val wIn = Window.partitionBy(col("__b"))
        .orderBy(col("t"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wB = Window.orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prefix = bounds.groupBy(col("__b"))
        .agg(sum(col("delta")).as("__bs"))
        .withColumn("__pre", sum(col("__bs")).over(wB) - col("__bs"))
        .select(col("__b"), col("__pre"))
      val depth = bounds
        .withColumn("__run", sum(col("delta")).over(wIn))
        .join(broadcast(prefix), "__b")
        .withColumn("depth", col("__pre") + col("__run"))
        .withColumn("day", expr(s"t div ${DayNs}L"))
      val wDay = Window.partitionBy(col("day"))
        .orderBy(col("depth").desc, col("t"), col("delta"))
      depth.withColumn("rn", row_number().over(wDay))
        .filter(col("rn") === 1)
        .select(col("day"), col("depth").as("max_depth"),
          col("t").as("at_ns"))
    },
    Some("""WITH b AS (
        SELECT epoch_ns(ts) AS t, CAST(1 AS BIGINT) AS delta FROM events
        UNION ALL
        SELECT epoch_ns(ts) + 1800000000000 AS t,
          CAST(-1 AS BIGINT) AS delta FROM events),
      d AS (SELECT t, delta,
          CAST(SUM(delta) OVER (ORDER BY t, delta
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS depth,
          t // 86400000000000 AS day
        FROM b)
      SELECT CAST(day AS BIGINT) AS day,
        CAST(depth AS BIGINT) AS max_depth, CAST(t AS BIGINT) AS at_ns
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY day
          ORDER BY depth DESC, t, delta) AS rn FROM d)
      WHERE rn = 1"""))

  // --- q273: Kaplan–Meier user-retention survival curve with RIGHT
  // CENSORING — lifetime = last − first active day; users still active
  // within 3 days of the observation edge are censored (they didn't
  // churn, we stopped watching). Per distinct lifetime t: risk set n_t
  // (lifetime ≥ t), churn events d_t, censors c_t, the KM factor
  // 1 − d_t/n_t, and the survival S(t) = Π_{t'≤t} factor — an ordered
  // LEFT FOLD over the ≤31-row factor list (the q266 discipline:
  // Spark `aggregate` == DuckDB `list_reduce`, bitwise-replayable).
  // Data-sized work is ONE user aggregate; everything after runs on
  // the distinct-lifetime summary. -------------------------------------
  private val q273 = Q("q273_survival_curve",
    (s, dir) => {
      val lives = Tables(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .groupBy(col("user_id"))
        .agg(min(col("day")).as("f"), max(col("day")).as("l"))
      val maxDay = lives.agg(max(col("l")).as("max_day"))
      val lab = lives.crossJoin(broadcast(maxDay))
        .select((col("l") - col("f")).as("lt"),
          (col("l") >= col("max_day") - 3L).as("censored"))
      val byT = lab.groupBy(col("lt"))
        .agg(sum(when(!col("censored"), 1L).otherwise(0L)).as("d_churn"),
          sum(when(col("censored"), 1L).otherwise(0L)).as("c_censored"))
      val wRisk = Window.orderBy(col("lt").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wIdx = Window.orderBy(col("lt"))
      val factors = byT
        .withColumn("n_risk",
          sum(col("d_churn") + col("c_censored")).over(wRisk))
        .withColumn("km_factor", lit(1.0) -
          col("d_churn").cast("double") / col("n_risk").cast("double"))
        .withColumn("__i", row_number().over(wIdx))
      val arr = factors
        .agg(array_sort(collect_list(struct(col("__i"), col("km_factor"))))
          .as("__fs"))
        .select(expr("transform(__fs, x -> x.km_factor)").as("__fa"))
      factors.crossJoin(broadcast(arr))
        .withColumn("survival",
          expr("aggregate(slice(__fa, 1, __i), CAST(1.0 AS DOUBLE), " +
            "(a, x) -> a * x)"))
        .select(col("lt"), col("n_risk"), col("d_churn"),
          col("c_censored"), col("km_factor"), col("survival"))
    },
    Some("""WITH lives AS (SELECT user_id,
          MIN(epoch_ns(ts) // 86400000000000) AS f,
          MAX(epoch_ns(ts) // 86400000000000) AS l
        FROM events GROUP BY 1),
      md AS (SELECT MAX(l) AS max_day FROM lives),
      lab AS (SELECT l - f AS lt, l >= max_day - 3 AS censored
        FROM lives CROSS JOIN md),
      byt AS (SELECT lt,
          CAST(SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
            AS d_churn,
          CAST(SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT)
            AS c_censored
        FROM lab GROUP BY 1),
      fac AS (SELECT lt, d_churn, c_censored,
          CAST(SUM(d_churn + c_censored) OVER (ORDER BY lt DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_risk,
          ROW_NUMBER() OVER (ORDER BY lt) AS i
        FROM byt),
      fac2 AS (SELECT *,
          1.0e0 - CAST(d_churn AS DOUBLE) / CAST(n_risk AS DOUBLE)
            AS km_factor
        FROM fac),
      fa AS (SELECT list(km_factor ORDER BY i) AS fl FROM fac2)
      SELECT lt, n_risk, d_churn, c_censored, km_factor,
        list_reduce(list_prepend(CAST(1.0 AS DOUBLE), fl[1:i]),
          (a, x) -> a * x) AS survival
      FROM fac2 CROSS JOIN fa"""))

  // --- q282: INTEGER-TOKEN PageRank over the supplier co-supply
  // graph — the iterative "importance flows along edges" operator
  // (Page et al. 1999) a link-graph curation pipeline ranks sources
  // with, in the exact-BIGINT discretization `Graphs.pageRankInt`
  // replays bit-for-bit in any engine (double PageRank sums in data
  // order and can never hash-match). The graph: per part, the
  // suppkey-sorted supplier CHAIN (consecutive links only — linear in
  // (part, supplier) pairs, never the quadratic per-part clique; up to
  // 52 suppliers share a part in this data). Directed low→high, so
  // every chain tail is a DANGLING node and the even-redistribution
  // path is exercised on real data. 5 unrolled rounds in the oracle,
  // exactly the q274 replay discipline. ----------------------------------
  private val q282 = Q("q282_pagerank",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ps = Tables(s, dir, "lineitem")
        .select(col("l_partkey").as("p"),
          col("l_suppkey").cast("long").as("sk"))
        .distinct()
      val w = Window.partitionBy(col("p")).orderBy(col("sk"))
      val edges = ps.withColumn("nx", lead(col("sk"), 1).over(w))
        .filter(col("nx").isNotNull)
        .select(col("sk").as("src"), col("nx").as("dst"))
        .distinct()
      val pr = graft.operators.Graphs.pageRankInt(edges, iters = 5)
      val nN = pr.agg(count(lit(1)).as("n_nodes"))
      val wTop = Window.orderBy(col("mass").desc, col("node"))
      pr.orderBy(col("mass").desc, col("node")).limit(15)
        .withColumn("rank", row_number().over(wTop).cast("long"))
        .crossJoin(broadcast(nN))
        .select(col("rank"), col("node"), col("mass"), col("n_nodes"))
    },
    Some {
      val rounds = (1 to 5).map { i =>
        s"""m$i AS (SELECT nodes.node,
            150000 + (85 * (coalesce(inf.s, 0)
              + dg.dm // nn.n)) // 100 AS mass
          FROM nodes
          CROSS JOIN nn
          CROSS JOIN (SELECT coalesce(SUM(m.mass), 0) AS dm
            FROM m${i - 1} m LEFT JOIN deg ON m.node = deg.src
            WHERE deg.src IS NULL) dg
          LEFT JOIN (SELECT e.dst AS node, SUM(m.mass // deg.d) AS s
            FROM m${i - 1} m
            JOIN deg ON m.node = deg.src
            JOIN edges e ON e.src = m.node
            GROUP BY 1) inf ON inf.node = nodes.node)"""
      }.mkString(",\n")
      s"""WITH ps AS (SELECT DISTINCT l_partkey AS p,
          CAST(l_suppkey AS BIGINT) AS sk FROM lineitem),
      ch AS (SELECT p, sk,
          lead(sk) OVER (PARTITION BY p ORDER BY sk) AS nx
        FROM ps),
      edges AS (SELECT DISTINCT sk AS src, nx AS dst FROM ch
        WHERE nx IS NOT NULL),
      nodes AS (SELECT src AS node FROM edges
        UNION SELECT dst FROM edges),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
      deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges
        GROUP BY 1),
      m0 AS (SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nodes),
      $rounds
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY mass DESC, node)
          AS BIGINT) AS rank,
        node, CAST(mass AS BIGINT) AS mass,
        nn.n AS n_nodes
      FROM m5 CROSS JOIN nn
      ORDER BY mass DESC, node LIMIT 15"""
    })

  // --- q283: DEGREE ASSORTATIVITY of the co-supplier graph (Newman
  // 2002's "do hubs link to hubs?" — the standard graph-health check
  // before any diffusion/ranking pass is trusted): exact Pearson over
  // the (deg(u), deg(v)) pairs of every directed edge endpoint (both
  // directions of the undirected chain edges), in the Spearman
  // discipline — five BIGINT sums, integer cross-products, and the
  // only floating ops are two IEEE-correctly-rounded sqrts and one
  // division, so the statistic replays bit-for-bit. One degree
  // aggregate + two node-keyed joins + one global sum: no pair set
  // beyond the edges themselves. ----------------------------------------
  private val q283 = Q("q283_assortativity",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ps = Tables(s, dir, "lineitem")
        .select(col("l_partkey").as("p"),
          col("l_suppkey").cast("long").as("sk"))
        .distinct()
      val w = Window.partitionBy(col("p")).orderBy(col("sk"))
      val fwd = ps.withColumn("nx", lead(col("sk"), 1).over(w))
        .filter(col("nx").isNotNull)
        .select(col("sk").as("u"), col("nx").as("v"))
        .distinct()
      val und = fwd.unionByName(
        fwd.select(col("v").as("u"), col("u").as("v")))
      val deg = und.groupBy(col("u").as("node"))
        .agg(count(lit(1)).as("d"))
      val pairs = und
        .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      pairs.agg(count(lit(1)).as("n"),
          sum(col("du")).as("sx"), sum(col("dv")).as("sy"),
          sum(col("du") * col("dv")).as("sxy"),
          sum(col("du") * col("du")).as("sxx"),
          sum(col("dv") * col("dv")).as("syy"))
        .withColumn("r",
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double"))
              * sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double"))))
        .select(col("n"), col("sxy"), col("r"))
    },
    Some("""WITH ps AS (SELECT DISTINCT l_partkey AS p,
          CAST(l_suppkey AS BIGINT) AS sk FROM lineitem),
      ch AS (SELECT p, sk,
          lead(sk) OVER (PARTITION BY p ORDER BY sk) AS nx
        FROM ps),
      fwd AS (SELECT DISTINCT sk AS u, nx AS v FROM ch
        WHERE nx IS NOT NULL),
      und AS (SELECT u, v FROM fwd UNION ALL SELECT v, u FROM fwd),
      deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM und
        GROUP BY 1),
      pairs AS (SELECT a.d AS du, b.d AS dv FROM und
        JOIN deg a ON und.u = a.node
        JOIN deg b ON und.v = b.node),
      sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(du) AS BIGINT) AS sx, CAST(SUM(dv) AS BIGINT) AS sy,
          CAST(SUM(du * dv) AS BIGINT) AS sxy,
          CAST(SUM(du * du) AS BIGINT) AS sxx,
          CAST(SUM(dv * dv) AS BIGINT) AS syy
        FROM pairs)
      SELECT n, sxy,
        CAST(n * sxy - sx * sy AS DOUBLE)
          / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
      FROM sums"""))

  // --- q288: K-ANONYMITY generalization ladder (Sweeney 2002 — the
  // privacy audit a data release runs on its quasi-identifiers): for
  // each generalization level of the QI set (nation, segment,
  // account-balance bucket at $1k → $5k → dropped), the equivalence-
  // class profile — k (the min class size), class count, and the
  // fraction of rows needing suppression under k ≥ 5 — so the release
  // picks the MINIMAL generalization that clears its k target. Exact
  // integer counts on the 2-decimal cents grid; one (level, qi-key)
  // shuffle, class profiles are summary-sized. ---------------------------
  private val q288 = Q("q288_k_anonymity",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nat"),
          col("c_mktsegment").as("seg"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
      val leveled = c.select(
        explode(array(
          struct(lit(0L).as("lvl"), concat_ws("|",
            col("nat"), col("seg"), expr("(cents + 100000000L) div 100000")).as("qi")),
          struct(lit(1L).as("lvl"), concat_ws("|",
            col("nat"), col("seg"), expr("(cents + 100000000L) div 500000")).as("qi")),
          struct(lit(2L).as("lvl"), concat_ws("|",
            col("nat"), col("seg")).as("qi")))).as("e"))
        .select(col("e.lvl").as("lvl"), col("e.qi").as("qi"))
      val classes = leveled.groupBy(col("lvl"), col("qi"))
        .agg(count(lit(1)).as("sz"))
      classes.groupBy(col("lvl"))
        .agg(min(col("sz")).as("k"),
          count(lit(1)).as("n_classes"),
          sum(col("sz")).as("n_rows"),
          sum(when(col("sz") < 5L, col("sz")).otherwise(0L))
            .as("n_suppressed"))
        .withColumn("frac_suppressed",
          col("n_suppressed").cast("double") / col("n_rows").cast("double"))
    },
    Some("""WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nat,
          c_mktsegment AS seg,
          CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer),
      leveled AS (
        SELECT 0 AS lvl, nat || '|' || seg || '|'
            || CAST((cents + 100000000) // 100000 AS VARCHAR) AS qi FROM c
        UNION ALL
        SELECT 1, nat || '|' || seg || '|'
            || CAST((cents + 100000000) // 500000 AS VARCHAR) FROM c
        UNION ALL
        SELECT 2, nat || '|' || seg FROM c),
      classes AS (SELECT lvl, qi, CAST(COUNT(*) AS BIGINT) AS sz
        FROM leveled GROUP BY 1, 2)
      SELECT CAST(lvl AS BIGINT) AS lvl,
        CAST(MIN(sz) AS BIGINT) AS k,
        CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(SUM(sz) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
          AS n_suppressed,
        CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
          / CAST(SUM(sz) AS DOUBLE) AS frac_suppressed
      FROM classes
      GROUP BY 1"""))

  // --- q309: L-DIVERSITY audit (Machanavajjhala 2007 — the privacy
  // gate k-anonymity alone misses: a class can be large yet carry ONE
  // sensitive value): the released microdata is customer QIs joined to
  // their orders' priorities (the sensitive attribute lives OUTSIDE
  // the quasi-identifiers), classes follow q288's generalization
  // ladder, and per level the audit reports the release's l (min
  // distinct sensitive values per class), the classes below l = 3,
  // and the row mass exposed in them. One join + one (lvl, qi)
  // aggregate; the ladder explode is a plan-constant ×3. ------------------
  private val q309 = Q("q309_l_diversity",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey"),
          col("c_nationkey").cast("long").as("nat"),
          col("c_mktsegment").as("seg"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
      val o = Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority").as("sens"))
      val micro = c.join(o, col("c_custkey") === col("o_custkey"))
      val leveled = micro.select(col("sens"),
        explode(array(
          struct(lit(0L).as("lvl"), concat_ws("|",
            col("nat"), col("seg"),
            expr("(cents + 100000000L) div 100000")).as("qi")),
          struct(lit(1L).as("lvl"), concat_ws("|",
            col("nat"), col("seg"),
            expr("(cents + 100000000L) div 500000")).as("qi")),
          struct(lit(2L).as("lvl"), concat_ws("|",
            col("nat"), col("seg")).as("qi")))).as("e"))
        .select(col("e.lvl").as("lvl"), col("e.qi").as("qi"),
          col("sens"))
      val classes = leveled.groupBy(col("lvl"), col("qi"))
        .agg(countDistinct(col("sens")).as("l"),
          count(lit(1)).as("sz"))
      classes.groupBy(col("lvl"))
        .agg(min(col("l")).as("min_l"),
          count(lit(1)).as("n_classes"),
          sum(when(col("l") < 3L, 1L).otherwise(0L))
            .as("classes_below_l3"),
          sum(when(col("l") < 3L, col("sz")).otherwise(0L))
            .as("rows_below_l3"),
          sum(col("sz")).as("n_rows"))
        .withColumn("frac_exposed",
          col("rows_below_l3").cast("double")
            / col("n_rows").cast("double"))
    },
    Some("""WITH c AS (SELECT c_custkey,
          CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
          CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer),
      micro AS (SELECT c.*, o.o_orderpriority AS sens
        FROM c JOIN orders o ON c_custkey = o_custkey),
      leveled AS (
        SELECT 0 AS lvl, nat || '|' || seg || '|'
            || CAST((cents + 100000000) // 100000 AS VARCHAR) AS qi,
          sens FROM micro
        UNION ALL
        SELECT 1, nat || '|' || seg || '|'
            || CAST((cents + 100000000) // 500000 AS VARCHAR), sens
          FROM micro
        UNION ALL
        SELECT 2, nat || '|' || seg, sens FROM micro),
      classes AS (SELECT lvl, qi,
          CAST(COUNT(DISTINCT sens) AS BIGINT) AS l,
          CAST(COUNT(*) AS BIGINT) AS sz
        FROM leveled GROUP BY 1, 2)
      SELECT CAST(lvl AS BIGINT) AS lvl,
        CAST(MIN(l) AS BIGINT) AS min_l,
        CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
          AS classes_below_l3,
        CAST(SUM(CASE WHEN l < 3 THEN sz ELSE 0 END) AS BIGINT)
          AS rows_below_l3,
        CAST(SUM(sz) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN l < 3 THEN sz ELSE 0 END) AS DOUBLE)
          / CAST(SUM(sz) AS DOUBLE) AS frac_exposed
      FROM classes GROUP BY 1"""))

  // --- q310: T-CLOSENESS audit (Li et al. 2007, the variational-
  // distance form — the q297 house metric): per generalization level,
  // the worst class's total-variation distance between its sensitive-
  // value distribution and the release-wide one. Exact integer
  // numerators on the common 2·sz·N grid: Σ_present |cnt_cs·N −
  // cnt_s·sz| + sz·(N − Σ_present cnt_s) (the second term folds every
  // sensitive value ABSENT from the class without a value spine); ONE
  // division per class, max over a classes-sized table. Completes the
  // k-anonymity (q288) / l-diversity (q309) release-audit triptych. -------
  private val q310 = Q("q310_t_closeness",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey"),
          col("c_nationkey").cast("long").as("nat"),
          col("c_mktsegment").as("seg"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
      val o = Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority").as("sens"))
      val micro = c.join(o, col("c_custkey") === col("o_custkey"))
      val leveled = micro.select(col("sens"),
        explode(array(
          struct(lit(0L).as("lvl"), concat_ws("|",
            col("nat"), col("seg"),
            expr("(cents + 100000000L) div 100000")).as("qi")),
          struct(lit(1L).as("lvl"), concat_ws("|",
            col("nat"), col("seg"),
            expr("(cents + 100000000L) div 500000")).as("qi")),
          struct(lit(2L).as("lvl"), concat_ws("|",
            col("nat"), col("seg")).as("qi")))).as("e"))
        .select(col("e.lvl").as("lvl"), col("e.qi").as("qi"),
          col("sens"))
      import org.apache.spark.sql.expressions.Window
      val cell = leveled.groupBy(col("lvl"), col("qi"), col("sens"))
        .agg(count(lit(1)).as("cnt_cs"))
      val glob = leveled.groupBy(col("lvl"), col("sens"))
        .agg(count(lit(1)).as("cnt_s"))
      val tot = leveled.groupBy(col("lvl"))
        .agg(count(lit(1)).as("n_total"))
      val w = Window.partitionBy(col("lvl"), col("qi"))
      val en = cell
        .join(broadcast(glob), Seq("lvl", "sens"))
        .join(broadcast(tot), Seq("lvl"))
        .withColumn("sz", sum(col("cnt_cs")).over(w))
        .withColumn("present", sum(col("cnt_s")).over(w))
        .withColumn("term", abs(col("cnt_cs") * col("n_total")
          - col("cnt_s") * col("sz")))
      val cls = en
        .groupBy(col("lvl"), col("qi"), col("sz"), col("present"),
          col("n_total"))
        .agg(sum(col("term")).as("abs_sum"))
        .withColumn("tv",
          (col("abs_sum")
            + col("sz") * (col("n_total") - col("present")))
            .cast("double")
            / (lit(2.0) * col("sz").cast("double")
              * col("n_total").cast("double")))
      cls.groupBy(col("lvl"))
        .agg(max(col("tv")).as("max_tv"),
          count(lit(1)).as("n_classes"),
          sum(when(col("tv") > 0.25, 1L).otherwise(0L))
            .as("classes_above_quarter"))
    },
    Some("""WITH c AS (SELECT c_custkey,
          CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
          CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer),
      micro AS (SELECT c.*, o.o_orderpriority AS sens
        FROM c JOIN orders o ON c_custkey = o_custkey),
      leveled AS (
        SELECT 0 AS lvl, nat || '|' || seg || '|'
            || CAST((cents + 100000000) // 100000 AS VARCHAR) AS qi,
          sens FROM micro
        UNION ALL
        SELECT 1, nat || '|' || seg || '|'
            || CAST((cents + 100000000) // 500000 AS VARCHAR), sens
          FROM micro
        UNION ALL
        SELECT 2, nat || '|' || seg, sens FROM micro),
      cell AS (SELECT lvl, qi, sens, CAST(COUNT(*) AS BIGINT)
          AS cnt_cs FROM leveled GROUP BY 1, 2, 3),
      gsum AS (SELECT lvl, sens, CAST(COUNT(*) AS BIGINT) AS cnt_s
        FROM leveled GROUP BY 1, 2),
      tot AS (SELECT lvl, CAST(COUNT(*) AS BIGINT) AS n_total
        FROM leveled GROUP BY 1),
      en AS (SELECT cell.lvl, cell.qi, cnt_cs, cnt_s, n_total,
          SUM(cnt_cs) OVER (PARTITION BY cell.lvl, cell.qi) AS sz,
          SUM(cnt_s) OVER (PARTITION BY cell.lvl, cell.qi) AS present
        FROM cell JOIN gsum ON cell.lvl = gsum.lvl
            AND cell.sens = gsum.sens
          JOIN tot ON cell.lvl = tot.lvl),
      cls AS (SELECT lvl, qi, sz, present, n_total,
          SUM(ABS(cnt_cs * n_total - cnt_s * sz)) AS abs_sum
        FROM en GROUP BY 1, 2, 3, 4, 5),
      tvc AS (SELECT lvl,
          CAST(abs_sum + sz * (n_total - present) AS DOUBLE)
            / (CAST(2.0 AS DOUBLE) * CAST(sz AS DOUBLE)
              * CAST(n_total AS DOUBLE)) AS tv
        FROM cls)
      SELECT CAST(lvl AS BIGINT) AS lvl, MAX(tv) AS max_tv,
        CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(SUM(CASE WHEN tv > 0.25 THEN 1 ELSE 0 END) AS BIGINT)
          AS classes_above_quarter
      FROM tvc GROUP BY 1"""))

  // --- q289: the ANONYMIZED RELEASE the q288 ladder chooses — apply
  // the MINIMAL generalization level whose k reaches 5, suppress the
  // residual small classes, and emit the released table (generalized
  // QI key, class size) plus the release accounting. The level choice
  // is computed IN the plan (no hardcoded level): class profiles are
  // summary-sized, the chosen level is a 1-row broadcast, and the
  // release is one semi-join of the leveled rows against their own
  // ≥k classes. ----------------------------------------------------------
  private val q289 = Q("q289_k_anon_release",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nat"),
          col("c_mktsegment").as("seg"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
      val leveled = c.select(
        explode(array(
          struct(lit(0L).as("lvl"), concat_ws("|",
            col("nat"), col("seg"),
            expr("(cents + 100000000L) div 100000")).as("qi")),
          struct(lit(1L).as("lvl"), concat_ws("|",
            col("nat"), col("seg"),
            expr("(cents + 100000000L) div 500000")).as("qi")),
          struct(lit(2L).as("lvl"), concat_ws("|",
            col("nat"), col("seg")).as("qi")))).as("e"))
        .select(col("e.lvl").as("lvl"), col("e.qi").as("qi"))
      val classes = leveled.groupBy(col("lvl"), col("qi"))
        .agg(count(lit(1)).as("sz"))
      val chosen = classes.groupBy(col("lvl"))
        .agg(min(col("sz")).as("k"))
        .filter(col("k") >= 5L)
        .agg(coalesce(min(col("lvl")), lit(2L)).as("lvl"))
      val released = classes.join(broadcast(chosen), "lvl")
        .filter(col("sz") >= 5L)
      val acct = released.agg(
        max(col("lvl")).as("chosen_lvl"),
        count(lit(1)).as("n_classes"),
        sum(col("sz")).as("n_released"))
      released.crossJoin(broadcast(acct))
        .select(col("qi"), col("sz"), col("chosen_lvl"),
          col("n_classes"), col("n_released"))
    },
    Some("""WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nat,
          c_mktsegment AS seg,
          CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer),
      leveled AS (
        SELECT 0 AS lvl, nat || '|' || seg || '|'
            || CAST((cents + 100000000) // 100000 AS VARCHAR) AS qi FROM c
        UNION ALL
        SELECT 1, nat || '|' || seg || '|'
            || CAST((cents + 100000000) // 500000 AS VARCHAR) FROM c
        UNION ALL
        SELECT 2, nat || '|' || seg FROM c),
      classes AS (SELECT lvl, qi, CAST(COUNT(*) AS BIGINT) AS sz
        FROM leveled GROUP BY 1, 2),
      chosen AS (SELECT CAST(coalesce(MIN(lvl), 2) AS BIGINT) AS lvl
        FROM (SELECT lvl, MIN(sz) AS k FROM classes GROUP BY 1)
        WHERE k >= 5),
      released AS (SELECT c.qi, c.sz, c.lvl
        FROM classes c JOIN chosen ch ON c.lvl = ch.lvl
        WHERE c.sz >= 5),
      acct AS (SELECT CAST(MAX(lvl) AS BIGINT) AS chosen_lvl,
          CAST(COUNT(*) AS BIGINT) AS n_classes,
          CAST(SUM(sz) AS BIGINT) AS n_released
        FROM released)
      SELECT qi, sz, chosen_lvl, n_classes, n_released
      FROM released CROSS JOIN acct"""))

  // --- q290: BENFORD first-significant-digit audit (Newcomb 1881 /
  // Benford 1938 — the standard fabricated-data screen an ingestion
  // pipeline runs on monetary columns): exact digit counts on the
  // cents grid pivoted into nine columns, then χ² against the Benford
  // expectations as ONE fixed-arity expression over full-precision
  // double literals — the nine addends combine in pinned left-assoc
  // order, so the statistic replays bit-for-bit (a SUM() over
  // per-digit rows would add in engine-dependent order). -----------------
  private val q290 = Q("q290_benford",
    (s, dir) => {
      val cents = Tables(s, dir, "lineitem")
        .select(round(col("l_extendedprice") * 100).cast("long")
          .as("cents"))
        .filter(col("cents") > 0)
        .select(substring(col("cents").cast("string"), 1, 1).as("dig"))
      val p = Seq("0.3010299956639812", "0.17609125905568124",
        "0.12493873660829992", "0.09691001300805642",
        "0.07918124604762482", "0.06694678963061322",
        "0.05799194697768673", "0.05115252244738129",
        "0.04575749056067514")
      val aggs = (1 to 9).map(d =>
        sum(when(col("dig") === d.toString, 1L).otherwise(0L))
          .as(s"o$d"))
      val counts = cents.agg(count(lit(1)).as("n"), aggs: _*)
      val chi2 = (1 to 9).map { d =>
        val e = s"(CAST(n AS DOUBLE) * ${p(d - 1)})"
        s"((CAST(o$d AS DOUBLE) - $e) * (CAST(o$d AS DOUBLE) - $e)) / $e"
      }.mkString(" + ")
      counts.withColumn("chi2", expr(chi2))
    },
    Some {
      val p = Seq("0.3010299956639812", "0.17609125905568124",
        "0.12493873660829992", "0.09691001300805642",
        "0.07918124604762482", "0.06694678963061322",
        "0.05799194697768673", "0.05115252244738129",
        "0.04575749056067514")
      val os = (1 to 9).map(d =>
        s"CAST(SUM(CASE WHEN dig = '$d' THEN 1 ELSE 0 END) AS BIGINT) AS o$d")
        .mkString(",\n          ")
      val chi2 = (1 to 9).map { d =>
        val e = s"(CAST(n AS DOUBLE) * ${p(d - 1)})"
        s"((CAST(o$d AS DOUBLE) - $e) * (CAST(o$d AS DOUBLE) - $e)) / $e"
      }.mkString(" + ")
      s"""WITH c AS (SELECT substr(CAST(CAST(ROUND(l_extendedprice
            * 100) AS BIGINT) AS VARCHAR), 1, 1) AS dig
          FROM lineitem
          WHERE CAST(ROUND(l_extendedprice * 100) AS BIGINT) > 0),
        k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          $os
        FROM c)
      SELECT n, o1, o2, o3, o4, o5, o6, o7, o8, o9, $chi2 AS chi2
      FROM k"""
    })

  // --- q292: SEASONAL-BASELINE anomaly hours (the ops-monitoring
  // companion to q259's changepoint): hourly event counts vs their
  // (weekday, hour-of-day) seasonal baseline, ranked by the EXACT
  // cross-multiplied residual |obs·n_cells − cell_sum| (baseline =
  // cell_sum/n_cells is rational; multiplying through by n_cells keeps
  // the ordering integer — no double enters the ranking). Data-sized
  // work is ONE hour-bucket aggregate; the baseline join and ranking
  // run over the #hours summary table. ------------------------------------
  private val q292 = Q("q292_seasonal_anomaly",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = Tables(s, dir, "events")
        .select(expr("ts div 3600000000000").as("hour_bucket"))
        .groupBy(col("hour_bucket")).agg(count(lit(1)).as("obs"))
        .withColumn("weekday",
          expr("((hour_bucket div 24) + 4) % 7"))
        .withColumn("hod", expr("hour_bucket % 24"))
      val base = hourly.groupBy(col("weekday"), col("hod"))
        .agg(sum(col("obs")).as("cell_sum"),
          count(lit(1)).as("n_cells"))
      val resid = hourly.join(broadcast(base), Seq("weekday", "hod"))
        .withColumn("dev",
          abs(col("obs") * col("n_cells") - col("cell_sum")))
      val w = Window.orderBy(col("dev").desc, col("hour_bucket"))
      resid.orderBy(col("dev").desc, col("hour_bucket")).limit(10)
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("baseline", col("cell_sum").cast("double")
          / col("n_cells").cast("double"))
        .select(col("rank"), col("hour_bucket"), col("weekday"),
          col("hod"), col("obs"), col("dev"), col("baseline"))
    },
    Some("""WITH hourly AS (SELECT epoch_ns(ts) // 3600000000000
          AS hour_bucket, CAST(COUNT(*) AS BIGINT) AS obs
        FROM events GROUP BY 1),
      h2 AS (SELECT hour_bucket, obs,
          ((hour_bucket // 24) + 4) % 7 AS weekday,
          hour_bucket % 24 AS hod
        FROM hourly),
      base AS (SELECT weekday, hod,
          CAST(SUM(obs) AS BIGINT) AS cell_sum,
          CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM h2 GROUP BY 1, 2)
      SELECT CAST(ROW_NUMBER() OVER
          (ORDER BY abs(obs * n_cells - cell_sum) DESC, hour_bucket)
          AS BIGINT) AS rank,
        hour_bucket, weekday, hod, obs,
        CAST(abs(obs * n_cells - cell_sum) AS BIGINT) AS dev,
        CAST(cell_sum AS DOUBLE) / CAST(n_cells AS DOUBLE) AS baseline
      FROM h2 JOIN base USING (weekday, hod)
      ORDER BY dev DESC, hour_bucket LIMIT 10"""))

  // --- q294: REFERENTIAL-INTEGRITY audit across the star schema (the
  // ingestion gate a 100 TB load runs before anything downstream
  // trusts a join): orphan counts for every FK edge — lineitem→orders,
  // lineitem→part, lineitem→supplier, orders→customer,
  // customer→nation, supplier→nation — each ONE left-outer join whose
  // single aggregate emits n_rows AND n_orphans together (count(*) +
  // sum(pk IS NULL)), so every fact table is scanned exactly once per
  // edge and ZERO Spark jobs run at plan-build time (the round-7 shape
  // embedded fact.count() as a literal: six driver-side actions and a
  // doubled scan per edge — PlanAudit's eager-action sweep now catches
  // that class mechanically). A NULL foreign key joins to nothing and
  // counts as an orphan in BOTH engines (left join + pk IS NULL ==
  // NOT EXISTS semantics), so the row stays correct on dirty data —
  // the previous NOT-IN oracle collapsed to zero rows if the dimension
  // ever held a NULL key. ---------------------------------------------------
  private val q294 = Q("q294_ref_integrity",
    (s, dir) => {
      def orphans(fact: DataFrame, fk: String, dim: DataFrame,
          pk: String, edge: String): DataFrame = {
        // no broadcast hint: nation/part/supplier qualify but orders
        // does not at scale — AQE picks broadcast per edge at runtime
        fact.join(dim.select(col(pk)).distinct(),
            col(fk) === col(pk), "left_outer")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col(pk).isNull, 1L).otherwise(0L)).as("n_orphans"))
          .select(lit(edge).as("edge"), col("n_rows"), col("n_orphans"))
      }
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val su = Tables(s, dir, "supplier")
      val p = Tables(s, dir, "part")
      val na = Tables(s, dir, "nation")
      orphans(li.select(col("l_orderkey")), "l_orderkey",
          o, "o_orderkey", "lineitem->orders")
        .unionByName(orphans(li.select(col("l_partkey")), "l_partkey",
          p, "p_partkey", "lineitem->part"))
        .unionByName(orphans(li.select(col("l_suppkey")), "l_suppkey",
          su, "s_suppkey", "lineitem->supplier"))
        .unionByName(orphans(o.select(col("o_custkey")), "o_custkey",
          c, "c_custkey", "orders->customer"))
        .unionByName(orphans(c.select(col("c_nationkey")),
          "c_nationkey", na, "n_nationkey", "customer->nation"))
        .unionByName(orphans(su.select(col("s_nationkey")),
          "s_nationkey", na, "n_nationkey", "supplier->nation"))
        .withColumn("orphan_rate", col("n_orphans").cast("double")
          / col("n_rows").cast("double"))
    },
    Some("""WITH e1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans
        FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders)
          ON l_orderkey = o_orderkey),
      e2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(SUM(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans
        FROM lineitem LEFT JOIN (SELECT DISTINCT p_partkey FROM part)
          ON l_partkey = p_partkey),
      e3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(SUM(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans
        FROM lineitem LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier)
          ON l_suppkey = s_suppkey),
      e4 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans
        FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer)
          ON o_custkey = c_custkey),
      e5 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(SUM(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans
        FROM customer LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation)
          ON c_nationkey = n_nationkey),
      e6 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(SUM(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans
        FROM supplier LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation)
          ON s_nationkey = n_nationkey),
      u AS (
        SELECT 'lineitem->orders' AS edge, n_rows, n_orphans FROM e1
        UNION ALL
        SELECT 'lineitem->part', n_rows, n_orphans FROM e2
        UNION ALL
        SELECT 'lineitem->supplier', n_rows, n_orphans FROM e3
        UNION ALL
        SELECT 'orders->customer', n_rows, n_orphans FROM e4
        UNION ALL
        SELECT 'customer->nation', n_rows, n_orphans FROM e5
        UNION ALL
        SELECT 'supplier->nation', n_rows, n_orphans FROM e6)
      SELECT edge, n_rows, n_orphans,
        CAST(n_orphans AS DOUBLE) / CAST(n_rows AS DOUBLE) AS orphan_rate
      FROM u"""))

  // --- q295: ANALYZE-style table profile (the stats collection a
  // cost-based optimizer feeds on — per column: exact NDV, null count,
  // min/max on engine-stable encodings): one aggregate pass over
  // lineitem for a fixed column set; dates profile as ISO strings
  // (identical text in any engine), monetary columns on the cents
  // grid. --------------------------------------------------------------------
  private val q295 = Q("q295_table_profile",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .withColumn("cents",
          round(col("l_extendedprice") * 100).cast("long"))
      // one countDistinct PER aggregate: several distincts in one agg
      // force a #distincts-way Expand of the whole scan (measured ~3×
      // slower here); independent single-distinct aggregates keep each
      // partial-aggregated and combine as 1-row broadcasts
      def ndv(c: String, as: String) =
        broadcast(li.agg(countDistinct(col(c)).as(as)))
      li.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))
            .as("nulls_shipdate"),
          min(col("l_shipdate").cast("string")).as("min_shipdate"),
          max(col("l_shipdate").cast("string")).as("max_shipdate"),
          min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"),
          sum(col("cents")).as("sum_cents"))
        .crossJoin(ndv("l_orderkey", "ndv_orderkey"))
        .crossJoin(ndv("l_partkey", "ndv_partkey"))
        .crossJoin(ndv("l_suppkey", "ndv_suppkey"))
        .crossJoin(ndv("l_returnflag", "ndv_returnflag"))
        .select(col("n_rows"), col("ndv_orderkey"), col("ndv_partkey"),
          col("ndv_suppkey"), col("ndv_returnflag"),
          col("nulls_shipdate"), col("min_shipdate"),
          col("max_shipdate"), col("min_cents"), col("max_cents"),
          col("sum_cents"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv_orderkey,
        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS ndv_partkey,
        CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS ndv_suppkey,
        CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS ndv_returnflag,
        CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS nulls_shipdate,
        CAST(MIN(l_shipdate) AS VARCHAR) AS min_shipdate,
        CAST(MAX(l_shipdate) AS VARCHAR) AS max_shipdate,
        CAST(MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
          AS BIGINT) AS min_cents,
        CAST(MAX(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
          AS BIGINT) AS max_cents,
        CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
          AS BIGINT) AS sum_cents
      FROM lineitem"""))

  // --- q296: EVENT-TYPE MARKOV TRANSITIONS (the first-order sequence
  // model a behavioral pipeline estimates before anything fancier):
  // per-user next-event pairs from ONE (user)-partitioned lag window
  // under a tie-free (ts, event_id) order, pair counts, and the
  // row-normalized transition probability as an exact count ratio.
  // The window is user-keyed (balanced), the pair table is
  // #types²-sized. --------------------------------------------------------
  private val q296 = Q("q296_markov_transitions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
      val pairs = e
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromTot = pairs.groupBy(col("from_type"))
        .agg(sum(col("n")).as("n_from"))
      pairs.join(broadcast(fromTot), "from_type")
        .withColumn("p",
          col("n").cast("double") / col("n_from").cast("double"))
        .select(col("from_type"), col("to_type"), col("n"),
          col("n_from"), col("p"))
    },
    Some("""WITH seq AS (SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY event_id) AS next_type
        FROM events),
      pairs AS (SELECT event_type AS from_type, next_type AS to_type,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      ft AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
        FROM pairs GROUP BY 1)
      SELECT from_type, to_type, n, n_from,
        CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE) AS p
      FROM pairs JOIN ft USING (from_type)"""))

  // --- q297: behavioral DRIFT between time halves (the
  // distribution-shift monitor a sequence model is retrained on): the
  // q296 transition matrix estimated on each half of the event-id
  // range, compared per from-state by TOTAL-VARIATION distance. Within
  // one from-state the two halves' probabilities share fixed
  // denominators d1, d2, so TV = ½·Σ|n1·d2 − n2·d1| / (d1·d2) is ONE
  // exact BIGINT sum and one final division — no cross-row double
  // accumulation. Split at the median event_id, computed exactly from
  // the max (ids are dense 0..N−1 in this data; the rule is the
  // deterministic id < (max+1)/2 both engines replay). ---------------------
  private val q297 = Q("q297_transition_drift",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
      val mid = broadcast(
        e.agg(expr("(MAX(event_id) + 1) DIV 2").as("mid")))
      val halves = e.crossJoin(mid)
        .withColumn("half", when(col("event_id") < col("mid"), 0L)
          .otherwise(1L))
      val w = Window.partitionBy(col("half"), col("user_id"))
        .orderBy(col("event_id"))
      val pairs = halves
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("half"), col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val tot = pairs.groupBy(col("half"), col("from_type"))
        .agg(sum(col("n")).as("d"))
      // the denominators are FROM-STATE properties — they must come
      // from the per-half totals, never the pair row (a (from, to)
      // present in only one half would otherwise zero its whole term)
      val a = pairs.filter(col("half") === 0L)
        .select(col("from_type"), col("to_type"), col("n").as("n1"))
      val b = pairs.filter(col("half") === 1L)
        .select(col("from_type"), col("to_type"), col("n").as("n2"))
      val d1 = tot.filter(col("half") === 0L)
        .select(col("from_type"), col("d").as("d1"))
      val d2 = tot.filter(col("half") === 1L)
        .select(col("from_type"), col("d").as("d2"))
      a.join(b, Seq("from_type", "to_type"), "full_outer")
        .withColumn("n1", coalesce(col("n1"), lit(0L)))
        .withColumn("n2", coalesce(col("n2"), lit(0L)))
        .join(broadcast(d1), Seq("from_type"), "left")
        .join(broadcast(d2), Seq("from_type"), "left")
        .withColumn("d1", coalesce(col("d1"), lit(0L)))
        .withColumn("d2", coalesce(col("d2"), lit(0L)))
        .groupBy(col("from_type"))
        .agg(max(col("d1")).as("d1"), max(col("d2")).as("d2"),
          sum(abs(col("n1") * col("d2") - col("n2") * col("d1")))
            .as("tv_num"))
        .withColumn("tv", when(col("d1") > 0 && col("d2") > 0,
          col("tv_num").cast("double")
            / (lit(2.0) * (col("d1") * col("d2")).cast("double"))))
        .select(col("from_type"), col("d1"), col("d2"), col("tv_num"),
          col("tv"))
    },
    Some("""WITH mid AS (SELECT (MAX(event_id) + 1) // 2 AS mid
        FROM events),
      seq AS (SELECT CASE WHEN event_id < mid.mid THEN 0 ELSE 1 END
          AS half, user_id, event_id, event_type
        FROM events CROSS JOIN mid),
      nx AS (SELECT half, event_type,
          lead(event_type) OVER (PARTITION BY half, user_id
            ORDER BY event_id) AS next_type
        FROM seq),
      pairs AS (SELECT half, event_type AS from_type,
          next_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2, 3),
      tot AS (SELECT half, from_type, CAST(SUM(n) AS BIGINT) AS d
        FROM pairs GROUP BY 1, 2),
      j AS (SELECT coalesce(a.from_type, b.from_type) AS from_type,
          coalesce(a.n, 0) AS n1, coalesce(b.n, 0) AS n2
        FROM (SELECT * FROM pairs WHERE half = 0) a
        FULL OUTER JOIN (SELECT * FROM pairs WHERE half = 1) b
          ON a.from_type = b.from_type AND a.to_type = b.to_type),
      jd AS (SELECT j.from_type, j.n1, j.n2,
          coalesce(t1.d, 0) AS d1, coalesce(t2.d, 0) AS d2
        FROM j
        LEFT JOIN (SELECT from_type, d FROM tot WHERE half = 0) t1
          ON t1.from_type = j.from_type
        LEFT JOIN (SELECT from_type, d FROM tot WHERE half = 1) t2
          ON t2.from_type = j.from_type)
      SELECT from_type,
        CAST(MAX(d1) AS BIGINT) AS d1,
        CAST(MAX(d2) AS BIGINT) AS d2,
        CAST(SUM(abs(n1 * d2 - n2 * d1)) AS BIGINT) AS tv_num,
        CASE WHEN MAX(d1) > 0 AND MAX(d2) > 0
          THEN CAST(SUM(abs(n1 * d2 - n2 * d1)) AS DOUBLE)
            / (CAST(2 AS DOUBLE)
              * CAST(MAX(d1) * MAX(d2) AS DOUBLE)) END AS tv
      FROM jd GROUP BY 1"""))

  // --- q300: SKETCHED table profile — the 100 TB twin of q295: per-
  // column NDV from deterministic 4096-register HyperLogLog sketches
  // (the q287 house construction: md5-derived 60-bit hashes, exact-
  // BIGINT harmonic sum, registers mergeable by construction — q291's
  // proof), ONE scan for ALL columns where q295 deliberately pays one
  // countDistinct scan per column (its documented Expand trade-off).
  // Shape: explode to (cname, value) pairs — the fan-out collapses in
  // the map-side partials of the (cname, bucket) aggregate (≤ 4·4096
  // groups), so the shuffle ships registers, not rows. Emitted
  // columns are engine-stable integers plus the raw α·m²·2^49/z
  // estimate (pure fixed-arity arithmetic); the ln-based small-range
  // correction stays client-side (TrainingData.hllEstimate — ln is
  // not correctly rounded, the iHS rule), where SketchProfileSpec
  // gates it within 5 % of q295's exact NDVs at sf0.01 AND sf0.1. -----------
  private val q300 = Q("q300_table_profile_sketch",
    (s, dir) => {
      // testdata parquet is single-row-group ⇒ the scan is ONE task;
      // fan the 4 key columns out so the md5/register pipeline uses
      // every core (SynthGeno's documented pattern — a real multi-file
      // dataset would not need it)
      val li = Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      val cols = Seq(
        "l_orderkey" -> col("l_orderkey").cast("string"),
        "l_partkey" -> col("l_partkey").cast("string"),
        "l_suppkey" -> col("l_suppkey").cast("string"),
        "l_returnflag" -> col("l_returnflag"))
      val pairs = li.select(explode(array(cols.map { case (n, c) =>
          struct(lit(n).as("cname"), c.as("v")) }: _*)).as("p"))
        .select(col("p.cname").as("cname"), col("p.v").as("v"))
        .filter(col("v").isNotNull)
      val reg = pairs
        .select(col("cname"),
          conv(substring(md5(col("v")), 1, 15), 16, 10).cast("long")
            .as("i64"))
        .select(col("cname"), (col("i64") % 4096).as("bucket"),
          expr("i64 div 4096").as("w"))
        .withColumn("rho", when(col("w") === 0, lit(49L))
          .otherwise(lit(49L) - length(bin(col("w"))).cast("long")))
        .groupBy(col("cname"), col("bucket")).agg(max(col("rho")).as("m"))
      // the column list is a plan constant — a literal spine, never a
      // second scan of the table
      val cnameSpine = {
        import s.implicits._
        cols.map(_._1).toDF("cname")
      }
      val spine = s.range(0, 4096).select(col("id").as("bucket"))
        .crossJoin(broadcast(cnameSpine))
      spine.join(reg, Seq("cname", "bucket"), "left")
        .withColumn("m", coalesce(col("m"), lit(0L)))
        .groupBy(col("cname"))
        .agg(sum(expr("CAST(power(2, 49 - m) AS BIGINT)")).as("z"),
          sum(when(col("m") === 0, 1L).otherwise(0L)).as("v"))
        .withColumn("ndv_raw",
          (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(4096.0)))
            * lit(4096.0) * lit(4096.0) * lit(562949953421312.0)
            / col("z").cast("double"))
    },
    Some("""WITH pairs AS (
        SELECT 'l_orderkey' AS cname, CAST(l_orderkey AS VARCHAR) AS v
          FROM lineitem
        UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR)
          FROM lineitem
        UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR)
          FROM lineitem
        UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem),
      h AS (SELECT cname,
          CAST('0x' || substr(md5(v), 1, 15) AS BIGINT) AS i64
        FROM pairs WHERE v IS NOT NULL),
      r AS (SELECT cname, i64 % 4096 AS bucket, i64 // 4096 AS w FROM h),
      rr AS (SELECT cname, bucket,
          max(CASE WHEN w = 0 THEN 49
              ELSE 49 - length(bin(w)) END) AS m
        FROM r GROUP BY 1, 2),
      spine AS (SELECT c.cname, b.bucket
        FROM (SELECT DISTINCT cname FROM pairs) c,
          (SELECT unnest(range(0, 4096)) AS bucket) b),
      regs AS (SELECT spine.cname, spine.bucket, coalesce(rr.m, 0) AS m
        FROM spine LEFT JOIN rr USING (cname, bucket))
      SELECT cname,
        CAST(SUM(CAST(power(2, 49 - m) AS BIGINT)) AS BIGINT) AS z,
        CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v,
        (CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
          + CAST(1.079 AS DOUBLE) / CAST(4096.0 AS DOUBLE)))
          * CAST(4096.0 AS DOUBLE) * CAST(4096.0 AS DOUBLE)
          * CAST(562949953421312.0 AS DOUBLE) / CAST(SUM(
            CAST(power(2, 49 - m) AS BIGINT)) AS DOUBLE) AS ndv_raw
      FROM regs GROUP BY cname"""))

  // --- q313: MERGEABLE HISTOGRAM QUANTILES — the profile pass's
  // quantile twin of q300's sketched NDV: fixed-width bucket counts
  // (price: 512-unit cells, quantity: unit cells) are additive across
  // shards/partitions (map-side combine does the merging), so one scan
  // serves p50/p90/p99 for every metric at any scale; estimate = the
  // bucket upper edge at the first cumulative count >= ceil(p*n/100),
  // error bounded by one bucket width by construction (HistQuantileSpec
  // gates it against the exact percentile). All bucket math is
  // floor()-of-IEEE-exact-division, never double->int CAST (Spark
  // truncates, DuckDB rounds — floor agrees everywhere). The probe fan
  // is a 3-row broadcast crossJoin; the cumsum window partitions by
  // metric, never global. ------------------------------------------------
  private val q313 = Q("q313_quantile_hist",
    (s, dir) => {
      val h = Tables(s, dir, "lineitem")
        .select(explode(array(
          struct(lit("price").as("metric"),
            floor(col("l_extendedprice") / lit(512.0)).cast("long")
              .as("bucket")),
          struct(lit("qty").as("metric"),
            floor(col("l_quantity")).cast("long").as("bucket")))).as("e"))
        .select(col("e.metric").as("metric"), col("e.bucket").as("bucket"))
        .groupBy(col("metric"), col("bucket"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("metric")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy(col("metric"))
      val cum = h
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(wTot))
      val probes = {
        import s.implicits._
        broadcast(Seq(50L, 90L, 99L).toDF("p"))
      }
      cum.crossJoin(probes)
        .filter(col("cum") >= expr("(p * n + 99) div 100"))
        .groupBy(col("metric"), col("p"))
        .agg(max(col("n")).as("n"), min(col("bucket")).as("bucket"))
        .withColumn("est", (col("bucket") + 1).cast("double")
          * when(col("metric") === "price", lit(512.0)).otherwise(lit(1.0)))
        .select(col("metric"), col("p"), col("n"), col("bucket"),
          col("est"))
    },
    Some("""WITH h AS (SELECT e.metric AS metric, e.bucket AS bucket,
          COUNT(*) AS c
        FROM (SELECT unnest([
            {'metric': 'price',
             'bucket': CAST(floor(l_extendedprice / 512.0) AS BIGINT)},
            {'metric': 'qty',
             'bucket': CAST(floor(l_quantity) AS BIGINT)}]) AS e
          FROM lineitem)
        GROUP BY 1, 2),
      c AS (SELECT metric, bucket, c,
          SUM(c) OVER (PARTITION BY metric ORDER BY bucket) AS cum,
          SUM(c) OVER (PARTITION BY metric) AS n
        FROM h)
      SELECT metric, CAST(p AS BIGINT) AS p, CAST(MAX(n) AS BIGINT) AS n,
        CAST(MIN(bucket) AS BIGINT) AS bucket,
        CAST(MIN(bucket) + 1 AS DOUBLE)
          * CASE WHEN metric = 'price' THEN 512.0 ELSE 1.0 END AS est
      FROM c, (SELECT unnest([50, 90, 99]) AS p) ps
      WHERE cum >= (p * n + 99) // 100
      GROUP BY metric, p"""))

  // --- q318: LABEL-PROPAGATION COMMUNITIES over the co-supplier chain
  // graph (same edge set as q282's PageRank) — the community layer of
  // the graph-health triptych (q257 census, q283 assortativity, q282
  // ranking): 4 synchronous rounds, most-frequent label among
  // neighbors + self (retention damps sync-LPA oscillation) with
  // smallest-label tie-break (an aggregate argmax via max(struct(c,
  // −label)), never a data-sized window), community sizes reported.
  // Per round: one dst-keyed label join + two keyed aggregates — the
  // q282 per-round-linear discipline, lineage truncated per round. ------
  private val q318 = Q("q318_label_propagation",
    (s, dir) => {
      val ps = Tables(s, dir, "lineitem")
        .select(col("l_partkey").as("p"),
          col("l_suppkey").cast("long").as("sk"))
        .distinct()
      val w = Window.partitionBy(col("p")).orderBy(col("sk"))
      val edges = ps.withColumn("nx", lead(col("sk"), 1).over(w))
        .filter(col("nx").isNotNull)
        .select(col("sk").as("src"), col("nx").as("dst"))
        .distinct()
      graft.operators.Graphs.labelPropagation(edges, iters = 4)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_nodes"))
    },
    Some {
      val rounds = (1 to 4).map { i =>
        s"""n$i AS (SELECT node, nl, COUNT(*) AS c
          FROM (SELECT e.src AS node, l.label AS nl
              FROM e JOIN l${i - 1} l ON l.node = e.dst
            UNION ALL SELECT node, label FROM l${i - 1})
          GROUP BY 1, 2),
        l$i AS (SELECT node, nl AS label
          FROM (SELECT node, nl, ROW_NUMBER() OVER (PARTITION BY node
              ORDER BY c DESC, nl) AS rn FROM n$i)
          WHERE rn = 1)"""
      }.mkString(",\n")
      s"""WITH ps AS (SELECT DISTINCT l_partkey AS p,
          CAST(l_suppkey AS BIGINT) AS sk FROM lineitem),
      ch AS (SELECT p, sk,
          lead(sk) OVER (PARTITION BY p ORDER BY sk) AS nx FROM ps),
      ed AS (SELECT DISTINCT sk AS src, nx AS dst FROM ch
        WHERE nx IS NOT NULL),
      e AS (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
      nodes AS (SELECT DISTINCT src AS node FROM e),
      l0 AS (SELECT node, node AS label FROM nodes),
      $rounds
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM l4 GROUP BY label"""
    })

  // --- q321: STRICT-SEQUENCE EVENT FUNNEL (view → click → purchase,
  // each step at-or-after the previous — the product-analytics
  // conversion table): computed in ONE pass over events with two
  // chained running-min windows on the SAME (user, ts, event_id) sort
  // (a click counts once a view precedes it, a purchase once such a
  // click does), then a per-user any-flag rollup and a 1-row unpivot.
  // One (user)-keyed exchange; the order key is tie-free (event_id). ----
  private val q321 = Q("q321_event_funnel",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val flagged = ev
        .withColumn("t1r", min(when(col("event_type") === "view",
          col("ts"))).over(w))
        .withColumn("t2r", min(when(col("event_type") === "click"
          && col("t1r").isNotNull, col("ts"))).over(w))
      val per = flagged.groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "view", 1L)
            .otherwise(0L)).as("s1"),
          max(when(col("event_type") === "click"
            && col("t1r").isNotNull, 1L).otherwise(0L)).as("s2"),
          max(when(col("event_type") === "purchase"
            && col("t2r").isNotNull, 1L).otherwise(0L)).as("s3"))
      per.agg(sum(col("s1")).as("v"), sum(col("s2")).as("vc"),
          sum(col("s3")).as("vcp"))
        .select(explode(array(
          struct(lit(1L).as("step"), col("v").as("n_users")),
          struct(lit(2L).as("step"), col("vc").as("n_users")),
          struct(lit(3L).as("step"), col("vcp").as("n_users"))))
          .as("e"), col("v").as("base"))
        .select(col("e.step").as("step"), col("e.n_users").as("n_users"),
          (col("e.n_users").cast("double") / col("base").cast("double"))
            .as("conv_rate"))
    },
    Some("""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts,
          event_id FROM events),
      f AS (SELECT user_id, event_type, ts, event_id,
          MIN(CASE WHEN event_type = 'view' THEN ts END) OVER w AS t1r
        FROM ev WINDOW w AS (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      g AS (SELECT *, MIN(CASE WHEN event_type = 'click'
            AND t1r IS NOT NULL THEN ts END) OVER w AS t2r
        FROM f WINDOW w AS (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      per AS (SELECT user_id,
          MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
          MAX(CASE WHEN event_type = 'click' AND t1r IS NOT NULL
            THEN 1 ELSE 0 END) AS s2,
          MAX(CASE WHEN event_type = 'purchase' AND t2r IS NOT NULL
            THEN 1 ELSE 0 END) AS s3
        FROM g GROUP BY user_id),
      tot AS (SELECT CAST(SUM(s1) AS BIGINT) AS v,
          CAST(SUM(s2) AS BIGINT) AS vc,
          CAST(SUM(s3) AS BIGINT) AS vcp FROM per)
      SELECT 1 AS step, v AS n_users,
        CAST(v AS DOUBLE) / CAST(v AS DOUBLE) AS conv_rate FROM tot
      UNION ALL SELECT 2, vc,
        CAST(vc AS DOUBLE) / CAST(v AS DOUBLE) FROM tot
      UNION ALL SELECT 3, vcp,
        CAST(vcp AS DOUBLE) / CAST(v AS DOUBLE) FROM tot"""))

  // --- q322: WEEKLY RETENTION COHORTS (the other canonical product
  // table): cohort = week of a user's first event, retention(k) =
  // users of that cohort active k weeks later over the cohort size.
  // Distinct (user, week) collapses the event stream first, so every
  // later stage is user-weeks-sized; the cohort-size join broadcasts
  // a ≤ #weeks-row aggregate. --------------------------------------------
  private val q322 = Q("q322_retention_cohorts",
    (s, dir) => {
      val uw = Tables(s, dir, "events")
        .select(col("user_id"),
          expr("ts div 604800000000000").as("wk"))
        .distinct()
      val first = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
      val ret = uw.join(first, "user_id")
        .groupBy(col("cw"), (col("wk") - col("cw")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
      val sizes = broadcast(ret.filter(col("week_offset") === 0)
        .select(col("cw"), col("n_users").as("cohort_size")))
      ret.join(sizes, "cw")
        .select(col("cw").as("cohort_week"), col("week_offset"),
          col("n_users"), col("cohort_size"),
          (col("n_users").cast("double")
            / col("cohort_size").cast("double")).as("retention"))
    },
    Some("""WITH uw AS (SELECT DISTINCT user_id,
          epoch_ns(ts) // 604800000000000 AS wk FROM events),
      fw AS (SELECT user_id, MIN(wk) AS cw FROM uw GROUP BY user_id),
      ret AS (SELECT cw, wk - cw AS week_offset,
          CAST(COUNT(*) AS BIGINT) AS n_users
        FROM uw JOIN fw USING (user_id) GROUP BY 1, 2),
      sz AS (SELECT cw, n_users AS cohort_size FROM ret
        WHERE week_offset = 0)
      SELECT cw AS cohort_week, week_offset, n_users, cohort_size,
        CAST(n_users AS DOUBLE) / CAST(cohort_size AS DOUBLE)
          AS retention
      FROM ret JOIN sz USING (cw)"""))

  // --- q325: TIME-TO-CONVERSION distribution (q321's funnel, timed):
  // per user, first view to first view-preceded purchase, bucketed by
  // whole days — the latency histogram a growth team reads next to
  // the funnel. Same ONE (user)-sorted window pass as q321; the
  // histogram key is exact integer nanosecond division. ------------------
  private val q325 = Q("q325_time_to_conversion",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val flagged = ev.withColumn("t1r",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      flagged.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts")))
            .as("t1"),
          min(when(col("event_type") === "purchase"
            && col("t1r").isNotNull, col("ts"))).as("tp"))
        .filter(col("tp").isNotNull)
        .groupBy(expr("(tp - t1) div 86400000000000").as("delta_days"))
        .agg(count(lit(1)).as("n_users"))
    },
    Some("""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts,
          event_id FROM events),
      f AS (SELECT user_id, event_type, ts,
          MIN(CASE WHEN event_type = 'view' THEN ts END) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t1r
        FROM ev),
      per AS (SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1,
          MIN(CASE WHEN event_type = 'purchase' AND t1r IS NOT NULL
            THEN ts END) AS tp
        FROM f GROUP BY user_id)
      SELECT (tp - t1) // 86400000000000 AS delta_days,
        CAST(COUNT(*) AS BIGINT) AS n_users
      FROM per WHERE tp IS NOT NULL
      GROUP BY 1"""))

  // --- q326: RFM SEGMENTATION with FIXED exact bands (recency days /
  // purchase count / integer-cent monetary) — banded, not
  // quantile-ranked, because an ntile over per-user rows would be a
  // data-sized global window (users are the high-cardinality axis at
  // 100 TB); fixed bands are one user-keyed aggregate + a projection.
  // Money runs on round(value·100) BIGINT cents (the DECIMAL-free
  // oracle-parity rule). -------------------------------------------------
  private val q326 = Q("q326_rfm_segments",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val horizon = broadcast(ev.agg(max(col("ts")).as("t_now")))
      val per = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(col("ts")).as("t_last"),
          count(lit(1)).as("freq"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .crossJoin(horizon)
        .withColumn("rec_days",
          expr("(t_now - t_last) div 86400000000000"))
      val scored = per
        .withColumn("r", when(col("rec_days") < 7, 4L)
          .when(col("rec_days") < 30, 3L)
          .when(col("rec_days") < 90, 2L).otherwise(1L))
        .withColumn("f", when(col("freq") >= 10, 4L)
          .when(col("freq") >= 4, 3L)
          .when(col("freq") >= 2, 2L).otherwise(1L))
        .withColumn("m", when(col("cents") >= 100000, 4L)
          .when(col("cents") >= 10000, 3L)
          .when(col("cents") >= 1000, 2L).otherwise(1L))
      scored.groupBy(col("r"), col("f"), col("m"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("cents")).as("segment_cents"))
        .withColumn("segment_value",
          col("segment_cents").cast("double") / 100.0)
        .drop("segment_cents")
    },
    Some("""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts,
          value FROM events),
      hz AS (SELECT MAX(ts) AS t_now FROM ev),
      per AS (SELECT user_id, MAX(ts) AS t_last,
          CAST(COUNT(*) AS BIGINT) AS freq,
          CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            AS cents
        FROM ev WHERE event_type = 'purchase' GROUP BY user_id),
      sc AS (SELECT user_id, freq, cents,
          (t_now - t_last) // 86400000000000 AS rec_days
        FROM per, hz),
      scored AS (SELECT
          CASE WHEN rec_days < 7 THEN 4 WHEN rec_days < 30 THEN 3
               WHEN rec_days < 90 THEN 2 ELSE 1 END AS r,
          CASE WHEN freq >= 10 THEN 4 WHEN freq >= 4 THEN 3
               WHEN freq >= 2 THEN 2 ELSE 1 END AS f,
          CASE WHEN cents >= 100000 THEN 4 WHEN cents >= 10000 THEN 3
               WHEN cents >= 1000 THEN 2 ELSE 1 END AS m,
          cents
        FROM sc)
      SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
        CAST(m AS BIGINT) AS m,
        CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(SUM(cents) AS DOUBLE) / 100.0 AS segment_value
      FROM scored GROUP BY r, f, m"""))

  // --- q339: DAU/WAU STICKINESS per week (the engagement headline:
  // how many of a week's actives show up on an average active day):
  // distinct (user, day) collapses the stream once; DAU and WAU both
  // aggregate from it (days nest inside weeks, so the weekly distinct
  // is exact from the daily distinct — no second pass over events);
  // stickiness = Σdau / (n_days·wau), one division of exact counts. ----
  private val q339 = Q("q339_dau_stickiness",
    (s, dir) => {
      val ud = Tables(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .distinct()
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
        .withColumn("wk", expr("day div 7"))
        .groupBy(col("wk"))
        .agg(sum(col("dau")).as("sum_dau"), count(lit(1)).as("n_days"))
      val wau = ud.withColumn("wk", expr("day div 7"))
        .select(col("wk"), col("user_id")).distinct()
        .groupBy(col("wk")).agg(count(lit(1)).as("wau"))
      dau.join(wau, "wk")
        .withColumn("stickiness", col("sum_dau").cast("double")
          / (col("n_days") * col("wau")).cast("double"))
        .select(col("wk"), col("n_days"), col("sum_dau"), col("wau"),
          col("stickiness"))
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id,
          epoch_ns(ts) // 86400000000000 AS day FROM events),
      dau AS (SELECT day // 7 AS wk,
          CAST(SUM(dau) AS BIGINT) AS sum_dau,
          CAST(COUNT(*) AS BIGINT) AS n_days
        FROM (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
          FROM ud GROUP BY day)
        GROUP BY 1),
      wau AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS wau
        FROM (SELECT DISTINCT day // 7 AS wk, user_id FROM ud)
        GROUP BY wk)
      SELECT wk, n_days, sum_dau, wau,
        CAST(sum_dau AS DOUBLE) / CAST(n_days * wau AS DOUBLE)
          AS stickiness
      FROM dau JOIN wau USING (wk)"""))

  // --- q346: HALF-LIFE ENGAGEMENT DECAY — per user, Σ value·2^(−age)
  // over all events (age in whole days from the corpus horizon, one-day
  // half-life, capped at 29). The EXACT form: cents·2^(29−age) are
  // BIGINTs (powers of two commute with the 2-decimal grid), summed
  // associatively, ONE double division at the end — the
  // order-dependent Σ(double·pow) a naive scorer writes can never
  // hash-match. One user-keyed exchange; horizon is a broadcast 1-row
  // aggregate. ----------------------------------------------------------
  private val q346 = Q("q346_decay_engagement",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
      val horizon = broadcast(ev.agg(
        expr("max(ts div 86400000000000)").as("d_now")))
      ev.crossJoin(horizon)
        .withColumn("age",
          least(col("d_now") - expr("ts div 86400000000000"), lit(29L)))
        .withColumn("w", expr(
          "cast(round(value * 100) as bigint) * " +
            "shiftleft(cast(1 as bigint), cast(29 - age as int))"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("w")).as("scaled"))
        .withColumn("score",
          col("scaled").cast("double") / lit((1L << 29) * 100.0))
    },
    Some("""WITH ev AS (SELECT user_id, epoch_ns(ts) AS t, value
          FROM events),
      h AS (SELECT MAX(t // 86400000000000) AS d_now FROM ev),
      a AS (SELECT user_id,
          LEAST(d_now - t // 86400000000000, 29) AS age,
          CAST(round(value * 100) AS BIGINT) AS cents
        FROM ev, h)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(cents * (CAST(1 AS BIGINT) << CAST(29 - age AS INT)))
          AS BIGINT) AS scaled,
        CAST(SUM(cents * (CAST(1 AS BIGINT) << CAST(29 - age AS INT)))
          AS DOUBLE) / (536870912.0 * 100.0) AS score
      FROM a GROUP BY user_id"""))

  // --- q347: LAST-TOUCH ATTRIBUTION — each purchase attributes to the
  // user's LATEST preceding view within a 7-day horizon, the canonical
  // as-of-join workload on the events surface. Rides the AsOfJoin
  // operator's union + one running last(ignoreNulls) window per user —
  // ONE shuffle, no range join, no row explosion (SURVEY §2.4 engine
  // extra; the (user, ts) pairs are verified tie-free in this corpus,
  // the operator's uniqueness precondition). ------------------------------
  private val q347 = Q("q347_last_touch",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("p_ts"))
      val views = ev.filter(col("event_type") === "view")
      val j = graft.operators.AsOfJoin.lastPrior(
        purchases, col("user_id"), col("p_ts"),
        views, col("user_id"), col("ts"),
        Seq("view_id" -> col("event_id"), "view_ts" -> col("ts")))
      val in7d = col("view_ts").isNotNull &&
        col("p_ts") - col("view_ts") <= lit(7L * 86400000000000L)
      j.select(col("purchase_id"), col("user_id"),
        when(in7d, col("view_id")).as("attributed_view"),
        when(in7d, expr("(p_ts - view_ts) div 1000000")).as("gap_ms"))
    },
    Some("""WITH ev AS (SELECT user_id, event_id, epoch_ns(ts) AS t,
          event_type FROM events),
      u AS (SELECT user_id, t, 1 AS side, event_id AS pid,
          CAST(NULL AS BIGINT) AS vid
        FROM ev WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, t, 0, CAST(NULL AS BIGINT), event_id
        FROM ev WHERE event_type = 'view'),
      w AS (SELECT user_id, t, side, pid,
          last_value(vid IGNORE NULLS) OVER win AS lv,
          last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS)
            OVER win AS lvt
        FROM u WINDOW win AS (PARTITION BY user_id ORDER BY t, side
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT pid AS purchase_id, user_id,
        CASE WHEN lv IS NOT NULL AND t - lvt <= 604800000000000
          THEN lv END AS attributed_view,
        CASE WHEN lv IS NOT NULL AND t - lvt <= 604800000000000
          THEN (t - lvt) // 1000000 END AS gap_ms
      FROM w WHERE side = 1"""))

  override def queries: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07,
    q08, q09, q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q138,
    q139, q140, q154, q158, q194, q198, q202, q205, q214, q215, q217,
    q219, q221, q222, q228, q231, q234, q235, q237, q240, q241, q242,
    q244, q246, q249, q250, q251, q252, q253, q254, q257, q259, q260,
    q265, q269, q270, q272, q273, q282, q283, q288, q289, q290, q292,
    q294, q295, q296, q297, q300, q309, q310, q313, q318, q321, q322,
    q325, q326, q339, q346, q347)
}
