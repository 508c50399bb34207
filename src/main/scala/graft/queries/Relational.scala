package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational surface (SURVEY.md §2.B B1–B6 semantics + §2.C
  * categories): scan/project, filters (predicate, contains/grep, regex/sed,
  * theta/awk), aggregations, joins (broadcast/shuffle/semi/anti/outer),
  * windows, top-k, set ops, rollup/cube, scalar functions, subqueries.
  *
  * Every query:
  *  - is a declarative DataFrame plan (Catalyst pushes filters/prunes
  *    columns; verified via .explain in the spec suite);
  *  - ends in a deterministic ORDER BY on a unique key so the DuckDB oracle
  *    hash-compare is stable;
  *  - rounds every *accumulated* float (sum/avg over many rows) so
  *    cross-engine summation order can't flip a hash. Raw stored doubles are
  *    passed through bit-exact, never rounded.
  *
  * Scale notes: dimension joins (`part`, `nation`, `region`, `supplier`)
  * are explicitly `broadcast()`; SF-scaled facts (customer/orders/lineitem)
  * are NEVER hinted — they shuffle on their join keys, and AQE is free to
  * broadcast at small SF where sizes allow (PlanSpec pins this repo-wide).
  * Group-bys are partial-aggregated map-side by Catalyst automatically.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- B1: scan + projection (column pruning reaches the parquet scan)
    "q_scan_project" -> ((s, d) => {
      // No final sort: the correctness gate canonicalizes row order itself,
      // and a global ORDER BY here would range-shuffle the whole corpus for
      // an identity projection (VERDICT r1 "what's wrong" #4).
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    // ---- predicate filter (pushed to parquet: PushedFilters in explain)
    "q_filter_pred" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- B3: grep — substring containment (reference: grep kiwi FILE,
    // pkg/test/scenario/test_scenarios.go:77-103)
    "q_grep_contains" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("text").contains("window window"))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // ---- B4: sed — regex line filter (reference: sed -n '/…/p',
    // pkg/test/scenario/test_scenarios.go:105-132)
    "q_regex_filter" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("text").rlike("(hash|merge) (scan|join)"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // ---- B5: awk — projection + scalar arithmetic + theta filter
    // (reference GPS proximity, pkg/test/scenario/test_scenarios.go:134-161)
    "q_theta_filter" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val x  = col("value") - lit(100.0)
      val y  = col("user_id").cast("double") - lit(50.0)
      ev.filter(x * x + y * y < lit(2500.0))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    }),

    // ---- B6: count(*) (reference: wc -l)
    "q_count_star" -> ((s, d) => {
      Tables.lineitem(s, d).agg(count(lit(1)).as("n"))
    }),

    // ---- TPC-H Q1 flavor: multi-aggregate group-by (map-side partial agg)
    "q1_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- distinct aggregation
    "q_agg_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // ---- broadcast join: fact ⋈ dim. part is SF-scaled (200k rows/SF —
    // ~10⁹ at the 100 TB design point) so the join carries NO hint: AQE
    // broadcasts it map-side at real sizes (the plan the PlanSpec
    // assertion pins at test SFs) and falls back to a keyed shuffle join
    // when the dim outgrows the threshold. Same answer either way — only
    // a hint could force an OOM.
    "q_join_broadcast" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p  = Tables.part(s, d)
      li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    }),

    // ---- multi-way join through the dimension chain. customer is
    // SF-scaled so it joins un-hinted (shuffle on custkey scales; AQE can
    // still broadcast at small SF); only the fixed-size nation/region dims
    // carry the hint.
    "q_join_multi" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy("r_name", "n_name")
    }),

    // ---- left semi join (EXISTS)
    "q_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // ---- left anti join (NOT EXISTS)
    "q_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_nationkey")
        .orderBy("c_custkey")
    }),

    // ---- left outer join + count of non-null (parts with zero lineitems
    // keep n=0)
    "q_left_join_agg" -> ((s, d) => {
      val p  = Tables.part(s, d)
      val li = Tables.lineitem(s, d)
      p.join(li, col("p_partkey") === col("l_partkey"), "left")
        .groupBy("p_partkey")
        .agg(count(col("l_orderkey")).as("n_items"))
        .orderBy("p_partkey")
    }),

    // ---- window: row_number rank, top-3 per group
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // ---- window: running sum + lag over event stream
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables.events(s, d)
        .withColumn("run_sum",
          round(sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .withColumn("prev_event", lag("event_id", 1).over(w))
        .select("user_id", "event_id", "run_sum", "prev_event")
        // window's partition-local sort is the only ordering needed; no
        // global ORDER BY for the 10k+-row output (gate sorts rows itself)
    }),

    // ---- top-k (plans as TakeOrderedAndProject — no global sort at scale)
    "q_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // ---- set ops
    "q_set_union" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
      c.union(su).distinct().orderBy("nk")
    }),
    "q_set_intersect" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
      c.intersect(su).orderBy("nk")
    }),
    "q_set_except" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
      c.except(su).orderBy("nk")
    }),

    // ---- rollup / cube (grouping sets family).
    // NOTE: Dataset.rollup over a join trips Spark 4.1's ambiguous-self-join
    // detector (Expand re-emits grouping attrs with shared exprIds), so this
    // one goes through spark.sql — identical Catalyst plan, no lineage check.
    "q_rollup" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("g_customer")
      Tables.nation(s, d).createOrReplaceTempView("g_nation")
      Tables.region(s, d).createOrReplaceTempView("g_region")
      s.sql(
        """SELECT r_name, n_name, count(*) AS n_cust,
          |  round(sum(c_acctbal), 2) AS bal
          |FROM g_customer
          |JOIN g_nation ON c_nationkey = n_nationkey
          |JOIN g_region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP(r_name, n_name)
          |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    }),
    "q_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
             round(sum("o_totalprice"), 2).as("rev"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)
    }),

    // ---- scalar string functions
    "q_string_fns" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("ub"),
          substring(col("p_name"), 1, 4).as("pfx"),
          length(col("p_name")).as("len"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("bt"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("w1"))
        .orderBy("p_partkey")
    }),

    // ---- date functions + group-by on derived calendar cols
    "q_date_fns" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("y"),
                 month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))
        .orderBy("y", "m")
    }),

    // ---- math scalar functions (per-row, deterministic IEEE ops)
    "q_math_fns" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25.0).as("a"),
          ceil(col("l_extendedprice") / 1000.0).as("c"),
          floor(col("l_extendedprice") / 1000.0).as("f"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(pow(col("l_discount") + 1.0, 3), 6).as("p3"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- CASE WHEN buckets
    "q_case_expr" -> ((s, d) => {
      Tables.customer(s, d)
        .withColumn("bucket",
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))
        .orderBy("bucket")
    }),

    // ---- nulls from outer join + coalesce
    "q_null_handling" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("big_total"),
          count(col("o_orderkey")).as("n_big"))
        .orderBy("c_custkey")
    }),

    // ---- scalar subquery: compare against a global aggregate.
    // DataFrame form: 1-row agg cross-joined (Catalyst broadcasts it).
    "q_scalar_subquery" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val thr = o.agg((avg("o_totalprice") * 1.5).as("thr"))
      o.crossJoin(broadcast(thr))
        .filter(col("o_totalprice") > col("thr"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // ---- distinct projection
    "q_distinct" -> ((s, d) => {
      Tables.customer(s, d).select("c_mktsegment").distinct()
        .orderBy("c_mktsegment")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_grep_contains" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE text LIKE '%window window%' ORDER BY doc_id""".stripMargin,
    "q_regex_filter" ->
      """SELECT doc_id, lang FROM documents
        |WHERE regexp_matches(text, '(hash|merge) (scan|join)')
        |ORDER BY doc_id""".stripMargin,
    "q_theta_filter" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE (value - 100.0)*(value - 100.0)
        |    + (CAST(user_id AS DOUBLE) - 50.0)*(CAST(user_id AS DOUBLE) - 50.0)
        |    < 2500.0
        |ORDER BY event_id""".stripMargin,
    "q_count_star" ->
      "SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_join_broadcast" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_multi" ->
      """SELECT r_name, n_name,
        |  round(sum(o_totalprice), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_left_join_agg" ->
      """SELECT p_partkey, CAST(count(l_orderkey) AS BIGINT) AS n_items
        |FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_running" ->
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum,
        |  lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id)
        |    AS prev_event
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin,
    "q_set_union" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin,
    "q_set_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust,
        |  round(sum(c_acctbal), 2) AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS rev
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_string_fns" ->
      """SELECT p_partkey, upper(p_brand) AS ub, substring(p_name, 1, 4) AS pfx,
        |  CAST(length(p_name) AS INTEGER) AS len,
        |  concat(p_brand, '#', p_type) AS bt,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS w1
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_fns" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_math_fns" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25.0) AS a,
        |  CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS c,
        |  CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS f,
        |  round(sqrt(l_quantity), 6) AS sq,
        |  round(pow(l_discount + 1.0, 3), 6) AS p3
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_case_expr" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM customer GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_null_handling" ->
      """SELECT c_custkey,
        |  round(coalesce(sum(o_totalprice), 0.0), 2) AS big_total,
        |  CAST(count(o_orderkey) AS BIGINT) AS n_big
        |FROM customer LEFT JOIN (SELECT * FROM orders
        |                         WHERE o_totalprice > 400000.0) o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"
  )
}
