package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact relational companion queries — the operator categories of
  * SURVEY.md §2.2's "Spark built-ins we USE" table (aggregation, joins
  * incl. broadcast, window functions, sort/limit, set ops), each with a
  * DuckDB oracle. These prove the engine composes with the full
  * relational surface a user of the reference's data would expect, and
  * give the correctness gate exact (non-boolean) value comparisons.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // pricing-summary style aggregation (TPC-H Q1 shape)
    "rel_agg_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // broadcast join: orders joined to its customer dimension
    "rel_join_orders_by_segment" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("c_mktsegment")
    },

    // three-table selective multi-join (TPC-H Q3 shape): filters push
    // into all three scans, the customer dim broadcasts, the orders x
    // lineitem join shuffles on the key both sides already produce —
    // the canonical fact-to-fact plan the 100x story needs. Top-10 by
    // revenue with a deterministic key tiebreak.
    "rel_multijoin_shipping_priority" -> { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1995-03-15"))
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // left semi + anti (EXISTS / NOT EXISTS)
    "rel_semi_anti_customers" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
      val without = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
      import s.implicits._
      Seq((withOrders, without)).toDF("with_orders", "without_orders")
    },

    // window function: top-2 orders per customer by price
    "rel_window_top_orders" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk").cast("long").as("rnk"))
        .orderBy("o_custkey", "rnk")
    },

    // set ops: union + distinct across two key populations
    "rel_setop_keys" -> { (s, dir) =>
      val a = t(s, dir, "orders").select(col("o_custkey").as("key"))
      val b = t(s, dir, "customer").select(col("c_custkey").as("key"))
      import s.implicits._
      Seq((a.union(b).distinct().count(),
        a.intersect(b).count(),
        b.except(a).count())).toDF("union_distinct", "intersects", "only_customers")
    },

    // sort + limit (top-k)
    "rel_topk_expensive_orders" -> { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(25)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
    },

    // multi-level aggregation: rollup with subtotal + grand-total rows.
    // Subtotal NULLs are coalesced to 'ALL' on both engines so the sort
    // order is engine-independent (Spark defaults NULLS FIRST asc,
    // DuckDB NULLS LAST).
    "rel_rollup_pricing" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n_rows"))
        .orderBy("returnflag", "linestatus")
    },

    // cube: the rollup's power-set twin — all four grouping sets
    // (priority x status, each alone, grand total); same NULL->'ALL'
    // coalescing for engine-independent ordering
    "rel_cube_orders" -> { (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n_orders"), col("total"))
        .orderBy("priority", "status")
    },

    // pivot: order counts per priority x status, statuses as columns
    // (Spark .pivot with an explicit value list; missing cells 0)
    "rel_pivot_orders" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority")
    },

    // O81 bucketed co-located (SMB) join: both sides written bucketed
    // on the join key, then joined through the sort-merge path. The
    // same aggregate as rel_join_orders_by_segment, but the JOIN plan
    // is proven shuffle-free on the executed plan (the write pre-paid
    // the shuffle — the Iceberg bucket-transform pattern at 10^12
    // rows). `join_shuffle_free` is measured, not asserted.
    "rel_bucketed_join_check" -> { (s, dir) =>
      import graft.pipeline.Bucketing
      val tmpO = java.nio.file.Files.createTempDirectory("graft_bkt_orders").toString
      val tmpC = java.nio.file.Files.createTempDirectory("graft_bkt_cust").toString
      Bucketing.writeBucketed(
        t(s, dir, "orders").select(col("o_custkey"), col("o_totalprice")),
        "graft_bkt_orders", tmpO, Seq("o_custkey"), 8)
      Bucketing.writeBucketed(
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        "graft_bkt_cust", tmpC, Seq("c_custkey"), 8)
      Bucketing.withSortMergeOnly(s) {
        val o = s.table("graft_bkt_orders")
        val c = s.table("graft_bkt_cust")
        val joined = o.join(c, o("o_custkey") === c("c_custkey"))
          .select(col("c_mktsegment"), col("o_totalprice"))
        joined.count() // materialize so AQE finalizes before the plan walk
        val shuffleFree = Bucketing.countShuffles(joined) == 0
        joined.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total"))
          .withColumn("join_shuffle_free", lit(shuffleFree))
          .orderBy("c_mktsegment")
      }
    },
  )

  val oracleSql: Map[String, String] = Map(
    "rel_agg_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, " +
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, COUNT(*) AS n_rows " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "rel_join_orders_by_segment" ->
      ("SELECT c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "rel_multijoin_shipping_priority" ->
      ("SELECT l_orderkey, o_orderdate, o_orderpriority, " +
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15' " +
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "rel_semi_anti_customers" ->
      ("SELECT (SELECT COUNT(*) FROM customer WHERE EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS with_orders, " +
        "(SELECT COUNT(*) FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS without_orders"),
    "rel_window_top_orders" ->
      ("SELECT o_custkey, o_orderkey, rnk FROM (" +
        "SELECT o_custkey, o_orderkey, row_number() OVER " +
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk " +
        "FROM orders) WHERE rnk <= 2 ORDER BY o_custkey, rnk"),
    "rel_setop_keys" ->
      ("SELECT " +
        "(SELECT COUNT(*) FROM (SELECT o_custkey AS key FROM orders UNION " +
        "SELECT c_custkey FROM customer)) AS union_distinct, " +
        "(SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey AS key FROM orders " +
        "INTERSECT SELECT DISTINCT c_custkey FROM customer)) AS intersects, " +
        "(SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey AS key FROM customer " +
        "EXCEPT SELECT DISTINCT o_custkey FROM orders)) AS only_customers"),
    "rel_topk_expensive_orders" ->
      ("SELECT o_orderkey, ROUND(o_totalprice, 2) AS price FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25"),
    "rel_rollup_pricing" ->
      ("SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, " +
        "COALESCE(l_linestatus, 'ALL') AS linestatus, " +
        "SUM(l_quantity) AS sum_qty, COUNT(*) AS n_rows " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY returnflag, linestatus"),
    "rel_cube_orders" ->
      ("SELECT COALESCE(o_orderpriority, 'ALL') AS priority, " +
        "COALESCE(o_orderstatus, 'ALL') AS status, " +
        "COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total " +
        "FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus) " +
        "ORDER BY priority, status"),
    "rel_pivot_orders" ->
      ("SELECT o_orderpriority, " +
        "CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS \"O\", " +
        "CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS \"F\", " +
        "CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS \"P\" " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "rel_bucketed_join_check" ->
      ("SELECT c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total, " +
        "TRUE AS join_shuffle_free " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
  )
}
