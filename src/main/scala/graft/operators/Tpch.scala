package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Remaining TPC-H-shaped queries (Q4/Q6/Q7/Q8/Q9/Q10/Q12/Q14/Q16/Q19/Q20),
  * adapted to the testdata star schema. Together with Q1/Q2/Q3/Q5/Q13/Q17/
  * Q18/Q21/Q22 in [[Relational]], this completes the full 22-query TPC-H
  * relational surface (modulo columns the testdata lacks: partsupp,
  * l_commitdate/l_receiptdate/l_shipmode, c_phone — each adaptation notes
  * its substitution).
  *
  * The reference executes only scan/project/limit
  * (userdata/cloudinit.sh:346-351); this is north-star extension surface.
  *
  * Determinism contract (same as Relational): total ORDER BY, money math in
  * exact DECIMAL cast to DOUBLE at the end, identical aliases both sides.
  * Ratio queries (Q8/Q14) divide two exact decimal sums as one double
  * division, so partial-aggregation order cannot perturb the value.
  */
object Tpch {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def money(c: Column): Column = c.cast(DecimalType(12, 2))
  private def factor(c: Column): Column = c.cast(DecimalType(6, 2))
  private def ts(s: String): Column = lit(java.sql.Timestamp.valueOf(s))

  /** revenue item: exact DECIMAL extendedprice * (1 - discount). */
  private def revItem: Column =
    money(col("l_extendedprice")) * factor(lit(1.0) - col("l_discount"))

  // ---------------------------------------------------------------- queries

  val queries: Map[String, Q] = Map(
    // TPC-H Q4 shape (adapted: no l_commitdate — "late" is shipped >60 days
    // after the order date): order count per priority where at least one
    // lineitem shipped late. EXISTS → left-semi join; the date filter is
    // pushed to the orders scan.
    // Scale: semi join shuffles on orderkey once; the aggregate domain is
    // |priorities| = 5 → map-side combine collapses everything.
    "q4_priority_count" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1997-01-01 00:00:00"))
      val l = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q6: forecast revenue change — the purest pushdown benchmark.
    // All three predicates reach the parquet scan (PushedFilters + row-group
    // min/max skip); the aggregate is a single map-side-combined scalar.
    // Discount bounds are 0.015/0.045 (between the 0.01-step grid points) so
    // no stored double sits exactly on a threshold in either engine.
    "q6_forecast_revenue" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_discount") >= 0.015 && col("l_discount") <= 0.045 &&
          col("l_quantity") < 24.0)
        .agg(sum(money(col("l_extendedprice")) * factor(col("l_discount")))
          .cast(DoubleType).as("revenue"))
    },

    // TPC-H Q7: bilateral trade volume between two nations by ship year.
    // Scale: lineitem shuffles once on suppkey then once on orderkey (the
    // two fact joins); nation is a 25-row broadcast on BOTH sides of the
    // disjunctive pair predicate; the final aggregate domain is
    // 2 nations × years — tiny.
    "q7_volume_shipping" -> { (s, dir) =>
      Seq("supplier", "lineitem", "orders", "customer", "nation")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql("""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(volume) AS DOUBLE) AS revenue
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     YEAR(l_shipdate) AS l_year,
                     CAST(l_extendedprice AS DECIMAL(12,2)) *
                     CAST(1 - l_discount AS DECIMAL(6,2)) AS volume
              FROM supplier
              JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""")
    },

    // TPC-H Q8: market share of NATION_3 suppliers within EUROPE-customer
    // revenue per year, for one part type. Numerator and denominator are
    // both exact decimal sums; the share is ONE double division at the end.
    // Scale: part filter prunes the probe side before the fact joins;
    // nation/region broadcast; aggregate domain = |years|.
    "q8_market_share" -> { (s, dir) =>
      Seq("part", "supplier", "lineitem", "orders", "customer", "nation", "region")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql("""
        SELECT o_year,
               CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
               CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (SELECT YEAR(o_orderdate) AS o_year,
                     CAST(l_extendedprice AS DECIMAL(12,2)) *
                     CAST(1 - l_discount AS DECIMAL(6,2)) AS volume,
                     n1.n_name AS nation
              FROM part
              JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              JOIN region   ON n2.n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE' AND p_type = 'STANDARD') all_nations
        GROUP BY o_year
        ORDER BY o_year""")
    },

    // TPC-H Q9 shape (adapted: no partsupp — unit cost is the part's
    // retail price): profit per supplier nation per order year for parts
    // matching a name pattern. amount = revenue − cost, all in exact
    // DECIMAL; sums exact; one cast to DOUBLE at the end.
    // Scale: the LIKE filter prunes part before the join chain; both fact
    // joins shuffle on their natural keys; aggregate domain is
    // 25 nations × years.
    "q9_product_profit" -> { (s, dir) =>
      Seq("part", "supplier", "lineitem", "orders", "nation")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql("""
        SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        FROM (SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
                     CAST(l_extendedprice AS DECIMAL(12,2)) *
                     CAST(1 - l_discount AS DECIMAL(6,2)) -
                     CAST(p_retailprice AS DECIMAL(12,2)) *
                     CAST(l_quantity AS DECIMAL(12,2)) AS amount
              FROM part
              JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN nation   ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%red%') profit
        GROUP BY nation, o_year
        ORDER BY nation, o_year""")
    },

    // TPC-H Q10: top returned-revenue customers in a quarter-ish window.
    // Revenue is an exact decimal sum cast to double; the ORDER BY carries
    // c_custkey as tiebreaker so the LIMIT frontier is total.
    // Scale: returnflag + date filters push to the scans; the join chain
    // shuffles on custkey/orderkey; final top-20 is TakeOrderedAndProject.
    "q10_returned_items" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1996-07-01 00:00:00"))
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(c("c_custkey"), c("c_name"), c("c_acctbal"), col("n_name"))
        .agg(sum(revItem).cast(DoubleType).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal").cast(DoubleType).as("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    // TPC-H Q12 shape (adapted: no l_shipmode — lineitems bucket into
    // SLOW/FAST by ship lag vs the order date): per bucket, how many
    // high- vs low-priority orders' lines landed there. Conditional
    // aggregation over a single fact join.
    // Scale: one shuffle on orderkey; aggregate domain = 2 buckets;
    // the CASE runs inside whole-stage codegen.
    "q12_ship_bucket" -> { (s, dir) =>
      val o = t(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00"))
        .select("l_orderkey", "l_shipdate")
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .withColumn("ship_bucket",
          when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "SLOW")
            .otherwise("FAST"))
        .groupBy("ship_bucket")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("ship_bucket")
    },

    // TPC-H Q14: promo revenue share in one month — two exact decimal sums
    // over the same rows, one double multiply-divide at the end
    // ((100 * promo) / total, left-associative in both engines).
    // Scale: the month filter pushes to the lineitem scan; part joins on
    // partkey; single-row output.
    "q14_promo_revenue" -> { (s, dir) =>
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-09-01 00:00:00") &&
          col("l_shipdate") < ts("1996-10-01 00:00:00"))
      val p = t(s, dir, "part").select("p_partkey", "p_type")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", revItem)
            .otherwise(lit(0).cast(DecimalType(12, 2)))).as("promo"),
          sum(revItem).as("total"))
        .select((lit(100.0) * col("promo").cast(DoubleType) /
          col("total").cast(DoubleType)).as("promo_revenue"))
    },

    // TPC-H Q15 shape (adapted: supplier has no s_address/s_phone in the
    // testdata — output is key/name/revenue): top supplier by quarter
    // revenue. The revenue CTE aggregates lineitem once; the max is a
    // scalar subquery over that aggregate (supplier-count-sized, tiny) and
    // the tie predicate compares the EXACT decimal sums — the cast to
    // DOUBLE happens only in the projection, so both engines pick the same
    // winner(s) even under float-equal ties.
    // Scale: one shuffle on l_suppkey for the CTE; the scalar-subquery max
    // is a single-row broadcast; supplier joins on the already-aggregated
    // (|suppliers|-row) side.
    "q15_top_supplier" -> { (s, dir) =>
      Seq("lineitem", "supplier")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql("""
        WITH revenue0 AS (
          SELECT l_suppkey AS supplier_no,
                 SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                     CAST(1 - l_discount AS DECIMAL(6,2))) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT MAX(total_rev) FROM revenue0)
        ORDER BY s_suppkey""")
    },

    // TPC-H Q16 shape (adapted: supplier-part pairs derived from lineitem,
    // the "bad supplier" exclusion keys on negative balance): distinct
    // supplier count per (brand, type, size) bucket. DISTINCT pair
    // extraction + NOT IN (uncorrelated → broadcast null-aware anti join)
    // + count-distinct aggregate.
    // Scale: the DISTINCT and the count-distinct shuffle on the same
    // partkey-led keys; the NOT IN side is supplier-count-sized (tiny,
    // broadcast); part filters prune before the join.
    "q16_supplier_parts" -> { (s, dir) =>
      Seq("lineitem", "part", "supplier")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql("""
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
              FROM lineitem) ps
        JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> 'Brand#3'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    },

    // TPC-H Q19: disjunctive brand/size/quantity predicate across a join —
    // the classic "OR of ANDs" that must still push the common join key
    // and let the per-branch filters run as one codegen'd predicate.
    // Quantities are whole-number doubles → exact comparisons.
    // Scale: part side prunes to 3 brands before the join; revenue is one
    // exact decimal sum.
    "q19_disjunctive_revenue" -> { (s, dir) =>
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      val b1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1.0, 11.0)
      val b2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10.0, 20.0)
      val b3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20.0, 30.0)
      l.join(p, l("l_partkey") === p("p_partkey"))
        .filter(b1 || b2 || b3)
        .agg(sum(revItem).cast(DoubleType).as("revenue"))
    },

    // TPC-H Q20 shape (adapted: "availqty" is the supplier's shipped
    // quantity of the part in the window; "excess" means the supplier
    // shipped more than half of ALL shipments of that part): suppliers
    // dominating supply of a part family. The per-part total is a
    // partitioned window over the pre-aggregated (part, supp) table —
    // exact BIGINT arithmetic (q*2 > total), no floats anywhere.
    // Scale: the window partitions on l_partkey over an already-aggregated
    // table (|part×supp| rows, not |lineitem|); supplier/nation broadcast;
    // semi join on suppkey.
    "q20_excess_suppliers" -> { (s, dir) =>
      Seq("lineitem", "part", "supplier", "nation")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql("""
        WITH shipped AS (
          SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS q
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l_partkey, l_suppkey)
        SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM (SELECT l_partkey, l_suppkey, q,
                       SUM(q) OVER (PARTITION BY l_partkey) AS part_total
                FROM shipped) w
          JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE '%red%' AND q * 2 > part_total)
        ORDER BY s_name""")
    })

  // ----------------------------------------------------------- oracle SQL

  val oracles: Map[String, String] = Map(
    "q4_priority_count" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |               CAST(l_discount AS DECIMAL(6,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.015 AND l_discount <= 0.045
        |  AND l_quantity < 24""".stripMargin,

    "q7_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
        |       CAST(SUM(volume) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             CAST(YEAR(l_shipdate) AS INT) AS l_year,
        |             CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(1 - l_discount AS DECIMAL(6,2)) AS volume
        |      FROM supplier
        |      JOIN lineitem ON s_suppkey = l_suppkey
        |      JOIN orders   ON o_orderkey = l_orderkey
        |      JOIN customer ON c_custkey = o_custkey
        |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q8_market_share" ->
      """SELECT o_year,
        |       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
        |                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
        |       CAST(SUM(volume) AS DOUBLE) AS mkt_share
        |FROM (SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
        |             CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(1 - l_discount AS DECIMAL(6,2)) AS volume,
        |             n1.n_name AS nation
        |      FROM part
        |      JOIN lineitem ON p_partkey = l_partkey
        |      JOIN supplier ON s_suppkey = l_suppkey
        |      JOIN orders   ON o_orderkey = l_orderkey
        |      JOIN customer ON c_custkey = o_custkey
        |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      JOIN region   ON n2.n_regionkey = r_regionkey
        |      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD') all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,

    "q9_product_profit" ->
      """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        |FROM (SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
        |             CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(1 - l_discount AS DECIMAL(6,2)) -
        |             CAST(p_retailprice AS DECIMAL(12,2)) *
        |             CAST(l_quantity AS DECIMAL(12,2)) AS amount
        |      FROM part
        |      JOIN lineitem ON p_partkey = l_partkey
        |      JOIN supplier ON s_suppkey = l_suppkey
        |      JOIN orders   ON o_orderkey = l_orderkey
        |      JOIN nation   ON s_nationkey = n_nationkey
        |      WHERE p_name LIKE '%red%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                CAST(1 - l_discount AS DECIMAL(6,2))) AS DOUBLE) AS revenue,
        |       CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,

    "q12_ship_bucket" ->
      """SELECT ship_bucket,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM (SELECT o_orderpriority,
        |             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |                  THEN 'SLOW' ELSE 'FAST' END AS ship_bucket
        |      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate <  TIMESTAMP '1997-01-01') t
        |GROUP BY ship_bucket
        |ORDER BY ship_bucket""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT 100.0 *
        |       CAST(SUM(CASE WHEN p_type = 'PROMO'
        |                     THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                          CAST(1 - l_discount AS DECIMAL(6,2))
        |                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                CAST(1 - l_discount AS DECIMAL(6,2))) AS DOUBLE)
        |       AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate <  TIMESTAMP '1996-10-01'""".stripMargin,

    "q15_top_supplier" ->
      """WITH revenue0 AS (
        |  SELECT l_suppkey AS supplier_no,
        |         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             CAST(1 - l_discount AS DECIMAL(6,2))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue0)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_supplier_parts" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        |      FROM lineitem) ps
        |JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#3'
        |  AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |               CAST(1 - l_discount AS DECIMAL(6,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_excess_suppliers" ->
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS q
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  GROUP BY l_partkey, l_suppkey)
        |SELECT s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey
        |  FROM (SELECT l_partkey, l_suppkey, q,
        |               SUM(q) OVER (PARTITION BY l_partkey) AS part_total
        |        FROM shipped) w
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE '%red%' AND q * 2 > part_total)
        |ORDER BY s_name""".stripMargin)
}
