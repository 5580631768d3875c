package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The pure-SQL entry point (SURVEY.md §2.A/B surface note): the same
  * engine, driven through `spark.sql` over registered views instead of the
  * DataFrame API — proving a SQL-first user of the reference can run their
  * queries verbatim. The two registered queries are the TPC-H classics the
  * testdata schema supports end-to-end: Q3 (shipping priority — the
  * 3-table star with both date filters) and Q5 (local supplier volume —
  * the 6-table snowflake whose c_nationkey = s_nationkey "local" clause is
  * the classic join-graph gotcha). Both run through Catalyst exactly like
  * the DataFrame forms (same pushdown, same broadcast of nation/region,
  * same AQE), so this is an API-surface row, not a new execution path; the
  * oracle runs the IDENTICAL text in DuckDB (revenue via the exact-decimal
  * dsum discipline, dates in range for the synthetic 1995-2001 span).
  */
object SqlSurface {

  /** Register the testdata tables as temp views named EXACTLY like the
    * oracle's tables — the bare names are load-bearing (the point of this
    * surface is that the oracle's SQL text runs verbatim), so unlike the
    * rest of the codebase's suffixed views these rebind session-globally.
    * Each query method re-registers immediately before its spark.sql, so
    * sequential callers on different sfDirs are safe; CONCURRENT callers
    * on one session would race the shared names — the repo's runners
    * (Verify/Bench/ScaleCurve) are all sequential per session. */
  private def registerViews(spark: SparkSession, sfDir: String): Unit =
    Seq("customer" -> Tables.customer(spark, sfDir),
      "orders" -> Tables.orders(spark, sfDir),
      "lineitem" -> Tables.lineitem(spark, sfDir),
      "supplier" -> Tables.supplier(spark, sfDir),
      "nation" -> Tables.nation(spark, sfDir),
      "region" -> Tables.region(spark, sfDir),
      "part" -> Tables.part(spark, sfDir))
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }

  /** TPC-H Q4 (order priority checking), schema-adapted: the reference
    * flags orders with a line whose commit date slipped past receipt —
    * columns this corpus lacks — so the preserved SHAPE is the Q4
    * correlated EXISTS + per-priority count: orders in one quarter with
    * at least one line shipped more than 60 days after ordering. Plans as
    * a left-semi join of orders against the late lines. */
  def tpchQ4(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(Q4Sql)
  }

  /** The exact text [[tpchQ4]] executes — exported so the oracle map
    * registers the IDENTICAL string (one source of truth). */
  val Q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q6 (forecasting revenue change): the pure scan-and-filter
    * aggregate — one pushed predicate set, one global decimal sum. */
  def tpchQ6(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(Q6Sql)
  }

  /** The exact text [[tpchQ6]] executes — exported so the oracle map
    * registers the IDENTICAL string (one source of truth). */
  val Q6Sql: String =
    """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |    * CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q13 (customer distribution): order counts per customer through
    * a LEFT OUTER join (zero-order customers must survive), then the
    * distribution of those counts — the double-aggregate shape. */
  def tpchQ13(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(Q13Sql)
  }

  /** The exact text [[tpchQ13]] executes — exported so the oracle map
    * registers the IDENTICAL string (one source of truth). */
  val Q13Sql: String =
    """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q14 (promotion effect): promo revenue share for one ship
    * month — the CASE-over-join pattern; p_type carries a literal PROMO
    * class in this corpus, so the reference's LIKE 'PROMO%%' reduces to
    * equality. */
  def tpchQ14(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(Q14Sql)
  }

  /** The exact text [[tpchQ14]] executes — exported so the oracle map
    * registers the IDENTICAL string (one source of truth). */
  val Q14Sql: String =
    """SELECT round(CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,6))
        |        * (1 - CAST(l_discount AS DECIMAL(18,6))) END) AS DOUBLE) * 100.0
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |        * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 6)
        |  AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin

  /** TPC-H Q18 (large-volume customers): orders whose total quantity
    * clears a floor (IN over a grouped HAVING subquery), re-joined to
    * customer identity, top 100 by price. */
  def tpchQ18(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(Q18Sql)
  }

  /** The exact text [[tpchQ18]] executes — exported so the oracle map
    * registers the IDENTICAL string (one source of truth). */
  val Q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS odate,
        |  round(o_totalprice, 2) AS total_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 150)
        |GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE),
        |  round(o_totalprice, 2)
        |ORDER BY 5 DESC, 3 LIMIT 100""".stripMargin

  /** TPC-H Q15 (top supplier): quarterly revenue per supplier, keep the
    * maximum — the classic CTE-referenced-twice shape (once as the rank
    * source, once inside the scalar MAX subquery). Revenue equality
    * compares EXACT decimal sums, so the tie semantics are portable. */
  def tpchQ15(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(Q15Sql)
  }

  /** The exact text [[tpchQ15]] executes — exported so the oracle map
    * registers the IDENTICAL string (one source of truth). */
  val Q15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,6))
      |      * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name,
      |  round(CAST(total_revenue AS DOUBLE), 4) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17 (small-quantity-order revenue): lines whose quantity falls
    * below 20% of their part's average — the reference's correlated avg
    * rewritten as the EXACT integer inequality qty·5·n < Σqty over a
    * per-part aggregate (quantities are integral in this corpus), so no
    * float average can flip a boundary row cross-engine. */
  def tpchQ17(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(Q17Sql)
  }

  /** The exact text [[tpchQ17]] executes — exported so the oracle map
    * registers the IDENTICAL string (one source of truth). */
  val Q17Sql: String =
    """WITH pq AS (
      |  SELECT l_partkey AS pk,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
      |    count(*) AS nq
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
      |    AS DOUBLE) / 7.0, 6) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |JOIN pq ON pk = l_partkey
      |WHERE p_brand = 'Brand#4'
      |  AND CAST(round(l_quantity) AS BIGINT) * 5 * nq < sq""".stripMargin

  /** TPC-H Q22 (global sales opportunity), schema-adapted: the reference
    * keys on phone country codes this corpus lacks, so the preserved
    * SHAPE is the anti-join + above-average filter — customers with an
    * above-average positive balance and NO order since 2000, grouped by
    * nation. The average compare is the exact integer cross-multiply
    * bal·n > Σbal (cents), no float mean. */
  def tpchQ22(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(Q22Sql)
  }

  /** The exact text [[tpchQ22]] executes — exported so the oracle map
    * registers the IDENTICAL string (one source of truth). */
  val Q22Sql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal
      |  FROM customer),
      |pos AS (SELECT CAST(sum(bal) AS BIGINT) AS s, count(*) AS n
      |        FROM c WHERE bal > 0),
      |sel AS (
      |  SELECT c.c_custkey, c.c_nationkey, c.bal FROM c, pos
      |  WHERE c.bal > 0 AND c.bal * pos.n > pos.s
      |    AND NOT EXISTS (SELECT 1 FROM orders
      |      WHERE o_custkey = c.c_custkey
      |        AND o_orderdate >= TIMESTAMP '2000-01-01'))
      |SELECT n_name, count(*) AS numcust,
      |  CAST(sum(bal) AS BIGINT) AS totacctbal_cents
      |FROM sel JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** TPC-H Q3: unshipped-order shipping priority for one segment. */
  def tpchQ3(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(
      """SELECT l_orderkey,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |    * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 4) AS revenue,
        |  CAST(o_orderdate AS DATE) AS odate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
  }

  /** TPC-H Q1 — the FULL pricing summary (q1_agg is its two-measure
    * simplification): eight aggregates per (returnflag, linestatus) with
    * the disc_price/charge product chains in exact decimals and each avg
    * one fixed-order division, rounded at emit. The canonical scan-heavy
    * benchmark query: one pushed date filter, one map-combinable
    * hash-agg, nothing else. */
  def tpchQ1(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |    * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 4) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |    * (1 - CAST(l_discount AS DECIMAL(18,6)))
        |    * (1 + CAST(l_tax AS DECIMAL(18,6)))) AS DOUBLE), 4) AS sum_charge,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 6) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** TPC-H Q7 (volume shipping): bilateral trade revenue between two
    * nations per ship year — supplier's nation on the lineitem side,
    * customer's nation through orders, both directions kept. The corpus
    * schema supports it verbatim (the reference Q7's l_shipdate year
    * window mapped onto the synthetic 1995-2001 span; FRANCE/GERMANY
    * mapped onto the two synthetic nations with the largest bilateral
    * volume so the result is non-vacuous). The classic
    * join-graph stressor: nation joins BOTH ends of the fact chain, and
    * the (n1, n2) OR clause must not devolve into a cross product —
    * Catalyst plans two broadcast hash joins of the 25-row nation dim
    * plus the usual star spine. */
  def tpchQ7(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(Q7Sql)
  }

  /** The exact text [[tpchQ7]] executes — exported so the oracle map
    * registers the IDENTICAL string (one source of truth). */
  val Q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
        |  round(CAST(sum(volume) AS DOUBLE), 4) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    CAST(l_extendedprice AS DECIMAL(18,6))
        |      * (1 - CAST(l_discount AS DECIMAL(18,6))) AS volume
        |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
        |      OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin


  /** TPC-H Q10 (returned items): revenue lost to returns per customer in
    * one order quarter, top 20 — the corpus schema carries every needed
    * column except the contact fields (c_phone/c_address/c_comment do
    * not exist in this corpus), so the output keeps the reference's
    * identity + revenue + acctbal + nation shape. Plans as the 3-table
    * star (customer⋈orders⋈lineitem) with a broadcast nation decode and
    * a TakeOrderedAndProject top-20. */
  def tpchQ10(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(Q10Sql)
  }

  /** The exact text [[tpchQ10]] executes — exported so the oracle map
    * registers the IDENTICAL string (one source of truth). */
  val Q10Sql: String =
    """SELECT c_custkey, c_name,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |    * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 4) AS revenue,
        |  round(c_acctbal, 2) AS c_acctbal, n_name
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, round(c_acctbal, 2), n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin


  /** TPC-H Q12 (shipping priority pivot), schema-adapted: the reference
    * splits late lines by ship MODE and commit/receipt lateness — columns
    * this corpus does not carry (no l_shipmode/l_commitdate/
    * l_receiptdate) — so the preserved SHAPE is the Q12 CASE-sum pivot:
    * per ship-latency bucket (days from order date to ship date, the
    * corpus's only lateness signal), count lines on high-priority
    * (1-URGENT/2-HIGH) vs lower-priority orders over one ship year. Same
    * plan species as the reference Q12: one fact⋈orders equi-join, a
    * map-side CASE pivot, a tiny grouped aggregate. */
  def tpchQ12(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(Q12Sql)
  }

  /** The exact text [[tpchQ12]] executes — exported so the oracle map
    * registers the IDENTICAL string (one source of truth). */
  val Q12Sql: String =
    """SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 'fast'
        |            WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 'normal'
        |            ELSE 'slow' END AS ship_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin


  /** TPC-H Q5: revenue through LOCAL suppliers (customer and supplier in
    * the same nation) per Asian nation over two order years. */
  def tpchQ5(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(
      """SELECT n_name,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
        |    * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 4) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)
  }

  /** TPC-H Q8 (national market share — VERDICT r12 ask #1, the last
    * schema-supported classic): the share of one supplier-nation's revenue
    * within one region's customer demand for one part type, per order
    * year. The full 8-relation join graph — part prunes the fact first,
    * nation joins BOTH ends of the chain like Q7 (n1 decodes the
    * CUSTOMER side through region, n2 tags the SUPPLIER side for the
    * share CASE), and the two-level aggregation (CASE share inside a year
    * group) runs over exact DECIMAL volume sums with the double
    * cast+round applied only at the final ratio (the Q14 discipline).
    * Literals: p_type='ECONOMY' (1/6 of parts), r_name='AMERICA',
    * share nation NATION_1 (an AMERICA member, so the share is
    * non-vacuous), order years 1996-1997 inside the synthetic span.
    * Plans as: pushed p_type filter → broadcast part-key prune of
    * lineitem → the orders/customer spine → four broadcast dim decodes
    * (nation twice, region) → a 2-row final aggregate. */
  def tpchQ8(spark: SparkSession, sfDir: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(Q8Sql)
  }

  /** The exact text [[tpchQ8]] executes — exported so the oracle map
    * registers the IDENTICAL string (one source of truth). */
  val Q8Sql: String =
    """SELECT o_year,
        |  round(CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume
        |                 ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE)
        |    / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,6))
        |      * (1 - CAST(l_discount AS DECIMAL(18,6))) AS volume,
        |    n2.n_name AS nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |    AND p_type = 'ECONOMY'
        |) all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin
}
