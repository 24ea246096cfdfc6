package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Engine

/** The official TPC-H queries, VERBATIM where the driver's reduced
  * schema allows (round 19, verdict-18 #9).
  *
  * The testdata is TPC-H-ish but drops several columns (no partsupp
  * table; no l_commitdate/l_receiptdate/l_shipmode/l_shipinstruct; no
  * o_comment/o_clerk/o_shippriority; no c_/s_ address/phone/comment;
  * no p_mfgr/p_container), which blocks 15 of the 22 outright:
  *
  *   blocked: Q2/Q9/Q11/Q16/Q20 (partsupp), Q4/Q12/Q21 (commit/receipt
  *   dates + shipmode), Q3 (o_shippriority in SELECT), Q10/Q15/Q22
  *   (address/phone), Q13 (o_comment), Q17/Q19 (p_container/shipmode).
  *
  * The 7 runnable ones — Q1, Q5, Q6, Q7, Q8, Q14, Q18 — run as the
  * OFFICIAL text with only these envelope changes, each noted inline:
  *
  *  - substitution parameters adjusted to the synthetic domains (dates
  *    1995–2001, nations NATION_0..24, single-word p_type values) —
  *    TPC-H itself defines these as substitution parameters;
  *  - every float aggregate wrapped `CAST(round(. , k) AS DOUBLE)`:
  *    the price columns are DOUBLE in the parquet, so both engines sum
  *    with (different) float association — rounding to cents leaves
  *    ~1e-4 of headroom over the worst accumulated divergence;
  *  - Q7/Q8's extract(year ...) cast to BIGINT (the engines' extract
  *    widths differ);
  *  - Q18's ORDER BY gains the o_orderkey tiebreak so the LIMIT 100
  *    cut is deterministic across engines.
  *
  * Both engines run IDENTICAL statement text. These exercise what the
  * dialect sweeps hadn't: multi-join ordering at depth (Q5/Q7/Q8's 6–8
  * way joins), correlated-shape IN-subquery aggregation (Q18), CASE
  * inside ratio aggregates (Q8/Q14). The Spark plans ride Catalyst +
  * AQE end-to-end: dimension joins broadcast (nation/region/part are
  * tiny), fact joins shuffle on keys — plan shape asserted at 100 TB
  * posture in QueryPlanSpec for the same join families.
  */
object TpchQueries {

  import AnalyticsQueries.Declared

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    Engine.table(spark, sfDir, name)

  private val all = Seq.newBuilder[Declared]

  /** Identical-text lane: registers the named tables, runs `sql` on
    * Spark; the same text is the DuckDB oracle.
    */
  private def lane(name: String, tables: Seq[String], sql: String): Unit =
    all += Declared(name, (spark, sfDir) => {
      tables.foreach(tb =>
        t(spark, sfDir, tb).createOrReplaceTempView(tb))
      spark.sql(sql)
    }, Some(sql))

  /** Round-20 fixture lanes (verdict-19 #4): Q3/Q4/Q12/Q13/Q22 need
    * only COLUMNS the reduced schema drops, so each lane synthesizes
    * them DETERMINISTICALLY inside the statement itself — a fixture CTE
    * shadows the table name and derives the missing columns from keys
    * (`o_orderkey % 3 AS o_shippriority`, ship/commit/receipt dates as
    * key-offset intervals from l_shipdate, a seven-value l_shipmode
    * wheel, LIKE-able o_comment sentences, two-digit-prefix c_phone).
    * Q22 additionally filters the orders fixture (`o_custkey % 10 <>
    * 3`) because the synthetic data gives EVERY customer orders — the
    * official anti-join would be vacuously empty. The CTE bodies read
    * `main.<table>` — DuckDB's default schema, mirrored on the Spark
    * side by the engine's own directory ATTACH — so the IDENTICAL
    * statement text runs on both engines with the official query body
    * untouched below the WITH clause.
    */
  private var mainAttached: Option[(SparkSession, String)] = None
  private def laneWithMain(name: String, tables: Seq[String],
      sql: String): Unit =
    all += Declared(name, (spark, sfDir) => {
      tables.foreach(tb =>
        t(spark, sfDir, tb).createOrReplaceTempView(tb))
      if (!mainAttached.contains((spark, sfDir))) {
        spark.sql("DETACH IF EXISTS main")
        spark.sql(s"ATTACH '$sfDir' AS main")
        mainAttached = Some((spark, sfDir))
      }
      spark.sql(sql)
    }, Some(sql))

  lane("tpch_q01", Seq("lineitem"),
    """SELECT l_returnflag, l_linestatus,
         CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
         CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS sum_base_price,
         CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE)
           AS sum_disc_price,
         CAST(round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
           AS DOUBLE) AS sum_charge,
         CAST(round(avg(l_quantity), 6) AS DOUBLE) AS avg_qty,
         CAST(round(avg(l_extendedprice), 6) AS DOUBLE) AS avg_price,
         CAST(round(avg(l_discount), 6) AS DOUBLE) AS avg_disc,
         count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= date '1998-12-01' - interval '90' day
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""")

  lane("tpch_q05", Seq("customer", "orders", "lineitem", "supplier",
    "nation", "region"),
    """SELECT n_name,
         CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE)
           AS revenue
       FROM customer, orders, lineitem, supplier, nation, region
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate >= date '1996-01-01'
         AND o_orderdate < date '1997-01-01'
       GROUP BY n_name
       ORDER BY revenue DESC, n_name""")

  lane("tpch_q06", Seq("lineitem"),
    """SELECT CAST(round(sum(l_extendedprice * l_discount), 2) AS DOUBLE)
           AS revenue
       FROM lineitem
       WHERE l_shipdate >= date '1996-01-01'
         AND l_shipdate < date '1997-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""")

  lane("tpch_q07", Seq("supplier", "lineitem", "orders", "customer",
    "nation"),
    """SELECT supp_nation, cust_nation, l_year,
         CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
       FROM (
         SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
         FROM supplier, lineitem, orders, customer, nation n1, nation n2
         WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
           AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
           AND c_nationkey = n2.n_nationkey
           AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           AND l_shipdate BETWEEN date '1995-01-01' AND date '1996-12-31'
       ) shipping
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year""")

  lane("tpch_q08", Seq("part", "supplier", "lineitem", "orders",
    "customer", "nation", "region"),
    """SELECT o_year,
         CAST(round(sum(CASE WHEN nation = 'NATION_3' THEN volume
             ELSE 0 END) / sum(volume), 6) AS DOUBLE) AS mkt_share
       FROM (
         SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS nation
         FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
         WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
           AND l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_nationkey = n1.n_nationkey
           AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
           AND s_nationkey = n2.n_nationkey
           AND o_orderdate BETWEEN date '1995-01-01' AND date '1996-12-31'
           AND p_type = 'ECONOMY'
       ) all_nations
       GROUP BY o_year
       ORDER BY o_year""")

  lane("tpch_q14", Seq("lineitem", "part"),
    """SELECT CAST(round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
             THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
           sum(l_extendedprice * (1 - l_discount)), 6) AS DOUBLE)
         AS promo_revenue
       FROM lineitem, part
       WHERE l_partkey = p_partkey
         AND l_shipdate >= date '1996-09-01'
         AND l_shipdate < date '1996-10-01'""")

  lane("tpch_q18", Seq("customer", "orders", "lineitem"),
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         CAST(round(sum(l_quantity), 2) AS DOUBLE) AS total_qty
       FROM customer, orders, lineitem
       WHERE o_orderkey IN (
           SELECT l_orderkey FROM lineitem
           GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
         AND c_custkey = o_custkey AND o_orderkey = l_orderkey
       GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
       ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
       LIMIT 100""")

  /** Shared lineitem fixture for Q4/Q12: commit/receipt dates as
    * deterministic key offsets around l_shipdate (commit spans −5..+34
    * days so both orders of l_commitdate vs l_receiptdate occur), plus
    * the official seven-mode l_shipmode wheel.
    */
  private val lineitemFixture =
    """lineitem AS (SELECT l.*,
  l_shipdate + INTERVAL (CAST(l_partkey % 40 AS INT) - 5) DAY AS l_commitdate,
  l_shipdate + INTERVAL (CAST(l_linenumber * 7 % 30 AS INT)) DAY AS l_receiptdate,
  CASE CAST(l_suppkey % 7 AS INT) WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP'
    WHEN 2 THEN 'AIR' WHEN 3 THEN 'RAIL' WHEN 4 THEN 'TRUCK'
    WHEN 5 THEN 'FOB' ELSE 'REG AIR' END AS l_shipmode
  FROM main.lineitem l)"""

  laneWithMain("tpch_q03", Seq("customer", "lineitem"),
    """WITH orders AS (SELECT o.*, CAST(o_orderkey % 3 AS INT)
    AS o_shippriority FROM main.orders o)
SELECT l_orderkey,
  CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE)
    AS revenue,
  o_orderdate, o_shippriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < date '1996-03-15'
  AND l_shipdate > date '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_shippriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10""")

  laneWithMain("tpch_q04", Seq("orders"),
    "WITH " + lineitemFixture + """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= date '1996-07-01'
  AND o_orderdate < date '1996-07-01' + interval '3' month
  AND EXISTS (
    SELECT * FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_commitdate < l_receiptdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority""")

  laneWithMain("tpch_q12", Seq("orders"),
    "WITH " + lineitemFixture + """
SELECT l_shipmode,
  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipmode IN ('MAIL', 'SHIP')
  AND l_commitdate < l_receiptdate
  AND l_shipdate < l_commitdate
  AND l_receiptdate >= date '1996-01-01'
  AND l_receiptdate < date '1996-01-01' + interval '1' year
GROUP BY l_shipmode
ORDER BY l_shipmode""")

  laneWithMain("tpch_q13", Seq("customer"),
    """WITH orders AS (SELECT o.*,
  CASE WHEN o_orderkey % 5 = 0 THEN 'was special requests sleep'
    WHEN o_orderkey % 7 = 0 THEN 'special packages requests wake'
    ELSE 'quiet ordinary deposits' END AS o_comment FROM main.orders o)
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey
    AND o_comment NOT LIKE '%special%requests%'
  GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC""")

  laneWithMain("tpch_q22", Seq.empty,
    """WITH customer AS (SELECT c.*,
  CAST(11 + c_custkey % 25 AS VARCHAR) || '-' ||
    CAST(100 + c_custkey % 900 AS VARCHAR) AS c_phone FROM main.customer c),
orders AS (SELECT o.* FROM main.orders o WHERE o_custkey % 10 <> 3)
SELECT cntrycode, count(*) AS numcust,
  CAST(round(sum(c_acctbal), 2) AS DOUBLE) AS totacctbal
FROM (
  SELECT substring(c_phone FROM 1 FOR 2) AS cntrycode, c_acctbal
  FROM customer
  WHERE substring(c_phone FROM 1 FOR 2) IN ('13','31','23','29','30','18','17')
    AND c_acctbal > (
      SELECT avg(c_acctbal) FROM customer
      WHERE c_acctbal > 0.00
        AND substring(c_phone FROM 1 FOR 2)
          IN ('13','31','23','29','30','18','17'))
    AND NOT EXISTS (
      SELECT * FROM orders WHERE o_custkey = c_custkey)) custsale
GROUP BY cntrycode
ORDER BY cntrycode""")

  val declared: Seq[Declared] = all.result()

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(d => d.name -> d.fn).toMap

  val oracles: Map[String, String] =
    declared.flatMap(d => d.oracle.map(o =>
      d.name -> o.replaceAll("\\s+", " ").trim)).toMap
}
