package graft.operators

import graft.Registry.{Q, q, rowsOnly}
import graft.Tables
import graft.functions.OandaColumns
import graft.proto.ProtoWire
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining declared-surface entries: the UDF/expression surface (B38,
  * exercising the P8 spread semantics through the engine's column library
  * over fixture data) and the multimodal plumbing query (north-star; binary
  * payload + stubbed codec — no oracle, locked by MultimodalSpec).
  */
object ExtrasQueries {

  /** Shared dialect-neutral SQL for q49 (verbatim in Spark and DuckDB).
    * Declared before `all` — object vals initialize in order. */

  /** q121/q151 shared oracle CTE: the per-image aHash (hi, lo) halves from
    * the synthesis arithmetic (see q121's scaladoc). Ends with a CTE named
    * `ah(media_id, hi, lo)`. */
  val aHashCteSql: String =
    """WITH m AS (SELECT doc_id AS media_id, length(text) AS n,
      |                  (length(text) + 15) // 16 AS h,
      |                  list_transform(regexp_split_to_array(text, ''), c -> unicode(c)) AS codes
      |           FROM documents),
      |px AS (SELECT media_id, h, i // 16 AS y, i % 16 AS x,
      |              CASE WHEN i < n THEN codes[i + 1] ELSE 0 END AS v
      |       FROM m, LATERAL (SELECT unnest(generate_series(0, 16 * h - 1)) AS i)),
      |blk AS (SELECT media_id, h, (y * 8) // h AS r, x // 2 AS c,
      |               sum(v) AS bs, count(*) AS bc
      |        FROM px GROUP BY media_id, h, (y * 8) // h, x // 2),
      |tot AS (SELECT media_id, sum(bs) AS total, sum(bc) AS np FROM blk GROUP BY media_id),
      |bits AS (SELECT b.media_id, b.r * 8 + b.c AS idx
      |         FROM blk b JOIN tot t USING (media_id)
      |         WHERE b.bs * t.np > t.total * b.bc),
      |ah AS (SELECT m.media_id,
      |              CAST(COALESCE(sum(CASE WHEN idx >= 32 THEN (1::BIGINT << (idx - 32)) END), 0) AS BIGINT) AS hi,
      |              CAST(COALESCE(sum(CASE WHEN idx < 32 THEN (1::BIGINT << idx) END), 0) AS BIGINT) AS lo
      |       FROM m LEFT JOIN bits ON bits.media_id = m.media_id
      |       GROUP BY m.media_id)""".stripMargin

  val tpchQ3Sql: String =
    """SELECT l_orderkey,
      |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
      |       o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  /** Shared dialect-neutral SQL for q49b (TPC-H Q5 shape: 6-way join +
    * region filter + per-nation revenue). The revenue sum runs in exact
    * DECIMAL (4-dp products are exact in (28,4)) so the grouped sum is
    * order-independent across engines. */
  val tpchQ5Sql: String =
    """SELECT n_name,
      |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Shared dialect-neutral SQL for q49c (TPC-H Q10 shape: returned-item
    * revenue per customer over a half-year window). DECIMAL-exact revenue
    * sum; `c_acctbal` passes through untouched by arithmetic (both engines
    * read the identical parquet double) but is rounded for display parity. */
  val tpchQ10Sql: String =
    """SELECT c_custkey, c_name,
      |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue,
      |       round(c_acctbal, 4) AS acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND l_returnflag = 'R'
      |  AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Shared dialect-neutral SQL for q49d (TPC-H Q14 shape: promo revenue
    * percentage). Both the conditional and unconditional sums run in exact
    * DECIMAL so the single-row ratio is bit-identical across engines. */
  val tpchQ14Sql: String =
    """SELECT round(100.00 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |                  THEN CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))
      |                  ELSE CAST(0.0 AS DECIMAL(28,4)) END) AS DOUBLE)
      |             / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS promo_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  /** Shared dialect-neutral SQL for q49e (TPC-H Q19 shape: disjunctive
    * brand/size/quantity predicate bundles — the classic OR-of-ANDs the
    * optimizer must NOT turn into a cross product; fixture brands/sizes
    * substituted for the missing container/shipmode columns). */
  val tpchQ19Sql: String =
    """SELECT round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND ((p_brand = 'Brand#9'  AND p_size BETWEEN 1  AND 15 AND l_quantity >= 1  AND l_quantity <= 20)
      |    OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
      |    OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40))""".stripMargin

  /** Shared dialect-neutral SQL for q49f (TPC-H Q7 shape: bilateral
    * shipping volume between a nation pair by ship year — a 6-way join with
    * the nation dimension joined TWICE under different roles). */
  val tpchQ7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |       round(CAST(sum(CAST(round(volume, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |         l_extendedprice * (1 - l_discount) AS volume
      |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
      |    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Shared dialect-neutral SQL for q49g (TPC-H Q4 shape: order counts by
    * priority where some line item shipped >90 days after ordering — the
    * fixture's stand-in for the missing commit/receipt dates; the
    * correlated EXISTS decorrelates to a semi-join). */
  val tpchQ4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
      |              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Shared dialect-neutral SQL for q49h (TPC-H Q6 shape: pure scan-side
    * predicate revenue — every filter pushes to the parquet scan). */
  val tpchQ6Sql: String =
    """SELECT round(CAST(sum(CAST(round(l_extendedprice * l_discount, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** Shared dialect-neutral SQL for q49i (TPC-H Q13 shape: customer
    * order-count distribution — LEFT JOIN with an ON-clause filter, then a
    * histogram over the per-customer counts). */
  val tpchQ13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Shared dialect-neutral SQL for q49j (TPC-H Q18 shape: large-quantity
    * orders via IN over a grouped HAVING subquery; DECIMAL-exact sums). */
  val tpchQ18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, round(o_totalprice, 4) AS price,
      |       round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |                     HAVING sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) > 150)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY price DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin

  /** Shared dialect-neutral SQL for q49k (TPC-H Q17 shape: small-quantity
    * revenue below 20% of the part's average quantity — a correlated SCALAR
    * subquery in a comparison; l_quantity is integer-valued so the
    * correlated avg is exact in both engines). */
  val tpchQ17Sql: String =
    """SELECT round(CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE) / 7.0, 4) AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#9' AND p_type = 'PROMO'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** Shared dialect-neutral SQL for q49l (TPC-H Q22 shape: above-average-
    * balance customers with no recent orders; c_custkey%10 stands in for
    * the missing phone country code). The scalar avg threshold is rounded
    * to 4 dp so a last-ulp double-sum divergence cannot move the cut. */
  val tpchQ22Sql: String =
    """WITH pos AS (SELECT c_custkey, c_acctbal FROM customer
      |             WHERE c_acctbal > (SELECT round(avg(c_acctbal), 4) FROM customer
      |                                WHERE c_acctbal > 0.0)
      |               AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey
      |                               AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'))
      |SELECT c_custkey % 10 AS cgroup, count(*) AS numcust,
      |       round(CAST(sum(CAST(round(c_acctbal, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS totacctbal
      |FROM pos GROUP BY cgroup ORDER BY cgroup""".stripMargin

  /** The fixture has no `partsupp` table; the remaining TPC-H shapes that
    * need one derive it deterministically from lineitem's distinct
    * (partkey, suppkey) pairs: availqty = floored total quantity shipped
    * (integer-valued doubles sum exactly; floor+CAST because DuckDB's
    * double→BIGINT cast rounds while Spark's truncates), supplycost =
    * min unit price in integer MICRO-UNITS (cost·10⁴). The micro-unit
    * floor matters: `round(min(price/qty), 4)` lands on a 4-dp rounding
    * tie for 1,688 fixture pairs, where Spark (exact-decimal HALF_UP) and
    * DuckDB (scaled-double nearest) disagree by one ulp — floor() of the
    * identical IEEE product has no tie to disagree on. Every derived value
    * is therefore bit-identical across engines. */
  val partsuppCte: String =
    """partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         CAST(floor(sum(l_quantity)) AS BIGINT) AS ps_availqty,
      |         CAST(floor(min(l_extendedprice / l_quantity) * 10000) AS BIGINT) AS ps_supplycost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)""".stripMargin

  /** Shared dialect-neutral SQL for q49m (TPC-H Q1 pricing summary — the
    * official SQL shape; q09 carries the same semantics via the DataFrame
    * API). All sums run in exact DECIMAL; the averages are computed as
    * exact-sum / count so no engine-side avg() re-association can move a
    * ulp. */
  val tpchQ1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_qty,
      |       round(CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_base_price,
      |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_disc_price,
      |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_charge,
      |       round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
      |       round(CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE) / count(*), 4) AS avg_price,
      |       round(CAST(sum(CAST(round(l_discount, 4) AS DECIMAL(28,4))) AS DOUBLE) / count(*), 4) AS avg_disc,
      |       CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Shared dialect-neutral SQL for q49n (TPC-H Q2 min-cost supplier: the
    * correlated scalar-subquery-in-comparison over the derived partsupp;
    * p_size widened to a band because the fixture has exactly one
    * (size=15, LARGE) part). Cost equality compares two identically-rounded
    * doubles, so it is exact in both engines. */
  val tpchQ2Sql: String =
    s"""WITH $partsuppCte
       |SELECT round(s_acctbal, 4) AS acctbal, s_name, n_name, p_partkey, p_name
       |FROM part, supplier, partsupp, nation, region
       |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
       |  AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
       |  AND ps_supplycost = (SELECT min(ps2.ps_supplycost)
       |                       FROM partsupp ps2, supplier s2, nation n2, region r2
       |                       WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
       |                         AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
       |                         AND r2.r_name = 'EUROPE')
       |ORDER BY acctbal DESC, n_name, s_name, p_partkey
       |LIMIT 100""".stripMargin

  /** Shared dialect-neutral SQL for q49o (TPC-H Q8 national market share:
    * an 8-way join where nation joins twice — customer-region side filters
    * the market, supplier-nation side is the share numerator). The ratio
    * divides two exact DECIMAL sums cast to DOUBLE, so it is bit-identical
    * before the display round. */
  val tpchQ8Sql: String =
    """SELECT o_year,
      |       round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN vol ELSE CAST(0.0 AS DECIMAL(28,4)) END) AS DOUBLE)
      |             / CAST(sum(vol) AS DOUBLE), 4) AS mkt_share
      |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |             CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4)) AS vol,
      |             n2.n_name AS nation
      |      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
      |        AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
      |        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |        AND p_type = 'ECONOMY') all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** Shared dialect-neutral SQL for q49p (TPC-H Q9 product-type profit:
    * profit = revenue − supplycost·qty per (nation, year), parts filtered
    * by name. Revenue accumulates as exact DECIMAL (the established
    * tie-safe product rounding); cost accumulates as an exact BIGINT
    * micro-unit sum (supplycost is integer micro-units × integer
    * quantity) — the two exact totals meet only in the final per-group
    * subtraction, which lands on the 4-dp grid, never a rounding tie. */
  val tpchQ9Sql: String =
    s"""WITH $partsuppCte
       |SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE)
       |             - CAST(sum(ps_supplycost * CAST(l_quantity AS BIGINT)) AS DOUBLE) / 10000, 4) AS sum_profit
       |FROM part, supplier, lineitem, partsupp, orders, nation
       |WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
       |  AND p_partkey = l_partkey AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
       |  AND p_name LIKE '%widget%'
       |GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
       |ORDER BY nation, o_year DESC""".stripMargin

  /** Shared dialect-neutral SQL for q49q (TPC-H Q11 important stock: the
    * grouped-HAVING-vs-global-scalar value cut over the derived partsupp.
    * The spec's fixed fraction is SF-scaled (0.0001/SF); this uses a
    * scale-free equivalent — parts above 2× the average per-part value —
    * so the query is non-degenerate at every fixture SF. All values are
    * exact integer micro-unit sums, so the cut is engine-identical). */
  val tpchQ11Sql: String =
    s"""WITH $partsuppCte,
       |nat AS (SELECT ps_partkey, ps_supplycost * ps_availqty AS v
       |        FROM partsupp, supplier, nation
       |        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'),
       |tot AS (SELECT CAST(sum(v) AS DOUBLE) AS tv, CAST(count(DISTINCT ps_partkey) AS BIGINT) AS np FROM nat)
       |SELECT ps_partkey,
       |       round(CAST(sum(v) AS DOUBLE) / 10000, 4) AS part_value
       |FROM nat
       |GROUP BY ps_partkey
       |HAVING CAST(sum(v) AS DOUBLE) > (SELECT round(2.0 * tv / np, 4) FROM tot)
       |ORDER BY part_value DESC, ps_partkey""".stripMargin

  /** Shared dialect-neutral SQL for q49r (TPC-H Q12 shipmode priority
    * counts; l_returnflag stands in for the missing l_shipmode and
    * shipdate > orderdate + 60 days for the missing commit/receipt-date
    * lateness test — same conditional-count split by priority class). The
    * counting sums are CAST to BIGINT because DuckDB's sum(INTEGER) widens
    * to HUGEINT. */
  val tpchQ12Sql: String =
    """SELECT l_returnflag AS ship_mode,
      |       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey AND l_returnflag IN ('A', 'N')
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Shared dialect-neutral SQL for q49s (TPC-H Q15 top supplier: a
    * revenue CTE consumed twice — once joined, once under max() — the
    * view-reuse shape; revenue is rounded before the equality so the
    * max-match is exact). */
  val tpchQ15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Shared dialect-neutral SQL for q49t (TPC-H Q16 supplier-count by part
    * attribute: distinct-count over the derived partsupp with a NOT IN
    * exclusion — negative-balance suppliers stand in for the spec's
    * complaints predicate). */
  val tpchQ16Sql: String =
    """WITH partsupp AS (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem)
      |SELECT p_brand, p_type, p_size, CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      |FROM partsupp, part
      |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#9' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** Shared dialect-neutral SQL for q49u (TPC-H Q20 part promotion: nested
    * IN-subqueries with a correlated availability-vs-half-year-demand
    * scalar — availqty (exact BIGINT) against 0.5 × an exact integer-valued
    * double sum, so the cut cannot straddle a ulp). */
  val tpchQ20Sql: String =
    s"""WITH $partsuppCte
       |SELECT s_name
       |FROM supplier, nation
       |WHERE s_suppkey IN (
       |    SELECT ps_suppkey FROM partsupp
       |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
       |      AND ps_availqty > (SELECT 0.5 * sum(l_quantity) FROM lineitem
       |                         WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |                           AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |                           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
       |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
       |ORDER BY s_name""".stripMargin

  /** Shared dialect-neutral SQL for q49v (TPC-H Q21 waiting suppliers:
    * EXISTS + NOT EXISTS self-correlations on lineitem — the only supplier
    * late on a multi-supplier order; shipdate > orderdate + 60 days stands
    * in for the missing receipt/commit lateness). */
  val tpchQ21Sql: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** Shared dialect-neutral SQL for q101: a RECURSIVE CTE (Spark 4's
    * UnionLoop) walking the implicit binary-halving ancestor chain of each
    * key — transitive closure through the SQL surface, identical string in
    * both engines. floor()+CAST instead of integer division because DuckDB
    * `/` on integers yields DOUBLE and its double→BIGINT cast ROUNDS while
    * Spark's truncates. */
  val recursiveCteSql: String =
    """WITH RECURSIVE anc AS (
      |  SELECT c_custkey AS node, c_custkey AS a, CAST(0 AS BIGINT) AS depth
      |  FROM customer WHERE c_custkey < 64
      |  UNION ALL
      |  SELECT node, CAST(floor(a / 2.0) AS BIGINT), depth + 1 FROM anc WHERE a > 0
      |)
      |SELECT node, count(*) AS n_anc, max(depth) AS max_depth
      |FROM anc GROUP BY node ORDER BY node""".stripMargin

  // Shared dialect-neutral SQL for q103: an explicit join-strategy HINT.
  // Spark honors the BROADCAST(t) hint comment (plan asserted in
  // PlanShapeSpec); DuckDB parses it as a plain block comment — so ONE
  // string carries an engine-specific physical directive without breaking
  // the oracle. (Line comment on purpose: the hint's closing delimiter
  // would terminate a scaladoc block.)
  val hintSql: String =
    """SELECT /*+ BROADCAST(nation) */ n_name, count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |            JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Shared SQL for q77: LATERAL correlated subquery (top-2 orders per
    * customer). The lateral body re-sorts per outer row — the planner turns
    * it into a ranked-window shape; both engines accept the same string. */
  val lateralSql: String =
    """SELECT c_custkey, t.o_orderkey, round(t.o_totalprice, 4) AS price
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin

  /** Shared SQL for q78: deterministic mode (window over value counts — the
    * built-in mode() breaks ties arbitrarily in both engines, so the oracle
    * pins count-desc/value-asc) + exact interpolated median per group. */
  val modeMedianSql: String =
    """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS n
      |           FROM lineitem GROUP BY l_returnflag, l_quantity),
      |m AS (SELECT l_returnflag, l_quantity AS mode_qty,
      |             row_number() OVER (PARTITION BY l_returnflag ORDER BY n DESC, l_quantity) AS rn
      |      FROM c),
      |md AS (SELECT l_returnflag, round(median(l_quantity), 4) AS med_qty
      |       FROM lineitem GROUP BY l_returnflag)
      |SELECT m.l_returnflag, m.mode_qty, md.med_qty
      |FROM m JOIN md ON m.l_returnflag = md.l_returnflag
      |WHERE rn = 1 ORDER BY m.l_returnflag""".stripMargin

  /** Shared SQL for q79: equi-width histogram — the profiling companion to
    * q66. Bucket ids are width_bucket(x, 0, 110000, 11) semantics written as
    * portable floor arithmetic (DuckDB has no width_bucket; one IEEE divide
    * + floor is bit-identical in both engines; fixture range ⊂ [0, 110000)
    * so no clamping branch is needed). */
  val histogramSql: String =
    """SELECT l_returnflag,
      |       CAST(floor(l_extendedprice / 10000.0) + 1 AS BIGINT) AS bucket,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag, bucket
      |ORDER BY l_returnflag, bucket""".stripMargin

  val all: Seq[Q] = Seq(

    // B38: the engine's spread column function (P8 0.0-coercion) applied to
    // string-cast fixture columns: the numeric side round-trips through a
    // string cast, the garbage side (a flag letter) coerces to 0.0.
    q("q38_udf_spread", "B38 engine spread function over string-cast columns (P8 semantics)")(
      """SELECT l_orderkey, l_linenumber,
        |       round(coalesce(try_cast(CAST(l_extendedprice AS VARCHAR) AS DOUBLE), 0.0)
        |             - coalesce(try_cast(l_returnflag AS DOUBLE), 0.0), 4) AS spread
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(OandaColumns.spread(
          col("l_extendedprice").cast("string"), col("l_returnflag")), 4).as("spread"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Round-8 price-fidelity knob (SURVEY §1.3 closed): the SAME ingest
    // pipeline with spark.graft.spread.decimal=true derives a
    // DecimalType(18,6)-exact spread_dec alongside the f64 spread, and this
    // query aggregates it EXACTLY — sums of decimal spreads, no float
    // representation error at any scale. Prices are synthesized as integer-
    // derived 6-dp decimal strings (printf on BIGINTs, identical in both
    // engines), so every value is exactly representable and the oracle
    // compares decimals bit-for-bit. The f64 arm is untouched by the knob
    // (OandaColumnsSpec pins unwrap_or(0.0) semantics either way).
    q("q356_decimal_spread",
      "decimal(18,6)-exact spread through the real pipeline (spark.graft.spread.decimal knob)")(
      """WITH lines AS (
        |  SELECT event_type,
        |         printf('%d.%06d', event_id % 2000, (event_id * 7919) % 1000000) AS ask,
        |         printf('%d.%06d', event_id % 1500, (event_id * 104729) % 1000000) AS bid
        |  FROM events)
        |SELECT event_type AS instrument, CAST(count(*) AS BIGINT) AS n_ticks,
        |       CAST(CAST(sum(try_cast(ask AS DECIMAL(18,6)) - try_cast(bid AS DECIMAL(18,6)))
        |            AS DECIMAL(28,6)) AS VARCHAR) AS sum_spread,
        |       CAST(CAST(max(try_cast(ask AS DECIMAL(18,6)) - try_cast(bid AS DECIMAL(18,6)))
        |            AS DECIMAL(19,6)) AS VARCHAR) AS max_spread
        |FROM lines GROUP BY event_type ORDER BY instrument""".stripMargin
    ) { (s, dir) =>
      import graft.streaming.WireLines._
      val ev = Tables(s, dir, "events")
      val lines = ev.select(
        tickLine(emptyLevels, emptyLevels,
          format_string("%d.%06d", expr("event_id % 2000"), expr("(event_id * 7919) % 1000000")),
          format_string("%d.%06d", expr("event_id % 1500"), expr("(event_id * 104729) % 1000000")),
          col("event_type"), isoMicros(col("ts"))).as("value"))
        .repartition(s.sparkContext.defaultParallelism)
      // round-9: decimal-first is the pipeline DEFAULT — no knob set here;
      // this query hash-passing at both scales is the default-path evidence
      val wire =
        graft.streaming.OandaPipeline.derive(graft.streaming.OandaPipeline.parse(lines))
      wire.filter(col("message_type") === "price_tick")
        .groupBy(col("tick.instrument").as("instrument"))
        .agg(count(lit(1)).as("n_ticks"),
          // VARCHAR at the boundary only (the oracle comparator is
          // parquet-native); the fixed 6-dp rendering IS the exactness proof
          sum(col("spread_dec")).cast("decimal(28,6)").cast("string").as("sum_spread"),
          max(col("spread_dec")).cast("decimal(19,6)").cast("string").as("max_spread"))
        .orderBy("instrument")
    },

    // B37: protobuf wire round-trip over fixture data — events are projected
    // into tick-shaped wire lines, run through the FULL ingest pipeline
    // (parse → derive → proto encode), decoded back from the wire bytes, and
    // the decoded fields must equal the originals (oracle = identity SQL).
    q("q37_proto_roundtrip", "B37 encode→decode round-trip of events through the wire contract")(
      """SELECT event_id, event_type AS instrument,
        |       CAST(value AS VARCHAR) AS closeout_ask,
        |       CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) AS seconds,
        |       CAST((microsecond(ts::TIMESTAMP) % 1000000) * 1000 AS BIGINT) AS nanos
        |FROM events ORDER BY event_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      import graft.streaming.WireLines._
      val lines = Tables(s, dir, "events").select(
        col("event_id"),
        tickLine(emptyLevels, emptyLevels, col("value"), lit("0"),
          col("event_type"), isoMicros(col("ts"))).as("value"))
        // the fixture is one small parquet file = one input partition; at a
        // real deployment parallelism comes from many source partitions —
        // emulate it here so the pipeline uses every core
        .repartition(s.sparkContext.defaultParallelism)
      val wire = graft.streaming.OandaPipeline.pipeline(lines)
        .select(col("event_id"), col("proto"))
      wire.as[(Long, Array[Byte])].map { case (id, bytes) =>
        // decode StreamMessageProto{price_tick{...}} back off the wire
        val tick = ProtoWire.readFields(ProtoWire.readFields(bytes).head.bytes)
        val ask = tick.find(_.number == 3).map(f => new String(f.bytes, "UTF-8")).getOrElse("")
        val ts = tick.find(_.number == 7).map(f => ProtoWire.readFields(f.bytes)).getOrElse(Seq())
        val instr = tick.find(_.number == 5).map(f => new String(f.bytes, "UTF-8")).getOrElse("")
        (id, instr, ask,
          ts.find(_.number == 1).map(_.varint).getOrElse(0L),
          ts.find(_.number == 2).map(_.varint).getOrElse(0L))
      }.toDF("event_id", "instrument", "closeout_ask", "seconds", "nanos")
        .orderBy("event_id")
    },

    // B12 variant: CUBE with grouping markers (all 4 grouping-set combos).
    q("q12b_cube", "B12 cube(l_returnflag, l_linestatus) with grouping markers")(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(grouping(l_returnflag) AS BIGINT) AS g1,
        |       CAST(grouping(l_linestatus) AS BIGINT) AS g2,
        |       count(*) AS n,
        |       round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g1, g2, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g1"),
          grouping(col("l_linestatus")).cast("long").as("g2"),
          count(lit(1)).as("n"),
          sum(round(col("l_quantity"), 4).cast("decimal(28,4)")).cast("double").as("qty"))
        .select(col("l_returnflag"), col("l_linestatus"), col("g1"), col("g2"),
          col("n"), round(col("qty"), 4).as("qty"))
        .orderBy(col("g1"), col("g2"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // Correlated scalar subquery + uncorrelated IN subquery (Catalyst
    // decorrelates both into joins — SURVEY §4.2 'built-in' list).
    q("q43_subqueries", "correlated scalar + IN subqueries over orders/customer")(
      """SELECT o_orderkey, round(o_totalprice, 4) AS price
        |FROM orders o
        |WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 1000)
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "orders").createOrReplaceTempView("graft_orders")
      Tables(s, dir, "customer").createOrReplaceTempView("graft_customer")
      s.sql(
        """SELECT o_orderkey, round(o_totalprice, 4) AS price
          |FROM graft_orders o
          |WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice) FROM graft_orders o2
          |                      WHERE o2.o_custkey = o.o_custkey)
          |  AND o_custkey IN (SELECT c_custkey FROM graft_customer WHERE c_acctbal > 1000)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // As-of join: each event picks the user's most recent prior order.
    // Spark side is the scalable union+window formulation (sort-merge within
    // key partitions, no join explosion); oracle is DuckDB's native ASOF
    // JOIN. Orders are pre-deduped to one row per (custkey, date) so the
    // as-of pick is deterministic under date ties.
    q("q44_asof_join", "as-of join: latest order at or before each event")(
      """WITH od AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS okey
        |            FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, od.okey AS last_order, od.o_orderdate AS od
        |FROM events e ASOF JOIN od
        |  ON e.user_id = od.o_custkey AND od.o_orderdate <= e.ts::TIMESTAMP
        |ORDER BY e.event_id""".stripMargin
    ) { (s, dir) =>
      val od = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("okey"))
        .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
          col("okey"), lit(null).cast("long").as("event_id"), lit(0).as("tag"))
      val ev = Tables(s, dir, "events")
        .select(col("user_id").as("k"), col("ts").as("t"),
          lit(null).cast("long").as("okey"), col("event_id"), lit(1).as("tag"))
      val w = Window.partitionBy(col("k")).orderBy(col("t"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      od.unionAll(ev)
        .withColumn("last_order", last(col("okey"), ignoreNulls = true).over(w))
        .withColumn("od", last(when(col("tag") === 0, col("t")), ignoreNulls = true).over(w))
        .filter(col("tag") === 1 && col("last_order").isNotNull)
        .select(col("event_id"), col("last_order"), col("od"))
        .orderBy("event_id")
    },

    // Forward as-of join — q44's mirror: for each view event, the EARLIEST
    // purchase of the same user strictly after it (next-purchase
    // attribution). Same union+window construction with the frame flipped
    // to [current, ∞); purchases sort before same-instant views so the
    // strict > bound holds, and event_id in the sort key makes same-µs
    // purchase ties deterministic. One partitioned sort serves every view
    // — no per-row probe.
    q("q44b_asof_forward", "forward as-of join: next purchase after each view (per user)")(
      """WITH v AS (SELECT event_id, user_id, ts::TIMESTAMP AS t FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id, user_id, ts::TIMESTAMP AS t FROM events WHERE event_type = 'purchase'),
        |nx AS (SELECT v.event_id, v.user_id, min(p.t) AS nt
        |       FROM v JOIN p ON p.user_id = v.user_id AND p.t > v.t
        |       GROUP BY v.event_id, v.user_id)
        |SELECT nx.event_id, min(p.event_id) AS next_purchase, nx.nt AS pt
        |FROM nx JOIN p ON p.user_id = nx.user_id AND p.t = nx.nt
        |GROUP BY nx.event_id, nx.nt ORDER BY nx.event_id""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id").as("k"), col("ts").as("t"), col("event_id"),
          when(col("event_type") === "purchase", 0).otherwise(1).as("tag"))
      val w = Window.partitionBy(col("k"))
        .orderBy(col("t"), col("tag"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      e.withColumn("next_purchase",
          first(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("pt", first(when(col("tag") === 0, col("t")), ignoreNulls = true).over(w))
        .filter(col("tag") === 1 && col("next_purchase").isNotNull)
        .select(col("event_id"), col("next_purchase"), col("pt"))
        .orderBy("event_id")
    },

    // Exact interpolated percentiles, grouped (Spark `percentile` ≙ DuckDB
    // `quantile_cont`: both linear interpolation over the sorted set).
    q("q41_percentiles", "exact p25/p50/p75 of quantity and price per returnflag")(
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.25), 4) AS q25,
        |       round(quantile_cont(l_quantity, 0.50), 4) AS q50,
        |       round(quantile_cont(l_quantity, 0.75), 4) AS q75,
        |       round(quantile_cont(l_extendedprice, 0.50), 4) AS price_med
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.25)"), 4).as("q25"),
          round(expr("percentile(l_quantity, 0.50)"), 4).as("q50"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("q75"),
          round(expr("percentile(l_extendedprice, 0.50)"), 4).as("price_med"))
        .orderBy("l_returnflag")
    },

    // Approximate percentiles — the sketch q41 degrades to at 100 TB,
    // round-11 converted from the GK rows-only row to a DETERMINISTIC
    // portable sketch with a full hash oracle: a fixed-width (w=4)
    // histogram whose per-(flag, bin) counts are the persisted synopsis
    // (algebraic merge — counts add; O(|bins|) state regardless of row
    // volume), read out with within-bin linear interpolation so the
    // estimate is continuous (value error ≤ w by construction, asserted
    // against q41's exact quantiles in ApproxAndRecallSpec). Every
    // readout number is fixed-shape IEEE arithmetic over exact integers
    // (bin*4 int, counts int, one double division per term, /4.0 exact in
    // binary), so the estimates hash-match the oracle bit-for-bit —
    // unlike GK, whose merge order is partitioning-dependent. Spark's
    // native approx_percentile (GK) stays covered by the same spec's
    // rank-error test. The cumulative window runs over the ≤ ⌈50/w⌉ bins
    // of each flag — synopsis scale, q194's bins-not-rows discipline.
    q("q41b_approx_percentiles",
      "approx p25/p50/p75 of quantity per returnflag (mergeable width-4 histogram, interpolated, hash-verified)")(
      """WITH hb AS (SELECT l_returnflag, CAST(floor(l_quantity / 4.0) AS BIGINT) AS bin,
        |                   count(*) AS c
        |            FROM lineitem GROUP BY l_returnflag, bin),
        |cum AS (SELECT l_returnflag, bin, c,
        |               sum(c) OVER (PARTITION BY l_returnflag ORDER BY bin
        |                            ROWS UNBOUNDED PRECEDING) AS cc,
        |               sum(c) OVER (PARTITION BY l_returnflag) AS n
        |        FROM hb),
        |pick AS (SELECT l_returnflag,
        |                min(CASE WHEN cc * 100 >= n * 25 THEN bin END) AS b25,
        |                min(CASE WHEN cc * 100 >= n * 50 THEN bin END) AS b50,
        |                min(CASE WHEN cc * 100 >= n * 75 THEN bin END) AS b75
        |         FROM cum GROUP BY l_returnflag)
        |SELECT p.l_returnflag,
        |       round(CAST((s25.bin * 4) AS DOUBLE) + 4.0 * ((CAST(s25.n * 25 AS DOUBLE) / 100.0 - CAST((s25.cc - s25.c) AS DOUBLE)) / CAST(s25.c AS DOUBLE)), 4) + 0 AS q25,
        |       round(CAST((s50.bin * 4) AS DOUBLE) + 4.0 * ((CAST(s50.n * 50 AS DOUBLE) / 100.0 - CAST((s50.cc - s50.c) AS DOUBLE)) / CAST(s50.c AS DOUBLE)), 4) + 0 AS q50,
        |       round(CAST((s75.bin * 4) AS DOUBLE) + 4.0 * ((CAST(s75.n * 75 AS DOUBLE) / 100.0 - CAST((s75.cc - s75.c) AS DOUBLE)) / CAST(s75.c AS DOUBLE)), 4) + 0 AS q75
        |FROM pick p
        |JOIN cum s25 ON s25.l_returnflag = p.l_returnflag AND s25.bin = p.b25
        |JOIN cum s50 ON s50.l_returnflag = p.l_returnflag AND s50.bin = p.b50
        |JOIN cum s75 ON s75.l_returnflag = p.l_returnflag AND s75.bin = p.b75
        |ORDER BY p.l_returnflag""".stripMargin
    ) { (s, dir) =>
      val hb = Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          floor(col("l_quantity") / 4.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("c")) // the persisted synopsis
      val wCum = Window.partitionBy("l_returnflag").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hb
        .withColumn("cc", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(Window.partitionBy("l_returnflag")))
      def pickP(p: Int) =
        min(when(col("cc") * 100 >= col("n") * p,
          struct(col("bin"), col("c"), col("cc")))).as(s"s$p")
      def interp(p: Int) =
        round(col(s"s$p.bin").multiply(4).cast("double") +
          lit(4.0) * (((col("n") * p).cast("double") / 100.0 -
            (col(s"s$p.cc") - col(s"s$p.c")).cast("double")) /
            col(s"s$p.c").cast("double")), 4) + lit(0)
      cum.groupBy("l_returnflag")
        .agg(max(col("n")).as("n"), pickP(25), pickP(50), pickP(75))
        .select(col("l_returnflag"),
          interp(25).as("q25"), interp(50).as("q50"), interp(75).as("q75"))
        .orderBy("l_returnflag")
    },

    // Statistical aggregates: correlation, covariance, stddev/variance —
    // scale-free or ratio quantities, stable at round-4 across engines.
    q("q42_stats", "corr/covar/stddev/variance over lineitem")(
      """SELECT round(corr(l_quantity, l_extendedprice), 4) + 0 AS c,
        |       round(covar_samp(l_quantity, l_extendedprice), 4) + 0 AS cv,
        |       round(stddev_samp(l_extendedprice), 4) AS sd,
        |       round(var_samp(l_quantity), 4) AS vr
        |FROM lineitem""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("c"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cv"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd"),
        round(var_samp(col("l_quantity")), 4).as("vr"))
    },

    // Collection aggregates: collect_set/list made deterministic by sorting
    // before joining to a string.
    q("q48_collect_agg", "sorted collect_set of statuses + priorities per customer segment")(
      """SELECT c_mktsegment,
        |       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
        |       array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS prios,
        |       count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(concat_ws(",", sort_array(collect_set(col("o_orderstatus")))).as("statuses"),
          concat_ws(",", sort_array(collect_set(col("o_orderpriority")))).as("prios"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },

    // Pivot: wide-format aggregation (Spark's pivot operator; oracle states
    // the equivalent conditional aggregation — identical output columns).
    q("q46_pivot", "pivot lineitem quantities to returnflag columns per linestatus")(
      """SELECT l_linestatus,
        |       round(CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(round(l_quantity,4) AS DECIMAL(28,4)) END) AS DOUBLE), 4) AS A,
        |       round(CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(round(l_quantity,4) AS DECIMAL(28,4)) END) AS DOUBLE), 4) AS N,
        |       round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(round(l_quantity,4) AS DECIMAL(28,4)) END) AS DOUBLE), 4) AS R
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(round(col("l_quantity"), 4).cast("decimal(28,4)")).cast("double"))
        .select(col("l_linestatus"), round(col("A"), 4).as("A"),
          round(col("N"), 4).as("N"), round(col("R"), 4).as("R"))
        .orderBy("l_linestatus")
    },

    // UNPIVOT / melt — q46's inverse and the wide→long reshape every
    // feature pipeline needs before per-measure processing: the four
    // lineitem measure columns melt to (id, measure, val) ROWS via the
    // native Dataset.unpivot (Spark 3.4+ public API — no stack() string
    // templating), then one grouped pass per measure proves the reshape
    // end-to-end at data scale. Scale shape: unpivot is a row-local 4×
    // fan-out (no shuffle of its own); the rollup is the usual partial
    // agg. The oracle derives each measure's aggregate directly — the
    // hash match pins Spark's unpivot variable naming and value mapping.
    q("q283_unpivot", "melt 4 lineitem measures to rows via Dataset.unpivot + per-measure rollup")(
      """WITH m AS (
        |  SELECT 'l_discount' AS measure, CAST(count(*) AS BIGINT) AS n,
        |         round(CAST(sum(CAST(round(l_discount, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS total
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
        |         round(CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', CAST(count(*) AS BIGINT),
        |         round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE), 4)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', CAST(count(*) AS BIGINT),
        |         round(CAST(sum(CAST(round(l_tax, 4) AS DECIMAL(28,4))) AS DOUBLE), 4)
        |  FROM lineitem)
        |SELECT measure, n, total FROM m ORDER BY measure""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("val"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double"), 4).as("total"))
        .orderBy("measure")
    },

    // P15 dead-letter routing, oracle-checked end-to-end: wire lines are
    // synthesized with deterministic fault injection (every 23rd line
    // malformed JSON, every 29th a schema-mismatched tick, every 31st an
    // unknown shape), the FULL pipeline classifies them, and the oracle
    // recomputes the expected routing arithmetic directly.
    q("q47_dead_letter_routing", "pipeline classification counts under injected faults")(
      """SELECT CASE WHEN event_id % 23 = 0 THEN 'malformed'
        |            WHEN event_id % 29 = 0 THEN 'unknown'
        |            WHEN event_id % 31 = 0 THEN 'unknown'
        |            ELSE 'price_tick' END AS message_type,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      import graft.streaming.WireLines._
      val good = tickLine(emptyLevels, emptyLevels, col("value"), lit("0"),
        col("event_type"), isoMicros(col("ts")))
      val badSchema = to_json(struct( // liquidity as string → typed-validation fallback
        array(struct(lit("1.1").as("price"), lit("notanumber").as("liquidity"))).as("asks"),
        array().cast("array<struct<price:string,liquidity:string>>").as("bids"),
        lit("1.1").as("closeoutAsk"), lit("1.0").as("closeoutBid"),
        col("event_type").as("instrument"), lit("tradeable").as("status"),
        isoMicros(col("ts")).as("time")))
      val lines = Tables(s, dir, "events").select(
        when(pmod(col("event_id"), lit(23)) === 0, lit("{not json"))
          .when(pmod(col("event_id"), lit(29)) === 0, badSchema)
          .when(pmod(col("event_id"), lit(31)) === 0, lit("""{"foo": 1}"""))
          .otherwise(good).as("value"))
        .repartition(s.sparkContext.defaultParallelism)
      graft.streaming.OandaPipeline.parse(lines)
        .groupBy("message_type").agg(count(lit(1)).as("n"))
        .orderBy("message_type")
    },

    // Multimodal: binary columns + typed metadata + mapPartitions codec
    // plumbing (stubbed decode — see Multimodal.FakeCodec). Oracle-checked
    // (upgraded from rows-only): the stub codec is deterministic byte
    // arithmetic, so the whole decode→features→resize chain has an exact
    // SQL model — the payloads are ASCII text bytes, making DuckDB's
    // per-character unicode() equal to Spark's per-byte view.
    q("q39_multimodal_features", "multimodal decode/feature/resize over binary payloads")(
      """WITH m AS (SELECT doc_id AS media_id,
        |        ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
        |        text, length(text) AS nb,
        |        list_transform(regexp_split_to_array(text, ''), c -> unicode(c)) AS codes
        |        FROM documents)
        |SELECT media_id, kind, CAST(nb AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN kind = 'image'
        |       THEN greatest(1, (1 + CASE WHEN nb > 0 THEN codes[1] ELSE 0 END) // 2)
        |       ELSE 0 END AS INT) AS width,
        |  CAST(CASE WHEN kind = 'image'
        |       THEN greatest(1, (1 + CASE WHEN nb > 1 THEN codes[2] ELSE 0 END) // 2)
        |       ELSE 0 END AS INT) AS height,
        |  CAST(CASE WHEN kind = 'audio' THEN 16000 ELSE 0 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN kind = 'audio' THEN nb * 2 ELSE 0 END AS BIGINT) AS n_samples,
        |  CAST(CASE WHEN kind = 'video' THEN least(32, 1 + nb // 256) ELSE 0 END AS INT) AS n_frames,
        |  ('0x' || substr(md5(text), 1, 15))::BIGINT AS content_hash,
        |  round(len(list_filter(codes, c -> c // 16 = 0)) * 1.0 / greatest(nb, 1), 4) AS hist0,
        |  round(len(list_filter(codes, c -> c // 16 = 6)) * 1.0 / greatest(nb, 1), 4) AS hist6
        |FROM m ORDER BY media_id""".stripMargin
    ) { (s, dir) => graft.multimodal.Multimodal.featuresQuery(s, dir) },

    // Multimodal with a REAL codec: RIFF/PCM16 WAV payloads synthesized per
    // doc, decoded back by graft.multimodal.WavCodec (actual magic checks +
    // chunk-list walk, not the stub), audio features extracted. The oracle
    // models the synthesis arithmetic directly; the container parse is
    // additionally golden/property-tested in WavCodecSpec.
    q("q69_wav_decode", "real WAV (RIFF/PCM16) encode→decode→features per doc")(
      """WITH m AS (SELECT doc_id AS media_id, length(text) AS n,
        |        list_transform(regexp_split_to_array(text, ''), c -> (unicode(c) - 96) * 256) AS smp
        |        FROM documents)
        |SELECT media_id,
        |  CAST(44 + 2 * n AS BIGINT) AS n_bytes,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT) AS peak,
        |  round(sqrt(list_reduce(list_transform(smp, x -> x * 1.0 * x), (a, b) -> a + b) / n), 4) AS rms
        |FROM m ORDER BY media_id""".stripMargin
    ) { (s, dir) => graft.multimodal.Multimodal.wavFeaturesQuery(s, dir) },

    // Image sibling of q69: real BMP (24-bit uncompressed) encode→decode.
    // px0 (top-left pixel) equals the doc's first char ONLY if the decoder
    // flips BMP's bottom-up row storage — the oracle checks the container
    // parse, not just byte arithmetic. Row stride 16·3 = 48 is already
    // 4-aligned, so n_bytes = 54 + 48·h exactly.
    q("q70_bmp_decode", "real BMP (24-bit) encode→decode→features per doc")(
      """WITH m AS (SELECT doc_id AS media_id, length(text) AS n,
        |        list_transform(regexp_split_to_array(text, ''), c -> unicode(c)) AS codes
        |        FROM documents)
        |SELECT media_id,
        |  CAST(54 + 48 * ((n + 15) // 16) AS BIGINT) AS n_bytes,
        |  CAST(16 AS INT) AS width,
        |  CAST((n + 15) // 16 AS INT) AS height,
        |  CAST(codes[1] AS BIGINT) AS px0,
        |  round(list_reduce(list_transform(codes, x -> x * 1.0), (a, b) -> a + b)
        |        / (16 * ((n + 15) // 16)), 4) AS mean_gray
        |FROM m ORDER BY media_id""".stripMargin
    ) { (s, dir) => graft.multimodal.Multimodal.bmpFeaturesQuery(s, dir) },

    // Perceptual image hash (aHash) through the REAL BMP decode — the
    // visual sibling of q34d's SimHash: 8×8 block averages vs the image
    // mean, all comparisons as integer cross-multiplication (no float
    // anywhere), 64-bit hash shipped as two 32-bit halves (DuckDB's shift
    // is overflow-checked at bit 63). The oracle replays the synthesis
    // arithmetic over the text codes — the Spark side must round-trip the
    // actual container (encode → parse → row flip) to agree.
    q("q121_image_ahash", "perceptual aHash per image via real BMP decode (8×8 blocks, integer-exact)")(
      // reuses the shared aHash CTE (q151's candidate hashes must be the
      // same construction, so the SQL lives once); `m` stays addressable
      // for the height column
      s"""$aHashCteSql
         |SELECT m.media_id, CAST(m.h AS BIGINT) AS height,
         |       ah.hi AS ahash_hi, ah.lo AS ahash_lo
         |FROM m JOIN ah USING (media_id)
         |ORDER BY m.media_id""".stripMargin
    ) { (s, dir) => graft.multimodal.Multimodal.bmpAHashQuery(s, dir) },

    // Frame-level audio features through the REAL WAV codec: zero-crossing
    // count + peak 80-sample frame energy, all integer-exact (q69's synth
    // arithmetic gives the oracle an exact SQL model; the Spark side must
    // round-trip the actual RIFF container to agree).
    q("q136_audio_frames", "audio ZCR + peak frame energy via real WAV decode")(
      """WITH m AS (SELECT doc_id AS media_id, length(text) AS n,
        |        list_transform(regexp_split_to_array(text, ''),
        |                       c -> CAST((unicode(c) - 96) * 256 AS BIGINT)) AS smp
        |        FROM documents)
        |SELECT media_id, CAST(n AS BIGINT) AS n_samples,
        |  CAST(len(list_filter(generate_series(2, n),
        |       i -> (smp[i] < 0) <> (smp[i-1] < 0))) AS BIGINT) AS zc,
        |  CAST(n // 80 AS BIGINT) AS n_frames,
        |  CAST(COALESCE(list_max(list_transform(generate_series(1, n // 80),
        |       f -> list_reduce(list_transform(smp[(f-1)*80+1 : f*80], x -> x * x),
        |                        (a, b) -> a + b))), 0) AS BIGINT) AS max_frame_energy
        |FROM m ORDER BY media_id""".stripMargin
    ) { (s, dir) => graft.multimodal.Multimodal.audioFramesQuery(s, dir) },

    // Video through a REAL container codec — retires the last stub: an
    // uncompressed-DIB RIFF AVI is written and parsed from the public
    // spec (AviCodec: magics, hdrl/strl headers, movi chunk walk with the
    // odd-size skip law, per-frame bottom-up row flip), completing the
    // real-codec trio with WAV (q69) and BMP (q70). Only inter-frame
    // COMPRESSION stays out of scope (no H.264 lib in this environment).
    // The oracle models the synthesis arithmetic — px0/px_last pin frame
    // order + row flip, n_bytes pins the 232 + 216·nf container size law,
    // and MOTION (Σ|frame_f − frame_{f−1}|) is the genuinely-video
    // feature. AviCodecSpec golden-tests the container itself.
    q("q315_video_decode",
      "real AVI (RIFF, uncompressed DIB) encode→decode→features incl. inter-frame motion")(
      """WITH m AS (SELECT doc_id AS media_id, length(text) AS n,
        |        list_transform(regexp_split_to_array(text, ''),
        |                       c -> CAST(unicode(c) AS BIGINT)) AS codes
        |        FROM documents),
        |p AS (SELECT media_id, n, codes,
        |             least(4, greatest(1, (n + 63) // 64)) AS nf FROM m)
        |SELECT media_id,
        |  CAST(232 + nf * 216 AS BIGINT) AS n_bytes,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST(5 AS BIGINT) AS fps,
        |  CAST(codes[1] AS BIGINT) AS px0,
        |  CAST(CASE WHEN nf * 64 <= n THEN codes[nf * 64] ELSE 0 END AS BIGINT) AS px_last,
        |  CAST(list_reduce(list_transform(generate_series(1, nf * 64),
        |       i -> CASE WHEN i <= n THEN codes[i] ELSE 0 END), (a, b) -> a + b)
        |       AS BIGINT) AS sum_gray,
        |  CAST(CASE WHEN nf = 1 THEN 0 ELSE
        |       list_reduce(list_transform(generate_series(65, nf * 64),
        |       i -> abs((CASE WHEN i <= n THEN codes[i] ELSE 0 END)
        |              - (CASE WHEN i - 64 <= n THEN codes[i - 64] ELSE 0 END))),
        |       (a, b) -> a + b) END AS BIGINT) AS motion
        |FROM p ORDER BY media_id""".stripMargin
    ) { (s, dir) => graft.multimodal.Multimodal.videoFeaturesQuery(s, dir) },

    // Voice-activity segmentation — q136's frame energies turned into
    // SEGMENTS: threshold each 80-sample frame's exact integer energy at
    // the corpus-median level (71500·65536 — measured, so both classes
    // genuinely occur), merge consecutive active frames per clip. The
    // island merge is a row-local sequential fold inside the same map
    // that decodes the real RIFF container (a window formulation would
    // shuffle frames that are already adjacent in the clip's own bytes);
    // the oracle folds the identical recurrence through a list_reduce
    // with (current, best) packed into one integer accumulator.
    q("q310_vad_segments",
      "voice-activity segments per clip: energy threshold + island merge via real WAV decode")(
      s"""WITH m AS (SELECT doc_id AS media_id, length(text) AS n,
         |        list_transform(regexp_split_to_array(text, ''),
         |                       c -> CAST((unicode(c) - 96) * 256 AS BIGINT)) AS smp
         |        FROM documents),
         |fr AS (SELECT media_id, n // 80 AS nf,
         |        list_transform(generate_series(1, n // 80),
         |          f -> list_reduce(list_transform(smp[(f-1)*80+1 : f*80], x -> x * x),
         |                           (a, b) -> a + b)) AS en
         |       FROM m)
         |SELECT media_id, CAST(nf AS BIGINT) AS n_frames,
         |  CAST(len(list_filter(en, x -> x >= ${graft.multimodal.Multimodal.VadEnergyThreshold})) AS BIGINT) AS n_speech,
         |  CAST(len(list_filter(generate_series(1, nf),
         |    i -> en[i] >= ${graft.multimodal.Multimodal.VadEnergyThreshold}
         |         AND (i = 1 OR en[i-1] < ${graft.multimodal.Multimodal.VadEnergyThreshold}))) AS BIGINT) AS n_segments,
         |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(en, x -> CASE WHEN x >= ${graft.multimodal.Multimodal.VadEnergyThreshold}
         |                                 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
         |    (acc, fl) -> CASE WHEN fl = 1
         |                 THEN ((acc // 100000) + 1) * 100000
         |                      + greatest(acc % 100000, (acc // 100000) + 1)
         |                 ELSE acc % 100000 END) % 100000 AS BIGINT) AS max_segment
         |FROM fr ORDER BY media_id""".stripMargin
    ) { (s, dir) => graft.multimodal.Multimodal.vadSegmentsQuery(s, dir) },

    // 2× PCM decimation through the REAL WAV codec — the audio RESIZE verb
    // (image has q163 box-resize + q303 flip/crop; audio had none): each
    // output sample is the toward-zero mean of its 2-sample block (odd tail
    // passes through), re-encoded at the halved 4 kHz rate and decoded
    // AGAIN so the stats prove the codec on the NEW geometry (q163's
    // doubled-round-trip discipline, incl. odd/empty clips). The oracle
    // re-derives every output sample from the synthesis arithmetic —
    // toward-zero `//` ≡ the Scala integer division (q197's verified
    // parity, negatives included: samples go down to −16384).
    q("q361_audio_decimate",
      "2× PCM box-decimation via real WAV round-trips (toward-zero integer means)")(
      """WITH m AS (SELECT doc_id AS media_id, length(text) AS n,
        |        list_transform(regexp_split_to_array(text, ''),
        |                       c -> CAST((unicode(c) - 96) * 256 AS BIGINT)) AS smp
        |        FROM documents),
        |o AS (SELECT media_id, n, (n + 1) // 2 AS outn,
        |             list_transform(generate_series(1, (n + 1) // 2),
        |               f -> CASE WHEN 2 * f <= n THEN (smp[2 * f - 1] + smp[2 * f]) // 2
        |                         ELSE smp[2 * f - 1] END) AS outs
        |      FROM m)
        |SELECT media_id, CAST(n AS BIGINT) AS n_samples,
        |       CAST(outn AS BIGINT) AS out_samples,
        |       CAST(4000 AS INT) AS out_rate,
        |       CAST(44 + 2 * outn AS BIGINT) AS out_bytes,
        |       CAST(coalesce(list_max(list_transform(outs, x -> abs(x))), 0) AS BIGINT) AS peak_out,
        |       CAST(coalesce(list_reduce(list_prepend(CAST(0 AS BIGINT), outs),
        |                                 (a, b) -> a + b), 0) AS BIGINT) AS sum_out
        |FROM o ORDER BY media_id""".stripMargin
    ) { (s, dir) => graft.multimodal.Multimodal.audioDecimateQuery(s, dir) },

    // Scene-cut detection through the REAL AVI codec — the temporal
    // SEGMENTATION verb on video (q315 measures total motion; this decides
    // WHERE shots change): a cut at frame f iff the adjacent-frame absolute
    // pixel difference is strictly above the clip's own mean pair
    // difference — integer cross-multiplication (d_f·n_pairs > Σd), so the
    // rule is self-normalizing and exact with no tuned threshold. The
    // oracle replays the synthesis arithmetic over the text codes; the
    // Spark side must round-trip the actual RIFF container (frame order +
    // bottom-up row flips) to agree.
    q("q362_scene_cuts",
      "adjacent-frame scene cuts via real AVI decode (above-mean integer diff rule)")(
      """WITH m AS (SELECT doc_id AS media_id, length(text) AS n,
        |        list_transform(regexp_split_to_array(text, ''),
        |                       c -> CAST(unicode(c) AS BIGINT)) AS codes
        |        FROM documents),
        |p AS (SELECT media_id, n, codes,
        |             least(4, greatest(1, (n + 63) // 64)) AS nf FROM m),
        |d AS (SELECT media_id, nf,
        |             list_transform(generate_series(2, nf),
        |               f -> list_reduce(list_transform(generate_series(1, 64),
        |                 i -> abs((CASE WHEN (f - 1) * 64 + i <= n
        |                           THEN codes[(f - 1) * 64 + i] ELSE 0 END)
        |                        - (CASE WHEN (f - 2) * 64 + i <= n
        |                           THEN codes[(f - 2) * 64 + i] ELSE 0 END))),
        |               (a, b) -> a + b)) AS diffs
        |      FROM p),
        |t AS (SELECT media_id, nf, diffs, CAST(len(diffs) AS BIGINT) AS np,
        |             CAST(coalesce(list_reduce(list_prepend(CAST(0 AS BIGINT), diffs),
        |                                       (a, b) -> a + b), 0) AS BIGINT) AS sd
        |      FROM d)
        |SELECT media_id, CAST(nf AS BIGINT) AS n_frames,
        |       CAST(len(list_filter(diffs, x -> x * np > sd)) AS BIGINT) AS n_cuts,
        |       CAST(coalesce(list_filter(generate_series(2, nf),
        |                                 f -> diffs[f - 1] * np > sd)[1], 0) AS BIGINT) AS first_cut,
        |       CAST(coalesce(list_max(diffs), 0) AS BIGINT) AS max_diff,
        |       sd AS sum_diff
        |FROM t ORDER BY media_id""".stripMargin
    ) { (s, dir) => graft.multimodal.Multimodal.sceneCutQuery(s, dir) },

    // Order-book depth — the FX-domain query a consumer of the reference
    // would actually run: 3-level ask ladders synthesized onto the wire,
    // parsed back through the REAL ingest pipeline (to_json → OandaPipeline
    // from_json + ladder validation), exploded by level, and rolled up to
    // cumulative liquidity depth per instrument. Proves the ladder arrays
    // survive the wire round-trip value-exactly (price strings are
    // shortest-repr doubles — parse back bit-identical, q118's contract).
    // Depth sums are exact BIGINTs; avg price per level is a DECIMAL-exact
    // grouped sum. One groupBy + one 3-row window per instrument.
    q("q159_book_depth", "cumulative ask-ladder depth per instrument through the wire round-trip")(
      """WITH lv AS (
        |  SELECT event_type AS instrument, i,
        |         CASE WHEN i = 0 THEN value WHEN i = 1 THEN value + 0.01
        |              ELSE value + 0.02 END AS price,
        |         CAST((i + 1) * 1000000 AS BIGINT) AS liquidity
        |  FROM events CROSS JOIN (VALUES (0), (1), (2)) AS l(i)),
        |g AS (SELECT instrument, CAST(i AS BIGINT) AS lvl, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(liquidity) AS BIGINT) AS liq,
        |             round(CAST(sum(CAST(round(price, 4) AS DECIMAL(28,4))) AS DOUBLE)
        |                   / count(*), 4) AS avg_price
        |      FROM lv GROUP BY instrument, i)
        |SELECT instrument, lvl, n, liq,
        |       CAST(sum(liq) OVER (PARTITION BY instrument ORDER BY lvl
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_liq,
        |       avg_price
        |FROM g ORDER BY instrument, lvl""".stripMargin
    ) { (s, dir) =>
      import graft.streaming.WireLines._
      val asks = array((0 until 3).map(i =>
        level(col("value") + lit(i * 0.01), lit(1000000L * (i + 1)))): _*)
      val lines = Tables.fanout(s, dir, "events")
        .select(tickLine(asks, asks, col("value"), col("value") - 0.01,
          col("event_type"), isoMicros(col("ts"))).as("value"))
      graft.streaming.OandaPipeline.pipeline(lines)
        .filter(col("message_type") === "price_tick")
        .select(col("tick.instrument").as("instrument"),
          posexplode(col("tick.asks")).as(Seq("lvl", "l")))
        .select(col("instrument"), col("lvl").cast("long").as("lvl"),
          col("l.price").cast("double").as("price"), col("l.liquidity").as("liquidity"))
        .groupBy("instrument", "lvl")
        .agg(count(lit(1)).as("n"), sum(col("liquidity")).as("liq"),
          round(sum(round(col("price"), 4)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double")
            / count(lit(1)), 4).as("avg_price"))
        .withColumn("cum_liq", sum(col("liq")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("instrument").orderBy("lvl")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
        .select(col("instrument"), col("lvl"), col("n"), col("liq"),
          col("cum_liq"), col("avg_price"))
        .orderBy("instrument", "lvl")
    },

    // Frame sampling — the fourth multimodal verb (decode / feature-extract
    // / resize / frame-sample): every 4th 256-byte stub frame per video
    // payload with a portable per-frame content hash. The fan-out (one row
    // per sampled frame) is the real plumbing; the oracle replays the
    // chunk geometry over the ASCII text (q39's byte≡char contract).
    q("q153_frame_sample", "every-4th-frame sampling per video payload with frame hashes")(
      s"""WITH v AS (SELECT doc_id AS media_id, text, length(text) AS n
         |           FROM documents WHERE doc_id % 3 = 2),
         |f AS (SELECT media_id, text, n,
         |             unnest(generate_series(0, least(32, 1 + n // 256) - 1)) AS fi
         |      FROM v)
         |SELECT media_id, CAST(fi AS BIGINT) AS frame_idx,
         |       CAST(least(n, fi * 256 + 256) - fi * 256 AS BIGINT) AS frame_bytes,
         |       ${graft.functions.PortableHash.md5LongSql("substr(text, fi * 256 + 1, 256)")} AS frame_hash
         |FROM f WHERE fi % 4 = 0
         |ORDER BY media_id, frame_idx""".stripMargin
    ) { (s, dir) => graft.multimodal.Multimodal.frameSampleQuery(s, dir) },

    // REAL pixel resize — the multimodal resize verb on actual pixels
    // (metadata-level resize ships in the q39 feature chain): decode the
    // synthesized 16×h BMP through the real codec, 2×2 integer box-
    // downsample (floor of block sum over block count; odd heights leave
    // 2-pixel bottom blocks), re-encode the 8×⌈h/2⌉ image and decode it
    // AGAIN — the emitted stats only match if the codec round-trips the
    // RESIZED geometry too. The oracle re-derives every downsampled pixel
    // from the synthesis arithmetic (char codes, zero padding) with the
    // same floor division — integer-exact end to end, no codec on the
    // oracle side at all.
    q("q163_image_resize",
      "2x2 integer box-downsample through the real BMP codec (re-encoded + re-decoded)")({
      def p(y: String, x: String) =
        s"CASE WHEN ($y) * 16 + ($x) < n THEN ord(substr(text, ($y) * 16 + ($x) + 1, 1)) ELSE 0 END"
      s"""WITH t AS (SELECT doc_id AS media_id, text, length(text) AS n,
         |                  (length(text) + 15) // 16 AS h
         |           FROM documents WHERE length(text) >= 1),
         |ys AS (SELECT media_id, text, n, h,
         |              unnest(generate_series(0, (h + 1) // 2 - 1)) AS yy FROM t),
         |c AS (SELECT media_id, text, n, h, yy,
         |             unnest(generate_series(0, 7)) AS xx FROM ys),
         |r AS (SELECT media_id, h, yy, xx,
         |        ${p("2*yy", "2*xx")} + ${p("2*yy", "2*xx+1")} +
         |        CASE WHEN 2*yy+1 < h
         |             THEN ${p("2*yy+1", "2*xx")} + ${p("2*yy+1", "2*xx+1")}
         |             ELSE 0 END AS bs,
         |        CASE WHEN 2*yy+1 < h THEN 4 ELSE 2 END AS cnt
         |      FROM c)
         |SELECT media_id, CAST(8 AS BIGINT) AS rw, CAST((h + 1) // 2 AS BIGINT) AS rh,
         |       CAST(max(CASE WHEN yy = 0 AND xx = 0 THEN bs // cnt END) AS BIGINT) AS rpx0,
         |       CAST(sum(bs // cnt) AS BIGINT) AS rsum
         |FROM r GROUP BY media_id, h ORDER BY media_id""".stripMargin
    }) { (s, dir) => graft.multimodal.Multimodal.bmpResizeQuery(s, dir) },

    // Integral image (summed-area table) as a DISTRIBUTED 2D prefix sum:
    // decoded pixels become (image, y, x, gray) ROWS and ii(y,x) builds
    // as two cascaded windows — along x within (image, row), then along y
    // within (image, column); both partitioned, so the identical plan
    // handles a mosaic tile grid of any size. The box sum is then read
    // back from the table via the 4-corner identity while the oracle sums
    // the same rectangles DIRECTLY from the synthesis codes, so the hash
    // match proves ii is a correct summed-area table, not just a copied
    // aggregate. The O(1)-box-lookup is the primitive under Viola-Jones
    // features and mean pooling.
    q("q223_integral_image",
      "summed-area table via cascaded per-row/per-column prefix windows + 4-corner box readback")(
      """WITH m AS (SELECT doc_id AS media_id, length(text) AS n, text,
        |                  (length(text) + 15) // 16 AS h
        |           FROM documents WHERE length(text) >= 1),
        |px AS (SELECT media_id, n, text, h,
        |              unnest(generate_series(0, h * 16 - 1)) AS i FROM m),
        |v AS (SELECT media_id, h, i // 16 AS y, i % 16 AS x,
        |             CASE WHEN i < n THEN ord(substr(text, CAST(i + 1 AS INT), 1))
        |                  ELSE 0 END AS g
        |      FROM px),
        |meta AS (SELECT media_id, h, least(h - 1, 10) AS y2,
        |                greatest(least(h - 1, 10) - 4, 0) AS y1,
        |                least(h - 1, 8) AS yc FROM m),
        |agg AS (SELECT v.media_id,
        |               CAST(sum(g) AS BIGINT) AS total,
        |               CAST(sum(CASE WHEN y <= yc AND x <= 8 THEN g ELSE 0 END) AS BIGINT) AS center_ii,
        |               CAST(sum(CASE WHEN y BETWEEN y1 AND y2 AND x BETWEEN 6 AND 10
        |                        THEN g ELSE 0 END) AS BIGINT) AS box5
        |        FROM v JOIN meta USING (media_id) GROUP BY v.media_id)
        |SELECT m.media_id, CAST(m.h AS BIGINT) AS height,
        |       a.total, a.center_ii, a.box5
        |FROM m JOIN agg a USING (media_id) ORDER BY media_id""".stripMargin
    ) { (s, dir) => graft.multimodal.Multimodal.integralImageQuery(s, dir) },

    // Image near-dup pairs — the visual dedup END of the q121 aHash: 64-bit
    // hashes band into 4×16-bit segments, candidates are the band
    // equi-join, survivors pass exact Hamming ≤ 3. By pigeonhole, ≤ 3
    // flipped bits cannot touch all 4 bands, so band recall is EXACT at
    // this threshold — the oracle is therefore an independent brute-force
    // pair join, not a mirror of the candidate rule. Same banding shape as
    // SimHash text dedup (q34f): candidate volume scales with duplicate
    // density, never n². The Spark side hashes through the REAL BMP
    // decode (q121's contract).
    q("q151_image_neardup_pairs", "image near-dup pairs: banded aHash + exact Hamming ≤ 3")(
      s"""$aHashCteSql
         |SELECT a.media_id AS m1, b.media_id AS m2,
         |       CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS dist
         |FROM ah a JOIN ah b ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
         |ORDER BY m1, m2""".stripMargin
    ) { (s, dir) =>
      val ah = graft.multimodal.Multimodal.bmpAHashQuery(s, dir)
        .select(col("media_id"), col("ahash_hi").as("hi"), col("ahash_lo").as("lo"))
        .cache() // both band legs
      def bands(m: String, hi: String, lo: String) = ah.select(
        col("media_id").as(m), col("hi").as(hi), col("lo").as(lo),
        explode(array(
          struct(lit(0).as("bi"), expr("shiftright(hi, 16) & 65535").as("bv")),
          struct(lit(1).as("bi"), expr("hi & 65535").as("bv")),
          struct(lit(2).as("bi"), expr("shiftright(lo, 16) & 65535").as("bv")),
          struct(lit(3).as("bi"), expr("lo & 65535").as("bv")))).as("b"))
        .select(col(m), col(hi), col(lo), col("b.bi").as("bi"), col("b.bv").as("bv"))
      val dist = bit_count(col("h1").bitwiseXOR(col("h2"))) +
        bit_count(col("l1").bitwiseXOR(col("l2")))
      bands("m1", "h1", "l1")
        .join(bands("m2", "h2", "l2"), Seq("bi", "bv"))
        .filter(col("m1") < col("m2"))
        .select("m1", "m2", "h1", "l1", "h2", "l2").distinct()
        .filter(dist <= 3)
        .select(col("m1"), col("m2"), dist.cast("long").as("dist"))
        .orderBy("m1", "m2")
    },

    // q151 at Hamming ≤ 4 — past plain banding's exactness ceiling (4
    // flips can touch all 4 bands: recall measured < 1 at d ≥ 4). The fix
    // is 1-bit MULTI-PROBE: one join side also probes every 1-bit
    // perturbation of each 16-bit band value (17 probes/band — row-local
    // fan-out, the join stays an equi-join on (band, value)). Pigeonhole
    // restores PROVABLE exactness: if every band differed by ≥ 2 bits the
    // total distance would be ≥ 8, so any pair at d ≤ 7 — a fortiori the
    // d ≤ 4 threshold here — has a band within Hamming 1, which the probe
    // ball catches. The oracle therefore stays independent brute force,
    // not a candidate mirror. Candidate volume: 17× the band rows on one
    // side only — still linear in images, never n².
    q("q151b_image_neardup_multiprobe",
      "image near-dup pairs at Hamming ≤ 4: banded aHash + 1-bit multi-probe")(
      s"""$aHashCteSql
         |SELECT a.media_id AS m1, b.media_id AS m2,
         |       CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS dist
         |FROM ah a JOIN ah b ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 4
         |ORDER BY m1, m2""".stripMargin
    ) { (s, dir) =>
      val ah = graft.multimodal.Multimodal.bmpAHashQuery(s, dir)
        .select(col("media_id"), col("ahash_hi").as("hi"), col("ahash_lo").as("lo"))
        .cache() // exact leg + probe leg
      def bands(m: String, hi: String, lo: String) = ah.select(
        col("media_id").as(m), col("hi").as(hi), col("lo").as(lo),
        explode(array(
          struct(lit(0).as("bi"), expr("shiftright(hi, 16) & 65535").as("bv")),
          struct(lit(1).as("bi"), expr("hi & 65535").as("bv")),
          struct(lit(2).as("bi"), expr("shiftright(lo, 16) & 65535").as("bv")),
          struct(lit(3).as("bi"), expr("lo & 65535").as("bv")))).as("b"))
        .select(col(m), col(hi), col(lo), col("b.bi").as("bi"), col("b.bv").as("bv"))
      // probe leg: the band value itself plus its 16 one-bit flips
      val probed = bands("m2", "h2", "l2")
        .select(col("m2"), col("h2"), col("l2"), col("bi"),
          explode(array((-1 to 15).map(j =>
            if (j < 0) col("bv") else col("bv").bitwiseXOR(lit(1L << j))): _*)).as("pbv"))
        .withColumnRenamed("pbv", "bv")
      val dist = bit_count(col("h1").bitwiseXOR(col("h2"))) +
        bit_count(col("l1").bitwiseXOR(col("l2")))
      bands("m1", "h1", "l1")
        .join(probed, Seq("bi", "bv"))
        .filter(col("m1") < col("m2"))
        .select("m1", "m2", "h1", "l1", "h2", "l2").distinct()
        .filter(dist <= 4)
        .select(col("m1"), col("m2"), dist.cast("long").as("dist"))
        .orderBy("m1", "m2")
    },

    // Image dedup GROUPS — the multimodal twin of q34g/q34h's document
    // dedup: q151's banded-aHash Hamming ≤ 3 pairs (candidate volume scales
    // with duplicate density, never n²) fed into the O(log² n) large-star/
    // small-star contraction, then one grouped pass per component. The
    // component label IS the canonical keeper (StarContraction's min-id
    // contract), so the output is exactly a dedup decision: keep
    // `component`, drop the other `n_members − 1` images. The oracle
    // derives the same groups independently — brute-force Hamming pairs +
    // a recursive-CTE transitive closure with min-label components — so
    // the banding, the contraction, and the canonical rule are all
    // cross-checked at once.
    q("q213_image_dedup_groups",
      "image near-dup groups: banded aHash pairs → star-contraction CC → keeper + size")(
      s"""${aHashCteSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |p AS (SELECT a.media_id AS m1, b.media_id AS m2
         |      FROM ah a JOIN ah b ON a.media_id < b.media_id
         |      WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3),
         |e AS (SELECT m1 AS a, m2 AS b FROM p UNION SELECT m2, m1 FROM p),
         |tc AS (SELECT a, b FROM e
         |       UNION
         |       SELECT tc.a, e.b FROM tc JOIN e ON tc.b = e.a WHERE tc.a <> e.b),
         |comp AS (SELECT a AS m, least(a, min(b)) AS comp FROM tc GROUP BY a)
         |SELECT comp AS component, CAST(count(*) AS BIGINT) AS n_members,
         |       CAST(max(m) AS BIGINT) AS max_member
         |FROM comp GROUP BY comp ORDER BY component""".stripMargin
    ) { (s, dir) =>
      val ah = graft.multimodal.Multimodal.bmpAHashQuery(s, dir)
        .select(col("media_id"), col("ahash_hi").as("hi"), col("ahash_lo").as("lo"))
        .cache() // both band legs
      def bands(m: String, hi: String, lo: String) = ah.select(
        col("media_id").as(m), col("hi").as(hi), col("lo").as(lo),
        explode(array(
          struct(lit(0).as("bi"), expr("shiftright(hi, 16) & 65535").as("bv")),
          struct(lit(1).as("bi"), expr("hi & 65535").as("bv")),
          struct(lit(2).as("bi"), expr("shiftright(lo, 16) & 65535").as("bv")),
          struct(lit(3).as("bi"), expr("lo & 65535").as("bv")))).as("b"))
        .select(col(m), col(hi), col(lo), col("b.bi").as("bi"), col("b.bv").as("bv"))
      val dist = bit_count(col("h1").bitwiseXOR(col("h2"))) +
        bit_count(col("l1").bitwiseXOR(col("l2")))
      val pairs = bands("m1", "h1", "l1")
        .join(bands("m2", "h2", "l2"), Seq("bi", "bv"))
        .filter(col("m1") < col("m2"))
        .select("m1", "m2", "h1", "l1", "h2", "l2").distinct()
        .filter(dist <= 3)
        .select(col("m1").as("d1"), col("m2").as("d2"))
      StarContraction.components(pairs)
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"), max(col("doc_id")).as("max_member"))
        .orderBy("component")
    },

    // Ingest throughput proxy: the full reference pipeline (parse → dispatch
    // → derive → proto encode) over wire lines synthesized from every event
    // row ×3 — Bench times this as the single-node throughput headline
    // (the reference's own loop is bounded by its HTTP feed; this measures
    // the engine's processing ceiling).
    rowsOnly("q40_pipeline_throughput", "full ingest pipeline over synthesized wire lines (events ×3)") {
      (s, dir) =>
        val lines = Tables(s, dir, "events")
          .crossJoin(s.range(3).select(col("id").as("rep")))
          .select {
            import graft.streaming.WireLines._
            tickLine(
              asks = array(level(col("value"), col("rep") + 1)),
              bids = array(level(col("value") - 0.01, lit(1L))),
              closeoutAsk = col("value"), closeoutBid = col("value") - 0.01,
              instrument = col("event_type"), time = isoMicros(col("ts"))).as("value")
          }
          .repartition(s.sparkContext.defaultParallelism) // single-file fixture → fan out
        graft.streaming.OandaPipeline.pipeline(lines)
          .groupBy("message_type")
          .agg(count(lit(1)).as("n"), count(col("proto")).as("n_encoded"))
          .orderBy("message_type")
    },

    // SQL front end: ONE SQL string, parsed and executed by BOTH engines
    // (Spark over temp views, DuckDB over the fixture views) — proves the
    // spark.sql path end-to-end, not just the DataFrame API. TPC-H Q3
    // shape adapted to the fixture schema (o_orderpriority for the missing
    // o_shippriority; explicit tiebreaks for determinism).
    q("q49_sql_tpch_q3", "TPC-H Q3 shape via spark.sql — same string runs in DuckDB")(
      ExtrasQueries.tpchQ3Sql
    ) { (s, dir) =>
      Seq("customer", "orders", "lineitem").foreach(t =>
        Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ3Sql)
    },

    // TPC-H Q5 shape through the SQL surface: a 6-way star join (3 small
    // dims broadcast, fact-fact on orderkey) with a selective region
    // filter. Catalyst's join reorder + broadcast selection plans this
    // unaided — the point of routing it through spark.sql.
    q("q49b_sql_tpch_q5", "TPC-H Q5 shape via spark.sql — 6-way join, per-nation revenue")(
      ExtrasQueries.tpchQ5Sql
    ) { (s, dir) =>
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ5Sql)
    },

    // TPC-H Q10 shape: which customers returned the most revenue in a
    // window. Fact-fact join on orderkey + two broadcast dims; the
    // returnflag filter pushes to the lineitem scan.
    q("q49c_sql_tpch_q10", "TPC-H Q10 shape via spark.sql — returned-item revenue per customer")(
      ExtrasQueries.tpchQ10Sql
    ) { (s, dir) =>
      Seq("customer", "orders", "lineitem", "nation")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ10Sql)
    },

    // TPC-H Q14 shape: promo revenue share — a single-row conditional-
    // aggregate ratio over a month of shipments joined to part.
    q("q49d_sql_tpch_q14", "TPC-H Q14 shape via spark.sql — promo revenue percentage")(
      ExtrasQueries.tpchQ14Sql
    ) { (s, dir) =>
      Seq("lineitem", "part")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ14Sql)
    },

    // TPC-H Q19 shape: OR-of-AND predicate bundles over a part join. The
    // planner must keep the equi-join on p_partkey and evaluate the
    // disjunction as a post-join filter (common p_partkey conjunct
    // extracted) — not fall back to a nested loop.
    q("q49e_sql_tpch_q19", "TPC-H Q19 shape via spark.sql — disjunctive predicate revenue")(
      ExtrasQueries.tpchQ19Sql
    ) { (s, dir) =>
      Seq("lineitem", "part")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ19Sql)
    },

    // TPC-H Q7 shape: nation is joined twice under different aliases
    // (supplier side vs customer side) — exercises alias resolution and
    // double-broadcast of the same dimension through the SQL front end.
    q("q49f_sql_tpch_q7", "TPC-H Q7 shape via spark.sql — bilateral nation-pair volume by year")(
      ExtrasQueries.tpchQ7Sql
    ) { (s, dir) =>
      Seq("supplier", "lineitem", "orders", "customer", "nation")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ7Sql)
    },

    // TPC-H Q4 shape: correlated EXISTS with a cross-row date comparison —
    // Catalyst decorrelates it into a left-semi join on orderkey.
    q("q49g_sql_tpch_q4", "TPC-H Q4 shape via spark.sql — EXISTS late-shipment order counts")(
      ExtrasQueries.tpchQ4Sql
    ) { (s, dir) =>
      Seq("orders", "lineitem").foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ4Sql)
    },

    // TPC-H Q6 shape: the pushdown benchmark — every predicate lands in
    // PushedFilters on the scan; the aggregate is a 1-row global sum.
    q("q49h_sql_tpch_q6", "TPC-H Q6 shape via spark.sql — scan-predicate revenue")(
      ExtrasQueries.tpchQ6Sql
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(ExtrasQueries.tpchQ6Sql)
    },

    // TPC-H Q13 shape: LEFT JOIN with a non-key ON predicate (kept on the
    // join, NOT pushed below it — the left-join filter-placement trap),
    // then a second aggregation over the first's output.
    q("q49i_sql_tpch_q13", "TPC-H Q13 shape via spark.sql — customer order-count distribution")(
      ExtrasQueries.tpchQ13Sql
    ) { (s, dir) =>
      Seq("customer", "orders").foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ13Sql)
    },

    // TPC-H Q18 shape: IN over a grouped-HAVING subquery (semi-join against
    // an aggregate) feeding a 3-way join + re-aggregation.
    q("q49j_sql_tpch_q18", "TPC-H Q18 shape via spark.sql — large-quantity order ranking")(
      ExtrasQueries.tpchQ18Sql
    ) { (s, dir) =>
      Seq("customer", "orders", "lineitem").foreach(t =>
        Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ18Sql)
    },

    // TPC-H Q1 (official SQL shape; the DataFrame twin is q09): the
    // pricing-summary scan-aggregate every engine benchmarks first. One
    // pass over lineitem, 6 groups, partial+final HashAggregate.
    q("q49m_sql_tpch_q1", "TPC-H Q1 pricing summary via spark.sql — full 8-aggregate shape")(
      ExtrasQueries.tpchQ1Sql
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(ExtrasQueries.tpchQ1Sql)
    },

    // TPC-H Q2: correlated scalar subquery in a comparison (min-cost
    // supplier per part) — Catalyst decorrelates the aggregate subquery
    // into a join against a grouped min.
    q("q49n_sql_tpch_q2", "TPC-H Q2 min-cost supplier via spark.sql — correlated scalar subquery")(
      ExtrasQueries.tpchQ2Sql
    ) { (s, dir) =>
      Seq("part", "supplier", "lineitem", "nation", "region")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ2Sql)
    },

    // TPC-H Q8: the widest join in the suite (8 relations, nation twice) —
    // market share of one supplier nation inside one customer region.
    q("q49o_sql_tpch_q8", "TPC-H Q8 national market share via spark.sql — 8-way join")(
      ExtrasQueries.tpchQ8Sql
    ) { (s, dir) =>
      Seq("part", "supplier", "lineitem", "orders", "customer", "nation", "region")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ8Sql)
    },

    // TPC-H Q9: product-type profit — lineitem joined to the derived
    // partsupp on BOTH halves of its composite key plus part/orders/
    // supplier/nation.
    q("q49p_sql_tpch_q9", "TPC-H Q9 product-type profit via spark.sql — composite-key partsupp join")(
      ExtrasQueries.tpchQ9Sql
    ) { (s, dir) =>
      Seq("part", "supplier", "lineitem", "orders", "nation")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ9Sql)
    },

    // TPC-H Q11: grouped HAVING against a global scalar over the same
    // derived table — the CTE is evaluated under two different aggregation
    // scopes.
    q("q49q_sql_tpch_q11", "TPC-H Q11 important stock via spark.sql — HAVING vs global scalar")(
      ExtrasQueries.tpchQ11Sql
    ) { (s, dir) =>
      Seq("supplier", "lineitem", "nation")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ11Sql)
    },

    // TPC-H Q12: conditional-count split by priority class over a
    // date-arithmetic join filter.
    q("q49r_sql_tpch_q12", "TPC-H Q12 shipmode priority counts via spark.sql")(
      ExtrasQueries.tpchQ12Sql
    ) { (s, dir) =>
      Seq("orders", "lineitem").foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ12Sql)
    },

    // TPC-H Q15: one CTE consumed twice (join + scalar max) — the
    // canonical view-reuse shape.
    q("q49s_sql_tpch_q15", "TPC-H Q15 top supplier via spark.sql — CTE reused under max()")(
      ExtrasQueries.tpchQ15Sql
    ) { (s, dir) =>
      Seq("supplier", "lineitem").foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ15Sql)
    },

    // TPC-H Q16: distinct-count with a NOT IN anti-join exclusion.
    q("q49t_sql_tpch_q16", "TPC-H Q16 supplier counts via spark.sql — NOT IN exclusion")(
      ExtrasQueries.tpchQ16Sql
    ) { (s, dir) =>
      Seq("part", "supplier", "lineitem").foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ16Sql)
    },

    // TPC-H Q20: nested IN-subqueries with a correlated scalar inside —
    // three levels of decorrelation ending in semi-joins.
    q("q49u_sql_tpch_q20", "TPC-H Q20 part promotion via spark.sql — nested correlated subqueries")(
      ExtrasQueries.tpchQ20Sql
    ) { (s, dir) =>
      Seq("part", "supplier", "lineitem", "nation")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ20Sql)
    },

    // TPC-H Q21: EXISTS + NOT EXISTS self-correlations on the fact table —
    // a semi-join AND an anti-join against the same relation.
    q("q49v_sql_tpch_q21", "TPC-H Q21 waiting suppliers via spark.sql — EXISTS/NOT EXISTS pair")(
      ExtrasQueries.tpchQ21Sql
    ) { (s, dir) =>
      Seq("supplier", "lineitem", "orders", "nation")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ21Sql)
    },

    // LATERAL correlated subquery — the SQL-surface sibling of q13's window
    // top-k: top-2 orders per customer, expressed as a per-outer-row
    // correlated table. Exercises Spark's lateral-join decorrelation.
    q("q77_lateral_topk", "LATERAL correlated top-2 orders per customer via spark.sql")(
      ExtrasQueries.lateralSql
    ) { (s, dir) =>
      Seq("customer", "orders").foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.lateralSql)
    },

    // Deterministic mode + exact median per group. The mode is pinned by a
    // window (count desc, value asc) because the built-in mode() resolves
    // ties engine-arbitrarily; the median is the interpolated exact one.
    q("q78_mode_median", "deterministic per-group mode (windowed) + exact median")(
      ExtrasQueries.modeMedianSql
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(ExtrasQueries.modeMedianSql)
    },

    // Equi-width histogram via width_bucket — numeric distribution
    // profiling next to q66's min/max/null profile; one partial-aggregated
    // groupBy, bucket id computed row-local.
    q("q79_histogram", "equi-width 11-bucket histogram of l_extendedprice per returnflag")(
      ExtrasQueries.histogramSql
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(ExtrasQueries.histogramSql)
    },

    // Join-strategy hints through the SQL surface — the physical-plan
    // escape hatch users reach for when statistics mislead the planner.
    q("q103_join_hint", "BROADCAST hint via spark.sql (a comment to the oracle)")(
      ExtrasQueries.hintSql
    ) { (s, dir) =>
      Seq("orders", "customer", "nation").foreach(t =>
        Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.hintSql)
    },

    // The full join-strategy matrix — q103 demonstrates the BROADCAST
    // hint; this runs the SAME orders⋈customer join under all three
    // strategy hints (BROADCAST / SHUFFLE_HASH / MERGE) and publishes one
    // identical aggregate row per arm — the equality of the three rows IS
    // the demonstration (physical strategy must never change results),
    // and PlanShapeSpec pins that the planner actually honored each hint
    // (BroadcastHashJoin + ShuffledHashJoin + SortMergeJoin all present;
    // at this fixture size the unhinted pick would be broadcast for every
    // arm). The 100 TB reading: broadcast = no shuffle but O(|dim|)
    // memory per executor; shuffled hash = one shuffle each side, build
    // the smaller; sort-merge = the spill-safe default for fact-fact —
    // the hint surface is how users arbitrate when stats can't.
    q("q314_join_strategy_matrix",
      "one join, three hinted physical strategies: identical aggregates per arm")(
      Seq("a_broadcast", "b_shuffle_hash", "c_merge").map { lbl =>
        s"""SELECT '$lbl' AS strategy, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev_dollars,
           |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
           |FROM orders JOIN customer ON c_custkey = o_custkey""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY strategy")
    ) { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      Seq("a_broadcast" -> "broadcast", "b_shuffle_hash" -> "shuffle_hash",
        "c_merge" -> "merge").map { case (lbl, h) =>
        o.join(c.hint(h), o("o_custkey") === c("c_custkey"))
          .agg(count(lit(1)).as("n"),
            sum(expr("cast(floor(o_totalprice) as bigint)")).as("rev_dollars"),
            countDistinct(col("c_mktsegment")).as("n_segments"))
          .select(lit(lbl).as("strategy"), col("n"), col("rev_dollars"), col("n_segments"))
      }.reduce(_ unionByName _).orderBy("strategy")
    },

    // Parameterized SQL — named parameter markers bound at execution,
    // Spark's injection-safe query API (the oracle states the same query
    // with the literal inlined).
    q("q105_parameterized_sql", "named-parameter spark.sql (:maxq bound at execution)")(
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem WHERE l_quantity < 24
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem WHERE l_quantity < :maxq " +
          "GROUP BY l_returnflag ORDER BY l_returnflag",
        Map("maxq" -> 24))
    },

    // VARIANT — Spark 4's semi-structured type: parse the JSON props column
    // once into a variant, extract typed paths with variant_get (no
    // per-field re-parse), aggregate. The open-schema ingestion path for
    // event payloads; the oracle extracts the same path via JSON.
    q("q106_variant", "parse_json → VARIANT → typed variant_get extraction + aggregate")(
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
        |       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events")
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .select(col("event_type"), expr("variant_get(v, '$.k', 'long')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy("event_type")
    },

    // Recursive CTE — iterative transitive closure through the SQL parser
    // (Spark 4 UnionLoop): each key walks its halving-ancestor chain to the
    // root. The SQL-surface twin of the DataFrame-loop iteration q80/q34g
    // do programmatically.
    q("q101_recursive_cte", "WITH RECURSIVE ancestor-chain closure via spark.sql")(
      ExtrasQueries.recursiveCteSql
    ) { (s, dir) =>
      Tables(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(ExtrasQueries.recursiveCteSql)
    },

    // Market-basket association rules — support/confidence/lift over
    // (order, brand) baskets: distinct items per basket, pair supports via
    // a self equi-join ON THE BASKET KEY (pairs per basket are C(k,2) with
    // k ≙ basket size — bounded fan-out, never a global product), rules
    // from exact integer supports with the float ratios in one fixed
    // expression order. The classic co-occurrence miner (apriori's first
    // pass) for recommendations/affinity.
    q("q99_assoc_rules", "brand-pair association rules: support, confidence, lift (s12 ≥ 50)")(
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
        |               FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM items),
        |sup AS (SELECT b, CAST(count(*) AS BIGINT) AS s FROM items GROUP BY b),
        |pairs AS (SELECT a.b AS b1, c.b AS b2, CAST(count(*) AS BIGINT) AS s12
        |          FROM items a JOIN items c ON a.o = c.o AND a.b < c.b
        |          GROUP BY a.b, c.b),
        |r AS (SELECT b1, b2, s12,
        |             round(CAST(s12 AS DOUBLE) / sa.s, 4) AS conf,
        |             round((CAST(s12 AS DOUBLE) / n.n_orders)
        |                   / ((CAST(sa.s AS DOUBLE) / n.n_orders) * (CAST(sb.s AS DOUBLE) / n.n_orders)), 4) AS lift
        |      FROM pairs JOIN sup sa ON b1 = sa.b JOIN sup sb ON b2 = sb.b CROSS JOIN n
        |      WHERE s12 >= 50)
        |SELECT b1, b2, s12, conf, lift FROM r ORDER BY lift DESC, b1, b2 LIMIT 50""".stripMargin
    ) { (s, dir) =>
      val items = Tables.fanout(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
        .distinct()
        .cache() // basket count, supports, and both pair sides
      val nOrders = items.agg(countDistinct(col("o")).as("n_orders"))
      val sup = items.groupBy("b").agg(count(lit(1)).as("s"))
      val pairs = items.as("a")
        .join(items.as("c"), col("a.o") === col("c.o") && col("a.b") < col("c.b"))
        .groupBy(col("a.b").as("b1"), col("c.b").as("b2"))
        .agg(count(lit(1)).as("s12"))
        .filter(col("s12") >= 50)
      pairs
        .join(broadcast(sup.select(col("b").as("b1"), col("s").as("s1"))), "b1")
        .join(broadcast(sup.select(col("b").as("b2"), col("s").as("s2"))), "b2")
        .crossJoin(broadcast(nOrders))
        .select(col("b1"), col("b2"), col("s12"),
          round(col("s12").cast("double") / col("s1"), 4).as("conf"),
          round((col("s12").cast("double") / col("n_orders"))
            / ((col("s1").cast("double") / col("n_orders"))
              * (col("s2").cast("double") / col("n_orders"))), 4).as("lift"))
        .orderBy(col("lift").desc, col("b1"), col("b2")).limit(50)
    },

    // Pairwise Pearson correlation from DECIMAL-EXACT moments — corr() the
    // portable way: every moment (Σx, Σx², Σxy, …) accumulates as an exact
    // DECIMAL of 4-dp-rounded terms (order-free), and the correlation
    // formula runs once per pair in a fixed float expression order. The
    // built-in corr() aggregates doubles in partition order — unverifiable
    // cross-engine; this shape is how a pipeline computes a whole feature-
    // correlation matrix in ONE pass over the data.
    q("q100_correlation", "Pearson correlations of (qty, price, discount) from exact moments")(
      """WITH m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(round(l_discount, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sz,
        |         CAST(sum(CAST(round(l_quantity * l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(round(l_extendedprice * l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE) AS syy,
        |         CAST(sum(CAST(round(l_discount * l_discount, 4) AS DECIMAL(28,4))) AS DOUBLE) AS szz,
        |         CAST(sum(CAST(round(l_quantity * l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(round(l_quantity * l_discount, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sxz,
        |         CAST(sum(CAST(round(l_extendedprice * l_discount, 4) AS DECIMAL(28,4))) AS DOUBLE) AS syz
        |  FROM lineitem)
        |SELECT 'qty_price' AS pair, round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS r FROM m
        |UNION ALL
        |SELECT 'qty_disc', round((n * sxz - sx * sz) / (sqrt(n * sxx - sx * sx) * sqrt(n * szz - sz * sz)), 6) FROM m
        |UNION ALL
        |SELECT 'price_disc', round((n * syz - sy * sz) / (sqrt(n * syy - sy * sy) * sqrt(n * szz - sz * sz)), 6) FROM m
        |ORDER BY pair""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      def dsum(c: org.apache.spark.sql.Column) =
        sum(round(c, 4).cast(DecimalType(28, 4))).cast("double")
      // 10 decimal partial aggregates over every row — fan past the
      // single-row-group fixture scan so they run on all cores
      val li = Tables.fanout(s, dir, "lineitem")
      val m = li.agg(count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sx"), dsum(col("l_extendedprice")).as("sy"),
        dsum(col("l_discount")).as("sz"),
        dsum(col("l_quantity") * col("l_quantity")).as("sxx"),
        dsum(col("l_extendedprice") * col("l_extendedprice")).as("syy"),
        dsum(col("l_discount") * col("l_discount")).as("szz"),
        dsum(col("l_quantity") * col("l_extendedprice")).as("sxy"),
        dsum(col("l_quantity") * col("l_discount")).as("sxz"),
        dsum(col("l_extendedprice") * col("l_discount")).as("syz"))
        .cache() // three output legs
      def leg(name: String, sab: String, sa: String, sb: String, saa: String, sbb: String) =
        m.select(lit(name).as("pair"),
          round((col("n") * col(sab) - col(sa) * col(sb))
            / (sqrt(col("n") * col(saa) - col(sa) * col(sa))
              * sqrt(col("n") * col(sbb) - col(sb) * col(sb))), 6).as("r"))
      leg("qty_price", "sxy", "sx", "sy", "sxx", "syy")
        .union(leg("qty_disc", "sxz", "sx", "sz", "sxx", "szz"))
        .union(leg("price_disc", "syz", "sy", "sz", "syy", "szz"))
        .orderBy("pair")
    },

    // Per-group model fit through the TYPED API — KeyValueGroupedDataset
    // .mapGroups running arbitrary Scala per group (the batch sibling of
    // B32's stateful op; what a pipeline uses when per-group logic stops
    // being SQL-expressible). Here: closed-form OLS of n_chars on token
    // count per lang. Every sum (Σx, Σy, Σx², Σxy) is an integer-valued
    // double < 2^53, so accumulation is EXACT and order-free — the Scala
    // fold and the oracle's SQL sums agree bit-for-bit, no ordering
    // contract needed. At scale mapGroups shuffles once on the group key;
    // groups stream through the iterator (no per-group materialization
    // beyond the fold state).
    q("q68_group_ols", "per-lang OLS fit (n_chars ~ tokens) via typed mapGroups")(
      """WITH b AS (SELECT lang,
        |                  CAST(len(str_split(text, ' ')) AS DOUBLE) AS x,
        |                  CAST(n_chars AS DOUBLE) AS y
        |           FROM documents),
        |a AS (SELECT lang, count(*) AS n,
        |             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |             CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(x * y) AS DOUBLE) AS sxy
        |      FROM b GROUP BY lang),
        |f AS (SELECT lang, n,
        |             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        |             sx, sy FROM a)
        |SELECT lang, round(slope, 4) AS slope,
        |       round((sy - slope * sx) / n, 4) AS intercept, n
        |FROM f ORDER BY lang""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("lang"),
          size(split(col("text"), " ")).cast("double").as("x"),
          col("n_chars").cast("double").as("y"))
        .as[(String, Double, Double)]
        .groupByKey(_._1)
        .mapGroups { (lang, rows) =>
          var n = 0L; var sx = 0.0; var sy = 0.0; var sxx = 0.0; var sxy = 0.0
          rows.foreach { case (_, x, y) =>
            n += 1; sx += x; sy += y; sxx += x * x; sxy += x * y
          }
          val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
          (lang, slope, (sy - slope * sx) / n, n)
        }
        .toDF("lang", "slope_raw", "intercept_raw", "n")
        .select(col("lang"), round(col("slope_raw"), 4).as("slope"),
          round(col("intercept_raw"), 4).as("intercept"), col("n"))
        .orderBy("lang")
    },

    // Funnel / sequence analytics — ordered-event pattern matching (the
    // match_recognize class): per user, the first 'view', the first 'click'
    // strictly after it, the first 'purchase' strictly after that; stage =
    // how deep the user got. Three keyed min-aggregations chained by
    // time-bounded joins — each stage shrinks the key set, all joins are
    // on user_id (co-partitioned after the first shuffle; no window over
    // the full event log needed).
    q("q64_funnel", "view→click→purchase funnel stage per user (strict event order)")(
      """WITH e AS (SELECT user_id, event_type, ts::TIMESTAMP AS t FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |v AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.t) AS t2 FROM e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.t > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.t) AS t3 FROM e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.t > c.t2 GROUP BY e.user_id)
        |SELECT u.user_id,
        |       CAST(CASE WHEN p.t3 IS NOT NULL THEN 3
        |                 WHEN c.t2 IS NOT NULL THEN 2
        |                 WHEN v.t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage,
        |       v.t1, c.t2, p.t3
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |       LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts").as("t")).cache()
      val u = e.select("user_id").distinct()
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("t")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("t") > col("t1"))
        .groupBy("user_id").agg(min(col("t")).as("t2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("t") > col("t2"))
        .groupBy("user_id").agg(min(col("t")).as("t3"))
      u.join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("t3").isNotNull, 3L).when(col("t2").isNotNull, 2L)
            .when(col("t1").isNotNull, 1L).otherwise(0L).as("stage"),
          col("t1"), col("t2"), col("t3"))
        .orderBy("user_id")
    },

    // Cohort retention — the other half of event analytics next to q64:
    // users cohort by the hour of their FIRST event; retention at offset k
    // = distinct cohort users active k hours later (k ≤ 3). Hour buckets
    // are integer epoch arithmetic (no timestamp float), the first-touch
    // frame is one keyed min, and the activity join is on user_id — the
    // same co-partitioned shape as q64.
    q("q65_cohort_retention", "hourly signup cohorts × activity offset (k ≤ 3 h)")(
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT) // 3600 AS hb
        |           FROM events),
        |f AS (SELECT user_id, min(hb) AS fhb FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, f.fhb, e.hb - f.fhb AS k
        |      FROM e JOIN f USING (user_id) WHERE e.hb - f.fhb <= 3)
        |SELECT make_timestamp(fhb * 3600 * 1000000) AS cohort, k, count(*) AS n_active
        |FROM a GROUP BY fhb, k ORDER BY cohort, k""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "events")
        .selectExpr("user_id", "cast(ts as bigint) div 3600 AS hb").cache()
      val f = e.groupBy("user_id").agg(min(col("hb")).as("fhb"))
      e.join(f, "user_id")
        .filter(col("hb") - col("fhb") <= 3)
        .select(col("user_id"), col("fhb"), (col("hb") - col("fhb")).as("k"))
        .distinct()
        .groupBy("fhb", "k").agg(count(lit(1)).as("n_active"))
        .select(timestamp_micros(col("fhb") * 3600L * 1000000L).as("cohort"),
          col("k"), col("n_active"))
        .orderBy("cohort", "k")
    },

    // TPC-H Q17 shape: a correlated scalar AGGREGATE subquery inside a
    // comparison — decorrelates to a per-part average joined back to the
    // fact rows.
    q("q49k_sql_tpch_q17", "TPC-H Q17 shape via spark.sql — below-avg-quantity revenue")(
      ExtrasQueries.tpchQ17Sql
    ) { (s, dir) =>
      Seq("lineitem", "part").foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ17Sql)
    },

    // TPC-H Q22 shape: an uncorrelated scalar subquery threshold + a
    // correlated NOT EXISTS (anti-join decorrelation) + re-aggregation.
    q("q49l_sql_tpch_q22", "TPC-H Q22 shape via spark.sql — wealthy inactive customers")(
      ExtrasQueries.tpchQ22Sql
    ) { (s, dir) =>
      Seq("customer", "orders").foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(ExtrasQueries.tpchQ22Sql)
    },

    // UNPIVOT — the inverse of q46's pivot: wide per-group measures back to
    // (group, measure, value) long form via the typed melt API. Row-local
    // fan-out (one row → |measures| rows), no shuffle beyond the aggregate.
    q("q46b_unpivot", "melt wide per-returnflag measures to long (measure, val) rows")(
      """WITH w AS (SELECT l_returnflag,
        |            round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS qty,
        |            round(CAST(sum(CAST(round(l_discount, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS disc
        |           FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, m AS measure, val FROM (
        |  SELECT l_returnflag, 'qty' AS m, qty AS val FROM w
        |  UNION ALL SELECT l_returnflag, 'disc', disc FROM w)
        |ORDER BY l_returnflag, measure""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(sum(round(col("l_quantity"), 4).cast(DecimalType(28, 4))).cast("double"), 4).as("qty"),
          round(sum(round(col("l_discount"), 4).cast(DecimalType(28, 4))).cast("double"), 4).as("disc"))
        .unpivot(Array(col("l_returnflag")), Array(col("qty"), col("disc")), "measure", "val")
        .orderBy("l_returnflag", "measure")
    },

    // Null semantics — the three places NULL diverges from a value: the
    // null-safe equality join (<=> ≙ IS NOT DISTINCT FROM — nulls DO
    // match), count(*) vs count(col) (null rows counted vs skipped), and
    // NULLS FIRST ordering of the null group.
    q("q95_null_semantics", "null-safe join + null grouping + count(*)/count(col) contrast")(
      """WITH a AS (SELECT c_custkey AS k,
        |            CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nk
        |           FROM customer),
        |b AS (SELECT s_suppkey AS k2,
        |            CASE WHEN s_suppkey % 5 = 0 THEN NULL ELSE s_nationkey END AS nk2
        |      FROM supplier)
        |SELECT a.nk AS nk, count(*) AS n_pairs, count(a.nk) AS n_nonnull
        |FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk2
        |GROUP BY a.nk ORDER BY nk NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      val a = Tables(s, dir, "customer")
        .select(when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_nationkey")).as("nk"))
      val b = Tables(s, dir, "supplier")
        .select(when(col("s_suppkey") % 5 === 0, lit(null)).otherwise(col("s_nationkey")).as("nk2"))
      a.join(b, col("nk") <=> col("nk2"))
        .groupBy("nk")
        .agg(count(lit(1)).as("n_pairs"), count(col("nk")).as("n_nonnull"))
        .orderBy(col("nk").asc_nulls_first)
    },

    // MATCH_RECOGNIZE-lite sequence pattern matching — the general form of
    // q64's fixed funnel: each user's event history becomes an ordered
    // symbol string (one char per event type, pinned by (ts, event_id)),
    // and the pattern is a real regex WITH QUANTIFIERS — here `v+c+p`
    // (≥1 views, then ≥1 clicks, then a purchase; non-overlapping match
    // count ≙ MATCH_RECOGNIZE ONE ROW PER MATCH ... AFTER MATCH SKIP PAST
    // LAST ROW). At 100 TB: one shuffle on the match-partition key; each
    // key's sequence is bounded by per-user history (sessionize first via
    // q28's session windows when histories are unbounded) — the same
    // contract every MATCH_RECOGNIZE engine imposes.
    q("q71_seq_pattern", "regex pattern (v+c+p) over per-user ordered event-type sequences")(
      """WITH seqs AS (
        |  SELECT user_id,
        |         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'e' END,
        |                    '' ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
        |       CAST(len(regexp_extract_all(seq, 'v+c+p')) AS BIGINT) AS n_funnels
        |FROM seqs WHERE len(regexp_extract_all(seq, 'v+c+p')) > 0
        |ORDER BY n_funnels DESC, user_id LIMIT 50""".stripMargin
    ) { (s, dir) =>
      val seqs = Tables(s, dir, "events")
        .withColumn("chr",
          when(col("event_type") === "view", "v")
            .when(col("event_type") === "click", "c")
            .when(col("event_type") === "purchase", "p")
            .when(col("event_type") === "signup", "s")
            .otherwise("e"))
        .groupBy("user_id")
        // struct sort is lexicographic over (ts, event_id, chr) — the same
        // (ts, event_id) order the oracle's string_agg ORDER BY pins
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("chr")))),
            x => x.getField("chr")), "").as("seq"))
      seqs.select(col("user_id"),
          length(col("seq")).cast("long").as("seq_len"),
          regexp_count(col("seq"), lit("v+c+p")).cast("long").as("n_funnels"))
        .filter(col("n_funnels") > 0)
        .orderBy(col("n_funnels").desc, col("user_id"))
        .limit(50)
    },

    // The NATIVE custom physical operator (SURVEY §4.2 preference (c)):
    // top-3 orders per customer through graft.plans.TopKPerKey — a logical
    // node + planner Strategy + heap-based SparkPlan pair (partial map-side
    // heap → exchange bounded at k rows/key/task → final heap), replacing
    // the window formulation's full per-partition sort and full-width
    // shuffle. The oracle IS the window formulation, so the hash match
    // proves operator-for-operator equivalence; TopKPerKeySpec pins the
    // plan (two TopKPerKeyExec nodes, no Window, no Sort before exchange).
    q("q148_native_topk", "top-3 orders per customer via the native heap TopKPerKey operator")(
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS price
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, price DESC, o_orderkey""".stripMargin
    ) { (s, dir) =>
      graft.plans.TopKPerKey.topK(
        Tables(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        keys = Seq(col("o_custkey")),
        order = Seq(col("o_totalprice").desc, col("o_orderkey")),
        k = 3)
        .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 4).as("price"))
        .orderBy(col("o_custkey"), col("price").desc, col("o_orderkey"))
    },

    // Collation-aware join — Spark 4's string collations as a JOIN KEY
    // (UTF8_LCASE), not a lower() rewrite: the engine hashes and
    // compares under the collation, which is the first-class path for
    // case-insensitive entity matching (ICU-backed, and at 100 TB the
    // collated hash join shuffles exactly like a binary one). The probe
    // side is the customer names case-MANGLED by hash (upper or lower
    // per row), with a 10% negative control ('#X' suffix) that must NOT
    // match — so the measured match rate is ~900 permille by
    // construction, and the oracle (lower()-normalized equality, the
    // pre-collation idiom) must agree exactly.
    q("q291_collation_join",
      "UTF8_LCASE collated join key: case-mangled probes match, controls don't")({
      import graft.functions.PortableHash.md5LongSql
      s"""WITH p AS (SELECT c_custkey,
         |                  CASE WHEN ${md5LongSql("'cm:' || CAST(c_custkey AS VARCHAR)")} % 10 = 0
         |                       THEN c_name || '#X'
         |                       WHEN ${md5LongSql("'cu:' || CAST(c_custkey AS VARCHAR)")} % 2 = 0
         |                       THEN upper(c_name) ELSE lower(c_name) END AS p_name
         |           FROM customer),
         |j AS (SELECT p.c_custkey, CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END AS hit
         |      FROM p LEFT JOIN customer c ON lower(c.c_name) = lower(p.p_name)),
         |cn AS (SELECT c_custkey, c_nationkey FROM customer)
         |SELECT cn.c_nationkey, CAST(count(*) AS BIGINT) AS n_probes,
         |       CAST(sum(j.hit) AS BIGINT) AS n_matched,
         |       CAST((1000 * sum(j.hit)) // count(*) AS BIGINT) AS match_permille
         |FROM j JOIN cn ON cn.c_custkey = j.c_custkey
         |GROUP BY cn.c_nationkey ORDER BY cn.c_nationkey""".stripMargin
    }) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val cust = Tables(s, dir, "customer")
      val p = cust.select(col("c_custkey"),
        when(md5Long(concat(lit("cm:"), col("c_custkey").cast("string"))) % 10 === 0,
          concat(col("c_name"), lit("#X")))
          .when(md5Long(concat(lit("cu:"), col("c_custkey").cast("string"))) % 2 === 0,
            upper(col("c_name")))
          .otherwise(lower(col("c_name"))).as("p_name"))
      // the join key is the COLLATED string — no lower() on the Spark side
      val j = p.join(
        cust.select(col("c_custkey").as("m_custkey"), col("c_name")),
        expr("collate(c_name, 'UTF8_LCASE') = collate(p_name, 'UTF8_LCASE')"), "left")
        .select(col("c_custkey"),
          when(col("m_custkey").isNull, 0L).otherwise(1L).as("hit"))
      j.join(cust.select(col("c_custkey"), col("c_nationkey")), Seq("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_probes"), sum(col("hit")).as("n_matched"))
        .select(col("c_nationkey"), col("n_probes"), col("n_matched"),
          expr("cast((1000 * n_matched) div n_probes as bigint)").as("match_permille"))
        .orderBy("c_nationkey")
    },

    // Image augmentation through the REAL codec — horizontal flip +
    // center crop on decoded pixels with the q163 doubled round-trip
    // (see Multimodal.bmpAugmentQuery). px0/pxlast pin the flip and
    // crop index arithmetic against the synthesis text; the mean checks
    // the flip-symmetric column set; n_bytes = 54 + 24·h pins the
    // re-encoded 8-wide geometry (24-byte stride, no padding).
    q("q303_image_augment",
      "flip + center-crop augmentation via real BMP decode/encode round trips")(
      """WITH m AS (SELECT doc_id AS media_id, length(text) AS n, text,
        |                  (length(text) + 15) // 16 AS h
        |           FROM documents WHERE length(text) >= 1),
        |px AS (SELECT media_id, n, h, text,
        |              unnest(generate_series(0, h * 8 - 1)) AS j FROM m),
        |v AS (SELECT media_id, n, h, text,
        |             (j // 8) * 16 + (j % 8) + 4 AS i FROM px),
        |agg AS (SELECT media_id,
        |               CAST(sum(CASE WHEN i < n THEN ord(substr(text, CAST(i + 1 AS INT), 1))
        |                        ELSE 0 END) AS BIGINT) AS s
        |        FROM v GROUP BY media_id)
        |SELECT m.media_id, CAST(54 + 24 * m.h AS BIGINT) AS n_bytes,
        |       CAST(8 AS BIGINT) AS width, CAST(m.h AS BIGINT) AS height,
        |       CAST(CASE WHEN 11 < m.n THEN ord(substr(m.text, 12, 1)) ELSE 0 END AS BIGINT) AS px0,
        |       CAST(CASE WHEN (m.h - 1) * 16 + 4 < m.n
        |            THEN ord(substr(m.text, CAST((m.h - 1) * 16 + 5 AS INT), 1))
        |            ELSE 0 END AS BIGINT) AS pxlast,
        |       round(CAST(agg.s AS DOUBLE) / (8 * m.h), 4) + 0 AS mean_gray
        |FROM m JOIN agg ON agg.media_id = m.media_id
        |ORDER BY m.media_id""".stripMargin
    ) { (s, dir) => graft.multimodal.Multimodal.bmpAugmentQuery(s, dir) },

    // SQL-defined scalar UDF (Spark 4 `CREATE FUNCTION ... RETURN expr`,
    // public API) — the B38 surface extended to DECLARATIVE functions:
    // unlike a Scala/Python UDF the body is pure SQL, so the analyzer
    // INLINES it into the plan and codegen/pushdown see straight through
    // (no black box at any scale — the reason SQL UDFs are the right
    // default for shared business logic). The function wraps the repo's
    // canonical exact-decimal quantity term; the oracle inlines the same
    // expression, so the hash match proves the registered function IS
    // the expression. Session-scoped TEMPORARY; re-registration guarded
    // with OR REPLACE for rerun safety.
    q("q304_sql_udf",
      "CREATE FUNCTION quantity term inlined by the analyzer, summed per returnflag")(
      """SELECT l_returnflag, count(*) AS n,
        |       round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_qty4(q DOUBLE) " +
        "RETURNS DECIMAL(28,4) RETURN CAST(round(q, 4) AS DECIMAL(28,4))")
      Tables(s, dir, "lineitem").createOrReplaceTempView("li_q304")
      s.sql(
        """SELECT l_returnflag, count(*) AS n,
          |       round(CAST(sum(graft_qty4(l_quantity)) AS DOUBLE), 4) AS qty
          |FROM li_q304 GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // SQL pipe syntax (Spark 4 `|>` operators, public API) — the linear
    // query form: each stage consumes the previous result top-to-bottom,
    // which is how the DataFrame API already reads and how analysts
    // increasingly write SQL. The pipeline filters, EXTENDs the exact
    // decimal term, AGGREGATEs per group, and orders — and must produce
    // byte-identical results to the nested classic-SQL oracle, proving
    // the pipe stages lower onto the same plan.
    q("q305_pipe_syntax",
      "|> WHERE / EXTEND / AGGREGATE / ORDER BY pipeline over lineitem")(
      """SELECT l_returnflag, count(*) AS n,
        |       round(CAST(sum(CAST(round(l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS qty,
        |       round(CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE), 4) AS base
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").createOrReplaceTempView("li_q305")
      s.sql(
        """FROM li_q305
          ||> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          ||> EXTEND CAST(round(l_quantity, 4) AS DECIMAL(28,4)) AS qd,
          |          CAST(round(l_extendedprice, 4) AS DECIMAL(28,4)) AS pd
          ||> AGGREGATE count(*) AS n,
          |             round(CAST(sum(qd) AS DOUBLE), 4) AS qty,
          |             round(CAST(sum(pd) AS DOUBLE), 4) AS base
          |   GROUP BY l_returnflag
          ||> SELECT l_returnflag, n, qty, base
          ||> ORDER BY l_returnflag""".stripMargin)
    },

    // SQL scripting (Spark 4's BEGIN…END compound statements) — the third
    // Spark-4 SQL surface next to SQL UDFs (q304) and pipes (q305):
    // DECLARE session variables, a WHILE loop doubling a quantity cap
    // until it covers ≥90% of lineitem, then the per-flag report under
    // the found cap. The oracle is the DECLARATIVE twin — it derives the
    // same cap from a powers-of-two grid in one pass — and the hash match
    // proves procedure ≡ set logic. That is also the honest 100 TB note:
    // each WHILE probe is a full scan (7 probes here), so at scale the
    // cap belongs in one histogram pass (exactly what the oracle does);
    // the script surface is for orchestration, not for replacing
    // aggregation. Total row count is hoisted into a DECLARE so the loop
    // condition scans once, not twice, per probe.
    q("q316_sql_scripting",
      "BEGIN/DECLARE/WHILE script doubles a cap to 90% coverage; oracle derives it declaratively")(
      """WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM lineitem),
        |pw AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128]) AS cap),
        |cov AS (SELECT pw.cap, CAST(count(*) AS BIGINT) AS n
        |        FROM pw JOIN lineitem ON l_quantity < pw.cap GROUP BY pw.cap),
        |sel AS (SELECT CAST(min(cap) AS BIGINT) AS cap FROM cov, tot WHERE 10 * n >= 9 * t)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, sel.cap
        |FROM lineitem, sel WHERE l_quantity < sel.cap
        |GROUP BY l_returnflag, sel.cap ORDER BY l_returnflag""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "lineitem").createOrReplaceTempView("li_q316")
      s.conf.set("spark.sql.scripting.enabled", "true")
      try s.sql(
        """BEGIN
          |  DECLARE cap INT DEFAULT 1;
          |  DECLARE t BIGINT DEFAULT 0;
          |  SET t = (SELECT count(*) FROM li_q316);
          |  WHILE (SELECT 10 * count(*) FROM li_q316 WHERE l_quantity < cap) < 9 * t DO
          |    SET cap = cap * 2;
          |  END WHILE;
          |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, CAST(cap AS BIGINT) AS cap
          |  FROM li_q316 WHERE l_quantity < cap
          |  GROUP BY l_returnflag, cap ORDER BY l_returnflag;
          |END""".stripMargin)
      finally s.conf.set("spark.sql.scripting.enabled", "false")
    },

    // Sobel edge census through the REAL BMP codec — the convolution
    // member of the image family (q70 decode, q121 aHash, q163 resize,
    // q303 augment): 3×3 Sobel pair over every interior pixel, L1
    // magnitude |gx|+|gy| (no sqrt — integer-exact), per-image edge
    // count/total/max at threshold 300 (~12% of interior pixels on this
    // corpus, and every image clears it at least once). The oracle
    // replays the synthesis arithmetic over the char codes with the same
    // zero-padded tail; the Spark side must round-trip the actual
    // container (row flip included) to agree. Row-local at any scale.
    q("q328_sobel_edges",
      "Sobel |gx|+|gy| edge census per image via real BMP decode, integer-exact")({
      def P(i: String) = s"COALESCE(codes[($i)+1], 0)"
      val y = "(1 + j // 14)"; val x = "(1 + j % 14)"
      def pix(dy: Int, dx: Int) = P(s"($y+($dy))*16 + $x+($dx)")
      val gx = s"((${pix(-1, 1)} + 2*${pix(0, 1)} + ${pix(1, 1)})" +
        s" - (${pix(-1, -1)} + 2*${pix(0, -1)} + ${pix(1, -1)}))"
      val gy = s"((${pix(1, -1)} + 2*${pix(1, 0)} + ${pix(1, 1)})" +
        s" - (${pix(-1, -1)} + 2*${pix(-1, 0)} + ${pix(-1, 1)}))"
      s"""WITH m AS (SELECT doc_id AS media_id,
         |        list_transform(regexp_split_to_array(text, ''), c -> unicode(c)) AS codes,
         |        (length(text) + 15) // 16 AS h
         |        FROM documents),
         |e AS (SELECT media_id, h,
         |        list_transform(generate_series(0, (h - 2) * 14 - 1),
         |                       j -> CAST(abs($gx) + abs($gy) AS BIGINT)) AS mags
         |      FROM m)
         |SELECT media_id, CAST(h AS BIGINT) AS height,
         |       CAST(len(mags) AS BIGINT) AS n_interior,
         |       CAST(COALESCE(list_sum(mags), 0) AS BIGINT) AS total_mag,
         |       CAST(COALESCE(list_max(mags), 0) AS BIGINT) AS max_mag,
         |       CAST(len(list_filter(mags, v -> v > 300)) AS BIGINT) AS edge_count,
         |       CAST(CASE WHEN len(mags) > 0
         |            THEN len(list_filter(mags, v -> v > 300)) * 1000 // len(mags)
         |            ELSE 0 END AS BIGINT) AS edge_permille
         |FROM e ORDER BY media_id""".stripMargin
    }) { (s, dir) => graft.multimodal.Multimodal.sobelQuery(s, dir) },

    // Fixed-bin integer DFT through the REAL WAV codec — the narrowband
    // spectral member of the audio family (q69 decode, q136 ZCR/energy,
    // q310 VAD): per 40-sample frame the projections X_k=Σs·cos_k,
    // Y_k=Σs·sin_k on a SHARED integer cosine table (scale 1024,
    // half-up, computed once in Multimodal.dftTabSql and injected into
    // this SQL — both engines consume identical literals, so the whole
    // spectrum is exact). Bins 200/400/1000/2000 Hz; per-clip energy
    // Σ_f(X²+Y²)≫2²⁰ bounded under 2⁶³ by construction. The tone/hum
    // detector shape an audio curation pipeline runs per clip.
    q("q329_spectral_bins",
      "4-bin integer DFT energies per clip via real WAV decode and a shared cos table")({
      import graft.multimodal.Multimodal.dftTabSql
      def ek(k: Int) =
        s"CAST(list_sum(list_transform(generate_series(1, CAST(nf AS INT)), f -> " +
          s"CAST(list_sum(list_transform(generate_series(1, 40), t -> smp[(f-1)*40+t] * (${dftTabSql(k, cos = true)})[t])) AS BIGINT)" +
          s" * list_sum(list_transform(generate_series(1, 40), t -> smp[(f-1)*40+t] * (${dftTabSql(k, cos = true)})[t]))" +
          s" + CAST(list_sum(list_transform(generate_series(1, 40), t -> smp[(f-1)*40+t] * (${dftTabSql(k, cos = false)})[t])) AS BIGINT)" +
          s" * list_sum(list_transform(generate_series(1, 40), t -> smp[(f-1)*40+t] * (${dftTabSql(k, cos = false)})[t])))) // 1048576 AS BIGINT)"
      s"""WITH m AS (SELECT doc_id AS media_id, length(text) AS n,
         |        list_transform(regexp_split_to_array(text, ''),
         |                       c -> CAST((unicode(c) - 96) * 256 AS BIGINT)) AS smp,
         |        length(text) // 40 AS nf
         |        FROM documents)
         |SELECT media_id, CAST(n AS BIGINT) AS n_samples, CAST(nf AS BIGINT) AS n_frames,
         |       ${ek(1)} AS e200, ${ek(2)} AS e400, ${ek(5)} AS e1000, ${ek(10)} AS e2000
         |FROM m ORDER BY media_id""".stripMargin
    }) { (s, dir) => graft.multimodal.Multimodal.spectralQuery(s, dir) },

    // Jaro–Winkler fuzzy matching through a NEW native codegen expression
    // (the third custom Expression after CosineSimilarity/HilbertIndex,
    // B38 surface): Spark has no jaro function, DuckDB has a native one —
    // so the oracle is a true CROSS-IMPLEMENTATION check of the
    // expression, value-for-value at round-4, over all 64² probe×dict
    // pairs. Probes are the 64 distinct part names with one hash-chosen
    // adjacent transposition (the error class Jaro is built for);
    // matching recovers the source name for ≥60/64 probes with a strict
    // margin over the runner-up (spec-pinned — the remainder are
    // genuinely confusable: 'cold bolt' mangled to 'ocld bolt' IS closer
    // to 'old bolt', and the matcher says so). The 64×64 product is
    // bounded metadata (big-dictionary ER blocks first — q92/q165); at
    // 100 TB the expression runs inside whole-stage codegen as one
    // static call per pair, no UDF serialization.
    q("q332_jaro_winkler",
      "codegen Jaro-Winkler recovers transposed part names; oracle is DuckDB's native fn")(
      """WITH dict AS (SELECT DISTINCT p_name AS name FROM part),
        |pr AS (SELECT name AS src,
        |              CAST((('0x' || substr(md5('jw:' || name), 1, 15))::BIGINT)
        |                   % (length(name) - 2) + 1 AS INT) AS i
        |       FROM dict),
        |probes AS (SELECT src,
        |                  substr(src, 1, i - 1) || substr(src, i + 1, 1)
        |                  || substr(src, i, 1) || substr(src, i + 2) AS probe
        |           FROM pr),
        |scored AS (SELECT p.src, p.probe, d.name AS cand,
        |                  jaro_winkler_similarity(p.probe, d.name) AS jw
        |           FROM probes p CROSS JOIN dict d),
        |rk AS (SELECT src, probe, cand, jw,
        |              row_number() OVER (PARTITION BY src ORDER BY jw DESC, cand) AS rn
        |       FROM scored)
        |SELECT a.src, a.probe, a.cand AS best, round(a.jw, 4) AS jw_best,
        |       round(b.jw, 4) AS jw_runner,
        |       CAST(CASE WHEN a.cand = a.src THEN 1 ELSE 0 END AS BIGINT) AS self_match
        |FROM rk a JOIN rk b ON b.src = a.src AND b.rn = 2
        |WHERE a.rn = 1 ORDER BY a.src""".stripMargin
    ) { (s, dir) =>
      import graft.expressions.JaroWinkler.jaroWinkler
      import graft.functions.PortableHash.md5Long
      val dict = Tables(s, dir, "part").select(col("p_name").as("name")).distinct()
        .cache() // probe build + candidate side
      val probes = dict
        .select(col("name").as("src"),
          (md5Long(concat(lit("jw:"), col("name"))) % (length(col("name")) - 2) + 1)
            .cast("int").as("i"))
        .select(col("src"),
          concat(expr("substr(src, 1, i - 1)"), expr("substr(src, i + 1, 1)"),
            expr("substr(src, i, 1)"), expr("substr(src, i + 2)")).as("probe"))
      val scored = probes.crossJoin(dict)
        .select(col("src"), col("probe"), col("name").as("cand"),
          jaroWinkler(col("probe"), col("name")).as("jw"))
      // best + runner via the native TopKPerKeyExec: the scored frame is
      // |dict|² rows from the allowlisted product, and the old rank window
      // full-shuffled ALL of it (then twice more through the cached legs);
      // TopK bounds the exchange at 2 rows/src/task and the pair ranks
      // inside a sorted array — jw ∈ [0,1], so -jw is a safe sort key
      graft.plans.TopKPerKey.topK(scored, Seq(col("src")),
          Seq(col("jw").desc, col("cand")), 2)
        .groupBy("src", "probe")
        .agg(sort_array(collect_list(struct((-col("jw")).as("nj"), col("cand")))).as("arr"))
        .select(col("src"), col("probe"),
          col("arr")(0).getField("cand").as("best"),
          round(-col("arr")(0).getField("nj"), 4).as("jw_best"),
          round(-col("arr")(1).getField("nj"), 4).as("jw_runner"),
          when(col("arr")(0).getField("cand") === col("src"), 1L).otherwise(0L)
            .as("self_match"))
        .orderBy("src")
    },

    // q336: grid-cell spatial radius join — the geospatial twin of q189's
    // ε-grid DBSCAN candidate generation. Points live on a 10000×10000
    // integer grid (hash-derived coordinates, so both engines agree
    // bit-for-bit); the task is "all pairs within radius R=150". The
    // engine NEVER forms the n² product: each point maps to a cell of
    // side R, the LEFT side expands to its 3×3 neighbor cells (a 9×
    // blow-up of POINTS, not pairs), and candidates come from one
    // equi-join on the cell key — any true pair is ≤1 cell apart, and
    // each unordered pair is emitted exactly once (only the left side
    // expands; a<b dedups the mirror). The DuckDB oracle is the O(n²)
    // brute force, so the hash check PROVES blocking completeness: the
    // carried n_pairs column would differ on any missed pair, not just
    // on a top-20 change. At 100 TB the join shuffles by cell id and the
    // work is density-bounded (points per cell ~ R²·density) — the same
    // guarantee as q189; skewed hot cells would salt via SkewTools.
    q("q336_geo_cell_join",
      "radius-150 spatial self-join via 3x3 neighbor-cell blocking; brute-force oracle")(
      s"""WITH pts AS (
         |  SELECT c_custkey AS id,
         |         ${graft.functions.PortableHash.md5LongSql("'geox:' || CAST(c_custkey AS VARCHAR)")} % 10000 AS x,
         |         ${graft.functions.PortableHash.md5LongSql("'geoy:' || CAST(c_custkey AS VARCHAR)")} % 10000 AS y
         |  FROM customer
         |  WHERE ${graft.functions.PortableHash.md5LongSql("'geo:' || CAST(c_custkey AS VARCHAR)")} % 4 = 0),
         |pairs AS (
         |  SELECT a.id AS a, b.id AS b,
         |         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
         |  FROM pts a JOIN pts b ON a.id < b.id
         |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 22500),
         |tot AS (SELECT count(*) AS n_pairs FROM pairs)
         |SELECT a, b, CAST(d2 AS BIGINT) AS d2, CAST(n_pairs AS BIGINT) AS n_pairs
         |FROM pairs CROSS JOIN tot
         |ORDER BY d2, a, b LIMIT 20""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      def h(tag: String) =
        md5Long(concat(lit(tag + ":"), col("c_custkey").cast("string")))
      val pts = Tables(s, dir, "customer")
        .filter(h("geo") % 4 === 0)
        .select(col("c_custkey").as("id"),
          (h("geox") % 10000).as("x"), (h("geoy") % 10000).as("y"))
        .select(col("id"), col("x"), col("y"),
          expr("x div 150").as("cx"), expr("y div 150").as("cy"))
        .cache() // expanded left + plain right off one hash pass
      val left = pts.select(
          col("id").as("a"), col("x").as("ax"), col("y").as("ay"),
          explode(expr(
            "flatten(transform(sequence(-1, 1), dx -> " +
              "transform(sequence(-1, 1), dy -> " +
              "struct(cx + dx AS jx, cy + dy AS jy))))")).as("c"))
        .select(col("a"), col("ax"), col("ay"),
          col("c.jx").as("jx"), col("c.jy").as("jy"))
      val right = pts.select(col("id").as("b"), col("x").as("bx"),
        col("y").as("by"), col("cx").as("jx"), col("cy").as("jy"))
      val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by"))
      val pairs = left.join(right, Seq("jx", "jy"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b"), d2.as("d2"))
        .filter(col("d2") <= 22500)
        .cache() // top-20 leg + completeness count leg
      pairs.crossJoin(broadcast(pairs.agg(count(lit(1)).as("n_pairs"))))
        .orderBy(col("d2"), col("a"), col("b"))
        .limit(20)
    },

    // q340: predicate bitmap-index boolean algebra — the Druid/Pinot
    // "evaluate the filter on the index, never the rows" shape, and the
    // multi-predicate extension of q126's membership overlap. Three row
    // predicates over orders are packed into 63-bit BIGINT word bitmaps
    // keyed by o_orderkey div 63 (bit 63 stays clear — DuckDB's shift is
    // overflow-checked there, q59's lesson) in ONE pass: a single
    // groupBy(word) carries all three bitmaps AND the direct per-word
    // predicate counts, so there is exactly one shuffle and its width is
    // |rows|/63 words. All boolean combinations (AND, OR, XOR, A∖B, B∖A)
    // are then map-side word ops + popcount. The output carries, per
    // predicate pair, BOTH the bitmap-derived counts and the direct row
    // counts plus the inclusion-exclusion residual (|A∪B|−|A|−|B|+|A∩B|,
    // constant 0) — the hash check proves the index is LOSSLESS, not just
    // that both engines ran the same algebra. At 100 TB: predicates are
    // evaluated once at the scan, the index is 8 bytes per 63 rows, and
    // every subsequent boolean query over these predicates touches words
    // only — the standard OLAP secondary-index contract.
    q("q340_bitmap_predicate_algebra",
      "3-predicate bitmap index: one-pass build, AND/OR/XOR/diff popcounts, lossless vs direct")(
      """WITH r AS (
        |  SELECT o_orderkey // 63 AS w,
        |         1::BIGINT << CAST(o_orderkey % 63 AS INT) AS m,
        |         (o_orderstatus = 'F') AS pa,
        |         (left(o_orderpriority, 1) IN ('1', '2')) AS pb,
        |         (o_totalprice > 150000.0) AS pc
        |  FROM orders),
        |b AS (
        |  SELECT w,
        |         bit_or(CASE WHEN pa THEN m ELSE 0 END) AS ba,
        |         bit_or(CASE WHEN pb THEN m ELSE 0 END) AS bb,
        |         bit_or(CASE WHEN pc THEN m ELSE 0 END) AS bc,
        |         sum(CASE WHEN pa THEN 1 ELSE 0 END) AS da,
        |         sum(CASE WHEN pb THEN 1 ELSE 0 END) AS db,
        |         sum(CASE WHEN pc THEN 1 ELSE 0 END) AS dc
        |  FROM r GROUP BY w),
        |t AS (
        |  SELECT
        |    CAST(sum(bit_count(ba & bb)) AS BIGINT) AS and_ab,
        |    CAST(sum(bit_count(ba | bb)) AS BIGINT) AS or_ab,
        |    CAST(sum(bit_count(xor(ba, bb))) AS BIGINT) AS xor_ab,
        |    CAST(sum(bit_count(ba & ~bb)) AS BIGINT) AS lo_ab,
        |    CAST(sum(bit_count(bb & ~ba)) AS BIGINT) AS ro_ab,
        |    CAST(sum(bit_count(ba & bc)) AS BIGINT) AS and_ac,
        |    CAST(sum(bit_count(ba | bc)) AS BIGINT) AS or_ac,
        |    CAST(sum(bit_count(xor(ba, bc))) AS BIGINT) AS xor_ac,
        |    CAST(sum(bit_count(ba & ~bc)) AS BIGINT) AS lo_ac,
        |    CAST(sum(bit_count(bc & ~ba)) AS BIGINT) AS ro_ac,
        |    CAST(sum(bit_count(bb & bc)) AS BIGINT) AS and_bc,
        |    CAST(sum(bit_count(bb | bc)) AS BIGINT) AS or_bc,
        |    CAST(sum(bit_count(xor(bb, bc))) AS BIGINT) AS xor_bc,
        |    CAST(sum(bit_count(bb & ~bc)) AS BIGINT) AS lo_bc,
        |    CAST(sum(bit_count(bc & ~bb)) AS BIGINT) AS ro_bc,
        |    CAST(sum(da) AS BIGINT) AS ta, CAST(sum(db) AS BIGINT) AS tb,
        |    CAST(sum(dc) AS BIGINT) AS tc
        |  FROM b)
        |SELECT 'a_b' AS pair, and_ab AS n_and, or_ab AS n_or, xor_ab AS n_xor,
        |       lo_ab AS n_left_only, ro_ab AS n_right_only,
        |       ta AS n_left_direct, tb AS n_right_direct,
        |       or_ab - ta - tb + and_ab AS incl_excl_residual
        |FROM t
        |UNION ALL
        |SELECT 'a_c', and_ac, or_ac, xor_ac, lo_ac, ro_ac, ta, tc,
        |       or_ac - ta - tc + and_ac FROM t
        |UNION ALL
        |SELECT 'b_c', and_bc, or_bc, xor_bc, lo_bc, ro_bc, tb, tc,
        |       or_bc - tb - tc + and_bc FROM t
        |ORDER BY pair""".stripMargin
    ) { (s, dir) =>
      val r = Tables(s, dir, "orders").select(
        expr("o_orderkey div 63").as("w"),
        expr("shiftleft(1L, cast(o_orderkey % 63 as int))").as("m"),
        (col("o_orderstatus") === "F").as("pa"),
        expr("left(o_orderpriority, 1)").isin("1", "2").as("pb"),
        (col("o_totalprice") > 150000.0).as("pc"))
      val b = r.groupBy("w").agg(
        expr("bit_or(if(pa, m, 0L))").as("ba"),
        expr("bit_or(if(pb, m, 0L))").as("bb"),
        expr("bit_or(if(pc, m, 0L))").as("bc"),
        sum(when(col("pa"), 1L).otherwise(0L)).as("da"),
        sum(when(col("pb"), 1L).otherwise(0L)).as("db"),
        sum(when(col("pc"), 1L).otherwise(0L)).as("dc"))
      // all pairwise combos in one global agg over the word frame; ^ is
      // XOR in Spark SQL but POWER in DuckDB (oracle uses xor(a, b))
      def pc2(e: String, as: String) =
        sum(bit_count(expr(e))).cast("long").as(as)
      val t = b.agg(
        pc2("ba & bb", "and_ab"), pc2("ba | bb", "or_ab"),
        pc2("ba ^ bb", "xor_ab"), pc2("ba & ~bb", "lo_ab"),
        pc2("bb & ~ba", "ro_ab"),
        pc2("ba & bc", "and_ac"), pc2("ba | bc", "or_ac"),
        pc2("ba ^ bc", "xor_ac"), pc2("ba & ~bc", "lo_ac"),
        pc2("bc & ~ba", "ro_ac"),
        pc2("bb & bc", "and_bc"), pc2("bb | bc", "or_bc"),
        pc2("bb ^ bc", "xor_bc"), pc2("bb & ~bc", "lo_bc"),
        pc2("bc & ~bb", "ro_bc"),
        sum(col("da")).cast("long").as("ta"),
        sum(col("db")).cast("long").as("tb"),
        sum(col("dc")).cast("long").as("tc"))
      t.selectExpr(
        """stack(3,
          |  'a_b', and_ab, or_ab, xor_ab, lo_ab, ro_ab, ta, tb,
          |         or_ab - ta - tb + and_ab,
          |  'a_c', and_ac, or_ac, xor_ac, lo_ac, ro_ac, ta, tc,
          |         or_ac - ta - tc + and_ac,
          |  'b_c', and_bc, or_bc, xor_bc, lo_bc, ro_bc, tb, tc,
          |         or_bc - tb - tc + and_bc)
          |AS (pair, n_and, n_or, n_xor, n_left_only, n_right_only,
          |    n_left_direct, n_right_direct, incl_excl_residual)""".stripMargin)
        .orderBy("pair")
    },

    // q341: columnar encoding advisor — the parquet-writer "pick an
    // encoding per column chunk" decision, run as a query. Orders rows are
    // grouped into 4096-key pages (pg = o_orderkey div 4096, the row-group
    // analogue); within each page, in key order, the model prices four
    // encodings with EXACT integer byte formulas:
    //   plain = 8/value (ints) or Σ(4+len) (strings)
    //   rle   = runs × (value + 4-byte runlen); runs counted via lag()
    //   dict  = per-page entry bytes + ⌈n·idxbits/8⌉, idxbits =
    //           bitwidth(ndv−1) via length(bin(·)) — identical both engines
    //   delta = 8-byte base + ⌈(n−1)·maxwidth/8⌉ over zigzag'd lag deltas
    //           (ints only; 2|d|+sign keeps widths sign-free)
    // and reports, per column, total bytes under each model plus the
    // chosen encoding (fixed rle→dict→delta→plain tie order). The fixture
    // spans the real decision space: o_orderstatus (3 NDV strings) lands
    // dict/rle, o_custkey (dense keys) delta, cents (wide deltas) plain —
    // the spec pins that at least two different winners appear. Scale
    // shape: ONE exchange keyed pg feeds both the run/delta window and the
    // (pg, v) distinct rollup (same key prefix, co-partitioned); everything
    // after runs on |pages|×|columns| rows — at 100 TB this is precisely
    // the per-row-group metadata pass a lakehouse writer already does.
    q("q341_encoding_advisor",
      "per-column RLE/dict/delta/plain byte models over 4096-key pages; argmin encoding")(
      EncodingAdvisor.oracleSql
    ) { (s, dir) => EncodingAdvisor(s, dir) },

    // q343: item–item collaborative-filtering similarity — the recommender
    // primitive one level ABOVE q162's raw co-occurrence projection: the
    // customer×part purchase graph (a two-table join, not a single edge
    // list) is projected to part pairs and each pair is NORMALIZED into
    // exact integer-milli Jaccard (w·1000 div (d1+d2−w)) and overlap
    // (w·1000 div min(d1,d2)) coefficients over the parts' kept-basket
    // degrees — raw counts rank popular items, normalized similarity
    // ranks RELATED items, which is why item-CF normalizes. Scale
    // disciplines: the 40-part HUB CAP bounds per-basket pairing at cap²
    // (avg basket IS ~40 here, so the cap genuinely binds — spec-pinned),
    // and the part-degree frame joined back onto pairs is |parts|-bounded
    // (broadcast). Carried completeness counts (n_pairs, sum_w, n_capped,
    // n_kept) make the hash prove the cap semantics and the projection
    // identity Σw = Σ C(d,2), not just the top-20.
    q("q343_item_cf_similarity",
      "item-item CF: hub-capped co-purchase projection normalized to exact milli Jaccard/overlap")(
      """WITH e AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |deg AS (SELECT c, count(*) AS d FROM e GROUP BY c),
        |kept AS (SELECT e.c, e.p FROM e JOIN deg ON deg.c = e.c
        |         WHERE deg.d BETWEEN 2 AND 40),
        |pdeg AS (SELECT p, CAST(count(*) AS BIGINT) AS pd FROM kept GROUP BY p),
        |pairs AS (
        |  SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS w
        |  FROM kept a JOIN kept b ON a.c = b.c AND a.p < b.p
        |  GROUP BY a.p, b.p),
        |scored AS (
        |  SELECT p1, p2, w, d1.pd AS d1, d2.pd AS d2,
        |         w * 1000 // (d1.pd + d2.pd - w) AS jaccard_milli,
        |         w * 1000 // least(d1.pd, d2.pd) AS overlap_milli
        |  FROM pairs JOIN pdeg d1 ON d1.p = pairs.p1
        |             JOIN pdeg d2 ON d2.p = pairs.p2),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |               CAST(sum(w) AS BIGINT) AS sum_w FROM pairs),
        |caps AS (SELECT CAST(count(CASE WHEN d > 40 THEN 1 END) AS BIGINT) AS n_capped,
        |                CAST(count(CASE WHEN d BETWEEN 2 AND 40 THEN 1 END) AS BIGINT) AS n_kept
        |         FROM deg)
        |SELECT p1, p2, w, d1, d2, jaccard_milli, overlap_milli,
        |       n_pairs, sum_w, n_capped, n_kept
        |FROM scored CROSS JOIN tot CROSS JOIN caps
        |ORDER BY jaccard_milli DESC, w DESC, p1, p2 LIMIT 20""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        .join(Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
        .cache() // basket-degree leg + two projection sides
      val deg = e.groupBy("c").agg(count(lit(1)).as("d"))
      val kept = e.join(deg.filter(col("d").between(2, 40)).select("c"), Seq("c"))
        .cache() // part-degree leg + both self-join sides
      val pdeg = kept.groupBy("p").agg(count(lit(1)).cast("long").as("pd"))
      val pairs = kept.as("a")
        .join(kept.as("b"), col("a.c") === col("b.c") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
        .agg(count(lit(1)).cast("long").as("w"))
        .cache() // scored leg + totals leg
      val scored = pairs
        .join(broadcast(pdeg.select(col("p").as("p1"), col("pd").as("d1"))), Seq("p1"))
        .join(broadcast(pdeg.select(col("p").as("p2"), col("pd").as("d2"))), Seq("p2"))
        .withColumn("jaccard_milli", expr("w * 1000 div (d1 + d2 - w)"))
        .withColumn("overlap_milli", expr("w * 1000 div least(d1, d2)"))
      val tot = pairs.agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("w")).cast("long").as("sum_w"))
      val caps = deg.agg(
        count(when(col("d") > 40, 1)).cast("long").as("n_capped"),
        count(when(col("d").between(2, 40), 1)).cast("long").as("n_kept"))
      scored.crossJoin(broadcast(tot)).crossJoin(broadcast(caps))
        .select(col("p1"), col("p2"), col("w"), col("d1"), col("d2"),
          col("jaccard_milli"), col("overlap_milli"),
          col("n_pairs"), col("sum_w"), col("n_capped"), col("n_kept"))
        .orderBy(col("jaccard_milli").desc, col("w").desc, col("p1"), col("p2"))
        .limit(20)
    },

    // q345: the approx-count-distinct ACCELERATION RULE in action — the
    // same `count(DISTINCT o_custkey)` DataFrame is built twice; leg one
    // runs exact, leg two runs under spark.graft.approxCountDistinct=true,
    // where graft.plans.ApproxCountRewrite (an injected optimizer Rule)
    // transparently replaces the distinct Count with the KMV bottom-64
    // sketch + estimate. Because the sketch is md5-arithmetic, DuckDB
    // reproduces the ACCELERATED answer bit-for-bit (bottom-64 hashes per
    // group + the shared estimator text) — the rewrite is hash-verified,
    // not trusted. The approx leg is localCheckpoint'ed inside the flag
    // window so the pinned execution, not a lazily re-planned one, is what
    // the oracle checks. 100 TB story: exact count-distinct shuffles every
    // distinct (group, value) pair; the rewritten plan partial-aggregates
    // to ≤64 longs per (partition, group) before the exchange — the
    // optimizer applies the q187/q190 state bound to queries nobody
    // rewrote by hand. Accuracy: exact below 64 distinct, rel σ ≈ 12.7 %
    // above (rel_err_milli carried per group; ApproxRewriteSpec pins the
    // 4σ bound and the plan shapes both ways).
    q("q345_approx_rewrite",
      "optimizer rewrite: count(DISTINCT) -> KMV bottom-64 estimate, oracle-reproduced")(
      s"""WITH e AS (SELECT o_orderpriority AS p,
         |                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_cnt
         |           FROM orders GROUP BY p),
         |h AS (SELECT DISTINCT o_orderpriority AS p,
         |             ${graft.functions.PortableHash.md5LongSql("CAST(o_custkey AS VARCHAR)")} AS h
         |      FROM orders WHERE o_custkey IS NOT NULL),
         |rk AS (SELECT p, h, row_number() OVER (PARTITION BY p ORDER BY h) AS rn
         |       FROM h),
         |a AS (SELECT p,
         |             ${graft.functions.PortableHash.kmvEstimateSql(
              "count(*)", "max(CASE WHEN rn = 64 THEN h END)", 64)} AS approx_cnt
         |      FROM rk WHERE rn <= 64 GROUP BY p)
         |SELECT e.p AS o_orderpriority, e.exact_cnt, a.approx_cnt,
         |       abs(a.approx_cnt - e.exact_cnt) * 1000 // e.exact_cnt AS rel_err_milli
         |FROM e JOIN a USING (p)
         |ORDER BY o_orderpriority""".stripMargin
    ) { (s, dir) =>
      def counted = Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count_distinct(col("o_custkey")).as("cnt"))
      val exact = counted.withColumnRenamed("cnt", "exact_cnt")
      // sessions built without GraftExtensions get the rule here (q281's
      // MvAggRewrite pattern); the append is idempotent
      if (!s.experimental.extraOptimizations
            .contains(graft.plans.ApproxCountRewrite))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ graft.plans.ApproxCountRewrite
      val approx = {
        s.conf.set(graft.plans.ApproxCountRewrite.FLAG, "true")
        try counted.withColumnRenamed("cnt", "approx_cnt")
          .localCheckpoint(true) // pin the REWRITTEN execution to the window
        finally s.conf.set(graft.plans.ApproxCountRewrite.FLAG, "false")
      }
      exact.join(approx, Seq("o_orderpriority"))
        .withColumn("rel_err_milli",
          expr("abs(approx_cnt - exact_cnt) * 1000 div exact_cnt"))
        .orderBy("o_orderpriority")
    },

    // q346: column-level LINEAGE extraction — the data-catalog capability
    // (which source columns feed each output column?) derived from the
    // ANALYZED plan itself, not from documentation. A fixed 3-table demo
    // query (nation ⋈ customer ⋈ orders → per-nation revenue stats) is
    // planned, then each output attribute's transitive expression
    // references are walked down through Alias definitions across
    // Project/Aggregate/Join nodes to the scan-level attributes, and each
    // leaf is attributed to its source table by matching the base
    // relations' output ids. The result is the (out_col, src_table,
    // src_col) edge list — governance ground truth the oracle pins as a
    // LITERAL table (the lineage of a fixed query is a known constant;
    // the check is that plan introspection derives exactly it — e.g.
    // revenue_cents must trace to BOTH o_totalprice and o_orderstatus,
    // whose CASE gate a name-based lineage scraper would miss). Plan
    // walking is inherently driver-side METADATA work (the plan is
    // driver-resident by definition); no fixture row is ever read — at
    // any scale this costs exactly one analysis pass.
    q("q346_column_lineage",
      "plan-derived column lineage of a 3-table join/agg; literal-table oracle")(
      """SELECT * FROM (VALUES
        |  ('n_customers', 'customer', 'c_custkey'),
        |  ('nation_name', 'nation', 'n_name'),
        |  ('revenue_cents', 'orders', 'o_orderstatus'),
        |  ('revenue_cents', 'orders', 'o_totalprice'),
        |  ('top_balance_cents', 'customer', 'c_acctbal'))
        |AS t(out_col, src_table, src_col)
        |ORDER BY out_col, src_table, src_col""".stripMargin
    ) { (s, dir) =>
      import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, ExprId}
      import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
      val nation = Tables(s, dir, "nation")
      val customer = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
      val demo = customer
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(orders, col("o_custkey") === col("c_custkey"))
        .groupBy(col("n_name").as("nation_name"))
        .agg(
          count_distinct(col("c_custkey")).as("n_customers"),
          sum(when(col("o_orderstatus") === "F",
            round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
            .as("revenue_cents"),
          max(round(col("c_acctbal") * 100).cast("long"))
            .as("top_balance_cents"))
      val plan = demo.queryExecution.analyzed
      // id → source table for every scan-level attribute
      val srcOf: Map[ExprId, (String, String)] =
        Seq("nation" -> nation, "customer" -> customer, "orders" -> orders)
          .flatMap { case (t, df) =>
            df.queryExecution.analyzed.output.map(a => a.exprId -> (t, a.name))
          }.toMap
      // id → defining expression (every Alias anywhere in the plan)
      val defs: Map[ExprId, Seq[Attribute]] = {
        val b = scala.collection.mutable.Map.empty[ExprId, Seq[Attribute]]
        plan.foreach { (n: LogicalPlan) =>
          n.expressions.foreach(_.foreach {
            case al: Alias => b(al.exprId) = al.child.references.toSeq
            case _ => ()
          })
        }
        b.toMap
      }
      def leaves(id: ExprId, seen: Set[ExprId]): Seq[(String, String)] =
        if (seen(id)) Nil
        else srcOf.get(id).map(Seq(_)).getOrElse(
          defs.getOrElse(id, Nil).flatMap(a => leaves(a.exprId, seen + id)))
      // each output's OWN expression tree only — join/group keys appear in
      // the lineage exactly where they define an output column
      // (n_customers ← c_custkey, nation_name ← n_name)
      val edges = plan.output.flatMap { out =>
        leaves(out.exprId, Set.empty).distinct.map {
          case (t, c) => (out.name, t, c)
        }
      }.distinct
      import s.implicits._
      edges.toDF("out_col", "src_table", "src_col")
        .orderBy("out_col", "src_table", "src_col")
    },

    // q347: differentially-private counts via the DISCRETE (two-sided
    // geometric) Laplace mechanism — the statistical-privacy companion to
    // the syntactic family (q248 k-anonymity, q261 l-diversity, q272
    // t-closeness): released count = true count + geometric noise with
    // P(k) ∝ exp(−ε·|k|), ε = 0.5, sensitivity 1 (one customer moves one
    // group count by one). The mechanism is exactly Google's
    // discrete-Laplace production shape, made REPRODUCIBLE: the noise CDF
    // is precomputed in Scala as integer thresholds on the 2³⁰ grid
    // (the LSH-plane-constants pattern) and embedded VERBATIM in both
    // engines' SQL, with the per-release uniform draw seeded by the md5
    // of the release key — so the oracle reproduces the noisy release
    // bit-for-bit while the mechanism retains its DP shape under a
    // secret seed. Tails clamp at ±30 (mass beyond: < 2·e^{-15} ≈ 6e-7 —
    // documented bias). true_cnt is carried for the AUDIT contract of
    // this demo (the spec measures noise moments); a production release
    // drops it. One groupBy shuffle; the noise is a per-GROUP map-side
    // expression — DP cost is O(groups), free at any row scale.
    q("q347_dp_counts",
      "discrete-Laplace (two-sided geometric) DP counts, eps=0.5, hash-seeded, bit-reproducible")(
      s"""WITH g AS (
         |  SELECT c_mktsegment AS seg, n_name AS nat,
         |         CAST(count(*) AS BIGINT) AS true_cnt
         |  FROM customer JOIN nation ON n_nationkey = c_nationkey
         |  GROUP BY seg, nat),
         |u AS (SELECT seg, nat, true_cnt,
         |             ${graft.functions.PortableHash.md5LongSql("'dp:' || seg || ':' || nat")} % 1073741824 AS uu
         |      FROM g)
         |SELECT seg, nat, true_cnt,
         |       ${DpGeometric.noiseSql("uu")} AS noise,
         |       true_cnt + ${DpGeometric.noiseSql("uu")} AS noisy_cnt,
         |       CAST(500 AS BIGINT) AS eps_milli
         |FROM u
         |ORDER BY seg, nat""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val g = Tables(s, dir, "customer")
        .join(broadcast(Tables(s, dir, "nation")),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("n_name").as("nat"))
        .agg(count(lit(1)).cast("long").as("true_cnt"))
        .withColumn("uu",
          md5Long(concat(lit("dp:"), col("seg"), lit(":"), col("nat")))
            % 1073741824L)
      g.withColumn("noise", expr(DpGeometric.noiseSql("uu")))
        .withColumn("noisy_cnt", col("true_cnt") + col("noise"))
        .withColumn("eps_milli", lit(500L))
        .drop("uu")
        .orderBy("seg", "nat")
    },

    // q349: differentially-private SUM with contribution bounding — the
    // practically-hard half q347's counts don't exercise: a sum's
    // sensitivity is whatever ONE user can contribute, so each customer's
    // order count is CLAMPED at C = 3 before aggregation (sensitivity
    // becomes exactly C), and the geometric noise runs at per-unit
    // parameter ε/C = 0.2 (release ε = 0.6) with support widened to ±75.
    // The clamp is the bias-for-privacy trade every DP sum makes; the
    // output carries n_clamped (how many customers hit the cap — the
    // utility diagnostic; on TPC-H nearly all do, since customers average
    // ~10 orders) so the trade is measured, not hidden. Same
    // reproducibility contract as q347: Scala-precomputed integer CDF
    // shared verbatim, release-key-seeded draw, bit-identical in DuckDB.
    // Shape: one (custkey) groupBy for the clamp, one (nation) groupBy
    // for the sum, noise as a map-side CASE per released row.
    q("q349_dp_sum",
      "DP sum with per-user clamp C=3: sensitivity-scaled geometric noise, eps=0.6")(
      s"""WITH pc AS (
         |  SELECT c.c_nationkey AS nk,
         |         LEAST(CAST(count(*) AS BIGINT), 3) AS cc,
         |         CASE WHEN count(*) > 3 THEN 1 ELSE 0 END AS clamped
         |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
         |  GROUP BY nk, o.o_custkey),
         |g AS (SELECT n.n_name AS nat, CAST(sum(cc) AS BIGINT) AS true_sum,
         |             CAST(sum(clamped) AS BIGINT) AS n_clamped
         |      FROM pc JOIN nation n ON n.n_nationkey = pc.nk
         |      GROUP BY nat),
         |u AS (SELECT nat, true_sum, n_clamped,
         |             ${graft.functions.PortableHash.md5LongSql("'dpsum:' || nat")} % 1073741824 AS uu
         |      FROM g)
         |SELECT nat, true_sum, n_clamped,
         |       ${DpSumTable.noiseSql("uu")} AS noise,
         |       true_sum + ${DpSumTable.noiseSql("uu")} AS noisy_sum,
         |       CAST(600 AS BIGINT) AS eps_milli, CAST(3 AS BIGINT) AS sensitivity
         |FROM u
         |ORDER BY nat""".stripMargin
    ) { (s, dir) =>
      import graft.functions.PortableHash.md5Long
      val pc = Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey").as("nk"), col("o_custkey"))
        .agg(least(count(lit(1)).cast("long"), lit(3L)).as("cc"),
          when(count(lit(1)) > 3, 1L).otherwise(0L).as("clamped"))
      val g = pc.join(broadcast(Tables(s, dir, "nation")),
          col("n_nationkey") === col("nk"))
        .groupBy(col("n_name").as("nat"))
        .agg(sum(col("cc")).cast("long").as("true_sum"),
          sum(col("clamped")).cast("long").as("n_clamped"))
        .withColumn("uu",
          md5Long(concat(lit("dpsum:"), col("nat"))) % 1073741824L)
      g.withColumn("noise", expr(DpSumTable.noiseSql("uu")))
        .withColumn("noisy_sum", col("true_sum") + col("noise"))
        .withColumn("eps_milli", lit(600L))
        .withColumn("sensitivity", lit(3L))
        .drop("uu")
        .orderBy("nat")
    }
  )
}

/** Discrete-Laplace noise table (q347/q349): integer CDF thresholds of
  * the two-sided geometric distribution P(k) ∝ exp(−ε·|k|) on the 2³⁰
  * grid, precomputed once in plain Scala and emitted as ONE literal CASE
  * expression evaluated identically by Spark and DuckDB — the same
  * shared-constants discipline as the LSH plane table. Support clamps to
  * [−B, B]; pick B so the truncated tail mass exp(−εB) is negligible. */
private[operators] class DpTable(val eps: Double, val B: Int) {

  /** (k, exclusive upper threshold on the 2^30 grid) for k = −B .. B−1;
    * u ≥ last threshold ⇒ k = B. */
  val thresholds: Seq[(Int, Long)] = {
    val ks = (-B to B).map(_.toDouble)
    val w = ks.map(k => math.exp(-eps * math.abs(k)))
    val total = w.sum
    val cum = w.scanLeft(0.0)(_ + _).tail
    (-B until B).zip(cum.dropRight(1)).map { case (k, c) =>
      (k, math.floor(c / total * 1073741824.0).toLong)
    }
  }

  /** CASE chain mapping a uniform draw `u` ∈ [0, 2³⁰) to the noise value. */
  def noiseSql(u: String): String =
    thresholds.map { case (k, t) =>
      s"WHEN $u < $t THEN CAST($k AS BIGINT)"
    }.mkString("CASE ", " ", s" ELSE CAST($B AS BIGINT) END")
}

/** q347's count table: ε = 0.5, sensitivity 1. */
private[operators] object DpGeometric extends DpTable(0.5, 30)

/** q349's sum table: release ε = 0.6 at sensitivity C = 3 ⇒ the per-unit
  * geometric parameter is ε/C = 0.2; B = 75 keeps the truncated tail
  * below exp(−15) ≈ 3e−7. */
private[operators] object DpSumTable extends DpTable(0.2, 75)

/** q341's shared column-model machinery: one SQL template + one Spark leg
  * per analyzed column, kept textually parallel so the integer byte
  * formulas stay in lockstep. Ints price all four encodings; strings skip
  * delta (NULL) and carry 4-byte length prefixes in plain/rle/dict entry
  * costs. See q341's doc comment for the formulas. */
private[operators] object EncodingAdvisor {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** (name, DuckDB value expr over orders, Spark value expr, isString) */
  private val cols: Seq[(String, String, String, Boolean)] = Seq(
    ("cents", "CAST(round(o_totalprice * 100) AS BIGINT)",
      "cast(round(o_totalprice * 100) as bigint)", false),
    ("days", "CAST(date_diff('day', DATE '1992-01-01', o_orderdate::DATE) AS BIGINT)",
      "cast(datediff(cast(o_orderdate as date), date'1992-01-01') as bigint)", false),
    ("o_custkey", "o_custkey", "o_custkey", false),
    ("o_orderstatus", "o_orderstatus", "o_orderstatus", true))

  private def legSql(name: String, vExpr: String, isString: Boolean): String = {
    val plainV = if (isString) "4 + length(v)" else "8"
    val entryV = if (isString) "4 + length(v)" else "8"
    s"""w_$name AS (
       |  SELECT pg, v,
       |         CASE WHEN lag(v) OVER win IS NULL OR v <> lag(v) OVER win
       |              THEN 1 ELSE 0 END AS nr,
       |         ${if (isString) "CAST(NULL AS BIGINT)"
                  else s"""CASE WHEN lag(v) OVER win IS NULL THEN NULL
       |              ELSE CAST(length(bin(2 * abs(v - lag(v) OVER win) +
       |                   CASE WHEN v < lag(v) OVER win THEN 1 ELSE 0 END)) AS BIGINT)
       |              END"""} AS zbits
       |  FROM (SELECT o_orderkey // 4096 AS pg, o_orderkey AS k, $vExpr AS v
       |        FROM orders)
       |  WINDOW win AS (PARTITION BY pg ORDER BY k)),
       |p_$name AS (
       |  SELECT pg, CAST(count(*) AS BIGINT) AS n, CAST(sum(nr) AS BIGINT) AS runs,
       |         CAST(sum(nr * ($plainV + 4)) AS BIGINT) AS rleb,
       |         CAST(sum($plainV) AS BIGINT) AS plainb,
       |         CAST(coalesce(max(zbits), 0) AS BIGINT) AS dbits
       |  FROM w_$name GROUP BY pg),
       |d_$name AS (
       |  SELECT pg, CAST(count(*) AS BIGINT) AS ndv,
       |         CAST(sum($entryV) AS BIGINT) AS entryb
       |  FROM (SELECT DISTINCT pg, v FROM w_$name) GROUP BY pg),
       |c_$name AS (
       |  SELECT '$name' AS col_name,
       |         CAST(count(*) AS BIGINT) AS n_pages,
       |         CAST(sum(n) AS BIGINT) AS n_values,
       |         CAST(sum(runs) AS BIGINT) AS n_runs,
       |         CAST(sum(plainb) AS BIGINT) AS plain_b,
       |         CAST(sum(rleb) AS BIGINT) AS rle_b,
       |         CAST(sum(entryb +
       |              (n * (CASE WHEN ndv > 1 THEN length(bin(ndv - 1)) ELSE 0 END)
       |               + 7) // 8) AS BIGINT) AS dict_b,
       |         ${if (isString) "CAST(NULL AS BIGINT)"
                  else "CAST(sum(8 + ((n - 1) * dbits + 7) // 8) AS BIGINT)"} AS delta_b
       |  FROM p_$name JOIN d_$name USING (pg))""".stripMargin
  }

  val oracleSql: String = {
    val legs = cols.map { case (n, v, _, s) => legSql(n, v, s) }.mkString(",\n")
    val union = cols.map { case (n, _, _, _) => s"SELECT * FROM c_$n" }
      .mkString("\nUNION ALL\n")
    s"""WITH $legs
       |SELECT col_name, n_pages, n_values, n_runs, plain_b, rle_b, dict_b, delta_b,
       |       CASE WHEN rle_b <= dict_b AND rle_b <= coalesce(delta_b, plain_b)
       |                 AND rle_b <= plain_b THEN 'rle'
       |            WHEN dict_b <= coalesce(delta_b, plain_b) AND dict_b <= plain_b
       |                 THEN 'dict'
       |            WHEN coalesce(delta_b, plain_b + 1) <= plain_b THEN 'delta'
       |            ELSE 'plain' END AS best
       |FROM ($union)
       |ORDER BY col_name""".stripMargin
  }

  private def leg(s: SparkSession, orders: DataFrame,
                  name: String, vExpr: String, isString: Boolean): DataFrame = {
    val win = Window.partitionBy("pg").orderBy("k")
    val plainV = if (isString) "4 + length(v)" else "8"
    val base = orders.selectExpr(
      "o_orderkey div 4096 as pg", "o_orderkey as k", s"$vExpr as v")
    val w = base
      .withColumn("lv", lag("v", 1).over(win))
      .withColumn("nr", when(col("lv").isNull || col("v") =!= col("lv"), 1L)
        .otherwise(0L))
      .withColumn("zbits",
        if (isString) lit(null).cast("long")
        else when(col("lv").isNull, lit(null).cast("long"))
          .otherwise(length(bin(
            lit(2) * abs(col("v") - col("lv")) +
              when(col("v") < col("lv"), 1L).otherwise(0L))).cast("long")))
    val p = w.groupBy("pg").agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("nr")).cast("long").as("runs"),
      sum(col("nr") * (expr(plainV) + lit(4))).cast("long").as("rleb"),
      sum(expr(plainV)).cast("long").as("plainb"),
      coalesce(max(col("zbits")), lit(0L)).as("dbits"))
    val d = w.select("pg", "v").distinct().groupBy("pg").agg(
      count(lit(1)).cast("long").as("ndv"),
      sum(expr(plainV)).cast("long").as("entryb"))
    p.join(d, Seq("pg")).agg(
      count(lit(1)).cast("long").as("n_pages"),
      sum(col("n")).cast("long").as("n_values"),
      sum(col("runs")).cast("long").as("n_runs"),
      sum(col("plainb")).cast("long").as("plain_b"),
      sum(col("rleb")).cast("long").as("rle_b"),
      sum(col("entryb") +
        expr("(n * (case when ndv > 1 then length(bin(ndv - 1)) else 0 end) + 7) div 8"))
        .cast("long").as("dict_b"),
      (if (isString) first(lit(null).cast("long"))
       else sum(expr("8 + ((n - 1) * dbits + 7) div 8")).cast("long")).as("delta_b"))
      .select(lit(name).as("col_name"), col("*"))
  }

  def apply(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    cols.map { case (n, _, v, isStr) => leg(s, orders, n, v, isStr) }
      .reduce(_ unionAll _)
      .withColumn("best",
        when(col("rle_b") <= col("dict_b") &&
          col("rle_b") <= coalesce(col("delta_b"), col("plain_b")) &&
          col("rle_b") <= col("plain_b"), "rle")
          .when(col("dict_b") <= coalesce(col("delta_b"), col("plain_b")) &&
            col("dict_b") <= col("plain_b"), "dict")
          .when(coalesce(col("delta_b"), col("plain_b") + 1) <= col("plain_b"),
            "delta")
          .otherwise("plain"))
      .orderBy("col_name")
  }
}
