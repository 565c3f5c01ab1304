package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * General relational analytics over the star schema — the engine's
 * batch-query surface (aggregation, multi-way joins, windows, top-n).
 *
 * Determinism policy for the DuckDB oracle: money sums are computed in
 * DECIMAL (exact, order-independent), then presented as DOUBLE in the final
 * projection on both sides — the driver's canonicalization floats one side,
 * so DECIMAL outputs hash-mismatch whenever a value has trailing zeros
 * (str(Decimal('137869.0000')) != repr(137869.0)). Averages divide an exact
 * decimal sum by a count in DOUBLE (single IEEE op, deterministic); every
 * output is fully ordered with unique tie-breakers.
 *
 * Scale notes: dimension tables (region/nation/customer/supplier/part) are
 * broadcast — no shuffle on the fact side for those joins; fact-fact joins
 * (orders⋈lineitem) shuffle on the join key once and AQE handles skew.
 */
object RelationalOps {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") graft.Tables.events(spark, dir) // ts → epoch-nanos Long
    else spark.read.parquet(s"$dir/$name.parquet")

  private def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(18,2)")

  /** exact 4-decimal discounted price: ep*(1-disc) has exactly 4 decimals,
    * so the narrowing cast is lossless and both engines agree bit-for-bit. */
  private def discPrice: org.apache.spark.sql.Column =
    (dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
      .cast("decimal(18,4)")

  private val discPriceSql: String =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"

  /** Fixed-point money: the 2-decimal columns as exact scaled longs
    * (cents). Long sums run on the vectorized codegen aggregate path —
    * the decimal(18,x) sum they replace goes through the interpreted
    * overflow-checked aggregate and dominated q20/q21's runtime. round()
    * agrees across engines because the source doubles ARE exact cents;
    * sums stay exact in int64 up to ~10^18 (≫ any SF here), and the one
    * closing double division is the same IEEE op in both engines. */
  private def c100(name: String): org.apache.spark.sql.Column =
    round(col(name) * 100).cast("long")
  private def c100Sql(name: String): String =
    s"CAST(round($name * 100) AS BIGINT)"

  /** discounted price in 4-decimal fixed point: cents × (100 − disc%). */
  private def discPriceL: org.apache.spark.sql.Column =
    c100("l_extendedprice") * (lit(100L) - c100("l_discount"))
  private val discPriceLSql: String =
    s"${c100Sql("l_extendedprice")} * (100 - ${c100Sql("l_discount")})"

  // ===========================================================
  // q20 — pricing summary (TPC-H Q1 shape): wide aggregation with decimal
  // exactness, grouped by returnflag/linestatus
  // ===========================================================
  def q20PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(c100("l_quantity")).cast("double") / lit(100.0)).as("sum_qty"),
        (sum(c100("l_extendedprice")).cast("double") / lit(100.0)).as("sum_base_price"),
        (sum(discPriceL).cast("double") / lit(10000.0)).as("sum_disc_price"),
        (sum(discPriceL * (lit(100L) + c100("l_tax"))).cast("double") / lit(1000000.0))
          .as("sum_charge"),
        (sum(c100("l_quantity")).cast("double") / lit(100.0) / count(lit(1))).as("avg_qty"),
        (sum(c100("l_extendedprice")).cast("double") / lit(100.0) / count(lit(1))).as("avg_price"),
        (sum(c100("l_discount")).cast("double") / lit(100.0) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q20Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
      | CAST(SUM(${c100Sql("l_quantity")}) AS DOUBLE) / 100.0 AS sum_qty,
      | CAST(SUM(${c100Sql("l_extendedprice")}) AS DOUBLE) / 100.0 AS sum_base_price,
      | CAST(SUM($discPriceLSql) AS DOUBLE) / 10000.0 AS sum_disc_price,
      | CAST(SUM($discPriceLSql * (100 + ${c100Sql("l_tax")})) AS DOUBLE) / 1000000.0 AS sum_charge,
      | CAST(SUM(${c100Sql("l_quantity")}) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
      | CAST(SUM(${c100Sql("l_extendedprice")}) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
      | CAST(SUM(${c100Sql("l_discount")}) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q21 — revenue top-10 customers (TPC-H Q3 shape): fact-fact join with
  // broadcast dimension, top-n with unique tie-break
  // ===========================================================
  def q21TopCustomers(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders")
    val lineitem = t(spark, dir, "lineitem")
    // push the aggregation below the fact-fact join: revenue is additive, so
    // pre-aggregating lineitem per l_orderkey shrinks the shuffle from
    // line-item cardinality to order cardinality (exact: decimal sums are
    // associative), and the join probes ~4x fewer rows
    val perOrder = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(discPriceL).as("order_rev"), count(lit(1)).as("order_items"))
    perOrder
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg((sum(col("order_rev")).cast("double") / lit(10000.0)).as("revenue"),
        sum(col("order_items")).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  val q21Sql: String =
    s"""SELECT c_custkey, c_name,
      | CAST(SUM($discPriceLSql) AS DOUBLE) / 10000.0 AS revenue,
      | COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q22 — revenue by nation within a region (TPC-H Q5 shape): 5-way join
  // through broadcast dims with a date-range filter
  // ===========================================================
  def q22RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(spark, dir, "nation")
    val customer = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val lineitem = t(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(discPrice).cast("decimal(30,4)").cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  val q22Sql: String =
    s"""SELECT n_name,
      | CAST(CAST(SUM($discPriceSql) AS DECIMAL(30,4)) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_items
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      | AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY n_name ORDER BY n_name""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q23 — per-supplier running totals (window functions with unique
  // tie-break ordering)
  // ===========================================================
  def q23RunningWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    t(spark, dir, "lineitem")
      .filter(col("l_suppkey") <= 3)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_qty",
        sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "l_quantity", "running_qty")
      .orderBy("l_suppkey", "rn")
  }

  val q23Sql: String =
    """SELECT l_suppkey,
      | ROW_NUMBER() OVER w AS rn, l_orderkey, l_linenumber, l_quantity,
      | SUM(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      |FROM lineitem WHERE l_suppkey <= 3
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
      |ORDER BY l_suppkey, rn""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q24 — order-priority counts with EXISTS semi-join (TPC-H Q4 shape)
  // ===========================================================
  def q24OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    // EXISTS: lineitems shipped after 1997-06-01 mark "late" orders
    val lateKeys = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
      .select("l_orderkey").distinct()
    orders.join(lateKeys, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q24Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      | AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |   AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q25 — ROLLUP subtotals (returnflag → linestatus hierarchy): one pass
  // over the fact table produces per-(flag,status) rows, per-flag
  // subtotals, and the grand total. Spark expands the grouping sets
  // BEFORE the exchange, so partial aggregation still combines map-side —
  // the shuffle carries (#keys × #levels) partial rows, not the fact
  // table. Subtotal rows are disambiguated by grouping_id (bit per
  // column, first column = MSB in both engines) and keys are coalesced
  // to 'ALL' so no NULL ordering semantics leak into the compare.
  // ===========================================================
  def q25RollupPricing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(30,4)").cast("double").as("sum_qty"),
        sum(discPrice).cast("decimal(30,4)").cast("double").as("sum_disc_price"))
      .select(
        col("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_items"), col("sum_qty"), col("sum_disc_price"))
      .orderBy("gid", "returnflag", "linestatus")

  val q25Sql: String =
    s"""SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       | COALESCE(l_returnflag, 'ALL') AS returnflag,
       | COALESCE(l_linestatus, 'ALL') AS linestatus,
       | COUNT(*) AS n_items,
       | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(30,4)) AS DOUBLE) AS sum_qty,
       | CAST(CAST(SUM($discPriceSql) AS DECIMAL(30,4)) AS DOUBLE) AS sum_disc_price
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY gid, returnflag, linestatus""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q26 — blocked fuzzy self-join (entity-resolution move): candidate
  // pairs come ONLY from equal blocking keys (the name's noun token), so
  // the quadratic edit-distance predicate runs inside blocks instead of
  // across the full n² cross product — the standard blocking trick that
  // keeps fuzzy matching feasible at scale. The name table is a groupBy
  // of the fact table (distinct names ≪ rows), so the self-join is a
  // broadcast; n_pairs weights each surviving name pair back to fact
  // cardinality. levenshtein is the classic DP edit distance in both
  // engines.
  // ===========================================================
  val FuzzyMaxDist = 4

  def q26FuzzyNameMatch(spark: SparkSession, dir: String): DataFrame = {
    val names = t(spark, dir, "part")
      .groupBy("p_name").agg(count(lit(1)).as("cnt"))
      .withColumn("noun", split(col("p_name"), " ").getItem(1))
    names.as("x")
      .join(broadcast(names.as("y")),
        col("x.noun") === col("y.noun") && col("x.p_name") < col("y.p_name"))
      .withColumn("dist", levenshtein(col("x.p_name"), col("y.p_name")))
      .filter(col("dist") <= FuzzyMaxDist)
      .select(
        col("x.p_name").as("a"), col("y.p_name").as("b"), col("dist"),
        (col("x.cnt") * col("y.cnt")).as("n_pairs"))
      .orderBy("a", "b")
  }

  val q26Sql: String =
    s"""WITH names AS (SELECT p_name, COUNT(*) AS cnt,
       |  split_part(p_name, ' ', 2) AS noun FROM part GROUP BY p_name)
       |SELECT x.p_name AS a, y.p_name AS b,
       | levenshtein(x.p_name, y.p_name) AS dist,
       | x.cnt * y.cnt AS n_pairs
       |FROM names x JOIN names y ON x.noun = y.noun AND x.p_name < y.p_name
       |WHERE levenshtein(x.p_name, y.p_name) <= $FuzzyMaxDist
       |ORDER BY a, b""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q27 — schema-on-read JSON extraction: the event payload (`props`) is
  // parsed with an EXPLICIT schema via from_json — one Jackson parse per
  // row projected down to the single needed field, no schema inference
  // pass over the corpus (inference is a full extra scan at 100 TB; a
  // declared schema also keeps the plan deterministic). Malformed rows
  // yield NULL (PERMISSIVE), which the aggregate counts separately.
  // ===========================================================
  def q27JsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_malformed"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        countDistinct(col("k")).as("uniq_k"))
      .orderBy("event_type")

  val q27Sql: String =
    """WITH e AS (SELECT event_type,
      |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed,
      | CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
      | COUNT(DISTINCT k) AS uniq_k
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q28 — pivot (cohort × event-type count matrix) with an EXPLICIT value
  // list: Spark's pivot without one runs a distinct-values job first — an
  // extra corpus scan at 100 TB and a nondeterministic column order; the
  // declared list makes the plan a single pass and the schema stable.
  // Underneath it's one hash aggregation keyed on cohort with per-type
  // conditional counts — map-side combinable, one shuffle.
  // ===========================================================
  val PivotEventTypes = Seq("click", "error", "purchase", "signup", "view")

  def q28Pivot(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = t(spark, dir, "events")
      .withColumn("cohort", pmod(col("user_id"), lit(8)))
      .groupBy("cohort")
      .pivot("event_type", PivotEventTypes)
      .agg(count(lit(1)))
    PivotEventTypes.foldLeft(pivoted)((df, c) =>
        df.withColumn(c, coalesce(col(c), lit(0L))))
      .orderBy("cohort")
  }

  val q28Sql: String = {
    val cols = PivotEventTypes.map(t =>
      s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS \"$t\"")
      .mkString(", ")
    s"""SELECT user_id % 8 AS cohort, $cols
       |FROM events GROUP BY user_id % 8 ORDER BY cohort""".stripMargin.replace("\n", " ")
  }

  // ===========================================================
  // q29 — GROUPING SETS with NON-hierarchical sets ((flag), (status)):
  // independent subtotals along two dimensions in ONE pass — the shape
  // ROLLUP (q25) cannot express (rollup only nests). Spark expands the
  // sets before the exchange exactly like rollup/cube, so the shuffle
  // carries (#flags + #statuses) partial rows per map task, never the
  // fact table — at 100 TB this is two GROUP BYs for the price of one
  // scan. grouping_id disambiguates which dimension a row subtotals.
  // ===========================================================
  def q29GroupingSets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(30,4)").cast("double").as("sum_qty"),
        sum(discPrice).cast("decimal(30,4)").cast("double").as("sum_disc_price"))
      .select(
        col("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_items"), col("sum_qty"), col("sum_disc_price"))
      .orderBy("gid", "returnflag", "linestatus")

  val q29Sql: String =
    s"""SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       | COALESCE(l_returnflag, 'ALL') AS returnflag,
       | COALESCE(l_linestatus, 'ALL') AS linestatus,
       | COUNT(*) AS n_items,
       | CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(30,4)) AS DOUBLE) AS sum_qty,
       | CAST(CAST(SUM($discPriceSql) AS DECIMAL(30,4)) AS DOUBLE) AS sum_disc_price
       |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
       |ORDER BY gid, returnflag, linestatus""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q73 — "waiting suppliers" (TPC-H Q21 shape): suppliers with a returned
  // line on a multi-supplier order where ANOTHER supplier on the same
  // order stayed clean — the classic correlated-EXISTS query. Executed
  // DECORRELATED: one (order, supplier) pre-aggregation, one per-order
  // rollup of it, one equi-join back — the correlated subquery never
  // executes per row, which is the difference between O(n) and O(n·k) at
  // 100 TB. Both per-order frames share the l_orderkey key, so the join
  // lines up with the rollup's partitioning; the supplier dimension
  // broadcasts.
  // ===========================================================
  def q73WaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val supplier = t(spark, dir, "supplier")
    // partition by l_orderkey ONCE: hash(orderkey) clusters the
    // (orderkey, suppkey) groups too, so the aggregation reuses this
    // exchange — and so does the window below. One shuffle drives the
    // whole decorrelation.
    val ls = t(spark, dir, "lineitem")
      .repartition(col("l_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("ret"))
    // the per-order clean count rides a window over the SAME frame instead
    // of a rollup + self-join: the one l_orderkey shuffle serves both the
    // "exists another clean supplier" predicate and the candidate rows —
    // the decorrelated Q21 with the order-side pass fused away
    val wOrder = Window.partitionBy("l_orderkey")
    // per-suppkey pre-count keeps the heavy aggregation on the join KEY
    // side; the final rollup groups by s_name (the oracle's Q21 grain) —
    // distinct suppkeys may share a name in replicated/test corpora, and
    // grouping by key where the oracle groups by name silently diverges
    // the moment names collide
    ls.withColumn("n_clean", sum(lit(1L) - col("ret")).over(wOrder))
      .filter(col("ret") === 1L && col("n_clean") >= 1L)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait_k"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum("numwait_k").as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(15)
  }

  /** Oracle: the correlated-EXISTS formulation the dataflow decorrelates. */
  val q73Sql: String =
    """WITH ls AS (SELECT l_orderkey, l_suppkey,
      |  MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
      | FROM lineitem GROUP BY l_orderkey, l_suppkey)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM ls l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.ret = 1
      | AND EXISTS (SELECT 1 FROM ls l2 WHERE l2.l_orderkey = l1.l_orderkey
      |   AND l2.l_suppkey <> l1.l_suppkey AND l2.ret = 0)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 15""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q78 — MERGE INTO as a dataflow (the lakehouse upsert): apply a batch
  // of per-customer spend updates (aggregated from orders) onto the
  // customer snapshot. Full-outer join on the key + an action matrix —
  // matched rows update the balance in exact cents, unmatched targets
  // carry over, unmatched sources would insert. Output is the changelog
  // summary per (segment, action). Scale path: the delta aggregates
  // BEFORE the join (orders-cardinality -> customer-cardinality), the
  // join is one shuffle on the merge key, and the matrix is pure
  // codegen'd projection — the same shape as the control plane's
  // expected⋈actual reconcile (q09), applied to the data plane.
  // ===========================================================
  def q78MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("bal100"))
    // the update batch: one ingestion window of orders (so unmatched
    // customers exercise the carry branch), plus a deterministic
    // "new signup" slice keyed OUTSIDE the snapshot's key space (the
    // insert branch) — the three-way matrix is real, not vacuous
    val batch = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    val delta = batch
      .withColumn("k",
        when(col("o_orderkey") % 97 === 0, col("o_custkey") + 10000000L)
          .otherwise(col("o_custkey")))
      .groupBy(col("k").as("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("spend100"),
        count(lit(1)).as("n_orders"))
    customer
      .join(delta, col("c_custkey") === col("o_custkey"), "full_outer")
      .withColumn("action",
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "update")
          .when(col("c_custkey").isNotNull, "carry")
          .otherwise("insert"))
      .withColumn("new_bal100",
        when(col("action") === "update", col("bal100") + col("spend100"))
          .when(col("action") === "carry", col("bal100"))
          .otherwise(col("spend100")))
      .groupBy(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"), col("action"))
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(col("n_orders"), lit(0L))).cast("long").as("n_applied"),
        (sum(col("new_bal100")).cast("double") / lit(100.0)).as("total_balance"))
      .orderBy("segment", "action")
  }

  val q78Sql: String =
    """WITH delta AS (SELECT
      |  CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 10000000 ELSE o_custkey END AS o_custkey,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend100,
      |  COUNT(*) AS n_orders
      | FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY 1),
      | m AS (SELECT c_custkey, c_mktsegment,
      |   CAST(round(c_acctbal * 100) AS BIGINT) AS bal100, o_custkey, spend100, n_orders
      |  FROM customer FULL OUTER JOIN delta ON c_custkey = o_custkey),
      | a AS (SELECT *,
      |   CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'update'
      |    WHEN c_custkey IS NOT NULL THEN 'carry' ELSE 'insert' END AS action FROM m),
      | b AS (SELECT *,
      |   CASE WHEN action = 'update' THEN bal100 + spend100
      |    WHEN action = 'carry' THEN bal100 ELSE spend100 END AS new_bal100 FROM a)
      |SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment, action, COUNT(*) AS n_rows,
      | CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS n_applied,
      | CAST(SUM(new_bal100) AS DOUBLE) / 100.0 AS total_balance
      |FROM b GROUP BY segment, action ORDER BY segment, action""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q86 — fixed-point PageRank over the customer⇄supplier trade graph
  // (who-buys-from-whom via orders ⋈ lineitem): iterative graph analytics
  // as a dataflow. Three Lloyd-style synchronous rounds of
  //   r' = 0.15·S + 0.85·Σ_in (r DIV outdeg)
  // in EXACT integer fixed point (ranks scaled by 10^6; integer division
  // truncates deterministically in both engines), so the oracle — the
  // same three rounds as unrolled SQL CTEs — hash-matches bit-for-bit.
  // Scale path: the degree-annotated edge table materializes ONCE
  // (localCheckpoint) partitioned by src; each round is one co-partitioned
  // join (ranks ⋈ edges on src) + one map-side-combined sum on dst — the
  // Pregel pattern without 10 stages of lineage growth. The undirected
  // doubling makes every node reachable, so no dangling-mass term.
  // ===========================================================
  val PrIters = 3
  val PrScale = 1000000L
  val SuppOffset = 10000000L
  // Broadcast the per-round rank table only while the graph's node count
  // stays under this cap. A rank row is two longs (~50 B as an unsafe row
  // with overhead): 4M nodes ≈ 200 MB broadcast — the upper edge of what a
  // driver should ship per round; past it the rank joins fall back to
  // co-partitioned shuffle joins. Same order as q48's 4M union-find edge
  // gate.
  val PrBroadcastNodeCap = 4000000L

  def q86PageRank(spark: SparkSession, dir: String): DataFrame =
    q86PageRank(spark, dir, PrBroadcastNodeCap)

  /** Cap-parameterized core — PlanSpec drives `broadcastNodeCap = 0` to
    * assert the over-cap shuffle-join variant produces the identical
    * result and plan shape without broadcast hints, and
    * `releaseCaches = false` to keep the final round's plan inspectable
    * (the release path checkpoints the node-sized result, which hides the
    * round shape behind a LogicalRDD). */
  def q86PageRank(spark: SparkSession, dir: String, broadcastNodeCap: Long,
      releaseCaches: Boolean = true): DataFrame = {
    // lineitem ⋈ orders is fact-to-fact: the 2-column orders projection is
    // tiny at test SFs but grows linearly with the data, so a hardcoded
    // broadcast() hint would OOM the driver at 100×. No hint: AQE promotes
    // the shuffle join to broadcast at runtime when the projection's actual
    // size is under spark.sql.autoBroadcastJoinThreshold, and keeps the
    // shuffle join when it isn't — the size gate lives in the engine, where
    // the runtime statistics are.
    val trade = t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), (col("l_suppkey") + SuppOffset).as("supp"))
      .distinct()
      // materialize the distinct pair set ONCE — the degree aggs and the
      // half-edge build below reference it three times
      .localCheckpoint()
    // The undirected graph is NEVER materialized: instead of doubling trade
    // into 2|E| rows, joining degrees onto them, and checkpointing 2|E|×3
    // columns, keep the |E| directed half with BOTH endpoint degrees
    // attached and emit the two directions per round map-side (explode of a
    // 2-struct array). Halves the checkpoint and replaces the 2|E|-row
    // degree shuffle join with two node-sized aggregations AQE broadcasts.
    val degC = trade.groupBy("cust").agg(count(lit(1)).as("degc"))
    val degS = trade.groupBy("supp").agg(count(lit(1)).as("degs"))
    // The node-rank table is orders of magnitude smaller than the edge
    // table (nodes ≪ edges in any dense graph), so broadcasting it per
    // round is usually right — but nodes still grow linearly with data,
    // and a multi-GB broadcast repeated every round kills the driver. So
    // the hint is GATED on the driver-known node count (the q48/q41
    // adaptive pattern): the degree aggregations are node-sized and
    // scan the checkpointed pair set, so counting them here is cheap.
    // Past the cap the SAME loop body runs as shuffle joins — a runtime
    // decision, not a code edit. ONE job: both distinct-node counts come
    // from a single aggregation over the checkpointed pair set instead of
    // two sequential count() jobs (each a full scan + its planning gap).
    val nodeCountRow = trade.agg(
      countDistinct(col("cust")), countDistinct(col("supp"))).head()
    val nodeCount = nodeCountRow.getLong(0) + nodeCountRow.getLong(1)
    val gateBroadcast = nodeCount <= broadcastNodeCap
    val half = trade.join(degC, "cust").join(degS, "supp").localCheckpoint()
    // Each round reads rank(cust) and rank(supp) for every edge — HOW it
    // reads them is gated on the same node count as the broadcast hint:
    //  - UNDER the cap both probes are broadcast hash joins, so the round
    //    makes ONE pass over the edge checkpoint and emits each edge's two
    //    contributions map-side via a 2-struct explode (zero edge
    //    exchanges, one edge scan).
    //  - PAST the cap a chained double join would drag the EDGE-sized
    //    intermediate through a second exchange every round. Instead the
    //    round splits into two single-key legs — (edges ⋈ ranks on cust →
    //    contribute to supp) and (edges ⋈ ranks on supp → contribute to
    //    cust) — whose union feeds the inflow aggregation: the same
    //    contribution multiset, but each leg joins on exactly ONE key, so
    //    the edge table is PERSISTED PRE-PARTITIONED per key (persist, not
    //    localCheckpoint — a checkpoint under AQE reports Unknown
    //    partitioning, while AQE may not change a cached plan's output
    //    partitioning by default) and only the node-sized rank table is
    //    exchanged per round; edges shuffle ZERO times after setup.
    lazy val (halfC, halfS) = {
      import org.apache.spark.storage.StorageLevel
      val c = half.repartition(col("cust")).persist(StorageLevel.MEMORY_AND_DISK)
      val s = half.repartition(col("supp")).persist(StorageLevel.MEMORY_AND_DISK)
      c.count(); s.count() // materialize before the rounds start
      (c, s)
    }
    var ranks = degC.select(col("cust").as("node"), lit(PrScale).as("rank"))
      .union(degS.select(col("supp").as("node"), lit(PrScale).as("rank")))
    for (_ <- 1 to PrIters) {
      val contribs =
        if (gateBroadcast) {
          // ONE reference to the rank table per round: emit each edge's two
          // directed halves map-side FIRST (explode of a 2-struct array),
          // then a single broadcast probe src→rank. NO per-round
          // checkpoint — all rounds fuse into the FINAL job as PrIters
          // nested node-sized broadcast builds instead of PrIters eager
          // checkpoint jobs plus their driver planning gaps. The single
          // reference is load-bearing: a double-probe formulation (rank
          // joined at both endpoints) embeds the whole previous round's
          // subtree under TWO BroadcastExchanges that do NOT canonicalize
          // equal, so the un-checkpointed plan doubled per round
          // (measured: 28 exchanges, 0 reused) — same contribution
          // multiset either way, same integer math per directed edge.
          half
            .select(explode(array(
              struct(col("cust").as("src"), col("supp").as("dst"), col("degc").as("outdeg")),
              struct(col("supp").as("src"), col("cust").as("dst"), col("degs").as("outdeg")))).as("e"))
            .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.outdeg").as("outdeg"))
            .join(broadcast(ranks).withColumnRenamed("node", "src"), "src")
            .select(col("dst"), expr("rank DIV outdeg").as("contrib"))
        } else {
          // shuffle mode keeps the per-round checkpoint: the rank subtree
          // is referenced through two DIFFERENT single-key joins (no
          // exchange reuse possible), so without materialization each
          // round would compute its predecessor twice
          val ckpt = ranks.localCheckpoint()
          halfC
            .join(ckpt.select(col("node").as("cust"), col("rank").as("rankc")), "cust")
            .select(col("supp").as("dst"), expr("rankc DIV degc").as("contrib"))
            .union(halfS
              .join(ckpt.select(col("node").as("supp"), col("rank").as("ranks_")), "supp")
              .select(col("cust").as("dst"), expr("ranks_ DIV degs").as("contrib")))
        }
      ranks = contribs
        .groupBy("dst")
        .agg(sum(col("contrib")).as("inflow"))
        .select(col("dst").as("node"),
          (lit(150L * PrScale / 1000L) + expr("850 * inflow DIV 1000")).as("rank"))
    }
    // final top-20 via orderBy().limit(): plans as TakeOrderedAndProject
    // (per-partition bounded heap + driver merge of 20) — an unpartitioned
    // row_number window here would instead drag the whole node-sized rank
    // table through ONE task's sort. The rank window below runs AFTER the
    // limit, over exactly 20 rows.
    // shuffle mode holds 2×|E| of cache (the pre-partitioned copies) on
    // top of half's 1×|E| checkpoint; checkpoint the final node-sized
    // ranks so both edge caches release before this query returns instead
    // of squatting on executor storage for the rest of the session
    if (!gateBroadcast && releaseCaches) {
      ranks = ranks.localCheckpoint()
      halfC.unpersist(blocking = false)
      halfS.unpersist(blocking = false)
    }
    val top20 = ranks
      .withColumn("kind", when(col("node") >= SuppOffset, "supplier").otherwise("customer"))
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
    top20
      .withColumn("pos", row_number().over(Window.orderBy(col("rank").desc, col("node"))))
      .select(col("pos"), col("kind"),
        when(col("node") >= SuppOffset, col("node") - SuppOffset).otherwise(col("node")).as("id"),
        col("rank"))
      .orderBy("pos")
  }

  val q86Sql: String = {
    val rounds = (1 to PrIters).map { i =>
      s""" r$i AS (SELECT e.dst AS node,
         |  ${150L * PrScale / 1000L} + 850 * SUM(r.rank // e.outdeg) // 1000 AS rank
         | FROM e2 e JOIN r${i - 1} r ON e.src = r.node GROUP BY e.dst)""".stripMargin
    }.mkString(",")
    s"""WITH trade AS (SELECT DISTINCT o_custkey AS cust, l_suppkey + $SuppOffset AS supp
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       | edges AS (SELECT cust AS src, supp AS dst FROM trade
       |  UNION ALL SELECT supp, cust FROM trade),
       | deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       | e2 AS (SELECT edges.src, edges.dst, deg.outdeg FROM edges JOIN deg USING (src)),
       | r0 AS (SELECT src AS node, $PrScale AS rank FROM deg),
       |$rounds,
       | fin AS (SELECT node, rank,
       |   CASE WHEN node >= $SuppOffset THEN 'supplier' ELSE 'customer' END AS kind,
       |   CASE WHEN node >= $SuppOffset THEN node - $SuppOffset ELSE node END AS id,
       |   ROW_NUMBER() OVER (ORDER BY rank DESC, node) AS pos
       |  FROM r$PrIters)
       |SELECT pos, kind, id, CAST(rank AS BIGINT) AS rank FROM fin WHERE pos <= 20
       |ORDER BY pos""".stripMargin.replace("\n", " ")
  }

  // ===========================================================
  // q87 — data-quality constraint audit (the Deequ/great-expectations
  // pass a training pipeline runs before ingestion): completeness,
  // uniqueness, domain membership, range and referential sanity for
  // lineitem — ALL constraints evaluated in ONE scan as conditional
  // aggregates, no per-constraint passes. Output is one row per
  // constraint (name, checked, violations, pass) — bounded, diff-able,
  // and the gate a scheduler can branch on.
  // ===========================================================
  def q87QualityAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val n = count(lit(1))
    val audited = li.agg(
      n.as("n"),
      sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("null_orderkey"),
      sum(when(col("l_quantity") <= 0 || col("l_quantity") > 50, 1L).otherwise(0L))
        .as("qty_range"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L).otherwise(0L))
        .as("disc_range"),
      sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L))
        .as("flag_domain"),
      sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("price_positive"))
    val dupKeys = li.groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L)).cast("long")
        .as("dup_pk"), count(lit(1)).as("n_pk"))
    // one row per constraint: name, rows checked, violations, pass. The
    // five single-pass constraints pivot with ONE stack() directly over the
    // scan aggregate, and the pk check unions in as its own 1-row branch —
    // no crossJoin. (History: a unionByName of per-constraint selects
    // re-evaluated the aggregates per branch — 12 static corpus scans; the
    // r10 fix stacked over audited×dupKeys, but that BroadcastNestedLoopJoin
    // + Generate added two query stages and a broadcast of per-query fixed
    // latency, ~2× wall at sf0.1. Two independent aggregate branches and a
    // 6-row union is both the fastest and the scale shape: each branch is
    // one scan + partial aggregation, nothing joins.)
    val scanConstraints = Seq(
      ("orderkey_not_null", "null_orderkey"),
      ("quantity_in_(0,50]", "qty_range"),
      ("discount_in_[0,0.1]", "disc_range"),
      ("returnflag_in_domain", "flag_domain"),
      ("extendedprice_positive", "price_positive"))
    val stackArgs = scanConstraints.map { case (name, viol) =>
      s"'$name', CAST(n AS BIGINT), CAST($viol AS BIGINT)"
    }.mkString(", ")
    audited
      .select(expr(s"stack(${scanConstraints.size}, $stackArgs) " +
        "AS (constraint, checked, violations)"))
      .unionByName(dupKeys.select(
        lit("pk_unique(orderkey,linenumber)").as("constraint"),
        col("n_pk").cast("long").as("checked"),
        col("dup_pk").cast("long").as("violations")))
      .withColumn("pass", col("violations") === 0L)
      .orderBy("constraint")
  }

  val q87Sql: String =
    """WITH a AS (SELECT COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderkey,
      |  CAST(SUM(CASE WHEN l_quantity <= 0 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS qty_range,
      |  CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS disc_range,
      |  CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT) AS flag_domain,
      |  CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS price_positive
      | FROM lineitem),
      | pk AS (SELECT CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT) AS dup_pk,
      |   COUNT(*) AS n_pk
      |  FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)),
      | r AS (SELECT * FROM a, pk)
      |SELECT c.constraint, c.checked, c.violations, c.violations = 0 AS pass FROM (
      | SELECT 'orderkey_not_null' AS constraint, n AS checked, null_orderkey AS violations FROM r
      | UNION ALL SELECT 'quantity_in_(0,50]', n, qty_range FROM r
      | UNION ALL SELECT 'discount_in_[0,0.1]', n, disc_range FROM r
      | UNION ALL SELECT 'returnflag_in_domain', n, flag_domain FROM r
      | UNION ALL SELECT 'extendedprice_positive', n, price_positive FROM r
      | UNION ALL SELECT 'pk_unique(orderkey,linenumber)', n_pk, dup_pk FROM r) c
      |ORDER BY c.constraint""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q88 — referential-integrity audit across the star schema: orphan
  // facts and dangling foreign keys surfaced with LEFT ANTI joins (the
  // partition-diff move of §2.7, applied to data-plane integrity). Each
  // check is one anti-join aggregated to a count — at 100 TB these run as
  // shuffle-free broadcast anti-joins for dimension keys and one shuffle
  // for fact-fact. Output: one row per FK edge.
  // ===========================================================
  def q88RefIntegrity(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val ord = t(spark, dir, "orders")
    val cust = t(spark, dir, "customer")
    val supp = t(spark, dir, "supplier")
    val part = t(spark, dir, "part")
    def orphans(fact: DataFrame, fk: String, dim: DataFrame, pk: String): DataFrame =
      fact.select(col(fk)).join(dim.select(col(pk)), col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("orphans"))
    Seq(
      ("lineitem.l_orderkey->orders", orphans(li, "l_orderkey", ord, "o_orderkey")),
      ("lineitem.l_partkey->part", orphans(li, "l_partkey", part, "p_partkey")),
      ("lineitem.l_suppkey->supplier", orphans(li, "l_suppkey", supp, "s_suppkey")),
      ("orders.o_custkey->customer", orphans(ord, "o_custkey", cust, "c_custkey")))
      .map { case (edge, df) => df.select(lit(edge).as("fk_edge"), col("orphans")) }
      .reduce(_.unionByName(_))
      .orderBy("fk_edge")
  }

  val q88Sql: String =
    """SELECT fk_edge, orphans FROM (
      | SELECT 'lineitem.l_orderkey->orders' AS fk_edge, COUNT(*) AS orphans
      |  FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      | UNION ALL SELECT 'lineitem.l_partkey->part', COUNT(*)
      |  FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
      | UNION ALL SELECT 'lineitem.l_suppkey->supplier', COUNT(*)
      |  FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
      | UNION ALL SELECT 'orders.o_custkey->customer', COUNT(*)
      |  FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
      |ORDER BY fk_edge""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q94 — Benford first-digit audit: the classic fraud / synthetic-data
  // screen — does the leading digit of order totals follow log10(1+1/d)?
  // Expected shares are hardcoded permille constants (the same integers in
  // both engines — no float log10 at query time); the statistic is the
  // same integer fixed-point chi-square as the q90 drift monitor. One
  // scan, nine-row histogram, exact oracle parity.
  // ===========================================================
  /** permille(log10(1 + 1/d)) for d = 1..9; sums to 1000 (300+176+...). */
  val BenfordPermille: Seq[Long] = Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)

  def q94BenfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val expCase = BenfordPermille.zipWithIndex
      .map { case (p, i) => s"WHEN d = ${i + 1} THEN ${p}L" }
      .mkString("CASE ", " ", " END")
    val h = t(spark, dir, "orders")
      .withColumn("d", expr("CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS BIGINT)"))
      .groupBy("d").agg(count(lit(1)).as("observed"))
      // ≤9 rows after the aggregation, referenced twice (histogram + total):
      // materialize once so the orders scan runs once, not per reference
      .localCheckpoint()
    h.crossJoin(broadcast(h.agg(sum("observed").cast("long").as("n"))))
      .withColumn("expected_millis", expr(s"($expCase) * n"))
      .withColumn("observed_millis", col("observed") * 1000L)
      .withColumn("chi2_contrib_millis", expr(
        "(observed_millis - expected_millis) * (observed_millis - expected_millis)" +
          " DIV (expected_millis * 1000)"))
      .select("d", "observed", "expected_millis", "chi2_contrib_millis")
      .orderBy("d")
  }

  val q94Sql: String = {
    val expCase = BenfordPermille.zipWithIndex
      .map { case (p, i) => s"WHEN d = ${i + 1} THEN $p" }
      .mkString("CASE ", " ", " END")
    s"""WITH h AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d,
       |  COUNT(*) AS observed FROM orders GROUP BY d),
       | t AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM h),
       | c AS (SELECT d, observed, ($expCase) * n AS expected_millis,
       |   observed * 1000 AS observed_millis FROM h, t)
       |SELECT d, observed, expected_millis,
       | (observed_millis - expected_millis) * (observed_millis - expected_millis)
       |   // (expected_millis * 1000) AS chi2_contrib_millis
       |FROM c ORDER BY d""".stripMargin.replace("\n", " ")
  }

  // ===========================================================
  // q96 — skyline / Pareto frontier: parts not strictly dominated on
  // (price minimize, size maximize) — the multi-objective shortlist
  // operator relational engines lack. Standard dominance: a ≺ b iff
  // price_a ≤ price_b ∧ size_a ≥ size_b with one strict. Executed in
  // phases that shrink before anything goes global:
  //   1. per-price reduction (keyed, parallel): only each price's max-size
  //      row can survive;
  //   2. BUCKETED pre-filter (price-range buckets, keyed window): a row
  //      beaten by a larger size at a lower-or-equal price WITHIN its
  //      bucket is already dominated — the global pass sees only bucket
  //      frontiers;
  //   3. the global running-max pass over those survivors (a window over
  //      ~#buckets × frontier-width rows, NOT the table).
  // Prices join in exact cents (the c100 move), so dominance and oracle
  // agree bit-for-bit.
  // ===========================================================
  def q96Skyline(spark: SparkSession, dir: String): DataFrame = {
    val pairs = t(spark, dir, "part")
      .select(col("p_partkey"), c100("p_retailprice").as("price100"),
        col("p_size").cast("long").as("size"))
    // phase 1: per-price max size (representative = lowest partkey among
    // ties) — the rn = 1 argmax, rewritten to the bounded-heap operator
    val w1 = Window.partitionBy("price100").orderBy(col("size").desc, col("p_partkey"))
    val perPrice = pairs
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1)
      .select(col("price100"), col("size"), col("p_partkey").as("rep"))
    // phase 2: within price buckets, drop rows beaten by an earlier
    // (cheaper-or-equal, bigger) row — keyed window, partition-parallel
    val bucket = (col("price100") / 1000L).cast("long")
    val wLocal = Window.partitionBy("bucket").orderBy(col("price100"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = perPrice.withColumn("bucket", bucket)
      .withColumn("lmax", max("size").over(wLocal))
      .filter(col("lmax").isNull || col("size") > col("lmax"))
    // phase 3: global pass over the bucket frontiers only
    val wGlobal = Window.orderBy(col("price100"))
      .rowsBetween(Window.unboundedPreceding, -1)
    local
      .withColumn("gmax", max("size").over(wGlobal))
      .filter(col("gmax").isNull || col("size") > col("gmax"))
      .select(col("rep").as("p_partkey"),
        (col("price100").cast("double") / 100.0).as("price"), col("size"))
      .orderBy("price100")
  }

  val q96Sql: String =
    """WITH pairs AS (SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price100,
      |  CAST(p_size AS BIGINT) AS size FROM part),
      | pp AS (SELECT price100, size, MIN(p_partkey) AS rep FROM pairs p
      |  WHERE size = (SELECT MAX(size) FROM pairs p2 WHERE p2.price100 = p.price100)
      |  GROUP BY price100, size),
      | g AS (SELECT price100, size, rep,
      |   MAX(size) OVER (ORDER BY price100 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS gmax
      |  FROM pp)
      |SELECT rep AS p_partkey, CAST(price100 AS DOUBLE) / 100.0 AS price, size
      |FROM g WHERE gmax IS NULL OR size > gmax ORDER BY price100""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q98 — robust outlier detection via median absolute deviation: per
  // returnflag, low-median of quantity, MAD around it, and the count of
  // rows beyond 3×MAD — the robust-statistics screen that mean/stddev
  // based z-scores fail on heavy tails. Exact medians WITHOUT a per-group
  // sort: quantity's value domain is tiny, so the histogram (group, value,
  // count) compresses the corpus to ≤|domain| rows per group and the
  // median is where the cumulative count crosses (n+1)/2 — a window over
  // dozens of rows, not 100 TB. The deviation histogram reuses the same
  // move. All integer; low-median (percentile_disc semantics) keeps both
  // engines bit-identical where interpolation would drift.
  // ===========================================================
  def q98MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_quantity").cast("long").as("qty"))
    def lowMedian(hist: DataFrame, valCol: String): DataFrame = {
      val w = Window.partitionBy("flag").orderBy(valCol)
      val wTot = Window.partitionBy("flag")
      hist
        .withColumn("cum", sum("cnt").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum("cnt").over(wTot))
        .filter(col("cum") * 2 >= col("tot") + 1)
        .groupBy("flag").agg(min(valCol).as("med_" + valCol))
    }
    // both histograms are (flags × distinct values)-row frames; checkpoint
    // them so their multiple consumers (median, deviation, final rollup)
    // don't each re-scan + re-aggregate lineitem — the un-materialized
    // lineage cost 5 corpus scans for a 3-row output
    val qHist = li.groupBy("flag", "qty").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val qMed = lowMedian(qHist, "qty")
    val devHist = qHist.join(qMed, "flag")
      .withColumn("dev", abs(col("qty") - col("med_qty")))
      .groupBy("flag", "dev").agg(sum("cnt").cast("long").as("cnt"))
      .localCheckpoint()
    val mad = lowMedian(devHist, "dev")
    devHist.join(mad, "flag").join(qMed, "flag")
      .groupBy(col("flag"), col("med_qty").as("median_qty"), col("med_dev").as("mad"))
      .agg(sum("cnt").cast("long").as("n"),
        sum(when(col("dev") > col("med_dev") * 3, col("cnt")).otherwise(0L))
          .cast("long").as("outliers"))
      .select("flag", "n", "median_qty", "mad", "outliers")
      .orderBy("flag")
  }

  val q98Sql: String =
    """WITH li AS (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
      | qh AS (SELECT flag, qty, COUNT(*) AS cnt FROM li GROUP BY flag, qty),
      | qc AS (SELECT flag, qty, cnt,
      |   SUM(cnt) OVER (PARTITION BY flag ORDER BY qty
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |   SUM(cnt) OVER (PARTITION BY flag) AS tot FROM qh),
      | qm AS (SELECT flag, MIN(qty) AS med_qty FROM qc WHERE cum * 2 >= tot + 1 GROUP BY flag),
      | dh AS (SELECT qh.flag, abs(qty - med_qty) AS dev, CAST(SUM(cnt) AS BIGINT) AS cnt
      |  FROM qh JOIN qm ON qh.flag = qm.flag GROUP BY qh.flag, dev),
      | dc AS (SELECT flag, dev, cnt,
      |   SUM(cnt) OVER (PARTITION BY flag ORDER BY dev
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |   SUM(cnt) OVER (PARTITION BY flag) AS tot FROM dh),
      | dm AS (SELECT flag, MIN(dev) AS med_dev FROM dc WHERE cum * 2 >= tot + 1 GROUP BY flag)
      |SELECT dh.flag, CAST(SUM(cnt) AS BIGINT) AS n, ANY_VALUE(med_qty) AS median_qty,
      | ANY_VALUE(med_dev) AS mad,
      | CAST(SUM(CASE WHEN dev > med_dev * 3 THEN cnt ELSE 0 END) AS BIGINT) AS outliers
      |FROM dh JOIN dm ON dh.flag = dm.flag JOIN qm ON dh.flag = qm.flag
      |GROUP BY dh.flag ORDER BY dh.flag""".stripMargin.replace("\n", " ")

  // ===========================================================
  // q102 — interval assignment through the band-join optimizer rule:
  // orders land in price tiers via a PLAIN theta join
  // (`price BETWEEN lo AND hi`) — the idiomatic formulation that planners
  // execute as a nested loop — and `RewriteRangeJoin` (GraftExtensions,
  // gated on spark.graft.rangeJoin.bucketWidth) turns it into the bucketed
  // equi-join q52 builds by hand. The USER-FACING query stays declarative;
  // the rule owns the scale mechanics. Exact cents arithmetic; the DuckDB
  // oracle runs the same plain band join (no rule — same rows by
  // construction, which is the point: the rewrite is semantics-free).
  // ===========================================================
  val TierCents = 5000000L // 50k-currency tiers over [0, 500k]
  val BandBucketWidth = 4000000L

  def q102PriceBand(spark0: SparkSession, dir: String): DataFrame = {
    // The rewrite rule reads the width conf at EVERY optimization — and each
    // new action on the returned frame (count(), write, …) builds a fresh
    // QueryExecution that re-optimizes. So the conf must stay set for the
    // frame's whole lifetime WITHOUT leaking into the caller's session: a
    // cloned session (same SparkContext, same extensions, isolated runtime
    // conf) carries the width; the caller's session never sees it, and any
    // later re-planning of this frame still finds the rule armed. A
    // set-then-restore scope would silently lose the rewrite on the second
    // action — the plan pinned while the conf was set is cached only on the
    // first QueryExecution.
    val spark = spark0.newSession()
    spark.conf.set(graft.plans.RewriteRangeJoin.WidthConf, BandBucketWidth.toString)
    // arm the rule on the private session regardless of how the parent was
    // built (GraftExtensions configs don't reach sessions created without
    // them); double-injection is a no-op — the rewritten join carries an
    // equality conjunct, which the rule explicitly leaves untouched
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RewriteRangeJoin
    val tiers = spark.range(10).select(col("id").as("tier"),
      (col("id") * TierCents).as("lo"), ((col("id") + 1) * TierCents - 1L).as("hi"))
    val oc = t(spark, dir, "orders")
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long").as("pc"))
    oc.join(tiers, col("pc") >= col("lo") && col("pc") <= col("hi"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_orders"),
        min("pc").as("min_cents"), max("pc").as("max_cents"),
        sum("pc").cast("long").as("total_cents"))
      .orderBy("tier")
  }

  val q102Sql: String =
    s"""WITH tiers AS (SELECT CAST(t AS BIGINT) AS tier, CAST(t AS BIGINT) * $TierCents AS lo,
       |  (CAST(t AS BIGINT) + 1) * $TierCents - 1 AS hi FROM range(10) r(t)),
       | oc AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS pc FROM orders)
       |SELECT tier, COUNT(*) AS n_orders, MIN(pc) AS min_cents, MAX(pc) AS max_cents,
       | CAST(SUM(pc) AS BIGINT) AS total_cents
       |FROM oc JOIN tiers ON pc >= lo AND pc <= hi
       |GROUP BY tier ORDER BY tier""".stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_price_band" -> (q102PriceBand _),
    "q98_mad_outliers" -> (q98MadOutliers _),
    "q96_skyline" -> (q96Skyline _),
    "q94_benford_audit" -> (q94BenfordAudit _),
    "q86_pagerank" -> (q86PageRank _),
    "q87_quality_audit" -> (q87QualityAudit _),
    "q88_ref_integrity" -> (q88RefIntegrity _),
    "q73_waiting_suppliers" -> (q73WaitingSuppliers _),
    "q78_merge_upsert" -> (q78MergeUpsert _),
    "q20_pricing_summary" -> (q20PricingSummary _),
    "q21_top_customers" -> (q21TopCustomers _),
    "q22_region_revenue" -> (q22RegionRevenue _),
    "q23_running_window" -> (q23RunningWindow _),
    "q24_order_priority" -> (q24OrderPriority _),
    "q25_rollup_pricing" -> (q25RollupPricing _),
    "q26_fuzzy_name_match" -> (q26FuzzyNameMatch _),
    "q27_json_extract" -> (q27JsonExtract _),
    "q28_pivot" -> (q28Pivot _),
    "q29_grouping_sets" -> (q29GroupingSets _))

  val oracles: Map[String, String] = Map(
    "q102_price_band" -> q102Sql,
    "q98_mad_outliers" -> q98Sql,
    "q96_skyline" -> q96Sql,
    "q94_benford_audit" -> q94Sql,
    "q86_pagerank" -> q86Sql,
    "q87_quality_audit" -> q87Sql,
    "q88_ref_integrity" -> q88Sql,
    "q73_waiting_suppliers" -> q73Sql,
    "q78_merge_upsert" -> q78Sql,
    "q20_pricing_summary" -> q20Sql,
    "q21_top_customers" -> q21Sql,
    "q22_region_revenue" -> q22Sql,
    "q23_running_window" -> q23Sql,
    "q24_order_priority" -> q24Sql,
    "q25_rollup_pricing" -> q25Sql,
    "q26_fuzzy_name_match" -> q26Sql,
    "q27_json_extract" -> q27Sql,
    "q28_pivot" -> q28Sql,
    "q29_grouping_sets" -> q29Sql)
}
