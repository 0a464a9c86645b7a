package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/**
 * Relational analytics over the TPC-H-ish star schema — the classic
 * warehouse query shapes (pricing rollup, dimension-star revenue,
 * per-group top-k, existential filter) expressed as the Spark plans
 * you'd want at 100 TB:
 *
 *  - Money math is EXACT: prices/discounts/taxes are 2-decimal values,
 *    so every aggregate runs in decimal (or scaled-integer long), never
 *    floating point — a reducer-order change can't flip a cent, and the
 *    engine matches any exact-arithmetic oracle bit-for-bit. Doubles
 *    appear only in final display columns derived deterministically
 *    from exact values.
 *  - Fact tables are filtered by sargable range predicates (pushed to
 *    the parquet scan), aggregated with partial aggregation (the
 *    exchange carries group cards, not rows), and joined to the tiny
 *    dimensions via explicit `broadcast()` — nation/region are O(100)
 *    rows at any scale factor. Fact-to-fact joins (lineitem⋈orders,
 *    orders⋈customer) stay shuffle hash joins on their keys and are
 *    pre-aggregated to the join key first, so the shuffled payload is
 *    the aggregate, not the raw fact table.
 *  - Per-group top-k uses the bounded-heap
 *    [[graft.functions.TopKPairMin]] aggregate: ≤k pairs per (group,
 *    map partition) on the exchange — never the low-cardinality window
 *    rank that funnels each group through one task.
 */
object Relational {

  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Pricing summary (reference shape: TPC-H Q1): per (returnflag,
    * linestatus) sums of quantity, base price, discounted price and
    * charge over lineitems shipped up to `cutoff` (inclusive).
    *
    * All four sums are exact decimal: qty/price/discount/tax are
    * 2-decimal values, so disc_price has ≤4 and charge ≤6 fractional
    * digits — each product is cast to a decimal wide enough to hold it
    * exactly before summing. One sargable scan filter, one
    * partial-agg'd groupBy of ~6 groups; the final DOUBLE casts are
    * exact-to-nearest renderings of equal decimals. */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame = {
    val disc1 = (lit(BigDecimal(1)) - dec2(col("l_discount")))
      .cast(DecimalType(4, 2))
    val tax1 = (lit(BigDecimal(1)) + dec2(col("l_tax")))
      .cast(DecimalType(4, 2))
    val discPrice = (dec2(col("l_extendedprice")) * disc1)
      .cast(DecimalType(24, 4))
    val charge = (discPrice * tax1).cast(DecimalType(30, 6))
    lineitem
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        dec2(col("l_quantity")).as("q"),
        dec2(col("l_extendedprice")).as("b"),
        discPrice.as("dp"), charge.as("ch"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("q")).cast("double").as("sum_qty"),
        sum(col("b")).cast("double").as("sum_base"),
        sum(col("dp")).cast("double").as("sum_disc_price"),
        sum(col("ch")).cast("double").as("sum_charge"),
        count(lit(1)).as("n_rows"))
  }

  /** Revenue by (region, nation) over orders placed in [from, until):
    * the star-join rollup. lineitem is pre-aggregated to l_orderkey
    * BEFORE the fact-fact joins (the shuffle carries one row per
    * order, not one per line), orders⋈customer are key-partitioned
    * hash joins, and nation/region ride in as explicit broadcasts.
    * Revenue is exact decimal, rendered as DOUBLE at the end. */
  def revenueByNation(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, nation: DataFrame,
                      region: DataFrame, from: String,
                      until: String): DataFrame = {
    val discPrice = (dec2(col("l_extendedprice")) *
      (lit(BigDecimal(1)) - dec2(col("l_discount"))).cast(DecimalType(4, 2)))
      .cast(DecimalType(24, 4))
    val perOrder = lineitem
      .select(col("l_orderkey"), discPrice.as("dp"))
      .groupBy("l_orderkey")
      .agg(sum(col("dp")).cast(DecimalType(34, 4)).as("order_rev"))
    val ordersIn = orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    perOrder
      .join(ordersIn, col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_regionkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(sum(col("order_rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .select("region", "nation", "revenue", "n_orders")
  }

  /** Top-k orders by revenue within each market segment. Revenue is the
    * scaled-integer long `cents(extendedprice) * (100 - pct(discount))`
    * (4 implied decimals — exact), so the per-segment ranking runs
    * through [[graft.functions.TopKPairMin]] on `(-revenue, orderkey)`:
    * a bounded heap per map partition, ≤k pairs per partition on the
    * exchange, no segment-wide window sort. Ties break to the smaller
    * orderkey. */
  def topOrdersPerSegment(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, k: Int): DataFrame = {
    val cents = (dec2(col("l_extendedprice")) * lit(100)).cast(LongType)
    val discPct = (dec2(col("l_discount")) * lit(100)).cast(LongType)
    val perOrder = lineitem
      .select(col("l_orderkey"), (cents * (lit(100L) - discPct)).as("rs"))
      .groupBy("l_orderkey")
      .agg(sum(col("rs")).as("rev_scaled"))
    perOrder
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(graft.functions.TopKPairMin
        .topk(-col("rev_scaled"), col("o_orderkey"), k).as("picks"))
      .select(col("mktsegment"), posexplode(col("picks")).as(Seq("pos", "p")))
      .select(col("mktsegment"), col("p.id").as("o_orderkey"),
        (-col("p.score") / lit(10000.0)).as("revenue"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** Order counts per priority among orders with at least one deeply
    * discounted line (discount ≥ `minDiscount`): the existential-filter
    * shape. The probe is a LEFT SEMI join on the order key — the fact
    * table is filtered and projected to the key before the join, never
    * materialized per matching line, and the count aggregates with
    * partial aggregation over ~5 groups. */
  def orderPriorityCounts(orders: DataFrame, lineitem: DataFrame,
                          minDiscount: Double): DataFrame =
    orders
      .join(
        lineitem.filter(col("l_discount") >= minDiscount)
          .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))

  /** Customer order-count distribution (reference shape: TPC-H Q13):
    * how many customers placed exactly `c_count` orders — INCLUDING
    * the zero-order customers a naive inner join silently drops.
    *
    * Scale shape: orders is pre-aggregated to (custkey, n) FIRST, so
    * the customer⋈orders shuffle carries one aggregate row per
    * ordering customer, never the raw fact table; the left join keeps
    * no-order customers as n=0; the final distribution groupBy's
    * exchange is O(distinct counts). Both joins/aggs are plain
    * hash-partitioned equi-shapes that hold at any scale factor. */
  def customerDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .join(
        orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))

  /** Top-k customers by revenue from RETURNED items over orders placed
    * in [from, until) (reference shape: TPC-H Q10). Revenue is the
    * exact scaled-integer long `cents(price) · (100 − pct(discount))`
    * (4 implied decimals), so ordering can't be perturbed by float
    * summation order. Scale shape: the returned lines are filtered and
    * pre-aggregated to l_orderkey BEFORE the fact-fact joins (the
    * shuffles carry one row per order / per customer, not raw lines),
    * nation rides in as a broadcast, and the global top-k is a
    * TakeOrderedAndProject — per-partition bounded heaps, ≤k rows per
    * partition to the driver, never a global sort. Ties break to the
    * smaller custkey. */
  def returnedRevenueTopCustomers(lineitem: DataFrame, orders: DataFrame,
                                  customer: DataFrame, nation: DataFrame,
                                  from: String, until: String,
                                  k: Int): DataFrame = {
    val cents = (dec2(col("l_extendedprice")) * lit(100)).cast(LongType)
    val discPct = (dec2(col("l_discount")) * lit(100)).cast(LongType)
    val perOrder = lineitem
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), (cents * (lit(100L) - discPct)).as("rs"))
      .groupBy("l_orderkey")
      .agg(sum(col("rs")).as("order_rev"))
    val ordersIn = orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    perOrder
      .join(ordersIn, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("order_rev")).as("rev_scaled"),
        count(lit(1)).as("n_orders"))
      .join(customer.select("c_custkey", "c_name", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        (col("rev_scaled") / lit(10000.0)).as("revenue"), col("n_orders"),
        col("rev_scaled"))
      .orderBy(col("rev_scaled").desc, col("c_custkey"))
      .limit(k)
      .drop("rev_scaled")
  }

  /** Top supplier(s) by revenue over lineitems shipped in [from, until)
    * (reference shape: TPC-H Q15) — ALL suppliers tied at the maximum,
    * like the spec's view formulation. Revenue is the exact
    * scaled-integer long, so the max and the tie comparison are exact.
    * Scale shape: one partially-aggregated groupBy(suppkey) with the
    * ship-date range pushed to the scan; the global max is a one-row
    * aggregate broadcast back as a join filter (never a global sort);
    * the supplier name join touches only the winners. */
  def topSupplierByRevenue(lineitem: DataFrame, supplier: DataFrame,
                           from: String, until: String): DataFrame = {
    val cents = (dec2(col("l_extendedprice")) * lit(100)).cast(LongType)
    val discPct = (dec2(col("l_discount")) * lit(100)).cast(LongType)
    val perSupp = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select(col("l_suppkey"), (cents * (lit(100L) - discPct)).as("rs"))
      .groupBy("l_suppkey")
      .agg(sum(col("rs")).as("rev_scaled"))
    perSupp
      .join(broadcast(perSupp.agg(max(col("rev_scaled")).as("mx"))),
        col("rev_scaled") === col("mx"))
      .join(supplier.select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_scaled") / lit(10000.0)).as("total_revenue"))
  }

  /** Forecast revenue change (reference shape: TPC-H Q6): the revenue
    * that would have been earned had discounts in [discLo, discHi] on
    * small orders (quantity < maxQty) shipped in [from, until) been
    * eliminated — `sum(extendedprice · discount)` over the qualifying
    * lines, exact decimal.
    *
    * Scale shape: this is the pure scan-aggregate — every predicate is
    * sargable and reaches the parquet scan as a pushed filter (shipdate
    * range, discount band, quantity cap), the scan reads only the three
    * columns the expression needs, and the aggregation collapses
    * map-side to ONE row per partition before a single-row exchange.
    * At 100 TB this query is I/O-bound by design; there is nothing for
    * the engine to shuffle. */
  def forecastRevenueChange(lineitem: DataFrame, from: String, until: String,
                            discLo: Double, discHi: Double,
                            maxQty: Double): DataFrame = {
    val rev = (dec2(col("l_extendedprice")) * dec2(col("l_discount")))
      .cast(DecimalType(24, 4))
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp") &&
        dec2(col("l_discount")) >= lit(BigDecimal(discLo)) &&
        dec2(col("l_discount")) <= lit(BigDecimal(discHi)) &&
        col("l_quantity") < maxQty)
      .agg(sum(rev).cast(DecimalType(34, 4)).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Large-quantity orders (reference shape: TPC-H Q18): the top-k
    * orders whose total line quantity exceeds `minQty`, with their
    * customer. Quantities are 2-decimal values summed exactly in
    * decimal; the ranking key is the scaled-integer total quantity with
    * orderkey as the deterministic tie-break.
    *
    * Scale shape: lineitem pre-aggregates to l_orderkey FIRST and the
    * `HAVING sum(qty) > minQty` filter runs on the aggregate, so the
    * orders/customer joins see only the (rare) qualifying orders — at
    * TPC-H selectivity that is ~1e-6 of the fact table. The global
    * top-k is a TakeOrderedAndProject: per-partition bounded heaps,
    * ≤k rows per partition to the driver, never a global sort. */
  def largeQuantityOrders(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, minQty: Double,
                          k: Int): DataFrame = {
    val qtyCenti = (dec2(col("l_quantity")) * lit(100)).cast(LongType)
    val perOrder = lineitem
      .select(col("l_orderkey"), qtyCenti.as("qc"))
      .groupBy("l_orderkey")
      .agg(sum(col("qc")).as("qty_scaled"))
      .filter(col("qty_scaled") > (BigDecimal(minQty) * 100).toLong)
    perOrder
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate",
        "o_totalprice"), col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), dec2(col("o_totalprice")).cast("double")
          .as("total_price"),
        (col("qty_scaled") / lit(100.0)).as("sum_qty"), col("qty_scaled"))
      .orderBy(col("qty_scaled").desc, col("o_orderkey"))
      .limit(k)
      .drop("qty_scaled")
  }

  /** Volume shipping between two nations per ship year (reference
    * shape: TPC-H Q7): revenue of lines a supplier in one of the two
    * nations shipped to a customer in the other, grouped by
    * (supplier nation, customer nation, year). Revenue is exact
    * decimal.
    *
    * Scale shape: supplier is TPC-H fact-sized (10k·SF), so
    * lineitem⋈supplier stays a key-partitioned shuffle hash join — the
    * supplier side filtered to the two nations FIRST (the shuffle
    * carries only qualifying suppliers' keys); orders⋈customer
    * likewise joins pre-projected key columns with the customer side
    * pre-filtered to the two nations. The nation name tables ride in
    * as two independently-aliased broadcasts. The final rollup is
    * O(2 × years) groups with map-side partial aggregation. */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame,
                     customer: DataFrame, supplier: DataFrame,
                     nation: DataFrame, nationA: String, nationB: String,
                     from: String, until: String): DataFrame = {
    val discPrice = (dec2(col("l_extendedprice")) *
      (lit(BigDecimal(1)) - dec2(col("l_discount"))).cast(DecimalType(4, 2)))
      .cast(DecimalType(24, 4))
    val nations = nation.select("n_nationkey", "n_name")
      .filter(col("n_name").isin(nationA, nationB))
    val suppN = supplier.select("s_suppkey", "s_nationkey")
      .join(broadcast(nations.withColumnRenamed("n_name", "supp_nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val custN = customer.select("c_custkey", "c_nationkey")
      .join(broadcast(nations.withColumnRenamed("n_name", "cust_nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "cust_nation")
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast(LongType).as("ship_year"),
        discPrice.as("dp"))
      .join(suppN, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custN, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "ship_year")
      .agg(sum(col("dp")).cast(DecimalType(34, 4)).cast("double")
        .as("revenue"), count(lit(1)).as("n_lines"))
  }

  /** National market share (reference shape: TPC-H Q8): per order
    * year, the share of `targetNation`'s suppliers in the discounted
    * revenue of `partType` parts sold to customers of `regionName`.
    * Exact decimal sums; the share is a 6-dp rendering of the exact
    * ratio at the very end.
    *
    * Scale shape: the two fact-fact joins (lineitem⋈part on partkey,
    * lineitem⋈orders on orderkey) stay key-partitioned hash joins with
    * their build inputs pre-filtered/pre-projected (part filtered to
    * the type FIRST — at warehouse scale part is fact-sized);
    * supplier⋈nation and customer⋈nation⋈region collapse the dimension
    * chain onto the fact keys before joining; nation/region ride in as
    * broadcasts. The final rollup is O(years) groups, partially
    * aggregated map-side. */
  def marketShare(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, supplier: DataFrame,
                  nation: DataFrame, region: DataFrame, part: DataFrame,
                  partType: String, targetNation: String,
                  regionName: String, from: String,
                  until: String): DataFrame = {
    val discPrice = (dec2(col("l_extendedprice")) *
      (lit(BigDecimal(1)) - dec2(col("l_discount"))).cast(DecimalType(4, 2)))
      .cast(DecimalType(24, 4))
    val partsIn = part.filter(col("p_type") === partType)
      .select(col("p_partkey"))
    val suppN = supplier.select("s_suppkey", "s_nationkey")
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val custIn = customer.select("c_custkey", "c_nationkey")
      .join(broadcast(nation.select(col("n_nationkey").as("cnk"),
          col("n_regionkey"))
        .join(region.filter(col("r_name") === regionName)
          .select("r_regionkey"),
          col("n_regionkey") === col("r_regionkey"))
        .select("cnk")), col("c_nationkey") === col("cnk"))
      .select("c_custkey")
    val ordersIn = orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast(LongType).as("order_year"))
    val zero = lit(BigDecimal(0)).cast(DecimalType(24, 4))
    lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        discPrice.as("dp"))
      .join(partsIn, col("l_partkey") === col("p_partkey"))
      .join(suppN, col("l_suppkey") === col("s_suppkey"))
      .join(ordersIn, col("l_orderkey") === col("o_orderkey"))
      .join(custIn, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("order_year")
      .agg(
        sum(when(col("supp_nation") === targetNation, col("dp"))
          .otherwise(zero)).cast(DecimalType(34, 4)).as("tr"),
        sum(col("dp")).cast(DecimalType(34, 4)).as("ar"),
        count(lit(1)).as("n_lines"))
      .select(col("order_year"),
        col("tr").cast("double").as("target_rev"),
        col("ar").cast("double").as("total_rev"),
        round(col("tr").cast("double") / col("ar").cast("double") * 100.0, 6)
          .as("mkt_share_pct"),
        col("n_lines"))
  }

  /** Promotional revenue share per ship month (reference shape: TPC-H
    * Q14): of each month's discounted revenue, the fraction from parts
    * of the promo type. Exact decimal sums; the share is rendered as a
    * 6-dp double from the exact decimals at the very end. Scale shape:
    * part is projected to (key, is-promo flag) before the join — at
    * warehouse scale part is a fact-sized table, so this stays a
    * key-partitioned shuffle hash join (NOT a broadcast), and the
    * month rollup aggregates partially map-side to O(months) groups. */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame,
                        promoType: String): DataFrame = {
    val discPrice = (dec2(col("l_extendedprice")) *
      (lit(BigDecimal(1)) - dec2(col("l_discount"))).cast(DecimalType(4, 2)))
      .cast(DecimalType(24, 4))
    lineitem
      .select(col("l_partkey"), date_trunc("month", col("l_shipdate")).as("ship_month"),
        discPrice.as("dp"))
      .join(part.select(col("p_partkey"),
          (col("p_type") === promoType).as("is_promo")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("ship_month")
      .agg(
        sum(when(col("is_promo"), col("dp")).otherwise(lit(BigDecimal(0))
          .cast(DecimalType(24, 4)))).cast(DecimalType(34, 4)).as("pr"),
        sum(col("dp")).cast(DecimalType(34, 4)).as("tr"),
        count(lit(1)).as("n_lines"))
      .select(col("ship_month"),
        col("pr").cast("double").as("promo_rev"),
        col("tr").cast("double").as("total_rev"),
        round(col("pr").cast("double") / col("tr").cast("double") * 100.0, 6)
          .as("promo_share_pct"),
        col("n_lines"))
  }

  /** Small-quantity revenue for one brand (reference shape: TPC-H
    * Q17): total revenue from lines whose quantity is below
    * `num/den` of the part's average ordered quantity. The fractional
    * threshold is evaluated as an EXACT integer cross-multiplication —
    * `qty_scaled · n_lines · den < num · sum_qty_scaled` — so no
    * division ever happens and the predicate can't ulp-flip. Scale
    * shape: the per-part average is a partially-aggregated
    * groupBy(partkey) (one row per part on the exchange), the brand
    * filter projects part to its key before the join, and both joins
    * are plain key-partitioned equi-joins; `avg_yearly` divides the
    * one exact total at the very end. */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame,
                           brand: String, num: Int, den: Int): DataFrame = {
    val qtyScaled = (dec2(col("l_quantity")) * lit(100)).cast(LongType)
    val perPart = lineitem
      .select(col("l_partkey").as("pp_partkey"), qtyScaled.as("qs"))
      .groupBy("pp_partkey")
      .agg(sum(col("qs")).as("sum_qs"), count(lit(1)).as("n_part"))
    lineitem
      .select(col("l_partkey"), qtyScaled.as("qty_scaled"),
        dec2(col("l_extendedprice")).as("price"))
      .join(part.filter(col("p_brand") === brand).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pp_partkey"))
      .filter(col("qty_scaled") * col("n_part") * lit(den.toLong) <
        lit(num.toLong) * col("sum_qs"))
      .agg(sum(col("price")).cast(DecimalType(34, 2)).as("t"),
        count(lit(1)).as("n_lines"))
      .select(col("t").cast("double").as("total_extprice"),
        (col("t").cast("double") / 7.0).as("avg_yearly"),
        col("n_lines"))
  }

  /** Disjunctive brand/size/quantity revenue (reference shape: TPC-H
    * Q19): revenue from lines matching ANY of three (brand, size
    * range, quantity range) clauses. The join stays a single
    * key-partitioned equi-join on the part key; the disjunction is a
    * residual filter evaluated post-join in codegen — the classic
    * OR-predicate shape that must NOT turn into three scans or a
    * cartesian. Quantity bounds compare scaled integers (exact). */
  def brandRevenue(lineitem: DataFrame, part: DataFrame,
                   clauses: Seq[(String, Int, Int, Int, Int)]): DataFrame = {
    val qtyScaled = (dec2(col("l_quantity")) * lit(100)).cast(LongType)
    val discPrice = (dec2(col("l_extendedprice")) *
      (lit(BigDecimal(1)) - dec2(col("l_discount"))).cast(DecimalType(4, 2)))
      .cast(DecimalType(24, 4))
    val pred = clauses.map { case (brand, szLo, szHi, qtyLo, qtyHi) =>
      col("p_brand") === brand &&
        col("p_size") >= szLo && col("p_size") <= szHi &&
        col("qty_scaled") >= qtyLo * 100L && col("qty_scaled") <= qtyHi * 100L
    }.reduce(_ || _)
    lineitem
      .select(col("l_partkey"), qtyScaled.as("qty_scaled"), discPrice.as("dp"))
      .join(part.select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .filter(pred)
      .agg(sum(col("dp")).cast(DecimalType(34, 4)).as("r"),
        count(lit(1)).as("n_lines"))
      .select(col("r").cast("double").as("revenue"), col("n_lines"))
  }

  /** Revenue by supplier nation × ship year for parts whose name
    * contains `nameSubstr` (reference shape: TPC-H Q9, sans the
    * partsupp supply-cost term this schema doesn't carry). Scale
    * shape: part is filtered by the pushed-down substring predicate
    * and projected to its key BEFORE the join (at warehouse scale a
    * key-partitioned join, not a broadcast); supplier→nation collapses
    * to (suppkey, nation name) with nation riding broadcast; the final
    * rollup partially aggregates to O(nations × years) groups. */
  def partProfitByNation(lineitem: DataFrame, part: DataFrame,
                         supplier: DataFrame, nation: DataFrame,
                         nameSubstr: String): DataFrame = {
    val discPrice = (dec2(col("l_extendedprice")) *
      (lit(BigDecimal(1)) - dec2(col("l_discount"))).cast(DecimalType(4, 2)))
      .cast(DecimalType(24, 4))
    val suppNation = supplier.select("s_suppkey", "s_nationkey")
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast(LongType).as("ship_year"),
        discPrice.as("dp"))
      .join(part.filter(col("p_name").contains(nameSubstr))
          .select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy("nation", "ship_year")
      .agg(sum(col("dp")).cast(DecimalType(34, 4)).as("r"),
        count(lit(1)).as("n_lines"))
      .select(col("nation"), col("ship_year"),
        col("r").cast("double").as("revenue"), col("n_lines"))
  }

  /** Distinct-supplier counts per part attribute group (reference
    * shape: TPC-H Q16): for parts NOT of `excludeBrand`, NOT of the
    * `excludeTypePrefix` type family, with size in `sizes`, how many
    * distinct suppliers shipped them — excluding "complained-about"
    * suppliers (negative account balance stands in for the spec's
    * complaint subquery). Scale shape: the (partkey, suppkey) pairs
    * are distinct-ed FIRST (one shuffle keyed on the pair, partial
    * map-side dedup), the excluded-supplier anti-join stays an
    * UNHINTED equi-join — supplier is SF-proportional, so the build
    * side is AQE's call, not a forced broadcast — part attributes join
    * on the key, and the count-distinct rides the already-distinct
    * pairs. */
  def supplierCountsByPart(lineitem: DataFrame, part: DataFrame,
                           supplier: DataFrame, excludeBrand: String,
                           excludeTypePrefix: String,
                           sizes: Seq[Int]): DataFrame = {
    val parts = part
      .filter(col("p_brand") =!= excludeBrand &&
        !col("p_type").startsWith(excludeTypePrefix) &&
        col("p_size").isInCollection(sizes))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    lineitem.select("l_partkey", "l_suppkey").distinct()
      .join(supplier.filter(col("s_acctbal") < 0).select("s_suppkey"),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Dormant high-balance customers per nation (reference shape:
    * TPC-H Q22): customers whose balance exceeds the average POSITIVE
    * balance and who placed no order on/after `cutoff`, rolled up by
    * nation. The above-average predicate is the exact integer
    * cross-multiplication `bal_scaled · n_pos > sum_pos_scaled`
    * (never a float average); the one-row global aggregate rides a
    * broadcast cross join; the no-recent-order test is a LEFT ANTI
    * join against the date-filtered order keys (the filter pushes to
    * the scan). */
  def dormantCustomers(customer: DataFrame, orders: DataFrame,
                       nation: DataFrame, cutoff: String): DataFrame = {
    val balScaled = (dec2(col("c_acctbal")) * lit(100)).cast(LongType)
    val cust = customer.select(col("c_custkey"), col("c_nationkey"),
      balScaled.as("bal_scaled"))
    val posAvg = cust.filter(col("bal_scaled") > 0)
      .agg(sum(col("bal_scaled")).as("sum_pos"),
        count(lit(1)).as("n_pos"))
    cust
      .crossJoin(broadcast(posAvg))
      .filter(col("bal_scaled") * col("n_pos") > col("sum_pos"))
      .join(orders
          .filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_custs"),
        sum(col("bal_scaled")).as("bs"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("n_custs"),
        (col("bs") / lit(100.0)).as("total_acctbal"))
  }

  /** Hierarchical revenue rollup (region → nation → grand total) —
    * the OLAP grouping-sets shape, executed as Spark's native
    * `rollup` (one aggregation producing every level via the Expand
    * operator, partial-aggregated before the single exchange — NOT a
    * union of three scans). `gid` is the grouping bitmask
    * distinguishing subtotal rows from genuine NULL keys. Order
    * totals join through the customer→nation chain with the O(100)-row
    * dimensions broadcast. */
  def revenueRollup(orders: DataFrame, customer: DataFrame,
                    nation: DataFrame, region: DataFrame): DataFrame = {
    val joined = orders
      .select(col("o_custkey"), dec2(col("o_totalprice")).as("p"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        col("p"))
    // Dataset.rollup on any post-join frame trips Spark 4.1.2's
    // DetectAmbiguousSelfJoin (the Expand duplicates the grouping
    // attributes and the per-Dataset-id check misreads them as a
    // self-join). The SQL path carries no Dataset ids, so the rollup
    // goes through a uniquely-named temp view; the view is dropped
    // immediately — the returned plan is already resolved.
    val spark = joined.sparkSession
    val view = s"graft_rollup_${java.util.UUID.randomUUID.toString
      .replace("-", "")}"
    joined.createOrReplaceTempView(view)
    try spark.sql(
      s"""SELECT region, nation,
         |  CAST(CAST(sum(p) AS DECIMAL(34,2)) AS DOUBLE) AS revenue,
         |  count(*) AS n_orders, grouping_id() AS gid
         |FROM $view GROUP BY ROLLUP (region, nation)""".stripMargin)
    finally spark.catalog.dropTempView(view)
  }

  /** Monthly revenue pivoted by order status — the wide-table PIVOT
    * shape, compiled as ONE aggregation of conditional sums over the
    * explicit status list. (`Dataset.pivot` with an explicit list
    * still plans two aggregations/shuffles — a (month, status)
    * pre-agg feeding `pivotfirst`; the conditional-sum form does the
    * same wide table in a single partial-aggregated groupBy. Value
    * DISCOVERY is deliberately out of scope either way — at warehouse
    * scale that's its own job.) Exact decimal sums per cell, rendered
    * as doubles; months with no rows for a status yield NULL cells. */
  def revenuePivotByStatus(orders: DataFrame,
                           statuses: Seq[String]): DataFrame = {
    val cells = statuses.map(st =>
      sum(when(col("o_orderstatus") === st, col("p")))
        .cast(DecimalType(34, 2)).cast("double")
        .as(s"rev_${st.toLowerCase}"))
    orders
      .select(date_trunc("month", col("o_orderdate")).as("order_month"),
        col("o_orderstatus"), dec2(col("o_totalprice")).as("p"))
      .groupBy("order_month")
      .agg(cells.head, cells.tail: _*)
  }

  /** One-pass numeric column profile — the data-quality scan every
    * warehouse/training pipeline runs before trusting a table: per
    * column its row/non-null/distinct counts, min/max, and exact
    * decimal sum. The columns unpivot through `stack` (one narrow
    * generate, no per-column scans), aggregates are partially
    * map-side-combined on (col_name, value) before the exchange —
    * min/max/count/sum collapse to O(columns) rows, the exact distinct
    * count shuffles the already-deduped (column, value) pairs
    * hash-partitioned across the cluster, never one task per column. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stackArgs = cols.map(c => s"'$c', `$c`").mkString(", ")
    df.selectExpr(s"stack(${cols.size}, $stackArgs) AS (col_name, v0)")
      .select(col("col_name"), dec2(col("v0")).as("v"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        count(col("v")).as("n_nonnull"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).cast("double").as("min_v"),
        max(col("v")).cast("double").as("max_v"),
        sum(col("v")).cast(DecimalType(34, 2)).cast("double").as("sum_v"))
  }

  /** Suppliers who alone shipped last on multi-supplier finished
    * orders (reference shape: TPC-H Q21, re-keyed to ship dates —
    * this schema has no commit/receipt dates): for orders with status
    * `status` served by >1 supplier, find the orders where exactly ONE
    * supplier shipped on the order's latest ship date, and count per
    * supplier how many orders they held up. Scale shape: everything
    * derives from ONE per-order aggregate pass (max date + distinct
    * suppliers) joined back to the lines at the max date — no
    * correlated exists/not-exists rescans of the fact table; the
    * global top-k is a TakeOrderedAndProject. */
  def lateSuppliers(lineitem: DataFrame, orders: DataFrame,
                    supplier: DataFrame, status: String, k: Int): DataFrame = {
    val lines = lineitem
      .join(orders.filter(col("o_orderstatus") === status)
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    // ONE aggregation pass decides everything per order — no second
    // scan joined back at the max date:
    //  · multi-supplier       ⟺ min(suppkey) ≠ max(suppkey)
    //  · max supp at max date =  max(struct(date, supp)).supp
    //  · min supp at max date = -max(struct(date, −supp)).negsupp
    //  · sole last shipper    ⟺ the two agree.
    val perOrder = lines
      .groupBy("l_orderkey")
      .agg(min(col("l_suppkey")).as("smin"),
        max(col("l_suppkey")).as("smax"),
        max(struct(col("l_shipdate"), col("l_suppkey"))).as("hi"),
        max(struct(col("l_shipdate"), (-col("l_suppkey")).as("neg")))
          .as("lo"))
      .filter(col("smin") =!= col("smax") &&
        col("hi.l_suppkey") === -col("lo.neg"))
      .select(col("hi.l_suppkey").as("the_supp"))
    perOrder
      .groupBy(col("the_supp"))
      .agg(count(lit(1)).as("n_waiting"))
      .join(supplier.select("s_suppkey", "s_name"),
        col("the_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_waiting"))
      .orderBy(col("n_waiting").desc, col("s_suppkey"))
      .limit(k)
  }
}
