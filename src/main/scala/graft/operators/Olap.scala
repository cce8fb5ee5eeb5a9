package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** General OLAP tier over the TPC-H-ish tables (SURVEY §2 tier B).
  * These exercise the engine's core relational muscle the reference's
  * dbt models rely on — scan-side filtering, partial aggregation,
  * broadcast vs shuffle joins, windows, rollups, pivots — in shapes
  * whose physical plans we tune for scale (see PLANS.md).
  */
object Olap {

  /** b1: TPC-H Q1-style wide aggregate. The shipdate filter reaches
    * the parquet scan (PushedFilters); aggregation is map-side partial
    * over 2×2 groups — the cheapest possible shuffle. */
  def b1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** b2: TPC-H Q3-style shipping-priority join: selective dim filter
    * first, fact⋈fact shuffle join on orderkey, top-10 revenue. */
  def b2TopRevenue(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-01-01"))
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1998-01-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** b3: TPC-H Q5-style multi-way join. region/nation are broadcast
    * (tiny dims); only the customer⋈orders⋈lineitem chain shuffles,
    * each on its join key. */
  def b3RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val geo = broadcast(
      Tables.nation(s, dir).join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey")))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(geo, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("r_name"), col("n_name"))
  }

  /** b4: window top-N — top-3 revenue parts per brand. Aggregate
    * first (shrinks to |parts|), then a window over the small frame. */
  def b4WindowTopN(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy(col("p_brand"), col("rank"))
  }

  /** b5: hierarchical rollup region → nation over customer balances.
    * NULL subtotal labels are coalesced to 'ALL' for oracle parity. */
  def b5Rollup(s: SparkSession, dir: String): DataFrame = {
    val geo = broadcast(
      Tables.nation(s, dir).join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey")))
    Tables.customer(s, dir)
      .join(geo, col("c_nationkey") === col("n_nationkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("acctbal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"), col("acctbal"))
      .orderBy("region", "nation")
  }

  /** b6: left-semi / left-anti joins (EXISTS / NOT EXISTS) — orders
    * with vs without lineitems, per order priority. */
  def b6SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val liKeys = Tables.lineitem(s, dir).select("l_orderkey")
    val withLi = ord.join(liKeys, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_with_lineitems"))
    val withoutLi = ord.join(liKeys, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_without_lineitems"))
    withLi.join(withoutLi, Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"),
        coalesce(col("n_with_lineitems"), lit(0L)).as("n_with_lineitems"),
        coalesce(col("n_without_lineitems"), lit(0L)).as("n_without_lineitems"))
      .orderBy("o_orderpriority")
  }

  /** b7: pivot — per-user event-type counts as columns (conditional
    * aggregation; one shuffle on user_id). */
  /** Pivot column set shared by b7 (pivot) and b17 (unpivot) — one
    * source of truth so the melt can't silently drift from the pivot. */
  private val EventTypes = Seq("click", "view", "purchase", "signup", "error")

  def b7Pivot(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(s, dir).groupBy("user_id")
      .pivot("event_type", EventTypes).agg(count(lit(1)))
    EventTypes.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy("user_id")
  }

  /** b8: as-of attribution — for each purchase, the latest strictly
    * prior click of the same user, composed from a running-max window
    * (no custom operator needed; shuffles once on user_id). */
  def b8AsofAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click_ts_us",
        max(when(col("event_type") === "click", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("last_click_ts_us"),
        (col("ts_us") - col("last_click_ts_us")).as("gap_us"))
      .orderBy("event_id")
  }

  /** b12: moving-window aggregates — per-user running totals and a
    * trailing 5-event moving average (rows-frame windows). One shuffle
    * on user_id; frames are O(1) incremental per row. */
  def b12MovingAgg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("running_sum",
        round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 4))
      .withColumn("moving_avg5",
        round(avg(col("value")).over(w.rowsBetween(-4, 0)), 4))
      .withColumn("seq", row_number().over(w).cast("long"))
      .orderBy("event_id")
  }

  /** b21: event-time RANGE-frame window — trailing 10-minute count and
    * sum per user. b12's rows-frames bound by ROW COUNT; range frames
    * bound by the ORDER-BY VALUE (micros here), the form time-series
    * features actually need (a burst of events widens the frame's row
    * count automatically). Same single shuffle on user_id; Spark
    * evaluates the frame incrementally with two pointers per
    * partition. Peers (equal ts) share a frame, so the sum's row SET
    * is engine-deterministic; round(4) absorbs fold-order drift. */
  def b21TimeWindow(s: SparkSession, dir: String): DataFrame = {
    val tenMinUs = 600000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-tenMinUs, 0)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("n_10m", count(lit(1)).over(w))
      .withColumn("v_10m", round(sum(col("value")).over(w), 4))
      .drop("value")
      .orderBy("event_id")
  }

  /** b22: GROUPING SETS — the ad-hoc aggregation-lattice shape cube
    * (b14, every subset) and rollup (b5, the prefix chain) cannot
    * express: exactly the named levels, here (returnflag, linestatus)
    * + the orthogonal (shipmode) + the grand total. One pass, one
    * expand+aggregate plan (Spark's Expand — rows × |sets|, map-side
    * combined), grouping_id disambiguating real NULLs from
    * subtotals. */
  def b22GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("sy", year(col("l_shipdate")).cast("long"))
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("sy")), Seq()),
        col("l_returnflag"), col("l_linestatus"), col("sy"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice")), 2).as("total_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        coalesce(col("sy"), lit(-1L)).as("ship_year"),
        col("gid"), col("n_rows"), col("total_price"))
      .orderBy("gid", "returnflag", "linestatus", "ship_year")

  /** Hot-bin guard for b13 (the BucketCap discipline of the dedup
    * tier): a burst of `cap` events inside one second is ~cap²/2
    * candidate pairs from that second alone. Seconds whose occupancy
    * exceeds the cap are dropped FROM THE PROBED SIDE — a pair is
    * found via its later row's bin, so dropping over-cap bins there
    * kills the burst² mass while bounding total candidates at
    * 2·n·cap (each surviving bin joins ≤ cap probed rows). Burst
    * seconds are degenerate for a cross-user coincidence join the
    * same way mega-buckets are for LSH. */
  val RangeBinCap = 1000

  /** b13: time-range self-join — pairs of events from different users
    * within 1 second of each other. A naive range join is O(n²); the
    * scalable shape is bin blocking: each left row probes its own
    * 1-second bin and the next, the join is equi on the bin key, and
    * the true range predicate filters candidates. Bin width = range
    * width keeps candidates ≈ matches; [[RangeBinCap]] bounds the
    * burst-second blowup (cap mirrored in the oracle). */
  def b13RangeJoin(s: SparkSession, dir: String, binCap: Int = RangeBinCap): DataFrame =
    b13RangeJoinOn(Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us")), binCap)

  /** Frame-level body of b13 over (event_id, user_id, ts_us) — split
    * out so specs can drive synthetic burst corpora through it. */
  private[graft] def b13RangeJoinOn(ev: DataFrame, binCap: Int = RangeBinCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val oneSec = 1000000L
    // The exploded side is the ts-EARLIER row of each pair: if
    // ts_e <= ts_l and ts_l - ts_e <= 1s, the later row's bin is
    // always in {bin(ts_e), bin(ts_e)+1}, so 2-bin probing is complete
    // regardless of id order (a 3-bin explode would also work but adds
    // 50% probe volume). Output pairs are then canonicalized to the
    // oracle's id_a < id_b orientation, so dt_us keeps its sign.
    val earlier = ev.select(col("event_id").as("id_e"), col("user_id").as("user_e"),
      col("ts_us").as("ts_e"), explode(array(
        (col("ts_us") / oneSec).cast("long"),
        (col("ts_us") / oneSec).cast("long") + 1)).as("bin"))
    // the occupancy window shares the join's own bin-key shuffle
    val later = ev.select(col("event_id").as("id_l"), col("user_id").as("user_l"),
      col("ts_us").as("ts_l"), (col("ts_us") / oneSec).cast("long").as("bin"))
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("bin"))))
      .filter(col("bsz") <= binCap)
      .drop("bsz")
    earlier.join(later, Seq("bin"))
      .filter(col("user_e") =!= col("user_l")
        && (col("ts_l") - col("ts_e")).between(0L, oneSec)
        && (col("ts_l") =!= col("ts_e") || col("id_e") < col("id_l")))
      .select(
        least(col("id_e"), col("id_l")).as("id_a"),
        greatest(col("id_e"), col("id_l")).as("id_b"),
        when(col("id_e") < col("id_l"), col("ts_l") - col("ts_e"))
          .otherwise(col("ts_e") - col("ts_l")).as("dt_us"))
      .distinct() // a pair can match in two bins
      .orderBy("id_a", "id_b")
  }

  /** b14: full cube over (region, order priority) with grouping_id —
    * every subtotal combination in ONE pass: Spark expands the cube
    * grouping sets and aggregates partially map-side exactly like a
    * plain groupBy, so the 4× grouping-set expansion never touches
    * the scan twice. gid disambiguates data-'ALL' from subtotal-'ALL'
    * rows. Geo dims broadcast; only orders⋈customer shuffles. */
  def b14Cube(s: SparkSession, dir: String): DataFrame = {
    val geo = broadcast(
      Tables.nation(s, dir).join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey")))
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(geo, col("c_nationkey") === col("n_nationkey"))
      .cube(col("r_name"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n_orders"), col("total_price"))
      .orderBy("gid", "region", "priority")
  }

  /** b15: set operations — INTERSECT / EXCEPT over the customer sets
    * active in two periods, labeled and summarized. Spark plans
    * intersect/except as semi/anti hash joins on the full row — the
    * same one-shuffle shape as a distinct — so each branch stays a
    * single exchange on the set key at any scale. */
  def b15SetOps(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    // each year's key set feeds three cohort branches (intersect, both
    // excepts); checkpoint so the scan+distinct runs once per year,
    // not once per branch
    def custsIn(yr: Int) =
      ord.filter(year(col("o_orderdate")) === yr).select(col("o_custkey"))
        .distinct().localCheckpoint()
    val c97 = custsIn(1997)
    val c98 = custsIn(1998)
    def summarize(df: DataFrame, label: String) =
      df.agg(count(lit(1)).as("n_custs"),
          min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"))
        .select(lit(label).as("cohort"), col("n_custs"), col("min_cust"), col("max_cust"))
    summarize(c97.intersect(c98), "both_years")
      .unionByName(summarize(c97.except(c98), "only_1997"))
      .unionByName(summarize(c98.except(c97), "only_1998"))
      .orderBy("cohort")
  }

  /** b16: time-series gap filling — the dense hourly grid (every hour
    * × every event type) left-joined with the observed hourly counts,
    * missing cells zero-filled. The grid is GENERATED (sequence over
    * the observed min/max hour × the distinct-type dim), never
    * scanned: at 100 TB the fact aggregates down to |hours×types|
    * BEFORE any join, and the grid side is bounded by calendar time —
    * both report-sized, so the join broadcasts. */
  def b16GapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(date_trunc("hour", col("ts")).as("hour"), col("event_type"), col("value"))
    val counts = ev.groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
    val hours = ev.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val types = ev.select(col("event_type")).distinct()
    hours.crossJoin(broadcast(types))
      .join(broadcast(counts), Seq("hour", "event_type"), "left")
      .select(unix_micros(col("hour")).as("hour_us"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("hour_us", "event_type")
  }

  /** b17: unpivot (melt) — the inverse of b7's pivot: wide per-user
    * type counts back to long (user_id, event_type, n) rows. Spark's
    * native unpivot is a zero-shuffle Expand over the wide frame. */
  def b17Unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = b7Pivot(s, dir)
    wide.unpivot(
        Array(col("user_id")),
        EventTypes.map(col).toArray,
        "event_type", "n")
      .orderBy("user_id", "event_type")
  }

  /** b18: ordered list aggregation (listagg/string_agg) — per-user
    * sorted distinct event types as a csv plus per-user event count.
    * collect_list order is execution-dependent, so the list is
    * array_sort-normalized before joining — the only portable listagg
    * contract (same rule the oracle side follows). One shuffle on
    * user_id, map-side combined. */
  def b18ListAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        concat_ws(",", array_sort(array_distinct(collect_list(col("event_type"))))).as("types_csv"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")

  /** b19: window navigation & distribution functions — first/last
    * value over the full partition frame, lead-gap to the next event,
    * quartile ntile, percent_rank and cume_dist: the remaining window
    * family the b4/b8/b9/b12 queries don't cover. One shuffle on
    * user_id serves every function. */
  def b19WindowNav(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ev.select(
        col("event_id"), col("user_id"), col("ts_us"),
        first(col("event_type")).over(wFull).as("first_type"),
        last(col("event_type")).over(wFull).as("last_type"),
        (lead(col("ts_us"), 1).over(w) - col("ts_us")).as("us_to_next"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cume"))
      .orderBy("event_id")
  }

  /** b9: sessionization — 30-minute-gap session assignment via lag +
    * running sum; the batch twin of the streaming sessionizer in
    * `streaming/`. One shuffle on user_id. */
  def b9Sessionize(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val ordW = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev.withColumn("prev_ts", lag(col("ts_us"), 1).over(ordW))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, lit(1L)).otherwise(lit(0L)))
      .withColumn("session_seq",
        sum(col("new_session")).over(ordW.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("session_seq"))
      .orderBy("event_id")
  }
}
