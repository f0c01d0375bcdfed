package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Deterministic.{davg, dsum}

/** Relational query surface over the harness star schema (SURVEY §7
  * Phase 1.3). The reference has no SQL layer (SURVEY §0); this is the
  * fill-out that exercises every relational operator class a user of a
  * Spark-native engine needs: scan/filter/project, all join kinds,
  * hash aggregation, grouping sets, window functions, top-k, set ops,
  * scalar function families.
  *
  * All plans are declarative DataFrame chains — Catalyst does predicate
  * pushdown into the parquet scan, column pruning, and join-strategy
  * selection (broadcast for the dims below the autoBroadcast threshold,
  * shuffle hash/sort-merge for fact-fact). At 100 TB the same plans
  * hold: the only shuffles are on group/join keys, partial aggregation
  * runs map-side, and dimension joins never shuffle the fact table.
  *
  * Floating-point aggregates use decimal-exact sums (see
  * graft.functions.Deterministic) so results are order-independent —
  * identical across partitionings, retries, and engines.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: the canonical scan -> filter ->
    * partial/final hash agg. One shuffle of ~|flags x status| rows. */
  def q1Pricing(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q6-style forecast revenue: pure pushed-down filter + single
    * scalar agg — the whole query is one scan, no shuffle of note. */
  def q6Revenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** TPC-H Q3-style top unshipped orders: dim-filtered fact-fact join +
    * agg + top-k. customer (filtered) broadcasts; orders-lineitem is
    * the one real shuffle; top-k is a partial TakeOrdered, not a full
    * sort. */
  def q3TopOrders(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_odate"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style regional revenue: 6-table join. region/nation/
    * supplier broadcast (tiny); customer-orders and orders-lineitem
    * shuffle on their keys. */
  def q5RegionRevenue(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d).filter(
      col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
      col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
    val li = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Semi join (EXISTS): orders having any high-quantity line, counted
    * per priority. left_semi never materializes the right side's
    * columns and de-dups for free. */
  def qSemiJoin(s: SparkSession, d: String): DataFrame = {
    val hi = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
      .select(col("l_orderkey"))
    Tables.orders(s, d)
      .join(hi, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderpriority"))
  }

  /** Anti join (NOT EXISTS): customers with no urgent orders, per
    * segment (every customer has some order in this data, so the
    * predicate keeps the result non-trivial). */
  def qAntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("c_mktsegment"))

  /** Ranking window function: top-3 parts by retail price per brand.
    * Fully deterministic tie-break on p_partkey. */
  def qWindowTopN(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, d)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).cast(LongType).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("p_brand"), col("rn"))
  }

  /** Window frame: per-customer running order total. Decimal-exact
    * windowed sum — order-independent internally, so it matches the
    * oracle regardless of either engine's accumulation scheme. */
  def qRunningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_odate"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).over(w)
          .cast(DoubleType).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Grouping sets via ROLLUP: region -> nation customer counts with
    * subtotals and a grand total. */
  def qRollup(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("cnt"), dsum(col("c_acctbal")).as("sum_bal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("cnt"), col("sum_bal"))
      .orderBy(col("region"), col("nation"))

  /** Grouping sets via CUBE over order status x priority. */
  def qCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  /** Set operators: INTERSECT / EXCEPT / UNION (distinct forms), tagged
    * and unioned into one result. */
  def qSetOps(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def users(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
    val clickNotError = users("click").except(users("error"))
      .select(lit("click_not_error").as("tag"), col("user_id"))
    val clickAndPurchase = users("click").intersect(users("purchase"))
      .select(lit("click_and_purchase").as("tag"), col("user_id"))
    val signupOrError = users("signup").union(users("error")).distinct()
      .select(lit("signup_or_error").as("tag"), col("user_id"))
    clickNotError.unionAll(clickAndPurchase).unionAll(signupOrError)
      .orderBy(col("tag"), col("user_id"))
  }

  /** Exact + distinct aggregation: distinct part/supplier counts per
    * return flag. */
  def qDistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  /** Relative-error budget the HLL verdict asserts: default
    * approx_count_distinct rsd is 0.05 (one standard deviation), so
    * 2 rsd = 0.10 is the documented bound the sketch must stay
    * inside. */
  val HllRelErrBound = 0.10

  /** approx_count_distinct (HLL++) — the sketch path that replaces
    * exact distinct at 100 TB. The sketch VALUE is engine-specific
    * (DuckDB's HLL differs), so the query emits what IS engine-
    * independent: the exact count and a boolean verdict that the
    * sketch landed within the documented [[HllRelErrBound]]. The
    * oracle computes the same exact count and expects `true` — a
    * hash match is a deterministic pass/fail on the error bound, not
    * a rows-only shrug. (Production runs the sketch alone; the exact
    * countDistinct here exists to make the bound checkable.) */
  def qApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("cnt"))
      .select(col("l_returnflag"), col("exact_parts"), col("cnt"),
        (abs(col("approx_parts") - col("exact_parts")).cast(DoubleType) /
          col("exact_parts") <= HllRelErrBound).as("within_bound"))
      .orderBy(col("l_returnflag"))

  /** Scalar function families: string / date / math, engine-portable
    * subset (P1-P10 analogs live in Clean/Report jobs; these are the
    * general-purpose ones). */
  def qScalarFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        lower(col("p_type")).as("type_l"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).cast(LongType).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), "[aeiou]", "").as("type_novowel"),
        (col("p_size") % 7).cast(LongType).as("size_mod"),
        abs(col("p_retailprice") - 950.0).as("price_dev"),
        floor(col("p_retailprice")).cast(LongType).as("price_floor"),
        ceil(col("p_retailprice")).cast(LongType).as("price_ceil"),
        round(col("p_retailprice") / 7, 2).as("price_div_round"),
        sqrt(col("p_retailprice")).as("price_sqrt"))
      .orderBy(col("p_partkey"))

  /** Date/time scalar functions over orders. */
  def qDateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("y"),
        month(col("o_orderdate")).cast(LongType).as("m"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
        quarter(col("o_orderdate")).cast(LongType).as("q"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        datediff(lit("2002-01-01").cast(TimestampType), col("o_orderdate"))
          .cast(LongType).as("days_to_2002"))
      .orderBy(col("o_orderkey"))

  /** JSON access on a string column (get_json_object / P1 analog over
    * the events.props payload). */
  def qJsonProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Higher-order array functions over the embedding vectors:
    * size / filter / aggregate (decimal-exact dot-with-self -> L2
    * norm). These are the same primitives the similarity operators
    * build on. */
  def qHigherOrder(s: SparkSession, d: String): DataFrame = {
    val x = col("x")
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).cast(LongType).as("dim"),
        size(filter(col("embedding"), x => x > 0)).cast(LongType).as("n_pos"),
        // Precision 30 (not 38): decimal(30,12)+decimal(30,12) widens to
        // decimal(31,12), keeping all 12 fractional digits; at precision
        // 38 the sum would saturate and Spark would DROP a fractional
        // digit per add (decimal(38,11)), silently rounding partials.
        sqrt(aggregate(col("embedding"),
          lit(0).cast(DecimalType(30, 12)),
          (acc, v) => (acc + (v.cast(DoubleType) * v.cast(DoubleType)).cast(DecimalType(30, 12)))
            .cast(DecimalType(30, 12)))
          .cast(DoubleType)).as("l2"))
      .orderBy(col("vec_id"))
  }

  /** Offset window functions: per-customer order-to-order price delta
    * via lag(). */
  def qLeadLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_odate"),
        col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Gap-based sessionization of the event stream: a session breaks
    * after >30 min of user inactivity. lag() flags session starts, a
    * running sum numbers sessions, then one hash agg per session.
    * Integer epoch-micro arithmetic end to end — fully deterministic.
    * Scale: both windows and the final agg partition on user_id, so
    * the whole query is ONE shuffle of the events table. */
  def qSessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val gapUs = SessionGapUs
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(byUser) > gapUs ||
          lag(col("us"), 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("sess_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / lit(1000000L)).cast(LongType).as("duration_sec"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  /** Session gap shared by [[qSessionize]] and [[qEventTransitions]]:
    * >30 min of user inactivity breaks the behavioral sequence. */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** Markov transition table over sessionized behavior — the
    * generalized flow graph next to the fixed-stage funnel
    * ([[qEventFunnel]]): for every (from, to) event-type pair, how
    * often `to` directly follows `from` within a session, with the
    * conditional probability P(to | from). The table IS the "users
    * who did X next did Y" report, and a first-order behavior model.
    *
    * One lag window per user (the sessionize shuffle), transitions
    * filtered at the session gap, then a |types|²-bounded count agg —
    * the heavy stream collapses to a tiny matrix via map-side
    * partials. Counts are exact integers; each probability is ONE
    * IEEE division of exactly-represented integers, so the oracle
    * hashes match bit-for-bit. */
  def qEventTransitions(s: SparkSession, d: String): DataFrame =
    eventTransitions(Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")))

  /** [[qEventTransitions]]'s core over any (user_id, event_id,
    * event_type, us) frame. */
  private[graft] def eventTransitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val steps = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(byUser))
      .filter(col("prev_type").isNotNull && col("gap") <= SessionGapUs)
    val cnt = steps
      .groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    cnt.join(tot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast(DoubleType) / col("n_from")).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Ordered conversion funnel over the event stream: per user, the
    * FIRST time each stage is reached STRICTLY AFTER the previous
    * stage (view -> click -> signup -> purchase) — the product-
    * analytics primitive behind every activation dashboard, and a
    * different beast from the unordered per-doc rule funnel
    * (`TextAnalysis.qFilterFunnel`): here order matters, so a click
    * before the first view does not count.
    *
    * Formulated as FOUR SEQUENTIAL AGGREGATIONS joined on user_id —
    * min(ts) past the previous stage's time — rather than a per-user
    * event-sequence window sort: each stage is one equi-join + one
    * partial-aggregated hash agg on user_id, so the heaviest user
    * (a bot with millions of events) costs its map-side partials, not
    * a single-task sort. Time-to-stage is summed in integer epoch
    * MICROSECONDS (exact; consumers derive averages). */
  def qEventFunnel(s: SparkSession, d: String): DataFrame =
    eventFunnel(Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us")))

  /** [[qEventFunnel]]'s core over any (user_id, event_type, us) frame
    * — separated so the ordered semantics are testable on constructed
    * event sequences. */
  def eventFunnel(events: DataFrame): DataFrame = {
    val e = events.localCheckpoint(false) // feeds all four stage subtrees
    // each stage: events of the step type, strictly after the user's
    // previous-stage time, first reach + the carried funnel-entry time
    def stage(of: String, prev: DataFrame, prevT: String, outT: String): DataFrame =
      e.filter(col("event_type") === of)
        .join(prev.select(col("user_id"), col("t1"), col(prevT).as("t_prev")),
          Seq("user_id"))
        .filter(col("us") > col("t_prev"))
        .groupBy(col("user_id"))
        .agg(min(col("us")).as(outT), min(col("t1")).as("t1"))
    val a1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val a2 = stage("click", a1.withColumn("t0", col("t1")), "t0", "t_click")
    val a3 = stage("signup", a2, "t_click", "t_signup")
    val a4 = stage("purchase", a3, "t_signup", "t_purchase")
    def roll(df: DataFrame, tCol: String) =
      df.agg(count(lit(1)).as("n"), sum(col(tCol) - col("t1")).as("d"))
    def row(st: Long, step: String, n: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) =
      struct(lit(st).as("stage"), lit(step).as("step"),
        n.as("n_users"), d.as("sum_delta_us"))
    roll(a1, "t1").select(col("n").as("n1"), col("d").as("d1"))
      .crossJoin(broadcast(roll(a2, "t_click").select(col("n").as("n2"), col("d").as("d2"))))
      .crossJoin(broadcast(roll(a3, "t_signup").select(col("n").as("n3"), col("d").as("d3"))))
      .crossJoin(broadcast(roll(a4, "t_purchase").select(col("n").as("n4"), col("d").as("d4"))))
      .select(explode(array(
        row(1L, "view", col("n1"), coalesce(col("d1"), lit(0L))),
        row(2L, "click", col("n2"), coalesce(col("d2"), lit(0L))),
        row(3L, "signup", col("n3"), coalesce(col("d3"), lit(0L))),
        row(4L, "purchase", col("n4"), coalesce(col("d4"), lit(0L))))).as("r"))
      .select(col("r.stage").as("stage"), col("r.step").as("step"),
        col("r.n_users").as("n_users"), col("r.sum_delta_us").as("sum_delta_us"))
      .orderBy(col("stage"))
  }

  /** Cohort retention triangle: cohort = a user's first active DATE;
    * for every (cohort, day offset) the count of cohort users active
    * that day and the retention ratio vs the cohort's day-0 size — the
    * other canonical product-analytics report next to the conversion
    * funnel. Output is bounded by days² regardless of event volume.
    *
    * Scale shape: one (user, day) distinct shuffle, one per-user min
    * agg, one user-keyed equi-join, then a days²-bounded agg — all
    * hash equi operations with map-side partials; a bot user's rows
    * collapse to at most |days| distinct user-days before any join.
    * All arithmetic is integer dates and one exact division. */
  def qRetention(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .localCheckpoint(false) // feeds the cohort agg AND the activity join
    val fc = ud.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val a = ud.join(fc, Seq("user_id"))
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).cast(LongType).as("day_offset"))
      .agg(count(lit(1)).as("n_users")) // user-days are distinct by construction
    val c0 = a.filter(col("day_offset") === 0L)
      .select(col("cohort"), col("n_users").as("cohort_size"))
    a.join(c0, Seq("cohort"))
      .select(col("cohort").as("cohort_date"), col("day_offset"),
        col("n_users"), col("cohort_size"),
        (col("n_users").cast(DoubleType) / col("cohort_size")).as("retention"))
      .orderBy(col("cohort_date"), col("day_offset"))
  }

  /** Absolute z-score above which an event is reported as an
    * anomaly. */
  val AnomalyZ = 3.0

  /** Metric anomaly detection — the data-quality monitor a pipeline
    * runs over its own telemetry: per event type, flag events whose
    * value sits more than [[AnomalyZ]] standard deviations from that
    * type's mean. One grouped-aggregate pass (count / sum / sum of
    * squares, all with map-side partials) produces a TYPE-count-sized
    * stats frame; the broadcast join back against the fact means the
    * event stream is scanned exactly twice and never shuffled on a
    * grouping key wider than event_type.
    *
    * Cross-engine exactness: the two sums are decimal-exact
    * ([[graft.functions.Deterministic]]); mean, variance (the
    * E[x²]−E[x]² form), sqrt, and the z ratio are then a FIXED chain
    * of IEEE operations on identical inputs — sqrt is correctly
    * rounded by the standard, so every engine lands on the same bits
    * and the |z| > 3 cut admits identical rows.
    *
    * Degenerate types carry NO verdict: with n < 2 or a non-positive
    * E[x²]−E[x]² variance (a single observation, a constant-valued
    * metric, or catastrophic cancellation on a high-mean/low-variance
    * one) there is no reference distribution — sd would be 0 or NaN,
    * z would be ±Inf/NaN, and SQL engines treat NaN > 3 as TRUE, so
    * without the guard every event of such a type is "anomalous".
    * Same admit-by-omission convention as a type with no stats row. */
  def qEventAnomaly(s: SparkSession, d: String): DataFrame =
    eventAnomaly(Tables.events(s, d))

  /** Frame-level core of [[qEventAnomaly]]: any (event_id, event_type,
    * value) frame in, flagged rows out. */
  def eventAnomaly(ev: DataFrame): DataFrame = {
    val stats = ev.groupBy(col("event_type")).agg(
      dsum(col("value")).as("s1"),
      dsum(col("value") * col("value")).as("s2"),
      count(lit(1)).as("n"))
    val mean = col("s1") / col("n")
    val variance = (col("s2") - col("s1") * col("s1") / col("n")) / col("n")
    ev.join(broadcast(stats), Seq("event_type"))
      .filter(col("n") >= 2L && variance > lit(0.0))
      .withColumn("z", (col("value") - mean) / sqrt(variance))
      .filter(abs(col("z")) > lit(AnomalyZ))
      .select(col("event_id"), col("event_type"), col("value"),
        col("z"))
      .orderBy(col("event_id"))
  }

  /** Column profiling (ANALYZE-style data quality pass): per column,
    * row/null/distinct counts and min/max — the first query any
    * pipeline runs against a new 100 TB table. Four single-column
    * aggregates over pruned scans (each reads exactly one parquet
    * column), unioned into a long-form report. */
  def qProfile(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    def prof(name: String, minMaxStr: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)) =
      li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(name).isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(name)).as("n_distinct"),
        minMaxStr._1.as("min_v"), minMaxStr._2.as("max_v"))
        .select(lit(name).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_v"), col("max_v"))
    prof("l_orderkey",
        (min(col("l_orderkey")).cast(StringType), max(col("l_orderkey")).cast(StringType)))
      .unionByName(prof("l_quantity",
        (min(col("l_quantity")).cast(StringType), max(col("l_quantity")).cast(StringType))))
      .unionByName(prof("l_returnflag",
        (min(col("l_returnflag")), max(col("l_returnflag")))))
      .unionByName(prof("l_shipdate",
        (date_format(min(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss"),
          date_format(max(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss"))))
      .orderBy(col("col_name"))
  }

  /** Full outer join: daily click vs purchase activity aligned on
    * day, either side nullable — the one outer-join class the surface
    * didn't cover (semi/anti/left live in their own queries). */
  def qFullOuter(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def byDay(t: String, name: String) = ev.filter(col("event_type") === t)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as(s"${name}_day"))
      .agg(count(lit(1)).as(s"n_$name"))
    byDay("click", "click").join(byDay("purchase", "purchase"),
        col("click_day") === col("purchase_day"), "full_outer")
      .select(coalesce(col("click_day"), col("purchase_day")).as("day"),
        coalesce(col("n_click"), lit(0L)).as("n_clicks"),
        coalesce(col("n_purchase"), lit(0L)).as("n_purchases"))
      .orderBy(col("day"))
  }

  /** Native session windows: the same 30-minute-gap sessions as
    * qSessionize but through Spark's `session_window` operator
    * (SessionWindowing + merging session aggregate) instead of
    * lag/sum island windows. Two practical differences at scale:
    * the native form needs ONE aggregation (no per-user sort window
    * over the whole history) and runs unchanged on a watermarked
    * stream (streaming session aggregation). Boundary semantics:
    * only a gap STRICTLY greater than 30 min starts a new session —
    * [ts, ts+gap) windows that merely touch at the edge still merge
    * (verified empirically on Spark 4.1.2) — which the oracle
    * mirrors. */
  def qSessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("sess_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("sess_start"))

  /** Pivot: order counts per status x priority, priorities as columns. */
  def qPivot(s: SparkSession, d: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val renames = Map("1-URGENT" -> "p_urgent", "2-HIGH" -> "p_high",
      "3-MEDIUM" -> "p_medium", "4-NOT SPECIFIED" -> "p_unspec", "5-LOW" -> "p_low")
    val pivoted = Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
    renames.foldLeft(pivoted) { case (df, (from, to)) => df.withColumnRenamed(from, to) }
      .na.fill(0L)
      .orderBy(col("o_orderstatus"))
  }

  /** Exact interpolated percentiles per group (the exact counterpart
    * of the approx sketch path; rounded to 1e-6 because the two
    * engines' interpolation differs in the last ulp). */
  def qPercentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99_price"))
      .orderBy(col("l_returnflag"))

  val QuantileAccuracy = 10000

  /** Raw sketch values — engine-specific, so never oracle-hashed;
    * ApproxQuantileSpec checks them against exact order statistics. */
  private[graft] def approxQuantileRaw(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"approx_percentile(l_quantity, 0.5, $QuantileAccuracy)").as("ap50_qty"),
        expr(s"approx_percentile(l_quantity, 0.9, $QuantileAccuracy)").as("ap90_qty"),
        expr(s"approx_percentile(l_extendedprice, 0.99, $QuantileAccuracy)").as("ap99_price"))

  /** Quantile SKETCH path — the percentile you'd actually run at
    * 100 TB: `approx_percentile` keeps a bounded KLL-style buffer per
    * group with associative merge (one shuffle of sketch state, never
    * of values), vs the exact `percentile`'s collect-all-values
    * buffer in qPercentiles. The sketch VALUES are engine-specific,
    * so the query emits the engine-independent verdict instead: the
    * returned value's rank interval in the actual data must overlap
    * the target rank ± n/accuracy (±1 rank of convention slack) — the
    * sketch's documented guarantee. The oracle recomputes group sizes
    * exactly and expects every verdict `true`, making the driver's
    * hash compare a deterministic pass/fail on the rank bound.
    * Plan shape: one aggregate for the sketches, then one broadcast
    * of the 3-row sketch frame back over the fact for the rank
    * counts — the fact table is scanned, never shuffled on values. */
  def qApproxQuantile(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val ap = approxQuantileRaw(s, d)
    val ranks = li.join(broadcast(ap), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("l_quantity") < col("ap50_qty"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("l_quantity") <= col("ap50_qty"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_quantity") < col("ap90_qty"), 1L).otherwise(0L)).as("lt90"),
        sum(when(col("l_quantity") <= col("ap90_qty"), 1L).otherwise(0L)).as("le90"),
        sum(when(col("l_extendedprice") < col("ap99_price"), 1L).otherwise(0L)).as("lt99"),
        sum(when(col("l_extendedprice") <= col("ap99_price"), 1L).otherwise(0L)).as("le99"))
    def ok(lt: String, le: String, p: Double) = {
      val tol = col("cnt").cast(DoubleType) / QuantileAccuracy + 1.0
      val target = col("cnt").cast(DoubleType) * p
      (col(lt).cast(DoubleType) <= target + tol) &&
        (col(le).cast(DoubleType) >= target - tol)
    }
    ranks.select(col("l_returnflag"), col("cnt"),
        ok("lt50", "le50", 0.5).as("ok50"),
        ok("lt90", "le90", 0.9).as("ok90"),
        ok("lt99", "le99", 0.99).as("ok99"))
      .orderBy(col("l_returnflag"))
  }

  /** The SQL front door: the same engine consumed through
    * `spark.sql(...)` over registered views — proving DataFrame and
    * SQL surfaces are interchangeable (both compile to the same
    * Catalyst plans). */
  def qSqlInterface(s: SparkSession, d: String): DataFrame = {
    // namespaced view name: registering plain "lineitem" would shadow
    // any catalog table of that name for the rest of the session
    Tables.lineitem(s, d).createOrReplaceTempView("graft_sql_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_rev,
        |  count(*) AS cnt
        |FROM graft_sql_lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** Multiset set operators (ALL variants keep duplicates). */
  def qSetOpsAll(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def types(parity: Int) =
      ev.filter(col("user_id") % 2 === parity).select(col("event_type"))
    val inter = types(0).intersectAll(types(1))
      .select(lit("intersect_all").as("tag"), col("event_type"))
    val exc = types(0).exceptAll(types(1))
      .select(lit("except_all").as("tag"), col("event_type"))
    inter.unionAll(exc)
      .groupBy(col("tag"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("tag"), col("event_type"))
  }

  /** Array function family: sort / distinct / slice / reverse /
    * contains / position, flattened to strings for portability. */
  def qArrayFuncs(s: SparkSession, d: String): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        array_join(slice(array_sort(array_distinct(toks)), 1, 5), ",").as("first5_sorted"),
        array_join(slice(reverse(toks), 1, 3), ",").as("last3_reversed"),
        size(array_distinct(toks)).cast(LongType).as("n_distinct"),
        array_contains(toks, "spark").as("has_spark"),
        array_position(toks, "query").cast(LongType).as("query_pos"))
      .orderBy(col("doc_id"))
  }

  /** MapType roundtrip: per-user event-type counts packed into a map
    * column (sorted entries — deterministic), then exploded back out.
    * Exercises map_from_entries / explode-of-map; the oracle computes
    * the same rows relationally. */
  def qMapFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
      .select(col("user_id"), explode(col("m")).as(Seq("event_type", "cnt")))
      .orderBy(col("user_id"), col("event_type"))

  /** Second string-function family: pad / translate / reverse /
    * repeat / edit distance. */
  def qStringFuncs2(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_lpad"),
        rpad(col("p_brand"), 12, ".").as("brand_rpad"),
        translate(col("p_type"), "AEIOU", "aeiou").as("type_lowvowel"),
        reverse(col("p_name")).as("name_rev"),
        repeat(substring(col("p_brand"), 1, 2), 3).as("brand_rep"),
        levenshtein(col("p_brand"), col("p_type")).cast(LongType).as("brand_type_dist"),
        levenshtein(col("p_name"), reverse(col("p_name"))).cast(LongType).as("palindromicity"))
      .orderBy(col("p_partkey"))

  /** Correlated scalar subquery: each order against its customer's
    * max order value (expressed as window-free join+agg — the plan a
    * decorrelator produces). */
  def qScalarSubquery(s: SparkSession, d: String): DataFrame = {
    val maxPerCust = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("mk"))
      .agg(max(col("o_totalprice")).as("cust_max"))
    Tables.orders(s, d)
      .join(maxPerCust, col("o_custkey") === col("mk"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("cust_max"),
        (col("o_totalprice") === col("cust_max")).as("is_biggest"))
      .orderBy(col("o_orderkey"))
  }

  /** As-of join (temporal "most recent matching earlier row"),
    * composed per the custom-operator preference ladder's rule (a):
    * when key equality holds and "as-of" means latest-prior-in-time,
    * the join collapses to ONE window pass over the union of both
    * relations — here a self as-of ("most recent prior error event per
    * user") is a single shuffle on user_id, no join at all. A custom
    * LogicalPlan/Strategy would only be warranted for tolerance-
    * bounded or cross-key as-of, which Spark cannot express this
    * cheaply. */
  def qAsofLastError(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("last_error_us",
        last(when(col("event_type") === "error", col("us")), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("us"), col("last_error_us"),
        expr("(us - last_error_us) div 1000000").as("sec_since_error"))
      .orderBy(col("event_id"))
  }

  /** TPC-H Q4-style: orders per priority that had at least one late
    * shipment (ship > order date + 30 days) — EXISTS expressed as a
    * left-semi hash join with an extra non-equi condition (the dedup
    * of matching lineitems is free in the semi join). */
  def q4LateOrders(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    // interval addition, NOT date_add: date_add truncates the
    // timestamp to a date (midnight), silently diverging from the
    // oracle's `+ INTERVAL 30 DAY` on any non-midnight order date
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q12-style: per return flag, high- vs low-priority order
    * counts for a ship-date year — CASE aggregation over a fact-fact
    * join. */
  def q12PriorityShip(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))

  val LargeOrderQty = 150.0

  /** TPC-H Q18-style large-volume orders: customers whose order's
    * total quantity exceeds the threshold — group-HAVING feeding a
    * join back to the fact (the aggregate is the small side and
    * broadcasts). */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(38, 6))).as("sum_qty"))
      .filter(col("sum_qty") > LargeOrderQty)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_totalprice"), col("sum_qty").cast(DoubleType).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q19-style disjunctive revenue: three OR-ed (brand, size,
    * quantity-band) triples — the pushdown stress test: the disjunction
    * must still prune at the scans (each disjunct's common l/p
    * conditions reach the parquet filters). */
  def q19Disjunctive(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    li.join(p, col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30))))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(38, 6))).cast(DoubleType).as("revenue"))
  }

  /** TPC-H Q7-style volume shipping: revenue between two nations by
    * year — multi-join with a disjunctive nation pair predicate. */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).filter(
      col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
      col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
    li.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sk"))
      .join(broadcast(n2), col("c_nationkey") === col("ck"))
      .filter(
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q14-style promo revenue share: one full-fact scan, part dim
    * broadcast, both the conditional and total revenue as decimal-exact
    * sums in ONE aggregate — the ratio is a single deterministic double
    * division. */
  def q14PromoRevenue(s: SparkSession, d: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-10-01").cast(TimestampType))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
        dsum(rev)).as("promo_revenue"))
  }

  /** TPC-H Q17-style small-quantity revenue: the correlated
    * 0.2*avg(quantity) subquery becomes a per-part aggregate joined
    * back — computed only for the filtered parts (semi join BEFORE the
    * aggregate, so at scale the threshold build touches the brand's
    * lineitems, not the whole fact). */
  def q17SmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val pf = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#13" && col("p_size") < 15)
    val li = Tables.lineitem(s, d)
    val thresh = li
      .join(broadcast(pf.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey").as("tp"))
      .agg((davg(col("l_quantity")) * 0.2).as("qty_thresh"))
    li.join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(broadcast(thresh), col("l_partkey") === col("tp"))
      .filter(col("l_quantity") < col("qty_thresh"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q13-style order-count distribution: left join keeps
    * zero-order customers (count of a null key is 0), then a second
    * tiny aggregate over the counts. */
  def q13OrderDistribution(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q8-style market share: the national supplier's share of
    * LARGE-part revenue among an entire region's customers, per year.
    * part/supplier/nation/region broadcast; orders and customer are
    * fact-sized at scale, so the plan carries their two shuffle joins
    * plus the final year group-by (which the filtered-part selectivity
    * makes small) — the quadratic risk is zero, the shuffles are the
    * honest minimum for a three-fact join. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val custNations = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("ck"))
    val suppNations = Tables.nation(s, d)
      .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "LARGE")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1998-01-01").cast(TimestampType)),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNations), col("c_nationkey") === col("ck"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNations), col("s_nationkey") === col("sk"))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg((dsum(when(col("supp_nation") === "NATION_2", rev).otherwise(lit(0.0))) /
        dsum(rev)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q10-style returned items: customers ranked by revenue lost
    * to returns in a quarter. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d).filter(
      col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
      col("o_orderdate") < lit("1997-04-01").cast(TimestampType))
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** RANGE window frame (value-based, vs the ROWS frames elsewhere):
    * for each order, count of the customer's orders within $10k below
    * its price. Peers aggregate identically regardless of row order —
    * no tie-break needed by construction. */
  def qRangeFrame(s: SparkSession, d: String): DataFrame = {
    // integer-cents ordering key: RANGE offsets must be integral, and
    // cents are exact where raw double prices are not
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("cents"))
      .rangeBetween(-1000000L, 0L) // $10k in cents
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_within_10k"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).over(w)
          .cast(DoubleType).as("sum_within_10k"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Distribution window functions: percent_rank / cume_dist / ntile.
    * All are exact integer-ratio formulas, deterministic under the
    * total ordering. */
  def qRankStats(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
    Tables.part(s, d)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        rank().over(w).cast(LongType).as("rk"),
        dense_rank().over(w).cast(LongType).as("drk"))
      .orderBy(col("p_brand"), col("p_partkey"))
  }

  /** Positional window functions: first / last-so-far / nth value per
    * customer order history. */
  def qFirstNth(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("latest_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Null-handling scalar functions: nullif / coalesce / greatest /
    * least over genuine nulls manufactured by nullif. */
  def qNullFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_line"),
        nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_defaulted"),
        greatest(col("l_quantity"), col("l_discount") * 100, col("l_tax") * 100).as("g"),
        least(col("l_quantity"), col("l_discount") * 100, col("l_tax") * 100).as("l"))
      .orderBy(col("l_orderkey"), col("l_line"))

  /** Date arithmetic family: offsets, month math, boundaries. */
  def qDateArith(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30d"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        dayofweek(col("o_orderdate")).cast(LongType).as("dow"))
      .orderBy(col("o_orderkey"))

  /** TPC-H Q21-style "suppliers who kept orders waiting": for finished
    * orders, the lineitems of the ONLY late supplier in a multi-supplier
    * order — a semi-join AND an anti-join against the SAME fact table
    * with a correlated inequality (late = ship > order date + 60 days;
    * the harness lineitem has no commit/receipt dates, reference
    * semantics preserved via the order-date offset).
    *
    * Plan shape (the point of the exercise): both EXISTS and NOT EXISTS
    * become hash joins — lineitem⨝orders once to tag lateness, then
    * left-semi (some other supplier in the order) and left-anti (no
    * OTHER late supplier in the order) on l_orderkey with the
    * suppkey-inequality as the join residual. No per-row subquery, no
    * cartesian; the supplier dim broadcasts. PlanAuditSpec pins the
    * no-cartesian property; the semi/anti pair shuffles the fact on
    * l_orderkey once each — at 100 TB both reuse the same hash
    * partitioning and the late set is already a tiny fraction. */
  def q21WaitingSupplier(s: SparkSession, d: String): DataFrame = {
    val late = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val allLines = Tables.lineitem(s, d).select(
      col("l_orderkey").as("o2_orderkey"), col("l_suppkey").as("o2_suppkey"))
    val lateOther = late.select(
      col("l_orderkey").as("o3_orderkey"), col("l_suppkey").as("o3_suppkey"))
    late
      .join(allLines, // EXISTS: another supplier contributed to the order
        col("o2_orderkey") === col("l_orderkey") &&
        col("o2_suppkey") =!= col("l_suppkey"), "left_semi")
      .join(lateOther, // NOT EXISTS: no OTHER supplier was also late
        col("o3_orderkey") === col("l_orderkey") &&
        col("o3_suppkey") =!= col("l_suppkey"), "left_anti")
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q15-style top supplier: quarterly revenue per supplier, keep
    * whoever hit the maximum — the max is a 1-row aggregate joined back
    * (broadcast scalar-subquery shape, same as qScalarSubquery), and
    * the equality compares DECIMAL revenue values so ties and the
    * max-match are exact on both engines before the final double cast. */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    // the revenue aggregate feeds both the max and the equality probe;
    // without materialization Catalyst plans TWO lineitem scans
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(38, 6))).as("rev"))
      .localCheckpoint(false)
    val mx = rev.agg(max(col("rev")).as("mx"))
    rev.crossJoin(mx).filter(col("rev") === col("mx"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast(DoubleType).as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q22-style idle wealthy customers: above-average balance and
    * no orders since 2000 (every harness customer has SOME order, so
    * the reference's no-orders-ever predicate adapts to a recency
    * window), counted per nation. The average threshold is compared in
    * fixed-point space (bal_fp * n > sum_fp — multiplying out the
    * division) with the sum and product carried as DECIMAL(38,0): a
    * long sum of 1e9-scale fixed-point balances over billions of
    * customers overflows (ANSI throw or silent wrap), while the DuckDB
    * oracle's HUGEINT would not — the cut must stay bit-exact on both
    * engines at any corpus size. The no-recent-orders predicate is a
    * left-anti hash join whose date filter pushes into the orders
    * scan, and the 1-row aggregate broadcasts. */
  def q22IdleCustomers(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .withColumn("bal_fp", expr("cast(floor(c_acctbal * 1e6 + 0.5) as bigint)"))
    val positive = cust.filter(col("c_acctbal") > 0)
      .agg(sum(col("bal_fp").cast(DecimalType(38, 0))).as("sum_fp"),
        count(lit(1)).as("n_pos"))
    cust.crossJoin(positive)
      .filter(col("bal_fp").cast(DecimalType(38, 0)) * col("n_pos") > col("sum_fp"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= "2000-01-01").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** Conditional aggregation: CASE WHEN inside aggregates. */
  def qCaseAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("n_urgent"),
        sum(when(col("o_totalprice") > 200000, 1L).otherwise(0L)).as("n_big"),
        count(lit(1)).as("cnt"))
      .orderBy(col("o_orderstatus"))

  // ------------------- partsupp-dependent TPC-H shapes (Q2/Q9/Q11/Q16/Q20)
  // over the derived table (Tables.partsupp — deterministic, shared
  // with the oracle by absolute path)

  /** TPC-H Q2 analog: minimum-cost supplier per size-15 part within
    * region EUROPE (adapted to the harness columns — no p_mfgr /
    * s_address). Spark-first min-cost-per-group: aggregate the min
    * over the region-scoped supply graph, join back on (part, cost) —
    * two passes over a dim-sized frame, no correlated subquery. The
    * region/nation dims broadcast; partsupp joins supplier on the
    * supp key (dim-sized) before touching part. s_suppkey rides along
    * as the deterministic final tie-break. */
  def q2MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val europe = broadcast(Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name")))
    val supplyEu = Tables.partsupp(s, d)
      .join(Tables.supplier(s, d), col("ps_suppkey") === col("s_suppkey"))
      .join(europe, col("s_nationkey") === col("n_nationkey"))
    val minCost = supplyEu.groupBy(col("ps_partkey").as("mc_partkey"))
      .agg(min(col("ps_supplycost")).as("mc_cost"))
    supplyEu
      .join(Tables.part(s, d).filter(col("p_size") === 15),
        col("ps_partkey") === col("p_partkey"))
      .join(minCost, col("ps_partkey") === col("mc_partkey") &&
        col("ps_supplycost") === col("mc_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("ps_supplycost"), col("s_suppkey"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"), col("s_suppkey"))
      .limit(100)
  }

  /** TPC-H Q9 analog: profit (revenue minus supply cost) by supplier
    * nation and order year for parts named like '%red%'. The two fact
    * tables join on their full composite key (l_partkey, l_suppkey);
    * part prunes first (broadcast after the LIKE filter), dims
    * broadcast, one final shuffle on (nation, year). */
  def q9ProductProfit(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%red%"))
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(Tables.partsupp(s, d),
        col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("ps_supplycost") * col("l_quantity")).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q11 analog: parts whose stock value at NATION_7's suppliers
    * exceeds a SCALE-INVARIANT share of that nation's total stock
    * value — `value * |part| > total * 2`, i.e. twice the average
    * per-part share (TPC-H itself scales Q11's fraction by 1/SF for
    * the same reason: a fixed fraction flattens to an empty result as
    * the catalog grows). At |part| = 2000 this is exactly the 0.1%
    * threshold the sf0.01 oracle gate pins. The total and the part
    * count are one-row broadcast scalars (crossJoin of an aggregate —
    * the qTopCustomers pattern), never a driver round-trip; both
    * sides of the comparison use the same decimal-exact sum. */
  def q11ImportantStock(s: SparkSession, d: String): DataFrame = {
    val nation7 = broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_7")
      .select(col("n_nationkey")))
    val stock = Tables.partsupp(s, d)
      .join(broadcast(Tables.supplier(s, d)), col("ps_suppkey") === col("s_suppkey"))
      .join(nation7, col("s_nationkey") === col("n_nationkey"))
    val perPart = stock.groupBy(col("ps_partkey"))
      .agg(dsum(col("ps_supplycost") * col("ps_availqty")).as("value"))
    val total = perPart.agg(dsum(col("value")).as("total"))
    val nPart = Tables.part(s, d).agg(count(lit(1)).as("n_part"))
    perPart.crossJoin(broadcast(total)).crossJoin(broadcast(nPart))
      .filter(col("value") * col("n_part") > col("total") * 2.0)
      .select(col("ps_partkey"), col("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  /** TPC-H Q16 analog: how many distinct suppliers can supply each
    * (brand, type, size) combination — excluding one brand, MEDIUM
    * types, sizes outside the catalog list, and suppliers in deficit
    * (s_acctbal < 0; the harness schema has no s_comment to match
    * TPC-H's complaint clause). Anti-join for the exclusion, distinct
    * count after a broadcast part join. */
  def q16PartsSupplier(s: SparkSession, d: String): DataFrame = {
    val sizes = Seq(1, 4, 7, 10, 14, 23, 45, 49).map(lit(_))
    val parts = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#45" &&
        !col("p_type").like("MEDIUM%") && col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.partsupp(s, d)
      .join(Tables.supplier(s, d).filter(col("s_acctbal") < 0)
          .select(col("s_suppkey")),
        col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q20 analog: NATION_3 suppliers holding excess stock
    * (availqty > half of 1997 shipped quantity) of 'small%' parts.
    * The shipped-quantity aggregate is computed once per
    * (part, supplier) pair and joined INNER — a pair never shipped in
    * 1997 fails TPC-H's NULL comparison, and the inner join reproduces
    * exactly that. Semi join surfaces each supplier once. */
  def q20PotentialPromo(s: SparkSession, d: String): DataFrame = {
    val qty97 = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsum(col("l_quantity")).as("qty"))
    val excess = Tables.partsupp(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("small%"))
        .select(col("p_partkey"))), col("ps_partkey") === col("p_partkey"))
      .join(qty97, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") > col("qty") * 0.5)
      .select(col("ps_suppkey"))
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_3")
        .select(col("n_nationkey"))), col("s_nationkey") === col("n_nationkey"))
      .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_name"), col("s_suppkey"))
  }

  /** Pre-flight JOIN-SKEW AUDIT — the number a 100 TB pipeline checks
    * before picking a join strategy for each key (nothing / AQE skew
    * split / salting, [[SkewJoin]]): per join-key column, total rows,
    * distinct keys, the heaviest key with its count (ties toward the
    * lowest key — the deterministic-top convention via a struct max,
    * no second pass), and the skew factor max_cnt/avg_cnt in
    * fixed-point ×1e6 over Decimal(38,0) intermediates (the BM25
    * convention: max_cnt·n_keys·1e6 passes Int64 on a 100 TB fact
    * table). One aggregation pass per audited column, output bounded
    * at one row each — the cost of a count(*), not a sort.
    * Output: (key_col, n_rows, n_keys, max_cnt, top_key, skew_x1e6). */
  def qJoinSkewAudit(s: SparkSession, d: String): DataFrame = {
    def audit(df: DataFrame, keyCol: String): DataFrame =
      df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cnt"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(struct(col("cnt"), (-col("k")).as("nk"))).as("m"))
        .select(lit(keyCol).as("key_col"), col("n_rows"), col("n_keys"),
          col("m.cnt").as("max_cnt"), (-col("m.nk")).as("top_key"),
          expr("(cast(m.cnt as decimal(38,0)) * n_keys * 1000000) div n_rows")
            .as("skew_x1e6"))
    val li = Tables.lineitem(s, d)
    audit(li, "l_orderkey")
      .unionAll(audit(li, "l_partkey"))
      .unionAll(audit(li, "l_suppkey"))
      .unionAll(audit(Tables.orders(s, d), "o_custkey"))
      .unionAll(audit(Tables.events(s, d), "user_id"))
      .orderBy(col("key_col"))
  }
}
