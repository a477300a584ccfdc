package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream operators over the `events` table (ts, user_id,
  * event_type, value, props). The reference has no event-time model
  * (SURVEY.md §2.9) — these are the extension surface, batch-first so the
  * DuckDB oracle stays comparable; `graft.streaming` holds the Structured
  * Streaming variants.
  *
  * Scale: every op is a single hash-shuffle on the entity key (user_id) or a
  * pure map — no driver-side state; sessionization is the standard
  * lag+cumsum formulation which AQE can re-plan for skewed users.
  */
object EventsOps {

  /** Ordered funnel analysis: for each user, match `steps` as an ordered
    * subsequence with EARLIEST-FIRST semantics — t0 = the user's first
    * step-0 event, then t(i) = the first step-i event at or after t(i−1) —
    * and count, per step, the users whose chain reaches it within
    * `windowSeconds` of t0. Earliest-first is the standard deterministic
    * funnel semantic (a later anchor could occasionally convert where the
    * first does not; determinism and cross-engine restatability win here,
    * and the oracle mirrors the same rule).
    *
    * Plan shape: one filtered scan per step (the `event_type = s` predicate
    * pushes to parquet) with a user-keyed min-aggregation, chained by
    * user-keyed joins — k steps = k tiny aggregations co-keyed on user_id,
    * no window functions, no per-user event buffering. At 100 TB the step
    * frames are small (one row per converting user) and AQE broadcasts the
    * later, shrinking chain sides. */
  /** Exponential freshness decay as EXACT integer ppm — the recency
    * weighting every "prefer newer data" mixture needs, with the float
    * `exp(−age/τ)` replaced by halving per half-life:
    * `weight = 10⁶ DIV 2^(age_hours DIV halfLife)`, capped at 20 halvings
    * (≤ 1 ppm ≈ zero). Pure integer shifts — bit-identical anywhere;
    * piecewise-constant within a half-life, which is what makes it
    * reproducible (a continuous exp would hang the weight on float
    * rounding of the age). Age is measured in whole hours from `refTs`
    * (pass the corpus max or a pinned wall-clock). */
  def freshnessWeightPpm(ts: Column, refTs: Column,
      halfLifeHours: Long): Column = {
    require(halfLifeHours >= 1, "freshnessWeightPpm: halfLifeHours >= 1")
    import org.apache.spark.sql.graft.Bridge
    val ageH = Bridge.idiv(unix_micros(refTs), lit(3600000000L)) -
      Bridge.idiv(unix_micros(ts), lit(3600000000L))
    // Clamp below at 0: a ts AFTER refTs (clock skew, future-dated rows)
    // would make the halving count negative, and shiftleft(1L, -1) is
    // Long.MIN_VALUE under Java shift semantics — the row would silently
    // score fully stale. Negative age reads as age 0 (full weight).
    val n = least(greatest(Bridge.idiv(ageH, lit(halfLifeHours)), lit(0L)),
      lit(20L)).cast("int")
    val pow2 = Bridge.column(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
      Bridge.expression(lit(1L)), Bridge.expression(n)))
    Bridge.idiv(lit(1000000L), pow2)
  }

  def funnel(events: DataFrame, steps: Seq[String],
      windowSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      .withColumn("t_prev", col("t0"))
    // frames(i) = one row per user whose chain reaches step i:
    // (user_id, t0, t_prev = match time of step i). Each frame appears in
    // the next step's plan AND its own union branch; the subtrees are
    // canonically identical, so runtime ReuseExchange executes each step
    // once despite the replicated plan text — per-step eager truncation
    // measured SLOWER (0.9 → 1.3 s at sf0.1: n extra jobs bought nothing).
    val frames = steps.drop(1).scanLeft(first) { (acc, s) =>
      events.filter(col("event_type") === s)
        .join(acc.select(col("user_id"), col("t0"), col("t_prev")), "user_id")
        .filter(col("ts") >= col("t_prev"))
        .groupBy(col("user_id"), col("t0"))
        .agg(min(col("ts")).as("t_prev"))
    }
    frames.zipWithIndex.map { case (f, i) =>
      // integer micros, not double-cast timestamps: exact in both engines
      f.filter(unix_micros(col("t_prev")) - unix_micros(col("t0"))
          <= windowSeconds * 1000000L)
        .agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("step"), lit(steps(i)).as("event_type"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Retention cohort analysis: users bucket into cohorts by the week of
    * their FIRST event (absolute week index = floor(epoch_us / 1 week) —
    * integer arithmetic, exact cross-engine), and each (cohort, offset)
    * cell counts users active `offset` weeks after their cohort week. The
    * companion report to [[funnel]] — "of the users who arrived in week W,
    * how many came back in week W+k".
    *
    * Plan: one user-keyed min-aggregation (first event), one distinct over
    * (user, week) — both two-phase with map-side combine — and a user
    * join; output is cohorts × offsets, tiny at any corpus size. */
  def retentionCohorts(events: DataFrame, maxOffset: Long): DataFrame = {
    val W = 7L * 86400L * 1000000L
    def week(ts: Column): Column =
      ((unix_micros(ts) - pmod(unix_micros(ts), lit(W))) / lit(W)).cast("long")
    val cohort = events.groupBy(col("user_id"))
      .agg(min(week(col("ts"))).as("cohort_week"))
    val active = events.select(col("user_id"), week(col("ts")).as("week")).distinct()
    active.join(cohort, "user_id")
      .withColumn("offset", col("week") - col("cohort_week"))
      .filter(col("offset").between(0, maxOffset))
      .groupBy(col("cohort_week"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Event-transition matrix ("what do users do next"): per user, order
    * events by (ts, event_id) — a total order, so the sequence is
    * deterministic under any partitioning — pair each event with its
    * successor via `lead`, and count (from, to) transitions. One user-keyed
    * window sort (spillable) + one tiny hash agg; the matrix is
    * |types|²-sized regardless of corpus size. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Time-bucketed aggregation (tumbling window as a group key).
    *
    * Sums accumulate in DECIMAL, not double: decimal addition is exact and
    * ORDER-INDEPENDENT, so the result is identical across engines and
    * partitionings — double accumulation differs in the last ulps by
    * summation order, and no rounding precision is safe against boundary
    * values (surfaced at sf0.1). The per-row double→decimal(30,10) cast is
    * deterministic in both engines. */
  def timeBucket(events: DataFrame, unit: String): DataFrame = {
    val s10 = sum(col("value").cast("decimal(30,10)"))
    events.groupBy(date_trunc(unit, col("ts")).as("h"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(s10.cast("double"), 2).as("s"),
        round(s10.cast("double") / count(lit(1)), 6).as("a"))
  }

  /** Mark each event with a new-session flag: a session breaks after
    * `gapSeconds` of inactivity per user. Exact-integer microsecond
    * comparison keeps it engine-reproducible.
    *
    * Boundary note: a gap of EXACTLY `gapSeconds` stays in-session here
    * (`>` breaks), while `session_window`/the stateful sessionizer start a
    * new session (end bound exclusive). Both conventions exist in the wild;
    * each op's oracle mirrors its own. */
  def withSessionFlag(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        (col("__prev_us").isNull ||
          unix_micros(col("ts")) - col("__prev_us") > gapSeconds * 1000000L).cast("int"))
      .drop("__prev_us")
  }

  /** Assign a per-user session index (cumulative sum of break flags). */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withSessionFlag(events, gapSeconds)
      .withColumn("session_id", sum(col("new_session")).over(w))
  }

  /** Sessions per user — the oracle-checkable reduction of sessionize. */
  def sessionCounts(events: DataFrame, gapSeconds: Long): DataFrame =
    withSessionFlag(events, gapSeconds)
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))

  /** Time-grid forward fill (last observation carried forward): per user, an
    * hourly grid spanning that user's activity, each cell holding the latest
    * `value` at or before it — the gap-free feature series a trainer
    * consumes. Hour index is integer `epoch_us div 3600000000` (portable
    * floor-div, same convention as the week cohorts). Per (user, hour) the
    * "latest" reading is the (ts, event_id)-max row — a total order, so the
    * series is deterministic under any partitioning.
    *
    * Plan: one (user, hour)-keyed window picks latest readings, one tiny
    * per-user min/max agg builds grid bounds, one user-keyed ordered window
    * fills — all three shuffles share the user key, and grid size is
    * users × span-hours, never event-count-sized. The first grid hour always
    * holds that user's first reading (grid starts at min event hour), so
    * every emitted cell is defined. */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val ev = events.withColumn("h", expr("unix_micros(ts) div 3600000000"))
    val latest = ev
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("user_id"), col("h"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("h"), col("value"))
    val grid = ev.groupBy(col("user_id"))
      .agg(min(col("h")).as("__h0"), max(col("h")).as("__h1"))
      .select(col("user_id"),
        explode(sequence(col("__h0"), col("__h1"))).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(latest, Seq("user_id", "h"), "left")
      .withColumn("filled", last(col("value"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("h"), col("filled"))
  }

  /** Incident-impact analysis: difference-in-differences of a per-event
    * value around a MARKER predicate (an error event, an outage window, an
    * experiment flag). All events split at the CORPUS MID-TIME (one
    * broadcast min/max — a common period boundary keeps the two
    * differences comparable; per-user t0 splits confound timing with
    * treatment); treated = users with ≥ 1 marker event, control = the
    * rest. did_micro = (post̄_t − prē_t) − (post̄_c − prē_c) in
    * milli-value micro units — the control difference subtracts seasonal
    * drift that a naive before/after would misread as impact. Marker
    * events themselves are excluded from the value means (they measure
    * the incident, not the behavior). Exact integer throughout
    * (⌊10³·value⌋, sign-split mean division). ALWAYS one row: an empty
    * cell (e.g. every user treated → no control) reports NULL means and a
    * NULL did — a report, never a vanished result. Returns (n_treated,
    * n_control, pre_t, post_t, pre_c, post_c, did_micro).
    *
    * 100 TB shape: one min/max broadcast, one user-keyed marker
    * semi-join flag, then ONE conditional-sum aggregation (the q229
    * constraint-audit shape: a cell adds a column, not a scan). */
  def didUplift(events: DataFrame, user: Column, ts: Column, value: Column,
      marker: Column): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val idiv = Bridge.idiv _
    def meanMicro(s: Column, n: Column): Column =
      when(n === 0, lit(null).cast("long"))
        .otherwise(when(s >= 0, idiv(s * 1000L, n))
          .otherwise(-idiv(-s * 1000L, n)))
    val base = events.select(user.as("u"), unix_micros(ts).as("t"),
      floor(value * 1000).cast("long").as("v"),
      marker.cast("long").as("is_marker"))
    val mid = base.agg(
      idiv(min(col("t")) + max(col("t")), lit(2L)).as("mid"))
    val treated = base.filter(col("is_marker") === 1)
      .select(col("u")).distinct()
    val flagged = base.filter(col("is_marker") === 0)
      .join(treated.withColumn("__tr", lit(1L)), Seq("u"), "left")
      .withColumn("tr", coalesce(col("__tr"), lit(0L)))
      .crossJoin(broadcast(mid))
      .withColumn("post", (col("t") >= col("mid")).cast("long"))
    def cell(tr: Int, post: Int): (Column, Column) = {
      val c = col("tr") === tr && col("post") === post
      (sum(when(c, col("v")).otherwise(0L)),
        sum(when(c, 1L).otherwise(0L)))
    }
    val Seq((st0, nt0), (st1, nt1), (sc0, nc0), (sc1, nc1)) =
      Seq(cell(1, 0), cell(1, 1), cell(0, 0), cell(0, 1))
    flagged.agg(
        countDistinct(when(col("tr") === 1, col("u"))).as("n_treated"),
        countDistinct(when(col("tr") === 0, col("u"))).as("n_control"),
        st0.as("s_t0"), nt0.as("n_t0"), st1.as("s_t1"), nt1.as("n_t1"),
        sc0.as("s_c0"), nc0.as("n_c0"), sc1.as("s_c1"), nc1.as("n_c1"))
      .select(col("n_treated"), col("n_control"),
        meanMicro(col("s_t0"), col("n_t0")).as("pre_t"),
        meanMicro(col("s_t1"), col("n_t1")).as("post_t"),
        meanMicro(col("s_c0"), col("n_c0")).as("pre_c"),
        meanMicro(col("s_c1"), col("n_c1")).as("post_c"))
      .withColumn("did_micro", (col("post_t") - col("pre_t")) -
        (col("post_c") - col("pre_c")))
  }

  /** Top opening journeys: each user's first `depth` event types in time
    * order, concatenated into a path string, ranked by frequency — the
    * "how do users start" product-analytics staple (and, for agent/SFT
    * logs, the dominant conversation openings). Per-user ordering uses
    * the sorted-struct-collect discipline (collect_list alone is
    * partition-order-dependent — the q98 rule); per-user payloads are
    * bounded by the user's event count (a data-model bound, the q231
    * argument). Top-k cuts with a bounded TakeOrdered, ties (n DESC,
    * path). Returns (path, n_users, rnk).
    *
    * 100 TB shape: one user-keyed aggregation + one path-keyed count +
    * TakeOrdered. */
  def openingPaths(events: DataFrame, user: Column, ts: Column,
      tie: Column, etype: Column, depth: Int = 4, k: Int = 10): DataFrame = {
    require(depth >= 1 && depth <= 16, "openingPaths: depth in [1, 16]")
    val paths = events
      .select(user.as("u"), struct(ts.as("t"), tie.as("i"),
        etype.as("e")).as("s"))
      .groupBy(col("u"))
      .agg(array_join(transform(slice(sort_array(collect_list(col("s"))),
        1, depth), x => x.getField("e")), ">").as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path")).limit(k)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_users").desc, col("path"))).cast("long"))
  }

  /** Accounting reconciliation between a header table and its detail
    * lines (orders vs lineitem totals — the cross-table VALUE-consistency
    * audit the FK check (q229) can't see: a key can match while the money
    * doesn't). Detail lines aggregate per key with order-independent
    * DECIMAL sums rounded to cents (the q04/Stable.sumD discipline — raw
    * double accumulation differs by partition order); headers LEFT-join
    * (a header with no lines is its own finding, not a dropped row).
    * Returns one row: n_headers, n_no_lines, n_matched (|diff| ≤
    * tolerance), n_mismatched, max_diff, sum_diff (both rounded, the sum
    * via decimal accumulation).
    *
    * 100 TB shape: one detail-keyed aggregation (map-side combine), one
    * key join, one scalar rollup. */
  def reconcileTotals(headers: DataFrame, hKey: Column, hTotal: Column,
      details: DataFrame, dKey: Column, dAmount: Column,
      tolerance: Double = 0.01): DataFrame = {
    val lines = details.groupBy(dKey.as("k"))
      .agg(graft.functions.Stable.sumDR(dAmount, 2).as("l_total"))
    headers.select(hKey.as("k"), hTotal.as("h_total"))
      .join(lines, Seq("k"), "left")
      .select(col("k"), col("h_total"), col("l_total"),
        when(col("l_total").isNull, lit(null).cast("double"))
          .otherwise(round(abs(col("l_total") - col("h_total")), 2))
          .as("diff"))
      .agg(count(lit(1)).as("n_headers"),
        sum(col("l_total").isNull.cast("long")).as("n_no_lines"),
        sum((col("diff") <= tolerance).cast("long")).as("n_matched"),
        sum((col("diff") > tolerance).cast("long")).as("n_mismatched"),
        round(coalesce(max(col("diff")), lit(0.0)), 2).as("max_diff"),
        graft.functions.Stable.sumDR(coalesce(col("diff"), lit(0.0)), 2)
          .as("sum_diff"))
  }

  /** Association rules over consecutive event transitions (the
    * support/confidence form of [[eventTransitions]] — Agrawal-style rule
    * mining at bigram granularity): confidence_ppm = 10⁶·n(a→b)/n(a→·),
    * lift_ppm = 10⁶·confidence/P(·→b), both exact integer; rules gate on
    * minimum support (rare antecedents make confident-looking noise — the
    * q225 rule). Returns (from_type, to_type, n, n_from, confidence_ppm,
    * lift_ppm) for rules with n ≥ minSupport.
    *
    * 100 TB shape: = [[eventTransitions]] (one user-keyed window) + two
    * broadcasts over the |types|²-sized matrix. */
  def transitionRules(events: DataFrame, minSupport: Long): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val idiv = Bridge.idiv _
    val m = eventTransitions(events).transform(graft.ops.Checkpoints.truncate(_))
    val fromTot = m.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    val toTot = m.groupBy(col("to_type")).agg(sum(col("n")).as("n_to"))
    val all = m.agg(sum(col("n")).as("n_all"))
    m.filter(col("n") >= minSupport)
      .join(broadcast(fromTot), Seq("from_type"))
      .join(broadcast(toTot), Seq("to_type"))
      .crossJoin(broadcast(all))
      .withColumn("confidence_ppm", idiv(col("n") * 1000000L, col("n_from")))
      // lift = confidence / P(->b): conf_ppm·n_all/n_to is already in ppm
      .withColumn("lift_ppm", expr(
        "CAST((CAST(confidence_ppm AS DECIMAL(38,0)) * n_all) DIV n_to AS BIGINT)"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        col("confidence_ppm"), col("lift_ppm"))
  }

  /** Conversion-latency profile: per user, the first `to` event at or
    * after their first `from` event; the report is the exact rank-based
    * p50/p90 of the latency distribution plus the exact mean — the funnel
    * companion that answers "how LONG does conversion take", not just how
    * often. Percentiles are exact order statistics (value at rank ⌈p·n⌉)
    * located with the q220/q243 tier trick — per-second latency tiers
    * with cumulative offsets, never a per-row sort window. All integer
    * (whole seconds; mean in micro-seconds-of-latency).
    *
    * 100 TB shape: two filtered user-keyed min-aggregations (predicates
    * push to the scan) joined on user, a |distinct latencies|-sized tier
    * relation, and covering-rank lookups broadcast back. */
  def conversionLatency(events: DataFrame, fromType: String,
      toType: String): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val idiv = Bridge.idiv _
    val from = events.filter(col("event_type") === fromType)
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("c"))
    val to = events.filter(col("event_type") === toType)
      .select(col("user_id"), unix_micros(col("ts")).as("p"))
    // lat feeds the tier histogram AND the totals, and offs/tot are each
    // consumed by BOTH percentile probes plus the final projection — left
    // lazy, Catalyst replays the events scans + user join ~6× (20 parquet
    // scans in the un-truncated plan). lat is converted-users-sized, offs
    // |distinct latencies|-sized, tot one row: materialize each once
    // (guide §2.4 — the transitionRules discipline).
    val lat = from.join(to, Seq("user_id")).filter(col("p") >= col("c"))
      .groupBy(col("user_id"), col("c")).agg(min(col("p")).as("p"))
      .select(idiv(col("p") - col("c"), lit(1000000L)).as("lat_s"))
      .transform(graft.ops.Checkpoints.truncate(_))
    val tiers = lat.groupBy(col("lat_s")).agg(count(lit(1)).as("cnt"))
    val wo = Window.orderBy(col("lat_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = tiers
      .withColumn("off", coalesce(sum(col("cnt")).over(wo), lit(0L)))
      .transform(graft.ops.Checkpoints.truncate(_))
    val tot = lat.agg(count(lit(1)).as("n"), sum(col("lat_s")).as("s"))
      .transform(graft.ops.Checkpoints.truncate(_))
    def at(pPpm: Long, name: String): DataFrame =
      tot.crossJoin(offs)
        .withColumn("r", greatest(lit(1L),
          idiv(col("n") * pPpm + 999999L, lit(1000000L))))
        .filter(col("r") > col("off") && col("r") <= col("off") + col("cnt"))
        .select(col("lat_s").as(name))
    tot.crossJoin(broadcast(at(500000L, "p50_s")))
      .crossJoin(broadcast(at(900000L, "p90_s")))
      .select(col("n").as("n_converted"), col("p50_s"), col("p90_s"),
        idiv(col("s") * 1000000L, col("n")).as("mean_micro_s"))
  }

  /** Churn hazard table (the discrete Kaplan–Meier life table, reported as
    * exact per-step hazards): users' lifetimes measure in whole days from
    * first to last activity; at each day offset t the table reports
    * n_at_risk (users whose lifetime ≥ t — the reverse cumulative sum of
    * the lifetime histogram) and n_churned (lifetime exactly t), and the
    * discrete hazard h_t = 10⁶·d_t/n_t. The hazard column IS the curve —
    * the cumulative survival product Π(1−h_t) is a float fold the caller
    * can apply to the bounded table; keeping the operator at the hazard
    * level keeps every reported number exact integer. The last observed
    * week is a CENSORING boundary, not a death — still-active-at-the-end
    * users churn at their last day here because the synthetic corpus has
    * a hard end; pass a refTs-filtered frame to censor properly.
    *
    * 100 TB shape: one user-keyed min/max aggregation, a |days|-sized
    * histogram, and a bounded reverse-cumsum window over that histogram
    * (days, not users). */
  def churnHazard(events: DataFrame, user: Column, ts: Column): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val W = 86400L * 1000000L
    val wk = Bridge.idiv(unix_micros(ts), lit(W))
    val lt = events.select(user.as("u"), wk.as("w"))
      .groupBy(col("u"))
      .agg((max(col("w")) - min(col("w"))).as("lifetime"))
    val hist = lt.groupBy(col("lifetime").as("t"))
      .agg(count(lit(1)).as("n_churned"))
    val wo = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    hist.withColumn("n_at_risk", sum(col("n_churned")).over(wo))
      .withColumn("hazard_ppm",
        Bridge.idiv(col("n_churned") * 1000000L, col("n_at_risk")))
      .select(col("t"), col("n_at_risk"), col("n_churned"),
        col("hazard_ppm"))
  }

  /** Semi-structured property profiling: extract one JSON path from a
    * string column and report its presence / numeric range per group —
    * the look-before-you-trust audit for JSON side channels (event
    * payloads, metadata bags) BEFORE a pipeline keys logic off them.
    * Extraction is Spark's codegen'd per-row JSON path read; the numeric
    * read is try_cast (a non-numeric or absent value is a MISSING row,
    * counted in missing_ppm, never an ANSI throw — the audit's job is to
    * report corruption, not crash on it). Returns (g, n, n_missing,
    * missing_ppm, n_distinct, v_min, v_max, v_sum).
    *
    * 100 TB shape: one group-keyed aggregation; the JSON parse rides the
    * scan. */
  def jsonPropProfile(events: DataFrame, group: Column, json: Column,
      path: String): DataFrame = {
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    val base = events.select(group.as("g"),
      get_json_object(json, path).as("__s"))
    base.select(col("g"), expr("try_cast(__s AS BIGINT)").as("v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").isNull.cast("long")).as("n_missing"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"),
        sum(coalesce(col("v"), lit(0L))).as("v_sum"))
      .withColumn("missing_ppm",
        idiv(col("n_missing") * 1000000L, col("n")))
      .select(col("g"), col("n"), col("n_missing"), col("missing_ppm"),
        col("n_distinct"), col("v_min"), col("v_max"), col("v_sum"))
  }

  /** Per-group activity trend: the exact ordinary-least-squares slope of
    * hourly event counts over time — the "is this source/type growing or
    * dying" number a crawl scheduler reads. x = whole hours since the
    * corpus's first hour (a one-row broadcast min keeps x small so the
    * closed-form products stay bounded), y = events in that hour, and the
    * slope is the OLS closed form (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    * reported in micro-events/hour with sign-split integer division (the
    * q230 rule) and DECIMAL(38,0) on both products (span·count products
    * pass Long on a year of hours × 10¹⁰ events by construction). NULL
    * when a group has fewer than two distinct hours (no line through one
    * point). Only OBSERVED hours enter — an idle hour is absent, not a
    * zero; compose with [[gapFill]] upstream when zeros should count.
    *
    * 100 TB shape: one (group, hour) aggregation, then a group-keyed
    * reduction of the five OLS sums — both two-phase with map-side
    * combine; nothing is ordered, nothing windows. */
  def trendSlope(events: DataFrame, group: Column, ts: Column): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val hr = Bridge.idiv(unix_micros(ts), lit(3600000000L))
    val base = events.select(group.as("g"), hr.as("h"))
    val h0 = base.agg(min(col("h")).as("h0"))
    val cells = base.crossJoin(broadcast(h0))
      .select(col("g"), (col("h") - col("h0")).as("x"))
      .groupBy(col("g"), col("x")).agg(count(lit(1)).as("y"))
    cells.groupBy(col("g"))
      .agg(count(lit(1)).as("n_hours"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      .withColumn("num", expr(
        "CAST(n_hours AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("den", expr(
        "CAST(n_hours AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("slope_micro", when(col("den") === 0,
          lit(null).cast("long"))
        .otherwise(expr(
          """CAST(CASE WHEN num >= 0 THEN (num * 1000000) DIV den
            |ELSE -((-num * 1000000) DIV den) END AS BIGINT)""".stripMargin)))
      .select(col("g"), col("n_hours"), col("sy").as("n_events"),
        col("slope_micro"))
  }

  /** Winsorized robust statistics per group (Tukey; the metric-pipeline
    * standard for "mean without the outlier lie"): values clamp to the
    * [pLow, pHigh] rank-based percentile bounds of their own group before
    * averaging, so a handful of broken-instrumentation rows can't drag the
    * per-type mean. Values quantize to milli units (⌊10³·v⌋ — the
    * embedding-quantization discipline: floor of a double product is the
    * same IEEE op in every engine); bounds are EXACT rank statistics
    * (value at rank ⌈p·n⌉, no interpolation), found via the q220 tier
    * trick: per-(group, value) counts with a cumulative offset locate the
    * covering tier — no per-row sort window, so a group's rows never
    * serialize through one partition. Mean division is sign-split (the
    * q230 truncate-vs-floor rule). Returns (g, n, lo_milli, hi_milli,
    * raw_mean_milli, win_mean_milli).
    *
    * 100 TB shape: one (group, value-tier) aggregation (tier relation ≤
    * distinct quantized values — bounded far below row count), a
    * tier-sized window per group, and one group-keyed clamp+sum pass with
    * the bounds broadcast back. */
  def winsorizedStats(events: DataFrame, group: Column, value: Column,
      pLowPpm: Long = 50000L, pHighPpm: Long = 950000L): DataFrame = {
    require(pLowPpm >= 0 && pLowPpm < pHighPpm && pHighPpm <= 1000000L,
      "winsorizedStats: need 0 <= pLow < pHigh <= 1e6")
    val idiv = org.apache.spark.sql.graft.Bridge.idiv _
    def meanOf(s: Column, n: Column): Column =
      when(s >= 0, idiv(s * 1000L, n)).otherwise(-idiv(-s * 1000L, n))
    val base = events.select(group.as("g"),
      floor(value * 1000).cast("long").as("v"))
    val tiers = base.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val wo = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = tiers
      .withColumn("off", coalesce(sum(col("cnt")).over(wo), lit(0L)))
    val ns = base.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .withColumn("rlo", greatest(lit(1L),
        idiv(col("n") * pLowPpm + 999999L, lit(1000000L))))
      .withColumn("rhi", greatest(lit(1L),
        idiv(col("n") * pHighPpm + 999999L, lit(1000000L))))
    def boundAt(rank: Column, name: String): DataFrame =
      ns.join(offs, Seq("g"))
        .filter(rank > col("off") && rank <= col("off") + col("cnt"))
        .select(col("g"), col("v").as(name))
    val lo = boundAt(col("rlo"), "lo_milli")
    val hi = boundAt(col("rhi"), "hi_milli")
    base.join(broadcast(lo), Seq("g")).join(broadcast(hi), Seq("g"))
      .withColumn("vw",
        least(greatest(col("v"), col("lo_milli")), col("hi_milli")))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("lo_milli")).as("lo_milli"),
        min(col("hi_milli")).as("hi_milli"),
        sum(col("v")).as("raw_sum"), sum(col("vw")).as("win_sum"))
      .select(col("g"), col("n"), col("lo_milli"), col("hi_milli"),
        meanOf(col("raw_sum"), col("n")).as("raw_mean_micro"),
        meanOf(col("win_sum"), col("n")).as("win_mean_micro"))
  }

  /** Conversation-structure audit for instruction-tuning data: given an
    * interaction log mapped to (conversation, turn-order, role, token
    * count), validate per conversation the structural contract SFT
    * training assumes — starts with a user turn, roles strictly
    * alternate — and compute the loss-mask token splits (assistant tokens
    * train; user tokens are context). Returns one row per conversation:
    * (conv_id, n_turns, n_user_turns, n_asst_turns, asst_tok, user_tok,
    * starts_user, alternates, valid).
    *
    * 100 TB shape: ONE conversation-keyed aggregation (collect_list of a
    * (ts, tie, role-bit, tokens) struct, sort_array for deterministic
    * in-conversation order) and pure array HOFs after — conversations are
    * bounded (a chat is not a corpus), so the per-group array is small by
    * the data model; no window, no self-join. The alternation check walks
    * adjacent pairs via element_at over the POST-AGGREGATION attribute
    * (already materialized — the q197 lambda-inlining trap only bites
    * expression aliases, not agg outputs). */
  def conversationAudit(log: DataFrame, convId: Column, orderBy: Column,
      tieBreak: Column, isUser: Column, nTok: Column): DataFrame = {
    val turns = log.select(convId.as("conv_id"),
        struct(orderBy.as("o"), tieBreak.as("tb"),
          isUser.cast("long").as("u"), nTok.as("tk")).as("t"))
      .groupBy(col("conv_id"))
      .agg(sort_array(collect_list(col("t"))).as("ts"))
    turns
      .withColumn("n_turns", size(col("ts")).cast("long"))
      .withColumn("n_user_turns",
        aggregate(col("ts"), lit(0L), (a, x) => a + x.getField("u")))
      .withColumn("asst_tok", aggregate(col("ts"), lit(0L),
        (a, x) => a + when(x.getField("u") === 0L, x.getField("tk"))
          .otherwise(0L)))
      .withColumn("user_tok", aggregate(col("ts"), lit(0L),
        (a, x) => a + when(x.getField("u") === 1L, x.getField("tk"))
          .otherwise(0L)))
      .withColumn("starts_user",
        (element_at(col("ts"), 1).getField("u") === 1L).cast("long"))
      // sequence(2, n) DESCENDS when n = 1 (Spark generates backwards
      // ranges) — a single-turn conversation alternates vacuously
      .withColumn("alternates", when(size(col("ts")) < 2, lit(1L)).otherwise(
        forall(sequence(lit(2), size(col("ts"))),
          i => element_at(col("ts"), i).getField("u") =!=
            element_at(col("ts"), i - 1).getField("u")).cast("long")))
      .select(col("conv_id"), col("n_turns"), col("n_user_turns"),
        (col("n_turns") - col("n_user_turns")).as("n_asst_turns"),
        col("asst_tok"), col("user_tok"), col("starts_user"),
        col("alternates"),
        (col("starts_user") === 1L && col("alternates") === 1L)
          .cast("long").as("valid"))
  }
}
