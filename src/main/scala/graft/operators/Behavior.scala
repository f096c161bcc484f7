package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftCaches.Persistable

/** Behavioral event analytics: the sequence / engagement / anomaly
  * operators a training-data or product pipeline runs over an event log
  * beside the sessionization family in [[Relational]]. Every operator here
  * is a declarative plan with key-local shuffles only — no per-user event
  * list is ever materialized in one row, no global single-partition window,
  * no driver-side loop — so each one survives a 100 TB event table exactly
  * as written.
  */
object Behavior {

  /** `Column./` is DOUBLE division — integer-divide exactly instead:
    * `(a − a mod b)/b` is an exact multiple, so the double round-trip is
    * lossless for any realistic count (< 2^53). Matches DuckDB's `//` for
    * the non-negative operands every caller here has. */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** MARKOV TRANSITION MATRIX — `(event_type, next_type)` transition counts
    * and probabilities from each user's time-ordered event stream: the
    * first-order sequence model behind next-action prediction and
    * anomalous-flow detection.
    *
    * Shape at scale: ONE `user`-partitioned window pass pairs each event
    * with its successor (`lead`), then two partial-aggregated hash
    * aggregates (pair counts, then per-source totals) meet in a join on
    * `event_type` — broadcast-sized, since its cardinality is the type
    * vocabulary, not the event count. The probability is emitted as an
    * EXACT integer micro-probability (`n·1e6 div total`) so the gate never
    * hashes an engine-float.
    *
    * Ties inside a user's stream are broken by `tie` (an event id), so the
    * successor relation — and therefore every count — is deterministic
    * whatever the partitioning.
    */
  def markovTransitions(events: DataFrame, user: Column, ts: Column,
      tie: Column, etype: Column): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tie"))
    // vocabulary²-sized — cached so the totals rollup and the final join
    // share ONE window pass over the events instead of re-pairing them
    val pairs = events
      .select(user.as("__u"), ts.as("__ts"), tie.as("__tie"), etype.as("__e"))
      .withColumn("__next", lead(col("__e"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("__e").as("event_type"), col("__next").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .persistTracked()
    val totals = pairs.groupBy(col("event_type"))
      .agg(sum(col("n_transitions")).as("__total"))
    pairs.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("next_type"), col("n_transitions"),
        idiv(col("n_transitions") * lit(1000000L), col("__total"))
          .as("p_micro"))
  }

  /** ROLLING DISTINCT ACTIVE USERS — per active day: DAU, trailing-7-day
    * WAU, and the integer-scaled DAU/WAU stickiness ratio. `count(distinct)
    * over a RANGE frame` is unsupported (and un-mergeable) in every SQL
    * engine; the scalable formulation is to dedup to `(day, user)` grain
    * FIRST — collapsing the raw event volume once, map-side — and then fan
    * each active-day row out to the ≤7 window ends it contributes to
    * (a bounded ×7, on the already-deduped grain, NOT on raw events),
    * dedup `(window_end, user)` for users active on several days of one
    * window, and count. Every stage is a partial-aggregated hash aggregate
    * on bounded-width keys; nothing holds a user's history in one row.
    */
  def rollingActiveUsers(events: DataFrame, user: Column, ts: Column,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "window must cover at least the day itself")
    // day-grain as a midnight TIMESTAMP (not DATE), matching the engine's
    // other daily buckets — identical text form on both sides of the gate
    val userDays = events
      .select(date_trunc("day", ts).as("__day"), user.as("__u")).distinct()
    val dau = userDays.groupBy(col("__day").as("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = userDays
      .select(explode(sequence(col("__day"),
          col("__day") + expr(s"interval ${windowDays - 1} days"),
          expr("interval 1 day"))).as("day"), col("__u"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    // Inner join on DAU days: window ends with no same-day activity are
    // dashboard noise, and dropping them keeps the output grain exactly
    // "days that appear in the log".
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        idiv(col("dau") * lit(1000000L), col("wau")).as("stickiness_micro"))
  }

  /** EVENT-TYPE CO-OCCURRENCE — top-k `(type_a, type_b)` pairs by the
    * number of users who performed both, with each side's own user count
    * for support/lift math downstream: the market-basket shape over an
    * event log.
    *
    * Shape at scale: dedup to `(user, type)` grain first (the ×N event
    * volume collapses map-side), then pair WITHIN each user by a
    * self-equi-join on `user` — the fan-out is quadratic only in a user's
    * DISTINCT TYPE count, which is bounded by the type vocabulary, never by
    * event volume. Per-type totals join back broadcast (vocabulary-sized),
    * and the final top-k is a `TakeOrderedAndProject`, never a global sort.
    */
  def coOccurrencePairs(events: DataFrame, user: Column, etype: Column,
      k: Int = 20): DataFrame = {
    val ut = events.select(user.as("__u"), etype.as("__e")).distinct()
    val perType = ut.groupBy(col("__e")).agg(count(lit(1)).as("__n"))
    val pairs = ut.as("a")
      .join(ut.as("b"),
        col("a.__u") === col("b.__u") && col("a.__e") < col("b.__e"))
      .groupBy(col("a.__e").as("type_a"), col("b.__e").as("type_b"))
      .agg(count(lit(1)).as("n_users_both"))
    pairs
      .join(broadcast(perType.select(col("__e").as("type_a"),
        col("__n").as("n_users_a"))), Seq("type_a"))
      .join(broadcast(perType.select(col("__e").as("type_b"),
        col("__n").as("n_users_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_users_both"),
        col("n_users_a"), col("n_users_b"))
      .orderBy(col("n_users_both").desc, col("type_a"), col("type_b"))
      .limit(k)
  }

  /** ROBUST ANOMALY PROFILE — per event type: the exact median, the median
    * absolute deviation (MAD), and how many events fall outside
    * `median ± cutoff · 1.4826 · MAD` (1.4826 scales MAD to σ for normal
    * data). Median/MAD is the robust replacement for the mean/stddev
    * z-score ([[Relational]]'s running-anomaly op): a few extreme values
    * shift a mean enough to mask themselves, but cannot move a median.
    *
    * Shape at scale: two passes over the events, each a `percentile`
    * hash aggregate keyed by type, with the tiny per-type medians frame
    * broadcast back between them. Exact per-group percentile holds one
    * (value → count) map per group — right when the group count is a
    * bounded type vocabulary, as here. For percentiles keyed by an
    * UNBOUNDED key, use the fixed-width weighted-histogram formulation
    * (`quality_quantiles`) instead; for a single global quantile at
    * unbounded value cardinality, `approx_percentile`.
    *
    * Medians interpolate identically in Spark and DuckDB (`quantile_cont`
    * convention); emitted micro-scaled. The anomaly count compares each
    * value against a threshold derived from these medians — integer output,
    * deterministic under any partitioning.
    */
  def robustAnomalyProfile(events: DataFrame, etype: Column, value: Column,
      cutoff: Double = 3.5): DataFrame = {
    val ev = events.select(etype.as("__e"), value.as("__v"))
    val med = ev.groupBy(col("__e"))
      .agg(percentile(col("__v"), lit(0.5)).as("__med"))
    val mad = ev.join(broadcast(med), Seq("__e"))
      .groupBy(col("__e"), col("__med"))
      .agg(percentile(abs(col("__v") - col("__med")), lit(0.5)).as("__mad"))
    ev.join(broadcast(mad), Seq("__e"))
      .groupBy(col("__e").as("event_type"), col("__med"), col("__mad"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(abs(col("__v") - col("__med"))
          > lit(cutoff * 1.4826) * col("__mad"), 1L).otherwise(0L))
          .as("n_anomalies"))
      .select(col("event_type"), col("n_events"), col("n_anomalies"),
        round(col("__med") * 1e6).cast("long").as("median_micro"),
        round(col("__mad") * 1e6).cast("long").as("mad_micro"))
  }
}
