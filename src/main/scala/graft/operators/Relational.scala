package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftCaches.Persistable

/** The reference's per-record scalar transforms and relational shapes,
  * re-expressed as Catalyst column expressions (SURVEY.md §2.C/D/E/H).
  *
  * Everything here is pure `org.apache.spark.sql.functions` arithmetic —
  * codegen'd by Tungsten, no UDFs — so the plans stay inside
  * WholeStageCodegen and all filters push down to the scan.
  */
object Relational {

  // ---------------------------------------------------------------- D1
  /** DICOM intensity windowing (`/root/reference/dataflow_pipeline.py:30-35`):
    * `low = wc - ww/2; high = wc + ww/2; clip; (v-low)/max(high-low,1e-6)*255`
    * then truncate-to-uint8 (`.astype(np.uint8)` truncates toward zero on
    * non-negative values → `floor`). Requires `ww > 0`; callers fall back to
    * [[minMaxNormalize]] otherwise (`:37-39`).
    */
  def windowIntensity(v: Column, wc: Column, ww: Column): Column = {
    val low  = wc - ww / lit(2.0)
    val high = wc + ww / lit(2.0)
    val clipped = least(greatest(v.cast("double"), low), high)
    floor((clipped - low) / greatest(high - low, lit(1e-6)) * lit(255.0)).cast("long")
  }

  /** D1 variant with INTEGER window-width halving — the reference has two
    * inconsistent implementations: the pipeline divides `ww / 2.0`
    * (`dataflow_pipeline.py:31-32`) while the preprocessor uses integer
    * `ww // 2` (`preprocessor.py:151-152`). Both are preserved; for odd ww
    * they differ by half an intensity step.
    */
  def windowIntensityIntWw(v: Column, wc: Column, ww: Column): Column = {
    val half = floor(ww / lit(2.0))
    val low  = wc - half
    val high = wc + half
    val clipped = least(greatest(v.cast("double"), low), high)
    floor((clipped - low) / greatest(high - low, lit(1e-6)) * lit(255.0)).cast("long")
  }

  // ---------------------------------------------------------------- D5/E8
  /** Per-group min-max normalize to [0,255] uint8, the windowing fallback
    * (`/root/reference/dataflow_pipeline.py:37-39`):
    * `(v - min) / max(max - min, 1e-6) * 255`, truncated.
    * The per-image min/max (E8) is a window aggregate over the group —
    * one shuffle keyed by the group column, which at 100 TB is the natural
    * partitioning for per-image math (images are independent).
    */
  def minMaxNormalize(v: Column, groupBy: Column): Column = {
    val w = Window.partitionBy(groupBy)
    val mn = min(v.cast("double")).over(w)
    val mx = max(v.cast("double")).over(w)
    floor((v.cast("double") - mn) / greatest(mx - mn, lit(1e-6)) * lit(255.0)).cast("long")
  }

  // ---------------------------------------------------------------- C1/D6/D9
  /** `'' → NULL` coercion: the reference's `str(getattr(ds, tag, "")) or None`
    * (`/root/reference/dataflow_pipeline.py:98-101`). */
  def nullifEmpty(c: Column): Column = when(c === lit(""), lit(null)).otherwise(c)

  /** sha256 identity hash, first 16 hex chars, NULL when input empty/null
    * (`/root/reference/dataflow_pipeline.py:90-91`). Exact builtin parity:
    * `substring(sha2(pid, 256), 1, 16)`. */
  def patientIdHash(pid: Column): Column =
    when(pid.isNull || pid === lit(""), lit(null))
      .otherwise(substring(sha2(pid.cast("string").cast("binary"), 256), 1, 16))

  /** Derived output URI `prefix/<stem>.png`
    * (`/root/reference/dataflow_pipeline.py:83`, prefix rstrip'd at `:62`). */
  def derivedUri(prefix: String, fileName: Column): Column =
    concat(
      lit(prefix.replaceAll("/+$", "")), lit("/"),
      regexp_replace(fileName, "\\.[^.]*$", ""), lit(".png"))

  // ---------------------------------------------------------------- E3
  /** 50-bin histogram, `np.histogram` semantics (`/root/reference/app.py:185-208`):
    * equal-width bins on [lo, hi], values == hi land in the LAST bin
    * (numpy's final bin is closed). Callers supply lo/hi (numpy uses data
    * min/max — compute with a separate agg and pass in, or use
    * [[histogramAuto]]).
    */
  def histogramBin(v: Column, lo: Column, hi: Column, nBins: Int): Column = {
    val width = (hi - lo) / lit(nBins.toDouble)
    least(floor((v.cast("double") - lo) / width).cast("long"), lit(nBins.toLong - 1))
  }

  /** Full numpy-style histogram of a column: global [min,max] range, 50 bins,
    * counts per bin. The min/max pass is a tiny all-reduce; the bin agg is a
    * single hash aggregate — two scans total, no row blow-up.
    */
  def histogramAuto(df: DataFrame, v: Column, nBins: Int = 50): DataFrame = {
    val bounds = df.agg(min(v.cast("double")).as("lo"), max(v.cast("double")).as("hi"))
    df.crossJoin(broadcast(bounds))
      .filter(v.cast("double").between(col("lo"), col("hi")))
      .withColumn("bin", histogramBin(v, col("lo"), col("hi"), nBins))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .orderBy(col("bin"))
  }

  // ---------------------------------------------------------------- E5/H4
  /** Brightest-pixel argmax with numpy's row-major first-occurrence
    * tie-break (`/root/reference/app.py:107-113`): max `v`, then smallest
    * `y`, then smallest `x`. Compiles to TakeOrderedAndProject — no full
    * sort at scale.
    */
  def argmaxPixel(pixels: DataFrame, v: Column, y: Column, x: Column): DataFrame =
    pixels.orderBy(v.desc, y.asc, x.asc).limit(1)

  // ---------------------------------------------------------------- H1
  /** Top-k groups by aggregate — the README's flagship analytic query shape
    * (`/root/reference/README.md:167-172`): AVG per group, ORDER BY DESC
    * LIMIT k. Tie-broken on the group key for determinism (H3 note in
    * SURVEY §7.3). Physical plan: partial+final HashAggregate, then
    * TakeOrderedAndProject (no global sort).
    */
  def topKByAvg(df: DataFrame, group: Column, v: Column, k: Int, aggName: String): DataFrame =
    df.groupBy(group)
      .agg(avg(v).as(aggName), count(lit(1)).as("n"))
      .orderBy(col(aggName).desc, group.asc)
      .limit(k)

  // ---------------------------------------------------------------- H2
  /** Latest-n rows by timestamp (`/root/reference/README.md:175-178`),
    * tie-broken by id. */
  def latestN(df: DataFrame, ts: Column, tieBreak: Column, n: Int): DataFrame =
    df.orderBy(ts.desc, tieBreak.desc).limit(n)

  // ---------------------------------------------------------------- A5/C2/C6/H3
  /** Object-listing shape (`/root/reference/gcp_utils.py:21-26`):
    * case-insensitive suffix filter then limit. The reference's limit is
    * storage-listing order; we sort on the name for determinism
    * (SURVEY §7.3 non-determinism traps).
    */
  def listingSuffixLimit(df: DataFrame, name: Column, suffix: String, limit: Int): DataFrame =
    df.filter(lower(name).endsWith(suffix.toLowerCase))
      .orderBy(name.asc)
      .limit(limit)

  // ---------------------------------------------------------------- D4
  /** RGB→grayscale weighted sum (`/root/reference/utils.py:100-103` via
    * cv2.COLOR_RGB2GRAY): `0.299 R + 0.587 G + 0.114 B`, rounded to nearest
    * (OpenCV rounds); returns uint8-ish long. */
  def grayscale(r: Column, g: Column, b: Column): Column =
    round(r.cast("double") * 0.299 + g.cast("double") * 0.587 + b.cast("double") * 0.114, 0)
      .cast("long")

  // ---------------------------------------------------------------- D13
  /** Binarize mask to {0,255} (`/root/reference/advanced_metrics.py:51-52`). */
  def binarize255(v: Column): Column = when(v > 0, lit(255L)).otherwise(lit(0L))

  // ---------------------------------------------------------------- D10
  /** Overlay blend, relational form (`/root/reference/utils.py:66-76`):
    * `cv2.addWeighted(rgb, 1, overlay, alpha, 0)` is an ADDITIVE, saturating
    * blend — `min(v + alpha*color, 255)` on in-mask pixels (then rounded as
    * OpenCV does). Expressed as a left join image⋈mask on coordinates; the
    * mask side is tiny relative to the image → broadcast.
    */
  def overlayChannel(v: Column, inMask: Column, colorChannel: Double, alpha: Double): Column =
    when(inMask, least(round(v.cast("double") + lit(alpha * colorChannel), 0), lit(255.0)).cast("long"))
      .otherwise(v.cast("long"))

  // ---------------------------------------------------------------- synthetic pixels
  /** Deterministic synthetic image in long format `(y, x, v)` built from
    * `range(h*w)` — identical arithmetic is reproducible in the DuckDB
    * oracle (`FROM range(...)`), giving pixel-exact golden tests without
    * image fixtures on disk. v = (id*2654435761) mod 256 XOR-free variant:
    * stays within builtin integer ops both engines share.
    */
  def syntheticImage(spark: SparkSession, h: Int, w: Int): DataFrame = {
    spark.range(h.toLong * w)
      .select(
        expr(s"id div $w").as("y"),
        (col("id") % w).cast("long").as("x"),
        ((col("id") * 2654435761L) % 256).cast("long").as("v"))
  }

  // ---------------------------------------------------------------- as-of join
  /** AS-OF JOIN (left): for every left row, attach the single latest right
    * row with `right.ts ≤ left.ts` per key — the temporal-alignment join
    * (price-at-trade-time, last-view-before-purchase) Spark has no native
    * operator for.
    *
    * NOT a range join: a `l.ts >= r.ts` theta-join explodes to the full
    * per-key cross product before a rank prunes it. This formulation tags
    * both sides, unions them, and takes one `last(right, ignoreNulls)`
    * window pass ordered by `(ts, side)` — a SINGLE hash-partition shuffle
    * on the key plus a per-partition sort, linear in the input, which is
    * the canonical distributed as-of shape. Right rows sort before left
    * rows at equal timestamps, so an exactly-simultaneous right row
    * matches (`≤`, not `<`).
    *
    * The right payload rides as one struct column (null on left-tagged
    * rows), so all its fields come from the SAME matched row. Output =
    * every left column + `asof` struct (null when no right row precedes).
    * Callers must pre-dedup the right side to one row per (key, ts) —
    * with duplicates the surviving row is tie-order-dependent.
    *
    * Skew note: one window partition holds ONE key's full history, so a
    * single pathological key (10⁹ rows) serializes into one task's
    * external sort — the accepted trade of every windowed as-of; if that
    * key exists, pre-split its history by coarse time range and stitch
    * the per-range results (each range seeded with the previous range's
    * last right row).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      asofCol: String = "asof"): DataFrame = {
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)
    val l = left.select(col(key).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    // SQL join-equality semantics: a NULL key never matches, so null-keyed
    // right rows must not enter the window — the partitionBy would land
    // them in the null-key LEFT rows' partition and attach them as matches
    // (DuckDB ASOF JOIN likewise never matches NULL keys). Null-keyed left
    // rows still flow through and emit a null `asof` struct. A null-ts
    // right row has no place in the time order and is dropped for the same
    // reason.
    val r = right.filter(col(key).isNotNull && col(tsCol).isNotNull)
      .select(col(key).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn(asofCol, last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col(asofCol))
  }

  // ---------------------------------------------------------------- global rank
  /** DISTRIBUTED GLOBAL RANK — `row_number() OVER (ORDER BY …)` without
    * the single-partition window Spark plans for an unpartitioned ORDER BY
    * (which serializes the whole input through one task's sort). Classic
    * two-phase shape instead: range-repartition on the sort key, sort
    * within partitions (a normal distributed total sort), then
    * `zipWithIndex` stitches per-partition offsets with one tiny
    * extra job (per-partition counts — the same job any global
    * numbering, including RDD.zipWithIndex, must run).
    *
    * `sort` must be a TOTAL order (fully tie-broken): global rank is then
    * unique and independent of where the range boundaries land, so the
    * result is reproducible across thread counts and engines. The
    * zipWithIndex hop exits codegen for one pass (rows bridge through the
    * RDD API) — the price of offsets Spark SQL cannot express; everything
    * above returns to a normal DataFrame.
    */
  def withGlobalRank(df: DataFrame, sort: Seq[Column], out: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sort: _*).sortWithinPartitions(sort: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types
        .StructField(out, org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Distributed NTILE over a total order — SQL-standard bucket sizing
    * (first `N mod n` buckets take the extra row) computed from the
    * [[withGlobalRank]] rank plus a broadcast row count, never a
    * single-partition window. Gated against DuckDB's native NTILE as an
    * independent implementation of the same semantics.
    */
  def globalNtile(df: DataFrame, sort: Seq[Column], n: Int,
      out: String = "bucket"): DataFrame = {
    require(n > 0)
    val ranked = withGlobalRank(df, sort, "__rank")
    val total = df.agg(count(lit(1)).as("__n"))
    // Column./ is DOUBLE division — integer-divide exactly instead:
    // (a - a mod b)/b is an exact multiple, so the double round-trip is
    // lossless for any realistic count (< 2^53)
    def idiv(a: Column, b: Column): Column = ((a - pmod(a, b)) / b).cast("long")
    // q = N div n rows per small bucket; the first r = N mod n buckets
    // take q+1 rows; ceil(a/b) = (a+b-1) div b
    val q = idiv(col("__n"), lit(n.toLong))
    val r = col("__n") % n
    val cut = r * (q + 1)
    val bucket = when(col("__rank") <= cut,
        idiv(col("__rank") + q, q + 1))
      .otherwise(r + idiv(col("__rank") - cut + q - 1, q))
    ranked.crossJoin(broadcast(total))
      .withColumn(out, bucket.cast("long"))
      .drop("__rank", "__n")
  }

  // ---------------------------------------------------------------- sessionize
  /** GAP-BASED SESSIONIZATION (batch): append a per-key 1-based
    * `session_idx` — a new session starts where the gap from the previous
    * row (same key, `ts` order) exceeds `gapSeconds`. Classic log-pipeline
    * prefix-sum formulation: lag → boundary flag → running sum, so a key's
    * whole history streams through ONE hash shuffle + per-partition sort
    * and no per-session state is ever materialized — at 100 TB the cost is
    * the same single exchange a `groupBy(key)` would pay, regardless of
    * how many sessions a key splits into. Both window frames share the
    * same (partition, order) spec, so Spark plans one Exchange + one Sort
    * feeding two Window operators.
    *
    * Tie safety: rows with equal `(key, ts)` get the same `session_idx`
    * whichever way the sort breaks the tie (the lag-diff at a tie is 0),
    * so downstream per-session aggregates are deterministic.
    * Streaming twin: [[graft.streaming.EventStreams]] session windows (w2).
    */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapSeconds: Long,
      out: String = "session_idx"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    val us = unix_micros(ts)
    val prev = lag(us, 1).over(w)
    val boundary = when(prev.isNull || us - prev > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn(out,
      sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  // ---------------------------------------------------------------- debounce
  /** EVENT DEBOUNCE (telemetry cleanup): keep a row only when it is the
    * key's first, or arrived more than `minGapSeconds` after the key's
    * PREVIOUS row (`ts` order, `tie` disambiguates equal timestamps) —
    * the standard lag-diff formulation, which drops rapid-fire
    * duplicates/retries while keeping the stream's shape. (A stateful
    * "reset on keep" debounce chains differently; the lag form is the one
    * with an exact closed SQL equivalent, so it gates hash-for-hash.)
    *
    * Scale shape as [[sessionize]]: the key's history streams through ONE
    * hash exchange + per-partition sort; the filter is a map-side
    * post-window predicate. Streaming twin: within-watermark dedup (w3).
    */
  def debounce(df: DataFrame, keys: Seq[Column], ts: Column, tie: Column,
      minGapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(ts, tie)
    val us = unix_micros(ts)
    val prev = lag(us, 1).over(w)
    df.withColumn("__keep", prev.isNull || us - prev > minGapSeconds * 1000000L)
      .filter(col("__keep")).drop("__keep")
  }

  // ---------------------------------------------------------------- gap fill
  /** TIME-SERIES RESAMPLE + GAP-FILL + FORWARD-FILL: per key, a dense
    * daily grid from the key's first to last observation, the per-bucket
    * event count (0 on silent days), and the last observed per-bucket sum
    * carried forward across the gaps — the resampling step monitoring and
    * feature pipelines run before any per-entity model sees the series.
    *
    * Shape at scale: ONE scan — the per-(key, bucket) aggregate is
    * persisted and feeds both the grid bounds and the value join; the
    * grid is `sequence(first, last, 1 day)` exploded per key, so its
    * cardinality is bounded by the key's own time span (never a cross
    * join against a global calendar); the forward fill is one
    * `last(ignoreNulls)` window pass sharing the grid's key exchange.
    * Returns `(key, bucket, n_events, filled_sum)`; `filled_sum` is never
    * null (the grid starts at a real observation).
    */
  def gapFillDaily(df: DataFrame, key: Column, ts: Column, value: Column): DataFrame = {
    val agg = df
      .select(key.as("key"), date_trunc("day", ts).as("bucket"), value.as("__v"))
      .groupBy(col("key"), col("bucket"))
      // decimal aggregation: exact + associative, so the daily sum is
      // bit-identical in any partition merge order (a raw double Σ can
      // flip its 6th decimal and break the engine-reproducibility gate)
      .agg(count(lit(1)).as("__n"),
        round(sum(col("__v").cast("decimal(18,6)")).cast("double"), 6).as("__sv"))
      .persistTracked()
    val grid = agg.groupBy(col("key"))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col("key"),
        explode(sequence(col("__b0"), col("__b1"), expr("interval 1 day"))).as("bucket"))
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        last(col("__sv"), ignoreNulls = true).over(w).as("filled_sum"))
  }

  /** BOUNDED-STATE EWMA — half-life exponential smoothing of each key's
    * `k` MOST RECENT observations: s₀ = x_oldest, sₜ = (xₜ + sₜ₋₁)/2,
    * folded oldest → newest. Returns `(user_id, n_events, ewma)`.
    *
    * Two deliberate design points:
    *  - α = ½, so every fold step is one IEEE add and one EXACT halving —
    *    with a fixed observation order the result is bit-reproducible on
    *    any engine (an arbitrary α multiplies by an inexact constant and
    *    still works, but ½ removes even that wobble from the gate);
    *  - the window is the newest `k` PER KEY, selected by the TopKPerKey
    *    plan node — ≤ k rows per (key, partition) reach the exchange and
    *    the per-key fold state is ≤ k values, so the operator is
    *    memory-bounded regardless of how long a key's history grows
    *    (a full-history EWMA is unbounded state at 100 TB; the tail
    *    beyond k contributes < 2⁻ᵏ of the smoothed value anyway —
    *    truncation is far below double precision at k = 64).
    *
    * Ordering is (ts, tiebreakId) — the id makes equal-timestamp folds
    * deterministic.
    */
  def ewmaRecent(df: DataFrame, key: Column, ts: Column, tiebreakId: Column,
      value: Column, k: Int = 64): DataFrame = {
    require(k >= 1, s"window must be >= 1, got $k")
    val base = df.select(key.as("user_id"), ts.as("__ts"), tiebreakId.as("__eid"),
      value.as("__v"))
    val recent = graft.plans.TopKPerKey.topKPerKey(base, Seq("user_id"),
      Seq(("__ts", false), ("__eid", false)), k)
    // rank 1 = newest; fold must run oldest -> newest, so sort by -rank
    recent.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct((-col("rank")).as("ord"),
          col("__v").as("v")))).as("__seq"))
      .select(col("user_id"), col("n_events"),
        round(aggregate(
          slice(col("__seq"), lit(2), size(col("__seq")) - 1),
          col("__seq").getItem(0).getField("v"),
          (acc, x) => (x.getField("v") + acc) / lit(2.0)), 6).as("ewma"))
  }

  // ---------------------------------------------------------------- range join
  /** POINT-IN-INTERVAL JOIN via a bucketed equi-join — the scale path for
    * the non-equi `pt BETWEEN start AND end` theta-join Spark would
    * otherwise plan as BroadcastNestedLoop (fine for tiny interval sets,
    * fatal once intervals number in the millions). Both sides map into
    * fixed-width time buckets: a point lands in exactly one bucket, an
    * interval is exploded to every bucket it touches, and the join becomes
    * `point.bucket = interval.bucket AND pt BETWEEN start AND end` — a
    * plain hash-shuffle equi-join Catalyst/AQE can size, broadcast, or
    * skew-split like any other. No pair is emitted twice (each point has
    * one bucket), so no post-dedup.
    *
    * Pick `bucketWidthUs` near the TYPICAL interval length: replication
    * factor is ~(len/width + 1) per interval, while a too-wide bucket
    * degrades toward per-bucket cross products. Output = every point
    * column + every interval column.
    */
  def pointInIntervalJoin(points: DataFrame, pt: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0, "bucket width must be positive")
    // TIMESTAMP_NTZ columns (parquet without tz annotation) cast through
    // the session zone — pinned UTC by every graft entry point, so the
    // bucket boundaries are engine-independent.
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val iv = intervals.withColumn("__iv_bucket",
      explode(sequence(
        floor(us(col(startCol)) / bucketWidthUs).cast("long"),
        floor(us(col(endCol)) / bucketWidthUs).cast("long"))))
    val p = points.withColumn("__pt_bucket",
      floor(us(col(pt)) / bucketWidthUs).cast("long"))
    p.join(iv,
        p("__pt_bucket") === iv("__iv_bucket") &&
          p(pt) >= iv(startCol) && p(pt) <= iv(endCol))
      .drop("__pt_bucket", "__iv_bucket")
  }

  // ---------------------------------------------------------------- Paths
  /** TOP SESSION PATHS — the most frequent length-`n` consecutive
    * event-type sequences inside user sessions (gap-based sessionization):
    * the navigation-pattern / prompt-flow mining query behind "what do
    * users do next" dashboards.
    *
    * Shape at scale: a length-`n` consecutive run lies inside ONE session
    * exactly when every one of its `n−1` adjacent gaps is ≤ the session
    * gap (a boundary is DEFINED as a gap exceeding it) — so sessions never
    * need materializing at all. ONE user-keyed window pass reads the next
    * `n−1` events with `lead` (running state = n rows, however long the
    * session — strictly tighter than a per-session gather, which a
    * bot-length session could still blow), the path string is a map-side
    * concat, the global count is a partial-aggregated rollup, and the
    * top-k fuses to TakeOrderedAndProject. `tie` joins the ordering so
    * equal timestamps sequence deterministically.
    */
  def sessionPaths(events: DataFrame, user: Column, ts: Column, tie: Column,
      etype: Column, gapSeconds: Long, n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 2, "a path needs at least two steps")
    val w = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tie"))
    def usAt(j: Int): Column = {
      val us = unix_micros(col("__ts"))
      if (j == 0) us else lead(us, j).over(w)
    }
    def eAt(j: Int): Column =
      if (j == 0) col("__e") else lead(col("__e"), j).over(w)
    val withinOneSession = (1 until n).map(j =>
      usAt(j).isNotNull && usAt(j) - usAt(j - 1) <= gapSeconds * 1000000L)
      .reduce(_ && _)
    events
      .select(user.as("__u"), ts.as("__ts"), tie.as("__tie"), etype.as("__e"))
      .select(when(withinOneSession,
        concat_ws(">", (0 until n).map(eAt): _*)).as("path"))
      .filter(col("path").isNotNull)
      .groupBy(col("path")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("path"))
      .limit(k)
  }

  // ---------------------------------------------------------------- Funnel
  /** ORDERED FUNNEL ANALYSIS — how many users completed stage₁ → stage₂ →
    * … → stageₖ IN ORDER (each stage strictly after the user's FIRST
    * completion of the previous one): the conversion query behind every
    * product / pipeline-progress dashboard.
    *
    * Shape at scale: stage 1 is one `user`-keyed partial-aggregated MIN;
    * every later stage joins the (already user-keyed) survivor frame to
    * the stage's filtered events and takes the next conditional MIN — all
    * k−1 joins and aggregates hash on the SAME key, so after the first
    * exchange the survivor side stays co-partitioned, and each stage's
    * survivor frame only ever SHRINKS. Never a per-user sorted event list
    * (the collect_list-then-scan formulation holds a user's whole history
    * in one row — a hot user blows the task) and never a global window.
    *
    * Returns one row per stage: `(stage_idx, stage, n_users)` — integers
    * only, deterministic whatever the partitioning.
    */
  def funnelCounts(events: DataFrame, user: Column, etype: Column, ts: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnelCounts needs at least one stage")
    val ev = events.select(user.as("__u"), etype.as("__e"), ts.as("__ts"))
    // Survivor frames: users having completed stages(0..i) in order, with
    // the timestamp of their first in-order completion of stage i.
    val survivors = stages.tail.scanLeft(
      ev.filter(col("__e") === stages.head)
        .groupBy(col("__u")).agg(min(col("__ts")).as("__sts"))) {
      case (prev, st) =>
        ev.filter(col("__e") === st)
          .join(prev.select(col("__u"), col("__sts").as("__prev_ts")), Seq("__u"))
          .filter(col("__ts") > col("__prev_ts"))
          .groupBy(col("__u")).agg(min(col("__ts")).as("__sts"))
    }
    survivors.zip(stages).zipWithIndex.map { case ((frame, st), i) =>
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    }.reduce(_.unionByName(_)).orderBy(col("stage_idx"))
  }

  /** Deterministic smooth multi-image gradient `(image_id, y, x, v)` with
    * `v = (4y + 2x) mod 256` — smoothly varying so a threshold band forms a
    * CONNECTED region (the region-growing fixture; noise images fragment).
    * Reproducible in the DuckDB oracle from `range(...)`.
    */
  def gradientImage(spark: SparkSession, nImages: Int, h: Int, w: Int): DataFrame = {
    val px = h.toLong * w
    spark.range(nImages * px)
      .select(
        expr(s"id div $px").as("image_id"),
        expr(s"(id % $px) div $w").as("y"),
        (col("id") % w).cast("long").as("x"))
      .withColumn("v", (col("y") * 4 + col("x") * 2) % 256)
  }
}
