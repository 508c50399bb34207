package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.Tables

/** Event-log operators — the batch analogs of the reference's event-sourced
  * control plane (SURVEY.md §2.A):
  *
  *  - A16 event fold → latest state per key
  *    (reference: `GetStateFromEvent` fold, pkg/controller/controller.go:351-385,
  *    pkg/executor/constants.go:211-251)
  *  - A18 list = sort + limit (reference: cmd/bacalhau/list.go:100-211)
  *  - A24 state summarize = max-by over a progress rank
  *    (reference: pkg/job/job.go:233-263)
  *  - sessionization + tumbling time buckets (the streaming fixtures' batch
  *    twins; the live versions are in graft.streaming)
  *  - JSON prop extraction (control-plane payloads are JSON;
  *    reference: pkg/executor/types.go:146-163 event marshalling)
  *
  * All timestamps are compared at µs precision (`ts_us`) — see Tables.events.
  * Scale: every query here shuffles once on `user_id` (the natural key) and
  * nothing else; window functions reuse that single partitioning.
  */
object EventOps {
  type Q = (SparkSession, String) => DataFrame

  private val DayUs = 86400000000L

  val queries: Map[String, Q] = Map(
    // ---- A16: fold the event log to the latest event per entity
    "q_event_fold" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("last_type"),
                col("event_id").as("last_event"), col("ts_us").as("last_ts_us"))
        .orderBy("user_id")
    }),

    // ---- A24: summarize to the "furthest along" state per entity
    // (max-by over an explicit progress rank, like GetCurrentJobState)
    "q_state_summarize" -> ((s, d) => {
      val rank = when(col("event_type") === "signup", 1)
        .when(col("event_type") === "view", 2)
        .when(col("event_type") === "click", 3)
        .when(col("event_type") === "purchase", 4)
        .otherwise(0) // error
      val w = Window.partitionBy("user_id")
        .orderBy(col("rank").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rank", rank.cast(IntegerType))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("furthest"),
                col("rank").as("progress"))
        .orderBy("user_id")
    }),

    // ---- A18: list = sort desc + limit
    "q_list_sort_limit" -> ((s, d) => {
      Tables.events(s, d)
        .orderBy(col("ts_us").desc, col("event_id").desc)
        .limit(50)
        .select("event_id", "ts_us", "user_id", "event_type")
    }),

    // ---- state histogram (describe-level rollup of the event log)
    "q_event_counts" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
        .orderBy("event_type")
    }),

    // ---- sessionize: 30-min inactivity gap starts a new session
    "q_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val gapUs = 1800L * 1000000L
      Tables.events(s, d)
        .withColumn("prev_ts", lag("ts_us", 1).over(w))
        .withColumn("new_s",
          when(col("prev_ts").isNull ||
               col("ts_us") - col("prev_ts") > gapUs, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum("new_s").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // ---- tumbling 1-hour bucket aggregation (batch twin of the
    // Structured-Streaming window; exact integer µs arithmetic)
    "q_time_bucket" -> ((s, d) => {
      val hourUs = 3600L * 1000000L
      Tables.events(s, d)
        .withColumn("bucket_us", col("ts_us") - pmod(col("ts_us"), lit(hourUs)))
        .groupBy("bucket_us")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("bucket_us")
    }),

    // ---- gap-filled resampling: hourly grid over [min, max], empty
    // buckets materialized as zeros (sequence+explode grid, left join)
    "q_gap_fill" -> ((s, d) => {
      val hourUs = 3600L * 1000000L
      val ev = Tables.events(s, d)
        .withColumn("bucket_us", col("ts_us") - pmod(col("ts_us"), lit(hourUs)))
      val counts = ev.groupBy("bucket_us")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      val grid = ev.agg(min("bucket_us").as("lo"), max("bucket_us").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), lit(hourUs)))
          .as("bucket_us"))
      grid.join(counts, Seq("bucket_us"), "left")
        .select(col("bucket_us"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("total"), lit(0.0)).as("total"))
        .orderBy("bucket_us")
    }),

    // ---- LOCF (last observation carried forward): latest purchase value
    // carried onto every subsequent event per user
    "q_locf" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .withColumn("pv",
          when(col("event_type") === "purchase", col("value")))
        .withColumn("last_purchase", last("pv", ignoreNulls = true).over(w))
        .select("user_id", "event_id", "last_purchase")
        // no global ORDER BY: gate canonicalizes row order (VERDICT r1 #4)
    }),

    // ---- JSON extraction from the props payload
    "q_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k",
          get_json_object(col("props"), "$.k").cast(IntegerType))
        .groupBy("k")
        .agg(count(lit(1)).as("n"))
        .orderBy("k")
    }),

    // ---- CEP-lite sequence pattern match: encode each user's ordered
    // event stream as a letter string (v=view, c=click, p=purchase, …)
    // and regex-match the conversion pattern "a view, later a click,
    // later a purchase, with no purchase in between" — the
    // MATCH_RECOGNIZE-style detection a funnel can't express (q_funnel
    // counts stage completion; this demands the ORDER and exclusion).
    // Scale shape: ONE shuffle keyed by user; each user's sequence is
    // their own activity (bounded — at 100 TB you sessionize first and
    // match within sessions, same plan with the session id in the key);
    // the regex runs codegen'd per row over the reduced string, never
    // over the event table.
    "q_event_pattern" -> ((s, d) => {
      val letter = substring(col("event_type"), 1, 1)
      val seq = Tables.events(s, d)
        .groupBy("user_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("ts_us"), col("event_id"),
            letter.as("c")))),
          x => x.getField("c")), "").as("seq"))
      seq
        .select(col("user_id"),
          regexp_extract(col("seq"), "v[^p]*c[^p]*p", 0).as("m"),
          length(col("seq")).as("n_events"))
        .filter(col("m") =!= "")
        .select(col("user_id"), length(col("m")).as("match_len"),
          col("n_events"))
        .orderBy("user_id")
    }),

    // ---- SCD2 (slowly-changing-dimension type 2) build: collapse each
    // user's event_type stream into validity intervals — keep only the
    // rows where the state CHANGES, then [valid_from, valid_to) comes
    // from the next change (NULL = current state). The standard
    // warehouse state-history derivation from an append-only event log.
    // Scale shape: two windows over the same (user_id → ts) partitioning,
    // so ONE shuffle+sort total (Catalyst reuses the sort); the change
    // filter drops the stream to its information content before the
    // second window runs. No joins, no self-join-per-version.
    "q_scd2" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val ch = Tables.events(s, d)
        .withColumn("prev_t", lag("event_type", 1).over(w))
        .filter(col("prev_t").isNull || col("prev_t") =!= col("event_type"))
      val w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      ch.select(col("user_id"), col("event_type").as("state"),
          col("ts_us").as("valid_from"),
          lead("ts_us", 1).over(w2).as("valid_to"),
          row_number().over(w2).as("version"))
        .orderBy("user_id", "version")
    }),

    // ---- EWMA trend smoothing over each user's value stream: the
    // finite-horizon exponential moving average (α=0.25, last 16
    // events), the standard metric smoother. The infinite recurrence
    // is not expressible declaratively, but the 16-step horizon
    // truncation is: collect the frame into an ordered array (ONE
    // shuffle keyed by user — the same sort the sessionize family
    // shares) and fold it per-row with exact (3/4)^k weights,
    // normalized over the actual window length so partial leading
    // windows are unbiased. The oracle states the identical sum as a
    // bounded self-join (b.rn BETWEEN a.rn−15 AND a.rn) — two forms,
    // one number.
    "q_ewma" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id")).rowsBetween(-15, 0)
      val decay = (i: org.apache.spark.sql.Column, m: org.apache.spark.sql.Column) =>
        pow(lit(0.75), (m - lit(1) - i).cast("double"))
      Tables.events(s, d)
        .withColumn("hist", collect_list(col("value")).over(w))
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
          round(
            aggregate(
              transform(col("hist"),
                (x, i) => x * decay(i, size(col("hist")))),
              lit(0d), (acc, t) => acc + t) /
            aggregate(
              transform(col("hist"),
                (_, i) => decay(i, size(col("hist")))),
              lit(0d), (acc, t) => acc + t), 6).as("ewma"))
        // no global ORDER BY: large output, gate canonicalizes row order
    }),

    // ---- first-order Markov transition matrix of user behavior: count
    // each (from_state → to_state) adjacency in the per-user ordered
    // event stream, normalize per from-state row. The standard
    // user-journey model (and the q_event_pattern CEP family's
    // statistical twin). ONE shuffle keyed by user for the lag window,
    // then a |states|²-bounded count agg; probabilities are exact
    // integer ratios divided once at the end.
    // ---- entropy rate of the behavior Markov chain — "how predictable
    // is the next action given the current one?": per from-state the
    // conditional entropy H_i = Σ_j (c_ij/tot_i)·ln(tot_i/c_ij) and its
    // stationary weight π_i = tot_i/T, the pair whose dot product is
    // the chain's entropy rate. Terms quantize to exact nano-nat
    // integers before summing (q_entropy discipline) so partial-agg
    // order cannot move the hash; everything upstream is q_markov's
    // transition-count shuffle (user-partitioned lag window — high-
    // cardinality key, fully parallel).
    "q_markov_entropy" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val tr = Tables.events(s, d)
        .withColumn("from_t", lag("event_type", 1).over(w))
        .filter(col("from_t").isNotNull)
        .groupBy(col("from_t").as("from_type"),
          col("event_type").as("to_type"))
        .agg(count(lit(1)).as("c"))
      val rowTot = tr.groupBy("from_type").agg(sum("c").as("tot"))
      val tt = rowTot.agg(sum("tot").as("tt"))
      tr.join(broadcast(rowTot), Seq("from_type"))
        .groupBy("from_type")
        .agg(max("tot").as("tot"),
          sum(round(col("c").cast("double") / col("tot").cast("double") *
            log(col("tot").cast("double") / col("c").cast("double")) *
            1e9).cast("long")).as("hm"))
        .crossJoin(broadcast(tt))
        .select(col("from_type"), col("tot"),
          round(col("tot").cast("double") / col("tt").cast("double"), 6)
            .as("pi"),
          round(col("hm") / 1e9, 6).as("h_nats"))
        .orderBy("from_type")
    }),

    "q_markov" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val tr = Tables.events(s, d)
        .withColumn("from_t", lag("event_type", 1).over(w))
        .filter(col("from_t").isNotNull)
        .groupBy(col("from_t").as("from_type"),
          col("event_type").as("to_type"))
        .agg(count(lit(1)).as("c"))
      val rowTot = tr.groupBy("from_type").agg(sum("c").as("tot"))
      tr.join(broadcast(rowTot), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("c"),
          round(col("c").cast("double") / col("tot").cast("double"), 6)
            .as("p"))
        .orderBy("from_type", "to_type")
    }),

    // ---- per-user inter-arrival statistics: mean gap, coefficient of
    // variation, and the Goh–Barabási burstiness index
    // B = (σ−μ)/(σ+μ) ∈ [−1, 1] (−1 periodic, 0 Poisson, →1 bursty) —
    // the bot-vs-human signal for an event stream. Gaps quantize to
    // whole seconds so the moment sums (n, Σg, Σg²) are exact BIGINTs;
    // with S = √(n·Σg² − (Σg)²) the ratios collapse to cv = S/Σg and
    // B = (S−Σg)/(S+Σg), so each final value is ONE float expression
    // over exact integers, mirrored op-for-op in the oracle. One
    // user-keyed window shuffle, then a per-user agg — nothing else
    // moves. Σg = 0 (all gaps sub-second) ⇒ cv/B null, guarded.
    "q_interarrival" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val gaps = Tables.events(s, d)
        .withColumn("prev_us", lag("ts_us", 1).over(w))
        .filter(col("prev_us").isNotNull)
        .select(col("user_id"),
          expr("(ts_us - prev_us) div 1000000").as("g"))
      val st = gaps.groupBy("user_id").agg(count(lit(1)).as("n"),
        sum("g").as("sg"), sum(col("g") * col("g")).as("sgg"))
      val bigS = sqrt((col("n") * col("sgg") - col("sg") * col("sg"))
        .cast("double"))
      st.select(col("user_id"), col("n").as("n_gaps"),
          round(col("sg").cast("double") / col("n").cast("double"), 6)
            .as("mean_s"),
          round(when(col("sg") === 0, lit(null))
            .otherwise(bigS / col("sg").cast("double")), 6).as("cv"),
          round(when(col("sg") === 0, lit(null))
            .otherwise((bigS - col("sg").cast("double")) /
              (bigS + col("sg").cast("double"))), 6).as("burstiness"))
        .orderBy("user_id")
    }),

    // ---- last-touch conversion attribution: each purchase credits the
    // user's most recent non-purchase event (the marketing-analytics
    // default model); purchases with no prior touch credit 'direct'.
    // ONE user-keyed window computes the running last-touch via
    // last(..., ignoreNulls) over the (ts, event_id)-ordered stream, so
    // the whole query is a single shuffle on user_id plus a channel agg.
    // Revenue is cent-quantized before summing (exact BIGINTs).
    "q_attribution" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("touch", last(
          when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(coalesce(col("touch"), lit("direct")).as("channel"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("channel")
        .agg(count(lit(1)).as("conversions"),
          round(sum("cents").cast("double") / 100, 2).as("revenue"))
        .orderBy("channel")
    }),

    // ---- concurrent-activity gauge: per day, the maximum number of
    // users simultaneously active (sweep-line over per-user-day activity
    // intervals). The event stream collapses to |user-day| intervals
    // FIRST, each emits a +1/−1 boundary, and the running sum is a
    // day-PARTITIONED window (intervals never cross midnight by
    // construction), so no global single-partition pass ever sees the
    // corpus. Tie order (ts, then −1 before +1) is fixed in both
    // engines; within a same-sign run the prefix maximum is
    // order-invariant, so the max is deterministic.
    "q_concurrency" -> ((s, d) => {
      val iv = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"),
          col("ts_us"))
        .groupBy("user_id", "day")
        .agg(min("ts_us").as("lo"), max("ts_us").as("hi"))
      val sweep = iv.select(col("day"), col("lo").as("ts"),
          lit(1L).as("delta"))
        .unionAll(iv.select(col("day"), (col("hi") + 1L).as("ts"),
          lit(-1L).as("delta")))
      val w = Window.partitionBy("day").orderBy("ts", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sweep.withColumn("run", sum("delta").over(w))
        .groupBy("day")
        .agg(max("run").as("max_concurrent"),
          (count(lit(1)) / 2).cast("long").as("n_users"))
        .orderBy("day")
    }),

    // ---- opening-path analysis: each user's first three event types as
    // an ordered "a>b>c" path, counted across users — the onboarding-
    // flow histogram. One user-keyed window ranks the stream, the rn ≤ 3
    // filter drops everything else BEFORE the per-user pivot (three
    // conditional min-aggs — no collect_list, whose ordering is
    // partition-dependent), and the path space is bounded by |types|³.
    // concat_ws skips NULLs identically in both engines, so users with
    // fewer than three events keep their shorter path.
    "q_event_paths" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy("user_id")
        .agg(min(when(col("rn") === 1, col("event_type"))).as("t1"),
          min(when(col("rn") === 2, col("event_type"))).as("t2"),
          min(when(col("rn") === 3, col("event_type"))).as("t3"))
        .select(concat_ws(">", col("t1"), col("t2"), col("t3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
    }),

    // ---- CUSUM changepoint scan over the daily event-count series:
    // S_d = Σ_{i≤d}(x_i − μ) peaks at the day the level shifts. The
    // whole curve stays EXACT by clearing the denominator — n·S_d =
    // n·prefix_d − d_idx·Σx is pure BIGINT arithmetic, so the peak flag
    // is an exact integer compare (no float argmax flake); only the
    // reported cusum value converts to double at the end. The series
    // frame is ≤|days| rows — the prefix window never sees raw events.
    "q_changepoint" -> ((s, d) => {
      // cached: both the 1-row total and the curve read it — uncached,
      // the events scan + daily agg would run twice (q_lm_score lesson)
      val daily = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x")))
      val tot = daily.agg(count(lit(1)).as("n"), sum("x").as("sx"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wi = Window.orderBy("day")
      val cur = daily.crossJoin(broadcast(tot))
        .withColumn("prefix", sum("x").over(w))
        .withColumn("d_idx", row_number().over(wi).cast("long"))
        .withColumn("ns", col("n") * col("prefix") -
          col("d_idx") * col("sx"))
      cur.withColumn("mx", max(abs(col("ns")))
          .over(Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .select(col("day"), col("x"),
          round(col("ns").cast("double") / col("n").cast("double"), 6)
            .as("cusum"),
          (abs(col("ns")) === col("mx")).cast("int").as("is_peak"))
        .orderBy("day")
    }),

    // ---- multiplicative weekday seasonality: per day-of-week index =
    // (per-dow mean) / (global daily mean), computed as the exact cross-
    // ratio (s_d·C)/(c_d·S) in doubles — day counts and event sums are
    // BIGINTs, the 1-row global total broadcasts, and the output is the
    // 7-row seasonal profile.
    "q_seasonality" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
        .select((col("day") % 7).as("dow"), col("x"))
      val byDow = graft.CacheScope.cached(daily.groupBy("dow")
        .agg(count(lit(1)).as("n_days"), sum("x").as("events")))
      val g = byDow.agg(sum("n_days").as("cc"), sum("events").as("ss"))
      byDow.crossJoin(broadcast(g))
        .select(col("dow"), col("n_days"), col("events"),
          round((col("events").cast("double") * col("cc").cast("double")) /
            (col("n_days").cast("double") * col("ss").cast("double")), 6)
            .as("seasonal_index"))
        .orderBy("dow")
    }),

    // ---- Wald–Wolfowitz runs test on the daily series' up/down moves:
    // too few runs = trending, too many = oscillating — the
    // distribution-free randomness check behind "is this metric really
    // drifting?". The series collapses to ≤|days| rows first; signs,
    // the run count (sign ≠ previous sign), and n± are exact integers
    // from two lag windows over that bounded frame; zero-diff days drop
    // (the standard treatment). Only the final z touches doubles.
    "q_runs_test" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
      val wd = Window.orderBy("day")
      val moves = daily
        .withColumn("diff", col("x") - lag("x", 1).over(wd))
        .filter(col("diff").isNotNull && col("diff") =!= 0)
        .select(col("day"), signum(col("diff")).cast("long").as("sgn"))
      val runs = moves
        .withColumn("brk",
          when(lag("sgn", 1).over(wd).isNull ||
            lag("sgn", 1).over(wd) =!= col("sgn"), 1L).otherwise(0L))
      val agg = runs.agg(
        sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_down"),
        sum("brk").as("r"))
      val p = col("n_up").cast("double")
      val m = col("n_down").cast("double")
      val nn = p + m
      val mu = lit(2.0) * p * m / nn + lit(1.0)
      val sig = sqrt(lit(2.0) * p * m * (lit(2.0) * p * m - nn) /
        (nn * nn * (nn - lit(1.0))))
      agg.select(col("n_up"), col("n_down"), col("r"),
        round(mu, 6).as("expected_r"),
        round(when(sig === 0.0, lit(null))
          .otherwise((col("r").cast("double") - mu) / sig), 6).as("z"))
    }),

    // ---- Poisson dispersion test on per-user event counts: index of
    // dispersion D = s²/x̄ (1 under Poisson, ≫1 over-dispersed — the
    // "are arrivals independent?" screen). Moments are exact BIGINTs
    // from one user-keyed agg; D uses the n−1 sample variance and the
    // Wilson–Hilferty style normal approx z = √(2χ²) − √(2df−1) with
    // χ² = (n−1)·D. Only the final expressions touch doubles.
    // ---- negative-binomial fit (method of moments) over per-user
    // event counts — q_poisson_fit's overdispersed sibling: when the
    // dispersion test rejects Poisson, NB(r, p) with r = m²/(v − m),
    // p = m/v is the standard count model (v from the SAME sample-
    // variance identity as q_poisson_fit, so the two fits are
    // comparable row for row). All inputs exact integer sums; each
    // output is one fixed-order double expression; underdispersed
    // samples (v ≤ m, NB undefined) yield NULL — mirrored.
    "q_negbin_fit" -> ((s, d) => {
      val agg = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("k"))
        .agg(count(lit(1)).as("n"), sum("k").as("sk"),
          sum(col("k") * col("k")).as("skk"))
      val n = col("n").cast("double")
      val sk = col("sk").cast("double")
      val skk = col("skk").cast("double")
      val mean = sk / n
      val varS = (n * skk - sk * sk) / (n * (n - lit(1.0)))
      agg.select(col("n").as("n_users"),
        round(mean, 6).as("mean"),
        round(when(col("n") === 1, lit(null)).otherwise(varS), 6)
          .as("variance"),
        round(when(col("n") === 1 || varS <= mean, lit(null))
          .otherwise(mean * mean / (varS - mean)), 6).as("r"),
        round(when(col("n") === 1 || varS <= mean, lit(null))
          .otherwise(mean / varS), 6).as("p"))
    }),

    "q_poisson_fit" -> ((s, d) => {
      val agg = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("k"))
        .agg(count(lit(1)).as("n"), sum("k").as("sk"),
          sum(col("k") * col("k")).as("skk"))
      val n = col("n").cast("double")
      val sk = col("sk").cast("double")
      val skk = col("skk").cast("double")
      val mean = sk / n
      val varS = (n * skk - sk * sk) / (n * (n - lit(1.0)))
      val disp = varS / mean
      val chi2 = (n - lit(1.0)) * disp
      agg.select(col("n").as("n_users"),
        round(mean, 6).as("lambda"),
        round(when(col("n") === 1, lit(null)).otherwise(disp), 6)
          .as("dispersion"),
        round(when(col("n") === 1, lit(null)).otherwise(
          sqrt(lit(2.0) * chi2) -
            sqrt(lit(2.0) * (n - lit(1.0)) - lit(1.0))), 6).as("z"))
    }),

    // ---- date-gap completeness audit: per event type, observed days vs
    // calendar span, and the longest run of missing days — the ingest
    // data-quality check that catches a dropped feed BEFORE any query
    // silently computes over the hole (the q_autocorr family documents
    // "contiguous fixture" as a semantic assumption; this measures it).
    // Scale shape: the corpus collapses to DISTINCT (type, day) pairs in
    // one map-side-combined pass; the lag window runs per event type
    // over the calendar-bounded day frame.
    "q_date_gaps" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("event_type"), expr(s"ts_us div $DayUs").as("day"))
        .distinct()
      val w = Window.partitionBy("event_type").orderBy("day")
      days.withColumn("prev", lag("day", 1).over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          (max("day") - min("day") + 1).as("span_days"),
          (max("day") - min("day") + 1 - count(lit(1))).as("n_missing"),
          coalesce(max(col("day") - col("prev") - 1), lit(0L))
            .as("max_gap"))
        .orderBy("event_type")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_event_fold" ->
      """SELECT user_id, event_type AS last_type, event_id AS last_event,
        |  epoch_us(ts) AS last_ts_us FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_state_summarize" ->
      """SELECT user_id, event_type AS furthest, progress FROM (
        |  SELECT user_id, event_type,
        |    CAST(CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2
        |      WHEN 'click' THEN 3 WHEN 'purchase' THEN 4 ELSE 0 END
        |      AS INTEGER) AS progress,
        |    row_number() OVER (PARTITION BY user_id ORDER BY
        |      (CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2
        |        WHEN 'click' THEN 3 WHEN 'purchase' THEN 4 ELSE 0 END) DESC,
        |      event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_list_sort_limit" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
        |FROM events ORDER BY epoch_us(ts) DESC, event_id DESC
        |LIMIT 50""".stripMargin,
    "q_event_counts" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(value), 4) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_time_bucket" ->
      """SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_gap_fill" ->
      """WITH b AS (
        |  SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us, value
        |  FROM events),
        |counts AS (
        |  SELECT bucket_us, CAST(count(*) AS BIGINT) AS n,
        |    round(sum(value), 2) AS total
        |  FROM b GROUP BY 1),
        |bounds AS (SELECT min(bucket_us) AS lo, max(bucket_us) AS hi FROM b),
        |grid AS (
        |  SELECT unnest(generate_series(lo, hi, 3600000000)) AS bucket_us
        |  FROM bounds)
        |SELECT g.bucket_us, coalesce(n, 0) AS n,
        |  coalesce(total, 0.0) AS total
        |FROM grid g LEFT JOIN counts USING (bucket_us)
        |ORDER BY 1""".stripMargin,
    "q_locf" ->
      """SELECT user_id, event_id,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_json_extract" ->
      """SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER)
        |  AS k, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_event_pattern" ->
      """WITH seq AS (
        |  SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), ''
        |      ORDER BY epoch_us(ts), event_id) AS seq
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT user_id, regexp_extract(seq, 'v[^p]*c[^p]*p') AS m,
        |    CAST(length(seq) AS INTEGER) AS n_events
        |  FROM seq)
        |SELECT user_id, CAST(length(m) AS INTEGER) AS match_len, n_events
        |FROM m WHERE m <> '' ORDER BY user_id""".stripMargin,
    "q_scd2" ->
      """WITH x AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_t
        |  FROM events),
        |ch AS (
        |  SELECT user_id, event_id, event_type, ts_us FROM x
        |  WHERE prev_t IS NULL OR prev_t <> event_type)
        |SELECT user_id, event_type AS state, ts_us AS valid_from,
        |  lead(ts_us, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) AS valid_to,
        |  CAST(row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) AS INTEGER) AS version
        |FROM ch ORDER BY user_id, version""".stripMargin,
    "q_ewma" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |SELECT a.event_id, a.user_id, a.ts_us, a.value,
        |  round(sum(b.value * power(CAST(0.75 AS DOUBLE), a.rn - b.rn)) /
        |    sum(power(CAST(0.75 AS DOUBLE), a.rn - b.rn)), 6) AS ewma
        |FROM ev a JOIN ev b ON b.user_id = a.user_id
        |  AND b.rn BETWEEN a.rn - 15 AND a.rn
        |GROUP BY a.event_id, a.user_id, a.ts_us, a.value""".stripMargin,
    "q_markov_entropy" ->
      """WITH x AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS from_t
        |  FROM events),
        |tr AS (
        |  SELECT from_t AS from_type, event_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM x WHERE from_t IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(sum(c) AS BIGINT) AS tot FROM tr
        |        GROUP BY 1),
        |tt AS (SELECT CAST(sum(tot) AS BIGINT) AS tt FROM tot),
        |h AS (
        |  SELECT tr.from_type, CAST(max(tot) AS BIGINT) AS tot,
        |    CAST(sum(CAST(round(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE) *
        |      ln(CAST(tot AS DOUBLE) / CAST(c AS DOUBLE)) * 1e9)
        |      AS BIGINT)) AS BIGINT) AS hm
        |  FROM tr JOIN tot ON tot.from_type = tr.from_type
        |  GROUP BY 1)
        |SELECT from_type, tot,
        |  round(CAST(tot AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS pi,
        |  round(hm / 1e9, 6) AS h_nats
        |FROM h CROSS JOIN tt ORDER BY from_type""".stripMargin,
    "q_markov" ->
      """WITH x AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS from_t
        |  FROM events),
        |tr AS (
        |  SELECT from_t AS from_type, event_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM x WHERE from_t IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(sum(c) AS BIGINT) AS tot FROM tr
        |        GROUP BY 1)
        |SELECT tr.from_type, to_type, c,
        |  round(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS p
        |FROM tr JOIN tot ON tot.from_type = tr.from_type
        |ORDER BY tr.from_type, to_type""".stripMargin,
    "q_interarrival" ->
      """WITH g AS (
        |  SELECT user_id,
        |    (epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |      // 1000000 AS g
        |  FROM events),
        |st AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(g) AS BIGINT) AS sg, CAST(sum(g * g) AS BIGINT) AS sgg
        |  FROM g WHERE g IS NOT NULL GROUP BY 1)
        |SELECT user_id, n AS n_gaps,
        |  round(CAST(sg AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_s,
        |  round(CASE WHEN sg = 0 THEN NULL ELSE
        |    sqrt(CAST(n * sgg - sg * sg AS DOUBLE)) / CAST(sg AS DOUBLE)
        |    END, 6) AS cv,
        |  round(CASE WHEN sg = 0 THEN NULL ELSE
        |    (sqrt(CAST(n * sgg - sg * sg AS DOUBLE)) - CAST(sg AS DOUBLE)) /
        |    (sqrt(CAST(n * sgg - sg * sg AS DOUBLE)) + CAST(sg AS DOUBLE))
        |    END, 6) AS burstiness
        |FROM st ORDER BY user_id""".stripMargin,
    "q_attribution" ->
      """WITH t AS (
        |  SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT coalesce(touch, 'direct') AS channel,
        |  CAST(count(*) AS BIGINT) AS conversions,
        |  round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |    / 100, 2) AS revenue
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,
    "q_concurrency" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        |  FROM events GROUP BY 1, 2),
        |sweep AS (
        |  SELECT day, lo AS ts, CAST(1 AS BIGINT) AS delta FROM iv
        |  UNION ALL
        |  SELECT day, hi + 1, CAST(-1 AS BIGINT) FROM iv),
        |run AS (
        |  SELECT day, sum(delta) OVER (PARTITION BY day
        |    ORDER BY ts, delta
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM sweep)
        |SELECT day, CAST(max(run) AS BIGINT) AS max_concurrent,
        |  CAST(count(*) // 2 AS BIGINT) AS n_users
        |FROM run GROUP BY 1 ORDER BY day""".stripMargin,
    "q_event_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id,
        |    min(CASE WHEN rn = 1 THEN event_type END) AS t1,
        |    min(CASE WHEN rn = 2 THEN event_type END) AS t2,
        |    min(CASE WHEN rn = 3 THEN event_type END) AS t3
        |  FROM r WHERE rn <= 3 GROUP BY 1)
        |SELECT concat_ws('>', t1, t2, t3) AS path,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY 1 ORDER BY n_users DESC, path""".stripMargin,
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) AS sx FROM daily),
        |cur AS (
        |  SELECT day, x, n,
        |    n * CAST(sum(x) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    - CAST(row_number() OVER (ORDER BY day) AS BIGINT) * sx AS ns
        |  FROM daily CROSS JOIN t),
        |mx AS (SELECT max(abs(ns)) AS mx FROM cur)
        |SELECT day, x,
        |  round(CAST(ns AS DOUBLE) / CAST(n AS DOUBLE), 6) AS cusum,
        |  CAST(abs(ns) = mx AS INTEGER) AS is_peak
        |FROM cur CROSS JOIN mx ORDER BY day""".stripMargin,
    "q_seasonality" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |bydow AS (
        |  SELECT day % 7 AS dow, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS events
        |  FROM daily GROUP BY 1),
        |g AS (SELECT CAST(sum(n_days) AS BIGINT) AS cc,
        |        CAST(sum(events) AS BIGINT) AS ss FROM bydow)
        |SELECT dow, n_days, events,
        |  round((CAST(events AS DOUBLE) * CAST(cc AS DOUBLE)) /
        |    (CAST(n_days AS DOUBLE) * CAST(ss AS DOUBLE)), 6)
        |    AS seasonal_index
        |FROM bydow CROSS JOIN g ORDER BY dow""".stripMargin,
    "q_runs_test" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |mv AS (
        |  SELECT day, x - lag(x, 1) OVER (ORDER BY day) AS diff
        |  FROM daily),
        |m2 AS (SELECT day, CAST(sign(diff) AS BIGINT) AS sgn
        |       FROM mv WHERE diff IS NOT NULL AND diff <> 0),
        |rn AS (
        |  SELECT sgn,
        |    CASE WHEN lag(sgn, 1) OVER (ORDER BY day) IS NULL
        |      OR lag(sgn, 1) OVER (ORDER BY day) <> sgn
        |    THEN 1 ELSE 0 END AS brk
        |  FROM m2),
        |agg AS (
        |  SELECT CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_up,
        |    CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_down,
        |    CAST(sum(brk) AS BIGINT) AS r
        |  FROM rn),
        |f AS (SELECT n_up, n_down, r,
        |        CAST(n_up AS DOUBLE) AS p, CAST(n_down AS DOUBLE) AS m,
        |        CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE) AS nn
        |      FROM agg)
        |SELECT n_up, n_down, r,
        |  round(2.0 * p * m / nn + 1.0, 6) AS expected_r,
        |  round(CASE WHEN sqrt(2.0 * p * m * (2.0 * p * m - nn) /
        |      (nn * nn * (nn - 1.0))) = 0 THEN NULL
        |    ELSE (CAST(r AS DOUBLE) - (2.0 * p * m / nn + 1.0)) /
        |      sqrt(2.0 * p * m * (2.0 * p * m - nn) /
        |        (nn * nn * (nn - 1.0))) END, 6) AS z
        |FROM f""".stripMargin,
    "q_negbin_fit" ->
      """WITH k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS k
        |           FROM events GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(k) AS BIGINT) AS sk,
        |        CAST(sum(k * k) AS BIGINT) AS skk FROM k),
        |f AS (SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sk AS DOUBLE)
        |        AS skd, CAST(skk AS DOUBLE) AS skkd FROM a),
        |m AS (SELECT n, skd / nd AS mean,
        |        (nd * skkd - skd * skd) / (nd * (nd - 1.0)) AS vv
        |      FROM f)
        |SELECT n AS n_users, round(mean, 6) AS mean,
        |  round(CASE WHEN n = 1 THEN NULL ELSE vv END, 6) AS variance,
        |  round(CASE WHEN n = 1 OR vv <= mean THEN NULL
        |    ELSE mean * mean / (vv - mean) END, 6) AS r,
        |  round(CASE WHEN n = 1 OR vv <= mean THEN NULL
        |    ELSE mean / vv END, 6) AS p
        |FROM m""".stripMargin,
    "q_poisson_fit" ->
      """WITH k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS k
        |           FROM events GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(k) AS BIGINT) AS sk,
        |        CAST(sum(k * k) AS BIGINT) AS skk FROM k),
        |f AS (SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sk AS DOUBLE)
        |        AS skd, CAST(skk AS DOUBLE) AS skkd FROM a)
        |SELECT n AS n_users, round(skd / nd, 6) AS lambda,
        |  round(CASE WHEN n = 1 THEN NULL ELSE
        |    ((nd * skkd - skd * skd) / (nd * (nd - 1.0))) / (skd / nd)
        |    END, 6) AS dispersion,
        |  round(CASE WHEN n = 1 THEN NULL ELSE
        |    sqrt(2.0 * ((nd - 1.0) *
        |      (((nd * skkd - skd * skd) / (nd * (nd - 1.0))) /
        |        (skd / nd)))) - sqrt(2.0 * (nd - 1.0) - 1.0)
        |    END, 6) AS z
        |FROM f""".stripMargin,
    "q_date_gaps" ->
      """WITH days AS (
        |  SELECT DISTINCT event_type,
        |    epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |lagged AS (
        |  SELECT event_type, day,
        |    lag(day) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |  FROM days)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days,
        |  CAST(max(day) - min(day) + 1 - count(*) AS BIGINT) AS n_missing,
        |  CAST(coalesce(max(day - prev - 1), 0) AS BIGINT) AS max_gap
        |FROM lagged GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
