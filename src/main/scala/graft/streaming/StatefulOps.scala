package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators via
  * `KeyValueGroupedDataset.{map,flatMap}GroupsWithState` — the
  * arbitrary-state path for semantics the built-in windowed aggs can't
  * express.
  *
  * Scale notes: state lives in the state store, partitioned by key —
  * the same hash shuffle as a batch groupBy; per-key state here is
  * O(1) (a boolean / a counter), so state size is bounded by distinct
  * keys, and `ProcessingTimeTimeout` (used by [[firstSeenExpiring]])
  * evicts idle keys so unbounded key domains don't accumulate forever —
  * the streaming analog of the dedup watermark.
  */
object StatefulOps {

  /** TTL plumbing shared by [[linkageOnArrival]] / [[goldenOnArrival]]:
    * a linkage horizon (e.g. "10 minutes") turns on
    * ProcessingTimeTimeout so idle blocks are evicted and state stays
    * bounded on an infinite stream; None keeps NoTimeout and the exact
    * full-replay == batch contract.
    */
  private def timeoutConf(ttl: Option[String]): GroupStateTimeout =
    if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
    else GroupStateTimeout.NoTimeout()

  case class Seen(firstTs: Long)
  case class KeyedEvent(key: String, ts: Long, payload: String)

  /** Streaming first-seen dedup: emits each key's FIRST event only,
    * suppressing every later duplicate (streaming exact dedup — the
    * stateful sibling of `dropDuplicates`).
    */
  def firstSeen(
      spark: SparkSession,
      events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[Seen, KeyedEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state: GroupState[Seen]) =>
          if (state.exists) {
            rows.foreach(_ => ()) // drain: all duplicates
            Iterator.empty
          } else {
            val first = rows.minBy(_.ts)
            state.update(Seen(first.ts))
            Iterator(first)
          }
      }
  }

  /** Like [[firstSeen]] but with idle-key expiry: keys idle longer than
    * `ttlMs` of processing time are evicted, so a duplicate arriving
    * after the TTL is treated as new. Bounds state for unbounded key
    * domains.
    */
  def firstSeenExpiring(
      spark: SparkSession,
      events: Dataset[KeyedEvent],
      ttlMs: Long): Dataset[KeyedEvent] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[Seen, KeyedEvent](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (key, rows, state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            rows.foreach(_ => ())
            state.setTimeoutDuration(ttlMs)
            Iterator.empty
          } else if (rows.isEmpty) {
            Iterator.empty
          } else {
            val first = rows.minBy(_.ts)
            state.update(Seen(first.ts))
            state.setTimeoutDuration(ttlMs)
            Iterator(first)
          }
      }
  }

  case class KeyCount(key: String, n: Long)

  /** Running per-key event count, re-emitted on every batch that
    * touches the key (Update mode) — the minimal custom streaming
    * aggregate.
    */
  def runningCount(
      spark: SparkSession,
      events: Dataset[KeyedEvent]): Dataset[KeyCount] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[Long, KeyCount](GroupStateTimeout.NoTimeout()) {
        (key, rows, state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          KeyCount(key, n)
      }
  }

  case class LastState(tsUs: Long, eventId: Long, eventType: String)
  case class StateChange(user_id: Long, state: String, valid_from_us: Long)
  case class Transition(user_id: Long, prev_type: String, next_type: String)

  /** Incremental SCD2 change detection — the streaming face of
    * [[graft.ops.EventOps.scd2States]]: per-user state carried across
    * micro-batches (O(1): last ts/id/type), each batch's events sorted
    * by (ts, event_id) within the group and a change row emitted
    * whenever the type differs from the carried state. After a full
    * in-order replay the emitted (user, state, valid_from) set equals
    * the batch SCD2 intervals exactly (StatefulStreamingSpec).
    *
    * Honesty on ordering: a batch's rows are sorted in memory per
    * (user, batch) — bounded by a user's per-trigger volume, the same
    * contract as every GroupState op — but LATE events older than the
    * carried state would be appended out of order; an unbounded
    * out-of-order ingest should window the stream first (the
    * watermarked shapes in [[EventStreams]]).
    */
  /** Streaming event-transition feed — the incremental input to the
    * Markov matrix ([[graft.ops.EventOps.markovTransitions]]): one row
    * per consecutive (prev, next) event pair per user, carried across
    * micro-batches by the same O(1) last-event state as
    * [[scd2Changes]]. Downstream, a streaming (or batch) groupBy over
    * (prev_type, next_type) maintains the live transition counts;
    * after a full in-order replay the transition MULTISET equals the
    * batch lag-derived one (StatefulStreamingSpec compares counts).
    */
  def transitionFeed(
      spark: SparkSession,
      events: org.apache.spark.sql.DataFrame): Dataset[Transition] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastState, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state: GroupState[LastState]) =>
          val sorted = rows.toVector.sortBy(r => (r._3, r._2))
          var st = state.getOption.orNull
          val out = Vector.newBuilder[Transition]
          sorted.foreach { case (_, id, tsUs, typ) =>
            if (st != null) out += Transition(user, st.eventType, typ)
            st = LastState(tsUs, id, typ)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class FeatureAt(
      purchase_id: Long, user_id: Long, ts_us: Long,
      state: Option[String], value_cents: Long)

  /** Streaming point-in-time feature serving — the online face of
    * [[graft.ops.EventOps.featuresAtPurchase]]: the same event stream
    * carries state events and purchase labels; per user the carried
    * O(1) state is the last NON-purchase event (the label must never
    * define its own feature), and each purchase row emits the state
    * that was valid AT its timestamp. This is the online-feature-store
    * loop closed: the batch SCD2 interval join answers training-time
    * lookups, this feed answers the serving-time ones, and after a
    * full in-order replay the two agree row-for-row
    * (StatefulStreamingSpec).
    *
    * Tie rule mirrors the batch interval semantics exactly: at an
    * identical ts, state events apply BEFORE purchases (a purchase at
    * a change's exact ts reads the NEW state — `p_ts >= valid_from`),
    * and among same-ts state events the highest event_id wins (the
    * earlier ones' intervals are zero-width). Purchases before any
    * state event emit a None state, the streaming face of the batch
    * left join. value_cents reproduces the batch round(value*100)
    * HALF_UP exactly via BigDecimal.
    *
    * Scale: state is one (ts, id, type) per user — the same bounded
    * footprint as [[scd2Changes]]; output is purchase-sized.
    */
  def featureFeed(
      spark: SparkSession,
      events: org.apache.spark.sql.DataFrame): Dataset[FeatureAt] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastState, FeatureAt](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state: GroupState[LastState]) =>
          // (ts, isPurchase, event_id): state events first at equal ts
          val sorted = rows.toVector
            .sortBy(r => (r._3, r._4 == "purchase", r._2))
          var st = state.getOption.orNull
          val out = Vector.newBuilder[FeatureAt]
          sorted.foreach { case (_, id, tsUs, typ, v) =>
            if (typ == "purchase")
              out += FeatureAt(id, user, tsUs,
                Option(st).map(_.eventType),
                java.math.BigDecimal.valueOf(v * 100)
                  .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
            else st = LastState(tsUs, id, typ)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class Credit(
      user_id: Long, channel: String, rnk: Long, n_t: Long,
      p_cents: Long, lin_cents: Long)

  /** Streaming multi-touch attribution — the online face of
    * [[graft.ops.EventOps.attribution]]: per user the carried state is
    * the ordered list of touches since the last purchase; each arriving
    * purchase emits one credit row per touch (rank, journey size,
    * conversion cents, and the sum-preserving linear share) or a single
    * 'direct' row when the journey is touchless, then resets. Rows
    * sort by (ts, event_id) within each (user, batch) — the batch
    * operator's total order — so a full in-order replay aggregates to
    * the batch attribution table exactly (StatefulStreamingSpec).
    * Touches after a user's last purchase stay in state, unemitted —
    * the batch operator's attribution-window rule.
    *
    * Scale: state is one journey's channel list per user — bounded by
    * journey length, not stream length; an abandoned journey that
    * should stop holding state is the ProcessingTimeTimeout case, the
    * same knob as [[firstSeenExpiring]].
    */
  def attributionFeed(
      spark: SparkSession,
      events: org.apache.spark.sql.DataFrame): Dataset[Credit] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[String], Credit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state: GroupState[Seq[String]]) =>
          val sorted = rows.toVector.sortBy(r => (r._3, r._2))
          var touches = state.getOption.getOrElse(Seq.empty).toVector
          val out = Vector.newBuilder[Credit]
          sorted.foreach { case (_, _, _, typ, v) =>
            if (typ == "purchase") {
              val cents = java.math.BigDecimal.valueOf(v * 100)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValue
              if (touches.isEmpty)
                out += Credit(user, "direct", 1L, 1L, cents, cents)
              else {
                val n = touches.length.toLong
                touches.iterator.zipWithIndex.foreach { case (ch, i) =>
                  val rnk = i + 1L
                  val lin = cents / n + (if (rnk <= cents % n) 1L else 0L)
                  out += Credit(user, ch, rnk, n, cents, lin)
                }
              }
              touches = Vector.empty
            } else touches = touches :+ typ
          }
          state.update(touches)
          out.result().iterator
      }
  }

  case class AbDelta(
      variant: String, d_users: Long, d_converters: Long, d_purchases: Long,
      d_cents: Long, d_events: Long, d_errors: Long)
  case class AbSeen(converted: Boolean)

  /** JVM replay of the batch A/B splitter
    * ([[graft.ops.EventOps.abExperiment]]): md5 of "ab:<user_id>",
    * first 15 hex chars as a 60-bit long, mod 2.
    */
  private[graft] def abVariant(user: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab:$user".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) "A"
    else "B"
  }

  /** Streaming A/B experiment feed — the online face of
    * [[graft.ops.EventOps.abExperiment]]: per user (the state key), a
    * DELTA row per micro-batch carrying the increments the live panel
    * needs — first-exposure (new user), first-conversion (the
    * once-per-user transition an absolute counter cannot express),
    * purchases, cents, events, errors. A downstream `groupBy(variant)`
    * sum over the feed IS the running experiment readout; after a full
    * replay it equals the batch panel's raw counts exactly
    * (StatefulStreamingSpec), and permille metrics derive the same
    * way. This is how a live dashboard reads an experiment
    * mid-flight instead of re-scanning the event log per refresh.
    *
    * Scale: state is ONE boolean per user (has this user converted) —
    * the minimal memory that makes `n_converters` incrementalizable;
    * every other metric is a pure per-batch sum. Output is one row per
    * (user, batch) with activity, aggregating to variant-sized.
    */
  def abFeed(
      spark: SparkSession,
      events: org.apache.spark.sql.DataFrame): Dataset[AbDelta] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events
      .select(col("user_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AbSeen, AbDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state: GroupState[AbSeen]) =>
          val rs = rows.toVector
          val pur = rs.filter(_._2 == "purchase")
          val cents = pur.map(r =>
            java.math.BigDecimal.valueOf(r._3 * 100)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue).sum
          val first = !state.exists
          val wasConv = state.getOption.exists(_.converted)
          val nowConv = wasConv || pur.nonEmpty
          state.update(AbSeen(nowConv))
          Iterator.single(AbDelta(abVariant(user),
            if (first) 1L else 0L,
            if (!wasConv && nowConv) 1L else 0L,
            pur.size.toLong, cents, rs.size.toLong,
            rs.count(_._2 == "error").toLong))
      }
  }

  case class HoltState(curDay: Long, curCents: Long, level: Long,
      trend: Long, started: Boolean)
  case class HoltResidual(band: Long, day: Long, cents: Long,
      forecast_cents: Long, abs_err: Long)

  /** Streaming Holt linear-trend monitor — the online face of
    * [[graft.ops.EventOps.holtForecast]]: per revenue band the state
    * is the open day's running cents plus the (level, trend) pair; a
    * later-day event CLOSES every day up to it (zero-filling gaps,
    * the dense-grid discipline), and each closed day AFTER the first
    * emits (actual, level+trend forecast from before the update,
    * absolute error), then folds the actual in with the same integer
    * permille recurrence as the batch fold (alpha=300, beta=100,
    * truncating DIV). The final open day never closes — the batch
    * statement owns corpus-end reporting.
    *
    * Late arrivals: an event whose day predates the open day (only
    * possible across micro-batches) is DROPPED, as in
    * [[forecastResidualFeed]] — its day already closed and emitted.
    *
    * The one honest difference from the batch panel: the batch fold
    * runs over a DENSE grid anchored at the corpus-wide first day, so
    * a band whose purchases start later initializes level = 0 and
    * folds the first real day through the recurrence; a live monitor
    * has no corpus grid, so this feed anchors each band at its own
    * first PURCHASE day and initializes level = that day's cents.
    * From that day on the recurrences are identical; the spec asserts
    * replay == an independent in-memory replay of exactly these
    * semantics.
    *
    * Scale: state is 4 longs + a flag per band — constant; output is
    * days x bands.
    */
  def holtFeed(
      spark: SparkSession,
      events: org.apache.spark.sql.DataFrame,
      alphaPermille: Long = 300L, betaPermille: Long = 100L)
      : Dataset[HoltResidual] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = alphaPermille; val b = betaPermille
    def idiv(x: Long, y: Long): Long = {
      val q = math.abs(x) / math.abs(y)
      if ((x >= 0) == (y >= 0)) q else -q
    }
    events
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 3).as("band"), col("event_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HoltState, HoltResidual](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (band, rows, state: GroupState[HoltState]) =>
          val sorted = rows.toVector.sortBy(r => (r._3, r._2))
          var st = state.getOption.orNull
          val out = Vector.newBuilder[HoltResidual]
          def close(s: HoltState): HoltState = {
            val y = s.curCents
            if (!s.started)
              HoltState(s.curDay + 1, 0L, y, 0L, started = true)
            else {
              val fc = s.level + s.trend
              out += HoltResidual(band, s.curDay, y, fc, math.abs(y - fc))
              val nl = idiv(a * y + (1000L - a) * fc, 1000L)
              val nt = idiv(b * (nl - s.level) + (1000L - b) * s.trend, 1000L)
              HoltState(s.curDay + 1, 0L, nl, nt, started = true)
            }
          }
          sorted.foreach { case (_, _, day, cents) =>
            if (st == null)
              st = HoltState(day, 0L, 0L, 0L, started = false)
            if (day >= st.curDay) { // late-for-a-closed-day rows drop
              while (st.curDay < day) st = close(st)
              st = st.copy(curCents = st.curCents + cents)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class DayRing(curDay: Long, curCents: Long, ring: List[Long])
  case class DayResidual(band: Long, day: Long, cents: Long,
      pred_cents: Long, abs_err: Long)

  /** Streaming seasonal-naive residual monitor — the online face of
    * [[graft.ops.EventOps.forecastBacktest]]: per revenue band the
    * carried state is the open day's running cents plus a ring of the
    * last 7 CLOSED daily totals; an event landing on a later day
    * closes every day up to it (zero-filling skipped days — the batch
    * panel's dense-grid discipline), and each closed day with a full
    * ring emits (actual, same-weekday-last-week prediction, absolute
    * error) — the row a live dashboard compares against the backtest
    * MAE to decide "is today anomalous". The final open day never
    * closes (no later event arrives in a replay); the batch statement
    * owns corpus-end reporting.
    *
    * Late arrivals: an event whose day predates the open day (possible
    * only ACROSS micro-batches — within one batch the rows are sorted)
    * belongs to a day already closed and emitted; crediting it to the
    * open day would corrupt both that day's actual and a prediction a
    * week later, so it is DROPPED, the watermark-discard contract of
    * the batch panel's dense grid. In-order replay (the spec's mode)
    * never hits this path.
    *
    * Scale: state is 8 longs per band — constant; output is
    * days x bands.
    */
  def forecastResidualFeed(
      spark: SparkSession,
      events: org.apache.spark.sql.DataFrame): Dataset[DayResidual] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 3).as("band"), col("event_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DayRing, DayResidual](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (band, rows, state: GroupState[DayRing]) =>
          val sorted = rows.toVector.sortBy(r => (r._3, r._2))
          var st = state.getOption.orNull
          val out = Vector.newBuilder[DayResidual]
          def close(s: DayRing): DayRing = {
            if (s.ring.length >= 7) {
              val pred = s.ring(6)
              out += DayResidual(band, s.curDay, s.curCents, pred,
                math.abs(s.curCents - pred))
            }
            DayRing(s.curDay + 1, 0L, (s.curCents :: s.ring).take(7))
          }
          sorted.foreach { case (_, _, day, cents) =>
            if (st == null) st = DayRing(day, 0L, Nil)
            if (day >= st.curDay) { // late-for-a-closed-day rows drop
              while (st.curDay < day) st = close(st)
              st = st.copy(curCents = st.curCents + cents)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class SessionAgg(lastTsUs: Long, e1: String, e2: String, e3: String)
  case class SessionPath(user_id: Long, path: String, closed_at_us: Long)

  /** Streaming session-path feed — the online face of
    * [[graft.ops.EventOps.sessionPaths]]: per user the carried O(1)
    * state is the open session's last-event time plus its first up-to-3
    * event types; an arriving event more than the gap after the last
    * one CLOSES the open session (emitting its path row) and starts a
    * new one. Emits closed sessions only — the one honest difference
    * from the batch panel, which also counts each user's still-open
    * final session; the spec replays the stream and asserts
    * closed-paths == batch minus exactly those finals. Rows sort by
    * (ts, event_id) within each (user, batch) — the batch total order.
    *
    * An idle user's open session closing by TIMEOUT rather than by a
    * successor event is the ProcessingTimeTimeout knob
    * ([[firstSeenExpiring]]); kept event-driven here so replay is
    * deterministic.
    */
  def sessionPathFeed(
      spark: SparkSession,
      events: org.apache.spark.sql.DataFrame,
      gapUs: Long = 600L * 1000000L): Dataset[SessionPath] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAgg, SessionPath](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state: GroupState[SessionAgg]) =>
          val sorted = rows.toVector.sortBy(r => (r._3, r._2))
          var st = state.getOption.orNull
          val out = Vector.newBuilder[SessionPath]
          def path(s: SessionAgg): String =
            Seq(s.e1, s.e2, s.e3).filter(_ != null).mkString(">")
          sorted.foreach { case (_, _, tsUs, typ) =>
            if (st == null) st = SessionAgg(tsUs, typ, null, null)
            else if (tsUs - st.lastTsUs > gapUs) {
              out += SessionPath(user, path(st), st.lastTsUs)
              st = SessionAgg(tsUs, typ, null, null)
            } else {
              val filled =
                if (st.e2 == null) st.copy(e2 = typ)
                else if (st.e3 == null) st.copy(e3 = typ)
                else st
              st = filled.copy(lastTsUs = tsUs)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class ConvLag(purchase_id: Long, user_id: Long, dow: Long,
      lag_sec: Long)

  /** Streaming conversion-lag feed — the online face of
    * [[graft.ops.EventOps.conversionLag]]: per user the carried O(1)
    * state is the microsecond timestamp of the last view; each
    * arriving purchase with a known prior view emits one
    * (dow, lag_sec) row (view-less purchases emit nothing — the batch
    * null filter). Rows sort by (ts, event_id) within each
    * (user, batch) — the batch window's total order, so a view and a
    * purchase sharing a timestamp resolve identically — and a full
    * in-order replay's rows aggregate to the batch panel exactly
    * (StatefulStreamingSpec). Day-of-week uses the same epoch-Monday
    * integer arithmetic (floorDiv on epoch days, anchored at
    * 2024-01-01 = day 19723).
    *
    * This is the lag HISTOGRAM feed: a live dashboard folds these rows
    * into its own quantile sketch per refresh; the exact type-1
    * quantiles stay a batch-side statement over the same rows.
    */
  def conversionLagFeed(
      spark: SparkSession,
      events: org.apache.spark.sql.DataFrame): Dataset[ConvLag] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seen, ConvLag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state: GroupState[Seen]) =>
          val sorted = rows.toVector.sortBy(r => (r._3, r._2))
          var lastView = state.getOption.map(_.firstTs).getOrElse(-1L)
          val out = Vector.newBuilder[ConvLag]
          sorted.foreach { case (_, id, tsUs, typ) =>
            if (typ == "view") lastView = tsUs
            else if (lastView >= 0L) {
              val day = Math.floorDiv(tsUs, 86400L * 1000000L)
              val dow = Math.floorMod(day - 19723L, 7L)
              out += ConvLag(id, user, dow, (tsUs - lastView) / 1000000L)
            }
          }
          if (lastView >= 0L) state.update(Seen(lastView))
          out.result().iterator
      }
  }

  def scd2Changes(
      spark: SparkSession,
      events: org.apache.spark.sql.DataFrame): Dataset[StateChange] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastState, StateChange](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state: GroupState[LastState]) =>
          val sorted = rows.toVector.sortBy(r => (r._3, r._2))
          var st = state.getOption.orNull
          val out = Vector.newBuilder[StateChange]
          sorted.foreach { case (_, id, tsUs, typ) =>
            if (st == null || st.eventType != typ)
              out += StateChange(user, typ, tsUs)
            st = LastState(tsUs, id, typ)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Exact Levenshtein (unit-cost insert/delete/substitute) — the same
    * metric Spark's `levenshtein` expression and DuckDB's
    * `levenshtein` compute; the in-state verifier for
    * [[linkageOnArrival]], so stream and batch agree bit-for-bit.
    * Iterates CODE POINTS, not UTF-16 chars, because that is what both
    * engines count: a supplementary-plane character (emoji in a
    * product name) is ONE edit to them, and a char-indexed loop would
    * charge 2 — breaking the documented stream/batch parity exactly
    * where it's hardest to notice (r14 advice).
    */
  private[graft] def editDistance(a: String, b: String): Int = {
    val ac = a.codePoints().toArray
    val bc = b.codePoints().toArray
    val (n, m) = (ac.length, bc.length)
    val prev = Array.tabulate(m + 1)(identity)
    val cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val sub = prev(j - 1) + (if (ac(i - 1) == bc(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }

  /** Streaming SCHEMA-DRIFT monitor over semi-structured props — the
    * producer-drift alarm beside [[graft.ops.EventOps.variantExtract]]:
    * per event_type, state is the set of DISTINCT observed variant
    * schemas (schema strings — bounded by real producer variation,
    * not stream length) plus an event counter; every refresh re-emits
    * (n_events, n_schemas, first_schema, drifted) where drifted =
    * n_schemas > 1, the wire a consumer watches before a shredded
    * reader breaks on a shape it never saw. The schema comes from the
    * SAME schema_of_variant(parse_json(props)) expression the batch
    * panel uses (nulls excluded exactly as countDistinct excludes
    * them), so a full replay's (n_events, n_schemas) equals batch
    * variantExtract bit-for-bit (StatefulStreamingSpec).
    */
  def schemaDriftFeed(
      eventsStream: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = eventsStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    eventsStream
      .select(col("event_type"),
        expr("schema_of_variant(parse_json(props))").as("sch"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Seq[String]),
        (String, Long, Long, String, Boolean)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (typ, rows, state) =>
          var (n, schemas) = state.getOption.getOrElse((0L, Seq.empty[String]))
          val set = scala.collection.mutable.LinkedHashSet(schemas: _*)
          rows.foreach { case (_, sch) =>
            n += 1
            if (sch != null) set += sch // countDistinct excludes nulls
          }
          state.update((n, set.toSeq))
          Iterator.single((typ, n, set.size.toLong,
            set.headOption.getOrElse(""), set.size > 1))
      }
      .toDF("event_type", "n_events", "n_schemas", "first_schema", "drifted")
  }

  /** Streaming GOLDEN-RECORD MAINTENANCE — the fusion stage of
    * continuous MDM, downstream of [[linkageOnArrival]]: per-block
    * state holds the member list plus a UNION-FIND parent map, so an
    * arriving listing is matched against its block, unioned into its
    * component (min key wins the root, the batch survivorship rule),
    * and the AFFECTED entities' golden rows are re-emitted — plus a
    * TOMBSTONE (n_listings = 0) for any pre-existing entity id that a
    * merge absorbed, so a consumer compacting by (entity_id, latest)
    * and dropping tombstones holds exactly the batch
    * [[graft.ops.EntityOps.goldenRecords]] panel at every point.
    *
    * State is block-bounded (members + parents of ONE block — the
    * decontaminate contract) and, with `stateTtl` set, TIME-bounded
    * too: a block idle past the linkage horizon is evicted via
    * ProcessingTimeTimeout, so an infinite stream's state stops
    * growing — listings arriving after their block was evicted link
    * only within the fresh window (the standard linkage-horizon
    * semantics; batch parity then holds per window, asserted in
    * StatefulStreamingSpec). Default None preserves the full-replay
    * == batch contract exactly. Per arrival the work is block-sized
    * comparisons plus near-O(1) amortized union-find. cents is
    * computed by the same Spark SQL round() expression the batch
    * uses, upstream of the typed pipeline, so fusion arithmetic is
    * bit-identical.
    */
  def goldenOnArrival(
      partsStream: org.apache.spark.sql.DataFrame,
      maxEdit: Int = 1,
      stateTtl: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val spark = partsStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, lit, when}
    // key and price are catalog invariants (non-null primary key /
    // priced listing) — out of contract if violated, as in batch. A
    // row with a NULL block column or a NULL name, though, is valid
    // input that can never PAIR (batch's equality join / levenshtein
    // both yield no match) yet still fuses as a SINGLETON entity in
    // batch goldenFrom's left join — so it bypasses the stateful path
    // entirely and emits its golden row stateless, keeping the
    // compaction == batch invariant for such rows instead of dropping
    // them (and keeping nulls away from the typed key encoder).
    val base = partsStream
      .select(col("p_brand"), col("p_type"),
        col("p_size").cast("int").as("p_size"),
        col("p_partkey"), col("p_name"),
        expr("CAST(round(p_retailprice * 100, 0) AS BIGINT)").as("cents"))
    val blockable = col("p_brand").isNotNull && col("p_type").isNotNull &&
      col("p_size").isNotNull && col("p_name").isNotNull
    val singles = base.filter(!blockable)
      .select(col("p_partkey").as("entity_id"),
        lit(1L).as("n_listings"),
        when(col("p_name").isNull, 0L).otherwise(1L).as("n_names"),
        col("p_name").as("survivor_name"),
        col("cents").as("price_cents_lo"),
        col("cents").as("price_cents_hi"))
    // cents rides the typed pipeline as Option[Long]: an UNPRICED
    // listing is valid input that batch goldenFrom fuses normally
    // (min/max skip nulls), so the stream must fuse it too — a bare
    // Long encoder would abort the query on the first null price
    // (r14 advice). Entity price range = min/max over PRICED members,
    // null when none are.
    val fused = base.filter(blockable)
      .as[(String, String, Int, Long, String, Option[Long])]
      .groupByKey(r => (r._1, r._2, r._3))
      .mapValues(r => (r._4, r._5, r._6))
      .flatMapGroupsWithState[
        (Seq[(Long, String, Option[Long])], Seq[(Long, Long)]),
        (Long, Long, Long, String, Option[Long], Option[Long])](
        OutputMode.Update(), timeoutConf(stateTtl)) {
        (_, rows, state) =>
          if (state.hasTimedOut) {
            // linkage horizon passed with no arrivals: evict the block
            // (state stops growing); subsequent arrivals start a fresh
            // window. Golden rows already emitted stay valid — the
            // consumer's compaction holds the per-window batch panel.
            state.remove()
            Iterator.empty
          } else {
          val (members0, parents0) =
            state.getOption.getOrElse((Seq.empty, Seq.empty))
          val members =
            scala.collection.mutable.ArrayBuffer(members0: _*)
          val parent = scala.collection.mutable.Map(parents0: _*)
          def find(k: Long): Long = {
            var r = k
            while (parent(r) != r) r = parent(r)
            var c = k // path compression
            while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
            r
          }
          // pre-existing roots: candidates for merge tombstones
          val preRoots = parents0.collect { case (k, p) if k == p => k }.toSet
          val lost = scala.collection.mutable.Set.empty[Long]
          val touched = scala.collection.mutable.Set.empty[Long]
          rows.toVector.sortBy(_._1).foreach { case (key, name, cents) =>
            parent.getOrElseUpdate(key, key)
            members.foreach { case (k2, n2, _) =>
              if (k2 != key && editDistance(name, n2) <= maxEdit) {
                val (ra, rb) = (find(key), find(k2))
                if (ra != rb) {
                  val (keep, drop) = if (ra < rb) (ra, rb) else (rb, ra)
                  parent(drop) = keep
                  if (preRoots(drop)) lost += drop
                }
              }
            }
            members += ((key, name, cents))
            touched += find(key)
          }
          state.update((members.toSeq,
            parent.keysIterator.map(k => k -> find(k)).toSeq))
          stateTtl.foreach(state.setTimeoutDuration)
          // re-emit every entity whose component changed this batch
          val finalRoots = touched.map(find)
          val golden = finalRoots.toSeq.sorted.map { r =>
            val ms = members.filter(m => find(m._1) == r)
            val priced = ms.flatMap(_._3)
            (r, ms.size.toLong, ms.map(_._2).distinct.size.toLong,
              ms.minBy(_._1)._2,
              if (priced.isEmpty) None else Some(priced.min),
              if (priced.isEmpty) None else Some(priced.max))
          }
          // a pre-existing root absorbed by a merge is DEAD as an
          // entity id: tombstone it so compaction converges on batch
          val tombs = lost.toSeq.sorted.filter(r => find(r) != r)
            .map(r => (r, 0L, 0L, "", Option(0L), Option(0L)))
          (golden ++ tombs).iterator
          }
      }
      .toDF("entity_id", "n_listings", "n_names", "survivor_name",
        "price_cents_lo", "price_cents_hi")
    fused.unionByName(singles)
  }

  /** Streaming ENTITY LINKAGE-ON-ARRIVAL — the continuous-MDM mirror
    * of [[graft.ops.EntityOps.entityPairs]], the dedupOnArrival shape
    * for structured records: each arriving catalog row is matched
    * against every already-seen member of its (brand, type, size)
    * BLOCK — the blocking discipline carried into state, so per-block
    * state is the member list (key, name), bounded by BLOCK size,
    * never catalog size — and, with `stateTtl` set, TIME-bounded too:
    * a block idle past the linkage horizon is evicted via
    * ProcessingTimeTimeout, so arrivals after eviction pair only
    * within the fresh window (the linkage-horizon semantics every
    * production MDM stream runs with; StatefulStreamingSpec asserts
    * both the eviction — state row count drops — and batch parity on
    * the fresh window). Each unordered match pair is emitted EXACTLY
    * ONCE — when its second member arrives (members process in key
    * order within a micro-batch) — oriented (min key, max key), so
    * with the default `stateTtl = None` a full replay emits exactly
    * the batch entityPairs set regardless of how the stream was
    * chopped into micro-batches (StatefulStreamingSpec asserts set
    * equality).
    */
  def linkageOnArrival(
      partsStream: org.apache.spark.sql.DataFrame,
      maxEdit: Int = 1,
      stateTtl: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val spark = partsStream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat_ws}
    partsStream
      // batch blocks on three EQUALITY join keys and verifies with
      // levenshtein, so a row with any null block column OR a null
      // name never appears in any batch pair — drop such rows rather
      // than letting a composite key invent a shared block for them
      // (or a null name NPE the in-state verifier); the key is a
      // TUPLE, not a string concat, so values containing a separator
      // can't alias two different blocks either
      .filter(col("p_brand").isNotNull && col("p_type").isNotNull &&
        col("p_size").isNotNull && col("p_name").isNotNull)
      .select(col("p_brand"), col("p_type"),
        col("p_size").cast("int").as("p_size"),
        col("p_partkey"), col("p_name"))
      .as[(String, String, Int, Long, String)]
      .groupByKey(r => (r._1, r._2, r._3))
      .mapValues(r => (r._4, r._5))
      .flatMapGroupsWithState[Seq[(Long, String)], (Long, Long, Long)](
        OutputMode.Append(), timeoutConf(stateTtl)) {
        (_, rows, state) =>
          if (state.hasTimedOut) {
            state.remove() // horizon passed idle: drop the block
            Iterator.empty
          } else {
          val members = scala.collection.mutable.ArrayBuffer(
            state.getOption.getOrElse(Seq.empty): _*)
          val out = Seq.newBuilder[(Long, Long, Long)]
          rows.toVector.sortBy(_._1).foreach { case (key, name) =>
            members.foreach { case (k2, n2) =>
              if (k2 != key) {
                val d = editDistance(name, n2)
                if (d <= maxEdit)
                  out += ((math.min(key, k2), math.max(key, k2), d.toLong))
              }
            }
            members += ((key, name))
          }
          state.update(members.toSeq)
          stateTtl.foreach(state.setTimeoutDuration)
          out.result().iterator
          }
      }
      .toDF("part_a", "part_b", "name_edit")
  }
}
