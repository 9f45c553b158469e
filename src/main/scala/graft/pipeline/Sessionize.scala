package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.Column

/** Gap-based sessionization — the canonical event-log operator for a
  * web-scale pipeline: group a user's events into sessions separated by
  * a silence gap, in three interchangeable forms.
  *
  *  1. [[label]]/[[summarize]] — the portable window-function form
  *     (lag + running sum). One shuffle on the user key; both window
  *     passes share the same partitioning+ordering so Spark sorts once.
  *     This is the form a DuckDB/ANSI oracle can reproduce exactly.
  *  2. [[viaSessionWindow]] — Spark's native `session_window` grouping,
  *     the idiomatic form for both batch and Structured Streaming.
  *  3. [[runStreamingSessions]] — an incremental
  *     `flatMapGroupsWithState` build whose per-user state is the set of
  *     session SUMMARIES (not raw events), merged interval-style, so
  *     out-of-order arrival across micro-batches lands on the same
  *     boundaries as the batch forms: the session partition of a set of
  *     timestamps is the transitive closure of "within gap", a function
  *     of the SET alone, not the arrival order.
  *
  * Scale: all three forms shuffle once on the user key; per-user work
  * is linear in that user's events. The streaming state is bounded by
  * sessions-per-user, not events-per-user (a production deployment
  * additionally drops closed sessions past the watermark with an
  * event-time timeout; the gate keeps every summary so the final state
  * is comparable to the batch result over a finite replay).
  */
object Sessionize {

  /** Epoch micros of a timestamp column; the driver testdata carries
    * TIMESTAMP_NTZ, which `unix_micros` rejects — the cast reads it as
    * a UTC instant (the session timezone is pinned to UTC). */
  def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Adds a 1-based `session_idx` per user: a new session starts when
    * the gap since the user's previous event EXCEEDS `gapSeconds` —
    * delta == gap stays in-session, which is `session_window`'s
    * measured convention (an event landing precisely on a window's
    * last + gap end merges into it; verified in SessionizeSpec).
    * Ordering ties on the timestamp are broken by `tieCol` so the
    * labeling is deterministic. */
  def label(events: DataFrame, userCol: String, tsCol: String, tieCol: String,
            gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val tsUs = micros(col(tsCol))
    val prev = lag(tsUs, 1).over(w)
    events
      .withColumn("__is_new",
        when(prev.isNull || tsUs - prev > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__is_new")
  }

  /** Per-session summary over a [[label]]ed frame: bounds, event count,
    * and the sum of `valueCol` (raw — callers round for oracles). */
  def summarize(labeled: DataFrame, userCol: String, tsCol: String,
                valueCol: String): DataFrame =
    labeled.groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"))

  /** Native `session_window` form. Output: user, w_start (= first event
    * ts), w_end (= last event ts + gap, Spark's half-open window end),
    * n_events. */
  def viaSessionWindow(events: DataFrame, userCol: String, tsCol: String,
                       gapSeconds: Long): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), s"$gapSeconds seconds").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("n_events"))

  // ------------------------------------------------ streaming (stateful)

  /** One session's running summary in streaming state (timestamps in
    * epoch micros to keep the state codec trivial). */
  case class SessionSummary(startUs: Long, endUs: Long, n: Long, total: Double)

  private[pipeline] case class UserState(nEvents: Long, sessions: List[SessionSummary])

  private[pipeline] case class EventIn(user_id: Long, ts_us: Long, value: Double)

  /** Final emission per user per micro-batch; the row with the largest
    * `n_events` is the one that saw the whole replay. */
  case class UserSessions(user_id: Long, n_events: Long,
                          sessions: Seq[SessionSummary])

  /** Merge one event into a sorted session-summary list. A session
    * absorbs the event when it lands within `gapUs` of the session's
    * bounds; an event bridging two sessions merges them. Boundaries and
    * counts are arrival-order-independent (interval closure of the
    * timestamp set); only the float `total` is order-sensitive, which
    * equivalence gates compare with a tolerance. */
  private[pipeline] def mergeEvent(sessions: List[SessionSummary], tsUs: Long,
                                   value: Double, gapUs: Long): List[SessionSummary] = {
    val (touching, rest) = sessions.partition(s =>
      tsUs >= s.startUs - gapUs && tsUs <= s.endUs + gapUs)
    val merged = touching.foldLeft(SessionSummary(tsUs, tsUs, 1L, value)) { (acc, s) =>
      SessionSummary(math.min(acc.startUs, s.startUs), math.max(acc.endUs, s.endUs),
        acc.n + s.n, acc.total + s.total)
    }
    (merged :: rest).sortBy(_.startUs)
  }

  /** Runs a Structured Streaming sessionization over the staged parquet
    * directory (one file per micro-batch) and returns the final per-user
    * sessions as a BATCH frame: (user_id, start_us, end_us, n, total).
    * State lives in the streaming state store across micro-batches; the
    * memory sink accumulates one update per (user, batch) and the final
    * row per user is selected by max n_events. */
  def runStreamingSessions(spark: SparkSession, stagedDir: String,
                           userCol: String, tsCol: String, valueCol: String,
                           gapSeconds: Long): DataFrame = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    val schema = spark.read.parquet(stagedDir).schema
    val qname = "graft_sessions_" + java.util.UUID.randomUUID.toString.replace("-", "")
    // The state store allocates one state partition per shuffle
    // partition PER MICRO-BATCH; at gate scale (150 users) 32
    // partitions x 4 batches is pure task overhead, so the stream runs
    // on a small explicit count (batch queries in the session are
    // unaffected — the conf is restored after the stream terminates).
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stagedDir)
      .select(col(userCol).cast("long").as("user_id"),
        micros(col(tsCol)).as("ts_us"), col(valueCol).cast("double").as("value"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventIn], st: GroupState[UserState]) =>
          val prior = st.getOption.getOrElse(UserState(0L, Nil))
          var sessions = prior.sessions
          var n = prior.nEvents
          rows.foreach { e =>
            sessions = mergeEvent(sessions, e.ts_us, e.value, gapUs)
            n += 1
          }
          st.update(UserState(n, sessions))
          Iterator.single(UserSessions(user, n, sessions))
      }
      .writeStream.outputMode("update").format("memory").queryName(qname)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    val w = Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)
    val result = spark.table(qname)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("user_id"), explode(col("sessions")).as("s"))
      .select(col("user_id"), col("s.startUs").as("start_us"),
        col("s.endUs").as("end_us"), col("s.n").as("n"), col("s.total").as("total"))
      .cache()
    result.count() // materialize before the temp view goes away
    spark.catalog.dropTempView(qname)
    result
  }
}
