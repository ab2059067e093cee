package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

/** Structured Streaming surface (SURVEY §2.9 — beyond-reference): the
  * engine's aggregation and dedup paths re-expressed over an unbounded
  * source, plus custom session state via flatMapGroupsWithState.
  *
  * Design: streams are plain DataFrames from `readStream`; every
  * transform below also works on a batch DataFrame, so the bounded
  * oracle harness runs the SAME code with `Trigger.AvailableNow` into a
  * memory sink and compares against the batch SQL oracle.
  *
  * Scale notes: windowed aggregates carry watermarks so state is evicted
  * (unbounded state is the streaming scale-killer); sessionization keys
  * state by user — state size is O(active users), not O(events).
  */
object EventStreams {

  /** Unbounded `events` source: parquet file stream with the batch
    * table's schema (ts arrives as raw TIMESTAMP(NANOS) Long, converted
    * exactly like `Tables.events`).
    */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file source wants a directory basePath; the testdata table is a
    // single file, so address it with a glob — glob paths anchor basePath
    // at the glob's parent directory instead of the file itself
    val raw = spark.readStream.schema(schema)
      .parquet(s"$dir/events.[p]arquet")
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts_nanos", col("ts"))
        // integer `div`, NOT `/`: Long / Long coerces to double division,
        // and 2024-era nano timestamps (~1.7e18) exceed 2^53 — the double
        // round-trip can land 1 µs off, silently diverging from the batch
        // path (Tables.normalizeTs) and the oracle on boundary rows
        .withColumn("ts", timestamp_micros(expr("ts_nanos div 1000")))
    else
      // timestamp[us] testdata arrives as TIMESTAMP_NTZ (Spark 4 infers
      // NTZ from isAdjustedToUTC=false); normalize to session-zoned
      // TimestampType FIRST exactly like Tables.normalizeTs — the session
      // tz is UTC so the cast is value-preserving, and unix_micros
      // rejects NTZ input outright (the round-11 analysis error that
      // broke all five streaming queries). On an already-LTZ column the
      // cast is a no-op Catalyst removes.
      raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
        .withColumn("ts_nanos", unix_micros(col("ts")) * 1000L)
  }

  /** Per-window heavy hitters via the native `mg_sketch` aggregate —
    * sketches as STREAMING STATE: the TypedImperativeAggregate's
    * serialize/merge path (the same one batch shuffles exercise) is
    * what the state store round-trips between micro-batches, so a
    * window's candidate set accumulates across batches in ≤ 2·cap
    * terms of state — the q100 vocabulary-independence argument
    * applied to an unbounded stream, where it matters MORE: a
    * per-window exact token count would grow state with the window's
    * vocabulary, unevictable until the watermark closes the window.
    * The Misra-Gries containment guarantee (any term with count >
    * n/(cap+1) is present) holds per window regardless of how the
    * stream was batched; `err` rides along so the consumer can apply
    * the q100 exactness test downstream.
    */
  def windowedHeavyHitters(ev: DataFrame, cap: Int, termCol: String,
                           watermark: String = "2 hours"): DataFrame =
    ev.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr(s"mg_sketch($termCol, $cap)").as("sk"))
      .select(col("window.start").as("window_start"),
        col("sk.terms").as("terms"), col("sk.err").as("err"))

  /** Event-time windowed VALUE histogram (T40): the streaming producer
    * of q130's mergeable quantile partials — per (hour window, fixed
    * bucket) integer counts, watermark-evicted. State per window is
    * ≤ histB rows regardless of event volume or value distribution (the
    * same capacity-bound story as [[windowedHeavyHitters]], for
    * quantiles), and the emitted partials merge downstream by plain
    * SUM-by-bucket — percentile estimates over any window span without
    * rescanning the stream, with q130's ≤ 2-bucket error bound.
    */
  def windowedValueHistogram(ev: DataFrame, histB: Long, histW: Double,
                             watermark: String = "2 hours",
                             extraKeys: Seq[String] = Nil): DataFrame =
    ev.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour") +:
        least(lit(histB - 1),
          floor(col("value") / histW).cast("long")).as("bucket") +:
        extraKeys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start") +: col("bucket") +:
        col("cnt") +: extraKeys.map(col): _*)

  /** Event-time hourly histogram with watermark — the streaming mirror of
    * `TrafficOps.hourlyCount`. Late data beyond the watermark is dropped;
    * window state is evicted as the watermark advances.
    */
  def hourlyCounts(ev: DataFrame, watermark: String = "2 hours"): DataFrame =
    ev.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(hour(col("window.start")).cast("long").as("hour"),
        col("window.start").as("window_start"), col("cnt"))

  /** Streaming exact dedup on content key with watermarked state eviction
    * — the streaming form of `DedupOps.exactDups`' keep-first semantics.
    */
  def dedupStream(ev: DataFrame, keyCols: Seq[String],
                  watermark: String = "2 hours"): DataFrame =
    ev.withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")

  /** Key-only streaming dedup (`dropDuplicatesWithinWatermark`): unlike
    * [[dedupStream]], the event-time column is NOT part of the key — a
    * key is emitted once and suppressed until the watermark passes its
    * last-seen event time, the retry-collapse/at-least-once-ingest pass.
    * State per key is bounded by the watermark delay, not stream
    * history.
    */
  def dedupWithinWatermark(ev: DataFrame, keyCols: Seq[String],
                           watermark: String): DataFrame =
    ev.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** The built-in `session_window` aggregation as a stream — the
    * streaming twin of q104 (RelEntry), completing T24's claim that the
    * built-in gets STATE MERGING for free: when a later micro-batch
    * delivers an event within the gap of an open session (or bridging
    * two previously-separate sessions), the state store merges the
    * session windows server-side — the hand-rolled q45 flatMapGroups
    * version must code that merge by hand. Watermark bounds state: a
    * session older than (watermark − gap) can never grow again and is
    * evicted. Same projection as the batch q104, so the bounded drain
    * faces the same oracle shape.
    */
  def sessionWindowCounts(ev: DataFrame, gapSec: Long,
                          watermark: String = "2 hours"): DataFrame =
    ev.withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSec seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  // ---- custom state: sessionization ------------------------------------
  final case class SessionEvent(user_id: Long, ts_nanos: Long)
  final case class SessionState(lastTs: Long, sessions: Long, events: Long)
  final case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  /** Per-user session counting with explicit GroupState: a new session
    * starts when the gap to the previous event exceeds `gapNanos`.
    * Batch-internal events are sorted by time inside the group function;
    * state carries (lastTs, counts) across micro-batches. Emits the
    * running per-user aggregate each batch (Update mode).
    */
  def sessionize(spark: SparkSession, ev: DataFrame,
                 gapNanos: Long): Dataset[UserSessions] = {
    import spark.implicits._
    ev.select(col("user_id"), col("ts_nanos"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, events: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = events.map(_.ts_nanos).toArray.sorted
          if (sorted.isEmpty) Iterator.empty
          else {
            val prev = state.getOption
            var (lastTs, sessions, nEvents) = prev
              .map(s => (s.lastTs, s.sessions, s.events))
              .getOrElse((Long.MinValue, 0L, 0L))
            sorted.foreach { t =>
              if (lastTs == Long.MinValue || t - lastTs > gapNanos) sessions += 1
              lastTs = t; nEvents += 1
            }
            state.update(SessionState(lastTs, sessions, nEvents))
            Iterator.single(UserSessions(user, nEvents, sessions))
          }
      }
  }

  /** [[sessionize]] re-expressed on Spark 4's `transformWithState`
    * StatefulProcessor API — the successor of flatMapGroupsWithState
    * (SPARK-40434): typed composable state handles (Value/List/Map) with
    * per-state TTL instead of one opaque blob with one timeout, timers
    * decoupled from state, and RocksDB-only by design (the scale-grade
    * backend is the contract, not an option). Kept BESIDE the fMGWS form
    * deliberately: same semantics, two state APIs — StreamingSpec proves
    * them batch-for-batch identical, which is the migration-safety
    * property a production stream needs before switching.
    *
    * State here is one fixed-size triple per ACTIVE user (same bound as
    * the fMGWS version); `TTLConfig` is where an idle-user eviction
    * policy would go — NONE keeps parity with the fMGWS NoTimeout form.
    */
  final class SessionizeProcessor(gapNanos: Long)
      extends StatefulProcessor[Long, SessionEvent, UserSessions] {
    @transient private var st: ValueState[SessionState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessionState]("sess",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
                                 tv: TimerValues): Iterator[UserSessions] = {
      val sorted = rows.map(_.ts_nanos).toArray.sorted
      if (sorted.isEmpty) Iterator.empty
      else {
        var (lastTs, sessions, nEvents) =
          if (st.exists()) { val s = st.get(); (s.lastTs, s.sessions, s.events) }
          else (Long.MinValue, 0L, 0L)
        sorted.foreach { t =>
          if (lastTs == Long.MinValue || t - lastTs > gapNanos) sessions += 1
          lastTs = t; nEvents += 1
        }
        st.update(SessionState(lastTs, sessions, nEvents))
        Iterator.single(UserSessions(user, nEvents, sessions))
      }
    }
  }

  /** [[sessionize]] via [[SessionizeProcessor]]. Requires the RocksDB
    * state-store provider (transformWithState refuses the default
    * HDFS-backed one — set it on the session before starting the query).
    */
  def sessionizeTws(spark: SparkSession, ev: DataFrame,
                    gapNanos: Long): Dataset[UserSessions] = {
    import spark.implicits._
    ev.select(col("user_id"), col("ts_nanos"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionizeProcessor(gapNanos),
        TimeMode.None(), OutputMode.Update())
  }

  final case class OpenSession(startTs: Long, lastTs: Long, events: Long)
  final case class ClosedSession(user_id: Long, start_nanos: Long,
                                 end_nanos: Long, n_events: Long)

  /** Timer-closed sessionization — the part of the StatefulProcessor API
    * [[SessionizeProcessor]] doesn't exercise: EVENT-TIME TIMERS
    * decoupled from state. A session is emitted exactly once, as a
    * FINAL row (Append mode), when the watermark passes lastTs + gap —
    * the fMGWS equivalent needs GroupStateTimeout plumbed through the
    * same state blob; here the timer is a separate registration the
    * runtime fires via [[handleExpiredTimer]]. Within a batch, earlier
    * sessions of the same key close inline (the gap rule); only the
    * trailing open session waits on its timer. State per key: one open
    * session + one timer — eviction is the API's job, not a watermark
    * side effect.
    */
  final class SessionCloseProcessor(gapNanos: Long)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {
    @transient private var st: ValueState[OpenSession] = _
    override def init(om: OutputMode, tm: TimeMode): Unit =
      st = getHandle.getValueState[OpenSession]("open",
        org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)
    // round UP to the next whole ms: flooring lastTs and gap separately
    // could fire the timer up to ~2 ms before the nanos-precise horizon,
    // losing the race against a boundary event the strict-> inline rule
    // would have merged
    private def expiryMs(lastTsNanos: Long): Long =
      (lastTsNanos + gapNanos + 999999L) / 1000000L
    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
                                 tv: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.map(_.ts_nanos).toArray.sorted
      if (sorted.isEmpty) Iterator.empty
      else {
        val closed =
          scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
        var open: OpenSession = if (st.exists()) st.get() else null
        sorted.foreach { t =>
          open =
            if (open == null) OpenSession(t, t, 1L)
            else if (t - open.lastTs > gapNanos) {
              closed += ClosedSession(user, open.startTs, open.lastTs,
                open.events)
              OpenSession(t, t, 1L)
            } else OpenSession(open.startTs, math.max(open.lastTs, t),
              open.events + 1L)
        }
        // re-arm: ONE timer per key tracks the open session's horizon
        // (materialize before deleting — mutating while iterating the
        // runtime's timer iterator is undefined)
        getHandle.listTimers().toList.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(expiryMs(open.lastTs))
        st.update(open)
        closed.iterator
      }
    }
    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (!st.exists()) Iterator.empty
      else {
        val o = st.get()
        st.clear()
        Iterator.single(ClosedSession(user, o.startTs, o.lastTs, o.events))
      }
  }

  final case class UserEvent(user_id: Long, ts_nanos: Long,
                             event_id: Long, event_type: String)
  final case class RecentEv(ts_nanos: Long, event_id: Long)
  final case class UserTypeStats(user_id: Long, n_types: Long,
                                 n_events: Long, last_ids: Seq[Long])

  /** Composite-state processor — the two transformWithState state KINDS
    * the sessionizers don't exercise: a MapState (per-user counts keyed
    * by event type — state the size of the user's TYPE set, not their
    * history) and a bounded ListState (the K most recent (ts, id)
    * pairs, trimmed every batch — a ring buffer the fMGWS API could
    * only fake inside one opaque blob). Emits the running per-user
    * summary each batch (Update mode). The composition is the point:
    * one key owns three independently-typed state handles (the
    * SessionizeProcessor's ValueState tier showed one), each with its
    * own TTL policy slot, which is exactly the API migration target
    * SPARK-40434 sells over flatMapGroupsWithState.
    */
  final class TypeStatsProcessor(k: Int)
      extends StatefulProcessor[Long, UserEvent, UserTypeStats] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var recent: ListState[RecentEv] = _
    override def init(om: OutputMode, tm: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[RecentEv]("recent",
        org.apache.spark.sql.Encoders.product[RecentEv], TTLConfig.NONE)
    }
    override def handleInputRows(user: Long, rows: Iterator[UserEvent],
                                 tv: TimerValues): Iterator[UserTypeStats] = {
      val batch = rows.toArray
      if (batch.isEmpty) Iterator.empty
      else {
        batch.groupBy(_.event_type).foreach { case (t, es) =>
          val prev = if (counts.containsKey(t)) counts.getValue(t) else 0L
          counts.updateValue(t, prev + es.length)
        }
        // merge the batch into the bounded ring: keep the K largest
        // (ts, id) pairs across state + batch — clear-and-rewrite is
        // the ListState trim idiom (appendList alone only grows)
        val merged = (recent.get().toSeq ++
            batch.map(e => RecentEv(e.ts_nanos, e.event_id)))
          .sortBy(r => (-r.ts_nanos, -r.event_id)).take(k)
        recent.clear()
        recent.appendList(merged.toArray)
        var nTypes = 0L
        var nEvents = 0L
        val it = counts.iterator()
        while (it.hasNext) { nTypes += 1; nEvents += it.next()._2 }
        Iterator.single(UserTypeStats(user, nTypes, nEvents,
          merged.map(_.event_id)))
      }
    }
  }

  /** [[TypeStatsProcessor]] as a query (RocksDB provider required, as
    * [[sessionizeTws]]).
    */
  def typeStatsTws(spark: SparkSession, ev: DataFrame,
                   k: Int): Dataset[UserTypeStats] = {
    import spark.implicits._
    ev.select(col("user_id"), col("ts_nanos"), col("event_id"),
        col("event_type"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new TypeStatsProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** [[SessionCloseProcessor]] as a query: watermarked event time drives
    * the timers; output is append-mode final sessions.
    */
  def sessionCloseTws(spark: SparkSession, ev: DataFrame, gapNanos: Long,
                      watermark: String = "0 seconds"): Dataset[ClosedSession] = {
    import spark.implicits._
    ev.withColumn("ts", timestamp_micros(expr("ts_nanos div 1000")))
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts_nanos"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionCloseProcessor(gapNanos),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Scratch root shared by every bounded run in this JVM: ONE shutdown
    * hook cleans the whole tree — a hook per invocation would accumulate
    * unboundedly across a long bench loop (ADVICE r3). Each run writes
    * under its own numbered subdirectory, so repeated or concurrent runs
    * never collide.
    */
  private lazy val scratchRoot: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_stream_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scala.util.Try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(r).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }))
    r
  }
  private val runIds = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run a streaming transform of the bounded `events` source to
    * completion (AvailableNow) and return the result — the bridge that
    * lets streaming queries face the batch DuckDB oracle.
    *
    * `build` receives a CLONED session (`spark.newSession`) and must
    * construct the stream from it: the drain overrides the
    * stateful-operator partition count (below), and setting that on the
    * caller's session would silently apply to any concurrent batch query
    * on the same session (ADVICE r3). The clone shares the SparkContext
    * and cached data but owns its SQLConf; the parent's runtime confs
    * are copied over so runtime choices (state-store provider, graft.*
    * knobs) still apply — static confs (extensions, warehouse) can't be
    * re-set and already match via the shared SparkConf.
    *
    * The sink is `foreachBatch` → parquet in a scratch directory, NOT the
    * memory sink: the memory sink pins every result row in driver memory,
    * which for data-dependent outputs (a stream-stream join) is a driver
    * OOM at scale. Complete mode overwrites per batch (each batch carries
    * the full result); Append/Update append their per-batch deltas. Rows
    * stay on executors/disk end to end; the scratch tree is removed on
    * JVM exit.
    *
    * Stateful-operator partition count (= state store instances) is
    * frozen from spark.sql.shuffle.partitions at query start. A
    * production stream sizes it to key cardinality; this bounded drain
    * can size it to the drained volume. The count matters far more than
    * for batch shuffles: a stream-stream join opens FOUR RocksDB
    * instances per partition, so 32 partitions = 128 store open/commit
    * cycles per run (~10 s of fixed cost at local[32]) where 4
    * partitions complete the same drain in ~2.5 s.
    * Precedence (resolved HERE and nowhere else): the
    * SPARK_GRAFT_STREAM_PARTITIONS env var is the operator's override
    * and wins; the `graft.stream.partitions` runtime conf is the
    * programmatic default (what Bench sets); otherwise the session's
    * shuffle-partition setting stands.
    */
  def runBounded(spark: SparkSession, build: SparkSession => DataFrame,
                 sinkName: String, mode: OutputMode,
                 updateKeys: Seq[String] = Nil): DataFrame = {
    val root = java.nio.file.Files.createDirectories(
      scratchRoot.resolve(s"${sinkName}_${runIds.incrementAndGet()}"))
    val session = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(session.conf.set(k, v))
    }
    sys.env.get("SPARK_GRAFT_STREAM_PARTITIONS").filter(_.nonEmpty)
      .orElse(spark.conf.getOption("graft.stream.partitions").filter(_.nonEmpty))
      .foreach(n => session.conf.set("spark.sql.shuffle.partitions", n))
    val out = build(session)
    val dataDir = root.resolve("data").toString
    val saveMode = if (mode == OutputMode.Complete()) "overwrite" else "append"
    val isUpdate = mode == OutputMode.Update()
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = out.writeStream
      .outputMode(mode)
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batches.incrementAndGet()
        // Update mode emits a row per TOUCHED key per batch; stamping the
        // batch id lets the post-drain pass keep only each key's newest
        // row, so a multi-batch drain (e.g. a maxFilesPerTrigger-style
        // source split) stays correct instead of aliasing stale rows
        val stamped =
          if (isUpdate) batch.withColumn("_graft_batch", lit(batchId))
          else batch
        stamped.write.mode(saveMode).parquet(dataDir)
      }
      .start()
    q.awaitTermination()
    // Update mode without declared keys can't be de-aliased after a
    // multi-batch drain — fail loudly rather than return stale rows
    // (single-batch runs are still exact). With keys, any batch count is
    // handled below.
    if (isUpdate && updateKeys.isEmpty && batches.get() > 1)
      throw new IllegalStateException(
        s"Update-mode bounded drain ran ${batches.get()} batches and no " +
          "updateKeys were declared; stale per-batch rows would alias " +
          "final ones — pass the query's grouping keys to runBounded")
    // zero batches executed → foreachBatch never wrote dataDir; return
    // an empty frame with the query's schema (memory-sink behavior)
    if (java.nio.file.Files.exists(root.resolve("data"))) {
      val drained = spark.read.parquet(dataDir)
      if (!isUpdate) drained
      else if (updateKeys.isEmpty) drained.drop("_graft_batch")
      else {
        // latest-per-key: one row per key from its highest batch. Keys
        // are unique within a batch (one row per touched key), so the
        // window has a total order.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(updateKeys.map(col): _*)
          .orderBy(col("_graft_batch").desc)
        drained.withColumn("_graft_rn", row_number().over(w))
          .filter(col("_graft_rn") === 1)
          .drop("_graft_batch", "_graft_rn")
      }
    } else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), out.schema)
  }

  /** Exactly-once `foreachBatch` sink for APPEND-shaped streams into
    * parquet: the production pattern, split into its two halves.
    * Structured Streaming's checkpoint gives REPLAY — after a failure
    * the engine re-runs every batch not yet marked committed, possibly
    * re-delivering one the sink already wrote. Exactly-once therefore
    * needs the sink to be IDEMPOTENT per batchId, and this is the
    * standard construction: stamp rows with the batch id, write
    * `mode(overwrite)` + DYNAMIC partition-overwrite + partitionBy
    * (batch_id) — a re-delivered batch replaces exactly its own
    * `batch_id=<n>/` directory and touches no other batch's output, so
    * replay converges instead of duplicating. (Contrast the plain
    * append sink `runBounded` uses: correct for its single
    * AvailableNow drain, duplicating under redelivery — which is why a
    * production append sink uses THIS shape. StreamingSpec pins the
    * idempotence by re-delivering a batch and diffing the sink.)
    * At scale the overwrite granularity is one batch's files —
    * manifest-sized driver work, no table-wide commit.
    */
  def idempotentBatchWrite(batch: DataFrame, batchId: Long,
                           dir: String): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)
}
