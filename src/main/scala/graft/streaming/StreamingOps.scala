package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** State-v2 processor for [[StreamingOps.userStatsTws]]: counts a user's
  * events in a ValueState and their distinct event types in a MapState
  * (used as a set — values are occurrence counts). Emits (user, n_events,
  * n_distinct_types) once per touched key per micro-batch.
  */
final class UserStatsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, String), (Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{MapState, OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
  import org.apache.spark.sql.{Encoders => E}

  @transient private var total: ValueState[Long] = _
  @transient private var types: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    total = getHandle.getValueState[Long]("total", E.scalaLong, TTLConfig.NONE)
    types = getHandle.getMapState[String, Long]("types", E.STRING, E.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long, rows: Iterator[(Long, String)],
      timers: TimerValues): Iterator[(Long, Long, Long)] = {
    var n = if (total.exists()) total.get() else 0L
    rows.foreach { case (_, tpe) =>
      n += 1
      val seen = if (types.containsKey(tpe)) types.getValue(tpe) else 0L
      types.updateValue(tpe, seen + 1)
    }
    total.update(n)
    Iterator.single((key, n, types.keys().size.toLong))
  }
}

/** Structured Streaming surface: the same events table consumed as a
  * stream (file source) with tumbling-window aggregation into a memory
  * sink. `processAllAvailable` drains the bounded input synchronously, so
  * the result is a deterministic DataFrame a batch oracle can replicate
  * (5-minute windows are epoch-aligned in both engines).
  */
object StreamingOps {

  private val counter = new AtomicInteger(0)

  /** Shared bounded-stream source: schema sniffed from the single batch
    * file, then the parent dir streamed with a glob pinned to that file —
    * the ONE definition of "the events table as a stream" (a per-op copy
    * already drifted once on the defensive ts cast).
    */
  private def boundedStream(spark: SparkSession, sfDir: String, file: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/$file").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", file)
      .parquet(sfDir)
  }

  /** Tumbling 5-minute window counts by event_type over a parquet STREAM. */
  def eventsWindowed(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"graft_stream_${counter.incrementAndGet()}"

    val stream = boundedStream(spark, sfDir, "events.parquet")
    val agg = stream
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()

    spark.table(name)
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      // materialize: the memory sink table is dropped with the query
      .localCheckpoint()
  }

  /** Tumbling 10-minute windows WITH an event-time watermark (10 minutes):
    * the watermark bounds streaming state — windows older than
    * `max(event_time) − 10 min` are evicted instead of held forever, the
    * property that keeps a perpetual 100 TB/day stream's state finite.
    * UPDATE output mode so the bounded test input (one batch, no late
    * data) yields exactly the batch answer for the oracle; in production
    * append mode emits each window once when the watermark passes it.
    */
  def eventsWatermarked(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"graft_wm_${counter.incrementAndGet()}"

    val stream = boundedStream(spark, sfDir, "events.parquet")
    val agg = stream
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val q = agg.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    // the update-mode memory sink APPENDS each micro-batch's updated rows
    // (no upsert): if the file source ever splits the input into several
    // micro-batches, a re-updated window would appear twice. Counts only
    // grow across updates, so keeping the max per key == keeping the latest.
    spark.table(name)
      .select(col("window.start").as("w"), col("event_type"), col("n"))
      .groupBy(col("w"), col("event_type")).agg(max(col("n")).as("n"))
      .localCheckpoint()
  }

  /** Streaming DEDUP: `dropDuplicates` keyed on (user_id, event_type)
    * ahead of the aggregation — distinct-users-per-type over a stream.
    * State is bounded by the key space (users × types), the pattern a
    * training-data ingest uses to idempotently absorb re-delivered
    * records; [[dedupWithinWatermark]] is the event-time-bounded variant
    * for unbounded key spaces.
    */
  def dedupedUserCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"graft_dedup_${counter.incrementAndGet()}"

    val stream = boundedStream(spark, sfDir, "events.parquet")
    val agg = stream
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))

    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    spark.table(name).localCheckpoint()
  }

  /** Streaming dedup with BOUNDED state on an UNBOUNDED key space:
    * `dropDuplicatesWithinWatermark` keyed on event_id — the state for an
    * id is evicted once the watermark passes its event time plus the
    * delay, so re-delivered records inside the watermark window are
    * absorbed while total state stays finite. (The q24 `dropDuplicates`
    * variant holds every key forever — right only when the key space is
    * bounded.) Re-deliveries are PLANTED: the bounded input is rewritten
    * to a scratch dir with every (event_id % 10 == 0) row duplicated; the
    * deduped per-type counts must equal the original table's.
    */
  def dedupWithinWatermark(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val planted = ev.unionByName(ev.filter(col("event_id") % 10 === 0))
    val dir = java.nio.file.Files.createTempDirectory("graft_q29_").toString
    try {
      planted.write.mode("overwrite").parquet(s"$dir/in")
      val name = s"graft_wmdedup_${counter.incrementAndGet()}"
      val deduped = spark.readStream.schema(ev.schema).parquet(s"$dir/in")
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark("event_id")
      val q = deduped
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      spark.table(name)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .localCheckpoint() // eager — the scratch dir can be deleted after
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  /** STREAM-STREAM interval join: clicks joined to the purchases of the
    * same user within the preceding 30 minutes, both sides unbounded
    * streams. The event-time range condition plus watermarks on BOTH
    * sides is what bounds the join state: a buffered purchase can be
    * evicted once the click watermark passes its ts + 30 min — without
    * the range the state grows forever. Inner join in append mode (the
    * only stream-stream mode with exact semantics); counting per click
    * happens batch-side on the drained sink so the streaming query stays
    * a single stateful operator.
    */
  def streamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"graft_ssjoin_${counter.incrementAndGet()}"
    def src = boundedStream(spark, sfDir, "events.parquet")

    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"),
        col("ts").cast("timestamp").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("ts").cast("timestamp").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")

    val joined = clicks.join(purchases,
      expr("c_user = p_user AND p_ts BETWEEN c_ts - INTERVAL 30 MINUTES AND c_ts"))

    val q = joined.writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()

    spark.table(name)
      .groupBy(col("c_user").as("user_id"), col("click_id"))
      .agg(count(lit(1)).as("n_recent"))
      .localCheckpoint()
  }

  /** Built-in SESSION WINDOWS: `session_window(ts, gap)` merges events
    * into gap-separated sessions inside the streaming aggregation itself —
    * no custom state function, Catalyst owns the merge (contrast
    * [[sessionize]], which hand-rolls the same semantics with
    * `flatMapGroupsWithState`). Complete output mode keeps the bounded-
    * input memory-sink result exact even if the source ever split into
    * several micro-batches (sessions can MERGE across batches, so the
    * update-mode max-per-key repair used elsewhere would not be sound
    * here). Window end = last event + gap; an event at exactly that end
    * still MERGES (Spark merges when next.start <= prev.end — pinned by
    * the OpsSpec boundary test), so the oracle breaks on strict `>`.
    */
  def sessionWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"graft_sesswin_${counter.incrementAndGet()}"
    val stream = boundedStream(spark, sfDir, "events.parquet")
    val agg = stream
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))

    val q = agg.writeStream
      .outputMode("complete").format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()

    spark.table(name)
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
      .localCheckpoint()
  }

  /** Arbitrary stateful processing v2 (`transformWithState`): per-user
    * running totals with TYPED state primitives — a ValueState event
    * counter plus a MapState of distinct event types — instead of one
    * opaque case-class blob (the [[sessionize]]-era API). Requires the
    * RocksDB state store provider — set on a FORKED session (`newSession`
    * shares the SparkContext but isolates SQL conf), so queries running
    * concurrently on the caller's session never inherit the override; at
    * 100 TB/day that provider is also what keeps per-executor state on
    * disk with changelog checkpointing instead of on-heap. Update mode
    * emits one row per touched key per batch; the bounded single-batch
    * input therefore yields exactly the final per-user stats the batch
    * oracle computes.
    */
  def userStatsTws(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

    val name = s"graft_tws_${counter.incrementAndGet()}"
    val fork = spark.newSession()
    import fork.implicits._
    fork.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val events = boundedStream(fork, sfDir, "events.parquet")
      .select(col("user_id"), col("event_type"))
      .as[(Long, String)]

    val stats = events.groupByKey(_._1)
      .transformWithState(new UserStatsProcessor(),
        TimeMode.None(), OutputMode.Update())

    val q = stats.toDF("user_id", "n_events", "n_types")
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()

    // the memory-sink temp view is registered in the forked session
    fork.table(name)
      // update-mode memory sink appends per-batch rows; counters only
      // grow, so max-per-key == latest (same repair as eventsWatermarked)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"), max(col("n_types")).as("n_types"))
      .localCheckpoint()
  }

  /** STREAMING RESTART-RESUME (q37) — the kill-and-restart contract every
    * other streaming op here (bounded source, memory sink, synchronous
    * drain) deliberately leaves untested. A CHECKPOINTED query with a
    * parquet FILE sink drains delivery 1 (the whole events table) and
    * stops; delivery 2 — re-deliveries of the newest rows, inside the
    * watermark — lands in the source directory; the query RESTARTS with
    * the same checkpointLocation. Resume is then three recoveries at once:
    * the offset log skips delivery 1's files, the recovered
    * `dropDuplicatesWithinWatermark` state absorbs the re-delivered ids
    * (nothing else can — they are not late, and run 2 never saw run 1's
    * rows), and the sink's commit log keeps the output exactly-once. The
    * final per-type counts therefore equal the plain batch answer over
    * the original table; OpsSpec additionally pins `numInputRows` of run 2
    * to the re-delivery count alone (offset-resume, not reprocessing).
    */
  def restartResume(spark: SparkSession, sfDir: String): DataFrame =
    restartResumeWithStats(spark, sfDir)._1

  private[graft] def restartResumeWithStats(
      spark: SparkSession, sfDir: String): (DataFrame, Long, Long) = {
    import org.apache.spark.sql.streaming.Trigger
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_q37_").toString
    try {
      val (in, out, chk) = (s"$dir/in", s"$dir/out", s"$dir/chk")
      ev.write.mode("append").parquet(in) // delivery 1: the full table

      def runOnce(): Long = {
        val stream = spark.readStream.schema(ev.schema).parquet(in)
          .withColumn("ts", col("ts").cast("timestamp"))
          .withWatermark("ts", "30 minutes")
          .dropDuplicatesWithinWatermark("event_id")
        val q = stream.writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", chk)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q.recentProgress.map(_.numInputRows).sum
      }

      val run1Rows = runOnce() // "crash" = clean stop after delivery 1

      // delivery 2: re-deliver every row of the trailing 20 minutes —
      // within the recovered 30-minute watermark, so ONLY recovered dedup
      // state can drop them (at least the max-ts row always qualifies)
      val maxTs = ev.agg(max(col("ts").cast("timestamp"))).collect()(0).getTimestamp(0)
      ev.filter(col("ts").cast("timestamp") >= lit(maxTs) - expr("INTERVAL 20 MINUTES"))
        .write.mode("append").parquet(in)

      val run2Rows = runOnce() // restart from the same checkpoint

      // the parquet read honors the sink's _spark_metadata commit log:
      // only committed files count (exactly-once end to end)
      val result = spark.read.parquet(out)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .localCheckpoint() // eager — the scratch dir can be deleted after
      (result, run1Rows, run2Rows)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  /** INCREMENTAL KG construction: the conformance-tested Turtle parser
    * running under Structured Streaming. Documents arrive as a stream,
    * [[graft.ops.GraphOps.parseTurtle]]'s stateless typed mapPartitions
    * emits triples per micro-batch, and a per-doc triple count aggregates
    * in complete mode — the shape of a KG that grows as the crawl lands
    * (new docs re-parse incrementally; only the aggregate holds state).
    */
  def streamingParse(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"graft_streamparse_${counter.incrementAndGet()}"
    val docs = boundedStream(spark, sfDir, "documents.parquet")
    val agg = graft.ops.GraphOps.parseTurtle(docs)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triples"))

    val q = agg.writeStream
      .outputMode("complete").format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()

    spark.table(name).localCheckpoint()
  }

  /** STREAMING → MATERIALIZED GRAPH, incrementally (kg23): the end-to-end
    * "KG grows as the crawl lands" composition. The corpus arrives as
    * three deliveries; `foreachBatch` parses each micro-batch with the
    * conformance parser and MERGES its triples into the graph table via
    * [[graft.pipeline.Materialize.mergeDelta]] — per batch, only the
    * pred_hash partitions that batch touches are rewritten (dynamic
    * partition overwrite), the same dedup/min-provenance rule as a full
    * build. The checkpointed source replays at-least-once (a crash
    * between the merge and the offset commit re-runs the batch), and the
    * merge is IDEMPOTENT (dedup on (s,p,o) with deterministic min
    * provenance — PipelineSpec pins re-merge == no-op), so the
    * composition is effectively exactly-once; because merge is also
    * independent of the batch split, the final graph equals the
    * full-corpus build (the kg01 oracle).
    */
  def streamingGraphMerge(spark: SparkSession, sfDir: String): DataFrame =
    streamingGraphMerge(spark, sfDir, lsm = false)

  /** With `lsm = true`, each micro-batch APPENDS to the delta log instead
    * of rewriting touched partitions
    * ([[graft.pipeline.Materialize.mergeDeltaLsm]], bytes ∝ batch), with
    * compaction folding the log on the batch-count trigger — the
    * bounded-write-amplification variant of the same composition (kg33);
    * the final merged view must still equal the batch build. Re-delivered
    * batches append duplicate rows, which the dedup-on-read /
    * compaction min-provenance rule collapses — the same idempotence
    * argument as the overwrite path, moved from write time to read time.
    */
  def streamingGraphMerge(spark: SparkSession, sfDir: String, lsm: Boolean): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_kg23_").toString
    try {
      val (in, graph, chk) = (s"$dir/in", s"$dir/graph", s"$dir/chk")
      // three deliveries, written as separate file batches
      (0 until 3).foreach { i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(in)
      }
      val toRows = (batch: DataFrame) =>
        graft.ops.GraphOps.parseTurtle(batch).select(
          col("subj"), col("pred"), col("obj"),
          concat(lit("doc:"), col("doc_id").cast("string")).as("src_url"),
          lit(new java.sql.Timestamp(0L)).as("warc_ts"))
          .as(org.apache.spark.sql.Encoders.product[graft.pipeline.TripleRow])
      val q = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1") // one delivery per micro-batch
        .parquet(in)
        .writeStream
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // write-vs-merge decided through the Hadoop FileSystem API (not
          // java.io.File): the graph path is a DFS location in the
          // cluster-scale deployment this op narrates, where a local-file
          // check would always be false and every micro-batch would
          // silently FULL-OVERWRITE the graph instead of merging.
          val success = new org.apache.hadoop.fs.Path(s"$graph/_SUCCESS")
          val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (batch.isEmpty) ()
          else if (!fs.exists(success))
            graft.pipeline.Materialize.write(toRows(batch), graph)
          else if (lsm)
            graft.pipeline.Materialize.mergeDeltaLsm(spark, graph, toRows(batch),
              maxDeltaBatches = 2) // second delta triggers a compaction
          else
            graft.pipeline.Materialize.mergeDelta(spark, graph, toRows(batch))
        }
        .start()
      q.awaitTermination()
      graft.pipeline.Materialize.readMerged(spark, graph)
        .select(col("subj"), col("pred"), col("obj"))
        .localCheckpoint() // eager — the scratch dirs are deleted below
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  /** Streaming RE-CRAWL with retractions (kg40): the composition every
    * production crawl loop needs — pages get re-fetched, their new parse
    * DROPS some triples and adds others, and the stream must retract the
    * dropped ones. Per micro-batch of re-crawled pages: diff the old parse
    * against the new (two anti-joins, the [[graft.pipeline.Materialize
    * .graphDiffProv]] shape on in-flight DataFrames), apply as ONE
    * tombstone delta batch (bytes ∝ changed triples, never ∝ page), and
    * compact on the batch-count trigger — tombstones are consumed by the
    * rewrite. Idempotent at the read surface: a re-delivered batch appends
    * the same del+add at a later seq, and latest-batch-wins resolution
    * converges to the same view, so at-least-once delivery composes to
    * effectively exactly-once like the kg23/kg33 paths.
    *
    * Scenario: initial crawl = the full corpus; two re-crawl deliveries
    * cover the even pages whose content grew by one char — the merged
    * graph must equal a fresh build of the updated corpus.
    */
  def streamingRecrawl(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_kg40_").toString
    try {
      val (in, graph, chk) = (s"$dir/in", s"$dir/graph", s"$dir/chk")
      val toRows = (batch: DataFrame) =>
        graft.ops.GraphOps.parseTurtle(batch).select(
          col("subj"), col("pred"), col("obj"),
          concat(lit("doc:"), col("doc_id").cast("string")).as("src_url"),
          lit(new java.sql.Timestamp(0L)).as("warc_ts"))
      // initial crawl: the whole corpus, materialized
      graft.pipeline.Materialize.write(
        toRows(docs).as(org.apache.spark.sql.Encoders.product[graft.pipeline.TripleRow]),
        graph)
      // two re-crawl deliveries: the even pages (doc_id % 4 ∈ {0, 2})
      (0 until 2).foreach { i =>
        docs.filter(pmod(col("doc_id"), lit(4)) === i * 2)
          .coalesce(1).write.mode("append").parquet(in)
      }
      val q = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1") // one delivery per micro-batch
        .parquet(in)
        .writeStream
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val olds = toRows(batch)
            val news = toRows(batch.withColumn("n_chars", col("n_chars") + 1))
            val keys = Seq("subj", "pred", "obj")
            val keyCols = keys.map(col)
            val ops = news
              .join(olds.select(keyCols: _*), keys, "left_anti")
              .withColumn("op", lit(graft.pipeline.Materialize.OpAdd))
              .unionByName(olds
                .join(news.select(keyCols: _*), keys, "left_anti")
                .withColumn("op", lit(graft.pipeline.Materialize.OpDel)))
            graft.pipeline.Materialize.applyDiff(spark, graph, ops)
            if (graft.pipeline.Materialize.deltaBatchCount(spark, graph) >= 2)
              graft.pipeline.Materialize.compact(spark, graph)
          }
        }
        .start()
      q.awaitTermination()
      graft.pipeline.Materialize.readMerged(spark, graph)
        .select(col("subj"), col("pred"), col("obj"))
        .localCheckpoint() // eager — the scratch dirs are deleted below
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long)

  /** Custom stateful streaming: per-user sessionization via
    * `flatMapGroupsWithState` (30-minute inactivity gap). The bounded input
    * arrives as one batch, so the result equals the batch window query
    * (q11's oracle) — the mechanism under test is the stateful operator.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    val name = s"graft_sessions_${counter.incrementAndGet()}"

    val events = boundedStream(spark, sfDir, "events.parquet")
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("event_id"))
      .as[Ev]

    val sessions = events
      .groupByKey(_.user_id)
        .flatMapGroupsWithState[Int, (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], _: GroupState[Int]) =>
          val sorted = it.toArray.sortBy(e => (e.ts_us, e.event_id))
          var nSessions = 0L
          var prev = Long.MinValue
          sorted.foreach { e =>
            if (prev == Long.MinValue || e.ts_us - prev > 1800000000L) nSessions += 1
            prev = e.ts_us
          }
          Iterator.single((uid, nSessions, sorted.length.toLong))
      }

    val q = sessions.toDF("user_id", "n_sessions", "n_events")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()

    spark.table(name).localCheckpoint()
  }

  /** STREAMING TRENDING TERMS — the text×streaming composition: document
    * deliveries arrive as micro-batches (one file per trigger), each
    * batch's tokens fold into a RUNNING token-count aggregate (Structured
    * Streaming keeps the counts in the state store — partial aggregation
    * within the batch, state merge across batches), and the final state
    * ranks into a top-k. Complete-mode memory sink is the bounded-
    * vocabulary surface for the oracle; at web scale the same aggregate
    * runs in update mode into a keyed sink and top-k moves to the
    * consumer (complete mode re-emits the vocabulary per trigger — fine
    * for a vocab, wrong for an unbounded key space).
    */
  def streamingTrendingTerms(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val name = s"graft_trend_${counter.incrementAndGet()}"
    val dir = java.nio.file.Files.createTempDirectory("graft_q41_").toString
    try {
      val in = s"$dir/in"
      (0 until 3).foreach { i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(in)
      }
      val counts = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
        .select(explode(graft.ops.TextOps.tokensCol(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
      val q = counts.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .option("checkpointLocation", s"$dir/chk")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination()
      finally q.stop()
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("token").asc)
      spark.table(name)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
        .select(col("token"), col("n"), col("rk"))
        .localCheckpoint() // eager — the scratch stream dir is deleted below
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  /** Continuous SPARQL (kg78): a standing TEXT query registered over the
    * streaming LSM graph ingest — the composition a live KG dashboard
    * runs. Per micro-batch: the delivery's parse merges into the LSM
    * graph ([[graft.pipeline.Materialize.mergeDeltaLsm]], bytes ∝ batch,
    * compaction on the batch-count trigger), then the registered query
    * re-evaluates through [[graft.sparql.SparqlExec.query]] over the
    * merged read — pattern scans pred-prune via
    * [[graft.pipeline.Materialize.readMergedPred]] (only delta-touched
    * partitions pay the resolution exchange) — and the answer SNAPSHOT
    * appends to the results log keyed by the batch sequence.
    *
    * Exactly-once at the result surface: the results log is keyed by the
    * checkpointed micro-batch id, so a replayed batch overwrites its own
    * snapshot (idempotent rewrite of one batch_seq partition), matching
    * the at-least-once delivery discipline of the ingest path. The
    * predicate-count sketch (join-order only, exactness never depends on
    * it) is maintained INCREMENTALLY from each batch's own rows — the
    * kg42 degree-maintenance discipline — so the per-batch driver cost is
    * O(batch), never a rescan of the merged view; each batch's parse is
    * persisted once because the merge and the count fold both consume it
    * (the delta-loop persist invariant).
    *
    * Returns the full evolution table `(batch_seq, …query columns…)` —
    * the per-batch answer history.
    */
  def continuousSparql(
      spark: SparkSession, sfDir: String, queryText: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val M = graft.pipeline.Materialize
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_kg78_").toString
    try {
      val (in, graph, res, chk) = (s"$dir/in", s"$dir/graph", s"$dir/res", s"$dir/chk")
      (0 until 3).foreach { i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(in)
      }
      val toRows = (batch: DataFrame) =>
        graft.ops.GraphOps.parseTurtle(batch).select(
          col("subj"), col("pred"), col("obj"),
          concat(lit("doc:"), col("doc_id").cast("string")).as("src_url"),
          lit(new java.sql.Timestamp(0L)).as("warc_ts"))
          .as(org.apache.spark.sql.Encoders.product[graft.pipeline.TripleRow])
      // join-order sketch, maintained incrementally batch-by-batch —
      // driver-side map bounded by the predicate vocabulary
      val predCounts = scala.collection.mutable.Map.empty[String, Long]
      val q = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1") // one delivery per micro-batch
        .parquet(in)
        .writeStream
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, seq: Long) =>
          if (!batch.isEmpty) {
            // the parse is consumed twice (merge + count fold) — persist
            val rows = toRows(batch).localCheckpoint()
            val success = new org.apache.hadoop.fs.Path(s"$graph/_SUCCESS")
            val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(success)) M.write(rows, graph)
            else M.mergeDeltaLsm(spark, graph, rows, maxDeltaBatches = 2)
            rows.groupBy(col("pred")).agg(count(lit(1)).as("n")).collect()
              .foreach { r =>
                val p = r.getString(0)
                predCounts(p) = predCounts.getOrElse(p, 0L) + r.getLong(1)
              }
            val answer = graft.sparql.SparqlExec.query(spark, queryText,
              (p: String) => M.readMergedPred(spark, graph, p),
              predCounts.toMap,
              fullSource = Some(() => M.readMerged(spark, graph)
                .select(col("subj"), col("pred"), col("obj"))))
            // keyed by the checkpointed batch id with DYNAMIC partition
            // overwrite: a replayed batch rewrites ITS OWN partition, so
            // at-least-once delivery stays exactly-once at the result log
            answer.withColumn("batch_seq", lit(seq))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_seq").parquet(res)
          }
        }
        .start()
      q.awaitTermination()
      spark.read.parquet(res).localCheckpoint() // eager — dir deleted below
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  /** The completed standing-query loop (kg83): ingest → INCREMENTAL VIEW
    * MAINTENANCE → serve. Where kg78 RE-EVALUATES the registered query
    * over the merged graph per batch (cost ∝ matched data), this folds each
    * delivery into a materialized [[graft.pipeline.ViewStore]] count view
    * (cost ∝ batch) and snapshots the VIEW — the shape a production
    * dashboard actually runs: per-batch work is O(delta) on both the
    * graph AND the answer. Deliveries are disjoint new documents, so the
    * batch's own triples are a set-effective diff (the ViewStore
    * contract); a re-crawl stream would route through graphDiffProv first
    * (kg80's path). Snapshot log keyed by batch id with dynamic overwrite
    * — replays rewrite their own partition.
    */
  def continuousViewMaintenance(
      spark: SparkSession, sfDir: String, keyPred: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val M = graft.pipeline.Materialize
    val V = graft.pipeline.ViewStore
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_kg83_").toString
    try {
      val (in, graph, view, res, chk) =
        (s"$dir/in", s"$dir/graph", s"$dir/view", s"$dir/res", s"$dir/chk")
      (0 until 3).foreach { i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(in)
      }
      val toRows = (batch: DataFrame) =>
        graft.ops.GraphOps.parseTurtle(batch).select(
          col("subj"), col("pred"), col("obj"),
          concat(lit("doc:"), col("doc_id").cast("string")).as("src_url"),
          lit(new java.sql.Timestamp(0L)).as("warc_ts"))
          .as(org.apache.spark.sql.Encoders.product[graft.pipeline.TripleRow])
      val q = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1") // one delivery per micro-batch
        .parquet(in)
        .writeStream
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, seq: Long) =>
          if (!batch.isEmpty) {
            // merge + view fold both consume the parse — persist once
            val rows = toRows(batch).localCheckpoint()
            val success = new org.apache.hadoop.fs.Path(s"$graph/_SUCCESS")
            val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(success)) {
              M.write(rows, graph)
              // the view is a multiplicity ledger while the LSM store is a
              // set: a document legally stating the same triple twice must
              // count once — dedup BEFORE the first build, mirroring
              // M.write's own dedup
              V.buildCountView(
                rows.toDF().dropDuplicates("subj", "pred", "obj"),
                keyPred, view)
            } else {
              // EFFECTIVE diff (the ViewStore contract): within-batch
              // dedup + anti-join against the PRE-state merged read, so
              // duplicate statements and re-delivered triples fold as
              // zero — computed BEFORE the merge lands the batch. The
              // fold only consumes keyPred rows, so both sides prune to
              // that predicate's single pred_hash partition
              // (readMergedPred) — never a whole-graph scan per batch
              val eff = rows.toDF()
                .filter(col("pred") === keyPred)
                .dropDuplicates("subj", "pred", "obj")
                .join(M.readMergedPred(spark, graph, keyPred)
                  .select(col("subj"), col("pred"), col("obj")),
                  Seq("subj", "pred", "obj"), "left_anti")
                .withColumn("op", lit(M.OpAdd))
                .localCheckpoint() // consumed after the merge overwrites the store
              M.mergeDeltaLsm(spark, graph, rows, maxDeltaBatches = 2)
              // foldId = the checkpointed micro-batch id: an at-least-once
              // replay re-enters this body, and the ledger makes the
              // re-fold a no-op instead of double-counting the view
              V.maintainCountView(spark, view, eff, keyPred,
                foldId = Some(seq.toString))
            }
            V.readView(spark, view)
              .withColumn("batch_seq", lit(seq))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_seq").parquet(res)
          }
        }
        .start()
      q.awaitTermination()
      spark.read.parquet(res).localCheckpoint() // eager — dir deleted below
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  /** Standing SPARQL query over a RE-CRAWL stream with retractions (kg80):
    * the kg40 × kg78 composition — per micro-batch of re-fetched pages the
    * new parse is DIFFED against the old (two anti-joins, bytes ∝ changed
    * triples), applied as one tombstone delta batch, and the registered
    * query's snapshot appends keyed by batch id. The retraction is
    * load-bearing: a changed literal RETRACTS its old triple, so the
    * standing aggregate moves by the change — an append-only ingest would
    * double-count. Predicate counts fold incrementally from the diff's own
    * (adds − dels) per pred — O(diff), the ViewStore/kg42 discipline.
    *
    * Scenario (the kg40 one): initial crawl = the full corpus; two
    * re-crawl deliveries cover the even pages, whose content grew by one
    * char — each snapshot must equal the standing query over the corpus
    * with exactly that delivery prefix's pages updated.
    */
  def continuousSparqlRecrawl(
      spark: SparkSession, sfDir: String, queryText: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val M = graft.pipeline.Materialize
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_kg80_").toString
    try {
      val (in, graph, res, chk) = (s"$dir/in", s"$dir/graph", s"$dir/res", s"$dir/chk")
      val toRows = (batch: DataFrame) =>
        graft.ops.GraphOps.parseTurtle(batch).select(
          col("subj"), col("pred"), col("obj"),
          concat(lit("doc:"), col("doc_id").cast("string")).as("src_url"),
          lit(new java.sql.Timestamp(0L)).as("warc_ts"))
      val initial = toRows(docs)
      M.write(initial.as(
        org.apache.spark.sql.Encoders.product[graft.pipeline.TripleRow]), graph)
      val predCounts = scala.collection.mutable.Map.empty[String, Long]
      M.sketchPredCounts(initial).foreach { case (p, n) => predCounts(p) = n }
      (0 until 2).foreach { i =>
        docs.filter(pmod(col("doc_id"), lit(4)) === i * 2)
          .coalesce(1).write.mode("append").parquet(in)
      }
      val q = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1") // one delivery per micro-batch
        .parquet(in)
        .writeStream
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, seq: Long) =>
          if (!batch.isEmpty) {
            val olds = toRows(batch)
            val news = toRows(batch.withColumn("n_chars", col("n_chars") + 1))
            val keys = Seq("subj", "pred", "obj")
            val keyCols = keys.map(col)
            // consumed twice (applyDiff + the count fold) — persist once
            val ops = news
              .join(olds.select(keyCols: _*), keys, "left_anti")
              .withColumn("op", lit(M.OpAdd))
              .unionByName(olds
                .join(news.select(keyCols: _*), keys, "left_anti")
                .withColumn("op", lit(M.OpDel)))
              .localCheckpoint()
            M.applyDiff(spark, graph, ops)
            ops.groupBy(col("pred"))
              .agg(sum(when(col("op") === M.OpAdd, lit(1L)).otherwise(lit(-1L)))
                .as("dn"))
              .collect().foreach { r =>
                val p = r.getString(0)
                predCounts(p) = predCounts.getOrElse(p, 0L) + r.getLong(1)
              }
            val answer = graft.sparql.SparqlExec.query(spark, queryText,
              (p: String) => M.readMergedPred(spark, graph, p),
              predCounts.toMap,
              fullSource = Some(() => M.readMerged(spark, graph)
                .select(col("subj"), col("pred"), col("obj"))))
            // keyed by the checkpointed batch id with DYNAMIC partition
            // overwrite: a replayed batch rewrites ITS OWN partition, so
            // at-least-once delivery stays exactly-once at the result log
            answer.withColumn("batch_seq", lit(seq))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_seq").parquet(res)
          }
        }
        .start()
      q.awaitTermination()
      spark.read.parquet(res).localCheckpoint() // eager — dir deleted below
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
