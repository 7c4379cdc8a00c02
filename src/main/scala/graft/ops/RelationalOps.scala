package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks as built-ins, composed from existing
  * ops per the custom-operator preference order (SURVEY §7.3 / task brief:
  * "compose existing ops if semantics allow" before custom plans).
  */
object RelationalOps {

  /** Internal column names reserved by [[asofJoin]]. */
  private val AsofReserved = Set("_side", "_asof_payload", "_asof", "_b", "_run", "_blast", "_carry")

  /** Bucket id of `tsCol` at `width` (integral DIV; timestamps bucket on
    * their micros so boundaries are exact).
    */
  private def bucketOf(df: DataFrame, tsCol: String, width: Long) =
    if (df.schema(tsCol).dataType.typeName.startsWith("timestamp"))
      expr(s"unix_micros(CAST(`$tsCol` AS TIMESTAMP)) DIV $width")
    else expr(s"`$tsCol` DIV $width")

  /** AS-OF join: for every left row, the single most recent right row with
    * `right.ts <= left.ts` on the same key (LEFT semantics — unmatched
    * left rows keep null right columns).
    *
    * Composition instead of a range join: tag both sides, union, and take
    * a running `last(payload, ignoreNulls)` over a (key)-partitioned
    * window ordered by (ts, side) — right rows sort BEFORE left rows at
    * equal ts, making the match inclusive. ONE shuffle on the key and a
    * single sort; no time-bucketing fan-out and no O(|L|·|R|) range-join
    * explosion. At 100× scale this is the plan you want: both inputs
    * exchange once, the window is a single pass.
    *
    * SKEW: `Window.partitionBy(key)` sorts each key in one task, so a hot
    * key (one user = half the stream) serializes a stage — AQE cannot
    * split window partitions. Pass `tsBucket = Some(width)` (in the ts
    * column's units; micros for timestamps) to window on the composite
    * (key, ts-bucket) instead: a per-(key, bucket) running last, plus a
    * tiny per-key scan over BUCKET SUMMARIES that carries the latest
    * right payload across bucket boundaries — identical results
    * (OpsSpec-guarded equivalence), per-task rows bounded by the bucket
    * width rather than the key's row count.
    *
    * The right payload travels as ONE struct so the matched columns are
    * atomic (never mixed across right rows). Contract: right rows are
    * unique per (key, ts) — pre-aggregate otherwise (ties at equal ts
    * would be order-dependent).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      tsBucket: Option[Long] = None): DataFrame = {
    require(tsBucket.forall(_ > 0), s"tsBucket=$tsBucket must be positive")
    val rightPayloadCols = right.columns.filterNot(c => c == keyCol || c == tsCol)
    val leftCols = left.columns.filterNot(c => c == keyCol || c == tsCol)
    require(leftCols.intersect(rightPayloadCols).isEmpty,
      s"ambiguous columns: ${leftCols.intersect(rightPayloadCols).mkString(", ")}")
    val clash = (left.columns ++ right.columns).filter(AsofReserved)
    require(clash.isEmpty,
      s"input columns collide with asofJoin internals: ${clash.mkString(", ")}")

    // NULL key/ts rows never match, per SQL equality semantics — and
    // IDENTICALLY in both modes: the default window would group NULL keys
    // into one partition (spurious null-to-null matches) while the
    // bucketed equi-join would silently DROP them; instead, null-keyed
    // right rows are ignored and null-keyed left rows bypass the match
    // and surface unmatched at the end.
    val leftNull = left.filter(col(keyCol).isNull || col(tsCol).isNull)
    val leftOk = left.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val rightOk = right.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)

    val payload = struct(rightPayloadCols.map(col): _*).as("_asof_payload")
    val r = rightOk.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("_side"), payload) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = leftOk.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("_side"),
        lit(null).cast(r.schema("_asof_payload").dataType).as("_asof_payload")) ++
        leftCols.map(col): _*)
    val u = r.unionByName(l)

    val matched = tsBucket match {
      case None =>
        val w = Window.partitionBy(col(keyCol))
          .orderBy(col(tsCol).asc, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn("_asof", last(col("_asof_payload"), ignoreNulls = true).over(w))
          .filter(col("_side") === 1)

      case Some(width) =>
        val ub = u.withColumn("_b", bucketOf(u, tsCol, width))
        // pass 1: running last WITHIN each (key, bucket) — the skewed key's
        // rows split across its buckets instead of one task
        val w1 = Window.partitionBy(col(keyCol), col("_b"))
          .orderBy(col(tsCol).asc, col("_side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val withRun = ub
          .withColumn("_run", last(col("_asof_payload"), ignoreNulls = true).over(w1))
        // pass 2: per-(key, bucket) LATEST right payload (right ts unique
        // per key — max(struct(ts, payload)) picks the last row's payload),
        // then a per-key cumulative last over the bucket axis = the
        // carry-in from all earlier buckets. One row per (key, bucket):
        // the per-key window is #buckets long, never #rows long. Both the
        // summary aggregate and the axis derive from the WINDOWED frame,
        // whose HashPartitioning(key, _b) already satisfies their
        // clustering — no second exchange of the big table, and the one
        // window exchange is shared (ReusedExchange) across consumers.
        val rb = withRun.filter(col("_side") === 0)
          .groupBy(col(keyCol), col("_b"))
          .agg(max(struct(col(tsCol), col("_asof_payload"))).as("_m"))
          .select(col(keyCol), col("_b"), col("_m._asof_payload").as("_blast"))
        val axis = withRun.select(col(keyCol), col("_b")).distinct()
        val wc = Window.partitionBy(col(keyCol)).orderBy(col("_b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carriers = axis.join(rb, Seq(keyCol, "_b"), "left")
          .withColumn("_carry", last(col("_blast"), ignoreNulls = true).over(wc))
          .select(col(keyCol), col("_b"), col("_carry"))
        withRun.filter(col("_side") === 1)
          .join(carriers, Seq(keyCol, "_b"))
          .withColumn("_asof", coalesce(col("_run"), col("_carry")))
    }

    matched.select(
      Seq(col(keyCol), col(tsCol)) ++ leftCols.map(col) ++
        rightPayloadCols.map(c => col(s"_asof.$c").as(c)): _*)
      .unionByName(leftNull.select(
        Seq(col(keyCol), col(tsCol)) ++ leftCols.map(col) ++
          rightPayloadCols.map(c =>
            lit(null).cast(right.schema(c).dataType).as(c)): _*))
  }

  /** Bounded RANGE join: all pairs with `right.ts ∈ [left.ts − window,
    * left.ts]` on the same key (ts is an integral column, e.g. micros).
    *
    * Big×big-safe composition — bucket replication: with bucket width =
    * `window`, any matching right row lives in the left row's bucket or
    * the one before, so the right side replicates ×2, the join is a plain
    * equi-join on (key, bucket), and the exact BETWEEN filter finishes the
    * predicate. Shuffle is O(|L| + 2·|R|) — never the O(|L|·|R|) fan-out
    * of a theta join — and each qualifying pair is produced exactly once
    * (the two replicas of a right row carry distinct buckets). Bucket ids
    * use integral `DIV`, not double division (micros-scale timestamps
    * would hit ulp errors at bucket boundaries).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      window: Long): DataFrame = {
    require(window > 0, s"window=$window must be positive")
    val rightPayloadCols = right.columns.filterNot(c => c == keyCol || c == tsCol)
    val leftCols = left.columns.filterNot(c => c == keyCol || c == tsCol)
    require(leftCols.intersect(rightPayloadCols).isEmpty,
      s"ambiguous columns: ${leftCols.intersect(rightPayloadCols).mkString(", ")}")
    val rTs = s"${tsCol}_r"
    val clash = (left.columns ++ right.columns).filter(c => c == "_b" || c == rTs)
    require(clash.isEmpty,
      s"input columns collide with rangeJoin internals: ${clash.mkString(", ")}")

    val l = left.withColumn("_b", expr(s"`$tsCol` DIV $window"))
    val rBase = right.withColumnRenamed(tsCol, rTs)
    val rr = rBase.withColumn("_b", expr(s"`$rTs` DIV $window"))
      .unionByName(rBase.withColumn("_b", expr(s"`$rTs` DIV $window") + 1))

    l.join(rr, Seq(keyCol, "_b"))
      .filter(col(rTs) >= col(tsCol) - window && col(rTs) <= col(tsCol))
      .select(Seq(col(keyCol), col(tsCol)) ++ leftCols.map(col) ++
        (Seq(col(rTs)) ++ rightPayloadCols.map(col)): _*)
  }

  private val bucketedCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Handle to a table written ONCE bucketed (and sorted) on `key` — the
    * write-once / join-many amortization unit at 100 TB. Every equi-join
    * on `key` between two handles' [[read]] outputs is exchange-free
    * (OpsSpec plan-guards TWO successive joins against one pair of
    * handles). `read(session)` resolves through the shared catalog, so a
    * caller may join inside a forked session (e.g. with broadcast
    * disabled) without touching the owning session's conf. [[close]]
    * drops the scratch table and its files.
    */
  final class BucketedTable private[RelationalOps] (
      owner: org.apache.spark.sql.SparkSession, val table: String, dir: String)
      extends AutoCloseable {
    def read: DataFrame = read(owner)
    def read(s: org.apache.spark.sql.SparkSession): DataFrame = s.table(table)
    override def close(): Unit = {
      owner.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  /** Write `df` once as a bucketed+sorted scratch table and return the
    * reusable [[BucketedTable]] handle. Callers amortize the one write
    * across arbitrarily many downstream joins/aggregations on `key`.
    */
  def bucketize(df: DataFrame, key: String, buckets: Int = 8): BucketedTable = {
    require(buckets >= 1 && buckets <= 4096, s"buckets=$buckets out of range")
    val id = bucketedCounter.incrementAndGet()
    val tbl = s"graft_bkt_$id"
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt_").toString
    df.write.option("path", s"$dir/t")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(tbl)
    new BucketedTable(df.sparkSession, tbl, dir)
  }

  /** CO-LOCATED join via bucketing — the zero-exchange repeated-join story
    * at 100 TB: both sides are written once as tables bucketed (and
    * sorted) on the join key ([[bucketize]]), so every subsequent
    * equi-join on that key reads matching buckets directly — NO shuffle
    * on either side, ever again (the plan guard asserts the joined plan
    * is Exchange-free). `body` receives the bucketed tables and must
    * produce the result, which is materialized (localCheckpoint) before
    * the scratch tables and files are dropped. Broadcast is disabled in a
    * FORKED session (`newSession` shares the SparkContext and catalog but
    * isolates SQL conf), so the guard proves the shuffle-free SMJ without
    * mutating the caller's session — queries running concurrently on the
    * caller's session keep their own broadcast setting.
    */
  def withBucketed(left: DataFrame, right: DataFrame, key: String, buckets: Int = 8)
      (body: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val l = bucketize(left, key, buckets)
    val r = bucketize(right, key, buckets)
    try {
      val fork = left.sparkSession.newSession()
      fork.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body(l.read(fork), r.read(fork)).localCheckpoint()
    } finally {
      l.close()
      r.close()
    }
  }
}
