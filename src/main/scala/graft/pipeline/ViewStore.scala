package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental MATERIALIZED-VIEW maintenance (kg79) — the IVM half of the
  * standing-query story: kg78 RE-EVALUATES a registered query per batch;
  * this UPDATES a materialized GROUP-BY-COUNT view in O(diff) without
  * touching the rest of the view, the way a warehouse maintains its
  * rollups under a trickle of retractions and asserts.
  *
  * The view: per-key counts of one predicate's objects (`key = obj`,
  * `n = count`), stored `key_hash`-partitioned. The fold input is an
  * EFFECTIVE diff ([[Materialize.graphDiffProv]]'s output: adds absent
  * before, dels present before — set-effective by construction). That
  * contract is load-bearing: count folding over a RAW batch would corrupt
  * on duplicate adds (the LSM store is a set; the view is a multiplicity
  * ledger), so the API takes the diff, not the batch.
  *
  * Scale shape (the [[Materialize.mergeDelta]] discipline): the delta
  * aggregate is ∝ diff; only diff-touched `key_hash` partitions are read
  * and dynamically overwritten — work ∝ diff + touched partitions, never
  * ∝ view. Keys folding to n ≤ 0 leave the view.
  */
object ViewStore {

  val DefaultKeyBuckets = 64

  private def withKeyHash(df: DataFrame, buckets: Int): DataFrame =
    df.withColumn("key_hash", pmod(xxhash64(col("key")), lit(buckets)))

  /** Build (or rebuild) the view from a triple frame: per-object counts
    * of `pred` — one map-side-combined aggregate, one write.
    */
  def buildCountView(
      triples: DataFrame, pred: String, out: String,
      keyBuckets: Int = DefaultKeyBuckets): Unit =
    withKeyHash(
      triples.filter(col("pred") === pred)
        .groupBy(col("obj").as("key")).agg(count(lit(1)).as("n")),
      keyBuckets)
      .write.mode("overwrite").partitionBy("key_hash").parquet(out)

  def readView(spark: SparkSession, out: String): DataFrame =
    spark.read.parquet(out).select(col("key"), col("n"))

  /** Fold an effective diff ([[Materialize.graphDiffProv]] rows: op/subj/
    * pred/obj) into the stored view: counts move by (adds − dels) per key,
    * new keys appear, zeroed keys vanish. Only the diff-touched key_hash
    * partitions are read and rewritten (plan- and file-level spec-pinned).
    */
  def maintainCountView(
      spark: SparkSession, out: String, diff: DataFrame, pred: String,
      keyBuckets: Int = DefaultKeyBuckets): Unit = {
    val d = withKeyHash(
      diff.filter(col("pred") === pred)
        .groupBy(col("obj").as("key"))
        .agg(sum(when(col("op") === Materialize.OpAdd, lit(1L))
          .otherwise(lit(-1L))).as("dn")),
      keyBuckets)
      .localCheckpoint() // materialized ONCE: sized ∝ diff, read twice below
    val touched = d.select(col("key_hash")).distinct()
      .collect().map(_.getLong(0)) // bounded by keyBuckets, never by data
    if (touched.isEmpty) return
    val existing = spark.read.parquet(out)
      .filter(col("key_hash").cast("long").isin(touched: _*))
      .select(col("key"), col("n"), col("key_hash").cast("long").as("key_hash"))
    val updated = existing
      .join(d, Seq("key_hash", "key"), "full_outer")
      .select(col("key"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        col("key_hash"))
      .filter(col("n") > 0)
      // materialize before the dynamic overwrite reads its own input dir
      // (the mergeDelta rule)
      .localCheckpoint()
    updated.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("key_hash")
      .parquet(out)
    // dynamic overwrite only replaces partitions PRESENT in the written
    // data — a touched bucket whose keys all folded to zero emits no rows
    // and would keep its stale files; delete those partitions explicitly
    val surviving = updated.select(col("key_hash")).distinct()
      .collect().map(_.getLong(0)).toSet
    val root = new org.apache.hadoop.fs.Path(out)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(surviving).foreach { kh =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"key_hash=$kh"), true)
    }
  }
}
