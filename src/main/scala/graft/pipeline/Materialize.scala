package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Graph-table materialization: dedup, predicate-hash partitioning, and
  * explicit skew handling.
  *
  * Layout per the north_star: Parquet partitioned by
  * `pred_hash = pmod(xxhash64(pred), P)`. Hot predicates (`rdf:type`
  * dominates every KG) would otherwise serialize through one task per
  * partition directory — a SALT column `pmod(xxhash64(subj), S)` joins the
  * repartition key so each hot predicate fans out across S tasks. AQE
  * remains on as the backstop for residual skew.
  */
object Materialize {

  val DefaultPredBuckets = 64
  val DefaultSalt = 16

  def withPredHash(df: DataFrame, predBuckets: Int = DefaultPredBuckets): DataFrame =
    df.withColumn("pred_hash", pmod(xxhash64(col("pred")), lit(predBuckets)))

  /** Dedup + partition + write — ONE shuffle of the triple table (the
    * largest table in the job; round 1 shuffled it twice: a
    * dropDuplicates exchange on hash(s,p,o) followed by the salted
    * repartition).
    *
    * How: the salted repartition on (pred_hash, subj_salt) runs FIRST;
    * the dedup group keys (pred_hash, subj_salt, subj, pred, obj) are a
    * SUPERSET of the partitioning expressions (pred_hash = f(pred),
    * subj_salt = f(subj)), so `HashPartitioning(pred_hash, subj_salt)`
    * already satisfies the aggregate's ClusteredDistribution and Catalyst
    * plans the dedup with NO second exchange — the whole
    * shuffle→aggregate→write pipeline is one exchange, and the write
    * stays clustered by pred_hash (≤ predBuckets×salt output files, not
    * tasks×predBuckets). Provenance per (s,p,o) is the MIN (src_url,
    * warc_ts) pair — deterministic, unlike dropDuplicates-first.
    */
  def write(
      triples: Dataset[TripleRow],
      out: String,
      predBuckets: Int = DefaultPredBuckets,
      salt: Int = DefaultSalt): Unit = {
    val df = withPredHash(triples.toDF(), predBuckets)
      .withColumn("subj_salt", pmod(xxhash64(col("subj")), lit(salt)))
    df.repartition(col("pred_hash"), col("subj_salt"))
      .groupBy(col("pred_hash"), col("subj_salt"), col("subj"), col("pred"), col("obj"))
      .agg(min(struct(col("src_url"), col("warc_ts"))).as("prov"))
      .select(col("subj"), col("pred"), col("obj"),
        col("prov.src_url").as("src_url"), col("prov.warc_ts").as("warc_ts"),
        col("pred_hash"))
      .write.mode("overwrite")
      .partitionBy("pred_hash")
      .parquet(out)
  }

  def read(spark: org.apache.spark.sql.SparkSession, out: String): DataFrame =
    spark.read.parquet(out)

  /** Single-predicate read that EXPLOITS the layout: the `pred_hash`
    * equality folds to a constant and prunes the scan to 1/predBuckets of
    * the partition directories (PartitionFilters in the plan), then the
    * row-level `pred` filter pushes into parquet. This is the access path
    * a downstream "all triples of predicate P" query takes at 100 TB.
    */
  def readPred(
      spark: org.apache.spark.sql.SparkSession,
      out: String,
      pred: String,
      predBuckets: Int = DefaultPredBuckets): DataFrame =
    read(spark, out)
      .filter(col("pred_hash") === pmod(xxhash64(lit(pred)), lit(predBuckets)) &&
        col("pred") === pred)
}
