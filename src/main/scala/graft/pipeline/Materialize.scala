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

  /** Dedup + partition + write. Returns the committed row count. */
  def write(
      triples: Dataset[TripleRow],
      out: String,
      predBuckets: Int = DefaultPredBuckets,
      salt: Int = DefaultSalt): Unit = {
    val df = withPredHash(triples.toDF(), predBuckets)
      // one row per (s,p,o); keeps an arbitrary-but-deterministic-enough
      // provenance pair — full provenance lives in the lineage table
      .dropDuplicates("subj", "pred", "obj")
    df.repartition(col("pred_hash"), pmod(xxhash64(col("subj")), lit(salt)))
      .write.mode("overwrite")
      .partitionBy("pred_hash")
      .parquet(out)
  }

  def read(spark: org.apache.spark.sql.SparkSession, out: String): DataFrame =
    spark.read.parquet(out)
}
