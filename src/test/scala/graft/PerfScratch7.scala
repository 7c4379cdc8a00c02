package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PerfScratch7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.ops.TextOps
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // replicate dedupClusters' pair emission (minBands=1)
    val pairs = TextOps.minHashBandPairs(docs) // (a,b,n_bands) = distinct pairs w/ counts
    val agg = pairs.agg(count(lit(1)), sum(col("n_bands"))).collect()(0)
    println(s"[td14] distinct_pairs=${agg.getLong(0)} multiset=${agg.getLong(1)}")
  }
}
