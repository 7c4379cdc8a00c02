package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object PerfScratch3 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.TextOps

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("td14 warm") { SparkEntry.queries("td14_dedup_clusters")(spark, sfDir).count() }
    time("td14 warm2") { SparkEntry.queries("td14_dedup_clusters")(spark, sfDir).count() }
    // signature pass alone
    time("bandPairs+distinct") {
      TextOps.minHashBandPairs(docs).count()
    }
    time("td15 curate") { TextOps.curate(docs).count() }
    time("td32 warm") { SparkEntry.queries("td32_containment")(spark, sfDir).count() }
    time("td32 warm2") { SparkEntry.queries("td32_containment")(spark, sfDir).count() }
    spark.stop()
  }
}
