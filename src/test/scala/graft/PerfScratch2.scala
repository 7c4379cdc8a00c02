package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object PerfScratch2 {
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
    import graft.ops.{GraphOps, GraphAnalytics}

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("kg72 warm") { SparkEntry.queries("kg72_incr_pagerank")(spark, sfDir).count() }

    val ids = docs.select(col("doc_id").as("id"))
    val v1 = GraphAnalytics.syntheticEdges(docs)
    val dels = v1.filter(col("src") % 101 === 0)
    val adds = ids.filter(col("id") % 103 === 0)
      .select(col("id").as("src"), (col("id") + 5).as("dst"))
      .join(ids.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
    val diff = dels.select(lit("del").as("op"), col("src"), col("dst"))
      .unionByName(adds.select(lit("add").as("op"), col("src"), col("dst")))
    val v2 = v1.filter(col("src") % 101 =!= 0).unionByName(adds)
    val hist = time("pageRankHistory") {
      val h = GraphAnalytics.pageRankHistory(v1, ids, iterations = 3); h.count(); h
    }
    time("pageRankDelta") {
      GraphAnalytics.pageRankDelta(hist, v2, diff, ids, iterations = 3).count()
    }
    time("pageRankHistory warm2") { GraphAnalytics.pageRankHistory(v1, ids, iterations = 3).count() }
    spark.stop()
  }
}
