package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object PerfScratch8 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[perf] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.GraphOps
    val M = graft.pipeline.Materialize
    val P = GraphOps.PropPrefix
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("kg81 warm") { SparkEntry.queries("kg81_sum_view_maintenance")(spark, sfDir).count() }
    val tri = GraphOps.parseTurtle(docs)
    def rows(df: DataFrame) = df.select(
      col("subj"), col("pred"), col("obj"),
      concat(lit("doc:"), col("doc_id").cast("string")).as("src_url"),
      lit(new java.sql.Timestamp(0L)).as("warc_ts"))
      .as(org.apache.spark.sql.Encoders.product[graft.pipeline.TripleRow])
    val dir = java.nio.file.Files.createTempDirectory("graft_p8_").toString
    try {
      time("write a") { M.write(rows(tri.filter(col("doc_id") % 3 =!= 0)), s"$dir/a") }
      time("write b") { M.write(rows(tri.filter(col("doc_id") % 2 =!= 0)), s"$dir/b") }
      time("buildSumView") { graft.pipeline.ViewStore.buildSumView(
        tri.filter(col("doc_id") % 3 =!= 0).select(col("subj"), col("pred"), col("obj")),
        s"${P}lang", s"${P}nchars", s"$dir/view") }
      val diff = time("diff ckpt") {
        M.graphDiffProv(spark, s"$dir/a", s"$dir/b").localCheckpoint() }
      time("applyDiff") { M.applyDiff(spark, s"$dir/a", diff) }
      time("maintainSumView") { graft.pipeline.ViewStore.maintainSumView(spark, s"$dir/view",
        diff, s"${P}lang", s"${P}nchars",
        (p: String) => M.readMergedPred(spark, s"$dir/a", p)) }
      time("readView") { graft.pipeline.ViewStore.readView(spark, s"$dir/view").count() }
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
