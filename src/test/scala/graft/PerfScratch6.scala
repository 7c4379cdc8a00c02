package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** kg78-shaped per-batch decomposition WITHOUT the streaming machinery:
  * replicates continuousSparql's foreachBatch body over 3 static batch
  * frames, timing each step — separates stream overhead from batch work.
  */
object PerfScratch6 {
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
    val M = graft.pipeline.Materialize
    import graft.ops.GraphOps
    val queryText = s"""PREFIX p: <${GraphOps.PropPrefix}>
                       |SELECT ?l (COUNT(*) AS ?n_docs)
                       |WHERE { ?d p:lang ?l }
                       |GROUP BY ?l""".stripMargin
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm
    time("kg78 full warm") { SparkEntry.queries("kg78_stream_sparql")(spark, sfDir).count() }
    time("kg78 full 2") { SparkEntry.queries("kg78_stream_sparql")(spark, sfDir).count() }

    val dir = java.nio.file.Files.createTempDirectory("graft_p6_").toString
    val (graph, res) = (s"$dir/graph", s"$dir/res")
    val predCounts = scala.collection.mutable.Map.empty[String, Long]
    val toRows = (batch: DataFrame) =>
      GraphOps.parseTurtle(batch).select(
        col("subj"), col("pred"), col("obj"),
        concat(lit("doc:"), col("doc_id").cast("string")).as("src_url"),
        lit(new java.sql.Timestamp(0L)).as("warc_ts"))
        .as(org.apache.spark.sql.Encoders.product[graft.pipeline.TripleRow])
    (0 until 3).foreach { i =>
      val batch = docs.filter(pmod(col("doc_id"), lit(3)) === i)
      val rows = time(s"b$i parse+ckpt") { toRows(batch).localCheckpoint() }
      val success = new org.apache.hadoop.fs.Path(s"$graph/_SUCCESS")
      val fs = success.getFileSystem(spark.sparkContext.hadoopConfiguration)
      time(s"b$i merge") {
        if (!fs.exists(success)) M.write(rows, graph)
        else M.mergeDeltaLsm(spark, graph, rows, maxDeltaBatches = 2)
      }
      time(s"b$i predCounts") {
        rows.groupBy(col("pred")).agg(count(lit(1)).as("n")).collect()
          .foreach { r => predCounts(r.getString(0)) =
            predCounts.getOrElse(r.getString(0), 0L) + r.getLong(1) }
      }
      val answer = time(s"b$i sparql plan") {
        graft.sparql.SparqlExec.query(spark, queryText,
          (p: String) => M.readMergedPred(spark, graph, p),
          predCounts.toMap,
          fullSource = Some(() => M.readMerged(spark, graph)
            .select(col("subj"), col("pred"), col("obj"))))
      }
      time(s"b$i snapshot write") {
        answer.withColumn("batch_seq", lit(i.toLong))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_seq").parquet(res)
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
