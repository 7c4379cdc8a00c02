package graft

import org.apache.spark.sql.functions._

/** Scratch plan audit for the round-5 operators. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("graft-planaudit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(p).size
      val bhj = "BroadcastHashJoin".r.findAllIn(p).size
      val smj = "SortMergeJoin".r.findAllIn(p).size
      val cart = p.contains("CartesianProduct") || p.contains("BroadcastNestedLoop")
      println(s"== $name: exchanges=$exchanges bhj=$bhj smj=$smj cartesian=$cart")
      println(p.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("HashAggregate"))
        .take(14).mkString("\n"))
    }

    // td22 one training iteration's pair-count plan
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val words = docs
      .select(explode(regexp_extract_all(col("text"),
        lit(graft.ops.TextOps.BpePattern), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f")).localCheckpoint()
    val pairs = words.filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"), col("f"))
      .groupBy(col("pair")).agg(sum(col("f")).as("n"))
      .orderBy(col("n").desc, col("pair").asc).limit(1)
    audit("td22 pair-count iteration", pairs)

    // emb12 rerank plan
    audit("emb12 rerank",
      graft.ops.EmbeddingOps.annIvfPqRerank(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        cells = 8, k = 5, nQueries = 10, nprobe = 2, rerank = 20))

    // kg26 chain
    audit("kg26 chain", SparkEntry.queries("kg26_bgp_chain")(spark, sfDir))
    audit("kg29 optional", SparkEntry.queries("kg29_bgp_optional")(spark, sfDir))
    audit("kg30 notexists", SparkEntry.queries("kg30_bgp_notexists")(spark, sfDir))
    spark.stop()
  }
}
