package graft

import org.apache.spark.sql.functions._

/** Dump the CC loop's per-iteration physical plan (evidence file). */
object PlanDumpCC {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def iriOf(c: org.apache.spark.sql.Column) =
      concat(lit("<http://graft.example/doc/"), c, lit(">"))
    val ids = docs.select(iriOf(col("doc_id")).as("iri"), col("doc_id"))
    val edges = ids.filter(col("doc_id") > 0 && col("doc_id") % 7 =!= 0)
      .select(col("iri").as("src"), iriOf(col("doc_id") - 1).as("dst"))
      .join(ids.select(col("iri").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
    // AFTER shape: sym truncated to a leaf, one union+min agg per half-step
    val sym = graft.pipeline.CheckpointPolicy.Local.truncate(
      edges.select($"src", $"dst")
        .union(edges.select($"dst".as("src"), $"src".as("dst")))
        .distinct())
    val labels = graft.pipeline.CheckpointPolicy.Local.truncate(
      sym.select($"src".as("id")).distinct().withColumn("component", $"id"))
    def step(l: org.apache.spark.sql.DataFrame) = {
      val msgs = sym
        .join(l.withColumnRenamed("id", "src"), "src")
        .select($"dst".as("id"), $"component", lit(false).as("self"))
        .unionByName(l.select($"id", $"component", lit(true).as("self")))
      val updated = msgs.groupBy($"id")
        .agg(min($"component").as("component"),
          min(when($"self", $"component")).as("old_component"))
        .select($"id", $"component", ($"component" < $"old_component").as("changed"))
      val parents = updated.select($"id".as("component"), $"component".as("jump"))
      updated.join(parents, Seq("component"), "left")
        .select($"id", least($"component", coalesce($"jump", $"component")).as("component"),
          $"changed")
    }
    val second = step(step(labels).drop("changed")).drop("changed")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      second.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).getBytes("UTF-8"))
    spark.stop()
  }
}
