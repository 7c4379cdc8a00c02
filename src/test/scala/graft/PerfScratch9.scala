package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object PerfScratch9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def iriOf(c: org.apache.spark.sql.Column) =
      concat(lit("<http://graft.example/doc/"), c, lit(">"))
    val ids0 = docs.select(iriOf(col("doc_id")).as("iri"), col("doc_id"))
    val edges = ids0.filter(col("doc_id") > 0 && col("doc_id") % 7 =!= 0)
      .select(col("iri").as("src"), iriOf(col("doc_id") - 1).as("dst"))
      .join(ids0.select(col("iri").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
    val sym = graft.pipeline.CheckpointPolicy.Local.truncate(
      edges.select($"src", $"dst")
        .union(edges.select($"dst".as("src"), $"src".as("dst")))
        .distinct())
    var labels = graft.pipeline.CheckpointPolicy.Local.truncate(
      sym.select($"src".as("id")).distinct().withColumn("component", $"id"))
    var iter = 0
    var done = false
    while (!done && iter < 30) {
      val msgs = sym.join(labels.withColumnRenamed("id", "src"), "src")
        .select($"dst".as("id"), $"component", lit(false).as("self"))
        .unionByName(labels.select($"id", $"component", lit(true).as("self")))
      val updated = msgs.groupBy($"id")
        .agg(min($"component").as("component"),
          min(when($"self", $"component")).as("old_component"))
        .select($"id", $"component", ($"component" < $"old_component").as("changed"),
          $"old_component")
      val ch = updated.filter($"changed").select($"id", $"old_component", $"component")
        .collect()
      println(s"[cc] halfstep $iter n_changed=${ch.length} " +
        ch.take(5).map(r => s"${r.getString(0)}:${r.getString(1)}->${r.getString(2)}").mkString(" "))
      val parents = updated.select($"id".as("component"), $"component".as("jump"))
      val jumped = updated.join(parents, Seq("component"), "left")
        .select($"id", least($"component", coalesce($"jump", $"component")).as("component"))
      labels = graft.pipeline.CheckpointPolicy.Local.truncate(jumped)
      done = ch.isEmpty
      iter += 1
    }
    spark.stop()
  }
}
