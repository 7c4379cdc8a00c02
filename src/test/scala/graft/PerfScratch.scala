package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perf decomposition scratch (measurement only, not part of the suite):
  * times sub-stages of the hottest queries under the Bench session shape.
  */
object PerfScratch {
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
    import graft.ops.GraphOps

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // warmup of the whole query once
    time("kg67 warm") { SparkEntry.queries("kg67_sameas_canon_delta")(spark, sfDir).count() }

    // decomposition
    def iriOf(c: org.apache.spark.sql.Column) =
      concat(lit(s"<${GraphOps.DocPrefix}"), c, lit(">"))
    val ids = docs.select(iriOf(col("doc_id")).as("iri"), col("doc_id"))
    val v1 = ids.filter(col("doc_id") > 0 && col("doc_id") % 7 =!= 0)
      .select(col("iri").as("src"), iriOf(col("doc_id") - 1).as("dst"))
      .join(ids.select(col("iri").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
    val dels = ids.filter(col("doc_id") % 21 === 1)
      .select(col("iri").as("src"), iriOf(col("doc_id") - 1).as("dst"))
      .join(v1, Seq("src", "dst"), "left_semi")
    val adds = ids.filter(col("doc_id") % 21 === 8 && col("doc_id") >= 8)
      .select(col("iri").as("src"), iriOf(col("doc_id") - 8).as("dst"))
      .join(ids.select(col("iri").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
    val diff = dels.withColumn("op", lit("del"))
      .unionByName(adds.withColumn("op", lit("add")))
    val v2 = v1.join(dels, Seq("src", "dst"), "left_anti").unionByName(adds)

    time("parseTurtle count") { GraphOps.parseTurtle(docs).count() }
    time("v1 count") { v1.count() }
    time("diff count") { diff.count() }
    val oldLabels = time("cc(v1)") {
      val l = graft.pipeline.Canonical.connectedComponents(v1); l.count(); l
    }
    val labels2 = time("ccDelta") {
      val l = graft.pipeline.Canonical.connectedComponentsDelta(oldLabels, v2, diff)
      l.count(); l
    }
    time("rewrite+agg") {
      val triples = GraphOps.parseTurtle(docs).select(col("subj"), col("pred"), col("obj"))
      GraphOps.rewriteWithReps(triples, labels2)
        .groupBy(col("subj").as("canon_subj"))
        .agg(count(lit(1)).as("n_facts")).count()
    }
    // second rounds, warm
    time("cc(v1) warm2") { graft.pipeline.Canonical.connectedComponents(v1).count() }

    // inline CC replica with per-iteration timing (mirror of Canonical.connectedComponents)
    def ccTimed(tag: String, edges: DataFrame): DataFrame = {
      import spark.implicits._
      val sym = time(s"$tag sym cache") {
        graft.pipeline.CheckpointPolicy.Local.truncate(
          edges.select($"src", $"dst")
            .union(edges.select($"dst".as("src"), $"src".as("dst")))
            .distinct())
      }
      var labels = time(s"$tag labels0") {
        graft.pipeline.CheckpointPolicy.Local.truncate(
          sym.select($"src".as("id")).distinct().withColumn("component", $"id"))
      }
      var iter = 0
      var converged = false
      while (!converged && iter < 50) {
        time(s"$tag iter$iter") {
          val msgs = sym
            .join(labels.withColumnRenamed("id", "src"), "src")
            .select($"dst".as("id"), $"component", lit(false).as("self"))
            .unionByName(labels.select($"id", $"component", lit(true).as("self")))
          val updated = msgs.groupBy($"id")
            .agg(min($"component").as("component"),
              min(when($"self", $"component")).as("old_component"))
            .select($"id", $"component", ($"component" < $"old_component").as("changed"))
          val parents = updated.select($"id".as("component"), $"component".as("jump"))
          val jumped1 = updated.join(parents, Seq("component"), "left")
            .select($"id", least($"component", coalesce($"jump", $"component")).as("component"),
              $"changed")
          val jumped = jumped1.join(parents, Seq("component"), "left")
            .select($"id", least($"component", coalesce($"jump", $"component")).as("component"),
              $"changed")
          val obs = new org.apache.spark.sql.Observation(s"cc2.$tag.changed.$iter")
          val next = graft.pipeline.CheckpointPolicy.Local.truncate(
            jumped.observe(obs, sum(when($"changed", 1L).otherwise(0L)).as("n_changed"))
              .drop("changed"))
          labels = next
          val nch = obs.get("n_changed").asInstanceOf[Long]
          println(s"[perf] $tag iter$iter n_changed=$nch")
          converged = nch == 0L
        }
      iter += 1
      }
      labels
    }
    ccTimed("v1", v1).count()
    val (_, subE) = graft.pipeline.Canonical.affectedSubgraph(oldLabels, v2, diff)
    time("subE count") { println("subEdges rows: " + subE.count()) }
    ccTimed("sub", subE).count()

    spark.stop()
  }
}
