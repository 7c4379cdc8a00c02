package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG-construction pipeline orchestration:
  * generate/read pages → extract text → detect mentions → link entities →
  * canonicalize → emit triples → materialize graph table; every stage runs
  * through the [[SnapshotStore]] gate (resumable) and the [[Lineage]]
  * tracker (per-partition metrics).
  */
object Pipeline {

  final case class Summary(
      stageRows: Map[String, Long],
      graphRows: Long,
      rejects: Long,
      stageWallMs: Map[String, Long] = Map.empty)

  def sparkSession(master: String, shufflePartitions: Int, app: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(app)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // task-side commit (v2): the v1 committer renames every output file
      // serially on the driver at stage-commit time — a fixed cost per
      // snapshot that dominates small stages and scales with file count
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    // shuffle/spill dir override (e.g. tmpfs when benchmarking — stands in
    // for cluster-local NVMe; /tmp on this sandbox is a ~280MB/s virtual
    // disk that serializes 32-way shuffle writes)
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").foreach(d => b.config("spark.local.dir", d))
    b.getOrCreate()
  }

  /** Entity profile table (entity_iri, token) for the linker. */
  def profiles(spark: SparkSession, nEntities: Int): DataFrame = {
    import spark.implicits._
    (0 until nEntities).flatMap { k =>
      Linking.entityProfile(PageGen.entityIri(k), PageGen.entityName(k), PageGen.topicTokens(k))
        .map(t => (PageGen.entityIri(k), t))
    }.toDF("entity_iri", "token")
  }

  /** entity_iri → primary label (the weight-1.0 alias). */
  def labels(dict: DataFrame): DataFrame =
    dict.filter(col("weight") === 1.0).select(col("entity_iri"), col("alias").as("label"))

  def run(
      spark: SparkSession,
      nPages: Long,
      nEntities: Int,
      out: String,
      stopAfter: Option[String] = None,
      inputPages: Option[DataFrame] = None,
      checkpoint: CheckpointPolicy = CheckpointPolicy.Local): Summary = {
    import spark.implicits._

    // snapshots are valid only for the SAME job: a different page count /
    // entity count / input identity into the same out dir recomputes
    val snaps = new SnapshotStore(s"$out/_stages", spark,
      config = s"pages=$nPages;entities=$nEntities;input=" +
        (if (inputPages.isDefined) "external" else "synthetic"))
    val lineage = Lineage.collector(spark)
    var rows = Map.empty[String, Long]
    var walls = Map.empty[String, Long]

    def stage(name: String)(compute: => DataFrame): DataFrame = {
      val t0 = System.currentTimeMillis()
      // attribute every Spark job of this stage for StageMetricsListener;
      // always reset (a throwing stage must not misattribute later jobs)
      spark.sparkContext.setLocalProperty("graft.stage", name)
      val (df, n) =
        try snaps.run(name)(compute)
        finally spark.sparkContext.setLocalProperty("graft.stage", null)
      rows += name -> n
      walls += name -> (System.currentTimeMillis() - t0)
      if (stopAfter.contains(name))
        throw new PipelineStopped(name, Summary(rows, -1, -1, walls))
      df
    }

    val dictDf = PageGen.dictionary(spark, nEntities).toDF().cache()

    val pages = stage("pages") {
      inputPages.getOrElse(PageGen.pages(spark, nPages, nEntities).toDF())
    }

    val extracted = stage("extracted") {
      // html is dead weight after extraction — the snapshot keeps only the
      // columns downstream stages read (halves post-extract snapshot I/O)
      lineage.track("extracted")(Extract.run(pages.as[WebPage])).toDF()
        .select($"url", $"warc_ts", $"text", $"lang")
    }

    val mentions = stage("mentions") {
      val aliasSurfaces = PageGen.entityDictionary(nEntities).map(_.alias)
      lineage.track("mentions")(
        Mentions.detect(extracted.select($"url", $"text"), aliasSurfaces)).toDF()
    }

    // the linker scans the mention table ~6 times (distinct surfaces, token
    // explode, tf, norms, candidate join) — cache the slim columns once
    // instead of re-reading the snapshot per scan
    val mentionsSlim = mentions.select($"mention_id", $"surface", $"context").cache()
    val links = stage("links") {
      Linking.link(mentionsSlim, dictDf.as[EntityAlias], profiles(spark, nEntities),
        knownMentionCount = rows.get("mentions")).toDF()
    }
    mentionsSlim.unpersist(blocking = false)

    val canonical = stage("canonical") {
      Canonical.canonicalMapping(dictDf, checkpoint = checkpoint)
    }

    val linked = stage("linked") {
      links
        .join(mentions.select($"mention_id", $"url"), "mention_id")
        .join(canonical, Seq("entity_iri"), "left")
        .withColumn("canonical_iri", coalesce($"canonical_iri", $"entity_iri"))
        .join(labels(dictDf).withColumnRenamed("entity_iri", "canonical_iri"), Seq("canonical_iri"))
        .select($"url", $"canonical_iri", $"label")
    }

    val tEmit = System.currentTimeMillis()
    spark.sparkContext.setLocalProperty("graft.stage", "emit+materialize")
    val graphRows =
      try {
        val triples = lineage.track("emit")(TripleEmit.emit(pages, linked))
        // predicate-count ESTIMATES from the stage manifests (exact orders
        // of magnitude: 3 metadata triples per page, ≤1 mentions + ≤1 label
        // triple per linked mention) — salting only needs the magnitude,
        // and estimates avoid a second pass over the lazy emit subtree
        val predEst = Map(
          "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" -> rows("pages"),
          s"${TripleEmit.Kg}lang" -> rows("pages"),
          s"${TripleEmit.Kg}fetchedAt" -> rows("pages"),
          s"${TripleEmit.Kg}mentions" -> rows("linked"),
          s"${TripleEmit.Kg}label" -> rows("linked"))
        Materialize.writeAdaptive(triples, s"$out/graph", predCounts = Some(predEst))
        Materialize.read(spark, s"$out/graph").count()
      } finally spark.sparkContext.setLocalProperty("graft.stage", null)
    walls += "emit+materialize" -> (System.currentTimeMillis() - tEmit)

    lineage.write(spark, s"$out/lineage")

    Summary(rows, graphRows, 0L, walls)
  }

  final class PipelineStopped(val stage: String, val partial: Summary)
      extends RuntimeException(s"stopped after stage $stage (requested)")
}

/** spark-submit entry point. */
object Main {
  def main(args: Array[String]): Unit = {
    var nPages = 1000L
    var nEntities = 500
    var out = "/tmp/graft-kg"
    var master = s"local[${Runtime.getRuntime.availableProcessors()}]"
    var shuffle = 32
    var stopAfter: Option[String] = None
    var checkpoint: CheckpointPolicy = CheckpointPolicy.Local
    args.sliding(2, 2).foreach {
      case Array("--pages", v)          => nPages = v.toLong
      case Array("--entities", v)       => nEntities = v.toInt
      case Array("--out", v)            => out = v
      case Array("--master", v)         => master = v
      case Array("--shuffle", v)        => shuffle = v.toInt
      case Array("--stop-after", v)     => stopAfter = Some(v)
      // reliable DFS checkpointing for the iterative stages: at cluster
      // scale point this at HDFS/S3 so connected-components rounds survive
      // executor loss (default keeps executor-local blocks)
      case Array("--checkpoint-dir", v) => checkpoint = CheckpointPolicy.Reliable(v)
      case other                        => sys.error(s"unknown args: ${other.mkString(" ")}")
    }
    val spark = Pipeline.sparkSession(master, shuffle)
    spark.sparkContext.setLogLevel("WARN")
    try {
      val summary = Pipeline.run(spark, nPages, nEntities, out, stopAfter,
        checkpoint = checkpoint)
      println(s"[graft] stages: ${summary.stageRows.toSeq.sortBy(_._1).mkString(", ")}")
      println(s"[graft] graph rows: ${summary.graphRows}")
    } catch {
      case s: Pipeline.PipelineStopped =>
        println(s"[graft] stopped after ${s.stage} — committed: ${s.partial.stageRows.keys.mkString(",")}")
    } finally spark.stop()
  }
}
