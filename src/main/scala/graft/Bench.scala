package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * td08_ngram_jaccard is excluded from the timed set: its within-source
  * shingle self-join is quadratic in docs-per-source and exists as a
  * correctness oracle, not a throughput path (MinHash/SimHash are the scale
  * paths for near-dup).
  */
object Bench {

  val Excluded: Set[String] = Set("td08_ngram_jaccard")

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

    val timed = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => Excluded.contains(name) }

    // JIT/codegen warmup at the smallest SF (same protocol as ScalingBench/
    // ParserBench): the first execution of each query family pays janino
    // compilation of its generated code plus JVM JIT — fixed per-process
    // cost, not a property of the measured plan (profiled: emb01 4.7 s cold
    // vs 0.7 s warm on identical data)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(warmDir)))
      System.err.println(s"[bench] WARNING: warm dir $warmDir missing — " +
        "measured numbers will include cold-start (JIT/codegen) cost")
    timed.foreach { case (name, fn) =>
      try { fn(spark, warmDir).count(); () }
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] WARNING: warmup of $name failed: $e")
      }
    }

    val results = timed
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); () }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        name -> (System.nanoTime() - t0) / 1e9
      }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** Single-thread Turtle parse+build throughput (the unit the reference
  * library implements): parses the 29-fixture conformance corpus in a loop
  * (JIT warmup then timed) and reports MB/s and docs/sec. No Spark — this
  * is the per-core kernel that the distributed flatMap multiplies.
  */
object ParserBench {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get("src/test/resources/turtle/positive")
    val docs = (1 to 29).map { n =>
      new String(java.nio.file.Files.readAllBytes(dir.resolve(f"p$n%02d.ttl")),
        java.nio.charset.StandardCharsets.UTF_8)
    }
    val bytes = docs.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong).sum
    def pass(): Long = {
      var triples = 0L
      docs.foreach { d =>
        triples += graft.turtle.Turtle.parseToTriples(d).fold(e => throw e, _.length.toLong)
      }
      triples
    }
    val warmupUntil = System.nanoTime() + 3e9.toLong
    while (System.nanoTime() < warmupUntil) pass()
    val t0 = System.nanoTime()
    var reps = 0L
    var triples = 0L
    while (System.nanoTime() - t0 < 5e9.toLong) { triples += pass(); reps += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    val mbps = bytes * reps / 1048576.0 / sec
    println(
      f"""{"metric":"turtle_parse_build_single_thread","mb_per_sec":$mbps%.1f,""" +
        f""""docs_per_sec":${29 * reps / sec}%.0f,"triples_per_sec":${triples / sec}%.0f}""")
  }
}

/** Two-parallelism scaling benchmark (stand-in for N vs 4N executors —
  * no real cluster in this sandbox): runs the full KG pipeline on the SAME
  * deterministic input at local[8] and local[32], reports triples/sec at
  * both plus `efficiency = (thr32/thr8) / (32/8)`, and rewrites
  * BENCH/BASELINE.md. One SparkContext at a time — each level gets a fresh
  * session.
  */
object ScalingBench {

  private def runOnce(master: String, shuffle: Int, pages: Long, entities: Int): (Double, Long) = {
    val spark = graft.pipeline.Pipeline.sparkSession(master, shuffle, s"graft-scaling-$master")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val base = sys.env.get("SPARK_GRAFT_OUT_BASE")
        .map(java.nio.file.Paths.get(_))
        .getOrElse(java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
      java.nio.file.Files.createDirectories(base)
      val out = java.nio.file.Files.createTempDirectory(base, "graft-scaling")
      val t0 = System.nanoTime()
      val summary = graft.pipeline.Pipeline.run(spark, pages, entities, out.toString)
      val wall = (System.nanoTime() - t0) / 1e9
      System.err.println(s"[scaling] $master stage walls (ms): " +
        summary.stageWallMs.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(", "))
      // tmpfs hygiene: measurement outputs are throwaway
      org.apache.commons.io.FileUtils.deleteQuietly(out.toFile)
      (wall, summary.graphRows)
    } finally spark.stop()
  }

  /** One JVM per measurement (tools/scaling.py orchestrates): back-to-back
    * sessions in one JVM confound the later run with the earlier run's heap
    * garbage. SPARK_GRAFT_MASTER/SPARK_GRAFT_SHUFFLE select the level; a
    * warmup run at pages/10 precedes the timed run in the same JVM (JIT).
    */
  def main(args: Array[String]): Unit = {
    val pages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "20000").toLong
    val entities = sys.env.getOrElse("SPARK_GRAFT_ENTITIES", "2000").toInt
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt

    runOnce(master, shuffle, math.max(pages / 10, 500), entities) // warmup
    // min-of-N wall: the sandbox host shows bursty CPU steal (noisy
    // neighbours); the minimum is the least-interfered measurement
    val runs = (1 to reps).map(_ => runOnce(master, shuffle, pages, entities))
    val rows = runs.head._2
    require(runs.forall(_._2 == rows), "nondeterministic graph across reps")
    val wall = runs.map(_._1).min
    val thr = rows / wall
    println(
      f"""{"metric":"pipeline_throughput","master":"$master","pages":$pages,""" +
        f""""graph_rows":$rows,"wall_sec":$wall%.2f,"reps":$reps,""" +
        f""""walls":[${runs.map(r => f"${r._1}%.2f").mkString(",")}],""" +
        f""""triples_per_sec":$thr%.1f}""")
  }
}
