package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Per-Spark-stage task-metrics capture, attributed to the PIPELINE stage
  * that submitted the job (via the `graft.stage` local property set in
  * [[Pipeline.run]]). Purpose: scaling-efficiency evidence — aggregate
  * task CPU time is steal/SMT-sensitive but plan-volume facts (shuffle
  * bytes, record counts, spill) are identical across parallelism levels if
  * and only if the PLAN scales; comparing the two separates "plan doesn't
  * scale" from "host memory bandwidth saturates" (BENCH/BASELINE.md).
  */
final class StageMetricsListener extends SparkListener {

  final case class StageRow(
      group: String,
      stageId: Int,
      attempt: Int,
      tasks: Int,
      runMs: Long,
      cpuMs: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      spillBytes: Long)

  private val stageToGroup = TrieMap.empty[Int, String]
  private val buf = ArrayBuffer.empty[StageRow]

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val g = Option(js.properties).flatMap(p => Option(p.getProperty("graft.stage")))
      .getOrElse("other")
    // first-registering job wins: a stage REUSED by a later job (skipped
    // stages share ids) keeps its original attribution instead of being
    // rewritten to the latest job's group
    js.stageIds.foreach(id => stageToGroup.putIfAbsent(id, g))
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val info = sc.stageInfo
    val m = info.taskMetrics
    // look up WITHOUT removing: onStageCompleted fires once per ATTEMPT,
    // and a stage resubmitted after fetch failure must keep its group on
    // the retry. Boundedness comes from the size valve below (a measured
    // pipeline run has hundreds of stages; the valve only matters for a
    // pathological long-lived session).
    val group = stageToGroup.getOrElse(info.stageId, "other")
    if (stageToGroup.size > 100000) stageToGroup.clear()
    buf.synchronized {
      buf += StageRow(
        group,
        info.stageId,
        info.attemptNumber(),
        info.numTasks,
        m.executorRunTime,
        m.executorCpuTime / 1000000L,
        m.shuffleReadMetrics.totalBytesRead,
        m.shuffleWriteMetrics.bytesWritten,
        m.memoryBytesSpilled + m.diskBytesSpilled)
    }
  }

  def rows: Seq[StageRow] = buf.synchronized(buf.toVector)

  /** Aggregate by pipeline stage group, sorted by CPU desc. Per-ATTEMPT
    * completions collapse to the LAST attempt per stage first — a
    * fetch-failure resubmission must not double-count the stage's volume
    * (the tool exists to show shuffle bytes are identical across
    * parallelism levels; a retry would masquerade as a plan regression).
    */
  def byGroup: Seq[(String, StageRow)] =
    rows.groupBy(_.stageId).valuesIterator.map(_.maxBy(_.attempt)).toSeq
      .groupBy(_.group).view.mapValues { rs =>
      StageRow(rs.head.group, -1, -1, rs.map(_.tasks).sum, rs.map(_.runMs).sum,
        rs.map(_.cpuMs).sum, rs.map(_.shuffleReadBytes).sum,
        rs.map(_.shuffleWriteBytes).sum, rs.map(_.spillBytes).sum)
    }.toSeq.sortBy(-_._2.cpuMs)
}

/** Runs the full pipeline once under a [[StageMetricsListener]] and prints
  * ONE JSON line of per-pipeline-stage task metrics — the measurement unit
  * tools/taskmetrics.py compares across parallelism levels.
  */
object TaskMetricsBench {
  def main(args: Array[String]): Unit = {
    val pages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "300000").toLong
    val entities = sys.env.getOrElse("SPARK_GRAFT_ENTITIES", "10000").toInt
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt

    val spark = Pipeline.sparkSession(master, shuffle, s"graft-taskmetrics-$master")
    spark.sparkContext.setLogLevel("WARN")
    val listener = new StageMetricsListener
    try {
      // warmup (JIT) — listener attached after, so only the timed run counts
      val base = sys.env.get("SPARK_GRAFT_OUT_BASE")
        .map(java.nio.file.Paths.get(_))
        .getOrElse(java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
      java.nio.file.Files.createDirectories(base)
      val warm = java.nio.file.Files.createTempDirectory(base, "graft-tm-warm")
      Pipeline.run(spark, math.max(pages / 10, 500), entities, warm.toString)
      org.apache.commons.io.FileUtils.deleteQuietly(warm.toFile)

      spark.sparkContext.addSparkListener(listener)
      val out = java.nio.file.Files.createTempDirectory(base, "graft-tm")
      val t0 = System.nanoTime()
      val summary = Pipeline.run(spark, pages, entities, out.toString)
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.commons.io.FileUtils.deleteQuietly(out.toFile)

      val groups = listener.byGroup.map { case (g, r) =>
        s""""$g":{"tasks":${r.tasks},"run_ms":${r.runMs},"cpu_ms":${r.cpuMs},""" +
          s""""shuffle_read_b":${r.shuffleReadBytes},"shuffle_write_b":${r.shuffleWriteBytes},""" +
          s""""spill_b":${r.spillBytes}}"""
      }.mkString("{", ",", "}")
      println(
        f"""{"metric":"task_metrics","master":"$master","pages":$pages,""" +
          f""""graph_rows":${summary.graphRows},"wall_sec":$wall%.2f,"groups":$groups}""")
    } finally spark.stop()
  }
}
