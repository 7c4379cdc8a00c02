package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.ops.EmbeddingOps

/** Scratch shuffle-bytes measurement behind the BENCH/BASELINE.md note on
  * the kNN-graph memory-vs-bytes trade: block-pair [[EmbeddingOps
  * .knnGraphCells]] at two block counts vs the cell-colocated variant,
  * same input, shuffle write bytes summed over each job's stages.
  */
object KnnBytesScratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("graft-knn-bytes")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = if (args.nonEmpty) args(0).toInt else 100000
    val dims = 32
    val vecs = spark.range(n.toLong).select(
      org.apache.spark.sql.functions.col("id").as("vec_id"),
      org.apache.spark.sql.functions.expr(
        s"transform(sequence(0, ${dims - 1}), " +
          "d -> CAST((((id * 13 + d * 29) % 17) - 8) / 10.0 AS FLOAT))")
        .as("embedding"))
      .cache()
    vecs.count()

    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        rows.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
    })

    def measure(name: String)(job: => Long): Unit = {
      bytes.set(0L); rows.set(0L)
      val t0 = System.nanoTime()
      val cnt = job
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async — give the bus a moment to drain
      Thread.sleep(1500)
      println(f"$name%-28s rows=$cnt%9d shuffleMB=${bytes.get / 1048576.0}%9.1f " +
        f"shuffleRows=${rows.get}%10d wall=$wall%6.1f s")
    }

    for (_ <- 0 until 2) { // second rep = warm JVM; read the second block
      measure("blocks=8 (replicated)") {
        EmbeddingOps.knnGraphCells(vecs, k = 5, cells = 16, dims = dims, blocks = 8).count()
      }
      measure("blocks=4 (replicated)") {
        EmbeddingOps.knnGraphCells(vecs, k = 5, cells = 16, dims = dims, blocks = 4).count()
      }
      measure("colocated (1x shuffle)") {
        EmbeddingOps.knnGraphCellsColocated(vecs, k = 5, cells = 16, dims = dims).count()
      }
      println("---")
    }
    spark.stop()
  }
}
