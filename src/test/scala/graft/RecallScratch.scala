package graft

import org.apache.spark.sql.DataFrame
import graft.ops.{EmbeddingOps, TextOps}

/** Scratch recall measurement: raw-vector IVF+PQ vs residual IVFADC. */
object RecallScratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("graft-recall")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double =
      exact.map { case (q, e) =>
        approx.get(q).map(a => (a & e).size.toDouble / e.size).getOrElse(0.0)
      }.sum / exact.size

    def measure(name: String, vecs: DataFrame, n: Int): Unit = {
      val exact = topSets(EmbeddingOps.annBruteForce(vecs, nQueries = n, k = 5))
      val raw = recallOf(topSets(
        EmbeddingOps.annIvfPq(vecs, cells = 8, k = 5, nQueries = n, nprobe = 2)), exact)
      println(f"$name raw-PQ        : $raw%.3f")
      val res = recallOf(topSets(
        EmbeddingOps.annIvfPqResidual(vecs, cells = 8, k = 5, nQueries = n,
          nprobe = 2, coarseIterations = 1, trainIterations = 1)), exact)
      println(f"$name residual(1,1)  : $res%.3f")
      for (r <- Seq(20, 50)) {
        val rr = recallOf(topSets(
          EmbeddingOps.annIvfPqRerank(vecs, cells = 8, k = 5, nQueries = n,
            nprobe = 2, rerank = r)), exact)
        println(f"$name rerank R=$r%-3d   : $rr%.3f")
      }
    }

    val clustered = (0 until 200).map { i =>
      val k = i / 10
      val v = Array.tabulate(64) { j =>
        val c = ((TextOps.md5Hash60(s"c$k:$j") % 2000L) - 1000L) / 1000.0f
        val noise = ((TextOps.md5Hash60(s"n$i:$j") % 100L) - 50L) / 1000.0f
        c + noise
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    measure("clustered", clustered, 200)

    val sf = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    measure("sf0.01   ", sf, 500)

    val iso = (0 until 300).map { i =>
      val v = Array.tabulate(64) { j =>
        ((TextOps.md5Hash60(s"v$i:$j") % 2000L) - 1000L) / 1000.0f
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    measure("isotropic", iso, 300)

    // semantic-dedup PAIR RECALL vs the exact near-dup ground truth
    // (emb02's all-pairs kernel at the same threshold): the fraction of
    // exact pairs whose endpoints land in the SAME semantic cluster — the
    // loss is exactly the pairs the k-means cell boundary splits
    def dedupRecall(name: String, vecs: DataFrame, threshold: Double): Unit = {
      val exact = EmbeddingOps.nearDupPairs(vecs, threshold).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val rep = EmbeddingOps.semDedupClusters(vecs, threshold).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val hit = exact.count { case (a, b) => rep(a) == rep(b) }
      println(f"$name semdedup pair-recall @$threshold%.2f: " +
        f"${if (exact.isEmpty) 1.0 else hit.toDouble / exact.length}%.3f " +
        f"(${exact.length} exact pairs, ${rep.values.toSet.size} clusters)")
    }
    dedupRecall("clustered", clustered, 0.60)
    dedupRecall("sf0.01   ", sf, 0.30)
    spark.stop()
  }
}
