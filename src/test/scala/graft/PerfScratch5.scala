package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PerfScratch5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.ops.{MultimodalOps, TextOps}
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def chk(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(pmod(xxhash64(col("a_id"), col("b_id"), col("hamming")), lit(1000000007L)))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    // OLD emission logic (pre-change replica): emit from every shared bucket, distinct
    val maxDist = 3; val maxBucket = TextOps.DefaultMaxBucket
    val bands = docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, MultimodalOps.encodeFakeGrid(id))))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val h = MultimodalOps.dHashOf(bytes)
        (0 until 4).iterator.map(b => (b, (h >>> (16 * b)) & 0xFFFFL, id, h))
      })
    val old = bands.groupByKey(r => (r._1, r._2))
      .flatMapGroups { (_, it) =>
        val members = it.map(r => (r._3, r._4)).toArray.sortBy(_._1)
        def emit(x: (Long, Long), y: (Long, Long)) = {
          val d = java.lang.Long.bitCount(x._2 ^ y._2).toLong
          if (d <= maxDist) Iterator.single((x._1, y._1, d)) else Iterator.empty
        }
        if (members.length <= maxBucket)
          members.indices.iterator.flatMap(i =>
            (i + 1 until members.length).iterator.flatMap(j => emit(members(i), members(j))))
        else members.iterator.drop(1).flatMap(m => emit(members(0), m))
      }.toDF("a_id", "b_id", "hamming").distinct()
    println(s"[mm05-old] ${chk(old)}")
    println(s"[mm05-new] ${chk(SparkEntry.queries("mm05_phash_neardup")(spark, sfDir))}")
    spark.stop()
  }
}
