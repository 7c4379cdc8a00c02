package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object PerfScratch4 {
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
    import spark.implicits._

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("td32 warm") { SparkEntry.queries("td32_containment")(spark, sfDir).count() }

    val ShingleLen = 16
    val sh = docs.select(col("doc_id"), explode(array_distinct(expr(
      s"transform(sequence(1, greatest(length(text) - ${ShingleLen - 1}, 1)), " +
        s"i -> substring(text, i, $ShingleLen))"))).as("g0"))
      .select(col("doc_id"), xxhash64(col("g0")).as("g"))
    time("sh count") { println("sh rows=" + sh.count()) }
    val m = 16
    val cand = sh.select(col("g"), col("doc_id")).as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val buf = new scala.collection.mutable.ArrayBuffer[Long](m + 1)
        var hot = false
        while (it.hasNext && !hot) { buf += it.next()._2; if (buf.length > m) hot = true }
        if (hot || buf.length < 2) Iterator.empty
        else { val ids = buf.toArray.sorted
          ids.indices.iterator.flatMap(i => (i + 1 until ids.length).iterator.map(j => (ids(i), ids(j)))) }
      }.toDF("a", "b").distinct()
    val candC = time("cand eval+ckpt") { cand.localCheckpoint() }
    println("cand rows=" + candC.count())
    val candDocs = candC.select(col("a").as("doc_id"))
      .unionByName(candC.select(col("b").as("doc_id"))).distinct()
    val docSets = sh.join(candDocs, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_set(col("g")).as("gs"))
    time("docSets+joins") {
      candC
        .join(docSets.select(col("doc_id").as("a"), col("gs").as("_ga")), Seq("a"))
        .join(docSets.select(col("doc_id").as("b"), col("gs").as("_gb")), Seq("b"))
        .select(col("a"), col("b"),
          size(array_intersect(col("_ga"), col("_gb"))).cast("long").as("n_shared"),
          size(col("_ga")).cast("long").as("na"), size(col("_gb")).cast("long").as("nb"))
        .count()
    }
    spark.stop()
  }
}
