package graft

/** Scratch driver for iterating on individual queries (deleted before commit). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val names = args.drop(2)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val sqls = names.map(n => s""""$n": ${ujsonEscape(SparkEntry.oracleSql(n))}""")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
        s"{${sqls.mkString(",")}}".getBytes("UTF-8"))
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").parquet(s"$out/$n")
        println(f"ran $n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    } finally spark.stop()
  }
  private def ujsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c => c.toString
    } + "\""
}
