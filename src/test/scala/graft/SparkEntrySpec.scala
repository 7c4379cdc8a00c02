package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Driver-contract smoke tests + physical-plan regression guards (the plan
  * properties SURVEY.md §4 promises: pushdown, pruning, broadcast joins).
  */
class SparkEntrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val sf = "/root/testdata/sf0.001"

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or is explicitly rows-only") {
    // emb04 (bucketed ANN) is the deliberate rows-only entry: its oracle
    // would be the brute-force SQL restricted to SRP buckets — exercised
    // structurally by OpsSpec instead
    val rowsOnly = Set("emb04_ann_bucketed")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"oracles without query: $stale")
  }

  test("q05 pushes its filters into the parquet scan and prunes columns") {
    val plan = SparkEntry.queries("q05_filter_pushdown")(spark, sf)
      .queryExecution.executedPlan.toString
    // plan strings elide long lists — check the stable prefix
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan.take(500))
    // pruned read schema: no l_shipdate-adjacent unused columns like l_tax
    assert(!plan.contains("l_tax"), "column pruning lost")
  }

  test("q02 joins dimensions via broadcast, not shuffle") {
    val plan = SparkEntry.queries("q02_join_revenue")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), "dimension join degraded to SMJ")
  }

  test("q01 aggregates map-side before the exchange (partial HashAggregate)") {
    val plan = SparkEntry.queries("q01_agg_lineitem")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, "no partial aggregate")
  }

  test("kg05 plans the custom parse_turtle Generator") {
    val plan = SparkEntry.queries("kg05_parse_turtle_sql")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate") && plan.toLowerCase.contains("parseturtle"),
      plan.take(800))
  }

  test("turtle ingestion routes malformed documents to the rejects table") {
    import spark.implicits._
    val docs = Seq(
      ("http://ok.example/1", new java.sql.Timestamp(0L),
        "@prefix p: <http://e/> . p:a p:b p:c ."),
      ("http://bad.example/2", new java.sql.Timestamp(0L),
        "<http://a b> <http://p> <http://o> ."), // space in IRI
      ("http://bad.example/3", new java.sql.Timestamp(0L),
        "p:a p:b p:c .") // unknown prefix (build-time error)
    ).toDS()
    val (triples, rejects) = graft.pipeline.TripleEmit.ingestTurtle(docs)
    val ts = triples.collect()
    val rs = rejects.collect()
    assert(ts.length == 1 && ts(0).src_url == "http://ok.example/1")
    // labels are document-scoped in ingestion mode
    assert(ts(0).subj.startsWith("<http://e/a>") || ts(0).subj == "<http://e/a>")
    assert(rs.map(_.url).sorted.toSeq == Seq("http://bad.example/2", "http://bad.example/3"))
    assert(rs.forall(r => r.message.nonEmpty && r.span_end >= r.span_start))
  }
}
