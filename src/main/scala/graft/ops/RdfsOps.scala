package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** RDFS inference materialization over a constructed KG — the standard
  * entailment rules a real knowledge graph ships with an ontology:
  *
  *   - rdfs5/rdfs11: `subPropertyOf` / `subClassOf` are transitive;
  *   - rdfs7: `(x p y), (p subPropertyOf q) ⇒ (x q y)`;
  *   - rdfs2: `(p domain C), (x p y) ⇒ (x rdf:type C)`;
  *   - rdfs3: `(p range C),  (x p y) ⇒ (y rdf:type C)` (IRI objects only —
  *     literal-subject "generalized RDF" triples are deliberately not
  *     emitted);
  *   - rdfs9: `(x rdf:type C), (C subClassOf D) ⇒ (x rdf:type D)`.
  *
  * Scale shape (the WebPIE split, Urbani et al. 2010): the TBox (schema) is
  * ontology-sized — KBs, not TBs — so its transitive closures are computed
  * once on the driver (collect bounded by `maxSchemaTriples`, a loud
  * `require`, never data-scaled) and every rule application is a BROADCAST
  * join against the ABox. No instance-side iteration exists at all: RDFS
  * closure is schema-closure-then-one-pass, unlike OWL. The only exchange
  * in the whole plan is the final set-semantics `distinct` — everything
  * upstream is map-side (plan-guarded in OpsSpec). Rule order matters and
  * is staged so each rule sees what it must: rdfs7 first (property
  * aliases), domain/range over the rdfs7-extended triples, rdfs9 over all
  * type triples incl. the domain/range-derived ones.
  *
  * Instance scans: the derivation branches each filter on a schema
  * predicate, so on a [[graft.pipeline.Materialize]] graph table they
  * prune to the schema predicates' `pred_hash` partitions; the one full
  * scan is the identity branch that carries the input through to the
  * closed output.
  *
  * Term conventions follow the KG tables: predicates are bare IRIs, IRI
  * subjects/objects are `<>`-rendered, literals quoted (reference
  * rendering, `src/build.rs:60-91`); the schema DataFrame is bare on all
  * three columns.
  */
object RdfsOps {

  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  val RdfsSubClassOf = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
  val RdfsSubPropertyOf = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
  val RdfsDomain = "http://www.w3.org/2000/01/rdf-schema#domain"
  val RdfsRange = "http://www.w3.org/2000/01/rdf-schema#range"

  /** Driver-side transitive closure of a tiny edge set — the TBox side.
    * Plain BFS per source; input size is `require`-bounded by the caller.
    * Result excludes reflexive pairs unless the input contains a cycle
    * (a ⊑ b ⊑ a entails a ⊑ a — kept, RDFS allows it).
    */
  private[ops] def closeTransitive(edges: Seq[(String, String)]): Seq[(String, String)] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).distinct) }
    val out = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    for (src <- edges.map(_._1).distinct) {
      val seen = scala.collection.mutable.Set.empty[String]
      var frontier = adj.getOrElse(src, Nil)
      while (frontier.nonEmpty) {
        val fresh = frontier.filterNot(seen)
        seen ++= fresh
        fresh.foreach(d => out += ((src, d)))
        frontier = fresh.flatMap(d => adj.getOrElse(d, Nil))
      }
    }
    out.toSeq
  }

  /** Materialize the RDFS closure of `instance` under `schema`: the output
    * is the DISTINCT union of the input triples and every triple entailed
    * by rdfs2/3/5/7/9/11. `schema` is a bare-IRI (subj, pred, obj) triple
    * DataFrame whose predicates are the four rdfs:* properties above;
    * non-schema rows in it are ignored.
    */
  def rdfsClosure(
      instance: DataFrame, schema: DataFrame,
      maxSchemaTriples: Long = 1L << 20): DataFrame = {
    val spark = instance.sparkSession
    // TBox collect — ontology-sized by contract, loudly bounded
    val rows = schema.select(col("subj"), col("pred"), col("obj")).collect()
    require(rows.length <= maxSchemaTriples,
      s"schema has ${rows.length} triples > maxSchemaTriples=$maxSchemaTriples — " +
        "the TBox must be ontology-sized (raise the bound only deliberately)")
    def edges(p: String): Seq[(String, String)] =
      rows.toSeq.collect { case Row(s: String, `p`, o: String) => (s, o) }

    val spc = closeTransitive(edges(RdfsSubPropertyOf)) // property ⊑ closure
    val scc = closeTransitive(edges(RdfsSubClassOf))    // class ⊑ closure
    val dom = edges(RdfsDomain)
    val rng = edges(RdfsRange)

    import spark.implicits._
    def pairDf(ps: Seq[(String, String)], a: String, b: String): DataFrame =
      ps.toDF(a, b)

    val tri = instance.select(col("subj"), col("pred"), col("obj"))

    // rdfs7: property-alias expansion — broadcast the ⊑-closed property map
    val derived7 =
      if (spc.isEmpty) spark.emptyDataFrame.select()
      else tri.join(broadcast(pairDf(spc, "_sub", "_sup")), col("pred") === col("_sub"))
        .select(col("subj"), col("_sup").as("pred"), col("obj"))
    val all = if (spc.isEmpty) tri else tri.unionByName(derived7.toDF("subj", "pred", "obj"))

    // rdfs2/rdfs3 over the alias-extended triples
    def typed(src: DataFrame, byCol: String, pairs: Seq[(String, String)]): DataFrame =
      src.join(broadcast(pairDf(pairs, "_p", "_c")), col("pred") === col("_p"))
        .select(col(byCol).as("subj"), col("_c").as("cls"))
    val fromDomain = typed(all, "subj", dom)
    val fromRange = typed(all.filter(col("obj").startsWith("<")), "obj", rng)
      .select(expr("substring(subj, 2, length(subj) - 2)").as("_iri"), col("cls"))
      .select(concat(lit("<"), col("_iri"), lit(">")).as("subj"), col("cls"))
    // explicit rdf:type assertions join rdfs9 too
    val explicit = all.filter(col("pred") === RdfType && col("obj").startsWith("<"))
      .select(col("subj"), expr("substring(obj, 2, length(obj) - 2)").as("cls"))

    val types0 = explicit.unionByName(fromDomain).unionByName(fromRange)
    // rdfs9: lift every type assertion through the ⊑-closed class map
    val types =
      if (scc.isEmpty) types0
      else types0.unionByName(
        types0.join(broadcast(pairDf(scc, "_sub", "_sup")), col("cls") === col("_sub"))
          .select(col("subj"), col("_sup").as("cls")))

    val typeTriples = types.select(
      col("subj"), lit(RdfType).as("pred"),
      concat(lit("<"), col("cls"), lit(">")).as("obj"))

    all.unionByName(typeTriples).distinct()
  }
}
