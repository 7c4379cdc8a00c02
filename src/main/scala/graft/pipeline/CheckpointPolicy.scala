package graft.pipeline

import org.apache.spark.sql.DataFrame

/** How iterative operators truncate lineage each round.
  *
  * Every loop in this engine — [[Canonical.connectedComponents]],
  * [[graft.ops.GraphAnalytics.bfsHops]]/[[graft.ops.GraphAnalytics.pageRank]],
  * [[graft.ops.EmbeddingOps.kmeansRefine]] — must cut its plan back to O(1)
  * per round or the lineage grows with the iteration count. HOW it cuts is a
  * durability decision:
  *
  *   - [[CheckpointPolicy.Local]] (default): `localCheckpoint` — blocks live
  *     on executors (memory-and-disk). Fastest, zero DFS traffic; but one
  *     lost executor loses blocks whose lineage was already truncated, which
  *     kills a 100-TB iterative job mid-flight.
  *   - [[CheckpointPolicy.Reliable]]: `Dataset.checkpoint` to a DFS
  *     directory — each round's state is a file the cluster can re-read, so
  *     executor loss costs one round's recompute-from-files, not the job.
  *     This is the policy a real cluster run threads in via
  *     `Pipeline.run(checkpoint = Reliable(dir))` / `Main --checkpoint-dir`.
  *
  * PipelineSpec pins the durability difference directly: after
  * `truncate`, every cached block is wiped (`unpersist(blocking = true)` on
  * all persistent RDDs — the local-mode stand-in for losing every executor)
  * and the reliable result is still recomputable while the local one throws.
  */
sealed trait CheckpointPolicy extends Serializable {
  /** Eagerly materialize `df` and truncate its lineage. Completes any
    * pending `Dataset.observe` metrics on the plan (both variants run a
    * job over every row).
    */
  def truncate(df: DataFrame): DataFrame

  /** Lazy variant — lineage is truncated but materialization happens at
    * the caller's next action (used where the caller immediately feeds the
    * result into the next round's plan and an extra job per round would
    * double the iteration cost).
    */
  def truncateLazy(df: DataFrame): DataFrame
}

object CheckpointPolicy {

  /** Executor-block-backed truncation (`localCheckpoint`). */
  case object Local extends CheckpointPolicy {
    def truncate(df: DataFrame): DataFrame = df.localCheckpoint()
    def truncateLazy(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)
  }

  /** DFS-backed truncation (`Dataset.checkpoint` under `dir`): survives
    * executor loss. `SparkContext.setCheckpointDir` is context-global and
    * appends a fresh UUID subdirectory per call, so it is set once per
    * (context, dir) — repeated truncations reuse the same run directory.
    */
  final case class Reliable(dir: String) extends CheckpointPolicy {
    private def ensureDir(df: DataFrame): Unit = {
      val sc = df.sparkSession.sparkContext
      // getCheckpointDir returns a RESOLVED URI (scheme-qualified, UUID
      // subdir appended) — compare scheme-stripped paths or every round
      // would allocate a fresh subdirectory
      def path(p: String) = new org.apache.hadoop.fs.Path(p).toUri.getPath
      // compare on a directory BOUNDARY: a plain prefix test would match a
      // sibling dir (dir=/data/ck vs an existing /data/ck2/<uuid>) and keep
      // checkpointing into another policy's directory
      val base = path(dir).stripSuffix("/")
      val ok = sc.getCheckpointDir.exists { d =>
        val p = path(d); p == base || p.startsWith(base + "/")
      }
      if (!ok) sc.setCheckpointDir(dir)
    }
    def truncate(df: DataFrame): DataFrame = {
      ensureDir(df)
      df.checkpoint()
    }
    def truncateLazy(df: DataFrame): DataFrame = {
      ensureDir(df)
      df.checkpoint(eager = false)
    }
  }
}
