package graft

import org.apache.spark.sql.Dataset

/** The engine's one lineage-barrier policy (VERDICT r7 #1), shared by every
  * operator that materializes a small intermediate consumed by several
  * branches (`Pipeline.triplesFromSets`' key set, `GraphOps`' edge lists,
  * `TextOps.bm25TopK`'s per-doc stats, `ResolveOps`' name set):
  *
  *  - with a SparkContext checkpoint dir configured (cluster operation)
  *    and `spark.graft.barrier` not forced to `local`, the barrier is a
  *    RELIABLE lazy `Dataset.checkpoint` — on executor loss the cluster FS
  *    re-serves the blocks, recomputing and failing nothing;
  *  - otherwise (the sandbox default) a lazy `localCheckpoint` — blocks
  *    are freed by the ContextCleaner once the dataset is unreachable (no
  *    CacheManager entry to leak, unlike `persist`).
  *
  * `spark.graft.barrier=local` opts a cluster out (and lets tests restore
  * the default after exercising the reliable branch). Both branches are
  * spec-proven result-identical (PipelineSpec). Lazy in both cases: the
  * barrier materializes with the first action, so building a plan never
  * triggers jobs (the lmScore lesson).
  */
object Barrier {
  def apply[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    if (spark.sparkContext.getCheckpointDir.isDefined
        && spark.conf.get("spark.graft.barrier", "auto") != "local")
      ds.checkpoint(eager = false)
    else ds.localCheckpoint(eager = false)
  }
}
