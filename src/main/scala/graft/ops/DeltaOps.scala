package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental KG maintenance: the set delta between two snapshot
  * materializations of the same projection.
  *
  * The reference rebuilds its output directory from scratch on every run
  * (biocypher/output/write/_batch_writer.py writes a fresh timestamped
  * directory; its online mode replays everything through MERGE upserts).
  * At 100 TB neither works: a full rebuild re-pays the whole corpus for a
  * 0.1% document refresh, and row-at-a-time MERGE is not a batch engine.
  * The scalable contract is SNAPSHOT + DELTA: keep the previous run's
  * node/edge sets (they are already sitting in the sink as parquet — read
  * them back, never recompute), build the new snapshot from the changed
  * partition, and ship only the difference to the DBMS (`add` rows become
  * CREATE/bulk-append, `remove` rows become DETACH DELETE keys). The
  * delta IS the idempotent unit: applying it twice is a no-op because the
  * second application's anti-joins see the already-applied state.
  */
object DeltaOps {

  /** Set difference of two same-schema snapshots, tagged by direction:
    * `op = 'add'` rows are in `next` but not `prev`, `op = 'remove'` rows
    * in `prev` but not `next`. Rows are compared on ALL columns (both
    * sides are deduped first — snapshots are sets; null-safe equality, so
    * a null-valued column compares equal to itself like set membership
    * demands, not SQL three-valued logic).
    *
    * 100-TB shape: two anti-joins on the full column tuple. Unchanged
    * rows — the overwhelming majority of an incremental run — are
    * dropped at the join, never materialized. Writing both snapshots
    * bucketed by the key columns makes the joins co-located (zero
    * shuffle); otherwise this is one symmetric-hash-shuffle pass. When
    * one side is a small changed-batch rebuild, AQE broadcasts it.
    *
    * Two contract knobs unlock the fully co-located pass
    * (`ScratchDeltaBucket` evidence: 4 exchanges unbucketed → 2 bucketed
    * → 0 bucketed + both knobs):
    *  - `assumeDistinct = true` skips the defensive per-side dedup —
    *    correct whenever the inputs are real snapshots (the sink's
    *    output IS a set by the engine's dedup contract);
    *  - `nullSafe = false` compares with plain equality instead of
    *    `<=>`. Null-safe join keys are planned as `(coalesce(k, d),
    *    isnull(k))` pairs, a distribution bucketing on the raw columns
    *    can never satisfy ("Bucketed: false (disabled by query
    *    planner)") — so co-location REQUIRES plain keys. Only set it
    *    when the compared columns are non-null by contract (KG node/edge
    *    ids and labels are); a null-keyed row under plain equality would
    *    spuriously appear in both directions. */
  def snapshotDelta(prev: DataFrame, next: DataFrame,
      assumeDistinct: Boolean = false, nullSafe: Boolean = true): DataFrame = {
    require(prev.columns.sameElements(next.columns),
      s"snapshot schemas differ: ${prev.columns.mkString(",")} vs ${next.columns.mkString(",")}")
    val cols = prev.columns.toSeq
    val p = if (assumeDistinct) prev else prev.dropDuplicates(cols)
    val n = if (assumeDistinct) next else next.dropDuplicates(cols)
    def eq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      if (nullSafe) a <=> b else a === b
    val added = n.join(p, cols.map(c => eq(n(c), p(c))).reduce(_ && _), "left_anti")
      .select(lit("add").as("op") +: cols.map(n(_)): _*)
    val removed = p.join(n, cols.map(c => eq(p(c), n(c))).reduce(_ && _), "left_anti")
      .select(lit("remove").as("op") +: cols.map(p(_)): _*)
    added.unionByName(removed)
  }
}
