package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.Bridge

/** ONE definition of the right-sized cloned session every iterative
  * graph loop runs in (connected components, k-core, label propagation,
  * HITS) — measured in representatives(): label/alive/score frames are
  * nodes-sized, and at the caller's corpus-scale shuffle width each
  * sweep's stage-submission latency exceeds the data it moves, while
  * AQE's per-exchange materialize-and-replan and fresh per-sweep
  * whole-stage Janino compiles dominate SMALL graphs outright.
  *
  * The width lives in a CLONED session (shared SparkContext, cache
  * manager, catalog) — never a session-global conf flip, which would
  * silently down-size every concurrent query (ADVICE r12). Sizing is
  * ~1M edge rows (~16 MB) per partition capped at the session setting,
  * so a billion-edge graph keeps the caller's full width; under 10M
  * edges codegen is off (the compile dwarfs interpreting a nodes-sized
  * frame — the classic iterative-small-data tradeoff).
  *
  * CONTRACT: frames the loop should execute must be rebound into the
  * loop session ([[bindInto]]); frames handed BACK to the caller must
  * be rebound to the caller's session (Bridge.rebind) or downstream
  * queries inherit the loop's single-partition/no-broadcast confs. */
private[graft] object LoopSession {

  /** `rowsPerPartition` sizes the loop width to what the sweeps MOVE:
    * 1M for loops whose per-sweep traffic is nodes-sized (components,
    * peel, label propagation), smaller for loops that exchange the edge
    * frame every sweep (HITS). `codegenCutoff` disables whole-stage
    * codegen below that many rows (per-sweep Janino compiles dwarf
    * interpreting nodes-sized frames); pass 0 to always keep codegen —
    * right when edge-sized joins run inside the loop. */
  def forGraph(spark: SparkSession, nEdgeRows: Long,
               rowsPerPartition: Long = 1000000L,
               codegenCutoff: Long = 10000000L): SparkSession = {
    val sessionParts = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions").toLong).getOrElse(200L)
    val loopParts = math.max(1L,
      math.min(sessionParts, nEdgeRows / rowsPerPartition + 1L))
    Bridge.sessionWithConf(spark, Map(
      "spark.sql.shuffle.partitions" -> loopParts.toString,
      "spark.sql.adaptive.enabled" -> "false",
      // a sweep's joins are all nodes-sized: a broadcast pays a driver
      // collect + rebuild per join per sweep, a sort-merge pays
      // per-sweep sorts — the hash-shuffle join at loop width does
      // neither
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "false") ++
      (if (nEdgeRows <= codegenCutoff)
        Map("spark.sql.codegen.wholeStage" -> "false") else Map.empty))
  }

  /** Truncate a (persisted) frame's plan to a flat scan of its execution
    * RDD and rebind it into `loop` — the loop-entry move for the edge
    * frame. Truncation destroys size stats (broadcasts are off in the
    * loop anyway) and keeps lineage-recompute recoverability. */
  def bindInto(df: DataFrame, loop: SparkSession): DataFrame =
    Bridge.rebind(Bridge.truncatePlan(df), loop)
}
