package graft

import org.apache.spark.sql.DataFrame

/** Lineage cuts for iterative operators (pagerank, LPA, BFS, connected
  * components): each round must not re-plan every prior round, so the
  * loop body ends with a checkpoint.
  *
  * Two modes:
  *   - default: `localCheckpoint` — executor-memory blocks, zero I/O.
  *     Right for local mode and for clusters where re-running the whole
  *     entry on executor loss is acceptable.
  *   - reliable (opt-in): `checkpoint` to the SparkContext checkpoint
  *     directory. On a 1000-executor cluster a lost executor takes its
  *     localCheckpoint blocks with it and the iteration cannot recover
  *     mid-loop; writing the per-round frontier (node-count-sized, tiny
  *     next to the edge data) to reliable storage makes the loop
  *     restartable. Enable with
  *       spark.conf.set("spark.graft.reliableCheckpoints", "true")
  *       spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")
  *     Both are required: the flag keeps the mode explicit, the dir is
  *     where `checkpoint` writes.
  */
object Checkpoints {
  val Flag = "spark.graft.reliableCheckpoints"

  def cut(df: DataFrame): DataFrame = {
    val ss = df.sparkSession
    val reliable = ss.conf.get(Flag, "false").toBoolean &&
      ss.sparkContext.getCheckpointDir.isDefined
    if (reliable) df.checkpoint() else df.localCheckpoint()
  }

  /** LAZY lineage cut for in-loop frontiers: the Catalyst plan is cut
    * immediately (each round plans against a LogicalRDD, so per-round
    * analysis cost stays flat no matter the iteration count) but
    * materialization rides the next action instead of one eager
    * blocking job per cut — on a busy scheduler those per-round jobs
    * ARE the latency (graph_pagerank at the r11 sf1 probe: 34 s,
    * scheduler-bound, data volume seconds). Shuffle boundaries inside
    * the deferred chain still bound recomputation the usual way. Under
    * the reliable-checkpoint flag this stays the eager reliable
    * checkpoint — mid-loop recoverability beats job-count there. */
  def cutLazy(df: DataFrame): DataFrame = {
    val ss = df.sparkSession
    val reliable = ss.conf.get(Flag, "false").toBoolean &&
      ss.sparkContext.getCheckpointDir.isDefined
    if (reliable) df.checkpoint() else df.localCheckpoint(eager = false)
  }
}
