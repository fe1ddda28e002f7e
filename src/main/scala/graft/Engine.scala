package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Tuned for the driver's local[32] harness but with settings that are
  * the ones you'd want on a real cluster too: AQE (runtime re-plan,
  * skew-join splitting, partition coalescing) and UTC session time.
  */
object Engine {
  def session(master: String = "local[32]", shufflePartitions: Int = 32,
      extraConf: Map[String, String] = Map.empty): SparkSession = {
    val builder = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(graft.functions.Vectors.install)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      // RocksDB state store: spillable + incremental-checkpoint state,
      // the store a watermark-bounded streaming job needs when per-key
      // state exceeds executor heap (HDFSBacked keeps it all on-heap)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
    val spark = extraConf.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Drop the `WindowExec: No Partition Defined` warning category for
    * the driver surfaces (Verify/Bench): the unpartitioned frames in
    * this library are registry/model-sized BY DESIGN and each one is
    * certified bounded by PlanSweepSpec's global-window lint — but a
    * full Verify run emitted hundreds of these lines, burying the real
    * `[verify] … failed` signal (r14 verdict nit). Scoped to the one
    * logger category; every other WARN still prints. */
  def quietBoundedWindowWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
