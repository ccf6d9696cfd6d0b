package graft

import org.apache.spark.sql.SparkSession

/** One-stop SparkSession builder with the engine's production posture —
  * the configuration a deployment of this library runs with, kept in code
  * so the 100 TB design decisions are executable, not just documented:
  *
  *  - AQE on with skew-join splitting: runtime re-plan handles the skewed
  *    keys (hot metrics, boilerplate near-dup clusters) that no static
  *    plan survives at scale.
  *  - Partition-size-targeted coalescing instead of a fixed shuffle
  *    partition count: `shufflePartitions` is only the initial number;
  *    AQE coalesces to ~64 MB targets.
  *  - RocksDB state store for streaming jobs: open-window + session +
  *    GroupState state lives off-heap with incremental checkpointing.
  *  - The engine's native functions (cosine_sim) injected via
  *    SparkSessionExtensions so SQL users get them too.
  */
object GraftSession {

  def builder(
      master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}
