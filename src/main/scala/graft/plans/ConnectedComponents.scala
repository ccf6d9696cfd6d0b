package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components on DataFrames via the alternating large-star /
  * small-star algorithm (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC'14 — a public MapReduce algorithm, re-expressed here as
  * Catalyst-optimized joins).
  *
  * Why not GraphX Pregel: Pregel's per-superstep cost is a full vertex+edge
  * RDD shuffle and its round count is O(graph diameter); on a 100 TB corpus
  * a single boilerplate near-dup chain can be thousands of hops. Large-star /
  * small-star contracts the graph toward a star forest in O(log^2 n) rounds
  * worst-case (observed: a handful), each round being two hash-aggregate +
  * join stages that AQE sizes at runtime — and intermediate edge sets only
  * shrink (toward one edge per non-root node), so the shuffles get cheaper
  * every round. No vertex-program runtime, no RDD serialization: everything
  * stays in Tungsten rows with whole-stage codegen.
  *
  * Rounds are materialized with `localCheckpoint` — iterative DataFrame
  * loops otherwise accumulate an exponentially deep plan that chokes the
  * optimizer, and checkpointing caps each round's lineage at one step.
  * Checkpoints are LAZY (`eager = false`): the round's convergence
  * fingerprint is the single action that materializes them, so each round
  * costs exactly one driver round-trip (an eager checkpoint would run a
  * separate materialization job first — 2× the per-round job-submission
  * floor, which dominated this operator's bench cost at fixture scale).
  */
object ConnectedComponents {

  private val MaxRounds = 100

  /** Component assignment for every node that appears in `edges`.
    *
    * @param edges two-column DataFrame of undirected edges (any orientation,
    *              duplicates and self-loops tolerated); node ids must be a
    *              single orderable numeric column type (the component label
    *              is the component's minimum node id).
    * @return DataFrame (node, comp) — one row per distinct node in `edges`.
    */
  def components(edges: DataFrame): DataFrame = {
    val in = edges.toDF("a", "b")
      .select(
        least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

    // (count, xxhash64-xor) edge-set fingerprint: equal fingerprints across
    // a round = converged. One cheap action per round; collision odds ~2^-64.
    // bit_xor (not sum) because ANSI mode faults on long-sum overflow, and
    // xor over a distinct edge set is an order-independent set digest.
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df
        .agg(
          count(lit(1)).as("c"),
          coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)).as("h"))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    // Size the rounds' shuffle partitions from the edge count the
    // convergence fingerprint already measures — the driver-side analog of
    // AQE coalescing, but with an EXACT statistic and no per-stage
    // materialization: ~100k edges per partition, clamped to the session's
    // configured width. A near-dup edge set is orders of magnitude smaller
    // than the corpus (and shrinks every round), so fixed-width rounds
    // would pay full task-scheduling fan-out on near-empty shuffles.
    // Restored in the finally; the session conf is read at plan time of
    // each round's single action inside this loop.
    val spark = edges.sparkSession
    val confKey = "spark.sql.shuffle.partitions"
    val configured = spark.conf.get(confKey).toInt
    def partitionsFor(edgeCount: Long): Int =
      math.max(1, math.min(configured, (edgeCount / 100000L).toInt + 1))

    var cur = in.localCheckpoint(eager = false)
    var prev = fingerprint(cur)
    var round = 0
    var converged = prev._1 == 0L
    try while (!converged && round < MaxRounds) {
      spark.conf.set(confKey, partitionsFor(prev._1).toString)
      // large-star: around each node s, link every larger neighbor d to
      // m = min(neighborhood(s) ∪ {s}) — long chains collapse toward minima.
      val sym = cur.select(col("u").as("s"), col("v").as("d"))
        .union(cur.select(col("v").as("s"), col("u").as("d")))
      val mins = sym.groupBy(col("s")).agg(min(col("d")).as("md"))
        .select(col("s"), least(col("md"), col("s")).as("m"))
      // no distinct here: duplicate edges are harmless to small-star's min
      // aggregation and the round-end distinct dedups — one fewer shuffle
      // per round
      val ls = sym.join(mins, "s")
        .where(col("d") > col("s"))
        .select(least(col("d"), col("m")).as("u"), greatest(col("d"), col("m")).as("v"))
        .where(col("u") =!= col("v"))

      // small-star: for each node v (as the larger endpoint), link all its
      // smaller neighbors and itself to their minimum — stars flatten.
      val mins2 = ls.groupBy(col("v")).agg(min(col("u")).as("m"))
      val ss = ls.join(mins2, "v")
        .select(col("u").as("a"), col("m").as("b"))
        .union(mins2.select(col("v").as("a"), col("m").as("b")))
        .where(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
        .localCheckpoint(eager = false)

      val fp = fingerprint(ss)
      converged = fp == prev
      prev = fp
      cur = ss
      round += 1
    } finally spark.conf.set(confKey, configured.toString)

    // A partially-contracted edge set would silently yield split clusters
    // if read as a star forest — refuse instead. MaxRounds is far above
    // the observed handful of rounds; hitting it means a bug or an input
    // pathologically beyond the algorithm's O(log^2 n) bound.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $MaxRounds rounds")

    // At convergence the edge set is a star forest: every edge is
    // (componentMin, node). Roots label themselves.
    cur.select(col("v").as("node"), col("u").as("comp"))
      .union(cur.select(col("u").as("node"), col("u").as("comp")))
      .groupBy(col("node")).agg(min(col("comp")).as("comp"))
  }
}
