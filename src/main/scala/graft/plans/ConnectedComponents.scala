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
  * Hybrid finish: star contraction only shrinks the edge set, and once the
  * remainder fits a broadcast-sized driver budget (2^20 edges ≈ 16 MB,
  * conf-overridable) a single union-find replaces any number of further
  * rounds — the distributed rounds do the heavy contraction at scale, the
  * scheduling-bound tail finishes locally, exactly as Spark itself
  * driver-collects broadcast-join sides below a byte threshold.
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

  /** Edge count at or below which the remaining graph is solved with a
    * driver-side union-find instead of more distributed rounds. 2^20 edges
    * is ~16 MB of id pairs — the same order as Spark's own
    * autoBroadcastJoinThreshold driver-collect, and far below what one
    * executor core chews through in the time a single round's
    * stage-scheduling costs. The star-contraction rounds only SHRINK the
    * edge set (toward one edge per non-root node), so at 100 TB the
    * distributed rounds do the heavy contraction and the tail — where each
    * round would shuffle kilobytes across 1000 executors — finishes
    * locally. Override with conf `graft.cc.localFinishEdges` (0 disables).
    */
  private val DefaultLocalFinishEdges = 1L << 20

  /** Iterative union-find with path compression; attaching the larger root
    * under the smaller makes every find() return the component minimum —
    * the same label the distributed star forest converges to.
    */
  private def localFinish(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val dt = df.schema("u").dataType
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = x
      while (parent.getOrDefault(c, c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    val nodes = new java.util.TreeSet[java.lang.Long]()
    df.collect().foreach { row =>
      val a = row.get(0).asInstanceOf[Number].longValue()
      val b = row.get(1).asInstanceOf[Number].longValue()
      nodes.add(a); nodes.add(b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](nodes.size)
    val it = nodes.iterator()
    while (it.hasNext) {
      val n: Long = it.next()
      val c = find(n)
      out.add(dt match {
        case org.apache.spark.sql.types.IntegerType =>
          org.apache.spark.sql.Row(n.toInt, c.toInt)
        case _ => org.apache.spark.sql.Row(n, c)
      })
    }
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", dt, nullable = false),
      org.apache.spark.sql.types.StructField("comp", dt, nullable = false))))
  }

  /** Component assignment for every node that appears in `edges`.
    *
    * @param edges two-column DataFrame of undirected edges (any orientation,
    *              duplicates and self-loops tolerated); node ids must be a
    *              single orderable numeric column type (the component label
    *              is the component's minimum node id).
    * @return DataFrame (node, comp) — one row per distinct node in `edges`.
    */
  def components(edges: DataFrame): DataFrame = {
    // Conf-isolated loop session: the rounds size their shuffles from the
    // live edge count, which means setting spark.sql.shuffle.partitions
    // per round. Doing that on the CALLER's session is a race (concurrent
    // queries get planned with the loop's narrow widths, and two
    // overlapping components() calls can permanently clobber each other's
    // restore) — so the loop runs in newSession(): same SparkContext,
    // shared cache/catalog, separate SQLConf. The caller's runtime width
    // is copied in as the clamp; the clone is discarded at return.
    val caller = edges.sparkSession
    val loopSession = caller.newSession()
    // newSession() starts from the STATIC (builder/SparkContext) conf — a
    // caller's runtime spark.conf.set does not carry over. Copy every conf
    // this loop reads, or runtime overrides are silently ignored (the
    // localFinishEdges escape hatch and the tests that force distributed
    // rounds both depend on it).
    loopSession.conf.set(
      "spark.sql.shuffle.partitions", caller.conf.get("spark.sql.shuffle.partitions"))
    loopSession.conf.set(
      "graft.cc.localFinishEdges",
      caller.conf.get("graft.cc.localFinishEdges", DefaultLocalFinishEdges.toString))
    val result = componentsLoop(
      org.apache.spark.sql.graftbridge.ofRows(loopSession, edges.queryExecution.analyzed))
    // re-bind the (materialized) component table to the caller's session so
    // downstream plans compose under the caller's own configuration
    org.apache.spark.sql.graftbridge.ofRows(caller, result.queryExecution.analyzed)
  }

  private def componentsLoop(edges: DataFrame): DataFrame = {
    // Checkpointed (lazily — the loop's first fingerprint action
    // materializes it): BOTH derivations below consume this plan, and
    // `allNodes` is consumed again at RESULT time (withSingletons), after
    // the loop. An unmaterialized lineage would re-execute the caller's
    // entire upstream edge-generation query (the expensive band join) a
    // second time there — and under a non-deterministic upstream could
    // even disagree with the node set the loop contracted, dropping nodes
    // or mislabeling them as singletons.
    val raw = edges.toDF("a", "b")
      .select(
        least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .localCheckpoint(eager = false)
    // every distinct node in the INPUT — captured before self-loops are
    // dropped, so a node appearing only as (x, x) still gets its
    // singleton (x, x) row in the output, as the contract promises
    val allNodes = raw
      .select(explode(array(col("u"), col("v"))).as("node"))
      .distinct()
    val in = raw
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
    // min in LONG before the one narrowing: (edgeCount/100000).toInt wraps
    // negative above ~2.1e14 edges, and max(1, min(configured, negative))
    // would funnel exactly the hugest graphs through ONE shuffle partition
    def partitionsFor(edgeCount: Long): Int =
      math.max(1L, math.min(configured.toLong, edgeCount / 100000L + 1L)).toInt

    val dt = in.schema("u").dataType
    val integral = dt == org.apache.spark.sql.types.LongType ||
      dt == org.apache.spark.sql.types.IntegerType
    val localMax =
      if (!integral) 0L
      else spark.conf.get("graft.cc.localFinishEdges", DefaultLocalFinishEdges.toString).toLong

    var cur = in.localCheckpoint(eager = false)
    var prev = fingerprint(cur)
    if (prev._1 > 0L && prev._1 <= localMax) return withSingletons(allNodes, localFinish(cur))
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
      // rounds only shrink the edge set and every round preserves the node
      // set and its components — once the remainder fits the local budget,
      // one union-find beats any number of further distributed rounds
      if (!converged && fp._1 > 0L && fp._1 <= localMax) return withSingletons(allNodes, localFinish(ss))
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
    val assigned = cur.select(col("v").as("node"), col("u").as("comp"))
      .union(cur.select(col("u").as("node"), col("u").as("comp")))
      .groupBy(col("node")).agg(min(col("comp")).as("comp"))
    withSingletons(allNodes, assigned)
  }

  /** Close the output over the full input node set: nodes whose only edges
    * were self-loops never enter the contraction and label themselves.
    */
  private def withSingletons(allNodes: DataFrame, assigned: DataFrame): DataFrame =
    allNodes.join(assigned, Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
}
