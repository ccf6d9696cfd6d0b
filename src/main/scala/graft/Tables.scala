package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers for the driver-generated test data (TESTDATA.md).
  *
  * At 100 TB these reads become partitioned scans; every op in `graft.ops`
  * only ever applies column pruning + pushed filters on top of these, so the
  * physical scan stays minimal (verify with `.explain("formatted")` —
  * `PushedFilters` / `ReadSchema`).
  */
object Tables {

  // Memoized parquet SCHEMAS per path (global and session-free): the
  // fixtures are immutable, and re-running spark.read.parquet per query
  // re-infers the footer schema on every call; supplying the cached schema
  // skips that I/O. Only the StructType is cached — an earlier version
  // cached whole DataFrames in a WeakHashMap keyed by session, but a
  // DataFrame strongly references its session through its QueryExecution,
  // which is exactly the value->key self-reference the WeakHashMap javadoc
  // warns defeats collection: every stopped session would have leaked for
  // the JVM's lifetime. A StructType references nothing.
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  // Whole-DataFrame memoization, OPT-IN via spark.graft.fixtureCache: a
  // DataFrame strongly references its session (the WeakHashMap-defeating
  // self-reference documented above), so an always-on cache would leak
  // every stopped session for the JVM's lifetime. Bench and Verify enable
  // it: they own exactly one session, their JVM exits with it, and across
  // a 68-query suite the per-call file-listing + relation re-analysis is
  // pure floor. Library/production sessions leave it off and pay one
  // cheap re-read per call. Keyed on the session OBJECT + path so two
  // sessions never share plans — an identityHashCode key could collide
  // between a stopped and a live session and hand out a DataFrame pinned
  // to the dead one; the strong session reference adds no leak the cached
  // DataFrame's own QueryExecution->session reference doesn't already
  // carry.
  private val dfCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** The opt-in memoization in one place — fixture tables (load) and the
    * materialized MV (MaterializedViews.minuteMvDf) share the flag, the
    * (session, path) keying, and the leak reasoning above; two parallel
    * caches drifted once already.
    */
  private[graft] def memoizedDf(spark: SparkSession, path: String)(
      read: => DataFrame): DataFrame =
    if (spark.conf.getOption("spark.graft.fixtureCache").contains("true"))
      dfCache.getOrElseUpdate((spark, path), read)
    else read

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver's fixtures carry TIMESTAMP(NANOS) columns, which Spark 4
    // rejects outright; read them as long nanos and convert below. Set once
    // per session — mutating conf on every call invalidates cached plans.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
    val path = s"$dir/$name.parquet"
    memoizedDf(spark, path) {
      val schema = schemaCache.getOrElseUpdate(path, spark.read.parquet(path).schema)
      spark.read.schema(schema).parquet(path)
    }
  }

  /** The time-series fact table. Stand-in for the reference's `opcua_data`
    * EAV hypertable (/root/reference/database/init.sql:2-8): metric :=
    * event_type, time := ts, value_num := value, entity := user_id.
    *
    * `ts` arrives as nano-epoch long (see load); truncate to microseconds
    * with integer `div` — the same truncation DuckDB applies reading the
    * file, so oracle timestamps agree. A double-division here would lose
    * precision (2^53 < nano-epoch range) — keep it integral.
    */
  /** Fan a compute-heavy per-row stage out across every core when the scan
    * behind it cannot. Parquet split parallelism is row-group-granular: a
    * table whose planning-time size is below (cores × row-group bytes) may
    * scan as a handful of populated tasks — the driver fixtures are single
    * row groups, i.e. ONE task — and any expensive projection behind it
    * (minhash signatures, per-token md5, JSON round-trips) then runs
    * serially no matter how many cores the session has. The round-robin
    * rebalance this inserts costs one shuffle hop bounded by the same
    * statistic that gates it (< cores × 128 MB — less than one shuffle
    * wave), while the hashing it spreads costs orders of magnitude more
    * CPU per byte. A production-scale table exceeds the bound and keeps
    * its scan partitioning untouched — the same planning-time
    * size-statistic decision Spark's own autoBroadcastJoinThreshold makes
    * at join sites. (AQE's REBALANCE hint expresses the same intent but
    * only acts under AQE; this works in any session.)
    */
  def fanOut(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val rowGroupBytes = 128L << 20
    val size = planningSize(df)
    if (size < BigInt(cores) * rowGroupBytes) df.repartition(cores) else df
  }

  /** Planning-time size estimate off the ANALYZED plan. Dataset
    * construction has already run the analyzer, so this is a cached-plan
    * stats visit — using `optimizedPlan.stats` here cost one EXTRA full
    * optimizer run per call whose output was then discarded (the final
    * plan re-optimizes from scratch), a measurable slice of the per-query
    * floor across a 68-query suite. The size-only stats visitor yields
    * the same relation-size × projection-width estimate on both plans —
    * basic (non-CBO) stats don't apply filter selectivity either way, so
    * the fanOut/resultOrder threshold decisions are unchanged.
    */
  private[graft] def planningSize(df: DataFrame): BigInt =
    df.queryExecution.analyzed.stats.sizeInBytes

  /** Broadcast hint gated on the planning-time size estimate — for the
    * small aggregate side of an enrichment join (per-day carries, rank
    * offsets, per-metric bounds/stats). An UNCONDITIONAL hint is the
    * template bug the LLM-pipeline ops must not inherit: forced onto a
    * years×millions-of-keys offset table it OOMs the driver. Below the
    * bound the hint is provably safe (the estimate is an upper bound —
    * basic stats scale an aggregate's size from its CHILD, never below);
    * above it the hint is dropped and the planner decides: statically a
    * sort-merge join, and in AQE sessions (production — GraftSession) a
    * runtime broadcast conversion if the aggregate's ACTUAL shuffle size
    * turns out small. The bound is deliberately larger than Spark's
    * 10 MB autoBroadcastJoinThreshold because these callers KNOW the
    * true post-aggregate cardinality is key-bounded (days×metrics,
    * bins×metrics) — the estimate's corpus-proportionality, not the real
    * size, is what grows with SF.
    */
  def broadcastIfSmall(df: DataFrame, maxBytes: Long = 256L << 20): DataFrame =
    if (planningSize(df) <= maxBytes) org.apache.spark.sql.functions.broadcast(df)
    else df

  /** Total-order presentation of a result set. Dashboard/report queries
    * end in ORDER BY; Spark's global range sort runs a separate sampling
    * job to pick partition bounds, which for a small result costs more
    * than the sort itself (measured: 0.21 s -> 0.11 s on a fixture-scale
    * filter+sort). Below a planning-time size bound the sort runs in a
    * single reducer — one exchange, no sampling pass; above it, the
    * parallel range sort stays, because a large ordered export genuinely
    * needs range partitioning. Top-k paths (orderBy+limit →
    * TakeOrderedAndProject) must NOT use this — they already avoid the
    * global sort entirely.
    */
  implicit class ResultOrdering(private val df: DataFrame) extends AnyVal {
    def resultOrder(cols: org.apache.spark.sql.Column*): DataFrame = {
      val singleReducerMax = 64L << 20
      val size = planningSize(df)
      if (size < singleReducerMax) df.repartition(1).sortWithinPartitions(cols: _*)
      else {
        // Large ordered export: keep the parallel range sort, but
        // localCheckpoint first when the producing plan is EXPENSIVE TO
        // RECOMPUTE — RangePartitioning runs a SAMPLING job over its child
        // to pick bounds, so an un-materialized result pays its whole
        // producing plan TWICE (guide §2.4 — the same accidental second
        // full pass the r17 gap-fill fix removed; join-size estimates are
        // pessimistic products, so every join-bearing query lands in this
        // branch). "Expensive" = the plan reduces or expands cardinality
        // (Aggregate / Window / Generate): there the chain costs far more
        // than storing its (smaller) result once — measured at sf3:
        // q_dedup_apply 12.5 → 10.4 s, q_sessionize 3.5 → 3.2 s,
        // q_tfidf 3.1 → 2.8 s, same binary, checkpoint off vs on. A flat
        // scan→project/join export (snk_jdbc, q_enrich_join) re-executes
        // as one extra streaming pass, CHEAPER than a result-sized disk
        // round-trip — those keep the plain range sort (measured: the
        // checkpoint cost them 5-10%). Lazy: the sampling pass is the
        // first action and materializes the blocks the sort shuffle then
        // re-reads. The conf escape hatch exists ONLY so plan-shape specs
        // and dumps can show the producing plan the checkpoint hides
        // behind an RDD scan (the minhashDocsPlan convention at the one
        // chokepoint every query shares); bench/verify/production
        // sessions never set it.
        import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Window => LWindow}
        val heavy = df.queryExecution.analyzed.collectFirst {
          case _: Aggregate => (); case _: LWindow => (); case _: Generate => ()
        }.isDefined
        val ckptOff = df.sparkSession.conf
          .getOption("spark.graft.resultOrderCheckpoint").contains("false")
        val base =
          if (heavy && !ckptOff) df.localCheckpoint(eager = false) else df
        base.orderBy(cols: _*)
      }
    }
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      // TIMESTAMP(NANOS) fixtures read as long via nanosAsLong
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) fixtures read as
      // TIMESTAMP_NTZ; normalize to the instant type the nanos path
      // produced (sessions run UTC, so the values are identical) — the
      // engine's time-weight/envelope paths use unix_micros, which Spark 4
      // rejects on NTZ input
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
}
