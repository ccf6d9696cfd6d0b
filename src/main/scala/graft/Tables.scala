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

  // Memoized base relations per (session, dir, name): the fixtures are
  // immutable, and re-running spark.read.parquet per query re-reads the
  // footer schema and rebuilds the relation every time — the catalog-table
  // resolution a deployment gets for free. (The cached DataFrames reference
  // their session, so entries live for the session object's lifetime —
  // bounded by the handful of sessions a JVM creates, a few relations each.)
  private val relCache =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame]]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver's fixtures carry TIMESTAMP(NANOS) columns, which Spark 4
    // rejects outright; read them as long nanos and convert below. Set once
    // per session — mutating conf on every call invalidates cached plans.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
    val perSession = relCache.synchronized {
      var m = relCache.get(spark)
      if (m == null) { m = scala.collection.concurrent.TrieMap.empty; relCache.put(spark, m) }
      m
    }
    perSession.getOrElseUpdate(s"$dir/$name", spark.read.parquet(s"$dir/$name.parquet"))
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
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
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
