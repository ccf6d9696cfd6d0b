package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2E near-duplicate detection: MinHash + banded LSH candidate generation,
  * exact-Jaccard verification. Never all-pairs.
  *
  * Pipeline (all deterministic — fixed hash seeds, no RNG):
  *   1. tokens → distinct 3-word shingles per doc, shingle → 64-bit hash
  *   2. per doc: 128 MinHash values computed with higher-order array
  *      functions (one groupBy shuffle; the 128 permutations are a codegen'd
  *      transform over the in-row hash set — no 128× row explosion)
  *   3. signature split into 64 bands × 2 rows; docs sharing a band bucket
  *      become candidate pairs (equi-join on (band, bandHash) — at 100 TB
  *      this is THE trick: the join key space is huge, buckets are tiny)
  *   4. candidates verified with exact Jaccard over the shingle-hash sets
  *      (array_intersect on two ~100-element arrays), threshold 0.6.
  *
  * With r=2, b=64 the probability a true pair at J >= 0.6 misses candidacy is
  * (1 - 0.36)^64 ≈ 4e-13 — effectively exact, which is why the exact-Jaccard
  * DuckDB oracle matches. False positives from banding/hash collisions are
  * removed by step 4.
  */
object DedupOps {

  private val NumHashes = 128
  private val Bands = 64 // rows per band r = 2
  private val MersennePrime = 2147483647L // 2^31 - 1
  val JaccardThreshold = 0.6

  /** Distinct (doc_id, shingle-hash) pairs; docs with < 3 tokens excluded. */
  private def shingleHashes(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 3)
      .select(
        col("doc_id"),
        explode(
          expr("transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))")
        ).as("shingle")
      )
      .select(col("doc_id"), pmod(xxhash64(col("shingle")), lit(MersennePrime)).as("x"))
      .distinct()

  /** Candidate pairs (i < j) that share at least one LSH band bucket.
    *
    * The 128-value MinHash signature is computed by a custom typed
    * Aggregator (graft.functions.MinHashAggregator): a tight primitive-array
    * loop with map-side partial aggregation — the shuffle carries one 1 KB
    * signature per doc. (Both alternatives measured slower/heavier: a nested
    * transform/array_min higher-order expression runs interpreted with
    * per-element boxing; exploding the permutation index multiplies the
    * shuffled rows 128×.)
    *
    * Pairs are then generated bucket-locally: group by (band, bandHash),
    * collect the tiny doc list per bucket, explode its 2-combinations — no
    * self-join, so nothing upstream is computed twice. Bucket lists are
    * bounded (many docs in one bucket means they are all near-identical), so
    * the quadratic step never sees more than a handful of elements.
    */
  private def candidates(shingles: DataFrame): DataFrame = {
    val minhashSig = udaf(new graft.functions.MinHashAggregator(NumHashes, MersennePrime))
    shingles
      .groupBy(col("doc_id"))
      .agg(minhashSig(col("x")).as("sig"))
      .select(
        col("doc_id"),
        explode(
          expr(s"transform(sequence(0, ${Bands - 1}), b -> struct(b AS band, hash(sig[2*b], sig[2*b+1]) AS bh))")
        ).as("bb")
      )
      .groupBy(col("bb.band"), col("bb.bh"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1), a ->
          |  transform(slice(ids, a + 1, size(ids) - a), b -> struct(ids[a-1] AS i, b AS j))))""".stripMargin
      )).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
      .distinct()
  }

  /** Near-dup pairs with exact Jaccard >= 0.6, candidate-generated via
    * MinHash banding. The shingle sets are cached: they feed both the
    * signature pipeline and the two verification joins (at cluster scale
    * this would be a persisted intermediate, same idea).
    */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val shingles = shingleHashes(s, dir).cache()
    val sets = shingles
      .groupBy(col("doc_id"))
      .agg(collect_set(col("x")).as("xs"))
    val cand = candidates(shingles)
    cand
      .join(sets.select(col("doc_id").as("i"), col("xs").as("xs_i")), "i")
      .join(sets.select(col("doc_id").as("j"), col("xs").as("xs_j")), "j")
      .withColumn("inter", size(array_intersect(col("xs_i"), col("xs_j"))).cast("long"))
      .withColumn("na", size(col("xs_i")).cast("long"))
      .withColumn("nb", size(col("xs_j")).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("i"), col("j"), col("inter"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("i"), col("j"))
  }

  private val SimBits = 60  // 15 hex chars of md5 — portable to the oracle
  private val SimBands = 4  // 4 bands × 15 bits: pigeonhole-exact for hd <= 3
  val SimHammingMax = 3

  /** SimHash near-dup detection. 60-bit signature from distinct-token md5
    * hashes (md5 is the one hash both engines compute identically, so the
    * oracle can rebuild the exact signature). Candidate pairs via 4×15-bit
    * bands: any pair within hamming distance 3 shares >= 1 exact band
    * (pigeonhole), so banding is lossless here — not probabilistic like
    * MinHash — and the all-pairs oracle matches exactly.
    *
    * The per-bit sign-sums are 60 plain sum(CASE) aggregates — one codegen'd
    * hash aggregate pass, map-side partial, no arrays and no explosion.
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .distinct()
      .withColumn("h", expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)"))
    val bitSums = (0 until SimBits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b"))
    val simCol = (0 until SimBits)
      .map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val sims = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), simCol.as("sim"))
      .cache()
    val bandStructs = (0 until SimBands)
      .map(i => s"struct($i AS band, shiftright(sim, ${15 * i}) & 32767 AS bv)")
      .mkString("array(", ", ", ")")
    val cand = sims
      .select(col("doc_id"), explode(expr(bandStructs)).as("bb"))
      .groupBy(col("bb.band"), col("bb.bv"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1), a ->
          |  transform(slice(ids, a + 1, size(ids) - a), b -> struct(ids[a-1] AS i, b AS j))))""".stripMargin
      )).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
      .distinct()
    cand
      .join(sims.select(col("doc_id").as("i"), col("sim").as("sim_i")), "i")
      .join(sims.select(col("doc_id").as("j"), col("sim").as("sim_j")), "j")
      .withColumn("hamming", bit_count(col("sim_i").bitwiseXOR(col("sim_j"))))
      .filter(col("hamming") <= SimHammingMax)
      .select(col("i"), col("j"), col("hamming"))
      .orderBy(col("i"), col("j"))
  }

  private val simhashOracle: String = {
    val terms = (0 until SimBits)
      .map(b => s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(", ")
    val simExpr = (0 until SimBits)
      .map(b => s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH t AS (SELECT DISTINCT doc_id, tok FROM (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents)),
       |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM t),
       |s AS (SELECT doc_id, $terms FROM h GROUP BY doc_id),
       |m AS (SELECT doc_id, $simExpr AS sim FROM s)
       |SELECT a.doc_id AS i, b.doc_id AS j,
       |       CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
       |FROM m a JOIN m b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= $SimHammingMax
       |ORDER BY i, j""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_dedup_simhash" -> simhashOracle,
    "q_dedup_minhash" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 3),
        |idx AS (
        |  SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM d),
        |shingles AS (
        |  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
        |  FROM idx),
        |sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
        |  FROM shingles a JOIN shingles b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.i, p.j, p.inter,
        |       round(CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter), 4) AS jaccard
        |FROM pairs p
        |JOIN sizes sa ON sa.doc_id = p.i
        |JOIN sizes sb ON sb.doc_id = p.j
        |WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.6
        |ORDER BY i, j""".stripMargin
  )
}
