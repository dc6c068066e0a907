package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication primitives for the training-data pipeline layer
  * (SURVEY §7.4 H-8). All hashing is md5-based so every operator is
  * engine-portable and each dedup query has an exact DuckDB oracle:
  * DuckDB computes the same 32-bit value via
  * `('0x' || substr(md5(x),1,8))::BIGINT`.
  *
  * Shape: the signature computations are expressed as EXPLODE + grouped
  * aggregates (one row per shingle, codegen'd hash-agg back to one row
  * per doc), NOT as nested array lambdas — higher-order functions are
  * CodegenFallback in Spark and re-evaluate the hash per enclosing
  * aggregate (measured 40-80× slower at sf0.1). The explode shape is
  * also the scale shape: partial aggregation combines map-side, and the
  * only shuffle key is doc_id.
  *
  * Candidate-pair generation is always a bucket join — MinHash bands or
  * SimHash bytes — never an all-pairs product, so the quadratic compare
  * only runs inside hash buckets.
  */
object DedupFunctions {

  /** Portable 32-bit hash in a long: first 8 hex chars of md5. */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Portable 64-bit hash: the first 16 hex chars of md5 as two 32-bit
    * words recombined by shift+or (bitwise, so ANSI overflow checking
    * never fires even when bit 63 is set; a single conv of 16 chars
    * would null out above Long.MaxValue). */
  def hash64(c: Column): Column = {
    val hx = md5(c.cast("binary"))
    shiftleft(conv(substring(hx, 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(hx, 9, 8), 16, 10).cast("long"))
  }

  /** One row per (id, k-token shingle), NOT deduplicated — built with
    * split → posexplode → window-lead, which stays entirely inside
    * whole-stage codegen. The array-lambda equivalent
    * (`transform(tokens, i -> concat_ws(slice(...)))`) is interpreted and
    * dominated q47-q49 runtime (~5 ms/doc at 100 tokens). The window
    * shuffles on the id — uniform, unbounded key space, scale-safe.
    * Same tokenization contract as TextFunctions.tokens / the oracles:
    * trim, split on whitespace runs, shingle = k tokens joined by ' '. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"shingle size must be >= 2 (got $k); use tokens for 1-grams")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val leads = (1 until k).map(i => lead(col("tok"), i).over(w))
    docs.select(col(idCol), posexplode(split(trim(col(textCol)), "\\s+")))
      .toDF(idCol, "pos", "tok")
      .withColumn("last_tok", leads.last)
      .withColumn("s", concat_ws(" ", col("tok") +: leads: _*))
      .where(col("last_tok").isNotNull)
      .select(col(idCol), col("s"))
  }

  /** Modulus for the Kirsch-Mitzenmacher minhash family: 2³¹−1 (prime). */
  val MINHASH_P = 2147483647L

  /** Per-shingle-row base hashes for the KM minhash family, aliased
    * __h1/__h2. Materialized as COLUMNS before the aggregate on purpose:
    * inlining them into every min() child would re-run both md5s once per
    * hash function per row. With them, n hash functions cost 2 md5s per
    * shingle total — at production nh=128 that is 64× less hashing than
    * the one-md5-per-function scheme this replaced. */
  def minhashHashCols(shingle: Column): Seq[Column] = Seq(
    hash32(concat(lit("a:"), shingle)).as("__h1"),
    hash32(concat(lit("b:"), shingle)).as("__h2"))

  /** MinHash aggregate columns over rows carrying [[minhashHashCols]]:
    * hash function i is gᵢ = (h1 + i·h2) mod P (Kirsch–Mitzenmacher:
    * two independent base hashes extend to any family size with pairwise
    * guarantees minhash needs). h1,h2 < 2³², i ≤ few hundred — the sum
    * stays far below 2⁶³, so ANSI arithmetic never overflows. Aliased
    * mh0..mh{n-1}, LongType. */
  def minhashAggs(n: Int): Seq[Column] =
    (0 until n).map(i =>
      min((col("__h1") + lit(i.toLong) * col("__h2")) % MINHASH_P).as(s"mh$i"))

  /** LSH band keys from the mh0..mh{b*r-1} minhash columns: b bands of r
    * rows, each band hashed to one value. Documents sharing ANY band key
    * become candidate pairs (band match probability = jaccard^r). */
  def lshBandCols(b: Int, r: Int): Seq[Column] =
    (0 until b).map(j =>
      md5(concat_ws("|",
        (0 until r).map(i => col(s"mh${j * r + i}").cast("string")): _*)
        .cast("binary")))

  // Packed-vote lane layout: per-bit ONE-counts accumulate in LANE-bit
  // lanes, LANES_PER_AGG lanes per long sum. Top lane peaks at
  // (2^20-1) << 40 < 2^61, so the sum accumulator can never overflow;
  // a lane itself saturates only past 2^20-1 = ~1M DISTINCT shingles in
  // one document (simhashes dedups shingles first) — far beyond any
  // non-pathological doc, and callers feeding longer ones must chunk.
  private val LANE = 20
  private val LANES_PER_AGG = 3
  private def laneGroups(bits: Int): Int =
    (bits + LANES_PER_AGG - 1) / LANES_PER_AGG

  /** SimHash vote aggregates over an exploded hash column, packed: agg
    * `pv{g}` accumulates the ONE-counts of bits [3g, 3g+3) in 20-bit
    * lanes, `pn` counts group rows. One third the agg buffers (and
    * shuffle bytes) of the naive per-bit ±1 sum; bit b's majority vote is
    * recovered in [[simhashFromVotes]] as 2·cnt_b > n — identical to
    * sum(±1) > 0, so the resulting simhash is bit-for-bit unchanged.
    * 32 bits (hash32) is the fixture/oracle width; 64 (hash64) is the
    * production width — 32-bit simhash saturates with bucket collisions
    * at billions of docs. */
  def simhashVoteAggs(h: Column, bits: Int = 32): Seq[Column] =
    (0 until laneGroups(bits)).map { g =>
      val lanes = math.min(LANES_PER_AGG, bits - g * LANES_PER_AGG)
      val perRow = (0 until lanes).map { i =>
        shiftleft(shiftright(h, g * LANES_PER_AGG + i).bitwiseAND(1L), LANE * i)
      }.reduce(_ + _)
      sum(perRow).as(s"pv$g")
    } :+ count(lit(1)).as("pn")

  /** Assemble the simhash from the packed pv0..pv{G-1} + pn vote columns:
    * bit b is set when its ONE-count lane holds a strict majority.
    * Bitwise-or of disjoint masks — safe for bit 63 where addition would
    * wrap (and trip ANSI checks). A doc at or past the lane capacity
    * fails LOUDLY (raise_error) rather than emitting a silently-corrupt
    * simhash from an overflowed lane. */
  def simhashFromVotes(bits: Int = 32): Column = {
    val sim = (0 until bits).map { b =>
      val cnt = shiftright(col(s"pv${b / LANES_PER_AGG}"),
        LANE * (b % LANES_PER_AGG)).bitwiseAND((1L << LANE) - 1)
      when(cnt * 2 > col("pn"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    when(col("pn") >= (1L << LANE), raise_error(concat(
      lit("simhash vote lane overflow: "), col("pn").cast("string"),
      lit(s" distinct shingles in one doc (max ${(1L << LANE) - 1}); chunk it"))))
      .otherwise(sim)
  }

  /** SimHash LSH bucket key: byte j (0 until bits/8) of the simhash. Near
    * docs (Hamming ≤ 6) share at least one unchanged byte far more often
    * than chance; wider hashes get more bands, raising recall. */
  def simhashBand(sim: Column, j: Int): Column =
    shiftright(sim, 8 * j).bitwiseAND(255L)

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")
}
