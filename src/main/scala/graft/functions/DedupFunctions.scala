package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deduplication primitives for the training-data pipeline layer
  * (SURVEY §7.4 H-8). All hashing is md5-based so every operator is
  * engine-portable and each dedup query has an exact DuckDB oracle:
  * DuckDB computes the same 32-bit value via
  * `('0x' || substr(md5(x),1,8))::BIGINT`.
  *
  * Everything here is a pure Column expression (codegen'd, no UDFs), and
  * every candidate-pair generator is a bucket join — MinHash bands or
  * SimHash bytes — never an all-pairs product, so the same plan holds at
  * 100 TB: the quadratic step only runs inside hash buckets.
  */
object DedupFunctions {

  /** Portable 32-bit hash in a long: first 8 hex chars of md5. */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** MinHash signature: for hash function h in [0,n), the minimum over the
    * shingle set of md5("h:" + shingle). Min is taken on the hex string
    * (lexicographic), which any engine with md5 reproduces exactly. */
  def minhashSignature(shingleSet: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)), h =>
      array_min(transform(shingleSet, s =>
        md5(concat(h.cast("string"), lit(":"), s).cast("binary")))))

  /** LSH band keys: b bands of r signature rows, each band hashed to one
    * value. Documents sharing ANY band key become candidate pairs — the
    * band-bucket join replaces the O(n²) all-pairs compare at scale
    * (probability of a band match is jaccard^r per band). */
  def lshBands(sig: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)), j =>
      md5(concat_ws("|", slice(sig, j * r + 1, lit(r))).cast("binary")))

  /** 32-bit SimHash over the distinct token set: bit b is 1 when the
    * +1/-1 vote of bit b across all token hashes is positive. Near-dup
    * documents land at small Hamming distance. */
  def simhash32(tokens: Column): Column = {
    val hs = transform(array_distinct(tokens), t => hash32(t))
    (0 until 32).map { b =>
      val vote = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** SimHash LSH bucket key: byte j (0..3) of the 32-bit simhash. Two docs
    * within Hamming distance 6 of each other share at least one unchanged
    * byte far more often than chance, so byte-bucket joining is the
    * standard SimHash candidate generator. */
  def simhashBand(sim: Column, j: Int): Column =
    shiftright(sim, 8 * j).bitwiseAND(255L)

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")
}
