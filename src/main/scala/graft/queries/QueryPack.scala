package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One family of oracle-checked queries. `queries` maps a stable name to a
  * (session, sfDir) => DataFrame; `oracle` maps the same name to ANSI SQL
  * DuckDB runs over the same parquet tables. Column aliases MUST match
  * between the two — the driver sorts columns by name before hashing.
  *
  * Determinism rules every pack follows:
  *   - every query ends in a total ORDER BY (same in both engines);
  *   - every floating aggregate is round()ed identically on both sides;
  *   - DuckDB integer sums are cast to BIGINT (DuckDB widens to HUGEINT);
  *   - no raw timestamps in output (cast to DATE/BIGINT/STRING identically).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]

  /** The ONE per-corpus artifact-dir convention for queries that
    * persist state (suffix index, vocabulary model, curved writes,
    * backfill stores): a fixed prefix + the sanitized sf dir under the
    * JVM tmpdir — one dir per corpus, so a driver-regenerated corpus
    * keys a different-or-revalidated artifact, and the keying logic
    * lives in exactly one place (the round-10 review found four
    * divergent copies). */
  protected def tmpArtifactDir(prefix: String, sfDir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      prefix + "_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")).toString
}
