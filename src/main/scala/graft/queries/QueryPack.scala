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
}
