package graft

import graft.core.Tables
import org.apache.spark.sql.functions.lit

/** Library-quality gate: EVERY query must run (not necessarily return
  * rows) against structurally-identical but EMPTY tables — the
  * first-day-of-a-new-tenant / fully-filtered-partition case a 100 TB
  * deployment hits constantly. Catches driver-side `.head` on empty
  * aggregates, divisions that only work with rows present, and
  * collect-based loop seeds that assume data. Queries that legitimately
  * REQUIRE non-empty input (trainer-style seeds) must throw a
  * deliberate, descriptive error, not an opaque NPE/NoSuchElement. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Tables.all.foreach { t =>
      Tables.load(spark, sfDir, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query runs on empty tables (rows optional, crashes not)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, emptyDir).count(); None }
      catch {
        // a deliberate, descriptive guard is acceptable for trainer-style
        // queries; opaque runtime crashes are not
        case e: IllegalArgumentException => None
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    assert(failures.isEmpty, s"${failures.size} queries crash on empty input:\n" +
      failures.mkString("\n"))
  }
}
