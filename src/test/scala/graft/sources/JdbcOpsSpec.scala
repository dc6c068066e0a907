package graft.sources

import graft.SparkSpec

/** JDBC source/sink round trips (S4/S5/K1) against embedded Derby — the
  * in-process database shipped with Spark's own jars, standing in for
  * the reference's MySQL (`utils/DBUtils.scala:56-109`,
  * `utils/MultilistUtils.scala:27-47`). Connector code is identical for
  * any JDBC provider; only the shard-listing catalog query differs. */
class JdbcOpsSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def exec(sql: String*): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try sql.foreach { q =>
      val st = c.createStatement()
      try st.execute(q) finally st.close()
    } finally c.close()
  }

  test("K1: writeJdbc round-trips a report table with bounded fan-out") {
    import spark.implicits._
    val df = Seq((1L, "click", 10.0), (2L, "view", 20.5)).toDF("id", "kind", "v")
    IoOps.writeJdbc(df, url, "t_report", props, connections = 2)
    // writeJdbc creates the table with quoted (case-exact) column names,
    // so an unquoted projection would resolve to Derby's uppercase form
    val back = IoOps.jdbcDim(spark, url, "SELECT * FROM t_report", props)
      .select("id", "kind", "v")
      .as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "click", 10.0), (2L, "view", 20.5)))
  }

  test("S4: jdbcDim pushes the subquery down to the database") {
    import spark.implicits._
    exec("CREATE TABLE t_dim (id BIGINT, name VARCHAR(20), region INT)",
      "INSERT INTO t_dim VALUES (1, 'ch1', 1), (2, 'ch2', 1), (3, 'ch3', 2)")
    // the dim database evaluates filter + projection; Spark sees 2 rows
    val dim = IoOps.jdbcDim(spark, url,
      "SELECT id, name FROM t_dim WHERE region = 1", props)
    assert(dim.as[(Long, String)].collect().toSet == Set((1L, "ch1"), (2L, "ch2")))
    assert(dim.columns.toSeq == Seq("ID", "NAME"))
  }

  test("S5: shardedJdbcUnion combines catalog-listed shards without a shuffle") {
    import spark.implicits._
    exec("CREATE TABLE ev_shard_1 (user_id BIGINT, n BIGINT)",
      "CREATE TABLE ev_shard_2 (user_id BIGINT, n BIGINT)",
      "INSERT INTO ev_shard_1 VALUES (1, 10), (2, 20)",
      "INSERT INTO ev_shard_2 VALUES (3, 30)")
    val union = IoOps.shardedJdbcUnion(spark, url,
      "SELECT tablename FROM sys.systables WHERE tablename LIKE 'EV_SHARD_%'",
      props)
    assert(union.as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
    val plan = union.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shard union must not shuffle:\n$plan")
  }

  test("mysqlShardListQuery rejects identifiers that could escape the literal") {
    intercept[IllegalArgumentException] {
      IoOps.mysqlShardListQuery("bad'schema", "t_.*")
    }
    intercept[IllegalArgumentException] {
      IoOps.mysqlShardListQuery("homed", "t_%'; DROP TABLE x --")
    }
  }

  test("O4: writeClustered sorts rows inside each day partition file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_clustered").toString + "/facts"
    val rows = scala.util.Random.shuffle(
      (1L to 200L).map(i => (i, s"u${i % 7}", if (i % 2 == 0) "20240101" else "20240102")))
    IoOps.writeClustered(rows.toDF("id", "v", "day"), dir, "day", Seq("id"))
    // each partition lands as one task's file(s); reading one file back
    // preserves its row order, which must be the cluster order
    import org.apache.spark.sql.functions.input_file_name
    val perFile = spark.read.parquet(dir)
      .select(input_file_name().as("f"), $"id")
      .collect().groupBy(_.getString(0)).values
    assert(perFile.nonEmpty)
    perFile.foreach { rs =>
      val ids = rs.map(_.getLong(1)).toSeq
      assert(ids == ids.sorted, s"file not clustered by id: ${ids.take(10)}")
    }
  }

  test("UpsertSql.mysqlUpsert pins the duplicate-key statement text") {
    assert(UpsertSql.mysqlUpsert("t_report",
      Seq("day", "channel", "uv", "pv"), Seq("day", "channel")) ==
      "INSERT INTO `t_report` (`day`, `channel`, `uv`, `pv`) " +
        "VALUES (?, ?, ?, ?) AS new " +
        "ON DUPLICATE KEY UPDATE `uv` = new.`uv`, `pv` = new.`pv`")
    intercept[IllegalArgumentException] {
      UpsertSql.mysqlUpsert("t", Seq("a", "b"), Seq("c")) // key not a column
    }
    intercept[IllegalArgumentException] {
      UpsertSql.mysqlUpsert("t", Seq("a"), Seq("a")) // nothing to update
    }
    intercept[IllegalArgumentException] {
      UpsertSql.mysqlUpsert("t; DROP TABLE x", Seq("a", "b"), Seq("a"))
    }
  }
}
