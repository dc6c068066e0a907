package graft.sources

import org.apache.spark.sql.DataFrame

/** K8: HTTP push sink (`rank/reports/SetFavoriteRank.scala:118-131`,
  * `utils/PushTools.java` — POST rank refreshes / hot words to the
  * recommender). Driver-side by design: rank exports are top-N small
  * (the reference collects before pushing too), and pushing from
  * executors would fan out one connection per task and re-push on task
  * retry — an at-least-once side effect the endpoint can't dedup. The
  * `maxRows` guard keeps the collect honest: this sink is for report
  * heads, never for facts. */
object HttpPush {

  /** POST the DataFrame as one JSON array (rows as objects via Spark's
    * own `toJSON`). Returns the HTTP status code; throws on transport
    * failure or when the result exceeds `maxRows` (use a parquet/JDBC
    * sink for anything that large). */
  def pushJson(df: DataFrame, url: String, maxRows: Int = 10000,
      timeoutSec: Long = 30): Int = {
    // limit+1 bounds the collect itself — an unexpectedly huge result
    // fails fast instead of materializing on the driver
    val rows = df.toJSON.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"refusing to push more than $maxRows rows over HTTP")
    val body = rows.mkString("[", ",", "]")
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSec))
      .build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Content-Type", "application/json")
      .timeout(java.time.Duration.ofSeconds(timeoutSec))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
      .statusCode()
  }
}
