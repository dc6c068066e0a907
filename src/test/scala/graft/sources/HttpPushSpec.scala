package graft.sources

import graft.SparkSpec
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicReference

/** K8 round trip against a local in-process HTTP endpoint. */
class HttpPushSpec extends SparkSpec {

  private def withServer(f: (String, AtomicReference[String]) => Unit): Unit = {
    val received = new AtomicReference[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/push", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        received.set(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        ex.sendResponseHeaders(200, -1)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/push", received)
    finally server.stop(0)
  }

  test("pushJson POSTs the rank head as a JSON array") {
    import spark.implicits._
    withServer { (url, received) =>
      val rank = Seq(("ch1", 1L, 99.5), ("ch2", 2L, 88.0))
        .toDF("channel", "rank", "score")
      val code = HttpPush.pushJson(rank.orderBy($"rank"), url)
      assert(code == 200)
      val body = received.get()
      assert(body.startsWith("[") && body.endsWith("]"), body)
      assert(body.contains("\"channel\":\"ch1\"") && body.contains("\"rank\":2"), body)
    }
  }

  test("pushJson refuses oversized results instead of collecting them") {
    import spark.implicits._
    withServer { (url, received) =>
      val big = spark.range(100).selectExpr("id")
      intercept[IllegalArgumentException] {
        HttpPush.pushJson(big.toDF(), url, maxRows = 10)
      }
      assert(received.get() == null, "nothing must be pushed on refusal")
    }
  }
}
