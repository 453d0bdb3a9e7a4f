package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer

import graft.pharma.{Cleaning, HttpFetch, PharmaFixture}

/** The S1 ingestion entry end-to-end against a loopback HTTP server
  * serving the fixture feed — the full fetch → flatten → clean path with
  * zero egress. */
class HttpFetchSpec extends SparkTestBase {

  private def withServer[T](routes: Map[String, (Int, String)])(f: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, (status, body)) =>
      server.createContext(path, exchange => {
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        exchange.sendResponseHeaders(status, bytes.length)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("fetch → flatten → clean runs the whole ingestion path") {
    withServer(Map("/meds.json" -> (200, PharmaFixture.feedJson()))) { base =>
      val raw = HttpFetch.loadFeed(spark, s"$base/meds.json")
      assert(raw.count() === 300L)
      assert(Cleaning.all(raw).count() === 195L)
    }
  }

  test("labs directory fetch → flatten yields one row per lab (S8 second source)") {
    withServer(Map("/labs.json" -> (200, PharmaFixture.labsJson()))) { base =>
      val labs = HttpFetch.loadLabs(spark, s"$base/labs.json")
      assert(labs.count() === 8L)
      assert(labs.columns.toSeq === Seq("name", "address", "tel", "web", "wilaya"))
      // edge rows survive the flatten: null web, null wilaya
      assert(labs.filter(org.apache.spark.sql.functions.col("web").isNull).count() >= 1L)
      assert(labs.filter(org.apache.spark.sql.functions.col("wilaya").isNull).count() >= 1L)
    }
  }

  test("non-200 responses raise instead of producing an empty frame") {
    withServer(Map("/gone.json" -> (404, "not here"))) { base =>
      val e = intercept[IllegalArgumentException] {
        HttpFetch.fetchString(s"$base/gone.json")
      }
      assert(e.getMessage.contains("404"))
    }
  }
}
