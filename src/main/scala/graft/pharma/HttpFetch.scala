package graft.pharma

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side HTTP fetch behind the MedsFeed seam — the reference's
  * ingestion entry (requests.get(url, timeout=30) + .json(),
  * Pharma_Ingestion_Cleaning.py:15-27). The fetch runs on the DRIVER and
  * hands the payload to the distributed flatten; at 100 TB the payload
  * lands in object storage first and spark.read.json takes over
  * (SURVEY.md §2.1 S1) — a single-document REST feed like this one is
  * inherently a driver-side read.
  *
  * Zero-egress environments (CI, this container) exercise it against a
  * loopback server (HttpFetchSpec); production points it at the real
  * feed URL. */
object HttpFetch {

  /** GET a text body with the reference's 30 s timeout semantics.
    * Non-200 responses raise — dirty-feed policy is decided by the
    * caller, not silently swallowed here. */
  def fetchString(url: String, timeout: Duration = Duration.ofSeconds(30)): String = {
    val client = HttpClient.newBuilder().connectTimeout(timeout).build()
    val request = HttpRequest.newBuilder(URI.create(url))
      .timeout(timeout).GET().build()
    val response = client.send(request, HttpResponse.BodyHandlers.ofString())
    require(response.statusCode() == 200,
      s"HTTP ${response.statusCode()} fetching $url")
    response.body()
  }

  /** Fetch the feed and hand it to the distributed flatten — the
    * end-to-end ingestion entry point (S1 + S2 + S3). */
  def loadFeed(spark: SparkSession, url: String): DataFrame =
    MedsFeed.fromJsonString(spark, fetchString(url))

  /** Fetch the labs directory feed — the reference's second declared
    * source (`url_labs`, Pharma_Ingestion_Cleaning.py:16; SURVEY.md §2.1
    * S8) — through the same driver-side seam. */
  def loadLabs(spark: SparkSession, url: String): DataFrame =
    LabsFeed.fromJsonString(spark, fetchString(url))
}
