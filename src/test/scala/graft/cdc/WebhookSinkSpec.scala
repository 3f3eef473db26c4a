package graft.cdc

import graft.SparkSpec
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** K1 — live HTTP webhook delivery against a local endpoint: the retry
  * contract, and the gated-commit epoch replay when the endpoint is down.
  */
class WebhookSinkSpec extends SparkSpec {

  /** Local webhook endpoint: counts attempts, records bodies of accepted
    * (2xx) posts, fails with 500 while `healthy` is false.
    */
  private class Endpoint {
    @volatile var healthy = true
    /** fail the first N attempts with 500 regardless of `healthy`. */
    @volatile var failFirst = 0
    val attempts = new AtomicInteger(0)
    val accepted = new ConcurrentLinkedQueue[String]()
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val n = attempts.incrementAndGet()
        val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
        if (healthy && n > failFirst) { accepted.add(body); x.sendResponseHeaders(200, -1) }
        else x.sendResponseHeaders(500, -1)
        x.close()
      }
    })
    server.start()
    val url: String = s"http://127.0.0.1:${server.getAddress.getPort}/hook"
    def stop(): Unit = server.stop(0)
  }

  private def fastCfg(url: String) =
    WebhookSink.Config(url, timeoutMs = 5000L, maxAttempts = 3, baseDelayMs = 1L, capMs = 8L)

  test("postWithRetry: 2xx on a later attempt succeeds within the attempt budget") {
    val ep = new Endpoint
    try {
      ep.failFirst = 2 // attempts 1 and 2 get 500, attempt 3 succeeds
      WebhookSink.postWithRetry(fastCfg(ep.url), """{"ping":1}""")
      assert(ep.attempts.get() === 3)
      assert(ep.accepted.size() === 1)
    } finally ep.stop()
  }

  test("postWithRetry: exhausted attempts throw (epoch abort signal)") {
    val ep = new Endpoint
    try {
      ep.healthy = false
      val e = intercept[RuntimeException] {
        WebhookSink.postWithRetry(fastCfg(ep.url), """{"ping":2}""")
      }
      assert(e.getMessage.contains("after 3 attempts"))
      assert(ep.attempts.get() === 3)
    } finally ep.stop()
  }

  test("e2e: healthy endpoint receives exactly the payload rows of the route") {
    val ep = new Endpoint
    val src = java.nio.file.Files.createTempDirectory("graft-wh-src").toString
    val ckp = java.nio.file.Files.createTempDirectory("graft-wh-ckp").toString
    try {
      graft.Tables.events(spark, "/root/testdata/sf0.001")
        .coalesce(1).write.mode("overwrite").parquet(src)
      val spec = Streaming.PipelineSpec("c1", src, ckp)
      Streaming.startToWebhook(spark, spec, fastCfg(ep.url)).awaitTermination()
      val expected = WebhookSink.payloadJson(Pipeline.deliveries(spark, "/root/testdata/sf0.001"))
        .collect().map(_.getString(1)).toSet
      import scala.jdk.CollectionConverters._
      assert(ep.accepted.asScala.toSet === expected)
    } finally ep.stop()
  }

  test("e2e: dead endpoint aborts the epoch; restart replays and delivers everything") {
    val ep = new Endpoint
    val src = java.nio.file.Files.createTempDirectory("graft-wh2-src").toString
    val ckp = java.nio.file.Files.createTempDirectory("graft-wh2-ckp").toString
    try {
      graft.Tables.events(spark, "/root/testdata/sf0.001")
        .coalesce(1).write.mode("overwrite").parquet(src)
      val spec = Streaming.PipelineSpec("c1", src, ckp)
      ep.healthy = false
      intercept[Exception] {
        Streaming.startToWebhook(spark, spec, fastCfg(ep.url)).awaitTermination()
      }
      assert(ep.accepted.isEmpty, "nothing may count as delivered while the endpoint is down")
      // endpoint heals → same checkpoint replays the uncommitted epoch (K2)
      ep.healthy = true
      Streaming.startToWebhook(spark, spec, fastCfg(ep.url)).awaitTermination()
      val expected = WebhookSink.payloadJson(Pipeline.deliveries(spark, "/root/testdata/sf0.001"))
        .collect().map(_.getString(1)).toSet
      import scala.jdk.CollectionConverters._
      assert(ep.accepted.asScala.toSet === expected)
    } finally ep.stop()
  }
}
