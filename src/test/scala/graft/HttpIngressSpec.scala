package graft

import java.net.{HttpURLConnection, URI}
import java.nio.file.Files

import graft.sources.push.PushBuffers

/** The HTTP edge: GET /data?data=<int> must land data in a RUNNING
  * liveStream query (twin of PushSourceSpec's ack test, now over a real
  * socket), with the reference's exact response contract — admitted →
  * 200 "Data processed successfully", ring full → 200 "Data not
  * processed" (Express res.send, the rejection is in the body), plus the
  * typed 400/405 edge checks.
  */
class HttpIngressSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def get(port: Int, pathQuery: String): (Int, String) = {
    val conn = URI.create(s"http://127.0.0.1:$port$pathQuery").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val status = conn.getResponseCode
    val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), "UTF-8")
    conn.disconnect()
    (status, body)
  }

  test("HTTP GETs feed a running query; full ring answers 'Data not processed'") {
    val topic = s"http-spec-${System.nanoTime()}"
    PushBuffers.remove(topic)
    val cascade = new Cascade(spark, tmp("cascade-http"))
    val server  = cascade.serveHttp(topic, port = 0, capacity = 4)
    val q = cascade.liveStream(topic, capacity = 4)
      .writeStream.format("memory").queryName("http_live")
      .option("checkpointLocation", tmp("ckpt-http"))
      .start()
    try {
      // three admitted data
      for (v <- 1 to 3)
        assert(get(server.port, s"/data?data=$v") ==
          (200, "Data processed successfully"))
      q.processAllAvailable()
      val rows = spark.table("http_live")
        .select("offset", "data").orderBy("offset")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(rows.toSeq == Seq((0L, 1), (1L, 2), (2L, 3)))

      // fourth fills the ring; fifth is rejected in the BODY at status 200
      // (reference server.js:35 — res.send defaults to 200)
      assert(get(server.port, "/data?data=4") == (200, "Data processed successfully"))
      assert(get(server.port, "/data?data=5") == (200, "Data not processed"))
      q.processAllAvailable()
      assert(spark.table("http_live").count() == 4)

      // typed edge checks in front of the handler
      assert(get(server.port, "/data")._1 == 400)
      assert(get(server.port, "/data?data=notanint")._1 == 400)
      val conn = URI.create(s"http://127.0.0.1:${server.port}/data?data=9").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 405)
      conn.disconnect()
    } finally {
      q.stop()
      server.stop()
      PushBuffers.remove(topic)
    }
  }

  test("ephemeral ports isolate concurrent edges; capacity mismatch fails at start") {
    val t1 = s"http-a-${System.nanoTime()}"
    val t2 = s"http-b-${System.nanoTime()}"
    Seq(t1, t2).foreach(PushBuffers.remove)
    val s1 = graft.sources.push.HttpIngress.start(t1, capacity = 2)
    val s2 = graft.sources.push.HttpIngress.start(t2, capacity = 2)
    try {
      assert(s1.port != s2.port)
      assert(get(s1.port, "/data?data=7") == (200, "Data processed successfully"))
      // the datum went to t1's ring only
      assert(PushBuffers.get(t1, 2).size == 1L)
      assert(PushBuffers.get(t2, 2).size == 0L)
      // a second edge on the same ring with a DIFFERENT capacity is a
      // configuration error, surfaced at startup rather than per-request
      intercept[IllegalArgumentException] {
        graft.sources.push.HttpIngress.start(t1, capacity = 99)
      }
    } finally {
      s1.stop(); s2.stop()
      Seq(t1, t2).foreach(PushBuffers.remove)
    }
  }
}
