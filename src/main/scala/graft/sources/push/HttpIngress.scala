package graft.sources.push

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** The network edge of the push ingress — the reference's actual entry
  * point, `GET /data?data=<int>` (/root/reference/server/server.js:22-42:
  * Express HTTP → gRPC → producer ring). Here the socket fronts
  * [[PushBuffer.offer]] directly, so a plain HTTP GET lands a datum in a
  * RUNNING `liveStream` query's next micro-batch.
  *
  * Response mapping is reference-faithful (server.js:31-40):
  *   - ack 1 (admitted)       → 200 "Data processed successfully"
  *   - ack 0 (ring full)      → 200 "Data not processed"
  *       (Express `res.send` defaults to status 200 — the rejection is in
  *        the body, not the status code)
  *   - handler failure        → 500 "Internal Server Error"
  * plus the edge cases Express handles before the handler runs:
  *   - non-GET method         → 405
  *   - missing/non-int `data` → 400 (the reference forwards the raw query
  *        string to gRPC and the type error surfaces as its 500; a typed
  *        400 at the edge is the same contract stated earlier)
  *
  * Built on the JDK's `com.sun.net.httpserver` — zero dependencies. The
  * server is driver-local like the ring it fronts (the reference's
  * producer ring also lives in one process); a cluster deployment runs
  * one edge per ingress JVM, each feeding its own named ring, with
  * [[graft.Topic]] as the durable partitioned log behind them.
  */
final class HttpIngress private (server: HttpServer) {
  /** Actual bound port (useful when started with port 0). */
  def port: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

object HttpIngress {

  /** Start serving `GET /data?data=<int>` into the named ring.
    * @param topic    ring name (the same name `liveStream` reads)
    * @param port     TCP port; 0 picks an ephemeral one
    * @param capacity ring capacity (must match the ring if it exists) */
  def start(topic: String, port: Int = 0,
            capacity: Int = PushBuffers.DefaultCapacity): HttpIngress = {
    // resolve the ring up front: a capacity mismatch should fail the
    // caller loudly at startup, not turn every request into a 500
    PushBuffers.get(topic, capacity)
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/data", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          if (ex.getRequestMethod != "GET") respond(ex, 405, "Method Not Allowed")
          else queryParam(ex, "data").flatMap(_.toIntOption) match {
            case None => respond(ex, 400, "Bad Request: data=<int32> required")
            case Some(v) =>
              if (PushBuffers.get(topic, capacity).offer(v))
                respond(ex, 200, "Data processed successfully")
              else respond(ex, 200, "Data not processed")
          }
        } catch {
          case _: Throwable =>
            try respond(ex, 500, "Internal Server Error")
            catch { case _: Throwable => () }
        } finally ex.close()
    })
    server.start()
    new HttpIngress(server)
  }

  private def queryParam(ex: HttpExchange, key: String): Option[String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .collectFirst {
        case kv if kv.startsWith(key + "=") =>
          java.net.URLDecoder.decode(kv.substring(key.length + 1),
                                     StandardCharsets.UTF_8)
      }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
