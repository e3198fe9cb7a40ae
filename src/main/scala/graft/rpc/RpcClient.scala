package graft.rpc

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.JsonMethods

import Wire._

/** TCP client for [[RpcServer]] implementing the same five Wire service
  * traits as the in-process facade — the role of the reference's
  * generated gRPC client stubs (a reference user's producer/consumer
  * code programs against the service trait; whether the implementation
  * is [[CascadeRpc]] in-process or this client over a socket is
  * invisible to it, which is exactly the parity the process boundary
  * requires).
  *
  * Contract mapping is the inverse of the server's: 404 → the facade's
  * NoSuchElementException (unknown topic / missing offset), any other
  * non-200 → IllegalStateException with the server's message.
  */
final class RpcClient(host: String, port: Int)
    extends KafkaMetadataService with KafkaBrokerInitializationService
    with PublishToBroker with MyAPIService with ConsumeFromBroker {

  override def send(request: BrokerInitializationRequest): BrokerInitializationResponse = {
    val out = call("registerBroker", JObject(
      "broker" -> JObject(
        "id" -> JInt(request.broker.id),
        "ip" -> JString(request.broker.ip),
        "port" -> JInt(request.broker.port)),
      "partition" -> JInt(request.partition),
      "topicName" -> JString(request.topicName)))
    BrokerInitializationResponse(
      if (long(out \ "status") == 0) Ok else Error, str(out \ "message"))
  }

  override def getMetadata(request: MetadataRequest): MetadataResponse = {
    val out = call("getMetadata", JObject("topicName" -> JString(request.topicName)))
    val brokers = (out \ "brokers") match {
      case JArray(bs) => bs.map(b =>
        Broker(long(b \ "id").toInt, str(b \ "ip"), long(b \ "port").toInt))
      case other => throw new IllegalStateException(s"malformed brokers: $other")
    }
    MetadataResponse(brokers)
  }

  override def send(request: PublishDataToBroker): BrokerToPublisherAck = {
    val out = call("publish", JObject(
      "eventName" -> JString(request.eventName),
      "timestampUs" -> JInt(BigInt(RpcServer.usOf(request.timestamp))),
      "number" -> JInt(request.number)))
    BrokerToPublisherAck(str(out \ "responseToProducer"))
  }

  override def expressToProducer(request: ExpressDataToProducer): ProducerToExpressAck = {
    val out = call("express", JObject("data" -> JInt(request.data)))
    ProducerToExpressAck(long(out \ "responseToExpress").toInt)
  }

  override def send(request: ConsumeDataFromBroker): BrokerToConsumerAck = {
    val out = call("consume", JObject(
      "eventName" -> JString(request.eventName),
      "number" -> JInt(request.number)))
    val events = (out \ "eventVec") match {
      case JArray(es) => es.map(e =>
        Event(str(e \ "eventName"), RpcServer.tsOf(long(e \ "timestampUs"))))
      case other => throw new IllegalStateException(s"malformed eventVec: $other")
    }
    BrokerToConsumerAck(events)
  }

  // ---- transport -------------------------------------------------------

  private def call(rpcName: String, body: JValue): JValue = {
    val conn = URI.create(s"http://$host:$port/rpc/$rpcName").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json; charset=utf-8")
    val bytes = JsonMethods.compact(JsonMethods.render(body))
      .getBytes(StandardCharsets.UTF_8)
    val os = conn.getOutputStream
    try os.write(bytes) finally os.close()
    val status = conn.getResponseCode
    val in = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val text =
      if (in == null) ""
      else try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    if (status == 200) JsonMethods.parse(text)
    else {
      val msg =
        try str(JsonMethods.parse(text) \ "message") catch { case _: Throwable => text }
      if (status == 404) throw new NoSuchElementException(msg)
      throw new IllegalStateException(s"rpc $rpcName failed ($status): $msg")
    }
  }

  private def str(v: JValue): String = v match {
    case JString(s) => s
    case other => throw new IllegalStateException(s"expected string, got $other")
  }
  private def long(v: JValue): Long = v match {
    case JInt(n) => n.toLong
    case JLong(n) => n
    case other => throw new IllegalStateException(s"expected number, got $other")
  }
}
