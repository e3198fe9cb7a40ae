package graft.rpc

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import Wire._

/** [[RpcClient]]'s protobuf-framed twin: the same five Wire service
  * traits, but every request/response crosses the socket as protobuf
  * wire-format bytes inside gRPC length-prefixed frames at the gRPC path
  * convention (`/<package>.<Service>/<Method>`) — the byte stream a
  * reference client's compiled stubs emit (see [[Proto]] for the field
  * tables; the delta to stock gRPC is HTTP/1.1 instead of HTTP/2).
  * Error mapping matches [[RpcClient]]: 404 → NoSuchElementException
  * (unknown topic / missing offset), other non-200 →
  * IllegalStateException.
  */
final class ProtoRpcClient(host: String, port: Int)
    extends KafkaMetadataService with KafkaBrokerInitializationService
    with PublishToBroker with MyAPIService with ConsumeFromBroker {

  override def send(request: BrokerInitializationRequest): BrokerInitializationResponse =
    Proto.decBrokerInitializationResponse(
      call("coordinate.KafkaBrokerInitializationService/Send",
           Proto.encBrokerInitializationRequest(request)))

  override def getMetadata(request: MetadataRequest): MetadataResponse =
    Proto.decMetadataResponse(
      call("coordinate.KafkaMetadataService/GetMetadata",
           Proto.encMetadataRequest(request)))

  override def send(request: PublishDataToBroker): BrokerToPublisherAck =
    Proto.decBrokerToPublisherAck(
      call("publish.PublishToBroker/Send", Proto.encPublishDataToBroker(request)))

  override def expressToProducer(request: ExpressDataToProducer): ProducerToExpressAck =
    Proto.decProducerToExpressAck(
      call("publish.MyAPIService/ExpressToProducer",
           Proto.encExpressDataToProducer(request)))

  override def send(request: ConsumeDataFromBroker): BrokerToConsumerAck =
    Proto.decBrokerToConsumerAck(
      call("consume.ConsumeFromBroker/Send",
           Proto.encConsumeDataFromBroker(request)))

  // ---- transport ---------------------------------------------------------

  private def call(path: String, msg: Array[Byte]): Array[Byte] = {
    val conn = URI.create(s"http://$host:$port/$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-protobuf")
    val frame = Proto.grpcFrame(msg)
    val os = conn.getOutputStream
    try os.write(frame) finally os.close()
    val status = conn.getResponseCode
    if (status == 200) {
      val in = conn.getInputStream
      val bytes = try in.readAllBytes() finally in.close()
      Proto.grpcUnframe(bytes)
    } else {
      val err = conn.getErrorStream
      val text =
        if (err == null) ""
        else try new String(err.readAllBytes(), StandardCharsets.UTF_8)
             finally err.close()
      // error bodies are the server's JSON {"message": ...} — extract it
      // leniently (the error path is diagnostic, not a protobuf contract)
      val msg0 =
        try {
          org.json4s.jackson.JsonMethods.parse(text) \ "message" match {
            case org.json4s.JString(s) => s
            case _ => text
          }
        } catch { case _: Throwable => text }
      if (status == 404) throw new NoSuchElementException(msg0)
      throw new IllegalStateException(s"rpc $path failed ($status): $msg0")
    }
  }
}
