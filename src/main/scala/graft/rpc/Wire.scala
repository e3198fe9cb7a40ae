package graft.rpc

/** Wire-shape twins of the reference's three gRPC service surfaces — the
  * in-process RPC facade that completes E1/E2/E3 parity next to the HTTP
  * ingress edge. Message case classes mirror the proto messages
  * field-for-field; service traits mirror the declared rpcs:
  *
  *   - /root/reference/proto/coordinate.proto:17-30 — KafkaMetadataService
  *     (GetMetadata) and KafkaBrokerInitializationService (Send), messages
  *     Broker/MetadataRequest/MetadataResponse/BrokerInitialization*.
  *   - /root/reference/proto/publish.proto:7-24 — PublishToBroker (Send)
  *     and MyAPIService (ExpressToProducer), messages
  *     PublishDataToBroker/BrokerToPublisherAck/ExpressDataToProducer/
  *     ProducerToExpressAck.
  *   - /root/reference/proto/consume.proto:7-22 — ConsumeFromBroker
  *     (Send), messages ConsumeDataFromBroker/Event/BrokerToConsumerAck.
  *
  * proto3 scalar mapping: uint32/int32 → Int, string → String,
  * google.protobuf.Timestamp → java.sql.Timestamp (µs precision — the
  * engine's event-time unit). In-process on purpose: the transport is a
  * method call, the CONTRACT (names, shapes, ack semantics) is the wire
  * parity the facade exists for; no query capability depends on it.
  */
object Wire {

  // ---- coordinate.proto ----------------------------------------------

  /** coordinate.proto:6-10 */
  final case class Broker(id: Int, ip: String, port: Int)

  /** coordinate.proto:18-20 */
  final case class MetadataRequest(topicName: String)

  /** coordinate.proto:23-25 */
  final case class MetadataResponse(brokers: Seq[Broker])

  /** coordinate.proto:33-37 */
  final case class BrokerInitializationRequest(
      broker: Broker, partition: Int, topicName: String)

  /** coordinate.proto:41-44 (enum StatusCode { OK = 0; ERROR = 1; }) */
  sealed abstract class StatusCode(val code: Int)
  case object Ok    extends StatusCode(0)
  case object Error extends StatusCode(1)

  /** coordinate.proto:40-47 */
  final case class BrokerInitializationResponse(status: StatusCode, message: String)

  /** coordinate.proto:27-30 */
  trait KafkaMetadataService {
    def getMetadata(request: MetadataRequest): MetadataResponse
  }

  /** coordinate.proto:50-52 */
  trait KafkaBrokerInitializationService {
    def send(request: BrokerInitializationRequest): BrokerInitializationResponse
  }

  // ---- publish.proto --------------------------------------------------

  /** publish.proto:11-15 */
  final case class PublishDataToBroker(
      eventName: String, timestamp: java.sql.Timestamp, number: Int)

  /** publish.proto:17 */
  final case class BrokerToPublisherAck(responseToProducer: String)

  /** publish.proto:19 */
  final case class ExpressDataToProducer(data: Int)

  /** publish.proto:21 */
  final case class ProducerToExpressAck(responseToExpress: Int)

  /** publish.proto:7-9 */
  trait PublishToBroker {
    def send(request: PublishDataToBroker): BrokerToPublisherAck
  }

  /** publish.proto:23-25 */
  trait MyAPIService {
    def expressToProducer(request: ExpressDataToProducer): ProducerToExpressAck
  }

  // ---- consume.proto --------------------------------------------------

  /** consume.proto:11-15 (number = log ordinal to read) */
  final case class ConsumeDataFromBroker(eventName: String, number: Int)

  /** consume.proto:17-20 */
  final case class Event(eventName: String, timestamp: java.sql.Timestamp)

  /** consume.proto:21-24 (repeated Event event_vec) */
  final case class BrokerToConsumerAck(eventVec: Seq[Event])

  /** consume.proto:7-9 */
  trait ConsumeFromBroker {
    def send(request: ConsumeDataFromBroker): BrokerToConsumerAck
  }
}
