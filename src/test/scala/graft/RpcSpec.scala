package graft

import java.nio.file.Files
import graft.rpc.Wire._
import graft.rpc.{CascadeRpc, RpcClient, RpcServer}

/** Drives publish / metadata / consume / express through the in-process
  * RPC facade — the E1/E2/E3 wire-shape parity check next to the HTTP
  * ingress edge (HttpIngressSpec). */
class RpcSpec extends SparkSpec {

  private def facade(topic: String, ringCapacity: Int = 4): CascadeRpc = {
    val root = Files.createTempDirectory("rpc-root").toString
    new CascadeRpc(spark, new Cascade(spark, root), topic, ringCapacity)
  }

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("coordinator: broker registration then metadata lookup") {
    val rpc = facade("t_coord")
    val b1  = Broker(1, "10.0.0.1", 50030)
    val b2  = Broker(2, "10.0.0.2", 50030)

    assert(rpc.send(BrokerInitializationRequest(b1, 0, "orders")) ===
      BrokerInitializationResponse(Ok, "Broker successfully registered"))
    assert(rpc.send(BrokerInitializationRequest(b2, 1, "orders")).status === Ok)
    // the duplicate-registration branch the reference declares
    assert(rpc.send(BrokerInitializationRequest(b1, 0, "orders")) ===
      BrokerInitializationResponse(Error, "Broker already registered"))

    assert(rpc.getMetadata(MetadataRequest("orders")).brokers === Seq(b1, b2))
    intercept[NoSuchElementException] { rpc.getMetadata(MetadataRequest("nope")) }
  }

  test("publish rpc: reference ack format; consume rpc: event by ordinal") {
    val rpc = facade("t_log")
    val ack = rpc.send(PublishDataToBroker("alpha", ts(1700000000L), 7))
    assert(ack.responseToProducer ===
      "successfully rx event with name alpha and timestamp " +
        "2023-11-14T22:13:20+00:00 and number 7")
    rpc.send(PublishDataToBroker("beta", ts(1700000060L), 8))
    rpc.send(PublishDataToBroker("gamma", ts(1700000120L), 9))

    // consume by log ordinal (proto `number`): one event per call, with
    // the STORED event time (the reference fabricates now() because it
    // never persisted the timestamp; here all fields are durable)
    assert(rpc.send(ConsumeDataFromBroker("req_from_consumer", 0)) ===
      BrokerToConsumerAck(Seq(Event("alpha", ts(1700000000L)))))
    assert(rpc.send(ConsumeDataFromBroker("req_from_consumer", 2)) ===
      BrokerToConsumerAck(Seq(Event("gamma", ts(1700000120L)))))
    intercept[NoSuchElementException] {
      rpc.send(ConsumeDataFromBroker("req_from_consumer", 99))
    }
  }

  test("express rpc: ring admission ack 1 until full, then 0") {
    val rpc = facade(s"t_ring_${System.nanoTime()}", ringCapacity = 2)
    assert(rpc.expressToProducer(ExpressDataToProducer(41)) === ProducerToExpressAck(1))
    assert(rpc.expressToProducer(ExpressDataToProducer(42)) === ProducerToExpressAck(1))
    // reference-faithful rejection: the ring's slots are never freed, so
    // a full ring acks 0 (producer main.rs:68-82)
    assert(rpc.expressToProducer(ExpressDataToProducer(43)) === ProducerToExpressAck(0))
  }

  test("all five rpcs over a real TCP socket: client ≡ in-process facade") {
    // the process boundary the reference's services have (its producer/
    // coordinator/broker each bind a socket): E1/E2/E3 driven through an
    // actual listener + HTTP client, same Wire traits on both ends
    val rpc    = facade(s"t_tcp_${System.nanoTime()}", ringCapacity = 2)
    val server = RpcServer.start(rpc)
    try {
      val c = new RpcClient("127.0.0.1", server.port)

      // coordinator surface (E3): register, duplicate branch, lookup, miss
      val b1 = Broker(1, "10.0.0.1", 50030)
      assert(c.send(BrokerInitializationRequest(b1, 0, "orders")) ===
        BrokerInitializationResponse(Ok, "Broker successfully registered"))
      assert(c.send(BrokerInitializationRequest(b1, 0, "orders")) ===
        BrokerInitializationResponse(Error, "Broker already registered"))
      assert(c.getMetadata(MetadataRequest("orders")).brokers === Seq(b1))
      intercept[NoSuchElementException] { c.getMetadata(MetadataRequest("nope")) }

      // publish → consume round-trip (E1): reference ack format verbatim,
      // µs event time surviving the wire both ways
      val t = {
        val x = new java.sql.Timestamp(1700000000000L); x.setNanos(123456000); x
      }
      val ack = c.send(PublishDataToBroker("alpha", t, 7))
      assert(ack.responseToProducer.startsWith(
        "successfully rx event with name alpha and timestamp 2023-11-14T22:13:20"))
      assert(c.send(ConsumeDataFromBroker("req_from_consumer", 0)) ===
        BrokerToConsumerAck(Seq(Event("alpha", t))))
      intercept[NoSuchElementException] {
        c.send(ConsumeDataFromBroker("req_from_consumer", 99))
      }

      // express admission (E2): ack 1 until the ring fills, then 0
      assert(c.expressToProducer(ExpressDataToProducer(41)) === ProducerToExpressAck(1))
      assert(c.expressToProducer(ExpressDataToProducer(42)) === ProducerToExpressAck(1))
      assert(c.expressToProducer(ExpressDataToProducer(43)) === ProducerToExpressAck(0))
    } finally server.stop()
  }
}
