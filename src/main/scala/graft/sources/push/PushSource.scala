package graft.sources.push

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Live push ingress — the reference's defining entry point, as a DSv2
  * micro-batch stream source.
  *
  * The reference chain is Express HTTP → gRPC → producer ring buffer →
  * drain loop (/root/reference/server/server.js:22-42,
  * /root/reference/src/producer/main.rs:26-38,53-85): a caller PUSHES one
  * int32 datum at a time into a bounded in-process buffer and gets an
  * admission ack (ProducerToExpressAck 1 = accepted, 0 = ring full,
  * /root/reference/proto/publish.proto:21-23); a running consumer then
  * drains the buffer. Here the ring is [[PushBuffer]] and the drain loop
  * is Spark's micro-batch planner: `spark.readStream.format("graft-push")
  * .option("buffer", name)` sees every accepted datum in the next
  * trigger, so events pushed from application code appear in a RUNNING
  * streaming query — the one reference capability a file-based source
  * cannot model.
  *
  * Faithful quirks kept: slots are never freed (the reference drain
  * overwrites slots with 1, which its admission check treats as occupied
  * — main.rs:87-106 — so its ring also rejects forever once `capacity`
  * ingests happen); the ack is returned synchronously to the pusher; the
  * payload is one int32.
  *
  * Scale posture: an in-JVM buffer is driver-local by design — this is
  * the reference's exact architecture (its producer ring lives in one
  * process). On a multi-executor cluster the duty of a durable,
  * partitioned, replayable ingress log belongs to [[graft.Topic]]; this
  * source is the low-latency push edge in front of it (the test and
  * [[graft.Cascade.ingestLive]] wire both). Offsets are monotone log
  * positions, so restart/replay within one JVM is exact.
  */
class PushDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-push"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PushDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new PushTable(opts.getOrDefault("buffer", "default"),
                  opts.getInt("capacity", PushBuffers.DefaultCapacity))
  }
}

object PushDataSource {
  /** One ingress datum: its log ordinal, the event-time stamp assigned at
    * admission (R8 — the producer stamps, not the sink), and the int32
    * payload (ExpressDataToProducer.data, publish.proto:19). */
  val schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("data", IntegerType, nullable = false)))
}

/** The bounded in-process ring: offer() is the admission check + append
  * (one synchronized block — the reference guards its ring with a mutex,
  * main.rs:55-56). Entries are (micros timestamp, data) indexed by log
  * position; reads are immutable snapshots below `size`, so the stream
  * reader never races the writer.
  */
final class PushBuffer(val capacity: Int) {
  private val log = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]

  /** Push one datum. @return ack — true accepted, false ring full. */
  def offer(data: Int): Boolean = synchronized {
    if (log.size >= capacity) false
    else { log += ((System.currentTimeMillis() * 1000L, data)); true }
  }

  def size: Long = synchronized(log.size.toLong)

  /** Entries with ordinal in [from, until) — all below size, so stable. */
  def range(from: Long, until: Long): Array[(Long, Long, Int)] = synchronized {
    (from until until).map { i =>
      val (ts, v) = log(i.toInt); (i, ts, v)
    }.toArray
  }
}

/** Named-buffer registry (the coordinator's topic→ring map). JVM-global
  * so the pushing thread and the executing tasks meet — valid precisely
  * in local mode, which is where an in-process ring makes sense. */
object PushBuffers {
  val DefaultCapacity = 1000
  private val buffers = new ConcurrentHashMap[String, PushBuffer]()
  /** Get-or-create the named ring. The capacity is a property of the
    * ring, fixed at creation — a later caller asking for a DIFFERENT
    * capacity has mismatched pusher/stream configuration, and silently
    * keeping the first value would un-enforce the admission bound they
    * declared, so it fails loudly instead. */
  def get(name: String, capacity: Int = DefaultCapacity): PushBuffer = {
    val b = buffers.computeIfAbsent(name, _ => new PushBuffer(capacity))
    require(b.capacity == capacity,
      s"push ring '$name' exists with capacity ${b.capacity}, requested $capacity")
    b
  }
  /** Drop a ring (tests / topic teardown). */
  def remove(name: String): Unit = buffers.remove(name)
}

private[push] class PushTable(buffer: String, capacity: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-push:$buffer"
  override def schema(): StructType = PushDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = PushDataSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PushMicroBatchStream(buffer, capacity)
    }
}

private[push] case class PushOffset(n: Long) extends Offset {
  override def json: String = n.toString
}

private[push] case class PushInputPartition(buffer: String, capacity: Int,
                                            start: Long, end: Long)
    extends InputPartition

private[push] class PushMicroBatchStream(buffer: String, capacity: Int)
    extends MicroBatchStream {
  override def initialOffset(): Offset = PushOffset(0L)
  override def latestOffset(): Offset =
    PushOffset(PushBuffers.get(buffer, capacity).size)
  override def deserializeOffset(json: String): Offset = PushOffset(json.toLong)
  // nothing to free: ring slots stay occupied forever (reference semantics)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PushOffset].n
    val e = end.asInstanceOf[PushOffset].n
    if (e <= s) Array.empty
    else Array(PushInputPartition(buffer, capacity, s, e))
  }
  override def createReaderFactory(): PartitionReaderFactory = PushReaderFactory
}

private[push] object PushReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val pp   = p.asInstanceOf[PushInputPartition]
    val rows = PushBuffers.get(pp.buffer, pp.capacity).range(pp.start, pp.end)
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (off, tsMicros, data) = rows(i)
        InternalRow(off, tsMicros, data)
      }
      override def close(): Unit = ()
    }
  }
}
