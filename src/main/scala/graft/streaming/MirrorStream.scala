package graft.streaming

import graft.Topic
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** CONTINUOUS topic replication — MirrorMaker's daemon form: the source
  * topic's stream (new parquet segments, [[Topic.readStream]]) is the
  * change signal, and each micro-batch runs one incremental
  * [[Topic.mirror]] pass. Exactly-once comes from mirror's OWN
  * idempotence (it copies `offset > mirror hwm`, under the mirror's
  * publish lock), NOT from the stream: a replayed trigger after a crash
  * finds nothing above the high-water mark and is a no-op, so the
  * checkpoint only has to guarantee liveness, never dedup.
  *
  * The batch rows themselves are deliberately UNUSED — mirroring from
  * the log (not from the in-flight batch) keeps one code path for
  * batch and continuous replication and inherits mirror's divergence
  * check. At 100 TB the signal source would be a file-notification
  * queue instead of a listing-based file stream; the mirror pass itself
  * already reads only the delta segments (offset predicate row-group
  * pruned).
  *
  * Source maintenance fails the daemon LOUDLY twice over (round-8
  * contract): the change-signal stream carries [[Topic.readStream]]'s
  * maintenance-epoch guard, and each mirror pass re-checks the source's
  * epoch against the mirror's `_source_epoch` pin. After a deliberate
  * compact/retain on the source, the operator runs
  * [[Topic.acceptSourceMaintenance]] (or re-seeds) and restarts with a
  * fresh checkpoint.
  */
object MirrorStream {

  def start(spark: SparkSession, sourceDir: String, mirrorDir: String,
            checkpoint: String): StreamingQuery =
    Topic.readStream(spark, sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        Topic.mirror(spark, sourceDir, mirrorDir): Unit
      }
      .start()
}
