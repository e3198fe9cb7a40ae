package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Transactional publish + read-committed consume — the Kafka EOS half
  * the reference reaches for with its lost-ack retry problem
  * (`/root/reference/src/broker/main.rs:91-108`) and [[Topic.publishIdempotent]]
  * already half-solves. Idempotence dedups a RETRIED batch; transactions
  * make a GROUP of batches atomic: consumers see all of a transaction's
  * rows or none, across publishes and across producer crashes.
  *
  * Kafka's design, adapted to a parquet log:
  *
  *   - data rows of a transaction carry a `txn_id` column (Kafka: the
  *     producerId/epoch in the batch header). The data IS in the log
  *     immediately — like Kafka, aborted records stay on disk and are
  *     filtered out client-side, never rewritten.
  *   - transaction STATE lives in marker files under `<topic>/_txns/`
  *     (Kafka: control records + the transaction coordinator's log):
  *     `<id>.pending` → `<id>.committed` | `<id>.aborted`, transitioned
  *     by an atomic rename. The pending marker records the txn's offset
  *     ranges (one line per publish, "first,last"), so last-stable-offset
  *     is a metadata read — never a log scan.
  *   - a crashed producer leaves a `.pending` marker: its rows stay
  *     invisible to read-committed consumers forever (correct), and
  *     [[abortStale]] is the coordinator-timeout sweep that resolves the
  *     transaction to aborted after a TTL.
  *
  * Ordering of writes inside [[publish]] matters for crash-safety: the
  * marker gains the offset range BEFORE the data lands. A crash between
  * the two leaves a range with no rows — harmless (the abort path
  * retires it); the reverse order would leave committed-invisible rows
  * that last-stable-offset doesn't know about.
  *
  * Scale shape: markers are control-plane metadata (one tiny file per
  * transaction, listed once per read); the read-committed filter is a
  * broadcast join against the committed-id set, so the log scan itself
  * stays one pass with pushdown intact. Offsets consumed by aborted
  * transactions are gaps, exactly like Kafka.
  */
object TopicTxn {

  private def txnDir(topicDir: String) = new Path(topicDir, "_txns")
  private def marker(topicDir: String, txnId: String, state: String) =
    new Path(txnDir(topicDir), s"$txnId.$state")

  private def checkId(txnId: String): Unit =
    require(txnId.nonEmpty && !txnId.exists(c => c == '/' || c == '.'),
      s"transaction id must be a single path-safe token without dots, got '$txnId'")

  /** (state, ranges) for a txn id; state "none" if no marker exists. */
  private def stateOf(spark: SparkSession, topicDir: String,
                      txnId: String): (String, Seq[(Long, Long)]) = {
    val (hfs, _) = Topic.fs(spark, topicDir)
    Seq("committed", "aborted", "pending").find(s => hfs.exists(marker(topicDir, txnId, s)))
      .map { s =>
        val in = hfs.open(marker(topicDir, txnId, s))
        val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        val ranges = content.split('\n').filter(_.nonEmpty).toSeq.map { line =>
          val Array(a, b) = line.split(','); (a.toLong, b.toLong)
        }
        (s, ranges)
      }.getOrElse(("none", Nil))
  }

  /** Publish a batch under transaction `txnId` (dense offsets after the
    * hwm, same ordering contract as [[Topic.publish]]); rows stay
    * invisible to [[readCommitted]] until [[commit]]. Call repeatedly
    * with the same id to build a multi-batch transaction. */
  def publish(events: DataFrame, topicDir: String, txnId: String): Unit = {
    checkId(txnId)
    val spark = events.sparkSession
    Topic.withPublishLock(spark, topicDir) {
      val (state, ranges) = stateOf(spark, topicDir, txnId)
      require(state == "none" || state == "pending",
        s"transaction '$txnId' on $topicDir is already $state — ids are single-use")
      Topic.checkSchemaCompatible(spark, topicDir, events.schema)
      val base = Topic.highWaterMark(spark, topicDir) + 1L
      val n = events.count()
      if (n > 0) {
        // marker first: a crash before the data lands leaves a rowless
        // range (harmless), never invisible-but-committed rows
        val (hfs, _) = Topic.fs(spark, topicDir)
        val m = marker(topicDir, txnId, "pending")
        val out = hfs.create(m, true)
        try out.writeBytes((ranges :+ (base, base + n - 1))
          .map { case (a, b) => s"$a,$b" }.mkString("", "\n", "\n"))
        finally out.close()
        Topic.assignOffsets(events, base)
          .withColumn("txn_id", lit(txnId))
          .write.mode(SaveMode.Append).parquet(topicDir)
      }
    }
  }

  /** Atomically reveal the transaction's rows. Idempotent on a committed
    * id; loud on aborted or unknown. */
  def commit(spark: SparkSession, topicDir: String, txnId: String): Unit =
    resolve(spark, topicDir, txnId, to = "committed", illegal = "aborted")

  /** Atomically retire the transaction: its rows stay in the log (Kafka
    * keeps aborted records too) but no read-committed consumer ever sees
    * them. Idempotent on an aborted id; loud on committed or unknown. */
  def abort(spark: SparkSession, topicDir: String, txnId: String): Unit =
    resolve(spark, topicDir, txnId, to = "aborted", illegal = "committed")

  private def resolve(spark: SparkSession, topicDir: String, txnId: String,
                      to: String, illegal: String): Unit = {
    checkId(txnId)
    val (hfs, _) = Topic.fs(spark, topicDir)
    val (state, _) = stateOf(spark, topicDir, txnId)
    state match {
      case `to` => () // idempotent: a retried control message is a no-op
      case "pending" =>
        if (!hfs.rename(marker(topicDir, txnId, "pending"), marker(topicDir, txnId, to)))
          throw new IllegalStateException(
            s"could not transition transaction '$txnId' to $to (concurrent resolver?)")
      case `illegal` => throw new IllegalStateException(
        s"transaction '$txnId' on $topicDir is already $illegal and cannot be $to")
      case _ => throw new IllegalStateException(
        s"unknown transaction '$txnId' on $topicDir — nothing was published under it")
    }
  }

  /** The coordinator-timeout sweep: abort every pending transaction whose
    * marker heartbeat (file mtime — refreshed by each publish) is older
    * than `ttlMs`. Returns the aborted ids. Run it before consumers that
    * need last-stable-offset to advance past a crashed producer. */
  def abortStale(spark: SparkSession, topicDir: String, ttlMs: Long): Seq[String] = {
    val (hfs, _) = Topic.fs(spark, topicDir)
    val d = txnDir(topicDir)
    if (!hfs.exists(d)) return Nil
    val now = System.currentTimeMillis()
    hfs.listStatus(d).toSeq
      .filter(st => st.getPath.getName.endsWith(".pending")
        && now - st.getModificationTime > ttlMs)
      .map { st =>
        val id = st.getPath.getName.stripSuffix(".pending")
        abort(spark, topicDir, id)
        System.err.println(s"[graft] aborted stale transaction '$id' on $topicDir")
        id
      }
  }

  private def markerStates(spark: SparkSession, topicDir: String): Seq[(String, String)] = {
    val (hfs, _) = Topic.fs(spark, topicDir)
    val d = txnDir(topicDir)
    if (!hfs.exists(d)) Nil
    else hfs.listStatus(d).toSeq.map(_.getPath.getName)
      .collect { case n if n.count(_ == '.') == 1 =>
        val Array(id, state) = n.split('.'); (id, state)
      }
  }

  /** READ_COMMITTED view of the topic: non-transactional rows plus rows
    * of committed transactions, with pushdown intact (the filter is a
    * broadcast join against the control-plane committed-id set). A topic
    * that never saw a transaction reads unchanged. */
  def readCommitted(spark: SparkSession, topicDir: String): DataFrame = {
    val log = Topic.openReader(spark, topicDir)
    if (!log.columns.contains("txn_id")) return log
    val committed = markerStates(spark, topicDir)
      .collect { case (id, "committed") => id }
    import spark.implicits._
    val dim = committed.toDF("ctid")
    log.join(broadcast(dim), log("txn_id") === dim("ctid"), "left")
      .filter(col("txn_id").isNull || col("ctid").isNotNull)
      .drop("ctid")
  }

  /** Batched read-committed consume: `offset ∈ [from, from+count)` among
    * visible rows, in order — [[Topic.consume]] under READ_COMMITTED. */
  def consumeCommitted(spark: SparkSession, topicDir: String,
                       from: Long, count: Int = 1): DataFrame =
    readCommitted(spark, topicDir)
      .filter(col("offset") >= from && col("offset") < from + count)
      .orderBy("offset")

  /** Kafka's last stable offset: the offset below which every row's fate
    * is decided — hwm when nothing is pending, else one before the first
    * offset any pending transaction holds. A pure metadata read. */
  def lastStableOffset(spark: SparkSession, topicDir: String): Long = {
    val pendingFirst = markerStates(spark, topicDir)
      .collect { case (id, "pending") => stateOf(spark, topicDir, id)._2 }
      .flatten.map(_._1)
    if (pendingFirst.isEmpty) Topic.highWaterMark(spark, topicDir)
    else pendingFirst.min - 1L
  }
}
