package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under `{sfDir}/{name}.parquet`. All queries
  * go through here so the scan path is uniform: native columnar Parquet
  * reads with Catalyst predicate pushdown and column pruning — at 100 TB
  * these directories would be partitioned datasets and nothing here changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  /** events.ts has shipped as either TIMESTAMP(NANOS) or TIMESTAMP(MICROS,
    * NTZ) across fixture generations. Spark 4 refuses to read nanos as a
    * timestamp, so when the file carries nanos we read them as a long
    * (runtime-settable legacy conf) and truncate to µs — the same
    * floor-division DuckDB applies casting TIMESTAMP_NS → TIMESTAMP. A µs
    * NTZ column is cast to TimestampType: every session here runs in UTC,
    * so the wall-clock mapping is identity and matches DuckDB's naive
    * TIMESTAMP. Either way downstream queries always see a µs
    * TimestampType `ts`, same as every prior round.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Spread a scan whose FILE LAYOUT under-parallelizes the session
    * (guide §2.5 "input skew … one huge unsplittable file: repartition
    * immediately after the read"). The test corpora ship as one
    * single-row-group parquet file per table at sf0.1 (8 at the synth
    * sf10), so a map-heavy lineage — codegen kernels, per-row
    * XML/JSON/variant parses, md5 probes — runs on 1–8 cores of the 32
    * no matter how cheap its plan is; the round-10 kernel rewrites made
    * this the dominant cost of the converted queries. The gate is
    * SCALE-ADAPTIVE, not a constant: it fires only when the planned
    * scan partition count is below the session's parallelism, which a
    * production 100 TB layout (thousands of splits) never triggers —
    * there this is a no-op and NO exchange is added. Call sites are the
    * queries whose per-row work dominates their scan (a cheap scan
    * gains nothing and skips the shuffle by staying un-spread).
    *
    * The repartition is HASH-KEYED on the table's unique id, never
    * round-robin: a keyless repartition(n) first pays a local sort of
    * its full input rows (spark.sql.execution.sortBeforeRepartition,
    * needed for retry determinism) — measured 26→29 s on q61 / 33→43 s
    * on q62 at sf10, i.e. the sort cost more than the exchange bought —
    * while a deterministic unique key needs no sort and spreads evenly
    * (guide §2.5).
    *
    * Round 11: the gate reads the FILE INDEX, not `df.rdd` — the old
    * form built a full QueryExecution plus a row-deserializing RDD
    * lineage on the driver per call site (ADVICE r10), and it did that
    * even at production layouts where the gate then no-ops. The task
    * estimate mirrors Spark's own split sizing (maxSplitBytes =
    * min(maxPartitionBytes, max(openCost, bytesPerCore))), so the
    * decision matches the planned scan partition count the old gate
    * read: fires at the test layouts (sf0.1: 1 task; synth sf10: 24),
    * no-ops at any layout with ≥ cores worth of splits. Inputs under
    * 256 KB skip the spread outright — at the two smallest verify SFs
    * a 32-way exchange of a few-KB table was pure task-launch overhead
    * (mm_tile_dedup anti-scaled: 32c slower than 8c). */
  def spread(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val sess = df.sparkSession
    val p = sess.sparkContext.defaultParallelism
    val rels = df.queryExecution.analyzed.collect {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        l.relation.asInstanceOf[HadoopFsRelation]
    }
    if (rels.isEmpty) return df
    val sizes = rels.flatMap(_.location.listFiles(Nil, Nil)).flatMap(_.files.map(_.getLen))
    val total = sizes.sum
    val conf = sess.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    val minPart = conf.filesMinPartitionNum.getOrElse(p)
    val maxSplit = math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, (total + sizes.length * openCost) / math.max(1, minPart)))
    val estTasks = sizes.map(sz => (sz + maxSplit - 1) / maxSplit).sum
    if (estTasks < p && total >= 256 * 1024) df.repartition(p, col(key)) else df
  }
}
