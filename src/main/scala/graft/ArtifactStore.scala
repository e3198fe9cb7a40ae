package graft

import org.apache.spark.sql.SparkSession

/** The train-once store for derived artifacts (IVF centroids, quantizer
  * stats, converged duplicate-cluster labels): a production pipeline
  * trains an index ONCE, persists it, and broadcasts it into every query
  * that follows — retraining per query would re-scan the corpus.
  *
  * Two layers, both keyed by the corpus directory:
  *   - JVM caches inside the query objects (fast path within a session);
  *   - parquet artifacts under [[root]] (survive the JVM, shareable
  *     across drivers — on a cluster, point GRAFT_ARTIFACT_DIR at shared
  *     storage).
  *
  * Both layers assume the corpus at a given path is immutable — true for
  * the test fixtures, false for a long-lived session over changing data.
  * [[invalidate]] is the explicit hook for that case: it drops every
  * JVM-cache entry derived from the corpus (caches register themselves
  * via [[onInvalidate]]) and deletes the persisted artifacts, so the
  * next query retrains.
  */
object ArtifactStore {

  private val listeners =
    scala.collection.mutable.ListBuffer.empty[String => Unit]

  /** Register a JVM-cache eviction hook; called with the corpus dir on
    * every [[invalidate]]. Query objects register once at class init. */
  def onInvalidate(f: String => Unit): Unit =
    listeners.synchronized { listeners += f }

  /** Artifact root: override with GRAFT_ARTIFACT_DIR (a shared filesystem
    * on a real cluster); defaults to the local tmpdir. */
  def root: String = sys.env.getOrElse("GRAFT_ARTIFACT_DIR",
    s"${System.getProperty("java.io.tmpdir")}/graft-artifacts")

  /** One subdirectory per corpus: md5 of the absolute path (collision-free
    * keying) prefixed with the last path segment (human-readable). */
  private def corpusKey(corpusDir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(corpusDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val leaf = corpusDir.replaceAll("/+$", "").split('/').lastOption.getOrElse("corpus")
    s"${leaf.replaceAll("[^A-Za-z0-9._-]", "_")}-${digest.take(12)}"
  }

  /** Where the named artifact for this corpus lives. */
  def pathFor(corpusDir: String, name: String): String =
    s"$root/${corpusKey(corpusDir)}/$name"

  /** Drop everything derived from `corpusDir`: JVM caches (via registered
    * listeners) and persisted artifacts. Call after changing a corpus in
    * place; the next query over it retrains. */
  def invalidate(spark: SparkSession, corpusDir: String): Unit = {
    listeners.synchronized(listeners.toList).foreach(_(corpusDir))
    val (hfs, p) = Topic.fs(spark, s"$root/${corpusKey(corpusDir)}")
    if (hfs.exists(p)) hfs.delete(p, true)
  }
}
