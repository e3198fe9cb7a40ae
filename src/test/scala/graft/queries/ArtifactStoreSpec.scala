package graft.queries

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.ArtifactStore
import org.apache.spark.sql.functions._

/** The train-once artifact store: IVF centroids persist as parquet and
  * reload bit-identically; `ArtifactStore.invalidate` evicts both the
  * JVM caches and the persisted artifacts so a CHANGED corpus actually
  * retrains (without it, a long-lived session would serve stale
  * results forever — the round-2 review finding).
  */
class ArtifactStoreSpec extends graft.SparkSpec {

  private def copyCorpus(from: String, tables: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-corpus")
    tables.foreach { t =>
      Files.copy(Paths.get(s"$from/$t.parquet"), dir.resolve(s"$t.parquet"),
                 StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  private def embWithNorm(dir: String) =
    graft.Tables.embeddings(spark, dir)
      .withColumn("nrm", graft.functions.Vectors.nativeNorm(col("embedding")))

  test("centroids persist as a parquet artifact, reload exactly, and invalidate retrains") {
    graft.functions.FloatDot.register(spark)
    val dirA = copyCorpus(sf, Seq("embeddings"))

    // train at k=8: JVM cache + parquet artifact both populated
    val c1 = SimilarityQueries2.centroids(embWithNorm(dirA), dirA, 8)
    assert(c1.size == 8)
    val artifactPath = ArtifactStore.pathFor(dirA, "ivf-centroids-k8")
    assert(Files.exists(Paths.get(artifactPath)), s"artifact missing: $artifactPath")

    // a DIFFERENT corpus (first 300 vectors) whose artifact path we seed
    // with corpus A's file: centroids() must take the LOAD path (no JVM
    // cache entry for dirB) — proven by getting A's centroids back even
    // though B's data would train different ones
    val dirB = copyCorpus(sf, Seq("embeddings"))
    spark.read.parquet(s"$dirA/embeddings.parquet").limit(300)
      .write.mode("overwrite").parquet(s"$dirB/embeddings.parquet")
    val bArtifact = ArtifactStore.pathFor(dirB, "ivf-centroids-k8")
    Files.createDirectories(Paths.get(bArtifact).getParent)
    copyTree(Paths.get(artifactPath), Paths.get(bArtifact))
    val cLoaded = SimilarityQueries2.centroids(embWithNorm(dirB), dirB, 8)
    assert(cLoaded.map(_._1) == c1.map(_._1))
    assert(cLoaded.zip(c1).forall { case ((_, v1, n1), (_, v2, n2)) =>
      java.util.Arrays.equals(v1, v2) && n1 == n2 }, "parquet reload not bit-identical")

    // invalidate B: artifact gone, JVM cache evicted → next call RETRAINS
    // on B's actual (truncated) corpus and diverges from A's centroids
    ArtifactStore.invalidate(spark, dirB)
    assert(!Files.exists(Paths.get(bArtifact)), "invalidate left the artifact")
    val cRetrained = SimilarityQueries2.centroids(embWithNorm(dirB), dirB, 8)
    assert(!cRetrained.zip(c1).forall { case ((_, v1, _), (_, v2, _)) =>
      java.util.Arrays.equals(v1, v2) }, "invalidate did not retrain")

    ArtifactStore.invalidate(spark, dirA)
  }

  test("band candidates persist as parquet, reload from the artifact, invalidate rebuilds") {
    val dirA  = copyCorpus(sf, Seq("documents"))
    val docsA = graft.Tables.documents(spark, dirA)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // first call builds AND persists; result must equal the direct build
    val direct = pairSet(DedupQueries.bandCandidates(docsA))
    assert(direct.nonEmpty, "fixture produced no candidate pairs")
    val cached = pairSet(DedupQueries.bandCandidatesCached(docsA, dirA))
    assert(cached == direct)
    val artifactA = ArtifactStore.pathFor(dirA, "lsh-band-candidates")
    assert(Files.exists(Paths.get(artifactA)), s"artifact missing: $artifactA")

    // corpus B holds only 100 docs, but its artifact path is seeded with
    // A's parquet: the cached accessor must take the LOAD path — proven
    // by getting A's full pair set back, which B's data cannot produce
    val dirB = copyCorpus(sf, Seq("documents"))
    spark.read.parquet(s"$dirA/documents.parquet").limit(100)
      .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    val artifactB = ArtifactStore.pathFor(dirB, "lsh-band-candidates")
    Files.createDirectories(Paths.get(artifactB).getParent)
    copyTree(Paths.get(artifactA), Paths.get(artifactB))
    val docsB = graft.Tables.documents(spark, dirB)
    assert(pairSet(DedupQueries.bandCandidatesCached(docsB, dirB)) == direct)

    // invalidate B: artifact deleted, JVM cache evicted → next call
    // REBUILDS from B's truncated corpus and can only see ≤ its doc ids
    ArtifactStore.invalidate(spark, dirB)
    assert(!Files.exists(Paths.get(artifactB)), "invalidate left the artifact")
    val rebuilt = pairSet(DedupQueries.bandCandidatesCached(docsB, dirB))
    assert(rebuilt != direct, "invalidate did not rebuild")
    val maxId = spark.read.parquet(s"$dirB/documents.parquet")
      .agg(max(col("doc_id"))).head().getLong(0)
    assert(rebuilt.forall { case (a, b) => a <= maxId && b <= maxId })

    ArtifactStore.invalidate(spark, dirA)
  }

  test("reliable checkpoint round-trip: dd_dup_clusters agrees with localCheckpoint") {
    val ckDir = Files.createTempDirectory("graft-ck").toString
    // evict any cached labels so both runs actually propagate
    ArtifactStore.invalidate(spark, sf)
    spark.conf.set("spark.graft.checkpointDir", ckDir)
    try {
      val reliable = graft.SparkEntry.queries("dd_dup_clusters")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // reliable checkpoint files actually landed in the configured dir
      assert(Files.walk(Paths.get(ckDir)).filter(Files.isRegularFile(_)).count() > 0,
        "no reliable-checkpoint files written")
      spark.conf.unset("spark.graft.checkpointDir")
      ArtifactStore.invalidate(spark, sf)
      val local = graft.SparkEntry.queries("dd_dup_clusters")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(reliable == local, "checkpoint modes disagree")
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
      ArtifactStore.invalidate(spark, sf)
    }
  }

  private def copyTree(from: Path, to: Path): Unit = {
    Files.walk(from).forEach { p =>
      val dest = to.resolve(from.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(dest)
      else {
        Files.createDirectories(dest.getParent)
        Files.copy(p, dest, StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }
}
