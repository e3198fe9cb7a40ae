package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the declared query surface to the committed manifest.
  *
  * Round 4 shipped a correctness file that silently DROPPED 41 queries
  * (their dumps errored, so the compare never saw them) while still
  * reading as 122/122 green. This spec makes any shrink of the declared
  * set a compile-adjacent failure: removing (or renaming) a query without
  * consciously editing QUERIES.txt fails the suite, and adding one
  * requires adding its manifest line in the same commit.
  */
class ManifestSpec extends AnyFunSuite {

  private def manifest: Seq[String] = {
    val src = scala.io.Source.fromFile("QUERIES.txt")
    try src.getLines().map(_.trim).filter(_.nonEmpty).toList
    finally src.close()
  }

  test("declared queries exactly match the committed manifest") {
    val declared = SparkEntry.queries.keySet
    val locked   = manifest.toSet
    val missing  = locked -- declared   // a shrink: the round-4 failure mode
    val extra    = declared -- locked   // an add without a manifest update
    assert(missing.isEmpty,
      s"queries dropped vs QUERIES.txt (round-4 failure mode): ${missing.toSeq.sorted.mkString(", ")}")
    assert(extra.isEmpty,
      s"queries missing from QUERIES.txt — add them: ${extra.toSeq.sorted.mkString(", ")}")
  }

  test("every declared query has a DuckDB oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracle SQL (driver records only a weak rows-check): ${noOracle.toSeq.sorted.mkString(", ")}")
  }

  test("manifest has no duplicate names") {
    val dup = manifest.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dup.isEmpty, s"duplicate manifest lines: ${dup.mkString(", ")}")
  }
}
