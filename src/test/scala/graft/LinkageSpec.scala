package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-8 linkage kernels: `graft_fold_text` (Unicode fold) and
  * `graft_jaro_winkler` (Jaro–Winkler similarity). Scalar semantics are
  * pinned against values probed from DuckDB 1.0 (the oracle engine) so a
  * drift in either implementation surfaces here before the correctness
  * gate; the DataFrame paths exercise whole-stage codegen, and a
  * codegen-disabled pass pins interpreted eval to the same results. */
class LinkageSpec extends SparkSpec {

  import spark.implicits._

  /** Run `body` with whole-stage codegen and expression codegen off. */
  private def noCodegen[T](body: => T): T = {
    val keys = Seq("spark.sql.codegen.wholeStage", "spark.sql.codegen.factoryMode")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "false"); spark.conf.set(keys(1), "NO_CODEGEN")
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // ---- graft_fold_text ---------------------------------------------------

  test("fold: NFC/NFD accents strip to base letters, case folds") {
    graft.functions.FoldText.register(spark)
    // é both precomposed (U+00E9) and decomposed (e + U+0301) fold alike
    val rows = Seq("École", "École", "ECOLE", "à ü", "plain ASCII")
      .toDF("s").select(call_function("graft_fold_text", col("s")).as("f"))
      .collect().map(_.getString(0))
    assert(rows.toSeq === Seq("ecole", "ecole", "ecole", "a u", "plain ascii"))
  }

  test("fold: output is NFC (composed) for sequences that keep their marks") {
    graft.functions.FoldText.register(spark)
    // ñ decomposes to n + combining tilde (U+0303, Mn) — the fold strips
    // it like any accent; verify the ASCII landing and idempotence
    val out = Seq("Mañana", "mañana").toDF("s")
      .select(call_function("graft_fold_text", col("s")).as("f"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("manana", "manana"))
  }

  test("fold: interpreted eval matches codegen") {
    graft.functions.FoldText.register(spark)
    val data = Seq("École", "Straße", "plain", "éàü").toDF("s")
    val cg = data.select(call_function("graft_fold_text", col("s"))).collect().map(_.getString(0))
    val interp = noCodegen {
      data.select(call_function("graft_fold_text", col("s"))).collect().map(_.getString(0))
    }
    assert(interp.toSeq === cg.toSeq)
  }

  // ---- graft_jaro_winkler ------------------------------------------------

  private def jw(a: String, b: String): Double =
    graft.functions.JaroWinklerSim.similarity(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("jaro-winkler: classic values match the DuckDB oracle (probed)") {
    // each expected value probed from duckdb 1.0 jaro_winkler_similarity
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
  }

  test("jaro-winkler: boost applies only above jaro 0.7 (DuckDB parity)") {
    // jaro('aXXXX','aYYYY') = 0.4667 < 0.7 — DuckDB returns it UNBOOSTED
    assert(math.abs(jw("aXXXX", "aYYYY") - 0.4666666666666666) < 1e-12)
  }

  test("jaro-winkler: prefix boost caps at 4 chars") {
    // 9-char shared prefix still boosts with p=4 only: probed 0.96
    assert(math.abs(jw("abcdefghij", "abcdefghiX") - 0.96) < 1e-12)
  }

  test("jaro-winkler: odd transposition counts truncate (DuckDB parity)") {
    // 'abcdef'/'bcadef': 3 out-of-order matches → t = 3/2 = 1 (truncated);
    // DuckDB probes 0.9444..., the t=1 value (t=1.5 would give 0.9166...)
    assert(math.abs(jw("abcdef", "bcadef") - 0.9444444444444445) < 1e-12)
  }

  test("jaro-winkler: empties and no-match edges") {
    // ('','') = 0.0 pins DuckDB parity (probed on 1.0) over the classic
    // "identical strings" reading — see the kernel comment.
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("", "a") === 0.0)
    assert(jw("ab", "ca") === 0.0) // window 0 at len 2: positional only
  }

  test("jaro-winkler: interpreted eval matches codegen") {
    graft.functions.JaroWinklerSim.register(spark)
    val data = Seq(("MARTHA", "MARHTA"), ("blue bolt", "blue gear"),
                   ("abcdef", "bcadef")).toDF("a", "b")
    val cg = data.select(call_function("graft_jaro_winkler", col("a"), col("b")))
      .collect().map(_.getDouble(0))
    val interp = noCodegen {
      data.select(call_function("graft_jaro_winkler", col("a"), col("b")))
        .collect().map(_.getDouble(0))
    }
    assert(interp.toSeq === cg.toSeq)
  }
}
