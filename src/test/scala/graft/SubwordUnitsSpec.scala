package graft

import org.apache.spark.sql.functions._

/** Pins the codegen subword kernel (functions/SubwordUnits.scala) to the
  * declarative HOF formulation it replaced in ta_subword_units — on the
  * documents fixture and on the edges the fixture can't produce
  * (empty/multi-space tokens, odd lengths, diacritics, surrogate pairs). */
class SubwordUnitsSpec extends SparkSpec {

  private def hofUnits = {
    // the round-8 form, verbatim: guarded nested transform over split
    val toks = split(col("text"), " ")
    flatten(transform(toks, tok =>
      when(length(tok) > 0,
        transform(sequence(lit(1), length(tok), lit(2)),
          p => tok.substr(p, lit(2))))
        .otherwise(array().cast("array<string>"))))
  }

  test("kernel ≡ HOF on the documents fixture") {
    graft.functions.SubwordUnits.register(spark)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val diff = docs
      .select(col("doc_id"),
              call_function("graft_subword_units", col("text")).as("k"),
              hofUnits.as("h"))
      .filter(not(col("k") === col("h")))
    assert(diff.count() === 0L)
  }

  test("kernel ≡ HOF on edge strings (code points, empties, spaces)") {
    graft.functions.SubwordUnits.register(spark)
    import spark.implicits._
    val edges = Seq(
      "",                      // no tokens at all
      " ",                     // two empty tokens
      "a",                     // single odd token
      "ab",                    // single exact unit
      "abc de f",              // odd + even + single
      "  double  spaces  ",    // leading/trailing/consecutive empties
      "école naïve",           // precomposed diacritics (BMP, 1 unit = 2 cp)
      "école",           // decomposed: combining mark is its OWN code point
      "a😀b cd",     // surrogate pair mid-token: 😀 is ONE code point
      "😀😁😂" // three astral cps → 2 units
    ).toDF("text")
    val rows = edges
      .select(col("text"),
              call_function("graft_subword_units", col("text")).as("k"),
              hofUnits.as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"mismatch on ${r.getString(0)}")
    }
    // and the astral case really treats the pair as one code point
    val astral = rows.last.getSeq[String](1)
    assert(astral.length === 2)
    assert(astral.head === "😀😁")
  }

  test("counts kernel ≡ grouped units kernel (the fused pre-aggregation)") {
    graft.functions.SubwordUnits.register(spark)
    graft.functions.SubwordCounts.register(spark)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val fromUnits = docs
      .select(col("doc_id"),
              explode(call_function("graft_subword_units", col("text"))).as("unit"))
      .groupBy("doc_id", "unit").agg(count(lit(1)).as("c"))
    val fromCounts = docs
      .select(col("doc_id"),
              explode(call_function("graft_subword_counts", col("text"))).as("u"))
      .select(col("doc_id"), col("u.unit").as("unit"), col("u.c").as("c"))
    // set-equality both directions: the fused kernel's per-doc map must
    // be exactly the grouped occurrence counts
    assert(fromUnits.exceptAll(fromCounts).count() === 0L)
    assert(fromCounts.exceptAll(fromUnits).count() === 0L)
  }
}
