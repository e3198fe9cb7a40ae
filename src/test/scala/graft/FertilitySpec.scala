package graft

import org.apache.spark.sql.functions._

/** ta_tokenizer_fertility: the per-source rollup must reconcile exactly
  * with the per-document encode (same trained tokenizer artifact). */
class FertilitySpec extends SparkSpec {

  test("fertility per source reconciles with the per-doc encode") {
    val fert = SparkEntry.queries("ta_tokenizer_fertility")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    // independent route: ta_bpe_encode's per-doc counts joined to source
    val enc = SparkEntry.queries("ta_bpe_encode")(spark, sf)
    val bySrc = enc.join(Tables.documents(spark, sf).select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(sum(col("n_words")).as("w"), sum(col("n_base_symbols")).as("c"),
           sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    assert(fert.keySet === bySrc.keySet)
    fert.foreach { case (src, (w, c, t)) =>
      assert(bySrc(src) === ((w, c, t)), s"totals for $src")
    }

    // merges only ever REDUCE token counts below the char baseline, and a
    // token never represents less than one char
    val rows = SparkEntry.queries("ta_tokenizer_fertility")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "tokens <= chars")
      assert(r.getLong(3) >= r.getLong(1), "tokens >= words")
      assert(r.getDouble(4) === r.getLong(3).toDouble / r.getLong(1))
      assert(r.getDouble(5) === r.getLong(2).toDouble / r.getLong(3))
    }
  }
}
