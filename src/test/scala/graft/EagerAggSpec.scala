package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** q82_eager_agg: the rewrite is only admissible if it is EXACT, and
  * only worth declaring if it measurably shrinks the join's shuffle.
  * Both proven here, by value comparison and by task-metric bytes.
  */
class EagerAggSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def shuffleBytes(df: => DataFrame): Long = {
    val written = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) written.add(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      df.collect()
      var prev = -1L; var cur = written.sum(); var tries = 0
      while (cur != prev && tries < 50) {
        Thread.sleep(200); prev = cur; cur = written.sum(); tries += 1
      }
      cur
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("eager and naive forms are value-identical") {
    val e = queries.RelationalQueries15.eager(spark, dir).collect()
    val n = queries.RelationalQueries15.naive(spark, dir).collect()
    assert(e.map(_.toSeq.toList).toList == n.map(_.toSeq.toList).toList)
    assert(e.length == 5) // the five order priorities
  }

  test("the eager form shuffles measurably fewer bytes") {
    // disable broadcast so BOTH forms take the shuffle-join path the
    // rewrite exists for (at 100 TB neither side broadcasts); AQE off
    // so measured bytes reflect the declared plans, not runtime luck
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val eagerB = shuffleBytes(queries.RelationalQueries15.eager(spark, dir))
      val naiveB = shuffleBytes(queries.RelationalQueries15.naive(spark, dir))
      // lineitem collapses ~4:1 per order before the join, so the wire
      // total should drop well below the naive form's; 0.75 is a
      // conservative trip-line (measured ~0.5 at sf0.01)
      assert(eagerB > 0 && naiveB > 0)
      assert(eagerB < naiveB * 3 / 4,
        s"eager=$eagerB naive=$naiveB — pre-aggregation is not shrinking the shuffle")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
