package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The decision side of `q52_skew_profile`: the declared query is the
  * REPORT (hot-key concentration of a join key); this turns the report's
  * threshold into an actual plan change, so the advisory table drives
  * strategy instead of just describing the problem.
  *
  * Strategy rule: when the hottest key holds at least `top1Threshold` of
  * the rows, a plain shuffle join pins that key's entire row mass on one
  * reducer — the planner switches to a SALTED join: fact rows spread
  * over `salts` residues of a deterministic per-row salt source, the dim
  * side replicated per salt (dim × salts rows — cheap while the dim is
  * dim-sized), join key widened to (key, salt). Below the threshold the
  * plain join is strictly better (no dim replication, one exchange).
  * AQE's skew-join split is the third option and needs no planner — it
  * is config, proven separately in SkewSpec; this planner is for the
  * aggregation-free-shuffle case AQE cannot rescue (e.g. when the
  * downstream wants the (key, salt) partitioning reused).
  */
object SkewPlanner {

  /** The q52 decision scalars for an arbitrary keyed frame: one
    * map-side-combined count per key + a 3-scalar aggregate (never a
    * global sort). */
  final case class SkewProfile(nRows: Long, distinctKeys: Long, maxKeyRows: Long) {
    def top1Share: Double = if (nRows == 0) 0.0 else maxKeyRows.toDouble / nRows
  }

  def profileKey(df: DataFrame, key: Column): SkewProfile = {
    val r = df.groupBy(key.as("k")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")), count(lit(1)), max(col("n"))).head()
    if (r.isNullAt(0)) SkewProfile(0L, 0L, 0L)
    else SkewProfile(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** The advisory threshold, applied: "salted" when the top key's share
    * crosses it, else "plain". */
  def joinStrategy(p: SkewProfile, top1Threshold: Double = 0.05): String =
    if (p.top1Share >= top1Threshold) "salted" else "plain"

  /** Profile-driven equi-join of a fact frame with a dim: measures the
    * fact side's key skew, then joins plain or salted per
    * [[joinStrategy]]. Returns (chosen strategy, joined frame) so
    * callers — and the A/B test — can see which way the threshold went.
    *
    * @param saltSrc deterministic per-row salt source on the fact side
    *   (an id column); `pmod(saltSrc, salts)` spreads the hot key over
    *   `salts` reducers.
    */
  def skewAwareJoin(fact: DataFrame, dim: DataFrame, key: String,
                    saltSrc: Column, salts: Int = 8,
                    top1Threshold: Double = 0.05): (String, DataFrame) =
    joinStrategy(profileKey(fact, col(key)), top1Threshold) match {
      case "plain" => ("plain", fact.join(dim, key))
      case _ =>
        val dimS = dim.withColumn("__salt",
          explode(array((0 until salts).map(lit(_)): _*)))
        val factS = fact.withColumn("__salt",
          pmod(saltSrc, lit(salts)).cast("int"))
        ("salted", factS.join(dimS, Seq(key, "__salt")).drop("__salt"))
    }
}
