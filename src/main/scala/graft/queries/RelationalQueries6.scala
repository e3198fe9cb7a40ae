package graft.queries

import graft.{Q, Tables}

/** Batch 6: correlated LATERAL subquery join — per-customer top-2 orders
  * through SQL's lateral form (both engines plan it as the window top-k /
  * correlated-limit it is; q08/q36 are the DataFrame formulations of the
  * same shape).
  */
object RelationalQueries6 {

  def defs: Map[String, Q] = Map(

    "q43_lateral_join" -> Q(
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("q43_customer")
      Tables.orders(s, d).createOrReplaceTempView("q43_orders")
      s.sql(
        """SELECT c_custkey, o_orderkey, o_totalprice
          |FROM q43_customer, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM q43_orders
          |  WHERE o_custkey = c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
    }
  )
}
