package graft

import org.apache.spark.sql.functions._

/** Throwaway in-JVM timing probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.engine.GraftSession.local("graft-probe")
    graft.engine.Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    graft.engine.Tables.load(spark, dir, "customer").createOrReplaceTempView("customer")
    graft.engine.Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")

    println("[probe] json: " + spark.sql(
      "SELECT get_json_object(props, '$.k') AS ks FROM events LIMIT 3")
      .collect().mkString(" "))

    try {
      val lat = spark.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          |FROM customer c,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
          |         WHERE o_custkey = c.c_custkey
          |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
          |ORDER BY c.c_custkey LIMIT 5""".stripMargin)
      println("[probe] lateral OK: " + lat.collect().mkString(" "))
    } catch { case e: Exception => println("[probe] lateral FAIL: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
