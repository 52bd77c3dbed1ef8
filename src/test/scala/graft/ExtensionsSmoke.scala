package graft

import org.apache.spark.sql.SparkSession

/** Driven via `Test/runMain graft.ExtensionsSmoke` — needs a fresh JVM
  * because extensions apply only at session construction.
  */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                graft_mode(v) AS m
         FROM VALUES ('a'), ('b'), ('a') AS t(v)""").collect()(0)
    assert(r.getDouble(0) == 11.0, s"dot ${r.getDouble(0)}")
    assert(r.getString(1) == "a", s"mode ${r.getString(1)}")
    // injected optimizer rule: the cartesian interlock must fire
    // through the REAL injection path, not just direct application
    spark.conf.set(graft.plans.CartesianGuard.ConfKey, "true")
    val fired =
      try {
        spark.range(5).toDF("a")
          .crossJoin(spark.range(5).toDF("b")).collect()
        false
      } catch {
        case t: Throwable =>
          Option(t.getMessage).exists(_.contains("cartesian interlock")) ||
            Option(t.getCause).flatMap(c => Option(c.getMessage))
              .exists(_.contains("cartesian interlock"))
      }
    assert(fired, "injected CartesianGuard did not fire")
    spark.conf.unset(graft.plans.CartesianGuard.ConfKey)
    println("EXTENSIONS_OK")
    spark.stop()
  }
}
