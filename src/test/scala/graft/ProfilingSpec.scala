package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {

  test("observe metrics match direct aggregation without a second scan") {
    val (df, obs) = Profiling.observedScan(spark, Sf)
    df.write.format("noop").mode("overwrite").save() // one action, one scan
    val m = obs.get
    val direct = Tables.lineitem(spark, Sf)
      .agg(count(lit(1)).as("n"),
        sum(when(!col("l_quantity").between(1.0, 50.0), 1L).otherwise(0L)).as("v"),
        graft.Canon.dsum(col("l_extendedprice")).as("t"))
      .head()
    assert(m("n_rows") === direct.getLong(0))
    assert(m("qty_violations") === direct.getLong(1))
    assert(m("control_total") === direct.getDouble(2))
  }
}
