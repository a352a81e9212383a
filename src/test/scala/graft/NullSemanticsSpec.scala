package graft

import org.apache.spark.sql.functions._

/** Engine null-semantics pins. The driver fixtures contain no NULLs (they
  * only arise via outer joins), so these inline tables pin the contract a
  * library user relies on: null grouping, null-skipping aggregates, join
  * key behavior, and null ordering. */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Seq(
    (Some(1L), Some(10.0)),
    (Some(1L), None),
    (None, Some(30.0)),
    (None, None),
    (Some(2L), Some(20.0))
  ).toDF("k", "v")

  test("groupBy treats NULL as its own group; count(col) skips nulls") {
    val rows = t.groupBy("k")
      .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_vals"),
        sum(col("v")).as("sum_v"))
      .collect()
      .map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2), Option(r.get(3))))
      .toSet
    assert(rows === Set(
      (Some(1L), 2L, 1L, Some(10.0)),
      (Some(2L), 1L, 1L, Some(20.0)),
      (None, 2L, 1L, Some(30.0))))
  }

  test("sum/avg over an all-NULL slice is NULL, not 0") {
    val r = t.filter(col("k").isNull && col("v").isNull)
      .agg(sum(col("v")), avg(col("v"))).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("inner join drops NULL keys; null-safe equality keeps them") {
    val other = Seq(Some(1L), None).toDF("k")
    val plain = t.join(other, t("k") === other("k")).count()
    assert(plain === 2L, "= never matches NULL")
    val nullSafe = t.join(other, t("k") <=> other("k")).count()
    // 2 rows k=1 match, and the 2 k=NULL rows each match other's NULL row
    assert(nullSafe === 4L)
  }

  test("asc sorts NULLs first by default; desc sorts them last") {
    val asc = t.select("k").orderBy(col("k").asc).collect().map(r => Option(r.get(0)))
    assert(asc.take(2).forall(_.isEmpty))
    val desc = t.select("k").orderBy(col("k").desc).collect().map(r => Option(r.get(0)))
    assert(desc.takeRight(2).forall(_.isEmpty))
  }

  test("distinct collapses NULLs to one; set ops treat NULL = NULL") {
    assert(t.select("k").distinct().count() === 3L)
    val a = Seq(Option.empty[Long], Some(1L)).toDF("k")
    val b = Seq(Option.empty[Long]).toDF("k")
    assert(a.intersect(b).count() === 1L, "INTERSECT matches NULL with NULL")
    assert(a.except(b).as[Option[Long]].collect().toSeq === Seq(Some(1L)))
  }
}
