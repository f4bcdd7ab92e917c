package graft

import org.apache.spark.sql.SparkSessionExtensions

import org.apache.spark.sql.catalyst.expressions.graftgsw.GswExpressions
import graft.gsw.Gsw

class ExpressionSpec extends SparkTestBase {

  test("native expressions register and evaluate through SQL (codegen path)") {
    GswExpressions.registerInto(spark)
    val r = spark.sql(
      """SELECT gsw_sigma0(34.7118, 28.8099) AS s0,
        |       gsw_z_from_p(1000.0, 4.0) AS z,
        |       gsw_p_from_z(-992.0919060719987, 4.0) AS p,
        |       gsw_distance(0.0, 0.0, 0.0, 1.0) AS d""".stripMargin).collect()(0)
    assert(r.getDouble(0) == Gsw.sigma0(34.7118, 28.8099))
    assert(r.getDouble(1) == Gsw.zFromP(1000.0, 4.0))
    assert(math.abs(r.getDouble(2) - 1000.0) < 1e-6)
    assert(r.getDouble(3) == Gsw.distance(0.0, 0.0, 0.0, 1.0))
  }

  test("expressions run inside whole-stage codegen over a table") {
    GswExpressions.registerInto(spark)
    // range source so the projection survives to runtime (a LocalRelation of
    // literals gets constant-folded at plan time)
    spark.range(1, 101)
      .selectExpr("cast(id as double) * 10 as p", "cast(4.0 as double) as lat")
      .createOrReplaceTempView("ptab")
    val q = spark.sql("SELECT p, gsw_z_from_p(p, lat) AS z FROM ptab")
    // plan check: the '*(n)' prefix marks operators inside a
    // WholeStageCodegen span — the projection with gsw_z_from_p carries it
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("gsw_z_from_p") && l.trim.startsWith("*(")),
      s"gsw projection not inside a codegen span:\n$plan")
    val rows = q.collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == Gsw.zFromP(r.getDouble(0), 4.0))
    }
  }

  test("null intolerance: null input -> null output") {
    GswExpressions.registerInto(spark)
    val r = spark.sql("SELECT gsw_sigma0(CAST(NULL AS DOUBLE), 20.0) AS s").collect()(0)
    assert(r.isNullAt(0))
  }

  test("GraftExtensions injects all four functions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // throws if the builder shapes are wrong
    assert(GswExpressions.all.map(_._1.funcName).sorted ==
      Seq("gsw_distance", "gsw_p_from_z", "gsw_sigma0", "gsw_z_from_p"))
  }
}
