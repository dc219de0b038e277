package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The one-switch cluster packaging: a session built with
 * `spark.sql.extensions=graft.GraftExtensions` gets the SQL functions,
 * the fusion rule, and the top-k strategy with no per-session install
 * calls. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions installs functions, rule, and strategy in one switch") {
    val orig = SparkTestBase.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is a STATIC conf read at SparkContext
    // creation — unreachable from a test JVM whose shared context
    // already exists — so drive the same class through the equivalent
    // builder hook (cluster deployments use the conf form)
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      // SQL-level function (no VectorFunctions.register call)
      val cos = s.sql(
        """SELECT vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))""".stripMargin)
        .head.getDouble(0)
      assert(cos == 1.0)

      // optimizer rule active: composed form fuses (non-literal input so
      // constant folding can't collapse the expression first)
      val fused = s.range(3)
        .selectExpr("array(CAST(id AS FLOAT)) AS a",
          "array(CAST(id + 1 AS FLOAT)) AS b")
        .selectExpr(
          "vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b))) AS c")
      assert(fused.queryExecution.optimizedPlan.expressions
        .map(_.toString).mkString.contains("vec_cosine"))

      // planner strategy active WITHOUT TopK.perKey's self-install:
      // hand the session a raw TopKPerKeyNode and let the injected
      // strategy plan it
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.GraftSqlBridge
      val df = s.range(100).selectExpr("id % 5 AS k", "id AS v")
      val node = graft.plans.TopKPerKeyNode(3,
        Seq(GraftSqlBridge.expr(df("k"))),
        Seq(GraftSqlBridge.expr(col("v").desc)
          .asInstanceOf[org.apache.spark.sql.catalyst.expressions.SortOrder]),
        df.queryExecution.analyzed)
      val topk = GraftSqlBridge.ofRows(s, node)
      assert(topk.queryExecution.sparkPlan.toString.contains("TopKPerKey"),
        topk.queryExecution.sparkPlan.toString)
      assert(topk.count() == 15)
    } finally {
      // do NOT s.stop(): the SparkContext is shared with every other spec
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
