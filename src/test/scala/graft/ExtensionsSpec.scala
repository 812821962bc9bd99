package graft

import org.apache.spark.sql.SparkSession

/** End-to-end audit of the `spark.sql.extensions` deployment path: a
  * session built with [[graft.plans.GraftExtensions]] must expose every
  * engine function by SQL name and run the injected optimizer rule —
  * with NO programmatic register() calls. This is how the engine attaches
  * to a cluster you don't own the driver code of
  * (`--conf spark.sql.extensions=graft.plans.GraftExtensions`).
  */
class ExtensionsSpec extends SparkSuite {

  test("a session built with GraftExtensions has functions and rules, SQL-only") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      locally {
        // functions resolve by SQL name (injected, not register()ed)
        val r = ext.sql(
          """SELECT graft_polyhash('abc') AS h,
            |       quantized_dot(array(CAST(1.5 AS FLOAT)),
            |                     array(CAST(2.0 AS FLOAT))) AS d,
            |       quantized_norm2(array(CAST(1.5 AS FLOAT))) AS n2
            |""".stripMargin).head()
        assert(r.getLong(0) == graft.plans.PolyHash.hash("abc"))
        assert(r.getLong(1) == 1500000L * 2000000L)
        assert(r.getLong(2) == 1500000L * 1500000L)
        // the injected optimizer rule rewrites SQL-level self-dots too
        // (over a non-foldable column — a literal self-dot would just be
        // constant-folded away before the plan is inspectable)
        val q = ext.sql(
          "SELECT quantized_dot(array(CAST(id AS FLOAT)), array(CAST(id AS FLOAT))) FROM range(3)")
        assert(q.queryExecution.optimizedPlan.toString.contains("quantized_norm2"),
          "SelfDotToNorm must fire in an extensions-built session")
        // NOTE: no ext.stop() — SparkSession.stop() would stop the
        // SHARED SparkContext out from under the remaining suites; the
        // extra session is just session state and is garbage-collected.
      }
    } finally {
      // restore the suite's session bindings whatever happened above
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
