package graft

import org.apache.spark.sql.functions._

import graft.tools.PlanCheck

/** Drift guard for PlanCheck's BNLJ allowlist: the audit reads the
  * MEASURED broadcast-side row count out of the executed plan, so an
  * allowlisted "tiny" side that a refactor silently grows past the
  * threshold is caught — the allowlist comments alone can't certify
  * size. */
class PlanCheckAuditSpec extends SparkTestBase {

  test("a genuinely tiny broadcast side passes the audit") {
    import spark.implicits._
    val big = spark.range(10000).toDF("id")
    val dim = Seq((1L, "a"), (5000L, "b"), (9999L, "c")).toDF("lo", "tag")
    val df = big.crossJoin(broadcast(dim)).filter(col("id") >= col("lo"))
    df.collect()
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(PlanCheck.auditBnljBuildSides(df, maxRows = 1000).isEmpty)
  }

  test("a deliberately grown broadcast side fails the audit") {
    val big = spark.range(10000).toDF("id")
    val grownDim = spark.range(5000).toDF("lo") // 5000 rows > max of 1000
    val df = big.crossJoin(broadcast(grownDim))
      .filter(col("id") >= col("lo"))
      .groupBy().count()
    df.collect()
    val violations = PlanCheck.auditBnljBuildSides(df, maxRows = 1000)
    assert(violations.nonEmpty, "grown build side must be flagged")
    assert(violations.head.startsWith("BNLJ_GROWN(rows=5000>max=1000)"),
      violations.mkString(","))
  }
}
