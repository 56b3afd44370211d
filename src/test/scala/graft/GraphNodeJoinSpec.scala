package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.queries.ClusterQueries

/** Pins the q79 broadcast/shuffle auto-switch now shared by every
  * graph operator with a node-dimension side (q205 labels, q207 alive
  * set, q211/q117 degree vectors): under `graft.graph.broadcastNodes`
  * the node side broadcasts; beyond it NO node-sided BroadcastHashJoin
  * may appear (the footprint that grows linearly with data), and both
  * modes must produce identical rows. autoBroadcastJoinThreshold=-1
  * isolates the explicit hint — hints survive -1, AQE conversions
  * don't. */
class GraphNodeJoinSpec extends SparkTestBase {

  private def runModes(q: String): ((String, Seq[Row]), (String, Seq[Row])) = {
    def run(thr: String): (String, Seq[Row]) = {
      spark.conf.set("graft.graph.broadcastNodes", thr)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val df = SparkEntry.queries(q)(spark, sf())
        val rows = df.collect().toSeq
          .sortBy(_.toSeq.map(String.valueOf).mkString("|"))
        (df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head, rows)
      } finally {
        spark.conf.unset("graft.graph.broadcastNodes")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    (run(Long.MaxValue.toString), run("0"))
  }

  for (q <- Seq("q205_label_propagation", "q211_lcc_profile",
      "q117_triangle_count")) {
    test(s"$q auto-switches its node side: broadcast vs co-shuffled join") {
      val ((bPlan, bRows), (jPlan, jRows)) = runModes(q)
      assert(bPlan.contains("BroadcastHashJoin"),
        "dimension mode should broadcast the node side")
      assert(!jPlan.contains("BroadcastHashJoin"),
        "beyond-broadcast mode must not hash-broadcast the node side " +
          "(its footprint grows linearly with data)")
      assert(bRows == jRows, "both modes must produce identical rows")
    }
  }

  test("q207_kcore_peel produces identical trajectories in both modes") {
    val ((_, bRows), (_, jRows)) = runModes("q207_kcore_peel")
    assert(bRows == jRows)
  }

  test("q207 endpoint filter honors the switch at the plan level") {
    val ns = graft.sources.Tables.supplier(spark, sf()).count()
    val e0 = graft.sources.Tables.lineitem(spark, sf())
      .filter(col("l_orderkey") % 199 === 0)
      .select(col("l_suppkey").cast("long").as("src"),
        (col("l_partkey") % ns + 1L).as("dst"))
    val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val alive = ClusterQueries.q207AlivePlan(e, 5).localCheckpoint()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def planWith(thr: String): String = {
        spark.conf.set("graft.graph.broadcastNodes", thr)
        try ClusterQueries
          .q207FilterPlan(e, alive, ClusterQueries.nodeSide(spark, ns))
          .queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        finally spark.conf.unset("graft.graph.broadcastNodes")
      }
      assert(planWith(Long.MaxValue.toString).contains("BroadcastHashJoin"))
      assert(!planWith("0").contains("BroadcastHashJoin"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
