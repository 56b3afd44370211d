package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, SkewJoin}

/** Semantics of the temporal/skew join operators. */
class AsofJoinSpec extends SparkTestBase {
  import org.apache.spark.sql.Row

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof backward: latest right at-or-before each left row, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),  // after r1 → r1
      (2L, 10L, ts("2024-01-01 00:00:10")),  // exactly r2's ts → inclusive
      (3L, 10L, ts("2024-01-01 00:00:01")),  // before any right → null
      (4L, 20L, ts("2024-01-01 00:00:30"))   // other user, no rights → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:03"), 1.5),
      (101L, 10L, ts("2024-01-01 00:00:10"), 2.5)
    ).toDF("event_id", "user_id", "ts", "value")

    val out = AsofJoin.backward(left, right, Seq("user_id"), "ts", "ts",
        payload = Seq("event_id", "value"), prefix = "prior_")
      .select("event_id", "prior_event_id", "prior_value")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(out == Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None, 4L -> None))
  }

  test("asof backward: same-ts right rows resolved by tiebreak (greatest wins)") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:10"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 00:00:10"), 1.0),
      (101L, 10L, ts("2024-01-01 00:00:10"), 2.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsofJoin.backward(left, right, Seq("user_id"), "ts", "ts",
        payload = Seq("event_id"), rightTiebreak = Seq("event_id"))
      .select("asof_event_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(101L))
  }

  test("salted equi-join equals the plain join") {
    import spark.implicits._
    // key 1 is hot: 100 rows; plain vs salted must agree exactly
    val big = ((1 to 100).map(i => (1L, i.toDouble)) ++
      Seq((2L, 1.0), (3L, 2.0))).toDF("k", "v")
    val small = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k2", "name")

    val plain = big.join(small, col("k") === col("k2"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", "k2", col("v"), buckets = 4)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
    assert(plain == Set(("a", 100L), ("b", 1L)))
  }
}
