package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/**
 * Behavioral / interaction-data curation: the operators an SFT or
 * agent-trajectory pipeline runs over event logs and labeled corpora —
 * a learned (Naive Bayes) classifier trained and applied wholly inside
 * the engine, session-trajectory fingerprint dedup, multi-touch
 * conversion attribution, and conversation turn-structure validation.
 *
 * Reference scope: PyAirbyte lands event streams into the cache and
 * delegates analytics to SQL (SURVEY §2.11); these are the analytics a
 * training-data team runs on that cache before export. All scoring is
 * integer arithmetic (log-probabilities in micro-units, credits in
 * micro-credits) so Spark and the DuckDB oracle agree bit-for-bit —
 * the q139/q140 parity rule.
 */
object BehaviorQueries {

  private val Gap = 1800L // session gap seconds, the q16 convention

  // ------------------------------------------------------------------
  // q159: multinomial Naive Bayes language classifier, trained and
  // scored in one relational plan (no driver-side model object).
  //
  // Train split doc_id % 5 != 0; held-out docs are scored against every
  // class and the confusion matrix (true_lang, pred_lang, n) comes out.
  // Laplace-smoothed log P(token|class) and log-priors are fixed to
  // BIGINT micro-units BEFORE summation, so per-doc scores are exact
  // integer sums — order-independent, identical in both engines; the
  // argmax tie-break is (score desc, lang asc).
  //
  // Scale shape: the model IS two aggregates — (class, token) counts
  // (one hash shuffle on the token stream) and a 16-row class table
  // that rides a broadcast. Scoring explodes held-out docs to (doc,
  // token, tf), crosses the 16-class table (broadcast), and left-joins
  // the count table on (token, class) — a key-partitioned join that
  // grows linearly with the scored corpus; nothing is collected.
  // Tokens unseen in training are dropped (standard NB practice) via a
  // semi-join against the training vocabulary.
  // ------------------------------------------------------------------
  def q159NaiveBayes(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val train = toks.filter(col("doc_id") % 5 =!= 0)

    // model: per-(class, token) counts + per-class totals + priors
    val counts = train.groupBy(col("lang").as("c"), col("t"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // read by class totals, vocab, and scoring join
    val vocabSize = counts.agg(countDistinct(col("t")).as("v"))
    val classes = counts.groupBy(col("c")).agg(sum(col("cnt")).as("tok_c"))
      .join(docs.filter(col("doc_id") % 5 =!= 0)
        .groupBy(col("lang").as("c")).agg(count(lit(1)).as("docs_c")), "c")
      .crossJoin(broadcast(docs.filter(col("doc_id") % 5 =!= 0)
        .agg(count(lit(1)).as("docs_n"))))
      .crossJoin(broadcast(vocabSize))
      .select(col("c"), col("tok_c"), col("v"),
        micros(log(col("docs_c").cast(DoubleType) /
          col("docs_n").cast(DoubleType))).as("prior_micro"))

    // held-out term frequencies, restricted to the training vocabulary
    val testTf = toks.filter(col("doc_id") % 5 === 0)
      .groupBy(col("doc_id"), col("lang").as("true_lang"), col("t"))
      .agg(count(lit(1)).as("tf"))
      .join(counts, Seq("t"), "left_semi")

    val scored = testTf
      .crossJoin(broadcast(classes))
      .join(counts, Seq("t", "c"), "left_outer")
      .withColumn("lp_micro", micros(log(
        (coalesce(col("cnt"), lit(0L)) + lit(1L)).cast(DoubleType) /
          (col("tok_c") + col("v")).cast(DoubleType))))
      .groupBy(col("doc_id"), col("true_lang"), col("c"))
      .agg((first(col("prior_micro")) + sum(col("tf") * col("lp_micro")))
        .as("score"))
    val pred = scored
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("c").asc)))
      .filter(col("rn") === 1)
    pred.groupBy(col("true_lang"), col("c").as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("true_lang").asc, col("pred_lang").asc)
  }

  /** ln(x) fixed to BIGINT micro-units (round half away from zero in
    * both engines — the q139/q140 integer-parity rule). */
  private def micros(c: Column): Column =
    round(c * lit(1000000.0), 0).cast(LongType)

  val q159Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang, t
      |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
      |        FROM documents) x WHERE t <> ''),
      |counts AS (
      |  SELECT lang AS c, t, COUNT(*) AS cnt FROM tok
      |  WHERE doc_id % 5 <> 0 GROUP BY 1, 2),
      |vocab AS (SELECT COUNT(DISTINCT t) AS v FROM counts),
      |cls AS (
      |  SELECT c, SUM(cnt) AS tok_c FROM counts GROUP BY 1),
      |priors AS (
      |  SELECT lang AS c, COUNT(*) AS docs_c FROM documents
      |  WHERE doc_id % 5 <> 0 GROUP BY 1),
      |dn AS (SELECT COUNT(*) AS docs_n FROM documents WHERE doc_id % 5 <> 0),
      |classes AS (
      |  SELECT cls.c, cls.tok_c, vocab.v,
      |    CAST(round(ln(CAST(priors.docs_c AS DOUBLE)
      |      / CAST(dn.docs_n AS DOUBLE)) * 1000000.0) AS BIGINT) AS prior_micro
      |  FROM cls JOIN priors USING (c), vocab, dn),
      |test_tf AS (
      |  SELECT doc_id, lang AS true_lang, t, COUNT(*) AS tf FROM tok
      |  WHERE doc_id % 5 = 0 AND t IN (SELECT DISTINCT t FROM counts)
      |  GROUP BY 1, 2, 3),
      |scored AS (
      |  SELECT tf.doc_id, tf.true_lang, k.c,
      |    ANY_VALUE(k.prior_micro) + SUM(tf.tf *
      |      CAST(round(ln(CAST(COALESCE(cn.cnt, 0) + 1 AS DOUBLE)
      |        / CAST(k.tok_c + k.v AS DOUBLE)) * 1000000.0) AS BIGINT)) AS score
      |  FROM test_tf tf CROSS JOIN classes k
      |  LEFT JOIN counts cn ON cn.t = tf.t AND cn.c = k.c
      |  GROUP BY 1, 2, 3),
      |pred AS (
      |  SELECT true_lang, c AS pred_lang,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, c ASC) AS rn
      |  FROM scored)
      |SELECT true_lang, pred_lang, COUNT(*) AS n FROM pred WHERE rn = 1
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // q160: session-trajectory fingerprints — sessionize (q16's 30-min
  // gap), serialize each session's ordered event_type sequence, and
  // count how often each behavioral pattern recurs. This is dedup over
  // agent trajectories: the pattern string is the content hash, and
  // the heavy patterns are boilerplate behavior a trajectory-training
  // pipeline down-weights.
  //
  // Scale shape: one window pass per user (the events shuffle on
  // user_id is the only exchange), one hash-agg on the pattern string.
  // The pattern string stays session-sized; nothing is collected.
  // ------------------------------------------------------------------
  def q160DialogPatterns(spark: SparkSession, dir: String): DataFrame = {
    val sess = sessionized(Tables.events(spark, dir))
    val patterns = sess
      .groupBy(col("user_id"), col("sid"))
      .agg(concat_ws(">", transform(
        sort_array(collect_list(struct(
          col("ts").as("ts"), col("event_id").as("event_id"),
          col("event_type").as("event_type")))),
        x => x.getField("event_type"))).as("pattern"))
    patterns.groupBy(col("pattern"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_sessions").desc, col("pattern").asc)
      .limit(20)
  }

  val q160Sql: String =
    s"""WITH lagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    SUM(CASE WHEN prev_ts IS NULL OR
      |        CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
      |        - CAST(FLOOR(epoch(CAST(prev_ts AS TIMESTAMP))) AS BIGINT) > $Gap
      |      THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM lagged),
      |pat AS (
      |  SELECT user_id, sid,
      |    string_agg(event_type, '>' ORDER BY ts, event_id) AS pattern
      |  FROM sess GROUP BY 1, 2)
      |SELECT pattern, COUNT(*) AS n_sessions,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM pat GROUP BY 1 ORDER BY n_sessions DESC, pattern ASC
      |LIMIT 20""".stripMargin

  // ------------------------------------------------------------------
  // q161: multi-touch conversion attribution — every purchase credits
  // the qualifying touchpoints (view / click / signup, same user,
  // within 72 h strictly before it): last-touch gives the single
  // latest touch full credit; linear splits one conversion equally
  // (micro-credit integers, so the split sums exactly).
  //
  // Scale shape: a per-user range self-join (purchases ⋈ touches on
  // user_id + time band). Both sides shuffle once on user_id and the
  // band predicate prunes within the partition; per-purchase credit
  // fan-out is bounded by the 72 h window, not corpus size. The
  // last-touch pick is a bounded per-purchase window, not a global one.
  // ------------------------------------------------------------------
  def q161Attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val touches = ev.filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id"), col("event_id").as("t_id"),
        col("ts").as("t_ts"), col("event_type").as("channel"))
    val joined = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") &&
        col("t_ts") >= col("p_ts") - expr("INTERVAL 72 HOURS"))
    val perPurchase = Window.partitionBy(col("p_id"))
    val credited = joined
      .withColumn("rn", row_number().over(
        perPurchase.orderBy(col("t_ts").desc, col("t_id").desc)))
      .withColumn("n_touch", count(lit(1)).over(perPurchase))
    credited.groupBy(col("channel"))
      .agg(sum(when(col("rn") === 1, 1L).otherwise(0L)).as("last_touch"),
        sum(round(lit(1000000.0) / col("n_touch"), 0).cast(LongType))
          .as("linear_micro"))
      .orderBy(col("channel").asc)
  }

  val q161Sql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS p_id, ts AS p_ts FROM events
      |  WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT user_id, event_id AS t_id, ts AS t_ts, event_type AS channel
      |  FROM events WHERE event_type IN ('view', 'click', 'signup')),
      |j AS (
      |  SELECT p.p_id, t.t_id, t.t_ts, t.channel
      |  FROM p JOIN t USING (user_id)
      |  WHERE t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 72 HOURS),
      |c AS (
      |  SELECT channel,
      |    ROW_NUMBER() OVER (PARTITION BY p_id
      |      ORDER BY t_ts DESC, t_id DESC) AS rn,
      |    COUNT(*) OVER (PARTITION BY p_id) AS n_touch
      |  FROM j)
      |SELECT channel,
      |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch,
      |  CAST(SUM(CAST(round(1000000.0 / n_touch) AS BIGINT)) AS BIGINT)
      |    AS linear_micro
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q162: conversation turn-structure validation — the chat-format
  // checks an SFT pipeline runs before training: sessions become
  // conversations, event roles derive from type (view/click/purchase →
  // user turn, signup/error → system turn), and each conversation is
  // audited for who opens it and whether roles strictly alternate.
  // Output is the corpus-level report: conversations and turn volume
  // per (opening role, alternation-clean) cell.
  //
  // Scale shape: the same single user_id shuffle as q160 feeding two
  // narrow window passes (session id, then within-session lag); the
  // audit is a 4-row aggregate. All integers.
  // ------------------------------------------------------------------
  def q162TurnStructure(spark: SparkSession, dir: String): DataFrame = {
    val sess = sessionized(Tables.events(spark, dir))
      .withColumn("role",
        when(col("event_type").isin("view", "click", "purchase"), lit("user"))
          .otherwise(lit("system")))
    val w = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val conv = sess
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_turns"),
        min(when(col("rn") === 1, col("role"))).as("opens_with"),
        sum(when(col("prev_role") === col("role"), 1L).otherwise(0L))
          .as("repeats"))
    conv.groupBy(col("opens_with"),
      (col("repeats") === 0L).as("alternates"))
      .agg(count(lit(1)).as("n_conversations"),
        sum(col("n_turns")).as("total_turns"),
        max(col("n_turns")).as("max_turns"))
      .orderBy(col("opens_with").asc, col("alternates").asc)
  }

  val q162Sql: String =
    s"""WITH lagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN event_type IN ('view', 'click', 'purchase')
      |         THEN 'user' ELSE 'system' END AS role,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts, event_id, role,
      |    SUM(CASE WHEN prev_ts IS NULL OR
      |        CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
      |        - CAST(FLOOR(epoch(CAST(prev_ts AS TIMESTAMP))) AS BIGINT) > $Gap
      |      THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM lagged),
      |turns AS (
      |  SELECT user_id, sid, role,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, sid
      |      ORDER BY ts, event_id) AS rn,
      |    LAG(role) OVER (PARTITION BY user_id, sid
      |      ORDER BY ts, event_id) AS prev_role
      |  FROM sess),
      |conv AS (
      |  SELECT user_id, sid, COUNT(*) AS n_turns,
      |    MIN(CASE WHEN rn = 1 THEN role END) AS opens_with,
      |    SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS repeats
      |  FROM turns GROUP BY 1, 2)
      |SELECT opens_with, repeats = 0 AS alternates,
      |  COUNT(*) AS n_conversations,
      |  CAST(SUM(n_turns) AS BIGINT) AS total_turns, MAX(n_turns) AS max_turns
      |FROM conv GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Shared sessionization: q16's 30-minute-gap rule, session id as a
    * per-user running sum of gap breaks. One user_id shuffle. */
  /** 30-minute-gap sessionization (THE q16 convention — shared so the
    * session definition cannot fork across q16/q160-family/q270):
    * appends integer `sid` per user from the deterministic
    * (ts, event_id) order. */
  private[queries] def sessionized(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("sid", sum(
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > Gap,
          1).otherwise(0)).over(w))
      .drop("prev_ts")
  }

  // ------------------------------------------------------------------
  // q185: Bradley–Terry preference ranking — the RLHF-data operator
  // that turns logged pairwise outcomes into per-item strengths
  // (Bradley & Terry 1952; minorization-maximization per Hunter 2004,
  // Ann. Statist. 32(1) §1: s_i ← W_i / Σ_j n_ij/(s_i+s_j)).
  //
  // Duels derive from the event log: consecutive events of one user
  // (ts, event_id order) duel their event types; the larger value wins
  // (ties → the earlier event). The corpus stage is one per-user lead()
  // window plus a map-side-combined (winner, loser) count — the only
  // corpus-sized work. The win matrix is ≤ |types|² rows (DIMENSION-
  // sized, independent of corpus scale), so the MM iterations run on
  // the driver — the same collect-the-dimension-side pattern as the
  // compiled ANN kernels — in EXACT BigInt nano-unit arithmetic
  // (floor divisions only, no float order-dependence), 5 iterations,
  // renormalized each round to Σs = |types|·1e9. The oracle replays
  // the identical integer trajectory as one CTE block per iteration
  // (HUGEINT floor division), so strengths compare as exact integers.
  // ------------------------------------------------------------------
  /** q185's corpus stage, pre-collect: ONE user_id window (adjacent
    * duels) + ONE map-side-combined (winner, loser) tally — two
    * exchanges total, the budget the loop plan gate (ExchangeBudgetSpec)
    * pins. The result is ≤ |types|² rows. */
  private[graft] def q185WinMatrixPlan(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val duel = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("a"),
        round(col("value") * 100).cast(LongType).as("v"))
      .withColumn("b", lead(col("a"), 1).over(w))
      .withColumn("vb", lead(col("v"), 1).over(w))
      .filter(col("b").isNotNull && col("a") =!= col("b"))
    duel.select(
        when(col("v") >= col("vb"), col("a")).otherwise(col("b")).as("winner"),
        when(col("v") >= col("vb"), col("b")).otherwise(col("a")).as("loser"))
      .groupBy(col("winner"), col("loser")).agg(count(lit(1)).as("w"))
  }

  def q185BradleyTerry(spark: SparkSession, dir: String): DataFrame = {
    val wins = q185WinMatrixPlan(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // ---- driver-side MM on the dimension-sized matrix ----
    val types = wins.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    val nPair: Map[(String, String), Long] = (for {
      i <- types; j <- types if i != j
      n = wins.getOrElse((i, j), 0L) + wins.getOrElse((j, i), 0L) if n > 0
    } yield (i, j) -> n).toMap
    val wTot: Map[String, Long] =
      types.map(i => i -> wins.collect { case ((a, _), c) if a == i => c }.sum).toMap
    val nGames: Map[String, Long] =
      types.map(i => i -> nPair.collect { case ((a, _), c) if a == i => c }.sum).toMap
    val E27 = BigInt(10).pow(27)
    val E9 = BigInt(1000000000L)
    var s: Map[String, BigInt] = types.map(_ -> E9).toMap
    for (_ <- 1 to 5) {
      val raw = types.map { i =>
        val den = types.collect { case j if nPair.contains((i, j)) =>
          (BigInt(nPair((i, j))) * E27) / (s(i) + s(j)) }.sum
        i -> (if (den > 0) (BigInt(wTot(i)) * E27) / den else BigInt(0))
      }.toMap
      val tot = raw.values.sum
      s = types.map(i => i -> (raw(i) * types.size * E9) / tot).toMap
    }
    val spark2 = spark
    import spark2.implicits._
    types.map(i => (i, wTot(i), nGames(i), s(i).toLong))
      .toDF("event_type", "n_wins", "n_games", "strength_nano")
      .withColumn("strength",
        round(col("strength_nano").cast(DoubleType) / 1000000000d, 6))
  }

  val q185Sql: String = {
    val h = "CAST('1000000000000000000000000000' AS HUGEINT)"
    val iters = (1 to 5).map { k =>
      s"""den$k AS MATERIALIZED (
         |  SELECT n.i, SUM(n.n * $h // (si.s + sj.s)) AS den
         |  FROM n JOIN s${k - 1} si ON si.t = n.i JOIN s${k - 1} sj ON sj.t = n.j
         |  GROUP BY n.i),
         |raw$k AS MATERIALIZED (
         |  SELECT w.i AS t,
         |    CASE WHEN d.den > 0 THEN CAST(w.wi AS HUGEINT) * $h // d.den
         |         ELSE 0 END AS sraw
         |  FROM wtot w JOIN den$k d ON d.i = w.i),
         |s$k AS MATERIALIZED (
         |  SELECT t, CAST(sraw * (SELECT COUNT(*) FROM raw$k) * 1000000000
         |              // (SELECT SUM(sraw) FROM raw$k) AS BIGINT) AS s
         |  FROM raw$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_id, event_type AS a,
       |    CAST(round(value * 100) AS BIGINT) AS v
       |  FROM events),
       |duel AS (
       |  SELECT a, lead(a) OVER w AS b, v, lead(v) OVER w AS vb
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |games AS (
       |  SELECT CASE WHEN v >= vb THEN a ELSE b END AS winner,
       |         CASE WHEN v >= vb THEN b ELSE a END AS loser
       |  FROM duel WHERE b IS NOT NULL AND a <> b),
       |wins AS MATERIALIZED (SELECT winner, loser, COUNT(*) AS w FROM games GROUP BY 1, 2),
       |types AS MATERIALIZED (SELECT winner AS t FROM wins UNION SELECT loser FROM wins),
       |n AS MATERIALIZED (
       |  SELECT i, j, CAST(SUM(w) AS BIGINT) AS n FROM (
       |    SELECT winner AS i, loser AS j, w FROM wins
       |    UNION ALL SELECT loser AS i, winner AS j, w FROM wins)
       |  GROUP BY 1, 2),
       |wtot AS MATERIALIZED (
       |  SELECT t.t AS i, CAST(COALESCE(SUM(w.w), 0) AS BIGINT) AS wi
       |  FROM types t LEFT JOIN wins w ON w.winner = t.t GROUP BY 1),
       |s0 AS MATERIALIZED (SELECT t, CAST(1000000000 AS BIGINT) AS s FROM types),
       |$iters
       |SELECT t.t AS event_type, w.wi AS n_wins, g.ng AS n_games,
       |  s5.s AS strength_nano,
       |  round(CAST(s5.s AS DOUBLE) / 1000000000, 6) AS strength
       |FROM types t
       |JOIN wtot w ON w.i = t.t
       |JOIN (SELECT i, CAST(SUM(n) AS BIGINT) AS ng FROM n GROUP BY 1) g ON g.i = t.t
       |JOIN s5 ON s5.t = t.t""".stripMargin
  }

  // ------------------------------------------------------------------
  // q189: user-journey Markov chain — the empirical event-type
  // transition matrix and its stationary distribution (5 power-
  // iteration steps, dangling mass redistributed uniformly, the
  // PageRank dangling-node convention). q98 reports the matrix itself
  // (per-transition permilles); this derives the LONG-RUN type mix —
  // which event types dominate journeys regardless of where sessions
  // start — the quantity a behavior-mixture sampler actually weights by.
  //
  // Scale shape = q185's: the corpus stage is ONE user_id window
  // (adjacent-event pairs) + ONE map-side-combined (from, to) tally —
  // two exchanges; the transition matrix is ≤ |types|² rows
  // (DIMENSION-sized), so the power iteration runs on the driver in
  // exact BigInt nano-units (floor divisions only — order-independent,
  // oracle-replayable). The oracle replays the identical integer
  // trajectory, one CTE block per iteration (HUGEINT floor division).
  // ------------------------------------------------------------------

  /** q189's corpus stage, pre-collect: the (from, to, n) transition
    * tally. Two exchanges (user window + pair agg) — the loop plan
    * gate (ExchangeBudgetSpec) pins that budget. */
  private[graft] def q189TransitionsPlan(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("a"))
      .withColumn("b", lead(col("a"), 1).over(w))
      .filter(col("b").isNotNull)
      .groupBy(col("a").as("i"), col("b").as("j"))
      .agg(count(lit(1)).as("n"))
  }

  def q189MarkovStationary(spark: SparkSession, dir: String): DataFrame = {
    val n = q189TransitionsPlan(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // ---- driver-side power iteration on the dimension-sized matrix ----
    val types = n.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    val rowTot: Map[String, Long] = types.map(t =>
      t -> n.collect { case ((i, _), c) if i == t => c }.sum).toMap
    val E9 = BigInt(1000000000L)
    var pi: Map[String, BigInt] = types.map(_ -> E9).toMap
    for (_ <- 1 to 5) {
      val flow: Map[String, BigInt] = types.map { j =>
        j -> types.collect {
          case i if rowTot(i) > 0 && n.contains((i, j)) =>
            (pi(i) * BigInt(n((i, j)))) / BigInt(rowTot(i))
        }.sum
      }.toMap
      val dangling = types.collect { case i if rowTot(i) == 0 => pi(i) }.sum
      val share = dangling / types.size
      pi = types.map(j => j -> (flow(j) + share)).toMap
    }
    val spark2 = spark
    import spark2.implicits._
    types.map(t => (t, rowTot(t), pi(t).toLong))
      .toDF("event_type", "n_out", "pi_nano")
      .withColumn("pi",
        round(col("pi_nano").cast(DoubleType) / 1000000000d, 6))
  }

  val q189Sql: String = {
    val iters = (1 to 5).map { k =>
      s"""flow$k AS MATERIALIZED (
         |  SELECT n.j AS t, SUM(CAST(p.s AS HUGEINT) * n.n // r.r) AS f
         |  FROM n JOIN p${k - 1} p ON p.t = n.i JOIN r ON r.i = n.i
         |  GROUP BY n.j),
         |dang$k AS (
         |  SELECT COALESCE(SUM(p.s), 0) AS d
         |  FROM p${k - 1} p LEFT JOIN r ON r.i = p.t WHERE r.i IS NULL),
         |p$k AS MATERIALIZED (
         |  SELECT t.t, CAST(COALESCE(f.f, 0)
         |      + (SELECT d FROM dang$k) // (SELECT COUNT(*) FROM types)
         |    AS BIGINT) AS s
         |  FROM types t LEFT JOIN flow$k f ON f.t = t.t)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_id, event_type AS a FROM events),
       |tr AS (
       |  SELECT a, lead(a) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
       |  FROM ev),
       |n AS MATERIALIZED (
       |  SELECT a AS i, b AS j, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM tr WHERE b IS NOT NULL GROUP BY 1, 2),
       |types AS MATERIALIZED (SELECT i AS t FROM n UNION SELECT j FROM n),
       |r AS MATERIALIZED (SELECT i, CAST(SUM(n) AS BIGINT) AS r FROM n GROUP BY 1),
       |p0 AS (SELECT t, CAST(1000000000 AS BIGINT) AS s FROM types),
       |$iters
       |SELECT t.t AS event_type,
       |  CAST(COALESCE(r.r, 0) AS BIGINT) AS n_out,
       |  p5.s AS pi_nano,
       |  round(CAST(p5.s AS DOUBLE) / 1000000000, 6) AS pi
       |FROM types t
       |LEFT JOIN r ON r.i = t.t
       |JOIN p5 ON p5.t = t.t""".stripMargin
  }

  // ------------------------------------------------------------------
  // q253: sequence-surprisal anomaly screen — the behavioral dual of
  // q89's text surprisal: a first-order Markov model over event-type
  // transitions is fit on the WHOLE log, then every user's trajectory
  // is scored by its mean transition surprisal; the top-20 most
  // improbable trajectories are the bot/replay/instrumentation-bug
  // candidates an interaction-data pipeline quarantines before SFT
  // export (q98's transition matrix tells you THE MODEL; this tells
  // you WHO deviates from it).
  //
  // Exactness: each transition's log-prob addend is
  // round(log2(c_pc)·10⁶) − round(log2(c_p)·10⁶) — both terms rounded
  // to integers separately (counts ≥ 1, so both logs ≥ 0 and HALF_UP
  // agrees in both engines), summed exactly; the per-user mean is ONE
  // truncating division of NON-NEGATIVE integers (−sum is taken before
  // the div so no engine's negative-division convention is in play).
  //
  // Scale shape: one user-partitioned lag window (per-user sequences,
  // the q16 shape), a type-pair-domain-sized transition tally broadcast
  // back, a per-user rollup that reuses the window's user_id
  // partitioning, and a top-20 TakeOrderedAndProject — per-task heaps,
  // never a global sort.
  // ------------------------------------------------------------------
  def q253SequenceSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val trans = ev
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
    val pairC = trans.groupBy(col("prev"), col("event_type"))
      .agg(count(lit(1)).as("cpc"))
    val prevC = trans.groupBy(col("prev")).agg(count(lit(1)).as("cp"))
    val lp = pairC.join(prevC, "prev")
      .select(col("prev"), col("event_type"),
        (round(log2(col("cpc").cast(DoubleType)) * lit(1000000.0), 0)
            .cast(LongType) -
          round(log2(col("cp").cast(DoubleType)) * lit(1000000.0), 0)
            .cast(LongType)).as("a"))
    trans.join(broadcast(lp), Seq("prev", "event_type"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_transitions"), sum(col("a")).as("sum_a"))
      .select(col("user_id"), col("n_transitions"),
        expr("CAST((-sum_a) div n_transitions AS BIGINT)")
          .as("surprisal_micro"))
      .orderBy(col("surprisal_micro").desc, col("user_id"))
      .limit(20)
  }

  val q253Sql: String =
    """WITH trans AS (
      |  SELECT user_id, event_type, prev FROM (
      |    SELECT user_id, event_type,
      |      LAG(event_type, 1) OVER (PARTITION BY user_id
      |        ORDER BY ts ASC, event_id ASC) AS prev
      |    FROM events) x WHERE prev IS NOT NULL),
      |pairc AS (
      |  SELECT prev, event_type, CAST(COUNT(*) AS BIGINT) AS cpc
      |  FROM trans GROUP BY prev, event_type),
      |prevc AS (
      |  SELECT prev, CAST(COUNT(*) AS BIGINT) AS cp
      |  FROM trans GROUP BY prev),
      |lp AS (
      |  SELECT p.prev, p.event_type,
      |    CAST(round(log2(CAST(cpc AS DOUBLE)) * 1000000.0, 0) AS BIGINT) -
      |    CAST(round(log2(CAST(cp AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS a
      |  FROM pairc p JOIN prevc c ON c.prev = p.prev)
      |SELECT t.user_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
      |  CAST((-SUM(a)) // COUNT(*) AS BIGINT) AS surprisal_micro
      |FROM trans t JOIN lp ON lp.prev = t.prev
      |  AND lp.event_type = t.event_type
      |GROUP BY t.user_id
      |ORDER BY surprisal_micro DESC, user_id
      |LIMIT 20""".stripMargin

  // ------------------------------------------------------------------
  // q254: session-gap sensitivity sweep — how the session count, the
  // events-per-session density, and the break probability move as the
  // inactivity timeout τ sweeps {5, 15, 30, 60} minutes. q16 commits
  // to τ=30 min; this is the evidence for that choice (a plateau
  // between two τ values means the boundary is stable; a cliff means
  // sessionization is an artifact of the timeout). Identity that makes
  // it one pass: n_sessions(τ) = n_users + #{gaps > τ} — no
  // re-sessionization per τ, every sweep point is a conditional sum
  // over the SAME lag pass.
  //
  // Exactness: gaps are integer seconds (floor(epoch) in both
  // engines, the q16 contract); all sweep outputs are integer
  // divisions of exact counts. Scale shape: ONE user-partitioned lag
  // window, ONE 1-row aggregate, a 4-row constant sweep dimension.
  // ------------------------------------------------------------------
  def q254SessionGapSweep(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gaps = ev
      .select(col("user_id"),
        unix_timestamp(col("ts")).as("sec"),
        unix_timestamp(lag(col("ts"), 1).over(w)).as("prev_sec"))
    val taus = Seq(300L, 900L, 1800L, 3600L)
    val aggCols =
      count(lit(1)).as("n_events") ::
      sum(when(col("prev_sec").isNull, 1L).otherwise(0L)).as("n_users") ::
      sum(when(col("prev_sec").isNotNull, 1L).otherwise(0L)).as("n_gaps") ::
      taus.map(t => sum(when(col("prev_sec").isNotNull &&
        col("sec") - col("prev_sec") > t, 1L).otherwise(0L)).as(s"b$t")).toList
    val aggs = gaps.agg(aggCols.head, aggCols.tail: _*)
    aggs.select(col("n_events"), col("n_users"), col("n_gaps"),
        expr("stack(4, 300L, b300, 900L, b900, 1800L, b1800, 3600L, b3600)")
          .as(Seq("tau_s", "n_breaks")))
      .select(col("tau_s"),
        (col("n_users") + col("n_breaks")).as("n_sessions"),
        expr("CAST(n_events * 1000 div (n_users + n_breaks) AS BIGINT)")
          .as("events_per_session_milli"),
        expr("CAST(CASE WHEN n_gaps > 0 THEN n_breaks * 1000000 div n_gaps " +
          "ELSE 0 END AS BIGINT)").as("break_ppm"))
      .orderBy(col("tau_s"))
  }

  val q254Sql: String =
    """WITH gaps AS (
      |  SELECT user_id,
      |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
      |    CAST(FLOOR(epoch(CAST(LAG(ts, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC) AS TIMESTAMP))) AS BIGINT)
      |      AS prev_sec
      |  FROM events),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(SUM(CASE WHEN prev_sec IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_users,
      |    CAST(SUM(CASE WHEN prev_sec IS NOT NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_gaps,
      |    CAST(SUM(CASE WHEN prev_sec IS NOT NULL AND sec - prev_sec > 300
      |      THEN 1 ELSE 0 END) AS BIGINT) AS b300,
      |    CAST(SUM(CASE WHEN prev_sec IS NOT NULL AND sec - prev_sec > 900
      |      THEN 1 ELSE 0 END) AS BIGINT) AS b900,
      |    CAST(SUM(CASE WHEN prev_sec IS NOT NULL AND sec - prev_sec > 1800
      |      THEN 1 ELSE 0 END) AS BIGINT) AS b1800,
      |    CAST(SUM(CASE WHEN prev_sec IS NOT NULL AND sec - prev_sec > 3600
      |      THEN 1 ELSE 0 END) AS BIGINT) AS b3600
      |  FROM gaps),
      |sweep(tau_s) AS (VALUES (CAST(300 AS BIGINT)), (900), (1800), (3600))
      |SELECT tau_s,
      |  n_users + CASE tau_s WHEN 300 THEN b300 WHEN 900 THEN b900
      |    WHEN 1800 THEN b1800 ELSE b3600 END AS n_sessions,
      |  CAST(n_events * 1000 // (n_users + CASE tau_s WHEN 300 THEN b300
      |    WHEN 900 THEN b900 WHEN 1800 THEN b1800 ELSE b3600 END)
      |    AS BIGINT) AS events_per_session_milli,
      |  CAST(CASE WHEN n_gaps > 0 THEN (CASE tau_s WHEN 300 THEN b300
      |    WHEN 900 THEN b900 WHEN 1800 THEN b1800 ELSE b3600 END)
      |    * 1000000 // n_gaps ELSE 0 END AS BIGINT) AS break_ppm
      |FROM sweep CROSS JOIN agg
      |ORDER BY tau_s""".stripMargin
}
