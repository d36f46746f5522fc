package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}

/** Round-7 thirteenth wave: the Markov stationary distribution by
  * unrolled power iteration, and the η² effect-size companion to q306's
  * ANOVA. The chain's 5-state alphabet is FIXED, so the iteration
  * unrolls into explicit fixed-order column arithmetic — the Spark
  * expressions and the oracle SQL are generated from the SAME state
  * list, so both engines evaluate token-identical formulas.
  */
object Round67 {

  private val States = Seq("click", "error", "purchase", "signup", "view")
  private val Iters = 15

  /** SQL expression for one power-iteration step of state `to`,
    * reading iteration-`k` π columns — identical text is used to build
    * the Spark Column (via expr) and the DuckDB oracle. */
  private def stepSql(k: Int, to: String): String =
    States.map { f =>
      s"(pi${k}_$f * (CAST(p_${f}_$to AS DOUBLE) / 1000000.0))"
    }.mkString(" + ")

  private def oracleSql: String = {
    val wide = States.flatMap { f =>
      States.map { t =>
        s"coalesce(max(CASE WHEN f = '$f' AND t = '$t' THEN p6 END), 0)" +
          s" AS p_${f}_$t"
      }
    }.mkString(",\n                 ")
    val it0 = States.map(s => s"0.2 AS pi0_$s").mkString(", ")
    val chain = (1 to Iters).map { k =>
      val cols = States.map(s => s"${stepSql(k - 1, s)} AS pi${k}_$s")
        .mkString(",\n                ")
      s"it$k AS (SELECT *,\n                $cols\n              FROM it${k - 1})"
    }.mkString(",\n      ")
    val finals = States
      .map(s => s"round(pi${Iters}_$s, 9) AS pi_$s").mkString(", ")
    s"""
      WITH seq AS (SELECT user_id, event_type, ts, event_id,
              lead(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS nxt
            FROM events),
      tr AS (SELECT event_type AS f, nxt AS t, count(*) AS c
             FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
      rt AS (SELECT f, CAST(sum(c) AS BIGINT) AS r FROM tr GROUP BY 1),
      p AS (SELECT tr.f, tr.t, (1000000 * tr.c) // rt.r AS p6
            FROM tr JOIN rt ON tr.f = rt.f),
      wide AS (SELECT $wide
               FROM p),
      nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_transitions
             FROM tr),
      it0 AS (SELECT *, $it0 FROM wide CROSS JOIN nt),
      $chain
      SELECT n_transitions, $finals FROM it$Iters"""
  }

  val all: Seq[Q] = Seq(

    // stationary distribution of the user event-type chain: transition
    // rates as exact floor-truncated micro-integers, then 15 unrolled
    // power-iteration steps over the FIXED 5-state alphabet — every
    // add/multiply in a generated, explicitly-ordered expression shared
    // verbatim with the oracle. The long-run mix the absorbing-chain
    // view (q268) doesn't cover.
    Q("q358_markov_stationary", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val tr = T.events(s, d)
        .withColumn("__nxt", lead($"event_type", 1).over(w))
        .filter($"__nxt".isNotNull)
        .groupBy($"event_type".as("f"), $"__nxt".as("t"))
        .agg(count(lit(1)).as("c"))
      val rt = tr.groupBy($"f").agg(sum($"c").as("r"))
      val p = tr.join(rt, "f")
        .select($"f", $"t", expr("(1000000 * c) div r").as("p6"))
      val wideCols = States.flatMap { f =>
        States.map { t =>
          coalesce(max(when($"f" === f && $"t" === t, $"p6")), lit(0L))
            .as(s"p_${f}_$t")
        }
      }
      val nt = tr.agg(sum($"c").as("n_transitions"))
      var cur = p.agg(wideCols.head, wideCols.tail: _*)
        .crossJoin(broadcast(nt))
      States.foreach(s0 => cur = cur.withColumn(s"pi0_$s0", lit(0.2)))
      (1 to Iters).foreach { k =>
        // all five columns of step k must read step k−1's values, so
        // add them in one select rather than sequential withColumn
        val stepCols = States.map(s0 =>
          expr(stepSql(k - 1, s0)).as(s"pi${k}_$s0"))
        cur = cur.select(col("*") +: stepCols: _*)
        // CollapseProject would inline each step into the next, growing
        // the pi expression 5× per iteration — cut the 1-row lineage
        // before the tree goes exponential
        if (k % 5 == 0 && k < Iters) cur = cur.localCheckpoint()
      }
      cur.select(col("n_transitions") +:
        States.map(s0 => round(col(s"pi${Iters}_$s0"), 9).as(s"pi_$s0")): _*)
    }, Some(oracleSql)),

    // η² (and its unbiased ω² companion) for the weekday effect on
    // daily event values — the effect-size row q306's F test implies.
    // SST comes from exact integer-cent moments (Σx², S, n); the only
    // fractional reduction, Σ sg²/ng over the ≤7 weekday groups, rides
    // an ordered window cumsum so both engines add identically.
    Q("q359_eta_squared", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg((sum($"value".cast("decimal(18,2)")) * 100).cast("long")
          .as("x"))
        .withColumn("dow", dayofweek($"day").cast("long"))
      val m = daily.groupBy($"event_type").agg(
        count(lit(1)).as("n"),
        sum($"x").as("__s"),
        sum($"x" * $"x").as("__q2"))
      val g = daily.groupBy($"event_type", $"dow").agg(
        count(lit(1)).as("ng"), sum($"x").as("sg"))
      val wCum = Window.partitionBy($"event_type").orderBy($"dow")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = g
        .withColumn("__t", ($"sg" * $"sg").cast("double")
          / $"ng".cast("double"))
        .withColumn("__cum", sum($"__t").over(wCum))
      val sb = cum.groupBy($"event_type").agg(
        count(lit(1)).as("k"),
        max_by($"__cum", $"dow").as("__sbp"))
      val j = sb.join(m, "event_type")
      val corr = ($"__s".cast("double") * $"__s".cast("double"))
        ./($"n".cast("double"))
      val ssb = $"__sbp" - corr
      val sst = $"__q2".cast("double") - corr
      val msw = (sst - ssb) / ($"n" - $"k").cast("double")
      j.filter($"n" > $"k" && sst > 0)
        .select($"event_type", $"k", $"n",
          round(ssb / sst, 9).as("eta2"),
          round((ssb - ($"k" - 1).cast("double") * msw)
            / (sst + msw), 9).as("omega2"))
        .orderBy($"event_type")
    }, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                AS x
            FROM events GROUP BY 1, 2),
      dd AS (SELECT event_type, x,
               CAST(dayofweek(day) + 1 AS BIGINT) AS dow
             FROM daily),
      m AS (SELECT event_type, count(*) AS n,
              CAST(sum(x) AS BIGINT) AS s,
              CAST(sum(x * x) AS BIGINT) AS q2
            FROM dd GROUP BY 1),
      g AS (SELECT event_type, dow, count(*) AS ng,
              CAST(sum(x) AS BIGINT) AS sg
            FROM dd GROUP BY 1, 2),
      cum AS (SELECT event_type, dow,
                sum(CAST(sg * sg AS DOUBLE) / CAST(ng AS DOUBLE))
                  OVER (PARTITION BY event_type ORDER BY dow
                    ROWS UNBOUNDED PRECEDING) AS cumt
              FROM g),
      sb AS (SELECT event_type, count(*) AS k,
               max_by(cumt, dow) AS sbp
             FROM cum GROUP BY 1)
      SELECT sb.event_type, CAST(k AS BIGINT) AS k,
             CAST(n AS BIGINT) AS n,
             round((sbp - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                    / CAST(n AS DOUBLE))
                   / (CAST(q2 AS DOUBLE)
                      - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / CAST(n AS DOUBLE)), 9) AS eta2,
             round(((sbp - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                     / CAST(n AS DOUBLE))
                    - CAST(k - 1 AS DOUBLE)
                      * (((CAST(q2 AS DOUBLE)
                           - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                             / CAST(n AS DOUBLE))
                          - (sbp - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                             / CAST(n AS DOUBLE)))
                         / CAST(n - k AS DOUBLE)))
                   / ((CAST(q2 AS DOUBLE)
                       - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                         / CAST(n AS DOUBLE))
                      + (((CAST(q2 AS DOUBLE)
                           - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                             / CAST(n AS DOUBLE))
                          - (sbp - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                             / CAST(n AS DOUBLE)))
                         / CAST(n - k AS DOUBLE))), 9) AS omega2
      FROM sb JOIN m ON sb.event_type = m.event_type
      WHERE n > k AND (CAST(q2 AS DOUBLE)
            - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
              / CAST(n AS DOUBLE)) > 0
      ORDER BY sb.event_type"""))
  )
}
