package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}

/** Round-7 fourteenth wave: ECOD-style joint-tail outlier ranking and
  * Chatterjee's ξ dependence coefficient. Both stay in exact integer
  * arithmetic to the last step — the ECOD score is ranked by its exact
  * product NUMERATOR (never the −Σln p float it monotonically mirrors),
  * and ξ is a ratio of exact rank-difference sums.
  */
object Round68 {

  val all: Seq[Q] = Seq(

    // ECOD-flavoured outliers (Li et al. 2022): per return flag, the 5
    // lineitems whose joint marginal tails are smallest. Each dim's
    // tail mass min(#≤x, #≥x) is an exact ECDF count from one keyed
    // window pass over the value spine; the joint score is the exact
    // long product, ranked with a deterministic key tiebreak — the
    // monotone image of the paper's −Σ ln p̂ without a transcendental.
    Q("q360_ecod_outliers", (s, d) => {
      import s.implicits._
      val rows = T.lineitem(s, d).select($"l_returnflag",
        $"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
        $"l_quantity".cast("decimal(18,2)").as("q"),
        $"l_extendedprice".cast("decimal(18,2)").as("p"))
      // per-flag totals: a 3-row aggregate, broadcast back — not a
      // partition-spanning window over the data-sized spine
      val totals = rows.groupBy($"l_returnflag").agg(count(lit(1)).as("__n"))
      def tails(vCol: String, out: String) = {
        val pv = rows.groupBy($"l_returnflag", col(vCol))
          .agg(count(lit(1)).as("__c"))
        graft.operators.Scale
          .groupedPrefixSum(pv, Seq("l_returnflag"), vCol, "__c", "__cum")
          .join(broadcast(totals), "l_returnflag")
          .select($"l_returnflag", col(vCol),
            least($"__cum", $"__n" - $"__cum" + $"__c").as(out))
      }
      val scored = rows
        .join(tails("q", "tail_q"), Seq("l_returnflag", "q"))
        .join(tails("p", "tail_p"), Seq("l_returnflag", "p"))
        .withColumn("score_num", $"tail_q" * $"tail_p")
      // bounded-heap top-5 per flag (custom TopKPerGroup physical
      // operator): partial heaps per partition → exchange on the flag →
      // final heaps — never a full per-flag sort of the scored table
      graft.operators.TopK.topKPerGroup(scored, Seq("l_returnflag"),
          struct($"score_num", $"l_orderkey", $"l_linenumber"),
          k = 5, desc = false)
        .select($"l_returnflag", $"l_orderkey", $"l_linenumber",
          $"q".cast("double").as("quantity"),
          $"p".cast("double").as("price"),
          $"tail_q", $"tail_p", $"score_num")
        .orderBy($"l_returnflag", $"score_num", $"l_orderkey",
          $"l_linenumber")
    }, Some("""
      WITH rows_ AS (SELECT l_returnflag, l_orderkey,
              CAST(l_linenumber AS BIGINT) AS l_linenumber,
              CAST(l_quantity AS DECIMAL(18,2)) AS q,
              CAST(l_extendedprice AS DECIMAL(18,2)) AS p
            FROM lineitem),
      tq AS (SELECT l_returnflag, q,
               least(cum, n - cum + c) AS tail_q
             FROM (SELECT l_returnflag, q, c,
                     sum(c) OVER (PARTITION BY l_returnflag ORDER BY q
                       ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(c) OVER (PARTITION BY l_returnflag) AS n
                   FROM (SELECT l_returnflag, q, count(*) AS c
                         FROM rows_ GROUP BY 1, 2))),
      tp AS (SELECT l_returnflag, p,
               least(cum, n - cum + c) AS tail_p
             FROM (SELECT l_returnflag, p, c,
                     sum(c) OVER (PARTITION BY l_returnflag ORDER BY p
                       ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(c) OVER (PARTITION BY l_returnflag) AS n
                   FROM (SELECT l_returnflag, p, count(*) AS c
                         FROM rows_ GROUP BY 1, 2))),
      scored AS (SELECT r.l_returnflag, r.l_orderkey, r.l_linenumber,
                   r.q, r.p, tq.tail_q, tp.tail_p,
                   CAST(tq.tail_q * tp.tail_p AS BIGINT) AS score_num
                 FROM rows_ r
                 JOIN tq ON tq.l_returnflag = r.l_returnflag
                   AND tq.q = r.q
                 JOIN tp ON tp.l_returnflag = r.l_returnflag
                   AND tp.p = r.p),
      rk AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag
               ORDER BY score_num, l_orderkey, l_linenumber) AS rn
             FROM scored)
      SELECT l_returnflag, l_orderkey, l_linenumber,
             CAST(q AS DOUBLE) AS quantity, CAST(p AS DOUBLE) AS price,
             CAST(tail_q AS BIGINT) AS tail_q,
             CAST(tail_p AS BIGINT) AS tail_p, score_num
      FROM rk WHERE rn <= 5
      ORDER BY l_returnflag, score_num, l_orderkey, l_linenumber""")),

    // Chatterjee's ξ (2021): does the daily value level DEPEND on time,
    // per event type — y-ranks with a deterministic (y, day) tiebreak
    // walked in x order, ξ = 1 − 3Σ|r_{i+1} − r_i| / (n² − 1); every
    // term an exact integer, one final double division.
    Q("q361_chatterjee_xi", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg((sum($"value".cast("decimal(18,2)")) * 100).cast("long")
          .as("y"))
      val wy = Window.partitionBy($"event_type").orderBy($"y", $"day")
      val wx = Window.partitionBy($"event_type").orderBy($"day")
      val r = daily
        .withColumn("__r", row_number().over(wy).cast("long"))
        .withColumn("__rnext", lead($"__r", 1).over(wx))
      r.filter($"__rnext".isNotNull)
        .groupBy($"event_type").agg(
          (count(lit(1)) + 1).as("n_days"),
          sum(abs($"__rnext" - $"__r")).as("__sd"))
        .filter($"n_days" > 1)
        .select($"event_type", $"n_days",
          round(lit(1.0) - ($"__sd" * 3).cast("double")
            / ($"n_days" * $"n_days" - 1).cast("double"), 9).as("xi"))
        .orderBy($"event_type")
    }, Some("""
      WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
              CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                AS y
            FROM events GROUP BY 1, 2),
      r AS (SELECT event_type, day, y,
              CAST(row_number() OVER (PARTITION BY event_type
                ORDER BY y, day) AS BIGINT) AS rr
            FROM daily),
      nx AS (SELECT event_type, rr,
               lead(rr) OVER (PARTITION BY event_type ORDER BY day)
                 AS rnext
             FROM r)
      SELECT event_type, count(*) + 1 AS n_days,
             round(1.0 - CAST(sum(abs(rnext - rr)) * 3 AS DOUBLE)
                   / CAST((count(*) + 1) * (count(*) + 1) - 1
                     AS DOUBLE), 9) AS xi
      FROM nx WHERE rnext IS NOT NULL
      GROUP BY 1 HAVING count(*) + 1 > 1
      ORDER BY event_type"""))
  )
}
