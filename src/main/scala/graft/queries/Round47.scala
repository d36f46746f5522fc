package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Quantiles, Similarity}
import graft.sources.{Tables => T}

/** Round-6 thirty-ninth wave: trimmed mean, YoY growth, 11-point PR
  * curve.
  */
object Round47 {

  val all: Seq[Q] = Seq(

    // robust location: 10–90% trimmed mean of extended price per
    // return flag — exact quantile bounds (rounded identically in both
    // engines before the cut), decimal-exact sum of the kept values
    Q("q292_trimmed_mean", (s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d).select($"l_returnflag", $"l_extendedprice")
      val bounds = Quantiles.exactQuantiles(li, Seq("l_returnflag"),
          "l_extendedprice", Seq(0.1, 0.9))
        .select($"l_returnflag", round($"p10", 6).as("lo"),
          round($"p90", 6).as("hi"))
      li.join(bounds, "l_returnflag")
        .filter($"l_extendedprice" >= $"lo" && $"l_extendedprice" <= $"hi")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_kept"),
          sum($"l_extendedprice".cast("decimal(18,2)"))
            .cast("decimal(28,2)").as("__s"))
        .select($"l_returnflag", $"n_kept",
          round($"__s".cast("double") / $"n_kept".cast("double"), 6)
            .as("trimmed_mean"))
        .orderBy($"l_returnflag")
    }, Some("""
      WITH b AS (SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.1), 6) AS lo,
                   round(quantile_cont(l_extendedprice, 0.9), 6) AS hi
                 FROM lineitem GROUP BY 1),
      k AS (SELECT l.l_returnflag, count(*) AS n_kept,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                AS DECIMAL(28,2)) AS s
            FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
            WHERE l_extendedprice >= lo AND l_extendedprice <= hi
            GROUP BY 1)
      SELECT l_returnflag, n_kept,
             round(CAST(s AS DOUBLE) / CAST(n_kept AS DOUBLE), 6)
               AS trimmed_mean
      FROM k ORDER BY l_returnflag""")),

    // the yearly board slide: revenue per order year with YoY growth —
    // decimal-exact yearly sums, one lag window over the years-sized
    // table, a single rounded ratio per row
    Q("q293_yoy", (s, d) => {
      import s.implicits._
      val yearly = T.orders(s, d)
        .groupBy(year($"o_orderdate").as("yr"))
        .agg(sum($"o_totalprice".cast("decimal(18,2)"))
          .cast("decimal(28,2)").as("revenue"))
      yearly
        .withColumn("__prev", lag($"revenue", 1).over(
          Window.orderBy($"yr")))
        .select($"yr", $"revenue",
          round(($"revenue" - $"__prev").cast("double")
            / $"__prev".cast("double"), 6).as("yoy_growth"))
        .orderBy($"yr")
    }, Some("""
      WITH y AS (SELECT year(CAST(o_orderdate AS DATE)) AS yr,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                     AS DECIMAL(28,2)) AS revenue
                 FROM orders GROUP BY 1)
      SELECT yr, revenue,
             round(CAST(revenue - lag(revenue) OVER (ORDER BY yr)
                     AS DOUBLE)
                   / CAST(lag(revenue) OVER (ORDER BY yr) AS DOUBLE),
                   6) AS yoy_growth
      FROM y ORDER BY yr""")),

    // the IR-eval staple q163's NDCG table doesn't give: macro-averaged
    // 11-point interpolated precision-recall curve over the brute-force
    // cosine run — interpolation as a reverse running max per probe,
    // level cut via an 11-way explode, everything rank-window keyed
    Q("q294_pr_curve", (s, d) => {
      import s.implicits._
      val emb = T.embeddings(s, d)
      val labels = emb.select($"vec_id", $"label")
      val run = Similarity
        .bruteForceTopK(emb, emb.filter($"vec_id" < 20), 50)
        .join(labels.select($"vec_id".as("probe_id"), $"label".as("__ql")),
          "probe_id")
        .join(labels.select($"vec_id", $"label".as("__dl")), "vec_id")
        .withColumn("rel", when($"__ql" === $"__dl", 1L).otherwise(0L))
      val wRank = Window.partitionBy($"probe_id")
        .orderBy($"sim".desc, $"vec_id".asc)
      val wCum = wRank.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val wSuffix = Window.partitionBy($"probe_id")
        .orderBy($"sim".asc, $"vec_id".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wProbe = Window.partitionBy($"probe_id")
      val ranked = run
        .withColumn("__k", row_number().over(wRank))
        .withColumn("__cum", sum($"rel").over(wCum))
        .withColumn("__tot", sum($"rel").over(wProbe))
        .filter($"__tot" > 0)
        .withColumn("__prec", $"__cum".cast("double") / $"__k".cast("double"))
        .withColumn("__recall",
          $"__cum".cast("double") / $"__tot".cast("double"))
        .withColumn("__ip", max($"__prec").over(wSuffix))
      val levels = ranked.select($"probe_id", $"__recall", $"__ip",
          explode(sequence(lit(0), lit(10))).as("level"))
        .filter($"__recall" >= $"level".cast("double") / 10.0)
        .groupBy($"probe_id", $"level")
        .agg(max($"__ip").as("__p"))
      levels.groupBy($"level")
        .agg(count(lit(1)).as("n_probes"),
          round(sum($"__p") / count(lit(1)), 6).as("avg_precision"))
        .orderBy($"level")
    }, Some("""
      WITH scored AS (
        SELECT a.vec_id AS probe_id, b.vec_id AS vec_id,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                 b.embedding::DOUBLE[]), 6) AS sim,
               CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS rel
        FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
        WHERE a.vec_id < 20),
      top AS (SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY probe_id
                  ORDER BY sim DESC, vec_id) AS k
                FROM scored) WHERE k <= 50),
      r AS (SELECT probe_id, k, sim, vec_id,
              CAST(sum(rel) OVER (PARTITION BY probe_id ORDER BY k
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
              CAST(sum(rel) OVER (PARTITION BY probe_id) AS BIGINT)
                AS tot
            FROM top),
      p AS (SELECT probe_id, k,
              CAST(cum AS DOUBLE) / CAST(k AS DOUBLE) AS prec,
              CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS recall,
              max(CAST(cum AS DOUBLE) / CAST(k AS DOUBLE))
                OVER (PARTITION BY probe_id ORDER BY sim, vec_id DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS ip
            FROM r WHERE tot > 0),
      lv AS (SELECT probe_id, t.level, max(ip) AS p
             FROM p JOIN (SELECT unnest(range(0, 11)) AS level) t
               ON recall >= t.level / 10.0
             GROUP BY 1, 2)
      SELECT CAST(level AS INTEGER) AS level, count(*) AS n_probes,
             round(sum(p) / count(*), 6) AS avg_precision
      FROM lv GROUP BY level ORDER BY level"""))
  )
}
