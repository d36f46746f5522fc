package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Graph, Hypothesis}
import graft.sources.{Tables => T}

/** Round-8 fourth wave: experimentation and symbolic analytics — CUPED
  * variance reduction, SAX symbolic series, the linearized energy
  * distance on the multi-column grouped scan, TextRank keyword scores,
  * the LATERAL correlated-subquery SQL surface, and exact Shapley
  * marketing attribution over the bounded coalition grid. House rules:
  * exact integer/decimal moments for every data-sized reduction,
  * bounded-grid or calendar-bounded float arithmetic only, one final
  * rounding, hash-safe output types.
  */
object Round74 {

  private val lateralSql = """
      SELECT c.c_custkey AS c_custkey, o.o_orderkey AS o_orderkey,
             CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
      FROM %s c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM %s
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
      ORDER BY c_custkey, o_orderkey"""

  val all: Seq[Q] = Seq(

    // CUPED variance reduction (Deng et al. 2013): adjust each user's
    // post-period revenue by theta times their pre-period covariate,
    // with theta = cov(X,Y)/var(X) pooled across both hash-split arms.
    // One events scan -> per-user exact cents -> per-arm + pooled
    // moments (DECIMAL(38,0) products); theta and the adjusted means
    // are one double formula. The experiment readout that halves
    // required sample sizes for free.
    Q("q382_cuped", (s, d) => {
      import s.implicits._
      val users = T.events(s, d)
        .select($"user_id",
          expr("CAST(user_id % 2147483648 * 2654435761 % 2147483648 % 2 AS BIGINT)")
            .as("arm"),
          when(dayofmonth($"ts") <= 14,
            expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L).as("xc"),
          when(dayofmonth($"ts") > 14,
            expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L).as("yc"))
        .groupBy($"user_id", $"arm")
        .agg(sum($"xc").as("x"), sum($"yc").as("y"))
      val pooled = users.agg(count(lit(1)).as("nu"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"),
        sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"))
      def dd(c: String) = col(c).cast("double")
      val theta = (dd("nu") * dd("sxy") - dd("sx") * dd("sy")) /
        (dd("nu") * dd("sxx") - dd("sx") * dd("sx"))
      val xbar = dd("sx") / dd("nu")
      val byArm = users.groupBy($"arm").agg(count(lit(1)).as("n_users"),
        sum($"x").as("ax"), sum($"y").as("ay"))
      byArm.crossJoin(broadcast(pooled))
        .select($"arm", $"n_users",
          round(dd("ay") / dd("n_users") / 100.0, 6).as("mean_y"),
          round((dd("ay") - theta * (dd("ax") - dd("n_users") * xbar))
            / dd("n_users") / 100.0, 6).as("mean_y_adj"),
          round(theta, 6).as("theta"))
        .orderBy($"arm")
    }, Some("""
      WITH u AS (SELECT user_id,
              CAST(user_id % 2147483648 * 2654435761 % 2147483648 % 2
                AS BIGINT) AS arm,
              sum(CASE WHEN day(ts) <= 14
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
              sum(CASE WHEN day(ts) > 14
                THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y
            FROM events GROUP BY 1, 2),
      p AS (SELECT count(*) AS nu, sum(x) AS sx, sum(y) AS sy,
              sum(CAST(x * x AS HUGEINT)) AS sxx,
              sum(CAST(x * y AS HUGEINT)) AS sxy
            FROM u),
      a AS (SELECT arm, count(*) AS n_users, sum(x) AS ax, sum(y) AS ay
            FROM u GROUP BY 1)
      SELECT arm, CAST(n_users AS BIGINT) AS n_users,
             round(CAST(ay AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0, 6)
               AS mean_y,
             round((CAST(ay AS DOUBLE)
                 - (CAST(nu AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(nu AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (CAST(ax AS DOUBLE)
                     - CAST(n_users AS DOUBLE)
                       * (CAST(sx AS DOUBLE) / CAST(nu AS DOUBLE))))
               / CAST(n_users AS DOUBLE) / 100.0, 6) AS mean_y_adj,
             round((CAST(nu AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(nu AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS theta
      FROM a CROSS JOIN p ORDER BY arm""")),

    // SAX symbolic aggregate approximation (Lin et al. 2003): each
    // event type's daily-revenue series z-normalized from exact cents
    // moments, PAA-compressed into 8 segments, discretized against the
    // standard-normal quartile breakpoints into a 4-letter alphabet.
    // The whole series rides the <=31-row calendar spine; the only
    // unbounded work is the per-(type, day) cents sum.
    Q("q383_sax_symbols", (s, d) => {
      import s.implicits._
      val daily = T.events(s, d)
        .groupBy($"event_type", dayofmonth($"ts").as("day"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("rev"))
      val stats = daily.groupBy($"event_type").agg(
        count(lit(1)).as("n"), sum($"rev").as("srev"),
        sum(($"rev" * $"rev").cast("decimal(38,0)")).as("srev2"))
      def dd(c: String) = col(c).cast("double")
      val mu = dd("srev") / dd("n")
      val sigma = sqrt((dd("n") * dd("srev2") - dd("srev") * dd("srev"))
        / (dd("n") * dd("n")))
      val seg = daily
        .withColumn("rn", row_number().over(
          Window.partitionBy($"event_type").orderBy($"day")))
        .join(broadcast(stats), "event_type")
        .withColumn("seg", expr("(rn - 1) * 8 div n"))
        .groupBy($"event_type", $"seg")
        .agg(max($"n").as("n"), max($"srev").as("srev"),
          max($"srev2").as("srev2"),
          count(lit(1)).as("segn"), sum($"rev").as("segsum"))
        .withColumn("paa",
          (col("segsum").cast("double") / col("segn").cast("double") - mu)
            / sigma)
        .withColumn("sym",
          when($"paa" < -0.6745, "a").when($"paa" < 0.0, "b")
            .when($"paa" < 0.6745, "c").otherwise("d"))
      seg.groupBy($"event_type").agg(
          max($"n").as("n_days"),
          array_join(transform(array_sort(
            collect_list(struct($"seg", $"sym"))), x => x("sym")), "")
            .as("sax_word"))
        .orderBy($"event_type")
    }, Some("""
      WITH daily AS (SELECT event_type, day(ts) AS day,
              sum(CAST(round(value * 100) AS BIGINT)) AS rev
            FROM events GROUP BY 1, 2),
      st AS (SELECT event_type, count(*) AS n, sum(rev) AS srev,
               sum(CAST(rev * rev AS HUGEINT)) AS srev2
             FROM daily GROUP BY 1),
      rn AS (SELECT event_type, rev,
               row_number() OVER (PARTITION BY event_type ORDER BY day)
                 AS rn
             FROM daily),
      sg AS (SELECT event_type, (rn - 1) * 8 // n AS seg, n, srev, srev2,
               count(*) AS segn, sum(rev) AS segsum
             FROM rn JOIN st USING (event_type)
             GROUP BY 1, 2, 3, 4, 5),
      paa AS (SELECT event_type, seg, n,
               (CAST(segsum AS DOUBLE) / CAST(segn AS DOUBLE)
                 - CAST(srev AS DOUBLE) / CAST(n AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(srev2 AS DOUBLE)
                   - CAST(srev AS DOUBLE) * CAST(srev AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS paa
             FROM sg)
      SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
             string_agg(CASE WHEN paa < -0.6745 THEN 'a'
                             WHEN paa < 0.0 THEN 'b'
                             WHEN paa < 0.6745 THEN 'c'
                             ELSE 'd' END, '' ORDER BY seg) AS sax_word
      FROM paa GROUP BY event_type ORDER BY event_type""")),

    // Energy distance per ISO week between click and view value
    // distributions (cents): the quadratic pairwise statistic
    // linearized over the sorted value spine — four aligned exclusive
    // prefix streams from ONE Scale.groupedPrefixSums pass, exact
    // DECIMAL(38,0) pair sums, one double formula per week. See
    // Hypothesis.energyDistance
    Q("q384_energy_distance", (s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .filter($"event_type".isin("click", "view"))
        .select(date_trunc("week", $"ts").cast("date").as("week"),
          $"event_type", expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      Hypothesis.energyDistance(ev, "week", "event_type", "cents")
        .orderBy($"week")
    }, Some("""
      WITH p AS (SELECT date_trunc('week', ts)::DATE AS week,
              event_type AS treat,
              CAST(round(value * 100) AS BIGINT) AS x
            FROM events
            WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      t1 AS (SELECT week, min(treat) AS t1 FROM p GROUP BY 1),
      g AS (SELECT week, x,
              sum(CASE WHEN treat = t1 THEN 1 ELSE 0 END) AS a,
              sum(CASE WHEN treat <> t1 THEN 1 ELSE 0 END) AS b
            FROM p JOIN t1 USING (week) GROUP BY 1, 2),
      c AS (SELECT week, x, a, b,
              coalesce(sum(a) OVER w, 0) AS alt,
              coalesce(sum(b) OVER w, 0) AS blt,
              coalesce(sum(a * x) OVER w, 0) AS salt,
              coalesce(sum(b * x) OVER w, 0) AS sblt
            FROM g
            WINDOW w AS (PARTITION BY week ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      t AS (SELECT week,
              sum(a) AS n1, sum(b) AS n2,
              sum(CAST(a AS HUGEINT) * (x * blt - sblt)
                + CAST(b AS HUGEINT) * (x * alt - salt)) AS sxy,
              sum(CAST(a AS HUGEINT) * (x * alt - salt)) AS sxx2,
              sum(CAST(b AS HUGEINT) * (x * blt - sblt)) AS syy2
            FROM c GROUP BY week)
      SELECT week, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             round(2.0 * CAST(sxy AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
               - 2.0 * CAST(sxx2 AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
               - 2.0 * CAST(syy2 AS DOUBLE)
                 / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS e_dist
      FROM t ORDER BY week""")),

    // TextRank keyword scores (Mihalcea & Tarau 2004): PageRank over
    // the undirected adjacent-token co-occurrence graph of the English
    // slice — the classic unsupervised keyword extractor, reusing
    // Graph.pageRank's cached degree-weighted edge artifact (edges
    // never re-shuffle across iterations). Oracle: the q130-style
    // unrolled 3-iteration CTE on the same graph.
    Q("q385_textrank", (s, d) => {
      import s.implicits._
      val toks = T.documents(s, d).filter($"lang" === "en")
        .select(graft.operators.TextAnalysis.tokens($"text").as("ws"))
      val pairs = toks.select(explode(zip_with(
          slice($"ws", lit(1), size($"ws") - 1),
          slice($"ws", lit(2), size($"ws") - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .select($"p.a".as("a"), $"p.b".as("b"))
        .filter($"a" =!= $"b")
        .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v"))
        .distinct()
      val edges = pairs.select(explode(array(
          struct($"u".as("src"), $"v".as("dst")),
          struct($"v".as("src"), $"u".as("dst")))).as("e"))
        .select($"e.src".as("src"), $"e.dst".as("dst"))
      Graph.pageRank(edges, "src", "dst", iterations = 3)
        .select($"node".as("word"), round($"rank", 9).as("rank"))
        .orderBy($"word")
    }, Some("""
      WITH w AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents WHERE lang = 'en'),
      bi AS (SELECT unnest(ws[1:len(ws)-1]) AS a, unnest(ws[2:len(ws)]) AS b
             FROM w WHERE len(ws) >= 2),
      ed AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
             FROM bi WHERE a <> b),
      e AS (SELECT u AS src, v AS dst FROM ed
            UNION ALL SELECT v, u FROM ed),
      nodes AS (SELECT DISTINCT src AS node FROM e),
      nn AS (SELECT count(*) AS n FROM nodes),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS r
             FROM nodes CROSS JOIN nn),
      c1 AS (SELECT e.dst AS node, sum(r0.r / deg.deg) AS s
             FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
             GROUP BY e.dst),
      r1 AS (SELECT nodes.node,
                    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n +
                    CAST(0.85 AS DOUBLE) * (coalesce(c1.s, 0) + CAST(0.0 AS DOUBLE) / nn.n) AS r
             FROM nodes CROSS JOIN nn LEFT JOIN c1 USING (node)),
      c2 AS (SELECT e.dst AS node, sum(r1.r / deg.deg) AS s
             FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
             GROUP BY e.dst),
      r2 AS (SELECT nodes.node,
                    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n +
                    CAST(0.85 AS DOUBLE) * (coalesce(c2.s, 0) + CAST(0.0 AS DOUBLE) / nn.n) AS r
             FROM nodes CROSS JOIN nn LEFT JOIN c2 USING (node)),
      c3 AS (SELECT e.dst AS node, sum(r2.r / deg.deg) AS s
             FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
             GROUP BY e.dst),
      r3 AS (SELECT nodes.node,
                    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n +
                    CAST(0.85 AS DOUBLE) * (coalesce(c3.s, 0) + CAST(0.0 AS DOUBLE) / nn.n) AS r
             FROM nodes CROSS JOIN nn LEFT JOIN c3 USING (node))
      SELECT node AS word, round(r, 9) AS rank FROM r3 ORDER BY word""")),

    // LATERAL correlated subquery — the SQL surface for per-row top-k
    // (each customer's three priciest orders), the SAME statement text
    // on both engines (the q366 shared-statement discipline). Spark
    // plans the correlated LIMIT via DomainJoin + window; the oracle
    // runs it natively.
    Q("q386_lateral_topk", (s, d) => {
      T.customer(s, d).createOrReplaceTempView("customer_r74")
      T.orders(s, d).createOrReplaceTempView("orders_r74")
      s.sql(lateralSql.format("customer_r74", "orders_r74"))
    }, Some(lateralSql.format("customer", "orders"))),

    // Exact Shapley marketing attribution (Shapley 1953 applied a la
    // Zhao et al. 2018): each purchase's 7-day lookback channel SET
    // (click/view/signup) comes from three running-last windows over
    // ONE user-ordered pass; conversions collapse to <= 8 coalition
    // masks, v(S) and the Shapley values are bounded-grid arithmetic
    // with exact rational weights {1/3, 1/6}. Adding channels grows the
    // grid, never the scan.
    Q("q387_shapley_attribution", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def lastTouch(t: String) =
        max(when($"event_type" === t, $"ts")).over(w)
      val horizon = $"ts" - expr("INTERVAL 7 DAYS")
      val masks = T.events(s, d)
        .withColumn("lc", lastTouch("click"))
        .withColumn("lv", lastTouch("view"))
        .withColumn("ls", lastTouch("signup"))
        .filter($"event_type" === "purchase")
        .select((when($"lc" >= horizon, 1L).otherwise(0L)
          + when($"lv" >= horizon, 2L).otherwise(0L)
          + when($"ls" >= horizon, 4L).otherwise(0L)).as("m"))
        .groupBy($"m").agg(count(lit(1)).as("cnt"))
      val subsets = (0L to 7L).toDF("S")
      val vtab = subsets.crossJoin(masks)
        .groupBy($"S")
        .agg(sum(when(expr("(m & S) = m"), $"cnt").otherwise(0L)).as("v"))
      val channels = Seq(("click", 1L), ("view", 2L), ("signup", 4L))
        .toDF("channel", "bit")
      val weight = when(expr("bit_count(S)") === 0, lit(1.0) / 3.0)
        .when(expr("bit_count(S)") === 1, lit(1.0) / 6.0)
        .otherwise(lit(1.0) / 3.0)
      channels.crossJoin(subsets).filter(expr("(S & bit) = 0"))
        .join(vtab.select($"S", $"v"), "S")
        .join(vtab.select($"S".as("SU"), $"v".as("vu")),
          expr("SU = S + bit"))
        .groupBy($"channel")
        .agg(round(sum(weight * ($"vu" - $"v").cast("double")), 6)
          .as("shapley"))
        .orderBy($"channel")
    }, Some("""
      WITH lt AS (SELECT event_type, ts,
              max(CASE WHEN event_type = 'click' THEN ts END)
                OVER w AS lc,
              max(CASE WHEN event_type = 'view' THEN ts END)
                OVER w AS lv,
              max(CASE WHEN event_type = 'signup' THEN ts END)
                OVER w AS ls
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      mk AS (SELECT (CASE WHEN lc >= ts - INTERVAL 7 DAY THEN 1 ELSE 0 END
                   + CASE WHEN lv >= ts - INTERVAL 7 DAY THEN 2 ELSE 0 END
                   + CASE WHEN ls >= ts - INTERVAL 7 DAY THEN 4 ELSE 0 END)
                AS m, count(*) AS cnt
            FROM lt WHERE event_type = 'purchase' GROUP BY 1),
      vt AS (SELECT S, sum(CASE WHEN (m & S) = m THEN cnt ELSE 0 END) AS v
             FROM generate_series(0, 7) AS gs(S) CROSS JOIN mk
             GROUP BY S),
      ch(channel, bit) AS (VALUES ('click', 1), ('view', 2), ('signup', 4))
      SELECT channel,
             round(sum((CASE WHEN bit_count(vt.S) = 0 THEN 1.0 / 3.0
                             WHEN bit_count(vt.S) = 1 THEN 1.0 / 6.0
                             ELSE 1.0 / 3.0 END)
               * CAST(vu.v - vt.v AS DOUBLE)), 6) AS shapley
      FROM ch CROSS JOIN vt
      JOIN vt vu ON vu.S = vt.S + bit
      WHERE (vt.S & bit) = 0
      GROUP BY channel ORDER BY channel"""))
  )
}
