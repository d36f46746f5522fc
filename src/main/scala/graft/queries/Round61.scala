package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.sources.{Tables => T}

/** Round-7 seventh wave: graph eccentricity, association rules with
  * confidence/lift, partial correlation, and Cronbach's alpha — each an
  * exact-moments reduction with one final double formula written
  * token-identically in both engines.
  */
object Round61 {

  val all: Seq[Q] = Seq(

    // per-seed eccentricity over the customer–supplier trade graph:
    // max hop distance within 4 levels, plus the frontier size at that
    // distance. All five BFS runs share ONE cached edge artifact and
    // one level loop (the (seed,node)-keyed variant, q295's shape);
    // every output is an exact BIGINT.
    Q("q335_eccentricity", (s, d) => {
      import s.implicits._
      val ol = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("sx"))
      val edges = ol.select(explode(array(
          struct($"c".as("src"), $"sx".as("dst")),
          struct($"sx".as("src"), $"c".as("dst")))).as("e"))
        .select($"e.src".as("src"), $"e.dst".as("dst"))
      val seeds = Seq(4L, 44L, 204L, 1004L, 2004L).toDF("node")
      Graph.bfsDistancesPerSeed(edges, "src", "dst", seeds, "node",
          maxDepth = 4)
        .filter($"dist" > 0)
        .groupBy($"seed")
        .agg(count(lit(1)).as("n_reached"),
          max($"dist").cast("long").as("ecc"))
        .select(($"seed" / 2).cast("long").as("seed_cust"),
          $"n_reached", $"ecc")
        .orderBy($"seed_cust")
    }, Some("""
      WITH RECURSIVE ed AS (
        SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS (SELECT a AS src, b AS dst FROM ed
                UNION SELECT b, a FROM ed),
      bfs AS (
        SELECT s.seed, s.seed AS node, 0 AS dist
        FROM (SELECT unnest([4, 44, 204, 1004, 2004]) AS seed) s
        UNION
        SELECT b.seed, e.dst, b.dist + 1
        FROM bfs b JOIN edges e ON e.src = b.node
        WHERE b.dist < 4),
      best AS (SELECT seed, node, min(dist) AS dist
               FROM bfs GROUP BY 1, 2)
      SELECT CAST(seed // 2 AS BIGINT) AS seed_cust,
             count(*) AS n_reached,
             CAST(max(dist) AS BIGINT) AS ecc
      FROM best WHERE dist > 0 GROUP BY seed ORDER BY seed_cust""")),

    // association rules at the brand level (Agrawal–Srikant support/
    // confidence/lift): directional a→b over distinct (order, brand)
    // baskets. Counts are exact integers; confidence and lift are one
    // double division each over exact integer products — the basket
    // total rides in on a broadcast 1-row crossJoin, never a shuffle.
    Q("q336_assoc_rules", (s, d) => {
      import s.implicits._
      val op = T.lineitem(s, d)
        .join(T.part(s, d), $"l_partkey" === $"p_partkey")
        .select($"l_orderkey", $"p_brand").distinct()
      val nb = op.select(countDistinct($"l_orderkey").as("__n"))
      val cnt = op.groupBy($"p_brand").agg(count(lit(1)).as("__c"))
      val ab = op.as("x").join(op.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey")
            && col("x.p_brand") =!= col("y.p_brand"))
        .groupBy(col("x.p_brand").as("brand_a"),
          col("y.p_brand").as("brand_b"))
        .agg(count(lit(1)).as("supp_ab"))
        .filter($"supp_ab" >= 5)
      ab.join(cnt.select($"p_brand".as("brand_a"), $"__c".as("__ca")),
          "brand_a")
        .join(cnt.select($"p_brand".as("brand_b"), $"__c".as("__cb")),
          "brand_b")
        .crossJoin(broadcast(nb))
        .select($"brand_a", $"brand_b", $"supp_ab",
          round($"supp_ab".cast("double") / $"__ca".cast("double"), 6)
            .as("confidence"),
          round(($"__n" * $"supp_ab").cast("double")
            / ($"__ca" * $"__cb").cast("double"), 6).as("lift"))
        .orderBy($"brand_a", $"brand_b")
    }, Some("""
      WITH op AS (SELECT DISTINCT l_orderkey, p_brand
                  FROM lineitem JOIN part ON l_partkey = p_partkey),
      nb AS (SELECT count(DISTINCT l_orderkey) AS n FROM op),
      cnt AS (SELECT p_brand, count(*) AS c FROM op GROUP BY 1),
      ab AS (SELECT x.p_brand AS brand_a, y.p_brand AS brand_b,
               count(*) AS supp_ab
             FROM op x JOIN op y ON x.l_orderkey = y.l_orderkey
               AND x.p_brand <> y.p_brand
             GROUP BY 1, 2 HAVING count(*) >= 5)
      SELECT brand_a, brand_b, CAST(supp_ab AS BIGINT) AS supp_ab,
             round(CAST(supp_ab AS DOUBLE) / CAST(ca.c AS DOUBLE), 6)
               AS confidence,
             round(CAST(nb.n * supp_ab AS DOUBLE)
                   / CAST(ca.c * cb.c AS DOUBLE), 6) AS lift
      FROM ab
      JOIN cnt ca ON ca.p_brand = brand_a
      JOIN cnt cb ON cb.p_brand = brand_b
      CROSS JOIN nb
      ORDER BY brand_a, brand_b""")),

    // partial correlation of quantity and price controlling for
    // discount, per return flag: all second moments are exact decimal
    // sums (scale-2 operands, scale-4 products — never two DECIMAL(38)
    // multiplicands); the three Pearson r's and the partial formula run
    // in doubles written token-identically in both engines.
    Q("q337_partial_corr", (s, d) => {
      import s.implicits._
      val m = T.lineitem(s, d)
        .select($"l_returnflag",
          $"l_quantity".cast("decimal(18,2)").as("x"),
          $"l_extendedprice".cast("decimal(18,2)").as("y"),
          $"l_discount".cast("decimal(18,2)").as("z"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          sum($"x").cast("double").as("sx"),
          sum($"y").cast("double").as("sy"),
          sum($"z").cast("double").as("sz"),
          sum($"x" * $"x").cast("double").as("sxx"),
          sum($"y" * $"y").cast("double").as("syy"),
          sum($"z" * $"z").cast("double").as("szz"),
          sum($"x" * $"y").cast("double").as("sxy"),
          sum($"x" * $"z").cast("double").as("sxz"),
          sum($"y" * $"z").cast("double").as("syz"))
      val rxy = ($"n" * $"sxy" - $"sx" * $"sy")
        ./(sqrt(($"n" * $"sxx" - $"sx" * $"sx")
          * ($"n" * $"syy" - $"sy" * $"sy")))
      val rxz = ($"n" * $"sxz" - $"sx" * $"sz")
        ./(sqrt(($"n" * $"sxx" - $"sx" * $"sx")
          * ($"n" * $"szz" - $"sz" * $"sz")))
      val ryz = ($"n" * $"syz" - $"sy" * $"sz")
        ./(sqrt(($"n" * $"syy" - $"sy" * $"sy")
          * ($"n" * $"szz" - $"sz" * $"sz")))
      m.select($"l_returnflag", $"n".cast("long").as("n_rows"),
          round(rxy, 6).as("r_xy"),
          round((rxy - rxz * ryz)
            / sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)), 6)
            .as("r_xy_given_z"))
        .orderBy($"l_returnflag")
    }, Some("""
      WITH m AS (SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x) AS DOUBLE) AS sx,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(z) AS DOUBLE) AS sz,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(y * y) AS DOUBLE) AS syy,
               CAST(sum(z * z) AS DOUBLE) AS szz,
               CAST(sum(x * y) AS DOUBLE) AS sxy,
               CAST(sum(x * z) AS DOUBLE) AS sxz,
               CAST(sum(y * z) AS DOUBLE) AS syz
             FROM (SELECT l_returnflag,
                     CAST(l_quantity AS DECIMAL(18,2)) AS x,
                     CAST(l_extendedprice AS DECIMAL(18,2)) AS y,
                     CAST(l_discount AS DECIMAL(18,2)) AS z
                   FROM lineitem)
             GROUP BY 1),
      r AS (SELECT l_returnflag, n,
              ((n * sxy) - (sx * sy))
                / sqrt(((n * sxx) - (sx * sx)) * ((n * syy) - (sy * sy)))
                AS rxy,
              ((n * sxz) - (sx * sz))
                / sqrt(((n * sxx) - (sx * sx)) * ((n * szz) - (sz * sz)))
                AS rxz,
              ((n * syz) - (sy * sz))
                / sqrt(((n * syy) - (sy * sy)) * ((n * szz) - (sz * sz)))
                AS ryz
            FROM m)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
             round(rxy, 6) AS r_xy,
             round((rxy - (rxz * ryz))
                   / sqrt((1.0 - (rxz * rxz)) * (1.0 - (ryz * ryz))), 6)
               AS r_xy_given_z
      FROM r ORDER BY l_returnflag""")),

    // Cronbach's alpha (internal consistency) treating quantity,
    // discount, and tax as a 3-item instrument per return flag:
    // alpha = k/(k−1) · (1 − Σvar_i / var_total), population variances
    // from exact decimal moments — the total score is an exact scale-2
    // decimal sum, so var_total's moments never see a rounded double.
    Q("q338_cronbach", (s, d) => {
      import s.implicits._
      val it = T.lineitem(s, d).select($"l_returnflag",
        $"l_quantity".cast("decimal(18,2)").as("x1"),
        $"l_discount".cast("decimal(18,2)").as("x2"),
        $"l_tax".cast("decimal(18,2)").as("x3"))
        .withColumn("t", ($"x1" + $"x2" + $"x3").cast("decimal(18,2)"))
      val m = it.groupBy($"l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        sum($"x1").cast("double").as("s1"),
        sum($"x1" * $"x1").cast("double").as("s11"),
        sum($"x2").cast("double").as("s2"),
        sum($"x2" * $"x2").cast("double").as("s22"),
        sum($"x3").cast("double").as("s3"),
        sum($"x3" * $"x3").cast("double").as("s33"),
        sum($"t").cast("double").as("st"),
        sum($"t" * $"t").cast("double").as("stt"))
      def v(s: org.apache.spark.sql.Column, ss: org.apache.spark.sql.Column) =
        ($"n" * ss - s * s) / ($"n" * $"n")
      val vsum = v($"s1", $"s11") + v($"s2", $"s22") + v($"s3", $"s33")
      val vt = v($"st", $"stt")
      m.filter(vt > 0)
        .select($"l_returnflag", $"n".cast("long").as("n_rows"),
          round(lit(1.5) * (lit(1.0) - vsum / vt), 6).as("alpha"))
        .orderBy($"l_returnflag")
    }, Some("""
      WITH it AS (SELECT l_returnflag,
               CAST(l_quantity AS DECIMAL(18,2)) AS x1,
               CAST(l_discount AS DECIMAL(18,2)) AS x2,
               CAST(l_tax AS DECIMAL(18,2)) AS x3,
               CAST(CAST(l_quantity AS DECIMAL(18,2))
                    + CAST(l_discount AS DECIMAL(18,2))
                    + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS t
             FROM lineitem),
      m AS (SELECT l_returnflag,
              CAST(count(*) AS DOUBLE) AS n,
              CAST(sum(x1) AS DOUBLE) AS s1,
              CAST(sum(x1 * x1) AS DOUBLE) AS s11,
              CAST(sum(x2) AS DOUBLE) AS s2,
              CAST(sum(x2 * x2) AS DOUBLE) AS s22,
              CAST(sum(x3) AS DOUBLE) AS s3,
              CAST(sum(x3 * x3) AS DOUBLE) AS s33,
              CAST(sum(t) AS DOUBLE) AS st,
              CAST(sum(t * t) AS DOUBLE) AS stt
            FROM it GROUP BY 1)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
             round(1.5 * (1.0 -
               ((((n * s11) - (s1 * s1)) / (n * n))
                + (((n * s22) - (s2 * s2)) / (n * n))
                + (((n * s33) - (s3 * s3)) / (n * n)))
               / (((n * stt) - (st * st)) / (n * n))), 6) AS alpha
      FROM m
      WHERE ((n * stt) - (st * st)) / (n * n) > 0
      ORDER BY l_returnflag"""))
  )
}
