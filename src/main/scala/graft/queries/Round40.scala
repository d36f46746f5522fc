package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.{Tables => T}

/** Round-6 thirty-second wave: Allen's interval algebra, LSH parameter
  * planning.
  */
object Round40 {

  val all: Seq[Q] = Seq(

    // relational completeness over time intervals: every pair of a
    // customer's order spans (open → last ship) classified into the 13
    // Allen (1983) relations — one canonical CASE ladder, evaluated in
    // identical order by both engines on exact dates; per-customer
    // pairing bounds the quadratic like every blocking scheme here
    Q("q278_allen_relations", (s, d) => {
      import s.implicits._
      val span = T.orders(s, d)
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_custkey", $"o_orderkey")
        .agg(min(to_date($"o_orderdate")).as("st"),
          max(to_date($"l_shipdate")).as("en"))
        .filter($"st" <= $"en")
      val a = span.select($"o_custkey", $"o_orderkey".as("a_id"),
        $"st".as("sa"), $"en".as("ea"))
      val b = span.select($"o_custkey", $"o_orderkey".as("b_id"),
        $"st".as("sb"), $"en".as("eb"))
      val rel = a.join(b, "o_custkey").filter($"a_id" < $"b_id")
        .withColumn("relation",
          when($"sa" === $"sb" && $"ea" === $"eb", "equal")
            .when($"ea" < $"sb", "before")
            .when($"eb" < $"sa", "after")
            .when($"ea" === $"sb", "meets")
            .when($"eb" === $"sa", "met_by")
            .when($"sa" === $"sb" && $"ea" < $"eb", "starts")
            .when($"sa" === $"sb" && $"eb" < $"ea", "started_by")
            .when($"ea" === $"eb" && $"sb" < $"sa", "finishes")
            .when($"ea" === $"eb" && $"sa" < $"sb", "finished_by")
            .when($"sb" < $"sa" && $"ea" < $"eb", "during")
            .when($"sa" < $"sb" && $"eb" < $"ea", "contains")
            .when($"sa" < $"sb" && $"sb" < $"ea" && $"ea" < $"eb",
              "overlaps")
            .otherwise("overlapped_by"))
      rel.groupBy($"relation").agg(count(lit(1)).as("n_pairs"))
        .orderBy($"relation")
    }, Some("""
      WITH span AS (SELECT o_custkey, o_orderkey,
                      CAST(min(o_orderdate) AS DATE) AS st,
                      CAST(max(l_shipdate) AS DATE) AS en
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                    GROUP BY 1, 2),
      sp AS (SELECT * FROM span WHERE st <= en),
      p AS (SELECT a.o_custkey, a.o_orderkey AS a_id, b.o_orderkey AS b_id,
                   a.st AS sa, a.en AS ea, b.st AS sb, b.en AS eb
            FROM sp a JOIN sp b ON a.o_custkey = b.o_custkey
              AND a.o_orderkey < b.o_orderkey),
      r AS (SELECT CASE
              WHEN sa = sb AND ea = eb THEN 'equal'
              WHEN ea < sb THEN 'before'
              WHEN eb < sa THEN 'after'
              WHEN ea = sb THEN 'meets'
              WHEN eb = sa THEN 'met_by'
              WHEN sa = sb AND ea < eb THEN 'starts'
              WHEN sa = sb AND eb < ea THEN 'started_by'
              WHEN ea = eb AND sb < sa THEN 'finishes'
              WHEN ea = eb AND sa < sb THEN 'finished_by'
              WHEN sb < sa AND ea < eb THEN 'during'
              WHEN sa < sb AND eb < ea THEN 'contains'
              WHEN sa < sb AND sb < ea AND ea < eb THEN 'overlaps'
              ELSE 'overlapped_by' END AS relation
            FROM p)
      SELECT relation, count(*) AS n_pairs FROM r
      GROUP BY 1 ORDER BY relation""")),

    // dedup planning table: the banding s-curve P(candidate | sim s) =
    // 1 − (1 − s^r)^b over a (bands, rows) grid, plus each config's
    // ~threshold (1/b)^(1/r) — how q30's 16×4 banding was chosen;
    // powers via exp/ln SUBEXPRESSIONS in both engines (pow is not
    // bit-stable across engines — the q241 discipline)
    Q("q279_lsh_tuning", (s, _) => {
      import s.implicits._
      val bands = Seq(4, 8, 16, 32).toDF("bands")
      val rows = Seq(2, 4, 8).toDF("rows_per_band")
      val sims = s.range(1, 20).select(($"id" / 20.0).as("sim"))
      bands.crossJoin(rows).crossJoin(sims)
        .select($"bands", $"rows_per_band", round($"sim", 2).as("sim"),
          round(lit(1.0) - exp($"bands"
            * log(lit(1.0) - exp($"rows_per_band" * log($"sim")))), 6)
            .as("p_candidate"),
          round(exp(-log($"bands".cast("double")) / $"rows_per_band"), 6)
            .as("threshold"))
        .orderBy($"bands", $"rows_per_band", $"sim")
    }, Some("""
      WITH b AS (SELECT unnest([4, 8, 16, 32]) AS bands),
      r AS (SELECT unnest([2, 4, 8]) AS rows_per_band),
      sm AS (SELECT i / 20.0 AS sim FROM range(1, 20) t(i))
      SELECT bands, rows_per_band, round(sim, 2) AS sim,
             round(1.0 - exp(bands
               * ln(1.0 - exp(rows_per_band * ln(sim)))), 6)
               AS p_candidate,
             round(exp(-ln(CAST(bands AS DOUBLE)) / rows_per_band), 6)
               AS threshold
      FROM b, r, sm ORDER BY bands, rows_per_band, sim"""))
  )
}
