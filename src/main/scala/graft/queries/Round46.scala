package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.{Tables => T}

/** Round-6 thirty-eighth wave: join-skew diagnosis, Cohen's kappa,
  * rate mix-shift decomposition.
  */
object Round46 {

  val all: Seq[Q] = Seq(

    // shuffle-planning diagnosis: which join keys would dominate an
    // orders⋈lineitem-by-partkey style join — per-key output
    // contribution cntA·cntB from the two per-side histograms (never
    // materializing the join), top 15 with their share of total output;
    // the read-out that decides salting before the shuffle burns
    Q("q289_join_skew", (s, d) => {
      import s.implicits._
      val a = T.lineitem(s, d).groupBy($"l_partkey".as("key"))
        .agg(count(lit(1)).as("__ca"))
      val b = T.lineitem(s, d).filter($"l_returnflag" === "R")
        .groupBy($"l_partkey".as("key"))
        .agg(count(lit(1)).as("__cb"))
      val contrib = a.join(b, "key")
        .select($"key", ($"__ca" * $"__cb").as("out_rows"))
      val tot = contrib.agg(sum($"out_rows").as("__tot"))
      contrib.crossJoin(broadcast(tot))
        .select($"key", $"out_rows",
          round($"out_rows".cast("double") / $"__tot".cast("double"), 6)
            .as("share"))
        .orderBy($"out_rows".desc, $"key".asc)
        .limit(15)
    }, Some("""
      WITH a AS (SELECT l_partkey AS key, count(*) AS ca
                 FROM lineitem GROUP BY 1),
      b AS (SELECT l_partkey AS key, count(*) AS cb
            FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
      c AS (SELECT a.key, CAST(ca * cb AS BIGINT) AS out_rows
            FROM a JOIN b ON a.key = b.key),
      t AS (SELECT CAST(sum(out_rows) AS BIGINT) AS tot FROM c)
      SELECT key, out_rows,
             round(CAST(out_rows AS DOUBLE) / CAST(tot AS DOUBLE), 6)
               AS share
      FROM c, t ORDER BY out_rows DESC, key LIMIT 15""")),

    // chance-corrected agreement: Cohen's kappa between the language-ID
    // heuristic and the labeled lang — exact integer confusion counts,
    // kappa = (po − pe)/(1 − pe) as one scalar combination
    Q("q290_kappa", (s, d) => {
      import s.implicits._
      val g = T.documents(s, d).select($"lang",
        TextAnalysis.languageGuess(TextAnalysis.tokens($"text"))
          .as("guess"))
      val n = g.agg(count(lit(1)).as("__n"))
      val agree = g.agg(sum(when($"lang" === $"guess", 1L).otherwise(0L))
        .as("__agree"))
      // pe: Σ over classes of rowMarginal·colMarginal / n²
      val rows = g.groupBy($"lang".as("cls")).agg(count(lit(1)).as("__r"))
      val cols = g.groupBy($"guess".as("cls")).agg(count(lit(1)).as("__c"))
      val pe = rows.join(cols, "cls")
        .agg(sum($"__r" * $"__c").as("__pesum"))
      n.crossJoin(agree).crossJoin(pe)
        .select($"__n".as("n"),
          round($"__agree".cast("double") / $"__n".cast("double"), 6)
            .as("po"),
          round($"__pesum".cast("double")
            / ($"__n".cast("double") * $"__n".cast("double")), 6)
            .as("pe"))
        .select($"n", $"po", $"pe",
          round(($"po" - $"pe") / (lit(1.0) - $"pe"), 6).as("kappa"))
    }, Some("""
      WITH t AS (SELECT lang,
                   regexp_split_to_array(trim(text), '\s+') AS ws
                 FROM documents),
      g AS (SELECT lang,
              CASE WHEN len(list_filter(ws,
                     x -> x IN ('the','and','of'))) > 0 THEN 'en'
                   WHEN len(list_filter(ws,
                     x -> x IN ('der','und','die'))) > 0 THEN 'de'
                   WHEN len(list_filter(ws,
                     x -> x IN ('el','la','los'))) > 0 THEN 'es'
                   ELSE 'unknown' END AS guess
            FROM t),
      nn AS (SELECT count(*) AS n FROM g),
      ag AS (SELECT CAST(sum(CASE WHEN lang = guess THEN 1 ELSE 0 END)
               AS BIGINT) AS agree FROM g),
      r AS (SELECT lang AS cls, count(*) AS rm FROM g GROUP BY 1),
      c AS (SELECT guess AS cls, count(*) AS cm FROM g GROUP BY 1),
      pe AS (SELECT CAST(sum(rm * cm) AS BIGINT) AS pesum
             FROM r JOIN c ON r.cls = c.cls),
      s AS (SELECT n, round(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6)
                     AS po,
                   round(CAST(pesum AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
                     AS pe
            FROM nn, ag, pe)
      SELECT n, po, pe, round((po - pe) / (1.0 - pe), 6) AS kappa
      FROM s""")),

    // why did the fulfilled rate move? Oaxaca-style decomposition of
    // the first→second half-month change into segment-mix shift,
    // within-segment shift, and interaction: Δ = Σ(sh_B−sh_A)·r_A +
    // Σ sh_A·(r_B−r_A) + Σ(sh_B−sh_A)·(r_B−r_A) — exact counts, one
    // scalar combination per term
    Q("q291_mix_shift", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
        .join(T.customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment".as("seg"),
          when(dayofmonth($"o_orderdate") <= 15, "A").otherwise("B")
            .as("period"),
          when($"o_orderstatus" === "F", 1L).otherwise(0L).as("__f"))
      val cell = o.groupBy($"seg", $"period")
        .agg(count(lit(1)).as("__n"), sum($"__f").as("__x"))
      val tot = o.groupBy($"period").agg(count(lit(1)).as("__tn"))
      val wide = cell.join(tot, "period")
        .select($"seg", $"period",
          ($"__n".cast("double") / $"__tn".cast("double")).as("__sh"),
          ($"__x".cast("double") / $"__n".cast("double")).as("__r"))
        .groupBy($"seg")
        .agg(max(when($"period" === "A", $"__sh")).as("shA"),
          max(when($"period" === "A", $"__r")).as("rA"),
          max(when($"period" === "B", $"__sh")).as("shB"),
          max(when($"period" === "B", $"__r")).as("rB"))
        .filter($"shA".isNotNull && $"shB".isNotNull)
      wide.agg(
          round(sum(($"shB" - $"shA") * $"rA"), 6).as("mix_effect"),
          round(sum($"shA" * ($"rB" - $"rA")), 6).as("within_effect"),
          round(sum(($"shB" - $"shA") * ($"rB" - $"rA")), 6)
            .as("interaction"))
    }, Some("""
      WITH o AS (SELECT c_mktsegment AS seg,
                   CASE WHEN dayofmonth(CAST(o_orderdate AS DATE)) <= 15
                        THEN 'A' ELSE 'B' END AS period,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS f
                 FROM orders JOIN customer ON o_custkey = c_custkey),
      cell AS (SELECT seg, period, count(*) AS n,
                 CAST(sum(f) AS BIGINT) AS x
               FROM o GROUP BY 1, 2),
      tot AS (SELECT period, count(*) AS tn FROM o GROUP BY 1),
      wide AS (SELECT seg,
                 max(CASE WHEN cell.period = 'A'
                          THEN CAST(n AS DOUBLE) / tn END) AS shA,
                 max(CASE WHEN cell.period = 'A'
                          THEN CAST(x AS DOUBLE) / n END) AS rA,
                 max(CASE WHEN cell.period = 'B'
                          THEN CAST(n AS DOUBLE) / tn END) AS shB,
                 max(CASE WHEN cell.period = 'B'
                          THEN CAST(x AS DOUBLE) / n END) AS rB
               FROM cell JOIN tot ON cell.period = tot.period
               GROUP BY 1)
      SELECT round(sum((shB - shA) * rA), 6) AS mix_effect,
             round(sum(shA * (rB - rA)), 6) AS within_effect,
             round(sum((shB - shA) * (rB - rA)), 6) AS interaction
      FROM wide WHERE shA IS NOT NULL AND shB IS NOT NULL"""))
  )
}
