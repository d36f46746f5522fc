package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{Functions => F}
import graft.operators.{Merge, Profile}
import graft.sources.{Tables => T}

/** Round-6 tenth wave: delta-join view maintenance, Poisson-bootstrap
  * CIs, Jaro–Winkler blocking match.
  */
object Round18 {

  val all: Seq[Q] = Seq(

    // materialized-view refresh algebra: the per-customer revenue view
    // maintained from base+delta splits of BOTH join sides — engine
    // computes base⋈base ∪ base⋈Δ ∪ Δ⋈base ∪ Δ⋈Δ and merges partials;
    // the oracle recomputes from scratch, so a hash match PROVES the
    // incremental path loses nothing
    Q("q215_delta_view", (s, d) => {
      import s.implicits._
      val cutoff = lit("1999-01-01").cast("timestamp")
      val o = T.orders(s, d)
      val l = T.lineitem(s, d)
      Merge.deltaJoinView(
          o.filter($"o_orderdate" < cutoff),
          o.filter($"o_orderdate" >= cutoff),
          l.filter($"l_shipdate" < cutoff),
          l.filter($"l_shipdate" >= cutoff),
          "o_orderkey", "l_orderkey", "o_custkey",
          $"l_extendedprice".cast("decimal(18,2)"))
        .select($"o_custkey", $"total".cast("decimal(18,2)").as("total"),
          $"n_rows")
        .orderBy($"o_custkey")
    }, Some("""
      SELECT o_custkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS total,
             count(*) AS n_rows
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1 ORDER BY o_custkey""")),

    // uncertainty on the mean order value per priority WITHOUT a second
    // pass: 100 Poisson(1) pseudo-resamples from integer-threshold
    // hash draws (Chamandy et al. 2012), replicate means over exact
    // cent sums, CI = exact quantile_cont over the replicate means
    Q("q216_poisson_bootstrap", (s, d) => {
      import s.implicits._
      val o = T.orders(s, d).select($"o_orderpriority", $"o_orderkey",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      Profile.poissonBootstrapCI(o, "o_orderpriority", "o_orderkey",
          "cents", b = 100)
        .select($"o_orderpriority", $"n_rows",
          round($"mean" / 100, 6).as("mean"),
          round($"ci_lo" / 100, 6).as("ci_lo"),
          round($"ci_hi" / 100, 6).as("ci_hi"))
        .orderBy($"o_orderpriority")
    }, Some("""
      WITH o AS (SELECT o_orderpriority AS grp, o_orderkey AS id,
                        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS cents
                 FROM orders),
      rep AS (SELECT grp, id, cents, t.range AS r
              FROM o, range(0, 100) t),
      dm AS (SELECT grp, r, cents,
                    ((id % 2147483648) * 1000003 + r * 999983)
                      % 2147483648 * 2654435761 % 2147483648 AS h
             FROM rep),
      mm AS (SELECT grp, r, cents,
                    CASE WHEN h < 790015084 THEN 0
                         WHEN h < 1580030168 THEN 1
                         WHEN h < 1975037710 THEN 2
                         WHEN h < 2106706891 THEN 3
                         ELSE 4 END AS m
             FROM dm),
      g AS (SELECT grp, r, sum(m * cents) AS ws, sum(m) AS wn
            FROM mm GROUP BY 1, 2),
      means AS (SELECT grp, CAST(ws AS DOUBLE) / wn AS mean_rep
                FROM g WHERE wn > 0),
      ci AS (SELECT grp, quantile_cont(mean_rep, 0.05) AS lo,
                    quantile_cont(mean_rep, 0.95) AS hi
             FROM means GROUP BY 1),
      act AS (SELECT grp, count(*) AS n_rows,
                     CAST(sum(cents) AS DOUBLE) / count(*) AS mean_c
              FROM o GROUP BY 1)
      SELECT act.grp AS o_orderpriority, act.n_rows,
             round(mean_c / 100, 6) AS mean,
             round(lo / 100, 6) AS ci_lo,
             round(hi / 100, 6) AS ci_hi
      FROM act JOIN ci ON act.grp = ci.grp
      ORDER BY o_orderpriority""")),

    // entity-resolution candidate scoring: part-name pairs sharing
    // their head noun (the blocking key), scored by the native
    // codegen'd Jaro–Winkler expression — verified value-for-value
    // against DuckDB's jaro_winkler_similarity
    Q("q217_jw_match", (s, d) => {
      import s.implicits._
      val names = T.part(s, d).select($"p_name").distinct()
        .withColumn("blk", element_at(split($"p_name", " "), -1))
      val a = names.select($"p_name".as("name_a"), $"blk")
      val b = names.select($"p_name".as("name_b"), $"blk")
      a.join(b, "blk").filter($"name_a" < $"name_b")
        .withColumn("jw", F.jaro_winkler($"name_a", $"name_b"))
        .filter($"jw" >= 0.82)
        .select($"name_a", $"name_b", round($"jw", 6).as("jw"))
        .orderBy($"name_a", $"name_b")
    }, Some("""
      WITH n AS (SELECT DISTINCT p_name FROM part),
      k AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk FROM n),
      p AS (SELECT a.p_name AS name_a, b.p_name AS name_b,
                   jaro_winkler_similarity(a.p_name, b.p_name) AS jw
            FROM k a JOIN k b ON a.blk = b.blk AND a.p_name < b.p_name)
      SELECT name_a, name_b, round(jw, 6) AS jw
      FROM p WHERE jw >= 0.82
      ORDER BY name_a, name_b"""))
  )
}
