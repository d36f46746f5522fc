package graft.queries

import graft.sources.{Tables => T}

/** Round-6 forty-fifth wave: the newest native expression through the
  * SQL entry path.
  */
object Round53 {

  val all: Seq[Q] = Seq(

    // the banded bounded_levenshtein called FROM SQL (GraftExtensions /
    // registerAll surface, q47's family): distance histogram over a
    // key-bounded supplier-name pair set — the oracle replays with
    // DuckDB's full levenshtein capped at k+1, so the hash match also
    // re-proves the sentinel contract on real data
    Q("q304_sql_bounded_lev", (s, d) => {
      graft.functions.Functions.registerAll(s)
      T.supplier(s, d).createOrReplaceTempView("supplier_v")
      s.sql("""
        SELECT bounded_levenshtein(a.s_name, b.s_name, 3) AS dist,
               count(*) AS n_pairs
        FROM supplier_v a JOIN supplier_v b
          ON b.s_suppkey > a.s_suppkey
         AND b.s_suppkey <= a.s_suppkey + 5
        GROUP BY 1 ORDER BY dist""")
    }, Some("""
      SELECT least(levenshtein(a.s_name, b.s_name), 4) AS dist,
             count(*) AS n_pairs
      FROM supplier a JOIN supplier b
        ON b.s_suppkey > a.s_suppkey
       AND b.s_suppkey <= a.s_suppkey + 5
      GROUP BY 1 ORDER BY dist"""))
  )
}
