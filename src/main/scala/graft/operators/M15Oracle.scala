package graft.operators

/** DuckDB replay of the rolling-origin grid tuner (M15) at the ridge point
  * — the SQL side of `m15_ridge_tune`'s hash check (reference `enetVARtune`,
  * enetVAR.R:538-565 / caret timeSlice; engine side
  * tune/RollingOriginTuner.scala).
  *
  * Replayable because at α=0 every (origin, λ) fit has the ridge closed
  * form (X̃ᵀX̃ + N·λI)β̃ = X̃ᵀy on the origin's sd-scaled PREFIX design
  * (m1/m2/m7's argument), and the VAR(1) × K=2 testdata design keeps each
  * system a 2×2 Cramer solve. What it replays, CTE for CTE:
  *  - `monthly`→`idx`→`d`: the scaled monthly panel and its VAR(1) design
  *    rows (M2Oracle's panel; design row r ↔ d.t = r+2);
  *  - `params`/`origins`: caret's timeSlice resamples — initialWindow
  *    ⌊T/2⌋ panel rows, fixedWindow=FALSE, so origin o trains on design
  *    rows 1..o (d.t ≤ o+1) and scores the next h=8 rows (RollingOriginTuner
  *    .tune: origins initWindow..tReduced−horizon);
  *  - `sums`→`sys`→`beta`: per-origin prefix Gram/moment sums in one
  *    grouped pass, the scaled-not-centered standardization (population sd
  *    about the mean, columns NOT centered — CovDesign's no-intercept
  *    semantics), the o·λ ridge, Cramer solve, β unscaled through the
  *    prefix sds;
  *  - `grid`: the query's own λ grid 10^(1 − 5i/39), i = 0..39, descending
  *    (analytic — exact agreement across engines);
  *  - `rmse`→`score`: per-(origin, λ) horizon-block RMSE √(Σe²/8) over the
  *    8 scoring rows, MEAN over origins (caret's RMSE selection), winner
  *    per equation with the engine's tie-break (first grid index, i.e.
  *    largest λ);
  *  - output: winning grid position (integer-exact), ln λ (analytic) and
  *    the mean RMSE e6-quantized — the CD-vs-closed-form gap at the tuner's
  *    tight tolerance is orders inside the quantum.
  *
  * NO `--` comments inside the SQL: oracle strings are normalized to one
  * line before the dump.
  */
object M15Oracle {

  val sql: String =
    """WITH monthly AS (
         SELECT cast(date_trunc('month', o_orderdate) AS date) AS month,
                sum(o_totalprice) / 1e8 AS y1,
                count(*) / 1e3 AS y2
         FROM orders GROUP BY 1),
       idx AS (
         SELECT row_number() OVER (ORDER BY month) AS t, y1, y2 FROM monthly),
       params AS (
         SELECT cast(count(*) AS int) AS n,
                cast(floor(count(*) / 2) AS int) AS iw
         FROM idx),
       d AS (
         SELECT r.t, l.y1 AS x1, l.y2 AS x2, r.y1 AS z1, r.y2 AS z2
         FROM idx r JOIN idx l ON l.t = r.t - 1),
       origins AS (
         SELECT unnest(generate_series(iw, n - 1 - 8)) AS o FROM params),
       eqs AS (SELECT 1 AS e, 'rev' AS equation UNION ALL SELECT 2, 'n_orders'),
       sums AS (
         SELECT o.o, cast(o.o AS double) AS np,
                sum(d.x1) AS s1, sum(d.x2) AS s2,
                sum(d.x1 * d.x1) AS s11, sum(d.x1 * d.x2) AS s12,
                sum(d.x2 * d.x2) AS s22,
                sum(d.x1 * d.z1) AS p1, sum(d.x2 * d.z1) AS p2,
                sum(d.x1 * d.z2) AS q1, sum(d.x2 * d.z2) AS q2
         FROM origins o JOIN d ON d.t <= o.o + 1 GROUP BY 1),
       sds AS (
         SELECT o, np, s11, s12, s22, p1, p2, q1, q2,
                sqrt(s11 / np - (s1 / np) * (s1 / np)) AS sd1,
                sqrt(s22 / np - (s2 / np) * (s2 / np)) AS sd2
         FROM sums),
       grid AS (
         SELECT g.li, pow(10.0, 1.0 - 5.0 * g.li / 39.0) AS lam
         FROM (SELECT unnest(generate_series(0, 39)) AS li) g),
       sys AS (
         SELECT s.o, q.e, g.li, s.sd1, s.sd2,
                s.s11 / (s.sd1 * s.sd1) + s.np * g.lam AS a11,
                s.s12 / (s.sd1 * s.sd2) AS a12,
                s.s22 / (s.sd2 * s.sd2) + s.np * g.lam AS a22,
                (CASE q.e WHEN 1 THEN s.p1 ELSE s.q1 END) / s.sd1 AS c1,
                (CASE q.e WHEN 1 THEN s.p2 ELSE s.q2 END) / s.sd2 AS c2
         FROM sds s CROSS JOIN eqs q CROSS JOIN grid g),
       beta AS (
         SELECT o, e, li,
                (c1 * a22 - a12 * c2) / (a11 * a22 - a12 * a12) / sd1 AS b1,
                (a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12) / sd2 AS b2
         FROM sys),
       rmse AS (
         SELECT b.o, b.e, b.li,
                sqrt(sum(
                  ((CASE b.e WHEN 1 THEN d.z1 ELSE d.z2 END)
                    - d.x1 * b.b1 - d.x2 * b.b2)
                  * ((CASE b.e WHEN 1 THEN d.z1 ELSE d.z2 END)
                    - d.x1 * b.b1 - d.x2 * b.b2)) / 8.0) AS r
         FROM beta b
         JOIN d ON d.t BETWEEN b.o + 2 AND b.o + 9
         GROUP BY 1, 2, 3),
       score AS (
         SELECT e, li, sum(r) / count(*) AS mean_rmse,
                row_number() OVER (PARTITION BY e
                                   ORDER BY sum(r) / count(*), li) AS rk
         FROM rmse GROUP BY 1, 2)
       SELECT q.equation,
              cast(s.li AS bigint) AS lambda_idx,
              cast(round(ln(g.lam) * 1e6) AS bigint) AS ln_lambda_e6,
              cast(round(s.mean_rmse * 1e6) AS bigint) AS mean_rmse_e6
       FROM score s
       JOIN eqs q ON q.e = s.e
       JOIN grid g ON g.li = s.li
       WHERE s.rk = 1
       ORDER BY q.equation"""
}
