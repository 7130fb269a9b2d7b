package graft.operators

/** DuckDB replay of the rolling-origin grid tuner (M15) at the LASSO point
  * — the SQL side of `m15_lasso_tune`'s hash check (reference `enetVARtune`,
  * enetVAR.R:538-565 / caret timeSlice; engine side
  * tune/RollingOriginTuner.scala), the α=1 bracket that pairs with
  * M15Oracle's α=0 ridge bracket so the general-α `m15_rolling_tune`
  * (rows-only by design) is pinned hash-exact from BOTH ends of its α
  * range on the identical distributed machinery.
  *
  * Replayable because on a ONE-predictor design the α=1 coordinate-descent
  * fixed point IS the soft-threshold closed form: with the prefix design
  * scaled-not-centered (CovDesign's no-intercept semantics — population sd
  * about the mean, column not centered), z₁ = (Σx²/o)/sd², c = ⟨x/sd, y⟩/o,
  * and the 1-D lasso minimizer of (1/2N)‖y − x̃β‖² + λ|β| is
  * β̃ = sign(c)·max(|c| − λ, 0)/z₁, unscaled to β = β̃/sd. The engine's
  * solver reaches that point EXACTLY (first sweep lands on the fixed point,
  * delta = 0 on the next, KKT scan clean — no tolerance gap to paper over),
  * so the e6 quantization agrees across engines. The 1-predictor design is
  * the VAR(1) × K=1 embedding of the monthly revenue series (the `rev`
  * half of M15Oracle's panel, same /1e8 scaling).
  *
  * CTE-for-CTE this mirrors M15Oracle: `monthly`→`idx`→`d` panel + design
  * (design row r ↔ d.t = r+1's pairing, prefix of origin o = d.t ≤ o+1);
  * `origins` the caret timeSlice resamples (initialWindow ⌊T/2⌋ panel rows,
  * fixedWindow=FALSE, horizon 8); `sums`→`sds` one grouped pass of prefix
  * moments; `grid` the analytic λ grid 10^(1 − 5i/39) descending;
  * `beta` the soft-threshold solve; `rmse`→`score` horizon-block RMSE
  * √(Σe²/8), mean over origins, winner with the engine's tie-break (first
  * grid index = largest λ).
  *
  * NO `--` comments inside the SQL: oracle strings are normalized to one
  * line before the dump.
  */
object M15LassoOracle {

  val sql: String =
    """WITH monthly AS (
         SELECT cast(date_trunc('month', o_orderdate) AS date) AS month,
                sum(o_totalprice) / 1e8 AS y1
         FROM orders GROUP BY 1),
       idx AS (
         SELECT row_number() OVER (ORDER BY month) AS t, y1 FROM monthly),
       params AS (
         SELECT cast(count(*) AS int) AS n,
                cast(floor(count(*) / 2) AS int) AS iw
         FROM idx),
       d AS (
         SELECT r.t, l.y1 AS x, r.y1 AS z
         FROM idx r JOIN idx l ON l.t = r.t - 1),
       origins AS (
         SELECT unnest(generate_series(iw, n - 1 - 8)) AS o FROM params),
       sums AS (
         SELECT o.o, cast(o.o AS double) AS np,
                sum(d.x) AS s1, sum(d.x * d.x) AS s11, sum(d.x * d.z) AS p1
         FROM origins o JOIN d ON d.t <= o.o + 1 GROUP BY 1),
       sds AS (
         SELECT o, np, s11, p1,
                sqrt(s11 / np - (s1 / np) * (s1 / np)) AS sd
         FROM sums),
       grid AS (
         SELECT g.li, pow(10.0, 1.0 - 5.0 * g.li / 39.0) AS lam
         FROM (SELECT unnest(generate_series(0, 39)) AS li) g),
       beta AS (
         SELECT s.o, g.li,
                CASE WHEN abs(s.p1 / (s.np * s.sd)) > g.lam
                     THEN sign(s.p1 / (s.np * s.sd))
                          * (abs(s.p1 / (s.np * s.sd)) - g.lam)
                          / (s.s11 / (s.np * s.sd * s.sd)) / s.sd
                     ELSE 0.0 END AS b
         FROM sds s CROSS JOIN grid g),
       rmse AS (
         SELECT b.o, b.li,
                sqrt(sum((d.z - d.x * b.b) * (d.z - d.x * b.b)) / 8.0) AS r
         FROM beta b
         JOIN d ON d.t BETWEEN b.o + 2 AND b.o + 9
         GROUP BY 1, 2),
       score AS (
         SELECT li, sum(r) / count(*) AS mean_rmse,
                row_number() OVER (ORDER BY sum(r) / count(*), li) AS rk
         FROM rmse GROUP BY 1)
       SELECT 'rev' AS equation,
              cast(s.li AS bigint) AS lambda_idx,
              cast(round(ln(g.lam) * 1e6) AS bigint) AS ln_lambda_e6,
              cast(round(s.mean_rmse * 1e6) AS bigint) AS mean_rmse_e6
       FROM score s
       JOIN grid g ON g.li = s.li
       WHERE s.rk = 1
       ORDER BY equation"""
}
