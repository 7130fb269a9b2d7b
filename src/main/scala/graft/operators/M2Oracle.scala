package graft.operators

/** DuckDB replay of blocked-CV λ selection (M2) at the ridge point — the
  * SQL side of `m2_cv_lambda`'s hash check (reference enetVAR.R:27-36;
  * engine side linalg/BlockedCv.scala).
  *
  * Replayable because at α=0 every (fold, λ) fit has the closed form
  * (X̃ᵀX̃ + N_train·λI)β̃ = X̃ᵀy on the fold's sd-scaled training complement
  * (m1's/m8's argument — the warm-started CD path converges to ~1e-9·sd of
  * that solution at every grid point), and the VAR(1) × K=2 testdata design
  * keeps each system 2×2, i.e. one Cramer solve per (equation, fold, λ).
  * What it replays, CTE for CTE:
  *  - `monthly`→`idx`: the scaled (rev/1e8, n_orders/1e3) monthly panel,
  *    time-indexed (M8Oracle's panel, verbatim);
  *  - `d`: the VAR(1) design — x = lagged pair, z = both responses, and
  *    the reference's contiguous BLOCK-OF-10 foldid (enetVAR.R:28-32):
  *    design row i (0-based) → fold i/10 + 1;
  *  - `tot`/`fsum`/`train`: per-(equation, fold) training-complement sums
  *    by SUBTRACTION (total − fold) — one grouped pass instead of a
  *    fold-count × data join, the same algebra the engine's shareable
  *    CvDesigns exploits;
  *  - `lmax`/`grid`: glmnet's auto λ sequence at α=0 —
  *    λmax = maxⱼ|⟨x̃ⱼ,y⟩|/(N·0.001) on the FULL-data sd scaling, 100
  *    log-spaced points down to λmax·1e-4 (ElasticNet.
  *    autoLambdaSequenceCov; n > p so ε = 1e-4);
  *  - `sys`→`beta`: the standardized 2×2 normal equations with the
  *    N_train·λ ridge, Cramer-solved, β unscaled through the fold sds
  *    (scaled-not-centered, CovDesign's no-intercept semantics);
  *  - `errs`→`cvms`: held-out squared error pooled per observation over
  *    all folds (cv.glmnet's cvm), argmin with the engine's tie-break
  *    (first grid index, i.e. largest λ);
  *  - output: grid position (integer-exact), ln λ and cvm e6-quantized
  *    (ln λ is analytic — ~1e-12 cross-engine agreement; cvm ≈ 7e-3 with
  *    adjacent grid points ~3 e6-units apart, so the ~1e-9 CD-vs-closed-
  *    form gap has three orders of margin).
  *
  * NO `--` comments inside the SQL: oracle strings are normalized to one
  * line before the dump.
  */
object M2Oracle {

  val sql: String =
    """WITH monthly AS (
         SELECT cast(date_trunc('month', o_orderdate) AS date) AS month,
                sum(o_totalprice) / 1e8 AS y1,
                count(*) / 1e3 AS y2
         FROM orders GROUP BY 1),
       idx AS (
         SELECT row_number() OVER (ORDER BY month) AS t, y1, y2 FROM monthly),
       d AS (
         SELECT r.t - 1 AS r, lx.y1 AS x1, lx.y2 AS x2,
                r.y1 AS z1, r.y2 AS z2,
                cast(floor((r.t - 2) / 10.0) AS int) + 1 AS fold
         FROM idx r JOIN idx lx ON lx.t = r.t - 1),
       eqs AS (SELECT 1 AS e, 'rev' AS equation UNION ALL SELECT 2, 'n_orders'),
       dr AS (
         SELECT q.e, d.r, d.x1, d.x2, d.fold,
                CASE q.e WHEN 1 THEN d.z1 ELSE d.z2 END AS z
         FROM d CROSS JOIN eqs q),
       tot AS (
         SELECT e, count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
                sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22,
                sum(x1 * z) AS sy1, sum(x2 * z) AS sy2
         FROM dr GROUP BY 1),
       fsum AS (
         SELECT e, fold, count(*) AS n, sum(x1) AS s1, sum(x2) AS s2,
                sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22,
                sum(x1 * z) AS sy1, sum(x2 * z) AS sy2
         FROM dr GROUP BY 1, 2),
       lmax AS (
         SELECT e, greatest(
             abs(sy1 / sqrt(s11 / n - (s1 / n) * (s1 / n))),
             abs(sy2 / sqrt(s22 / n - (s2 / n) * (s2 / n)))) / n / 0.001 AS lm
         FROM tot),
       grid AS (
         SELECT l.e, g.li,
                exp(ln(l.lm) + (ln(l.lm * 1e-4) - ln(l.lm)) * g.li / 99.0) AS lam
         FROM lmax l CROSS JOIN (SELECT unnest(generate_series(0, 99)) AS li) g),
       train AS (
         SELECT t.e, f.fold, t.n - f.n AS ntr,
                sqrt((t.s11 - f.s11) / (t.n - f.n)
                     - ((t.s1 - f.s1) / (t.n - f.n)) * ((t.s1 - f.s1) / (t.n - f.n))) AS sd1,
                sqrt((t.s22 - f.s22) / (t.n - f.n)
                     - ((t.s2 - f.s2) / (t.n - f.n)) * ((t.s2 - f.s2) / (t.n - f.n))) AS sd2,
                t.s11 - f.s11 AS t11, t.s12 - f.s12 AS t12, t.s22 - f.s22 AS t22,
                t.sy1 - f.sy1 AS ty1, t.sy2 - f.sy2 AS ty2
         FROM tot t JOIN fsum f ON f.e = t.e),
       sys AS (
         SELECT tr.e, tr.fold, g.li, tr.sd1, tr.sd2,
                tr.t11 / (tr.sd1 * tr.sd1) + tr.ntr * g.lam AS a11,
                tr.t12 / (tr.sd1 * tr.sd2) AS a12,
                tr.t22 / (tr.sd2 * tr.sd2) + tr.ntr * g.lam AS a22,
                tr.ty1 / tr.sd1 AS c1,
                tr.ty2 / tr.sd2 AS c2
         FROM train tr JOIN grid g ON g.e = tr.e),
       beta AS (
         SELECT e, fold, li,
                (c1 * a22 - a12 * c2) / (a11 * a22 - a12 * a12) / sd1 AS b1,
                (a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12) / sd2 AS b2
         FROM sys),
       errs AS (
         SELECT b.e, b.li,
                sum((dr.z - dr.x1 * b.b1 - dr.x2 * b.b2)
                    * (dr.z - dr.x1 * b.b1 - dr.x2 * b.b2)) AS se,
                count(*) AS cnt
         FROM beta b JOIN dr ON dr.e = b.e AND dr.fold = b.fold
         GROUP BY 1, 2),
       cvms AS (
         SELECT e, li, se / cnt AS cvm,
                row_number() OVER (PARTITION BY e ORDER BY se / cnt, li) AS rk
         FROM errs),
       nf AS (SELECT max(fold) AS n_folds FROM d)
       SELECT q.equation,
              cast(c.li AS bigint) AS lambda_idx,
              cast(round(ln(g.lam) * 1e6) AS bigint) AS ln_lambda_e6,
              cast(round(c.cvm * 1e6) AS bigint) AS cv_mse_e6,
              cast(nf.n_folds AS bigint) AS n_folds
       FROM cvms c
       JOIN eqs q ON q.e = c.e
       JOIN grid g ON g.e = c.e AND g.li = c.li
       CROSS JOIN nf
       WHERE c.rk = 1
       ORDER BY q.equation"""
}
