package graft.operators

/** DuckDB replay of the group (mgaussian) elastic-net VAR fit (M7) at the
  * ridge point — the SQL side of `m7_group_enet`'s hash check (reference
  * `GroupEnetVAR`, enetVAR.R:344-366; engine side linalg/GroupElasticNet
  * .scala + varmodel/GroupEnetVar.scala).
  *
  * Replayable because at α=0 the group penalty λ·Σ_j(1−α)/2·‖β_j‖₂²
  * collapses to plain ridge, which SEPARATES per response on the working
  * problem — x columns scaled by the training population sd (CovDesign's
  * scaled-not-centered no-intercept semantics) and responses scaled by
  * THEIR training population sd (glmnet's standardize.response) — so
  * every (fold, λ) fit is one 4×4 normal-equations solve
  * (X̃ᵀX̃ + N_train·λI)B̃ = X̃ᵀỸ with two right-hand sides, and the warm-
  * started block-CD converges to it at ~tol. What it replays, CTE for CTE:
  *  - `monthly`→`idx`: the scaled (rev/1e8, n_orders/1e3) monthly panel
  *    (M8Oracle's panel, verbatim);
  *  - `xs`/`resp`/`dd`/`dr`: the VAR(2) design in long form (lag-major
  *    j = (lag−1)·2 + series, VAR.Z's cbind order) with both responses
  *    and the contiguous BLOCK-OF-10 foldid;
  *  - `xtot`…`txy`: training-complement sums by SUBTRACTION (total −
  *    fold), with fold 0 = the FULL data (the final fit's "fold");
  *  - `lmax`/`grid`: the group auto λ sequence at α=0 —
  *    λmax = max_j ‖(1/N)·x̃_jᵀỸ̃‖₂ / 0.001, 100 log-spaced points down to
  *    λmax·1e-4 (GroupElasticNet.autoLambdaSequence; n > p so ε = 1e-4);
  *  - `brow`→`gj`: the standardized 4×4 normal equations with the
  *    N_train·λ ridge, augmented with BOTH responses' rhs, Gauss–Jordan-
  *    reduced by the recursive CTE over ALL (fold, λ) systems at once
  *    (M8Oracle's kernel, keyed by fold × grid position);
  *  - `beta`: coefficients unscaled through sd_x and sd_y (β_orig =
  *    β̃ · ysd_c / xsd_j, GroupElasticNet's unscale);
  *  - `pred`→`best`: held-out squared error POOLED OVER BOTH RESPONSES
  *    (cv.glmnet's mgaussian cvm), argmin with the engine's tie-break;
  *  - output: the fold-0 (full-data) coefficients at λmin, e6-quantized,
  *    with the grid position (integer-exact). `active` is identically
  *    TRUE at ridge — no thresholding — which is exactly the semantic
  *    under test: the α>0 sparsity behavior stays in GroupEnetSpec.
  *
  * NO `--` comments inside the SQL: oracle strings are normalized to one
  * line before the dump.
  */
object M7Oracle {

  val sql: String =
    """WITH monthly AS (
         SELECT cast(date_trunc('month', o_orderdate) AS date) AS month,
                sum(o_totalprice) / 1e8 AS y1,
                count(*) / 1e3 AS y2
         FROM orders GROUP BY 1),
       idx AS (
         SELECT row_number() OVER (ORDER BY month) AS t, y1, y2 FROM monthly),
       xs AS (
         SELECT r.t - 2 AS r, j.j,
                CASE WHEN j.j % 2 = 1 THEN lx.y1 ELSE lx.y2 END AS x
         FROM (SELECT unnest([1, 2, 3, 4]) AS j) j
         JOIN idx r ON r.t > 2
         JOIN idx lx ON lx.t = r.t - cast(ceil(j.j / 2.0) AS int)),
       resp AS (
         SELECT r.t - 2 AS r, c.c, CASE c.c WHEN 1 THEN r.y1 ELSE r.y2 END AS z
         FROM idx r CROSS JOIN (SELECT unnest([1, 2]) AS c) c
         WHERE r.t > 2),
       dd AS (
         SELECT x.r, cast(floor((x.r - 1) / 10.0) AS int) + 1 AS fold, x.j, x.x
         FROM xs x),
       dr AS (
         SELECT d.r, d.fold, d.j, d.x, p.c, p.z
         FROM dd d JOIN resp p ON p.r = d.r),
       xtot AS (
         SELECT a.j, b.j AS l, sum(a.x * b.x) AS m
         FROM dd a JOIN dd b ON b.r = a.r GROUP BY 1, 2),
       xftot AS (
         SELECT a.fold, a.j, b.j AS l, sum(a.x * b.x) AS m
         FROM dd a JOIN dd b ON b.r = a.r GROUP BY 1, 2, 3),
       x1tot AS (SELECT j, sum(x) AS s, count(*) AS n FROM dd GROUP BY 1),
       x1f AS (SELECT fold, j, sum(x) AS s, count(*) AS n FROM dd GROUP BY 1, 2),
       ytot AS (SELECT c, sum(z) AS s, sum(z * z) AS ss FROM resp JOIN dd USING (r) WHERE j = 1 GROUP BY 1),
       yf AS (SELECT d.fold, p.c, sum(p.z) AS s, sum(p.z * p.z) AS ss
              FROM resp p JOIN dd d ON d.r = p.r AND d.j = 1 GROUP BY 1, 2),
       xytot AS (SELECT j, c, sum(x * z) AS m FROM dr GROUP BY 1, 2),
       xyf AS (SELECT fold, j, c, sum(x * z) AS m FROM dr GROUP BY 1, 2, 3),
       folds AS (SELECT unnest(generate_series(0, (SELECT max(fold) FROM dd))) AS f),
       trn AS (
         SELECT f.f,
                (SELECT any_value(n) FROM x1tot)
                  - coalesce((SELECT any_value(n) FROM x1f WHERE fold = f.f), 0) AS ntr
         FROM folds f),
       tx1 AS (
         SELECT f.f, t.j, t.s - coalesce(x1.s, 0) AS s, tr.ntr
         FROM folds f JOIN x1tot t ON true
         LEFT JOIN x1f x1 ON x1.fold = f.f AND x1.j = t.j
         JOIN trn tr ON tr.f = f.f),
       sdx AS (
         SELECT t1.f AS f, t1.j AS j, sqrt((tm.m - coalesce(fm.m, 0)) / t1.ntr - (t1.s / t1.ntr) * (t1.s / t1.ntr)) AS sd
         FROM tx1 t1
         JOIN xtot tm ON tm.j = t1.j AND tm.l = t1.j
         LEFT JOIN xftot fm ON fm.fold = t1.f AND fm.j = t1.j AND fm.l = t1.j),
       ty AS (
         SELECT f.f, y.c, y.s - coalesce(yy.s, 0) AS s, y.ss - coalesce(yy.ss, 0) AS ss, tr.ntr
         FROM folds f JOIN ytot y ON true
         LEFT JOIN yf yy ON yy.fold = f.f AND yy.c = y.c
         JOIN trn tr ON tr.f = f.f),
       sdy AS (
         SELECT ty.f AS f, ty.c AS c, sqrt(ss / ntr - (s / ntr) * (s / ntr)) AS sd FROM ty),
       tg AS (
         SELECT f.f, tm.j, tm.l, tm.m - coalesce(fm.m, 0) AS m
         FROM folds f JOIN xtot tm ON true
         LEFT JOIN xftot fm ON fm.fold = f.f AND fm.j = tm.j AND fm.l = tm.l),
       txy AS (
         SELECT f.f, tm.j, tm.c, tm.m - coalesce(fm.m, 0) AS m
         FROM folds f JOIN xytot tm ON true
         LEFT JOIN xyf fm ON fm.fold = f.f AND fm.j = tm.j AND fm.c = tm.c),
       lmax AS (
         SELECT max(g) / 0.001 AS lm FROM (
           SELECT t.j, sqrt(sum((t.m / (sx.sd * sy.sd) / t1.ntr) * (t.m / (sx.sd * sy.sd) / t1.ntr))) AS g
           FROM txy t
           JOIN sdx sx ON sx.f = 0 AND sx.j = t.j
           JOIN sdy sy ON sy.f = 0 AND sy.c = t.c
           JOIN trn t1 ON t1.f = 0
           WHERE t.f = 0 GROUP BY 1)),
       grid AS (
         SELECT g.li, exp(ln(l.lm) + (ln(l.lm * 1e-4) - ln(l.lm)) * g.li / 99.0) AS lam
         FROM lmax l CROSS JOIN (SELECT unnest(generate_series(0, 99)) AS li) g),
       brow AS (
         SELECT g.f, gr.li, g.j,
                list_append(list_append(
                  list(g.m / (sa.sd * sb.sd)
                       + CASE WHEN g.l = g.j THEN tr.ntr * gr.lam ELSE 0 END ORDER BY g.l),
                  any_value(c1.m / (sa.sd * y1.sd))),
                  any_value(c2.m / (sa.sd * y2.sd))) AS row
         FROM tg g
         JOIN grid gr ON true
         JOIN sdx sa ON sa.f = g.f AND sa.j = g.j
         JOIN sdx sb ON sb.f = g.f AND sb.j = g.l
         JOIN trn tr ON tr.f = g.f
         JOIN txy c1 ON c1.f = g.f AND c1.j = g.j AND c1.c = 1
         JOIN txy c2 ON c2.f = g.f AND c2.j = g.j AND c2.c = 2
         JOIN sdy y1 ON y1.f = g.f AND y1.c = 1
         JOIN sdy y2 ON y2.f = g.f AND y2.c = 2
         GROUP BY g.f, gr.li, g.j),
       aug0 AS (
         SELECT f, li, 0 AS step, list(row ORDER BY j) AS aug FROM brow GROUP BY 1, 2),
       gj AS (
         WITH RECURSIVE g AS (
           SELECT * FROM aug0
           UNION ALL
           SELECT g.f, g.li, g.step + 1,
             list_transform(g.aug, (row, r) ->
               CASE WHEN r = g.step + 1
                 THEN list_transform(row, x -> x / g.aug[g.step + 1][g.step + 1])
                 ELSE list_transform(row, (x, cc) ->
                   x - row[g.step + 1] * g.aug[g.step + 1][cc]
                     / g.aug[g.step + 1][g.step + 1])
               END)
           FROM g WHERE g.step < 4)
         SELECT * FROM g WHERE step = 4),
       beta AS (
         SELECT gj.f, gj.li, jj.j,
                gj.aug[jj.j][5] * y1.sd / sx.sd AS b1,
                gj.aug[jj.j][6] * y2.sd / sx.sd AS b2
         FROM gj
         CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS j) jj
         JOIN sdx sx ON sx.f = gj.f AND sx.j = jj.j
         JOIN sdy y1 ON y1.f = gj.f AND y1.c = 1
         JOIN sdy y2 ON y2.f = gj.f AND y2.c = 2),
       pred AS (
         SELECT b.li, d.fold, d.r,
                sum(d.x * b.b1) AS p1, sum(d.x * b.b2) AS p2
         FROM dd d JOIN beta b ON b.f = d.fold AND b.j = d.j
         GROUP BY 1, 2, 3),
       errs AS (
         SELECT p.li, sum((z1.z - p.p1) * (z1.z - p.p1) + (z2.z - p.p2) * (z2.z - p.p2)) AS se
         FROM pred p
         JOIN resp z1 ON z1.r = p.r AND z1.c = 1
         JOIN resp z2 ON z2.r = p.r AND z2.c = 2
         GROUP BY 1),
       best AS (
         SELECT li FROM (
           SELECT li, row_number() OVER (ORDER BY se, li) AS rk FROM errs) WHERE rk = 1)
       SELECT CASE b.j WHEN 1 THEN 'rev.l1' WHEN 2 THEN 'n_orders.l1'
                       WHEN 3 THEN 'rev.l2' ELSE 'n_orders.l2' END AS predictor,
              cast(round(b.b1 * 1e6) AS bigint) AS coef_rev_e6,
              cast(round(b.b2 * 1e6) AS bigint) AS coef_n_orders_e6,
              TRUE AS active,
              cast((SELECT li FROM best) AS bigint) AS lambda_idx
       FROM beta b
       WHERE b.f = 0 AND b.li = (SELECT li FROM best)
       ORDER BY predictor"""
}
