package graft.operators

/** DuckDB replay of the IC table (M8) at the ridge point — the SQL side of
  * `m8_ic_table`'s hash check (reference `infCrit`, enetVAR.R:177-202;
  * engine side varmodel/InfCrit.scala).
  *
  * Replayable because at α=0 the per-equation solver has the closed form
  * (X̃ᵀX̃ + NλI)β̃ = X̃ᵀy on the sd-scaled design (m1's argument — the CD
  * solver converges to ~1e-9·sd of that solution), and the K=2 testdata
  * panel keeps Σ̂ a 2×2. What it replays, CTE for CTE, for p = 1..3:
  *  - `monthly`→`idx`: the scaled (rev/1e8, n_orders/1e3) monthly panel,
  *    time-indexed;
  *  - `xs`: the VAR(p) design in LONG form — one row per (p, obs t,
  *    regressor j), j = (i−1)·2 + s for lag i, series s (lag-major,
  *    VAR.Z's cbind order, enetVAR.R:292-295) — generic in p, nothing
  *    unrolled;
  *  - `sds`/`xstd`: glmnet's population-sd column scaling (scaled, NOT
  *    centered — the no-intercept semantics of CovDesign);
  *  - `sgram`/`sy`→`bgj`: the standardized normal equations with the N·λ
  *    ridge augmented with BOTH equations' rhs, solved by the recursive-CTE
  *    Gauss–Jordan (AdfOracle's kernel); β unscales through the sd list;
  *  - `res`→`dets`: residuals against the ORIGINAL design, Σ̂ = UᵀU/T and
  *    its 2×2 determinant with the reference's negative-det clamp to 1000
  *    (enetVAR.R:185-186);
  *  - `ogram`→`dofs`: Tibshirani–Taylor dof. At ridge every coefficient is
  *    active, so G = I_K ⊗ ZᵀZ (original scale, InfCrit's gram) and
  *    dof = K · tr((ZᵀZ + λ(1−α)/2·I)⁻¹ ZᵀZ): the [A | G] augmentation
  *    reduced by the same Gauss–Jordan leaves A⁻¹G in the right block,
  *    whose diagonal sums to the trace;
  *  - `final`: fpe/aic/hq/sc exactly as infCrit combines det Σ̂, dof, T.
  *
  * All five outputs compare e4-quantized: det Σ̂ here is ~5e-7, so the
  * CD-vs-closed-form coefficient gap (~1e-9·sd) amplifies through
  * ln(det Σ̂) to ~1e-6 absolute — inside e4's step with two orders of
  * margin, but ON e6 rounding boundaries (observed: 6/18 off-by-one at
  * e6).
  *
  * NO `--` comments inside the SQL: oracle strings are normalized to one
  * line before the dump.
  */
object M8Oracle {

  val sql: String =
    """WITH monthly AS (
         SELECT cast(date_trunc('month', o_orderdate) AS date) AS month,
                sum(o_totalprice) / 1e8 AS y1,
                count(*) / 1e3 AS y2
         FROM orders GROUP BY 1),
       idx AS (
         SELECT row_number() OVER (ORDER BY month) AS t, y1, y2 FROM monthly),
       ps AS (SELECT unnest([1, 2, 3]) AS p),
       dims AS (SELECT p, 2 * p AS d FROM ps),
       xs AS (
         SELECT j.p, r.t, j.j,
                CASE WHEN j.j % 2 = 1 THEN lx.y1 ELSE lx.y2 END AS x
         FROM (SELECT p, unnest(generate_series(1, 2 * p)) AS j FROM ps) j
         JOIN idx r ON r.t > j.p
         JOIN idx lx ON lx.t = r.t - cast(ceil(j.j / 2.0) AS int)),
       sds AS (
         SELECT p, j, sqrt(greatest(avg(x * x) - avg(x) * avg(x), 0)) AS sd
         FROM xs GROUP BY 1, 2),
       sdl AS (SELECT p, list(sd ORDER BY j) AS sds FROM sds GROUP BY 1),
       xstd AS (
         SELECT x.p, x.t, x.j, x.x / s.sd AS v
         FROM xs x JOIN sds s ON s.p = x.p AND s.j = x.j),
       tred AS (
         SELECT p, count(*) AS tr
         FROM (SELECT DISTINCT p, t FROM xs) GROUP BY 1),
       sgram AS (
         SELECT a.p, a.j, b.j AS l, sum(a.v * b.v) AS m
         FROM xstd a JOIN xstd b ON b.p = a.p AND b.t = a.t
         GROUP BY 1, 2, 3),
       sy AS (
         SELECT x.p, x.j, sum(x.v * i.y1) AS v1, sum(x.v * i.y2) AS v2
         FROM xstd x JOIN idx i ON i.t = x.t GROUP BY 1, 2),
       brow AS (
         SELECT g.p, g.j,
                list_append(list_append(
                  list(g.m + CASE WHEN g.l = g.j THEN t.tr * 0.01
                             ELSE 0 END ORDER BY g.l),
                  any_value(s.v1)), any_value(s.v2)) AS row
         FROM sgram g
         JOIN tred t ON t.p = g.p
         JOIN sy s ON s.p = g.p AND s.j = g.j
         GROUP BY g.p, g.j),
       baug0 AS (
         SELECT p, 0 AS step, list(row ORDER BY j) AS aug FROM brow GROUP BY p),
       bgj AS (
         WITH RECURSIVE g AS (
           SELECT * FROM baug0
           UNION ALL
           SELECT g.p, g.step + 1,
             list_transform(g.aug, (row, r) ->
               CASE WHEN r = g.step + 1
                 THEN list_transform(row, x -> x / g.aug[g.step + 1][g.step + 1])
                 ELSE list_transform(row, (x, c) ->
                   x - row[g.step + 1] * g.aug[g.step + 1][c]
                     / g.aug[g.step + 1][g.step + 1])
               END)
           FROM g JOIN dims dm ON dm.p = g.p WHERE g.step < dm.d)
         SELECT g.* FROM g JOIN dims dm ON dm.p = g.p WHERE g.step = dm.d),
       best AS (
         SELECT b.p,
                list_transform(range(1, dm.d + 1),
                  j -> b.aug[j][dm.d + 1] / sl.sds[j]) AS b1,
                list_transform(range(1, dm.d + 1),
                  j -> b.aug[j][dm.d + 2] / sl.sds[j]) AS b2
         FROM bgj b JOIN dims dm ON dm.p = b.p JOIN sdl sl ON sl.p = b.p),
       res AS (
         SELECT x.p, x.t,
                any_value(i.y1) - sum(x.x * e.b1[x.j]) AS r1,
                any_value(i.y2) - sum(x.x * e.b2[x.j]) AS r2
         FROM xs x JOIN idx i ON i.t = x.t JOIN best e ON e.p = x.p
         GROUP BY x.p, x.t),
       sig AS (
         SELECT p, count(*) AS tr,
                sum(r1 * r1) AS s11, sum(r1 * r2) AS s12, sum(r2 * r2) AS s22
         FROM res GROUP BY 1),
       dets AS (
         SELECT p, tr,
                CASE WHEN (s11 / tr) * (s22 / tr) - (s12 / tr) * (s12 / tr) < 0
                     THEN 1000.0
                     ELSE (s11 / tr) * (s22 / tr) - (s12 / tr) * (s12 / tr)
                END AS dsig
         FROM sig),
       ogram AS (
         SELECT a.p, a.j, b.j AS l, sum(a.x * b.x) AS m
         FROM xs a JOIN xs b ON b.p = a.p AND b.t = a.t
         GROUP BY 1, 2, 3),
       drow AS (
         SELECT p, j,
                list_cat(
                  list(m + CASE WHEN l = j THEN 0.005 ELSE 0 END ORDER BY l),
                  list(m ORDER BY l)) AS row
         FROM ogram GROUP BY p, j),
       daug0 AS (
         SELECT p, 0 AS step, list(row ORDER BY j) AS aug FROM drow GROUP BY p),
       dgj AS (
         WITH RECURSIVE g AS (
           SELECT * FROM daug0
           UNION ALL
           SELECT g.p, g.step + 1,
             list_transform(g.aug, (row, r) ->
               CASE WHEN r = g.step + 1
                 THEN list_transform(row, x -> x / g.aug[g.step + 1][g.step + 1])
                 ELSE list_transform(row, (x, c) ->
                   x - row[g.step + 1] * g.aug[g.step + 1][c]
                     / g.aug[g.step + 1][g.step + 1])
               END)
           FROM g JOIN dims dm ON dm.p = g.p WHERE g.step < dm.d)
         SELECT g.* FROM g JOIN dims dm ON dm.p = g.p WHERE g.step = dm.d),
       dofs AS (
         SELECT g.p,
                2 * list_sum(list_transform(range(1, dm.d + 1),
                  j -> g.aug[j][dm.d + j])) AS dof
         FROM dgj g JOIN dims dm ON dm.p = g.p),
       final AS (
         SELECT cast(d.p AS bigint) AS lag,
                (1 + f.dof / d.tr) / (1 - f.dof / d.tr) * d.dsig AS fpe,
                ln(d.dsig) + 2.0 * f.dof / d.tr AS aic,
                ln(d.dsig) + 2.0 * ln(ln(d.tr)) * f.dof / d.tr AS hq,
                ln(d.dsig) + ln(d.tr) * f.dof / d.tr AS sc,
                f.dof AS dof
         FROM dets d JOIN dofs f ON f.p = d.p)
       SELECT lag,
              cast(round(fpe * 1e4) AS bigint) AS fpe_e4,
              cast(round(aic * 1e4) AS bigint) AS aic_e4,
              cast(round(hq * 1e4) AS bigint) AS hq_e4,
              cast(round(sc * 1e4) AS bigint) AS sc_e4,
              cast(round(dof * 1e4) AS bigint) AS dof_e4
       FROM final ORDER BY lag"""
}
