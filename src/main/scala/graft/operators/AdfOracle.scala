package graft.operators

/** DuckDB replay of the batch ADF test (T1) — the SQL side of
  * `t1_adf_batch`'s hash check, kept in its own object because it is the
  * largest oracle in the corpus.
  *
  * What it replays, CTE for CTE (reference semantics: enetVAR.R:761-772
  * delegating to tseries::adf.test; our engine side is stats/Adf.scala):
  *  - `daily`/`lev`: the per-type daily level series, time-indexed;
  *  - `meta`: N, n = N−1, the tseries default lag k = ⌊(N−1)^⅓⌋, and the
  *    regressor count p = 3 + k;
  *  - `dy`→`reg`: the trend-case design in LONG form — one row per
  *    (series, obs t, regressor j) with j = 1: level x_t, 2: intercept,
  *    3: trend t, 3+i: Δx_{t−i} — so the construction is generic in k,
  *    nothing is unrolled;
  *  - `xtx`/`xty`/`yty`: the normal equations accumulated relationally
  *    (a self-join + group-by, p²+p tiny cells per series);
  *  - `aug0`→`gj`: [XᵀX | Xᵀy | e₀] solved by Gauss–Jordan elimination
  *    written as a RECURSIVE CTE over list-typed rows (p steps; pivoting
  *    is unnecessary — XᵀX is positive definite here). After p steps the
  *    augmented columns hold β̂ and the first column of (XᵀX)⁻¹;
  *  - `stat`: t-ratio of ρ̂ via RSS = yᵀy − 2β̂ᵀXᵀy + β̂ᵀXᵀXβ̂ (the
  *    quadratic form avoids materializing residuals);
  *  - `consts`→`final`: the two-stage Dickey–Fuller p-value interpolation
  *    (Banerjee, Dolado, Galbraith & Hendry 1993 Table 4.2c — the table
  *    tseries embeds), R `approx` rule=2 clamping at both stages, exactly
  *    Adf.interp's knot semantics.
  *
  * Statistic and p-value compare e4-quantized: LAPACK's pivoted LU (the
  * Breeze path) and this Gauss–Jordan agree to ~1e-10 on a conditioned
  * 6×6 system, far below the 5e-5 quantization boundary.
  *
  * NO `--` comments inside the SQL: oracle strings are normalized to one
  * line before the dump, and a line comment would swallow the remainder.
  */
object AdfOracle {

  val sql: String =
    """WITH daily AS (
         SELECT event_type AS et, cast(ts AS date) AS day, sum(value) AS v
         FROM events GROUP BY 1, 2),
       lev AS (
         SELECT et, row_number() OVER (PARTITION BY et ORDER BY day) AS t, v AS x
         FROM daily),
       meta AS (
         SELECT et, count(*) AS bign, count(*) - 1 AS n,
                cast(floor(cbrt(cast(count(*) - 1 AS double))) AS int) AS k,
                cast(floor(cbrt(cast(count(*) - 1 AS double))) AS int) + 3 AS p
         FROM lev GROUP BY 1),
       dy AS (
         SELECT l.et, l.t - 1 AS i, l.x - p.x AS y
         FROM lev l JOIN lev p ON p.et = l.et AND p.t = l.t - 1),
       tgrid AS (
         SELECT m.et, m.k, m.n, m.p, d.i AS t, d.y AS yt
         FROM meta m JOIN dy d ON d.et = m.et
         WHERE d.i BETWEEN m.k + 1 AND m.n),
       regj AS (
         SELECT et, t, yt, p, unnest(generate_series(1, p)) AS j FROM tgrid),
       reg AS (
         SELECT r.et, r.t, r.j, r.yt,
                CASE WHEN r.j = 1 THEN lx.x
                     WHEN r.j = 2 THEN cast(1 AS double)
                     WHEN r.j = 3 THEN cast(r.t AS double)
                     ELSE ly.y END AS val
         FROM regj r
         JOIN lev lx ON lx.et = r.et AND lx.t = r.t
         LEFT JOIN dy ly ON ly.et = r.et AND ly.i = r.t - (r.j - 3)),
       xtx AS (
         SELECT a.et, a.j, b.j AS l, sum(a.val * b.val) AS m
         FROM reg a JOIN reg b ON b.et = a.et AND b.t = a.t
         GROUP BY 1, 2, 3),
       xty AS (SELECT et, j, sum(val * yt) AS m FROM reg GROUP BY 1, 2),
       yty AS (
         SELECT et, sum(yt * yt) AS m, count(*) AS nrows
         FROM (SELECT DISTINCT et, t, yt FROM reg) GROUP BY 1),
       augrow AS (
         SELECT x.et, x.j,
                list_append(list_append(list(x.m ORDER BY x.l),
                  any_value(ty.m)),
                  CASE WHEN x.j = 1 THEN cast(1 AS double)
                       ELSE cast(0 AS double) END) AS row
         FROM xtx x JOIN xty ty ON ty.et = x.et AND ty.j = x.j
         GROUP BY x.et, x.j),
       aug0 AS (
         SELECT et, 0 AS step, list(row ORDER BY j) AS aug FROM augrow GROUP BY et),
       gj AS (
         WITH RECURSIVE g AS (
           SELECT * FROM aug0
           UNION ALL
           SELECT g.et, g.step + 1,
             list_transform(g.aug, (row, r) ->
               CASE WHEN r = g.step + 1
                 THEN list_transform(row, x -> x / g.aug[g.step + 1][g.step + 1])
                 ELSE list_transform(row, (x, c) ->
                   x - row[g.step + 1] * g.aug[g.step + 1][c]
                     / g.aug[g.step + 1][g.step + 1])
               END)
           FROM g JOIN meta m ON m.et = g.et WHERE g.step < m.p)
         SELECT g.* FROM g JOIN meta m ON m.et = g.et WHERE g.step = m.p),
       est AS (
         SELECT s.et, m.p, m.k, m.bign, m.n,
                list_transform(range(1, m.p + 1), j -> s.aug[j][m.p + 1]) AS b,
                s.aug[1][m.p + 2] AS inv00
         FROM gj s JOIN meta m ON m.et = s.et),
       quad AS (
         SELECT x.et, sum(x.m * e.b[x.j] * e.b[x.l]) AS q
         FROM xtx x JOIN est e ON e.et = x.et GROUP BY 1),
       bxty AS (
         SELECT t.et, sum(t.m * e.b[t.j]) AS bty
         FROM xty t JOIN est e ON e.et = t.et GROUP BY 1),
       stat AS (
         SELECT e.et, e.k, e.bign, e.n,
                e.b[1] / sqrt(e.inv00 *
                  ((y.m - 2 * bx.bty + q.q) / (y.nrows - e.p))) AS st
         FROM est e JOIN yty y ON y.et = e.et
         JOIN quad q ON q.et = e.et JOIN bxty bx ON bx.et = e.et),
       consts AS (
         SELECT [25.0, 50.0, 100.0, 250.0, 500.0, 100000.0] AS szs,
                [0.01, 0.025, 0.05, 0.10, 0.90, 0.95, 0.975, 0.99] AS ps,
                [[-4.38, -3.95, -3.60, -3.24, -1.14, -0.80, -0.50, -0.15],
                 [-4.15, -3.80, -3.50, -3.18, -1.19, -0.87, -0.58, -0.24],
                 [-4.04, -3.73, -3.45, -3.15, -1.22, -0.90, -0.62, -0.28],
                 [-3.99, -3.69, -3.43, -3.13, -1.23, -0.92, -0.64, -0.31],
                 [-3.98, -3.68, -3.42, -3.13, -1.24, -0.93, -0.65, -0.32],
                 [-3.96, -3.66, -3.41, -3.12, -1.25, -0.94, -0.66, -0.33]] AS tbl),
       rowat AS (
         SELECT s.*, c.ps,
           list_transform(range(1, 9), cc ->
             CASE WHEN s.n <= c.szs[1] THEN c.tbl[1][cc]
                  WHEN s.n >= c.szs[6] THEN c.tbl[6][cc]
                  ELSE c.tbl[length(list_filter(c.szs, z -> z < s.n))][cc]
                     + (s.n - c.szs[length(list_filter(c.szs, z -> z < s.n))])
                       / (c.szs[length(list_filter(c.szs, z -> z < s.n)) + 1]
                          - c.szs[length(list_filter(c.szs, z -> z < s.n))])
                       * (c.tbl[length(list_filter(c.szs, z -> z < s.n)) + 1][cc]
                          - c.tbl[length(list_filter(c.szs, z -> z < s.n))][cc])
             END) AS ra
         FROM stat s CROSS JOIN consts c),
       final AS (
         SELECT et AS event_type,
                cast(round(st * 1e4) AS bigint) AS stat_e4,
                cast(round(
                  CASE WHEN st <= ra[1] THEN 0.01
                       WHEN st >= ra[8] THEN 0.99
                       ELSE ps[length(list_filter(ra, z -> z < st))]
                          + (st - ra[length(list_filter(ra, z -> z < st))])
                            / (ra[length(list_filter(ra, z -> z < st)) + 1]
                               - ra[length(list_filter(ra, z -> z < st))])
                            * (ps[length(list_filter(ra, z -> z < st)) + 1]
                               - ps[length(list_filter(ra, z -> z < st))])
                  END * 1e4) AS bigint) AS p_e4,
                k AS lag_order, bign AS n_obs
         FROM rowat)
       SELECT * FROM final ORDER BY event_type"""
}
