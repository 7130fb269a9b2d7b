package graft.operators

/** DuckDB replay of the batch Granger-causality scan (T15) — AdfOracle's
  * relational-OLS machinery (long-form design → normal equations →
  * recursive-CTE Gauss–Jordan over list rows) re-instantiated for the
  * restricted-vs-unrestricted lag-2 pair regression:
  *
  *  - `pr`: the two daily series ALIGNED on their common days (inner
  *    join), time-indexed per ordered (effect, cause) pair — lags are
  *    taken over the aligned grid on both engines by construction;
  *  - `mdl`: the model dimension {r: p = 3 [1, y₋₁, y₋₂], u: p = 5
  *    [… , x₋₁, x₋₂]} — one extra grouping key instead of two copies of
  *    the solver;
  *  - `xtx`/`xty`/`yty` → `gj`: AdfOracle's normal-equation
  *    accumulation and Gauss–Jordan recursion verbatim, keyed by
  *    (effect, cause, model); p steps, no pivoting (XᵀX is PD);
  *  - `rss`: RSS = yᵀy − 2β̂ᵀXᵀy + β̂ᵀXᵀXβ̂ (quadratic form, no
  *    residual materialization);
  *  - `fin`: F = ((RSS_r − RSS_u)/2) / (RSS_u/(n_eff − 5)) and the
  *    partial R² = (RSS_r − RSS_u)/RSS_r.
  *
  * F compares e4-quantized, partial R² e6: LAPACK's LU (the Breeze
  * side) and this Gauss–Jordan agree to ~1e-10 on these conditioned
  * 3×3/5×5 systems — the AdfOracle argument, smaller systems.
  *
  * NO `--` comments inside the SQL (oracle strings normalize to one
  * line before the dump).
  */
object GrangerOracle {

  val sql: String =
    """WITH daily AS (
         SELECT event_type AS et, cast(ts AS date) AS day, sum(value) AS v
         FROM events GROUP BY 1, 2),
       pr AS (
         SELECT y.et AS ey, x.et AS ex,
                row_number() OVER (PARTITION BY y.et, x.et ORDER BY y.day)
                  AS t,
                y.v AS vy, x.v AS vx
         FROM daily y JOIN daily x
           ON x.day = y.day AND x.et <> y.et),
       meta0 AS (SELECT ey, ex, count(*) AS n FROM pr GROUP BY 1, 2),
       mdl AS (SELECT 'r' AS m, 3 AS p UNION ALL SELECT 'u' AS m, 5 AS p),
       meta AS (SELECT ey, ex, m, p, n FROM meta0 CROSS JOIN mdl),
       tg AS (
         SELECT g.ey, g.ex, g.m, g.p, c.t, c.vy AS yt
         FROM meta g JOIN pr c ON c.ey = g.ey AND c.ex = g.ex
         WHERE c.t BETWEEN 3 AND g.n),
       regj AS (
         SELECT ey, ex, m, t, yt, unnest(generate_series(1, p)) AS j
         FROM tg),
       reg AS (
         SELECT r.ey, r.ex, r.m, r.t, r.j, r.yt,
                CASE WHEN r.j = 1 THEN cast(1 AS double)
                     WHEN r.j = 2 THEN l1.vy
                     WHEN r.j = 3 THEN l2.vy
                     WHEN r.j = 4 THEN l1.vx
                     ELSE l2.vx END AS val
         FROM regj r
         JOIN pr l1 ON l1.ey = r.ey AND l1.ex = r.ex AND l1.t = r.t - 1
         JOIN pr l2 ON l2.ey = r.ey AND l2.ex = r.ex AND l2.t = r.t - 2),
       xtx AS (
         SELECT a.ey, a.ex, a.m, a.j, b.j AS l, sum(a.val * b.val) AS mm
         FROM reg a JOIN reg b
           ON b.ey = a.ey AND b.ex = a.ex AND b.m = a.m AND b.t = a.t
         GROUP BY 1, 2, 3, 4, 5),
       xty AS (
         SELECT ey, ex, m, j, sum(val * yt) AS mm
         FROM reg GROUP BY 1, 2, 3, 4),
       yty AS (
         SELECT ey, ex, m, sum(yt * yt) AS mm, count(*) AS nrows
         FROM (SELECT DISTINCT ey, ex, m, t, yt FROM reg)
         GROUP BY 1, 2, 3),
       augrow AS (
         SELECT x.ey, x.ex, x.m, x.j,
                list_append(list(x.mm ORDER BY x.l), any_value(ty.mm)) AS row
         FROM xtx x JOIN xty ty
           ON ty.ey = x.ey AND ty.ex = x.ex AND ty.m = x.m AND ty.j = x.j
         GROUP BY 1, 2, 3, 4),
       aug0 AS (
         SELECT ey, ex, m, 0 AS step, list(row ORDER BY j) AS aug
         FROM augrow GROUP BY 1, 2, 3),
       gj AS (
         WITH RECURSIVE g AS (
           SELECT * FROM aug0
           UNION ALL
           SELECT g.ey, g.ex, g.m, g.step + 1,
             list_transform(g.aug, (row, r) ->
               CASE WHEN r = g.step + 1
                 THEN list_transform(row,
                   x -> x / g.aug[g.step + 1][g.step + 1])
                 ELSE list_transform(row, (x, c) ->
                   x - row[g.step + 1] * g.aug[g.step + 1][c]
                     / g.aug[g.step + 1][g.step + 1])
               END)
           FROM g JOIN meta m2
             ON m2.ey = g.ey AND m2.ex = g.ex AND m2.m = g.m
           WHERE g.step < m2.p)
         SELECT g.* FROM g JOIN meta m2
           ON m2.ey = g.ey AND m2.ex = g.ex AND m2.m = g.m
         WHERE g.step = m2.p),
       est AS (
         SELECT s.ey, s.ex, s.m,
                list_transform(range(1, m2.p + 1),
                  j -> s.aug[j][m2.p + 1]) AS b
         FROM gj s JOIN meta m2
           ON m2.ey = s.ey AND m2.ex = s.ex AND m2.m = s.m),
       quad AS (
         SELECT x.ey, x.ex, x.m, sum(x.mm * e.b[x.j] * e.b[x.l]) AS q
         FROM xtx x JOIN est e
           ON e.ey = x.ey AND e.ex = x.ex AND e.m = x.m
         GROUP BY 1, 2, 3),
       bxty AS (
         SELECT t2.ey, t2.ex, t2.m, sum(t2.mm * e.b[t2.j]) AS bty
         FROM xty t2 JOIN est e
           ON e.ey = t2.ey AND e.ex = t2.ex AND e.m = t2.m
         GROUP BY 1, 2, 3),
       rss AS (
         SELECT y.ey, y.ex, y.m, y.nrows,
                y.mm - 2 * bx.bty + q.q AS rss
         FROM yty y
         JOIN quad q ON q.ey = y.ey AND q.ex = y.ex AND q.m = y.m
         JOIN bxty bx ON bx.ey = y.ey AND bx.ex = y.ex AND bx.m = y.m),
       fin AS (
         SELECT r.ey AS effect, r.ex AS cause,
                cast(r.nrows AS bigint) AS n_eff,
                ((r.rss - u.rss) / 2.0) / (u.rss / (u.nrows - 5)) AS f,
                (r.rss - u.rss) / r.rss AS pr2
         FROM (SELECT * FROM rss WHERE m = 'r') r
         JOIN (SELECT * FROM rss WHERE m = 'u') u
           ON u.ey = r.ey AND u.ex = r.ex)
       SELECT effect, cause, n_eff,
              cast(round(f * 1e4) AS bigint) AS f_e4,
              cast(round(pr2 * 1e6) AS bigint) AS partial_r2_e6
       FROM fin ORDER BY 1, 2"""
}
