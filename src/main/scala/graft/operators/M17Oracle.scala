package graft.operators

/** DuckDB replay of the expanding-window OOS forecast experiment (M17) at
  * its one SQL-expressible point — the SQL side of `m17_oos_experiment`'s
  * hash check (reference `modeltrain`, enetVAR.R:427-496; engine side
  * experiment/ModelTrain.scala).
  *
  * Replayable because the query ALREADY runs at λ = 0 (its published
  * parameters: fixed `lambdas = Seq(0.0)`), where the per-equation
  * elastic-net refit IS ordinary least squares — standardization is
  * equivariant at λ=0, so each origin's fit is the raw 2×2 normal-equations
  * solve (VAR(1) × K=2, const=false) and the warm-started CD path converges
  * to ~1e-9·sd of it (m1/m2/m7's argument). What it replays, CTE for CTE:
  *  - `monthly`→`idx`: the scaled (rev/1e8, n_orders/1e3) monthly panel,
  *    time-indexed (M2Oracle's panel, verbatim);
  *  - `params`: n months, window.size w = startPred+1−h = n−27 (the query
  *    pins startPred = n−20, h = 8), and the shared metric divisor
  *    h.ind.len = n−w−7 (OosAlign.horizonMetrics);
  *  - `d`→`sums`→`bmat`: per-origin prefix Gram sums (one grouped pass over
  *    origins × design rows) Cramer-solved into the 2×2 coefficient matrix,
  *    plus the AR(1) benchmark's φ = Σy_t·y_{t−1}/Σy²_{t−1} on the same
  *    sums (Ar1Train.fitAr1, const=false — the reference's own default,
  *    enetVAR.R:569);
  *  - `fc`: the recursive h-step forecast (FittedVar.forecast — seed with
  *    the last train row, apply Bᵀ eight times; WITH RECURSIVE over
  *    (origin, step));
  *  - `errs`: per (origin, horizon) model / random-walk / AR(1) errors with
  *    the reference's zero-padding past the series end (OosAlign
  *    .zeroPadded — each of true and y_{t−1} padded separately);
  *  - `agg`: the horizon-aligned column windows h1.ind..h8.ind
  *    (OosAlign.horizonWindow: origin columns (h−hh)..(nCols−hh)) and the
  *    reference's RW OFF-BY-ONE QUIRK (enetVAR.R:441,463 — the RW error
  *    panel shifted one origin late, i.e. window on columns one earlier,
  *    the leading zero column contributing nothing);
  *  - output: MSFE (shared h.ind.len divisor), Theil's U vs RW
  *    (√(Σe²/Σe²_rw)) and vs AR(1) (equal divisors cancel), e6-quantized
  *    (values ~1e-2..2 vs a CD-vs-closed-form gap ~1e-9 — three-plus
  *    orders of margin), and the integer evaluation-window length.
  *
  * NO `--` comments inside the SQL: oracle strings are normalized to one
  * line before the dump.
  */
object M17Oracle {

  val sql: String =
    """WITH RECURSIVE monthly AS (
         SELECT cast(date_trunc('month', o_orderdate) AS date) AS month,
                sum(o_totalprice) / 1e8 AS y1,
                count(*) / 1e3 AS y2
         FROM orders GROUP BY 1),
       idx AS (
         SELECT row_number() OVER (ORDER BY month) AS t, y1, y2 FROM monthly),
       params AS (
         SELECT cast(count(*) AS int) AS n,
                cast(count(*) - 27 AS int) AS w,
                cast(20 AS double) AS hlen
         FROM idx),
       d AS (
         SELECT r.t, l.y1 AS x1, l.y2 AS x2, r.y1 AS z1, r.y2 AS z2
         FROM idx r JOIN idx l ON l.t = r.t - 1),
       origins AS (
         SELECT unnest(generate_series(w, n - 1)) AS i FROM params),
       sums AS (
         SELECT o.i,
                sum(d.x1 * d.x1) AS s11, sum(d.x1 * d.x2) AS s12,
                sum(d.x2 * d.x2) AS s22,
                sum(d.x1 * d.z1) AS p1, sum(d.x2 * d.z1) AS p2,
                sum(d.x1 * d.z2) AS q1, sum(d.x2 * d.z2) AS q2
         FROM origins o JOIN d ON d.t <= o.i GROUP BY 1),
       bmat AS (
         SELECT i,
                (p1 * s22 - s12 * p2) / (s11 * s22 - s12 * s12) AS b11,
                (s11 * p2 - s12 * p1) / (s11 * s22 - s12 * s12) AS b12,
                (q1 * s22 - s12 * q2) / (s11 * s22 - s12 * s12) AS b21,
                (s11 * q2 - s12 * q1) / (s11 * s22 - s12 * s12) AS b22,
                p1 / s11 AS phi
         FROM sums),
       fc AS (
         SELECT b.i, 0 AS k, x.y1 AS f1, x.y2 AS f2
         FROM bmat b JOIN idx x ON x.t = b.i
         UNION ALL
         SELECT fc.i, fc.k + 1,
                b.b11 * fc.f1 + b.b12 * fc.f2,
                b.b21 * fc.f1 + b.b22 * fc.f2
         FROM fc JOIN bmat b ON b.i = fc.i WHERE fc.k < 8),
       hor AS (SELECT unnest([1, 2, 4, 8]) AS hh),
       errs AS (
         SELECT o.i, h.hh,
                p.f1 - coalesce(x.y1, 0.0) AS e,
                coalesce(x.y1, 0.0) - coalesce(xp.y1, 0.0) AS rw,
                pow(b.phi, h.hh) * st.y1 - coalesce(x.y1, 0.0) AS ear
         FROM origins o
         CROSS JOIN hor h
         JOIN fc p ON p.i = o.i AND p.k = h.hh
         JOIN bmat b ON b.i = o.i
         JOIN idx st ON st.t = o.i
         LEFT JOIN idx x ON x.t = o.i + h.hh
         LEFT JOIN idx xp ON xp.t = o.i + h.hh - 1),
       agg AS (
         SELECT e.hh,
                sum(CASE WHEN e.i - p.w BETWEEN 8 - e.hh AND p.n - p.w - e.hh
                    THEN e.e * e.e END) AS msq,
                sum(CASE WHEN e.i - p.w BETWEEN greatest(8 - e.hh - 1, 0)
                                            AND p.n - p.w - e.hh - 1
                    THEN e.rw * e.rw END) AS rwsq,
                sum(CASE WHEN e.i - p.w BETWEEN 8 - e.hh AND p.n - p.w - e.hh
                    THEN e.ear * e.ear END) AS arsq,
                sum(CASE WHEN e.i - p.w BETWEEN 8 - e.hh AND p.n - p.w - e.hh
                    THEN 1 END) AS n_eval,
                max(p.hlen) AS hlen
         FROM errs e CROSS JOIN params p
         GROUP BY 1)
       SELECT cast(hh AS bigint) AS horizon,
              cast(round(msq / hlen * 1e6) AS bigint) AS msfe_e6,
              cast(round(sqrt(msq / rwsq) * 1e6) AS bigint) AS theils_u_rw_e6,
              cast(round(sqrt(msq / arsq) * 1e6) AS bigint) AS theils_u_ar1_e6,
              cast(n_eval AS bigint) AS n_eval
       FROM agg
       ORDER BY horizon"""
}
