WITH RECURSIVE
bq_ev AS MATERIALIZED (
  SELECT value AS v,
    CAST(least(greatest(floor(value / CAST(40.0 AS DOUBLE)), 0),
          15) AS INT) AS b
  FROM events WHERE value IS NOT NULL),
bq_cnts AS MATERIALIZED (SELECT b, count(*) AS n FROM bq_ev GROUP BY b),
bq_tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM bq_cnts),
bq_rk0 AS (SELECT CAST(ceil(CAST(0.5 AS DOUBLE) * CAST((SELECT n FROM bq_tot) AS DOUBLE))
               AS BIGINT) AS rk),
bq_cum AS (SELECT b, n, sum(n) OVER (ORDER BY b) AS c,
               sum(n) OVER (ORDER BY b) - n AS cb FROM bq_cnts),
bq_tgt AS (SELECT b, CAST(n AS BIGINT) AS nb, CAST(cb AS BIGINT) AS cb
        FROM bq_cum WHERE c >= (SELECT rk FROM bq_rk0) ORDER BY b LIMIT 1),
bq_phi AS (SELECT CAST((SELECT rk FROM bq_rk0) - (SELECT cb FROM bq_tgt) AS DOUBLE)
             / CAST((SELECT nb FROM bq_tgt) AS DOUBLE) AS p),
vals AS MATERIALIZED (SELECT v, row_number() OVER (ORDER BY v) AS rn
         FROM bq_ev WHERE b = (SELECT b FROM bq_tgt)),
nn AS MATERIALIZED (SELECT count(*) AS n FROM vals),
samp_0 AS (SELECT CAST(NULL AS BIGINT) AS idx, CAST(NULL AS DOUBLE) AS v,
                  CAST(NULL AS BIGINT) AS g, CAST(NULL AS BIGINT) AS d
           WHERE FALSE),
mrg_1 AS MATERIALIZED (
  -- merged = prior sampled ++ slice (input globally sorted, so every
  -- old sample value <= every new value and the while-loop drains the
  -- old array at the first new element)
  SELECT * FROM samp_0
  UNION ALL
  SELECT (SELECT count(*) FROM samp_0) + rn - 1 AS idx,
    v, CAST(1 AS BIGINT) AS g,
    CASE WHEN rn = 1 AND TRUE THEN 0
         WHEN rn = 50000 THEN 0
         ELSE CAST(floor(CAST(0.002 AS DOUBLE) * CAST(rn AS DOUBLE)) AS BIGINT)
    END AS d
  FROM vals WHERE rn > 0 AND rn <= 50000
    AND (SELECT n FROM nn) >= 50000),
cmp_1 AS (
  WITH RECURSIVE el AS MATERIALIZED (
    SELECT idx, v, g, d,
      sum(g) OVER (ORDER BY idx) AS ps,
      sum(g) OVER (ORDER BY idx) - g AS psm1,
      (SELECT max(idx) FROM mrg_1) AS mx
    FROM mrg_1),
  cnts AS MATERIALIZED (
    -- searchsorted: for each j, #{i: psm1_i <= ps_j + d_j - ceil(T)}
    -- (el rows sort BEFORE query rows at equal value: <= is inclusive)
    SELECT j, cnt FROM (
      SELECT j, is_el, sum(is_el) OVER (ORDER BY val, is_el DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
      FROM (SELECT psm1 AS val, 1 AS is_el, idx AS j FROM el
            UNION ALL
            SELECT ps + d - CAST(ceil(CAST(100.0 AS DOUBLE)) AS BIGINT) AS val, 0 AS is_el, idx AS j
            FROM el) marks) t
    WHERE is_el = 0),
  stops AS MATERIALIZED (
    SELECT e.idx AS j, e.ps AS psj, e.v, e.d,
      greatest(least(c.cnt - 1, e.idx - 1), 0) AS stop
    FROM el e JOIN cnts c ON c.j = e.idx),
  grp AS (
    SELECT j, psj, v, d, stop FROM stops
    WHERE j = (SELECT mx FROM el LIMIT 1) AND j > 0
    UNION ALL
    SELECT s.j, s.psj, s.v, s.d, s.stop
    FROM grp g2 JOIN stops s ON s.j = g2.stop
    WHERE g2.stop >= 1),
  outsel AS (
    SELECT row_number() OVER (ORDER BY j) AS idx, v,
      psj - (SELECT ps FROM el WHERE idx = grp.stop) AS g,
      d
    FROM grp
    UNION ALL
    SELECT 0 AS idx, v, g, d FROM el WHERE idx = 0 AND mx > 0
    UNION ALL
    SELECT idx, v, g, d FROM el WHERE mx = 0)
  SELECT * FROM outsel),
samp_1 AS MATERIALIZED (
  SELECT * FROM (SELECT * FROM cmp_1
                 WHERE (SELECT n FROM nn) >= 50000
                 UNION ALL
                 SELECT * FROM samp_0
                 WHERE (SELECT n FROM nn) < 50000) t),
mrg_2 AS MATERIALIZED (
  -- merged = prior sampled ++ slice (input globally sorted, so every
  -- old sample value <= every new value and the while-loop drains the
  -- old array at the first new element)
  SELECT * FROM samp_1
  UNION ALL
  SELECT (SELECT count(*) FROM samp_1) + rn - 50001 AS idx,
    v, CAST(1 AS BIGINT) AS g,
    CASE WHEN rn = 50001 AND FALSE THEN 0
         WHEN rn = 100000 THEN 0
         ELSE CAST(floor(CAST(0.002 AS DOUBLE) * CAST(rn AS DOUBLE)) AS BIGINT)
    END AS d
  FROM vals WHERE rn > 50000 AND rn <= 100000
    AND (SELECT n FROM nn) >= 100000),
cmp_2 AS (
  WITH RECURSIVE el AS MATERIALIZED (
    SELECT idx, v, g, d,
      sum(g) OVER (ORDER BY idx) AS ps,
      sum(g) OVER (ORDER BY idx) - g AS psm1,
      (SELECT max(idx) FROM mrg_2) AS mx
    FROM mrg_2),
  cnts AS MATERIALIZED (
    -- searchsorted: for each j, #{i: psm1_i <= ps_j + d_j - ceil(T)}
    -- (el rows sort BEFORE query rows at equal value: <= is inclusive)
    SELECT j, cnt FROM (
      SELECT j, is_el, sum(is_el) OVER (ORDER BY val, is_el DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
      FROM (SELECT psm1 AS val, 1 AS is_el, idx AS j FROM el
            UNION ALL
            SELECT ps + d - CAST(ceil(CAST(200.0 AS DOUBLE)) AS BIGINT) AS val, 0 AS is_el, idx AS j
            FROM el) marks) t
    WHERE is_el = 0),
  stops AS MATERIALIZED (
    SELECT e.idx AS j, e.ps AS psj, e.v, e.d,
      greatest(least(c.cnt - 1, e.idx - 1), 0) AS stop
    FROM el e JOIN cnts c ON c.j = e.idx),
  grp AS (
    SELECT j, psj, v, d, stop FROM stops
    WHERE j = (SELECT mx FROM el LIMIT 1) AND j > 0
    UNION ALL
    SELECT s.j, s.psj, s.v, s.d, s.stop
    FROM grp g2 JOIN stops s ON s.j = g2.stop
    WHERE g2.stop >= 1),
  outsel AS (
    SELECT row_number() OVER (ORDER BY j) AS idx, v,
      psj - (SELECT ps FROM el WHERE idx = grp.stop) AS g,
      d
    FROM grp
    UNION ALL
    SELECT 0 AS idx, v, g, d FROM el WHERE idx = 0 AND mx > 0
    UNION ALL
    SELECT idx, v, g, d FROM el WHERE mx = 0)
  SELECT * FROM outsel),
samp_2 AS MATERIALIZED (
  SELECT * FROM (SELECT * FROM cmp_2
                 WHERE (SELECT n FROM nn) >= 100000
                 UNION ALL
                 SELECT * FROM samp_1
                 WHERE (SELECT n FROM nn) < 100000) t),
mrg_3 AS MATERIALIZED (
  -- merged = prior sampled ++ slice (input globally sorted, so every
  -- old sample value <= every new value and the while-loop drains the
  -- old array at the first new element)
  SELECT * FROM samp_2
  UNION ALL
  SELECT (SELECT count(*) FROM samp_2) + rn - 100001 AS idx,
    v, CAST(1 AS BIGINT) AS g,
    CASE WHEN rn = 100001 AND FALSE THEN 0
         WHEN rn = 150000 THEN 0
         ELSE CAST(floor(CAST(0.002 AS DOUBLE) * CAST(rn AS DOUBLE)) AS BIGINT)
    END AS d
  FROM vals WHERE rn > 100000 AND rn <= 150000
    AND (SELECT n FROM nn) >= 150000),
cmp_3 AS (
  WITH RECURSIVE el AS MATERIALIZED (
    SELECT idx, v, g, d,
      sum(g) OVER (ORDER BY idx) AS ps,
      sum(g) OVER (ORDER BY idx) - g AS psm1,
      (SELECT max(idx) FROM mrg_3) AS mx
    FROM mrg_3),
  cnts AS MATERIALIZED (
    -- searchsorted: for each j, #{i: psm1_i <= ps_j + d_j - ceil(T)}
    -- (el rows sort BEFORE query rows at equal value: <= is inclusive)
    SELECT j, cnt FROM (
      SELECT j, is_el, sum(is_el) OVER (ORDER BY val, is_el DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
      FROM (SELECT psm1 AS val, 1 AS is_el, idx AS j FROM el
            UNION ALL
            SELECT ps + d - CAST(ceil(CAST(300.0 AS DOUBLE)) AS BIGINT) AS val, 0 AS is_el, idx AS j
            FROM el) marks) t
    WHERE is_el = 0),
  stops AS MATERIALIZED (
    SELECT e.idx AS j, e.ps AS psj, e.v, e.d,
      greatest(least(c.cnt - 1, e.idx - 1), 0) AS stop
    FROM el e JOIN cnts c ON c.j = e.idx),
  grp AS (
    SELECT j, psj, v, d, stop FROM stops
    WHERE j = (SELECT mx FROM el LIMIT 1) AND j > 0
    UNION ALL
    SELECT s.j, s.psj, s.v, s.d, s.stop
    FROM grp g2 JOIN stops s ON s.j = g2.stop
    WHERE g2.stop >= 1),
  outsel AS (
    SELECT row_number() OVER (ORDER BY j) AS idx, v,
      psj - (SELECT ps FROM el WHERE idx = grp.stop) AS g,
      d
    FROM grp
    UNION ALL
    SELECT 0 AS idx, v, g, d FROM el WHERE idx = 0 AND mx > 0
    UNION ALL
    SELECT idx, v, g, d FROM el WHERE mx = 0)
  SELECT * FROM outsel),
samp_3 AS MATERIALIZED (
  SELECT * FROM (SELECT * FROM cmp_3
                 WHERE (SELECT n FROM nn) >= 150000
                 UNION ALL
                 SELECT * FROM samp_2
                 WHERE (SELECT n FROM nn) < 150000) t),
mrg_4 AS MATERIALIZED (
  -- merged = prior sampled ++ slice (input globally sorted, so every
  -- old sample value <= every new value and the while-loop drains the
  -- old array at the first new element)
  SELECT * FROM samp_3
  UNION ALL
  SELECT (SELECT count(*) FROM samp_3) + rn - 150001 AS idx,
    v, CAST(1 AS BIGINT) AS g,
    CASE WHEN rn = 150001 AND FALSE THEN 0
         WHEN rn = 200000 THEN 0
         ELSE CAST(floor(CAST(0.002 AS DOUBLE) * CAST(rn AS DOUBLE)) AS BIGINT)
    END AS d
  FROM vals WHERE rn > 150000 AND rn <= 200000
    AND (SELECT n FROM nn) >= 200000),
cmp_4 AS (
  WITH RECURSIVE el AS MATERIALIZED (
    SELECT idx, v, g, d,
      sum(g) OVER (ORDER BY idx) AS ps,
      sum(g) OVER (ORDER BY idx) - g AS psm1,
      (SELECT max(idx) FROM mrg_4) AS mx
    FROM mrg_4),
  cnts AS MATERIALIZED (
    -- searchsorted: for each j, #{i: psm1_i <= ps_j + d_j - ceil(T)}
    -- (el rows sort BEFORE query rows at equal value: <= is inclusive)
    SELECT j, cnt FROM (
      SELECT j, is_el, sum(is_el) OVER (ORDER BY val, is_el DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
      FROM (SELECT psm1 AS val, 1 AS is_el, idx AS j FROM el
            UNION ALL
            SELECT ps + d - CAST(ceil(CAST(400.0 AS DOUBLE)) AS BIGINT) AS val, 0 AS is_el, idx AS j
            FROM el) marks) t
    WHERE is_el = 0),
  stops AS MATERIALIZED (
    SELECT e.idx AS j, e.ps AS psj, e.v, e.d,
      greatest(least(c.cnt - 1, e.idx - 1), 0) AS stop
    FROM el e JOIN cnts c ON c.j = e.idx),
  grp AS (
    SELECT j, psj, v, d, stop FROM stops
    WHERE j = (SELECT mx FROM el LIMIT 1) AND j > 0
    UNION ALL
    SELECT s.j, s.psj, s.v, s.d, s.stop
    FROM grp g2 JOIN stops s ON s.j = g2.stop
    WHERE g2.stop >= 1),
  outsel AS (
    SELECT row_number() OVER (ORDER BY j) AS idx, v,
      psj - (SELECT ps FROM el WHERE idx = grp.stop) AS g,
      d
    FROM grp
    UNION ALL
    SELECT 0 AS idx, v, g, d FROM el WHERE idx = 0 AND mx > 0
    UNION ALL
    SELECT idx, v, g, d FROM el WHERE mx = 0)
  SELECT * FROM outsel),
samp_4 AS MATERIALIZED (
  SELECT * FROM (SELECT * FROM cmp_4
                 WHERE (SELECT n FROM nn) >= 200000
                 UNION ALL
                 SELECT * FROM samp_3
                 WHERE (SELECT n FROM nn) < 200000) t),
mrg_f AS MATERIALIZED (
  SELECT * FROM samp_4
  UNION ALL
  SELECT (SELECT count(*) FROM samp_4) + rn - ((SELECT n FROM nn) // 50000) * 50000 - 1
      AS idx,
    v, CAST(1 AS BIGINT) AS g,
    CASE WHEN rn = 1 THEN 0
         WHEN rn = (SELECT n FROM nn) THEN 0
         ELSE CAST(floor(CAST(0.002 AS DOUBLE) * CAST(rn AS DOUBLE)) AS BIGINT)
    END AS d
  FROM vals WHERE rn > ((SELECT n FROM nn) // 50000) * 50000),
cmp_f AS (
  WITH RECURSIVE el AS MATERIALIZED (
    SELECT idx, v, g, d,
      sum(g) OVER (ORDER BY idx) AS ps,
      sum(g) OVER (ORDER BY idx) - g AS psm1,
      (SELECT max(idx) FROM mrg_f) AS mx
    FROM mrg_f),
  cnts AS MATERIALIZED (
    -- searchsorted: for each j, #{i: psm1_i <= ps_j + d_j - ceil(T)}
    -- (el rows sort BEFORE query rows at equal value: <= is inclusive)
    SELECT j, cnt FROM (
      SELECT j, is_el, sum(is_el) OVER (ORDER BY val, is_el DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
      FROM (SELECT psm1 AS val, 1 AS is_el, idx AS j FROM el
            UNION ALL
            SELECT ps + d - CAST(ceil((CAST(0.002 AS DOUBLE) * CAST((SELECT n FROM nn) AS DOUBLE))) AS BIGINT) AS val, 0 AS is_el, idx AS j
            FROM el) marks) t
    WHERE is_el = 0),
  stops AS MATERIALIZED (
    SELECT e.idx AS j, e.ps AS psj, e.v, e.d,
      greatest(least(c.cnt - 1, e.idx - 1), 0) AS stop
    FROM el e JOIN cnts c ON c.j = e.idx),
  grp AS (
    SELECT j, psj, v, d, stop FROM stops
    WHERE j = (SELECT mx FROM el LIMIT 1) AND j > 0
    UNION ALL
    SELECT s.j, s.psj, s.v, s.d, s.stop
    FROM grp g2 JOIN stops s ON s.j = g2.stop
    WHERE g2.stop >= 1),
  outsel AS (
    SELECT row_number() OVER (ORDER BY j) AS idx, v,
      psj - (SELECT ps FROM el WHERE idx = grp.stop) AS g,
      d
    FROM grp
    UNION ALL
    SELECT 0 AS idx, v, g, d FROM el WHERE idx = 0 AND mx > 0
    UNION ALL
    SELECT idx, v, g, d FROM el WHERE mx = 0)
  SELECT * FROM outsel),
samp_f AS MATERIALIZED (
  SELECT * FROM cmp_f WHERE (SELECT n FROM nn) % 50000 <> 0
  UNION ALL
  SELECT * FROM samp_4 WHERE (SELECT n FROM nn) % 50000 = 0),
walk AS (
  SELECT idx, v,
    sum(g) OVER (ORDER BY idx) AS minrank, d,
    (SELECT max(g + d) FROM samp_f) // 2 AS te,
    CAST(ceil((SELECT p FROM bq_phi) * CAST((SELECT n FROM nn) AS DOUBLE))
         AS BIGINT) AS rk,
    (SELECT max(idx) FROM samp_f) AS mx
  FROM samp_f),
hit AS (
  SELECT v FROM walk
  WHERE idx < mx AND minrank + d - te <= rk AND rk <= minrank + te
  ORDER BY idx LIMIT 1),
p50 AS (
  SELECT CASE
    WHEN (SELECT p FROM bq_phi) <= CAST(0.001 AS DOUBLE)
      THEN (SELECT v FROM samp_f WHERE idx = 0)
    WHEN (SELECT p FROM bq_phi) >= CAST(1 AS DOUBLE) - CAST(0.001 AS DOUBLE)
      THEN (SELECT v FROM samp_f WHERE idx = (SELECT max(idx) FROM samp_f))
    ELSE COALESCE((SELECT v FROM hit),
                  (SELECT v FROM walk WHERE idx = (SELECT max(idx)
                                                   FROM samp_f)))
  END AS p)
SELECT (SELECT n FROM bq_tot) AS n_vals,
       (SELECT b FROM bq_tgt) AS target_bucket,
       (SELECT CAST(n AS BIGINT) FROM nn) AS n_bucket,
       (SELECT p FROM p50) AS p50_bucketed