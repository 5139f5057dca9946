WITH RECURSIVE emb AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, __x -> CAST(__x AS DOUBLE)) AS v
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
    AND len(list_filter(embedding, __x -> __x IS NULL)) = 0),
sample AS MATERIALIZED (
  SELECT * FROM (
    SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
      CAST(vec_id AS VARCHAR)) AS pos, vec_id, v
    FROM emb)
  WHERE pos <= 2048),
nsz AS (SELECT CAST(count(*) AS INT) AS n FROM sample),
seeds(sid, s0) AS (SELECT * FROM (VALUES
    (-1, 25214903879::HUGEINT),
    (0, 25214903879::HUGEINT),
    (1, 25214903878::HUGEINT),
    (2, 25214903873::HUGEINT),
    (3, 25214903872::HUGEINT),
    (4, 25214903875::HUGEINT),
    (5, 25214903874::HUGEINT),
    (6, 25214903901::HUGEINT),
    (7, 25214903900::HUGEINT)) t),
shufrec AS (
  SELECT s.sid, s.s0 AS seed, n.n AS bound,
    list_transform(generate_series(0, n.n - 1), __x -> __x) AS perm
  FROM seeds s, nsz n
  UNION ALL
  SELECT sid, newseed,
    CASE WHEN accepted THEN bound - 1 ELSE bound END,
    CASE WHEN accepted THEN
      list_transform(generate_series(1, len(perm)), __i ->
        CASE WHEN __i = bound THEN perm[val + 1]
             WHEN __i = val + 1 THEN perm[bound]
             ELSE perm[__i] END)
    ELSE perm END
  FROM (
    SELECT sid, bound, perm,
      newseed, bits,
      CASE WHEN pow2 THEN CAST((CAST(bound AS HUGEINT) * bits) >> 31 AS INT)
           ELSE CAST(bits % bound AS INT) END AS val,
      (pow2 OR bits - (bits % bound) + bound - 1 < 2147483648) AS accepted
    FROM (
      SELECT sid, bound, perm,
        (seed * 25214903917::HUGEINT + 11) % 281474976710656::HUGEINT
          AS newseed,
        CAST(((seed * 25214903917::HUGEINT + 11) % 281474976710656::HUGEINT)
          >> 17 AS BIGINT) AS bits,
        bit_count(bound) = 1 AS pow2
      FROM shufrec WHERE bound >= 2) t1) t2),
perm AS MATERIALIZED (SELECT sid, perm AS p FROM shufrec WHERE bound = 1),
centsivf_0 AS (
  SELECT kk.k - 1 AS cell, s.v AS c
  FROM (SELECT unnest(generate_series(1, 16)) AS k) kk
  JOIN perm pm ON pm.sid = -1
  JOIN sample s ON s.pos = pm.p[kk.k] + 1),
asgivf_1 AS (
  SELECT pos, sv, cell FROM (
    SELECT s.pos, s.v AS sv, c.cell,
      row_number() OVER (PARTITION BY s.pos
        ORDER BY list_sum(list_transform(generate_series(1, 64), __i -> (s.v[__i] - c.c[__i]) * (s.v[__i] - c.c[__i]))), c.cell) AS rn
    FROM sample s, centsivf_0 c)
  WHERE rn = 1),
centsivf_1 AS (
  SELECT p.cell, CASE WHEN g.cnt IS NULL THEN p.c ELSE g.newc END AS c
  FROM centsivf_0 p LEFT JOIN (
    SELECT cell,
      cnt,
      list_transform(generate_series(1, 64), __i ->
        list_sum(list_transform(vl, __v -> __v[__i])) / cnt) AS newc
    FROM (SELECT cell, count(*) AS cnt, list(sv ORDER BY pos) AS vl
          FROM asgivf_1 GROUP BY cell) gg) g USING (cell)),
asgivf_2 AS (
  SELECT pos, sv, cell FROM (
    SELECT s.pos, s.v AS sv, c.cell,
      row_number() OVER (PARTITION BY s.pos
        ORDER BY list_sum(list_transform(generate_series(1, 64), __i -> (s.v[__i] - c.c[__i]) * (s.v[__i] - c.c[__i]))), c.cell) AS rn
    FROM sample s, centsivf_1 c)
  WHERE rn = 1),
centsivf_2 AS (
  SELECT p.cell, CASE WHEN g.cnt IS NULL THEN p.c ELSE g.newc END AS c
  FROM centsivf_1 p LEFT JOIN (
    SELECT cell,
      cnt,
      list_transform(generate_series(1, 64), __i ->
        list_sum(list_transform(vl, __v -> __v[__i])) / cnt) AS newc
    FROM (SELECT cell, count(*) AS cnt, list(sv ORDER BY pos) AS vl
          FROM asgivf_2 GROUP BY cell) gg) g USING (cell)),
asgivf_3 AS (
  SELECT pos, sv, cell FROM (
    SELECT s.pos, s.v AS sv, c.cell,
      row_number() OVER (PARTITION BY s.pos
        ORDER BY list_sum(list_transform(generate_series(1, 64), __i -> (s.v[__i] - c.c[__i]) * (s.v[__i] - c.c[__i]))), c.cell) AS rn
    FROM sample s, centsivf_2 c)
  WHERE rn = 1),
centsivf_3 AS (
  SELECT p.cell, CASE WHEN g.cnt IS NULL THEN p.c ELSE g.newc END AS c
  FROM centsivf_2 p LEFT JOIN (
    SELECT cell,
      cnt,
      list_transform(generate_series(1, 64), __i ->
        list_sum(list_transform(vl, __v -> __v[__i])) / cnt) AS newc
    FROM (SELECT cell, count(*) AS cnt, list(sv ORDER BY pos) AS vl
          FROM asgivf_3 GROUP BY cell) gg) g USING (cell)),
asgivf_4 AS (
  SELECT pos, sv, cell FROM (
    SELECT s.pos, s.v AS sv, c.cell,
      row_number() OVER (PARTITION BY s.pos
        ORDER BY list_sum(list_transform(generate_series(1, 64), __i -> (s.v[__i] - c.c[__i]) * (s.v[__i] - c.c[__i]))), c.cell) AS rn
    FROM sample s, centsivf_3 c)
  WHERE rn = 1),
centsivf_4 AS (
  SELECT p.cell, CASE WHEN g.cnt IS NULL THEN p.c ELSE g.newc END AS c
  FROM centsivf_3 p LEFT JOIN (
    SELECT cell,
      cnt,
      list_transform(generate_series(1, 64), __i ->
        list_sum(list_transform(vl, __v -> __v[__i])) / cnt) AS newc
    FROM (SELECT cell, count(*) AS cnt, list(sv ORDER BY pos) AS vl
          FROM asgivf_4 GROUP BY cell) gg) g USING (cell)),
asgivf_5 AS (
  SELECT pos, sv, cell FROM (
    SELECT s.pos, s.v AS sv, c.cell,
      row_number() OVER (PARTITION BY s.pos
        ORDER BY list_sum(list_transform(generate_series(1, 64), __i -> (s.v[__i] - c.c[__i]) * (s.v[__i] - c.c[__i]))), c.cell) AS rn
    FROM sample s, centsivf_4 c)
  WHERE rn = 1),
centsivf_5 AS (
  SELECT p.cell, CASE WHEN g.cnt IS NULL THEN p.c ELSE g.newc END AS c
  FROM centsivf_4 p LEFT JOIN (
    SELECT cell,
      cnt,
      list_transform(generate_series(1, 64), __i ->
        list_sum(list_transform(vl, __v -> __v[__i])) / cnt) AS newc
    FROM (SELECT cell, count(*) AS cnt, list(sv ORDER BY pos) AS vl
          FROM asgivf_5 GROUP BY cell) gg) g USING (cell)),
cents AS MATERIALIZED (
  SELECT cell, c,
    list_sum(list_transform(c, __x -> __x * __x)) AS c2
  FROM centsivf_5),
cdist AS MATERIALIZED (
  SELECT e.vec_id, ct.cell, list_sum(list_transform(generate_series(1, 64), __i -> (e.v[__i] - ct.c[__i]) * (e.v[__i] - ct.c[__i]))) AS d
  FROM emb e, cents ct),
assigned AS MATERIALIZED (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM cdist)
  WHERE rn = 1),
qscore AS (
  SELECT q.vec_id AS query_id, ct.cell,
    ct.c2 - 2.0 * list_sum(list_transform(generate_series(1, 64),
      __i -> q.v[__i] * ct.c[__i])) AS d
  FROM emb q, cents ct
  WHERE q.vec_id < 10),
probe AS (
  SELECT query_id, cell FROM (
    SELECT query_id, cell,
      row_number() OVER (PARTITION BY query_id ORDER BY d, cell) AS rn
    FROM qscore)
  WHERE rn <= 4),
scored AS (
  SELECT query_id, neighbor_id,
    CASE WHEN nn = 0 THEN 0.0 ELSE ab / nn END AS cos
  FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
      list_sum(list_transform(generate_series(1, 64), __i -> cq.v[__i] * cn.v[__i])) AS ab,
      sqrt(list_sum(list_transform(generate_series(1, 64), __i -> cq.v[__i] * cq.v[__i]))) * sqrt(list_sum(list_transform(generate_series(1, 64), __i -> cn.v[__i] * cn.v[__i])))
        AS nn
    FROM probe p
    JOIN assigned a USING (cell)
    JOIN emb cq ON cq.vec_id = p.query_id
    JOIN emb cn ON cn.vec_id = a.vec_id
    WHERE a.vec_id <> p.query_id) t)
SELECT query_id,
  CAST(row_number() OVER (PARTITION BY query_id
    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
  neighbor_id
FROM scored
QUALIFY rank <= 5
ORDER BY query_id, rank