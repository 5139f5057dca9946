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
pqcents_0 AS (
  SELECT pm.sid AS j, kk.k - 1 AS cell, s.v[pm.sid * 8 + 1 : pm.sid * 8 + 8] AS c
  FROM (SELECT unnest(generate_series(1, 16)) AS k) kk
  JOIN perm pm ON pm.sid >= 0
  JOIN sample s ON s.pos = pm.p[kk.k] + 1),
pqasg_1 AS (
  SELECT j, pos, sv, cell FROM (
    SELECT c.j, s.pos,
      s.v[c.j * 8 + 1 : c.j * 8 + 8] AS sv, c.cell,
      row_number() OVER (PARTITION BY c.j, s.pos
        ORDER BY list_sum(list_transform(generate_series(1, 8), __i -> (s.v[c.j * 8 + 1 : c.j * 8 + 8][__i] - c.c[__i]) * (s.v[c.j * 8 + 1 : c.j * 8 + 8][__i] - c.c[__i]))),
          c.cell) AS rn
    FROM sample s, pqcents_0 c)
  WHERE rn = 1),
pqcents_1 AS (
  SELECT p.j, p.cell, CASE WHEN g.cnt IS NULL THEN p.c ELSE g.newc END AS c
  FROM pqcents_0 p LEFT JOIN (
    SELECT j, cell, cnt,
      list_transform(generate_series(1, 8), __i ->
        list_sum(list_transform(vl, __v -> __v[__i])) / cnt) AS newc
    FROM (SELECT j, cell, count(*) AS cnt, list(sv ORDER BY pos) AS vl
          FROM pqasg_1 GROUP BY j, cell) gg) g USING (j, cell)),
pqasg_2 AS (
  SELECT j, pos, sv, cell FROM (
    SELECT c.j, s.pos,
      s.v[c.j * 8 + 1 : c.j * 8 + 8] AS sv, c.cell,
      row_number() OVER (PARTITION BY c.j, s.pos
        ORDER BY list_sum(list_transform(generate_series(1, 8), __i -> (s.v[c.j * 8 + 1 : c.j * 8 + 8][__i] - c.c[__i]) * (s.v[c.j * 8 + 1 : c.j * 8 + 8][__i] - c.c[__i]))),
          c.cell) AS rn
    FROM sample s, pqcents_1 c)
  WHERE rn = 1),
pqcents_2 AS (
  SELECT p.j, p.cell, CASE WHEN g.cnt IS NULL THEN p.c ELSE g.newc END AS c
  FROM pqcents_1 p LEFT JOIN (
    SELECT j, cell, cnt,
      list_transform(generate_series(1, 8), __i ->
        list_sum(list_transform(vl, __v -> __v[__i])) / cnt) AS newc
    FROM (SELECT j, cell, count(*) AS cnt, list(sv ORDER BY pos) AS vl
          FROM pqasg_2 GROUP BY j, cell) gg) g USING (j, cell)),
pqasg_3 AS (
  SELECT j, pos, sv, cell FROM (
    SELECT c.j, s.pos,
      s.v[c.j * 8 + 1 : c.j * 8 + 8] AS sv, c.cell,
      row_number() OVER (PARTITION BY c.j, s.pos
        ORDER BY list_sum(list_transform(generate_series(1, 8), __i -> (s.v[c.j * 8 + 1 : c.j * 8 + 8][__i] - c.c[__i]) * (s.v[c.j * 8 + 1 : c.j * 8 + 8][__i] - c.c[__i]))),
          c.cell) AS rn
    FROM sample s, pqcents_2 c)
  WHERE rn = 1),
pqcents_3 AS (
  SELECT p.j, p.cell, CASE WHEN g.cnt IS NULL THEN p.c ELSE g.newc END AS c
  FROM pqcents_2 p LEFT JOIN (
    SELECT j, cell, cnt,
      list_transform(generate_series(1, 8), __i ->
        list_sum(list_transform(vl, __v -> __v[__i])) / cnt) AS newc
    FROM (SELECT j, cell, count(*) AS cnt, list(sv ORDER BY pos) AS vl
          FROM pqasg_3 GROUP BY j, cell) gg) g USING (j, cell)),
pqasg_4 AS (
  SELECT j, pos, sv, cell FROM (
    SELECT c.j, s.pos,
      s.v[c.j * 8 + 1 : c.j * 8 + 8] AS sv, c.cell,
      row_number() OVER (PARTITION BY c.j, s.pos
        ORDER BY list_sum(list_transform(generate_series(1, 8), __i -> (s.v[c.j * 8 + 1 : c.j * 8 + 8][__i] - c.c[__i]) * (s.v[c.j * 8 + 1 : c.j * 8 + 8][__i] - c.c[__i]))),
          c.cell) AS rn
    FROM sample s, pqcents_3 c)
  WHERE rn = 1),
pqcents_4 AS (
  SELECT p.j, p.cell, CASE WHEN g.cnt IS NULL THEN p.c ELSE g.newc END AS c
  FROM pqcents_3 p LEFT JOIN (
    SELECT j, cell, cnt,
      list_transform(generate_series(1, 8), __i ->
        list_sum(list_transform(vl, __v -> __v[__i])) / cnt) AS newc
    FROM (SELECT j, cell, count(*) AS cnt, list(sv ORDER BY pos) AS vl
          FROM pqasg_4 GROUP BY j, cell) gg) g USING (j, cell)),
pqasg_5 AS (
  SELECT j, pos, sv, cell FROM (
    SELECT c.j, s.pos,
      s.v[c.j * 8 + 1 : c.j * 8 + 8] AS sv, c.cell,
      row_number() OVER (PARTITION BY c.j, s.pos
        ORDER BY list_sum(list_transform(generate_series(1, 8), __i -> (s.v[c.j * 8 + 1 : c.j * 8 + 8][__i] - c.c[__i]) * (s.v[c.j * 8 + 1 : c.j * 8 + 8][__i] - c.c[__i]))),
          c.cell) AS rn
    FROM sample s, pqcents_4 c)
  WHERE rn = 1),
pqcents_5 AS (
  SELECT p.j, p.cell, CASE WHEN g.cnt IS NULL THEN p.c ELSE g.newc END AS c
  FROM pqcents_4 p LEFT JOIN (
    SELECT j, cell, cnt,
      list_transform(generate_series(1, 8), __i ->
        list_sum(list_transform(vl, __v -> __v[__i])) / cnt) AS newc
    FROM (SELECT j, cell, count(*) AS cnt, list(sv ORDER BY pos) AS vl
          FROM pqasg_5 GROUP BY j, cell) gg) g USING (j, cell)),
subv AS MATERIALIZED (
  SELECT e.vec_id, js.j, e.v[js.j * 8 + 1 : js.j * 8 + 8] AS sv
  FROM emb e, (SELECT unnest(generate_series(0, 7)) AS j) js),
sdist AS MATERIALIZED (
  SELECT s.vec_id, s.j, cb.cell AS k, list_sum(list_transform(generate_series(1, 8), __i -> (s.sv[__i] - cb.c[__i]) * (s.sv[__i] - cb.c[__i]))) AS d
  FROM subv s JOIN pqcents_5 cb ON cb.j = s.j),
codes AS MATERIALIZED (
  SELECT vec_id, max(CASE WHEN j = 0 THEN code END) AS c0, max(CASE WHEN j = 1 THEN code END) AS c1, max(CASE WHEN j = 2 THEN code END) AS c2, max(CASE WHEN j = 3 THEN code END) AS c3, max(CASE WHEN j = 4 THEN code END) AS c4, max(CASE WHEN j = 5 THEN code END) AS c5, max(CASE WHEN j = 6 THEN code END) AS c6, max(CASE WHEN j = 7 THEN code END) AS c7 FROM (
    SELECT vec_id, j, k AS code FROM (
      SELECT vec_id, j, k,
        row_number() OVER (PARTITION BY vec_id, j ORDER BY d, k) AS rn
      FROM sdist)
    WHERE rn = 1)
  GROUP BY vec_id),
qlut AS MATERIALIZED (
  SELECT vec_id, max(CASE WHEN j = 0 THEN lut END) AS l0, max(CASE WHEN j = 1 THEN lut END) AS l1, max(CASE WHEN j = 2 THEN lut END) AS l2, max(CASE WHEN j = 3 THEN lut END) AS l3, max(CASE WHEN j = 4 THEN lut END) AS l4, max(CASE WHEN j = 5 THEN lut END) AS l5, max(CASE WHEN j = 6 THEN lut END) AS l6, max(CASE WHEN j = 7 THEN lut END) AS l7 FROM (
    SELECT vec_id, j, list(d ORDER BY k) AS lut
    FROM sdist WHERE vec_id < 10 GROUP BY vec_id, j)
  GROUP BY vec_id),
scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, (((((((l0[c0 + 1] + l1[c1 + 1]) + l2[c2 + 1]) + l3[c3 + 1]) + l4[c4 + 1]) + l5[c5 + 1]) + l6[c6 + 1]) + l7[c7 + 1]) AS adc
  FROM qlut q, codes n
  WHERE n.vec_id <> q.vec_id),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id
        ORDER BY adc ASC, neighbor_id) AS rn
    FROM scored)
  WHERE rn <= 20),
rescored AS (
  SELECT query_id, neighbor_id,
    CASE WHEN nn = 0 THEN 0.0 ELSE ab / nn END AS cos
  FROM (
    SELECT s.query_id, s.neighbor_id,
      list_sum(list_transform(generate_series(1, 64), __i -> cq.v[__i] * cn.v[__i])) AS ab,
      sqrt(list_sum(list_transform(generate_series(1, 64), __i -> cq.v[__i] * cq.v[__i]))) * sqrt(list_sum(list_transform(generate_series(1, 64), __i -> cn.v[__i] * cn.v[__i])))
        AS nn
    FROM short s
    JOIN emb cq ON cq.vec_id = s.query_id
    JOIN emb cn ON cn.vec_id = s.neighbor_id) t)
SELECT query_id,
  CAST(row_number() OVER (PARTITION BY query_id
    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank,
  neighbor_id
FROM rescored
QUALIFY rank <= 5
ORDER BY query_id, rank