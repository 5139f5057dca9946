WITH words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE strlen(word) > 0 GROUP BY word),
syms0 AS MATERIALIZED (
  SELECT word, freq,
    list_transform(generate_series(1, length(word)), i -> word[i]) AS syms
  FROM words),
pc0 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms0 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win0 AS MATERIALIZED (
  SELECT l, r, c FROM pc0 ORDER BY c DESC, l, r LIMIT 1),
syms1 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms0 LEFT JOIN win0 w ON TRUE),
pc1 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms1 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win1 AS MATERIALIZED (
  SELECT l, r, c FROM pc1 ORDER BY c DESC, l, r LIMIT 1),
syms2 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms1 LEFT JOIN win1 w ON TRUE),
pc2 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms2 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win2 AS MATERIALIZED (
  SELECT l, r, c FROM pc2 ORDER BY c DESC, l, r LIMIT 1),
syms3 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms2 LEFT JOIN win2 w ON TRUE),
pc3 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms3 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win3 AS MATERIALIZED (
  SELECT l, r, c FROM pc3 ORDER BY c DESC, l, r LIMIT 1),
syms4 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms3 LEFT JOIN win3 w ON TRUE),
pc4 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms4 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win4 AS MATERIALIZED (
  SELECT l, r, c FROM pc4 ORDER BY c DESC, l, r LIMIT 1),
syms5 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms4 LEFT JOIN win4 w ON TRUE),
pc5 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms5 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win5 AS MATERIALIZED (
  SELECT l, r, c FROM pc5 ORDER BY c DESC, l, r LIMIT 1),
syms6 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms5 LEFT JOIN win5 w ON TRUE),
pc6 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms6 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win6 AS MATERIALIZED (
  SELECT l, r, c FROM pc6 ORDER BY c DESC, l, r LIMIT 1),
syms7 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms6 LEFT JOIN win6 w ON TRUE),
pc7 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms7 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win7 AS MATERIALIZED (
  SELECT l, r, c FROM pc7 ORDER BY c DESC, l, r LIMIT 1),
syms8 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms7 LEFT JOIN win7 w ON TRUE),
pc8 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms8 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win8 AS MATERIALIZED (
  SELECT l, r, c FROM pc8 ORDER BY c DESC, l, r LIMIT 1),
syms9 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms8 LEFT JOIN win8 w ON TRUE),
pc9 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms9 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win9 AS MATERIALIZED (
  SELECT l, r, c FROM pc9 ORDER BY c DESC, l, r LIMIT 1),
syms10 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms9 LEFT JOIN win9 w ON TRUE),
pc10 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms10 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win10 AS MATERIALIZED (
  SELECT l, r, c FROM pc10 ORDER BY c DESC, l, r LIMIT 1),
syms11 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms10 LEFT JOIN win10 w ON TRUE),
pc11 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms11 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win11 AS MATERIALIZED (
  SELECT l, r, c FROM pc11 ORDER BY c DESC, l, r LIMIT 1),
syms12 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms11 LEFT JOIN win11 w ON TRUE),
pc12 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms12 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win12 AS MATERIALIZED (
  SELECT l, r, c FROM pc12 ORDER BY c DESC, l, r LIMIT 1),
syms13 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms12 LEFT JOIN win12 w ON TRUE),
pc13 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms13 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win13 AS MATERIALIZED (
  SELECT l, r, c FROM pc13 ORDER BY c DESC, l, r LIMIT 1),
syms14 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms13 LEFT JOIN win13 w ON TRUE),
pc14 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms14 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win14 AS MATERIALIZED (
  SELECT l, r, c FROM pc14 ORDER BY c DESC, l, r LIMIT 1),
syms15 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms14 LEFT JOIN win14 w ON TRUE),
pc15 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms15 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win15 AS MATERIALIZED (
  SELECT l, r, c FROM pc15 ORDER BY c DESC, l, r LIMIT 1),
syms16 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms15 LEFT JOIN win15 w ON TRUE),
pc16 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms16 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win16 AS MATERIALIZED (
  SELECT l, r, c FROM pc16 ORDER BY c DESC, l, r LIMIT 1),
syms17 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms16 LEFT JOIN win16 w ON TRUE),
pc17 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms17 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win17 AS MATERIALIZED (
  SELECT l, r, c FROM pc17 ORDER BY c DESC, l, r LIMIT 1),
syms18 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms17 LEFT JOIN win17 w ON TRUE),
pc18 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms18 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win18 AS MATERIALIZED (
  SELECT l, r, c FROM pc18 ORDER BY c DESC, l, r LIMIT 1),
syms19 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms18 LEFT JOIN win18 w ON TRUE),
pc19 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms19 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win19 AS MATERIALIZED (
  SELECT l, r, c FROM pc19 ORDER BY c DESC, l, r LIMIT 1),
syms20 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms19 LEFT JOIN win19 w ON TRUE),
pc20 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms20 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win20 AS MATERIALIZED (
  SELECT l, r, c FROM pc20 ORDER BY c DESC, l, r LIMIT 1),
syms21 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms20 LEFT JOIN win20 w ON TRUE),
pc21 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms21 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win21 AS MATERIALIZED (
  SELECT l, r, c FROM pc21 ORDER BY c DESC, l, r LIMIT 1),
syms22 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms21 LEFT JOIN win21 w ON TRUE),
pc22 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms22 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win22 AS MATERIALIZED (
  SELECT l, r, c FROM pc22 ORDER BY c DESC, l, r LIMIT 1),
syms23 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms22 LEFT JOIN win22 w ON TRUE),
pc23 AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
      i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p
    FROM syms23 WHERE len(syms) >= 2) t
  GROUP BY p.l, p.r),
win23 AS MATERIALIZED (
  SELECT l, r, c FROM pc23 ORDER BY c DESC, l, r LIMIT 1),
syms24 AS MATERIALIZED (
  SELECT word, freq,
    list_reduce(list_prepend(CAST([] AS VARCHAR[]),
        list_transform(syms, s -> [s])),
      (acc, x) -> CASE
        WHEN len(acc) > 0 AND acc[-1] = w.l AND x[1] = w.r
        THEN list_append(acc[:len(acc) - 1], w.l || w.r)
        ELSE list_concat(acc, x) END) AS syms
  FROM syms23 LEFT JOIN win23 w ON TRUE)
SELECT * FROM (
  SELECT CAST(0 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win0
  UNION ALL SELECT CAST(1 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win1
  UNION ALL SELECT CAST(2 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win2
  UNION ALL SELECT CAST(3 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win3
  UNION ALL SELECT CAST(4 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win4
  UNION ALL SELECT CAST(5 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win5
  UNION ALL SELECT CAST(6 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win6
  UNION ALL SELECT CAST(7 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win7
  UNION ALL SELECT CAST(8 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win8
  UNION ALL SELECT CAST(9 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win9
  UNION ALL SELECT CAST(10 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win10
  UNION ALL SELECT CAST(11 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win11
  UNION ALL SELECT CAST(12 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win12
  UNION ALL SELECT CAST(13 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win13
  UNION ALL SELECT CAST(14 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win14
  UNION ALL SELECT CAST(15 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win15
  UNION ALL SELECT CAST(16 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win16
  UNION ALL SELECT CAST(17 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win17
  UNION ALL SELECT CAST(18 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win18
  UNION ALL SELECT CAST(19 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win19
  UNION ALL SELECT CAST(20 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win20
  UNION ALL SELECT CAST(21 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win21
  UNION ALL SELECT CAST(22 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win22
  UNION ALL SELECT CAST(23 AS INT) AS rank, l AS "left", r AS "right", c AS freq FROM win23)
ORDER BY rank