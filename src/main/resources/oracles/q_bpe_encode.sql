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
pieces AS MATERIALIZED (
  SELECT word, CAST(len(syms) AS BIGINT) AS n_pieces FROM syms16),
tokf AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE strlen(word) > 0),
counted AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
    CAST(sum(p.n_pieces) AS BIGINT) AS n_pieces
  FROM tokf t JOIN pieces p USING (word) GROUP BY t.doc_id)
SELECT d.doc_id, coalesce(c.n_words, 0) AS n_words,
  coalesce(c.n_pieces, 0) AS n_pieces
FROM documents d LEFT JOIN counted c USING (doc_id)
ORDER BY d.doc_id