WITH words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE strlen(word) > 0 GROUP BY word),
syms0 AS MATERIALIZED (
  SELECT word, freq,
    list_transform(generate_series(1, strlen(word)), i -> word[i]) AS syms
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
  FROM syms0, win0 w),
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
  FROM syms1, win1 w),
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
  FROM syms2, win2 w),
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
  FROM syms3, win3 w),
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
  FROM syms4, win4 w),
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
  FROM syms5, win5 w),
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
  FROM syms6, win6 w),
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
  FROM syms7, win7 w),
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
  FROM syms8, win8 w),
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
  FROM syms9, win9 w),
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
  FROM syms10, win10 w),
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
  FROM syms11, win11 w),
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
  FROM syms12, win12 w),
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
  FROM syms13, win13 w),
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
  FROM syms14, win14 w),
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
  FROM syms15, win15 w),
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