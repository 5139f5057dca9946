"""Generate the DuckDB SQL oracle for q_dedup_simhash, reusing the
xxhash64 replay machinery from gen_minhash_sql."""
from gen_minhash_oracle import (gen_sql as _unused, emit_layers, fmix_ranks,
                             MUL, ROTL, ADD, XOR, P1, P2, P3, P4, P5, M64)

def gen_sql(max_hamming=3, cap=5000):
    chunks = max_hamming + 1
    bpc = 64 // chunks
    mask = (1 << bpc) - 1
    ctes = []
    ctes.append("""tokex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS s
  FROM documents)""")
    ctes.append("alltok AS (SELECT DISTINCT s FROM tokex)")
    # xxhash64(seed 42) of each distinct token — same ranks as minhash
    ctes.append("""shx AS (
  SELECT s, strlen(s) AS n, strlen(s) // 32 AS nst,
    list_transform(generate_series(1, strlen(s) // 8), j ->
      CAST(ascii(s[8*j-7]) AS HUGEINT) + 256*ascii(s[8*j-6])
        + 65536*ascii(s[8*j-5]) + 16777216*ascii(s[8*j-4])
        + 4294967296*ascii(s[8*j-3]) + 1099511627776*ascii(s[8*j-2])
        + 281474976710656*ascii(s[8*j-1])
        + 72057594037927936*ascii(s[8*j])) AS w8
  FROM alltok)""")
    lane_step = MUL(ROTL(ADD("a", MUL("w", P2)), 31), P1)
    lanes = []
    for li, init in enumerate([(42 + P1 + P2) & M64, (42 + P2) & M64,
                               42, (42 - P1) & M64]):
        lanes.append((f"v{li + 1}",
            f"list_reduce(list_prepend(CAST({init} AS HUGEINT), "
            f"list_transform(generate_series(1, nst), t -> w8[4*t - {3 - li}])), "
            f"(a, w) -> {lane_step})"))
    word_step = ADD(MUL(ROTL(XOR("a", MUL(ROTL(MUL("w", P2), 31), P1)), 27),
                        P1), P4)
    byte4 = ("(CAST(ascii(s[8*(n//8)+1]) AS HUGEINT)"
             " + 256*ascii(s[8*(n//8)+2]) + 65536*ascii(s[8*(n//8)+3])"
             " + 16777216*ascii(s[8*(n//8)+4]))")
    hash_ranks = [
        lanes,
        [("mg0", ADD(ADD(ROTL("v1", 1), ROTL("v2", 7)),
                     ADD(ROTL("v3", 12), ROTL("v4", 18))))],
        [("mg1", ADD(MUL(XOR("mg0", MUL(ROTL(MUL("v1", P2), 31), P1)), P1), P4))],
        [("mg2", ADD(MUL(XOR("mg1", MUL(ROTL(MUL("v2", P2), 31), P1)), P1), P4))],
        [("mg3", ADD(MUL(XOR("mg2", MUL(ROTL(MUL("v3", P2), 31), P1)), P1), P4))],
        [("mg4", ADD(MUL(XOR("mg3", MUL(ROTL(MUL("v4", P2), 31), P1)), P1), P4))],
        [("hst", f"CASE WHEN n >= 32 THEN mg4 "
                 f"ELSE CAST({(42 + P5) & M64} AS HUGEINT) END")],
        [("hlen", ADD("hst", "n"))],
        [("hw", f"list_reduce(list_prepend(hlen, w8[4*nst + 1 :]), "
                f"(a, w) -> {word_step})")],
        [("h4", f"CASE WHEN n % 8 >= 4 THEN "
                f"{ADD(MUL(ROTL(XOR('hw', MUL(byte4, P1)), 23), P2), P3)} "
                f"ELSE hw END")],
        [("htail",
          f"list_reduce(list_prepend(h4, "
          f"list_transform(generate_series(8*(n//8) + 4*((n%8)//4) + 1, n), "
          f"i -> CAST(ascii(s[i]) AS HUGEINT))), "
          f"(a, w) -> {MUL(ROTL(XOR('a', MUL('w', P5)), 11), P1)})")],
    ] + fmix_ranks("h", "htail")
    ctes.extend(emit_layers("tokh", "shx", hash_ranks))

    # --- per-doc 64 bit votes over token occurrences ---
    votes = ", ".join(
        f"sum(CASE WHEN th.h // {1 << b} % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64))
    ctes.append(f"""votes AS (
  SELECT doc_id, {votes}
  FROM tokex JOIN tokh th USING (s)
  GROUP BY doc_id)""")
    sim_expr = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS HUGEINT) "
        f"ELSE CAST(0 AS HUGEINT) END" for b in range(64))
    ctes.append(f"sims AS (\n  SELECT doc_id, ({sim_expr}) AS sim\n  FROM votes)")

    chunk_structs = ", ".join(
        f"struct_pack(chunk := {k}, ckey := sim // {1 << (k * bpc)} % {mask + 1})"
        for k in range(chunks))
    ctes.append(f"""banded AS (
  SELECT doc_id, sim, unnest([{chunk_structs}], recursive := true)
  FROM sims)""")
    # hot-bucket valve: buckets with > cap members are dropped entirely
    ctes.append(f"""okbuckets AS (
  SELECT chunk, ckey FROM banded GROUP BY chunk, ckey
  HAVING count(*) BETWEEN 2 AND {cap})""")
    ctes.append("""pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
    bit_count(xor(a.sim, b.sim)) AS hamming
  FROM banded a
  JOIN banded b ON a.chunk = b.chunk AND a.ckey = b.ckey
    AND a.doc_id < b.doc_id
  JOIN okbuckets ok ON ok.chunk = a.chunk AND ok.ckey = a.ckey
  WHERE bit_count(xor(a.sim, b.sim)) <= %d)""" % max_hamming)
    final = """SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
FROM pairs ORDER BY id_a, id_b"""
    return "WITH " + ",\n".join(ctes) + "\n" + final

if __name__ == "__main__":
    import sys, duckdb, pandas as pd, time
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    sql = gen_sql()
    open("/tmp/simhash_oracle.sql", "w").write(sql)
    print("sql chars:", len(sql))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '/root/testdata/{sf}/documents.parquet'")
    t0 = time.time()
    got = con.execute(sql).df()
    print(f"duckdb rows: {len(got)} in {time.time()-t0:.1f}s")
    if sf == "sf0.01":
        exp = pd.read_parquet('/tmp/verify_out/q_dedup_simhash')
        e = sorted(map(tuple, exp.values.tolist()))
    else:
        from replay import xxh64_bytes
        import itertools
        con2 = duckdb.connect()
        docs = con2.execute(f"SELECT doc_id, text FROM '/root/testdata/{sf}/documents.parquet'").fetchall()
        sims = {}
        for doc_id, text in docs:
            votes64 = [0]*64
            for t in text.split(" "):
                h = xxh64_bytes(t.encode())
                for b in range(64):
                    votes64[b] += 1 if (h >> b) & 1 else -1
            sim = sum(1 << b for b in range(64) if votes64[b] > 0)
            sims[doc_id] = sim
        buckets = {}
        for doc_id, sim in sims.items():
            for k in range(4):
                buckets.setdefault((k, (sim >> (16*k)) & 0xFFFF), []).append(doc_id)
        e = set()
        for ids in buckets.values():
            if 2 <= len(ids) <= 5000:
                for a, b in itertools.combinations(sorted(ids), 2):
                    ham = bin(sims[a] ^ sims[b]).count('1')
                    if ham <= 3: e.add((a, b, ham))
        e = sorted(e)
    g = sorted(map(tuple, got.values.tolist()))
    print("MATCH" if g == e else
          f"MISMATCH\nonly duck: {[x for x in g if x not in e][:4]}\n"
          f"only spark: {[x for x in e if x not in g][:4]}")
