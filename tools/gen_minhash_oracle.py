"""Generate the DuckDB SQL oracle for q_dedup_minhash.

64-bit modular arithmetic over HUGEINT. The xxhash64 string path follows
Spark's XXH64 (decompiled spark-catalyst 4.1.2 bytecode): 32-byte
stripes (4 lanes), 8-byte words, one optional 4-byte word, byte tail,
avalanche. The 32 per-permutation seeds xxh64_int(i+1, 42) are
precomputed constants.

Layering: DuckDB expands same-SELECT lateral aliases by textual
substitution, so a staged chain of N steps that each reference the
previous alias twice explodes to 2^N copies. Every multi-step chain is
therefore emitted as a sequence of `SELECT *, <rank-k cols> FROM prev`
CTE layers — one evaluation per step, linear plan size.
"""
M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

def MUL(a, c):
    clo = c % (1 << 32)
    return (f"((({a}) % 4294967296 * {c} + "
            f"(({a}) // 4294967296) * {clo} % 4294967296 * 4294967296) "
            f"% 18446744073709551616)")

def ROTL(x, r):
    return (f"((({x}) * {1 << r} % 18446744073709551616) + "
            f"(({x}) // {1 << (64 - r)}))")

def ADD(a, b):
    return f"((({a}) + ({b})) % 18446744073709551616)"

def XOR(a, b):
    return f"xor(CAST({a} AS HUGEINT), CAST({b} AS HUGEINT))"

def SHR(x, r):
    return f"(({x}) // {1 << r})"

def SIGNED64(x):
    return (f"CAST(CASE WHEN {x} >= 9223372036854775808 "
            f"THEN {x} - 18446744073709551616 ELSE {x} END AS BIGINT)")

def fmix_ranks(prefix, inp):
    """5 sequential ranks ending in alias `prefix`."""
    return [
        [(f"{prefix}_f1", XOR(inp, SHR(inp, 33)))],
        [(f"{prefix}_f2", MUL(f"{prefix}_f1", P2))],
        [(f"{prefix}_f3", XOR(f"{prefix}_f2", SHR(f"{prefix}_f2", 29)))],
        [(f"{prefix}_f4", MUL(f"{prefix}_f3", P3))],
        [(prefix, XOR(f"{prefix}_f4", SHR(f"{prefix}_f4", 32)))],
    ]

def merge_ranks(rank_lists):
    """Merge independent rank chains: result[i] = concat of each chain's
    rank i."""
    out = []
    for i in range(max(len(r) for r in rank_lists)):
        layer = []
        for r in rank_lists:
            if i < len(r):
                layer.extend(r[i])
        out.append(layer)
    return out

def emit_layers(name, base, ranks):
    """CTE chain `name_0 .. name_k` with final CTE called `name`."""
    ctes = []
    prev = base
    for i, layer in enumerate(ranks):
        cols = ", ".join(f"{e} AS {n}" for n, e in layer)
        label = name if i == len(ranks) - 1 else f"{name}_{i}"
        ctes.append(f"{label} AS (\n  SELECT *, {cols}\n  FROM {prev})")
        prev = label
    return ctes

def xxh64_int_const(i32, seed):
    h = (seed + P5 + 4) & M64
    h ^= ((i32 & 0xFFFFFFFF) * P1) & M64
    h = (((h << 23) | (h >> 41)) & M64)
    h = (h * P2 + P3) & M64
    h ^= h >> 33; h = (h * P2) & M64
    h ^= h >> 29; h = (h * P3) & M64
    h ^= h >> 32
    return h

SEEDS = [xxh64_int_const(i + 1, 42) for i in range(32)]

def common_ctes(num_hashes=32, bands=8):
    """The signature replay shared by every MinHash oracle: documents ->
    shingles -> XXH64 -> 32 signature mins -> Murmur3 band keys ->
    exploded `buckets` (doc_id, band, key). Tails differ per query
    (self-join pairs for q_dedup_minhash, new-vs-corpus for
    q_dedup_incremental)."""
    rpb = num_hashes // bands
    ctes = []

    # --- shingles + distinct shingle strings ---
    ctes.append("""docs AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents)""")
    ctes.append("""sh AS (
  SELECT doc_id, list_sort(list_distinct(
      list_transform(generate_series(1, len(tk) - 2), i ->
        tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shl
  FROM docs WHERE len(tk) >= 3)""")
    ctes.append("shex AS (SELECT doc_id, unnest(shl) AS s FROM sh)")
    ctes.append("allsh AS (SELECT DISTINCT s FROM shex)")

    # --- xxhash64(seed 42) of each distinct shingle ---
    ctes.append("""shx AS (
  SELECT s, strlen(s) AS n, strlen(s) // 32 AS nst,
    list_transform(generate_series(1, strlen(s) // 8), j ->
      CAST(ascii(s[8*j-7]) AS HUGEINT) + 256*ascii(s[8*j-6])
        + 65536*ascii(s[8*j-5]) + 16777216*ascii(s[8*j-4])
        + 4294967296*ascii(s[8*j-3]) + 1099511627776*ascii(s[8*j-2])
        + 281474976710656*ascii(s[8*j-1])
        + 72057594037927936*ascii(s[8*j])) AS w8
  FROM allsh)""")
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
    ctes.extend(emit_layers("shh0", "shx", hash_ranks))

    # --- per-shingle signature values sig_i = signed(xxh64_long(h, S_i)) ---
    # the h-dependent mix rotl(h*P2,31)*P1 is seed-independent: one "hm"
    sig_chains = []
    for i, sd in enumerate(SEEDS):
        base = (sd + P5 + 8) & M64
        p = f"s{i}"
        chain = [[(f"{p}_p",
                   ADD(MUL(ROTL(XOR(f"CAST({base} AS HUGEINT)", "hm"), 27),
                           P1), P4))]]
        chain += fmix_ranks(f"{p}_x", f"{p}_p")
        chain += [[(f"sig{i}", SIGNED64(f"{p}_x"))]]
        sig_chains.append(chain)
    sig_ranks = [[("hm", MUL(ROTL(MUL("h", P2), 31), P1))]] + \
        merge_ranks(sig_chains)
    ctes.extend(emit_layers("shh", "shh0", sig_ranks))

    # --- per-doc signature mins ---
    mins = ", ".join(f"min(dh.sig{i}) AS m{i}" for i in range(num_hashes))
    ctes.append(f"""sigs AS (
  SELECT doc_id, {mins}
  FROM shex JOIN shh dh USING (s)
  GROUP BY doc_id)""")

    # --- band keys: murmur3_x86_32 threading seed 42 over rpb longs ---
    def mm_band_chain(prefix, cols):
        chain = []
        h = "42"
        for ci, c in enumerate(cols):
            u = f"{prefix}_u{ci}"
            chain.append([(u,
                f"(CAST({c} AS HUGEINT) % 18446744073709551616 "
                f"+ 18446744073709551616) % 18446744073709551616")])
            for half in ("lo", "hi"):
                src = f"{u} % 4294967296" if half == "lo" else f"{u} // 4294967296"
                k = f"{prefix}_k{ci}{half}"
                hx = f"{prefix}_h{ci}{half}"
                chain.append([(f"{k}_1",
                    f"CAST({src} AS HUGEINT) * 3432918353 % 4294967296")])
                chain.append([(f"{k}_2",
                    f"({k}_1 * 32768 % 4294967296 + {k}_1 // 131072)")])
                chain.append([(f"{k}_3", f"{k}_2 * 461845907 % 4294967296")])
                chain.append([(f"{hx}_1", f"xor({h}, {k}_3)")])
                chain.append([(f"{hx}_2",
                    f"({hx}_1 * 8192 % 4294967296 + {hx}_1 // 524288)")])
                chain.append([(f"{hx}_3",
                    f"({hx}_2 * 5 + 3864292196) % 4294967296")])
                h = f"{hx}_3"
        chain.append([(f"{prefix}_a1", f"xor({h}, 8)")])
        chain.append([(f"{prefix}_a2",
            f"xor({prefix}_a1, {prefix}_a1 // 65536)")])
        chain.append([(f"{prefix}_a3",
            f"{prefix}_a2 * 2246822507 % 4294967296")])
        chain.append([(f"{prefix}_a4",
            f"xor({prefix}_a3, {prefix}_a3 // 8192)")])
        chain.append([(f"{prefix}_a5",
            f"{prefix}_a4 * 3266489909 % 4294967296")])
        chain.append([(f"{prefix}_a6",
            f"xor({prefix}_a5, {prefix}_a5 // 65536)")])
        chain.append([(prefix,
            f"CAST(CASE WHEN {prefix}_a6 >= 2147483648 "
            f"THEN {prefix}_a6 - 4294967296 ELSE {prefix}_a6 END AS INT)")])
        return chain

    band_chains = [mm_band_chain(f"bk{b}",
                                 [f"m{b * rpb + j}" for j in range(rpb)])
                   for b in range(bands)]
    ctes.extend(emit_layers("bandkeys", "sigs", merge_ranks(band_chains)))

    band_structs = ", ".join(
        f"struct_pack(band := {b}, key := bk{b})" for b in range(bands))
    ctes.append(f"""buckets AS (
  SELECT doc_id, unnest([{band_structs}], recursive := true)
  FROM bandkeys)""")
    return ctes


def gen_sql(num_hashes=32, bands=8, threshold=0.8, cap=2000):
    ctes = common_ctes(num_hashes, bands)
    ctes.append(f"""grouped AS (
  SELECT band, key, list_sort(list(doc_id)) AS ids
  FROM buckets GROUP BY band, key
  HAVING count(*) > 1 AND count(*) <= {cap})""")
    ctes.append("""cand AS (
  SELECT DISTINCT p.id_a AS id_a, p.id_b AS id_b
  FROM (SELECT unnest(flatten(list_transform(ids, (x, i) ->
          list_transform(ids[i+1:], y ->
            struct_pack(id_a := x, id_b := y))))) AS p
        FROM grouped))""")
    ctes.append("""verify AS (
  SELECT c.id_a, c.id_b,
    CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE) AS inter,
    CAST(len(a.shl) AS DOUBLE) + CAST(len(b.shl) AS DOUBLE) AS sz
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b)""")
    final = f"""SELECT id_a, id_b,
  CASE WHEN sz - inter = 0 THEN 0.0 ELSE inter / (sz - inter) END AS jac
FROM verify
WHERE (CASE WHEN sz - inter = 0 THEN 0.0 ELSE inter / (sz - inter) END)
  >= {threshold}
ORDER BY id_a, id_b"""
    return "WITH " + ",\n".join(ctes) + "\n" + final

if __name__ == "__main__":
    import sys, duckdb, pandas as pd, time
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    sql = gen_sql()
    open("/tmp/minhash_oracle.sql", "w").write(sql)
    print("sql chars:", len(sql))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '/root/testdata/{sf}/documents.parquet'")
    t0 = time.time()
    got = con.execute(sql).df()
    print(f"duckdb rows: {len(got)} in {time.time()-t0:.1f}s")
    if sf == "sf0.01":
        exp = pd.read_parquet('/tmp/verify_out/q_dedup_minhash')
        e = sorted(map(tuple, exp.values.tolist()))
    else:
        from replay import minhash_pairs
        e = [tuple(x) for x in minhash_pairs(sf)]
    g = sorted(map(tuple, got.values.tolist()))
    print("MATCH" if g == e else
          f"MISMATCH\nonly duck: {[x for x in g if x not in e][:4]}\n"
          f"only spark: {[x for x in e if x not in g][:4]}")
