#!/usr/bin/env python3
"""Deterministic bench-only scale-up of the driver's sf0.1 fixture.

Usage: scale_up.py <replicas> <outDir>   (replicas=10 -> sf1)

Builds an sf{0.1*replicas} dataset as <replicas> DISJOINT key-shifted
copies of /root/testdata/sf0.1 (replica 0 = the original, byte-for-byte
values). Per TPC-H convention region/nation stay FIXED across scale
factors; every other table's keys shift by replica*1e8 so joins stay
referentially intact and each replica reproduces the sf0.1 structure
exactly.

Distribution choices (disclosed in BASELINE.md's slope audit):
- documents.text is WORD-SALTED per replica (every space-separated word
  gets a replica-unique two-letter suffix). Identical replicas would
  make every document a 10-way near-duplicate and blow the dedup
  candidate joins up quadratically in the replica count — an artifact
  of replication, not of scale. Salting keeps dedup workload linear;
  the cost is vocabulary growing 10x where a real corpus grows
  sublinearly, which OVERSTATES the cost of vocab-bounded operators
  (BPE, distinct-word frames) — the conservative direction for a
  slope audit.
- embeddings get a small deterministic per-(replica,component) jitter
  so exact-equality fast paths can't collapse cross-replica twins,
  while the space keeps sf0.1's cluster geometry per replica.
- events replicas share the same one-month window: 10x event density,
  the realistic shape for a larger deployment.

This is TOOLING for the slope measurement, like check_oracle.py — the
shipped library never reads it. Output is gitignored.
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 100_000_000  # key shift per replica; all ids are 0..~1e6 at sf0.1


def salt(i):
    """Two-letter word suffix for replica i (replica 0 unsalted).

    UNIQUE for i < 676: the round-11 form chr(97+i%26)+chr(97+(7i+3)%26)
    had period 26 in BOTH characters, so replicas 27/28/29 reused the
    salts of 1/2/3 — the 30-replica sf3 fixture contained three phantom
    cross-replica EXACT-duplicate document sets, which inflated the
    dedup candidate joins quadratically (a generator artifact the r10
    sf3 spot-slope partly measured). The +i//26 term preserves every
    salt for i < 26 (sf1 fixtures unchanged) and makes same-first-char
    collisions differ in the second char by (183k) mod 26 = k mod 26.
    """
    return chr(97 + i % 26) + chr(97 + (7 * i + 3 + i // 26) % 26)


def main():
    replicas, out = int(sys.argv[1]), sys.argv[2]
    heaps = "--heaps" in sys.argv[3:]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false; SET threads TO 16;")

    def gen(table, per_replica_sql, fixed=False):
        parts = [per_replica_sql.format(off=0, salted="") if i == 0 else
                 per_replica_sql.format(off=i * OFF, salted=salt(i))
                 for i in range(1 if fixed else replicas)]
        q = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"  {table}: {n} rows", flush=True)

    gen("region", f"SELECT * FROM '{SRC}/region.parquet'", fixed=True)
    gen("nation", f"SELECT * FROM '{SRC}/nation.parquet'", fixed=True)
    gen("customer", f"""SELECT c_custkey + {{off}} AS c_custkey, c_name,
        c_nationkey, c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'""")
    gen("supplier", f"""SELECT s_suppkey + {{off}} AS s_suppkey, s_name,
        s_nationkey, s_acctbal FROM '{SRC}/supplier.parquet'""")
    gen("part", f"""SELECT p_partkey + {{off}} AS p_partkey, p_name,
        p_brand, p_type, p_size, p_retailprice FROM '{SRC}/part.parquet'""")
    gen("orders", f"""SELECT o_orderkey + {{off}} AS o_orderkey,
        o_custkey + {{off}} AS o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'""")
    gen("lineitem", f"""SELECT l_orderkey + {{off}} AS l_orderkey,
        l_partkey + {{off}} AS l_partkey, l_suppkey + {{off}} AS l_suppkey,
        l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        l_returnflag, l_linestatus, l_shipdate FROM '{SRC}/lineitem.parquet'""")
    gen("events", f"""SELECT event_id + {{off}} AS event_id, ts,
        user_id + {{off}} AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet'""")
    # documents: two disclosed salting modes (BASELINE.md slope audit).
    # - full (default): EVERY word of replica i>0 gets the replica suffix.
    #   Dedup workload stays linear (no cross-replica shingles) but vocab
    #   grows ∝ replicas — real corpora grow vocab sublinearly (Heaps'
    #   law), so this OVERSTATES vocab-bounded operators' cost.
    # - --heaps: replica i salts only the word TYPES whose per-replica
    #   hash falls under 1000/sqrt(i+1) permille; new types per replica
    #   ≈ V0/sqrt(i+1), total vocab ≈ V0·2·sqrt(R) — Heaps β ≈ 0.5, the
    #   realistic growth for vocab-bounded operators (BPE, tokenize,
    #   edit-distance, heaps_law). Cross-replica shingle sharing is
    #   negligible for SMALL i ((1-p)³ of 3-word shingles survive
    #   unsalted: ≤ 2.5% at replica 1) but NOT for large i — at i ≈ 300
    #   only ~6% of types are salted, ~84% of shingles survive, and late
    #   replicas are genuine ≥0.8-Jaccard near-copies of their base doc.
    #   So above R ≈ 25 heaps mode builds a DUP-DENSE corpus: pair-
    #   reporting dedup gates' OUTPUT grows ∝ density² by construction
    #   (measured in BASELINE's round-15 sf30 audit: minhash pairs 50×
    #   per 3× data while wall time grew only 4.3×). Per-doc-output
    #   tiers (admission/keepers) stay linear. This is a property of
    #   replicating the SAME base docs under a shrinking salt rate —
    #   disclosed, and useful: it is the crawl-density regime the
    #   excision/admission operators exist for.
    if heaps:
        import math
        parts = [f"SELECT * FROM '{SRC}/documents.parquet'"]
        for i in range(1, replicas):
            thresh = round(1000 / math.sqrt(i + 1))
            expr = (f"array_to_string(list_transform(string_split(text, ' '), "
                    f"w -> CASE WHEN hash(w || 'g{i}') % 1000 < {thresh} "
                    f"THEN w || '{salt(i)}' ELSE w END), ' ')")
            parts.append(
                f"""SELECT doc_id + {i * OFF} AS doc_id, {expr} AS text,
                lang, source, CAST(length({expr}) AS BIGINT) AS n_chars
                FROM '{SRC}/documents.parquet'""")
        q = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({q}) TO '{out}/documents.parquet' (FORMAT PARQUET)")
        n = con.sql(
            f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
        print(f"  documents: {n} rows (heaps mode)", flush=True)
    else:
        gen("documents", f"""SELECT doc_id + {{off}} AS doc_id,
            array_to_string(list_transform(string_split(text, ' '),
              w -> w || '{{salted}}'), ' ') AS text,
            lang, source,
            CAST(length(array_to_string(list_transform(string_split(text, ' '),
              w -> w || '{{salted}}'), ' ')) AS BIGINT) AS n_chars
            FROM '{SRC}/documents.parquet'""")
    gen("embeddings", f"""SELECT vec_id + {{off}} AS vec_id,
        CAST(list_transform(generate_series(1, len(embedding)),
          j -> embedding[j] + (CASE WHEN {{off}} = 0 THEN 0.0 ELSE
            ((CAST(hash(vec_id * 128 + j + {{off}}) % 1001 AS DOUBLE)
              - 500.0) * 0.0001) END)) AS FLOAT[]) AS embedding,
        label FROM '{SRC}/embeddings.parquet'""")
    print(f"done: {out} at sf{0.1 * replicas:g}")


if __name__ == "__main__":
    main()
