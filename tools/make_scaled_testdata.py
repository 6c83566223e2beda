"""Build a ~10x replica of sf0.1 ("sf1") for local scaling experiments.

Key-shifted replicas keep FK consistency and cardinality ratios; documents
texts are PAIRED with a different doc per replica (not copied) so the
near-dup rate does not explode; embeddings are rotated per replica so LSH
buckets spread instead of collapsing onto identical vectors.
"""
import duckdb, os, shutil

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
R = 10
SHIFT = 10_000_000
shutil.rmtree(DST, ignore_errors=True)
os.makedirs(DST)
con = duckdb.connect()
con.execute(f"SET threads TO 16")

for t in ("nation", "region"):
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")

def rep(table, sql):
    parts = " UNION ALL ".join(sql.format(k=k, s=k*SHIFT) for k in range(R))
    con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{SRC}/{table}.parquet')")
    con.execute(f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(table, n)

rep("customer", "SELECT c_custkey + {s} AS c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal FROM t")
rep("supplier", "SELECT s_suppkey + {s} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM t")
rep("part", "SELECT p_partkey + {s} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM t")
rep("orders", "SELECT o_orderkey + {s} AS o_orderkey, o_custkey + {s} AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM t")
rep("lineitem", "SELECT l_orderkey + {s} AS l_orderkey, l_partkey + {s} AS l_partkey, l_suppkey + {s} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM t")
rep("events", "SELECT event_id + {s} AS event_id, ts, user_id + {s} AS user_id, event_type, value, props FROM t")

# documents: replica 0 = original; replica k pairs doc i with doc (i+37k)%N
con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{SRC}/documents.parquet')")
N = con.sql("SELECT count(*) FROM t").fetchone()[0]
doc_parts = ["SELECT doc_id, text, lang, source, n_chars FROM t"]
for k in range(1, R):
    doc_parts.append(
        f"SELECT a.doc_id + {k*SHIFT} AS doc_id, a.text || ' ' || b.text AS text, "
        f"a.lang, a.source, a.n_chars + 1 + b.n_chars AS n_chars "
        f"FROM t a JOIN t b ON b.doc_id = (a.doc_id + {37*k}) % {N}"
    )
con.execute(f"COPY ({' UNION ALL '.join(doc_parts)}) TO '{DST}/documents.parquet' (FORMAT PARQUET)")
print("documents", con.sql(f"SELECT count(*) FROM read_parquet('{DST}/documents.parquet')").fetchone()[0])

# embeddings: rotate the vector by k so replicas land in different LSH cells
con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM read_parquet('{SRC}/embeddings.parquet')")
dim = con.sql("SELECT len(embedding) FROM t LIMIT 1").fetchone()[0]
emb_parts = []
for k in range(R):
    if k == 0:
        emb_parts.append("SELECT vec_id, embedding, label FROM t")
    else:
        emb_parts.append(
            f"SELECT vec_id + {k*SHIFT} AS vec_id, "
            f"CAST(embedding[{k+1}:{dim}] || embedding[1:{k}] AS FLOAT[]) AS embedding, label FROM t"
        )
con.execute(f"COPY ({' UNION ALL '.join(emb_parts)}) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)")
print("embeddings", con.sql(f"SELECT count(*) FROM read_parquet('{DST}/embeddings.parquet')").fetchone()[0])
print("done ->", DST)

# Measured with tools/scale_probe snippet (min of 2 warm passes, local[32]),
# see SCALE.md "Measured scaling" for the recorded 0.1 -> "sf1" ratios.
