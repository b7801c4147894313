#!/usr/bin/env python3
"""Generate an Nx copy of an sf corpus for the 3-point scaling audit
(VERDICT r7 #3): the empirical check that the per-query scaling curves seen
from sf0.01 -> sf0.1 don't bend super-linear at the next decade.

Usage: python3 tools/make_scale.py [N] [src_dir] [out_dir]
Defaults: N=10, src=/root/testdata/sf0.1, out=target/scale/sf1.0
(the out dir's trailing `sf<float>` is parsed by scaling_check.py for the
data-size ratio, so keep the naming convention).

Scale model — "the corpus grew", not "every row was mirrored":
 - region/nation are DIMENSIONS: copied as-is (they would not grow at 100 TB
   either; nationkey FKs from scaled tables still resolve).
 - customer/supplier/part/orders/lineitem/events get N copies with key
   offsets of copy*STRIDE applied consistently on BOTH sides of every FK
   (o_custkey moves with c_custkey, l_orderkey with o_orderkey, ...), so
   join cardinalities scale linearly like a real bigger corpus.
 - supplier names get a per-copy suffix (copy>0) so the derived node
   registry keeps unique node names.
 - documents: each copy's text is deterministically PERTURBED (every 4th
   token gets a per-copy suffix) so cross-copy Jaccard/MinHash/SimHash
   similarity collapses: copies are NEW documents, and the within-copy
   duplicate-cluster structure repeats N times (10x clusters of the same
   size) instead of inflating every cluster 10x. That's the realistic
   growth model for dedup load — cluster count scales with corpus size,
   cluster size doesn't go 10x just because the crawl doubled. n_chars is
   recomputed to stay consistent with the perturbed text.
 - embeddings: per-copy deterministic +/-2% component noise, so copies are
   near the original manifold (same centroid geometry) but not bit-equal
   vectors (no fake exact-dup shortcuts for ANN).

Everything is a pure function of (row, copy index) — rerunning reproduces
the corpus bit-for-bit; no RNG state involved.
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STRIDE = {          # one decade above each key's sf0.1 maximum
    "cust": 100_000,
    "order": 1_000_000,
    "supp": 10_000,
    "part": 100_000,
    "event": 1_000_000,
    "user": 10_000,
    "doc": 100_000,
    "vec": 100_000,
}


def scale_relational(con, src, out, n):
    copies = f"(SELECT unnest(range({n})) AS c) copies"

    def copy_table(name, select_sql):
        con.execute(
            f"COPY ({select_sql}) TO '{out}/{name}.parquet' (FORMAT parquet)")
        rows = con.execute(
            f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"  {name}: {rows} rows")

    copy_table("region", f"SELECT * FROM '{src}/region.parquet'")
    copy_table("nation", f"SELECT * FROM '{src}/nation.parquet'")
    copy_table("customer", f"""
        SELECT c_custkey + c*{STRIDE['cust']} AS c_custkey,
               CASE WHEN c = 0 THEN c_name ELSE c_name || '#c' || c END AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet', {copies}""")
    copy_table("supplier", f"""
        SELECT s_suppkey + c*{STRIDE['supp']} AS s_suppkey,
               CASE WHEN c = 0 THEN s_name ELSE s_name || '#c' || c END AS s_name,
               s_nationkey, s_acctbal
        FROM '{src}/supplier.parquet', {copies}""")
    copy_table("part", f"""
        SELECT p_partkey + c*{STRIDE['part']} AS p_partkey,
               CASE WHEN c = 0 THEN p_name ELSE p_name || ' c' || c END AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM '{src}/part.parquet', {copies}""")
    copy_table("orders", f"""
        SELECT o_orderkey + c*{STRIDE['order']} AS o_orderkey,
               o_custkey + c*{STRIDE['cust']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet', {copies}""")
    copy_table("lineitem", f"""
        SELECT l_orderkey + c*{STRIDE['order']} AS l_orderkey,
               l_partkey + c*{STRIDE['part']} AS l_partkey,
               l_suppkey + c*{STRIDE['supp']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet', {copies}""")
    copy_table("events", f"""
        SELECT event_id + c*{STRIDE['event']} AS event_id,
               ts,
               user_id + c*{STRIDE['user']} AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet', {copies}""")


def perturb_text(text, copy):
    if copy == 0:
        return text
    suffix = "~c%d" % copy
    toks = text.split(" ")
    return " ".join(
        t + suffix if i % 4 == copy % 4 else t for i, t in enumerate(toks))


def scale_documents(src, out, n):
    t = pq.read_table(f"{src}/documents.parquet")
    cols = {name: t.column(name).to_pylist() for name in t.schema.names}
    out_rows = {name: [] for name in t.schema.names}
    for c in range(n):
        for i in range(t.num_rows):
            txt = perturb_text(cols["text"][i], c)
            out_rows["doc_id"].append(cols["doc_id"][i] + c * STRIDE["doc"])
            out_rows["text"].append(txt)
            out_rows["lang"].append(cols["lang"][i])
            out_rows["source"].append(cols["source"][i])
            out_rows["n_chars"].append(len(txt))
    scaled = pa.table(
        {name: pa.array(out_rows[name], type=t.schema.field(name).type)
         for name in t.schema.names})
    pq.write_table(scaled, f"{out}/documents.parquet")
    print(f"  documents: {scaled.num_rows} rows")


def scale_embeddings(src, out, n):
    t = pq.read_table(f"{src}/embeddings.parquet")
    vec_ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    labels = t.column("label").to_pylist()
    oid, ovec, olab = [], [], []
    for c in range(n):
        for vid, emb, lab in zip(vec_ids, embs, labels):
            if c == 0:
                v = emb
            else:
                v = [x * (1.0 + (((vid * 31 + i * 7 + c * 13) % 21) - 10) * 0.002)
                     for i, x in enumerate(emb)]
            oid.append(vid + c * STRIDE["vec"])
            ovec.append(v)
            olab.append(lab)
    scaled = pa.table({
        "vec_id": pa.array(oid, type=t.schema.field("vec_id").type),
        "embedding": pa.array(ovec, type=t.schema.field("embedding").type),
        "label": pa.array(olab, type=t.schema.field("label").type)})
    pq.write_table(scaled, f"{out}/embeddings.parquet")
    print(f"  embeddings: {scaled.num_rows} rows")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "target", "scale", "sf1.0")
    os.makedirs(out, exist_ok=True)
    print(f"scaling {src} x{n} -> {out}")
    con = duckdb.connect()
    scale_relational(con, src, out, n)
    scale_documents(src, out, n)
    scale_embeddings(src, out, n)
    total = sum(os.path.getsize(os.path.join(out, f)) for f in os.listdir(out))
    print(f"done: {total / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
