#!/usr/bin/env python3
"""Generate a K-fold replica of a testdata SF dir for local scale probing.

Usage: python3 tools/gen_scale_probe.py <srcDir> <dstDir> [K=10]

Every table is replicated K times with per-table key strides equal to the
source cardinality, so the result has the dense contiguous key space of a
genuinely larger generated SF (replica k's customer 7 becomes customer
k*15000+7, and its orders point at it). Two tables are perturbed so that
CROSS-replica structure does not collapse into degenerate duplication:

- documents: replica k>0 suffixes every word with "q<k>" — per-replica
  shingle/near-dup/vocabulary structure is preserved (pair counts scale
  ~linearly in K), while across replicas docs share no shingles, exactly
  like fresh corpus slices. n_chars is recomputed from the new text.
- embeddings: replica k rolls the 64-dim vector left by k positions —
  an orthogonal transform per replica, so intra-replica cosine geometry
  (clusters, near-dup pairs) is preserved and replicas land in different
  regions instead of stacking 10 identical copies on every point.

events keeps its timestamps (K-fold event density in the same window —
the realistic shape for windowed/sessionized probes) and offsets
event_id/user_id.

This feeds the sf0.1 -> sf1 runtime-ratio probe in SCALE.md ("Scale
probe" section): bench the slowest queries on both dirs via
SPARK_GRAFT_ONLY and compare. The output dir is throwaway (not part of
the repo, not the driver's testdata contract).
"""
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# key column -> stride-source table (stride = source row count)
OFFSETS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "__users__"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}


def main():
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    counts = {
        t: con.execute(f"SELECT count(*) FROM '{src}/{t}.parquet'").fetchone()[0]
        for t in TABLES
    }
    # user_id is its own key space (a subset-sized actor id), not custkey
    counts["__users__"] = con.execute(
        f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]

    for t in TABLES:
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        if t in ("region", "nation"):
            # Fixed dimensions: identical at every SF, like TPC-H.
            con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                        f"'{dst}/{t}.parquet' (FORMAT PARQUET)")
            continue
        offs = OFFSETS.get(t, {})
        exprs = []
        for c in cols:
            if c in offs:
                exprs.append(f"{c} + k * {counts[offs[c]]} AS {c}")
            elif t == "documents" and c == "text":
                exprs.append(
                    "CASE WHEN k = 0 THEN text ELSE array_to_string("
                    "list_transform(string_split(text, ' '), "
                    "w -> w || 'q' || k), ' ') END AS text")
            elif t == "documents" and c == "n_chars":
                exprs.append(
                    "CAST(length(CASE WHEN k = 0 THEN text ELSE "
                    "array_to_string(list_transform(string_split(text, ' '), "
                    "w -> w || 'q' || k), ' ') END) AS BIGINT) AS n_chars")
            elif t == "embeddings" and c == "embedding":
                exprs.append(
                    "CAST(CASE WHEN k = 0 THEN embedding ELSE "
                    "embedding[k + 1:64] || embedding[1:k] END "
                    "AS FLOAT[]) AS embedding")
            else:
                exprs.append(c)
        sql = (f"COPY (SELECT {', '.join(exprs)} "
               f"FROM '{src}/{t}.parquet', range({k}) r(k) "
               f"ORDER BY k) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        con.execute(sql)
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {counts[t]} -> {n}")


if __name__ == "__main__":
    main()
