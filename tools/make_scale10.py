#!/usr/bin/env python3
"""Synthesize a 10x copy of an sf directory for scale benching (no sf1 is
shipped). Each table is replicated REPLICAS times with its id columns offset
so keys stay unique and join fan-outs stay realistic; dimension tables and
all non-id columns (timestamps included) are byte-identical, preserving
parquet logical types (events.parquet stays TIMESTAMP(NANOS)).

Usage: python3 tools/make_scale10.py /root/testdata/sf0.1 /tmp/graft_sf1 [replicas]
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pathlib import Path

SRC, DST = Path(sys.argv[1]), Path(sys.argv[2])
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> columns to offset by replica * (max+1)
OFFSET_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # part/supplier/nation/region: replicated unchanged is wrong for keys,
    # so they are copied 1x (dimensions stay dimensions)
}
COPY_ONLY = ["part", "supplier", "nation", "region"]

DST.mkdir(parents=True, exist_ok=True)
# keep orderkey offsets consistent between lineitem and orders so the join
# degree per key is preserved across replicas
shared_base = {}
for t in ["orders", "lineitem"]:
    tbl = pq.read_table(SRC / f"{t}.parquet")
    key = "o_orderkey" if t == "orders" else "l_orderkey"
    shared_base[key] = max(shared_base.get(key, 0),
                           pc.max(tbl[key]).as_py() + 1)
ORDERKEY_BASE = max(shared_base.values())

for t, cols in OFFSET_COLS.items():
    src = SRC / f"{t}.parquet"
    if not src.exists():
        continue
    tbl = pq.read_table(src)
    bases = {}
    for c in cols:
        if c in ("l_orderkey", "o_orderkey"):
            bases[c] = ORDERKEY_BASE
        else:
            bases[c] = pc.max(tbl[c]).as_py() + 1
    parts = []
    for r in range(REPLICAS):
        if r == 0:
            parts.append(tbl)
            continue
        arrays = []
        for name in tbl.column_names:
            col = tbl[name]
            if name in bases:
                col = pc.add(col, pa.scalar(r * bases[name], type=tbl.schema.field(name).type))
            arrays.append(col)
        parts.append(pa.table(arrays, schema=tbl.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, DST / f"{t}.parquet")
    print(f"{t}: {tbl.num_rows} -> {out.num_rows}")

for t in COPY_ONLY:
    src = SRC / f"{t}.parquet"
    if src.exists():
        pq.write_table(pq.read_table(src), DST / f"{t}.parquet")
        print(f"{t}: copied 1x")

# non-parquet side files some scan queries need (csv/orc twins)
import shutil
for p in SRC.iterdir():
    if p.suffix != ".parquet" and p.is_file():
        shutil.copy(p, DST / p.name)
        print(f"{p.name}: copied")
    elif p.is_dir():
        shutil.copytree(p, DST / p.name, dirs_exist_ok=True)
        print(f"{p.name}/: copied dir")
