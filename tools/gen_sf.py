"""Scale-factor tiler: builds sfN test data from the driver's sf0.1 tables
by replica tiling with key offsets — the TPC-H scaling idea (bigger SF =
more keys, identical per-key distributions) applied to the driver's
synthetic star schema.

Usage:
    python tools/gen_sf.py 10 /root/repo/testdata_sf1      # 10x sf0.1 = sf1
    python tools/gen_sf.py 100 /root/repo/testdata_sf10    # 100x = sf10

Design (replica r in 0..R-1; r=0 is byte-identical to the source):

- **Dimensions region/nation copy unchanged** (TPC-H dims don't scale).
- **Key offsets preserve referential integrity exactly**: every fact and
  dim key in replica r shifts by r * (max_key + 1) of its table, and every
  foreign key shifts by the PARENT table's stride — replica r's orders
  reference replica r's customers, so join selectivities, fan-outs and
  per-key row counts are identical to sf0.1 at every replica.
- **Timestamps are NOT shifted**: the observed span stays fixed and the
  per-day/per-window density grows R-fold — the scale story a real system
  sees (same calendar, more traffic), and what stresses window/sessionize
  operators correctly.
- **Documents get a positional word salt** in replicas r >= 1 (every 3rd
  word gains an `xr{r}` suffix): every 3-shingle window contains a salted
  position, so a replica shares ~no shingles with its original or with
  other replicas — the corpus is R-fold MORE DOCUMENTS, not 10 clones of
  the same 5k (which would inflate every near-dup cluster 10x and distort
  dedup benchmarks). Because the salt is positional, two documents that
  were near-dups of each other in the source transform identically and
  REMAIN near-dups inside every replica: the duplicate-pair density per
  document is preserved. n_chars is recomputed.
- **Embeddings get deterministic Gaussian jitter** (sigma = 0.05 * the
  source's global component std, seed = 42 + r) in replicas r >= 1:
  cluster geometry is preserved (labels keep their centroids) while
  replica vectors are distinct points — ANN index bench sees R-fold more
  corpus, not duplicate vectors at distance zero.

Everything is deterministic — same inputs, same outputs, no wall-clock.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_TILE_SRC", "/root/testdata/sf0.1")

# key columns per table and which table's stride each column uses
KEYS = {
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "events_user")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

NAME_COLS = {"customer": ("c_name", "Customer"), "supplier": ("s_name", "Supplier")}


def _strides(tables: dict[str, pa.Table]) -> dict[str, int]:
    s = {}
    for t in ("customer", "supplier", "part", "orders", "documents", "embeddings"):
        col = KEYS[t][0][0]
        s[t] = int(pa.compute.max(tables[t][col]).as_py()) + 1
    ev = tables["events"]
    s["events"] = int(pa.compute.max(ev["event_id"]).as_py()) + 1
    s["events_user"] = int(pa.compute.max(ev["user_id"]).as_py()) + 1
    return s


def _salt_text(text: str, r: int) -> str:
    words = text.split(" ")
    return " ".join(
        w + f"xr{r}" if i % 3 == 0 else w for i, w in enumerate(words)
    )


def _replica(
    name: str, tbl: pa.Table, r: int, strides: dict[str, int], rng_cache: dict
) -> pa.Table:
    if r == 0:
        return tbl
    cols = {}
    for field in tbl.schema:
        cols[field.name] = tbl[field.name]
    for col, stride_of in KEYS[name]:
        shifted = pa.compute.add(
            tbl[col].cast(tbl.schema.field(col).type),
            r * strides[stride_of],
        )
        cols[col] = shifted.cast(tbl.schema.field(col).type)
    if name in NAME_COLS:
        col, prefix = NAME_COLS[name]
        keys = cols[KEYS[name][0][0]].to_pylist()
        cols[col] = pa.array(
            [f"{prefix}#{k:09d}" for k in keys], type=pa.string()
        )
    if name == "documents":
        texts = [
            _salt_text(t, r) if t is not None else None
            for t in tbl["text"].to_pylist()
        ]
        cols["text"] = pa.array(texts, type=pa.string())
        cols["n_chars"] = pa.array(
            [len(t) if t is not None else None for t in texts], type=pa.int64()
        )
    if name == "embeddings":
        mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
        if r not in rng_cache:
            rng_cache[r] = np.random.RandomState(42 + r)
        sigma = rng_cache.setdefault("sigma", float(mat.std()) * 0.05)
        noise = rng_cache[r].normal(0.0, sigma, mat.shape).astype(np.float32)
        jittered = mat + noise
        cols["embedding"] = pa.array(
            [row.tolist() for row in jittered], type=pa.list_(pa.float32())
        )
    return pa.Table.from_arrays(
        [cols[f.name] for f in tbl.schema], schema=tbl.schema
    )


def main() -> None:
    factor = int(sys.argv[1])
    out_dir = sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    tables = {
        t: pq.read_table(f"{SRC}/{t}.parquet")
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split()
    }
    strides = _strides(tables)
    rng_cache: dict = {}
    for name, tbl in tables.items():
        dst = f"{out_dir}/{name}.parquet"
        if name in ("region", "nation"):
            pq.write_table(tbl, dst)
            print(f"{name}: {tbl.num_rows} rows (copied)")
            continue
        writer = pq.ParquetWriter(dst, tbl.schema)
        total = 0
        for r in range(factor):
            rep = _replica(name, tbl, r, strides, rng_cache)
            writer.write_table(rep)
            total += rep.num_rows
        writer.close()
        print(f"{name}: {total} rows ({factor} replicas)")


if __name__ == "__main__":
    main()
