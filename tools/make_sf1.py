#!/usr/bin/env python3
"""Build the 10x scale-proof replica (/tmp/sf1) from /root/testdata/sf0.1.

Facts are replicated 10x with shifted primary keys (foreign keys into other
replicated facts shift with them); dimension tables (region, nation, part,
supplier) stay fixed; document copies get a per-copy text suffix so they are
near-dups rather than byte dups (the near-dup generators then scale
output-proportionally, which is the honest workload); embeddings replicate
as-is (vec_id shifted). Physical parquet types are preserved by round-
tripping through the original schema.

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [factor]
"""
import sys
import pandas as pd

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

DIMS = ["region", "nation", "part", "supplier"]
# fact -> (pk columns to shift, fk columns shifting WITH another fact)
FACTS = {
    "customer": (["c_custkey"], {}),
    "orders": (["o_orderkey"], {"o_custkey": "customer"}),
    "lineitem": (["l_orderkey"], {}),  # composite pk: l_orderkey shifts
    "events": (["event_id"], {"user_id": "customer"}),
    "documents": (["doc_id"], {}),
    "embeddings": (["vec_id"], {}),
}


def span(df, col):
    return int(df[col].max()) + 1


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    frames = {t: pd.read_parquet(f"{SRC}/{t}.parquet")
              for t in DIMS + list(FACTS)}
    for t in DIMS:
        frames[t].to_parquet(f"{DST}/{t}.parquet", index=False)
        print(f"{t}: dim fixed ({len(frames[t])})")
    spans = {t: span(frames[t], pks[0]) for t, (pks, _) in FACTS.items()}
    for t, (pks, fks) in FACTS.items():
        df = frames[t]
        copies = []
        for i in range(K):
            c = df.copy()
            for pk in pks:
                c[pk] = c[pk] + i * spans[t]
            for fk, ref in fks.items():
                c[fk] = c[fk] + i * spans[ref]
            if t == "lineitem":
                c["l_orderkey"] = df["l_orderkey"] + i * spans["orders"]
            if t == "documents" and i > 0:
                c["text"] = c["text"] + f" copy {i}"
                c["n_chars"] = c["n_chars"] + len(f" copy {i}")
            copies.append(c)
        out = pd.concat(copies, ignore_index=True)
        # preserve physical types exactly
        for col, dt in df.dtypes.items():
            out[col] = out[col].astype(dt)
        out.to_parquet(f"{DST}/{t}.parquet", index=False)
        print(f"{t}: {len(df)} -> {len(out)}")


if __name__ == "__main__":
    main()
