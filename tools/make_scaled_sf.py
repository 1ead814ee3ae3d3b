"""Synthesize a LARGER sf directory for local timing A/Bs.

The driver's round-end measurement runs at a driver-generated scale
factor (sf1.0 in BENCH_r05.json) that is not present on this box.
This tool tiles/extends the deterministic sf0.1 tables to an
approximately-distribution-matched sf1.0 so optimization A/Bs can be
taken at the scale the driver times.  NOT used by bench.py defaults,
never touches /root/testdata (read-only), and carries no results —
purely a local measurement aid (guide §1: measure at the scale that
matters).

Distribution notes (measured from sf0.1):
- documents: ~30-word vocabulary word soup, 44-577 chars; ~5% of docs
  are near-copies (J ~= 0.98) of a random earlier doc; 20 sources;
  lang mix en 41% / zh,es,fr,de ~15% each.
- embeddings: 64-dim float vectors, 10 labels; a few % near-dup copies.
- star tables: tiled x10 with consistent key offsets (orderkey/custkey
  shared between lineitem/orders/customer; event users offset so
  per-user event volume stays constant, like TPC-H scaling).

Usage: python tools/make_scaled_sf.py [outdir] [factor]
  default outdir /root/sfscaled/sf1.0, factor 10
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def tile(df: pd.DataFrame, factor: int, offsets: dict[str, int]) -> pd.DataFrame:
    out = []
    for i in range(factor):
        c = df.copy()
        for col, step in offsets.items():
            c[col] = c[col] + i * step
        out.append(c)
    return pd.concat(out, ignore_index=True)


def gen_documents(n_docs: int, rng: np.random.RandomState) -> pd.DataFrame:
    base = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    vocab = sorted({w for t in base.text.head(500) for w in t.split()})
    langs = ["en", "zh", "es", "fr", "de"]
    lang_p = [0.41, 0.15, 0.15, 0.15, 0.14]
    texts: list[str] = []
    for i in range(n_docs):
        if i > 50 and rng.rand() < 0.051:
            src = texts[rng.randint(0, i)]
            words = src.split()
            for _ in range(max(1, len(words) // 60)):
                words[rng.randint(0, len(words))] = vocab[rng.randint(0, len(vocab))]
            texts.append(" ".join(words))
        else:
            n_words = rng.randint(8, 116)
            texts.append(" ".join(vocab[j] for j in rng.randint(0, len(vocab), n_words)))
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(langs, size=n_docs, p=lang_p),
            "source": [f"src{j}" for j in rng.randint(0, 20, n_docs)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(n: int, dim: int, rng: np.random.RandomState) -> pa.Table:
    M = rng.normal(size=(n, dim)).astype(np.float32)
    # plant ~1.5% near-dup copies
    n_dup = int(n * 0.015)
    dst = rng.choice(np.arange(n // 2, n), size=n_dup, replace=False)
    src = rng.randint(0, n // 2, size=n_dup)
    M[dst] = M[src] + rng.normal(scale=0.05, size=(n_dup, dim)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(M), type=pa.list_(pa.float32())),
            "label": pa.array(rng.randint(0, 10, n).astype(np.int32)),
        }
    )


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/root/sfscaled/sf1.0"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import os

    os.makedirs(outdir, exist_ok=True)
    rng = np.random.RandomState(4242)

    docs = gen_documents(5000 * factor, rng)
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   f"{outdir}/documents.parquet", row_group_size=1 << 20)

    pq.write_table(gen_embeddings(2000 * factor, 64, rng),
                   f"{outdir}/embeddings.parquet", row_group_size=1 << 20)

    li = pq.read_table(f"{SRC}/lineitem.parquet").to_pandas()
    pq.write_table(
        pa.Table.from_pandas(
            tile(li, factor, {"l_orderkey": 150000}), preserve_index=False
        ),
        f"{outdir}/lineitem.parquet", row_group_size=1 << 20,
    )
    o = pq.read_table(f"{SRC}/orders.parquet").to_pandas()
    pq.write_table(
        pa.Table.from_pandas(
            tile(o, factor, {"o_orderkey": 150000, "o_custkey": 15000}),
            preserve_index=False,
        ),
        f"{outdir}/orders.parquet", row_group_size=1 << 20,
    )
    c = pq.read_table(f"{SRC}/customer.parquet").to_pandas()
    pq.write_table(
        pa.Table.from_pandas(tile(c, factor, {"c_custkey": 15000}), preserve_index=False),
        f"{outdir}/customer.parquet", row_group_size=1 << 20,
    )
    ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    pq.write_table(
        pa.Table.from_pandas(
            tile(ev, factor, {"event_id": 100000, "user_id": 1500}), preserve_index=False
        ),
        f"{outdir}/events.parquet", row_group_size=1 << 20,
    )
    for name, offs in (
        ("part", {"p_partkey": 20000}),
        ("supplier", {"s_suppkey": 1000}),
    ):
        t = pq.read_table(f"{SRC}/{name}.parquet").to_pandas()
        pq.write_table(
            pa.Table.from_pandas(tile(t, factor, offs), preserve_index=False),
            f"{outdir}/{name}.parquet", row_group_size=1 << 20,
        )
    for name in ("nation", "region"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{outdir}/{name}.parquet")
    print(f"wrote {outdir} (factor {factor})")


if __name__ == "__main__":
    main()
