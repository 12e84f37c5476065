"""Deterministic synthetic-table generator for larger scale factors.

The driver ships read-only testdata at sf0.001/0.01/0.1 (TESTDATA.md).
The round-4 verdict asks for an sf1.0 correctness + bench campaign; the
driver's generator is not available, but the oracle gate is
SELF-CONSISTENT (Spark vs DuckDB over the same parquet files), so any
deterministic tables with the same schemas and comparable distributions
exercise it at 10x scale.  This script regenerates that shape at an
arbitrary sf (row counts scale linearly from the sf0.1 reference:
lineitem = sf * 6M).  Seeded numpy + pyarrow — no Spark needed, bit-stable
across runs.

Usage: python tools/gen_sf.py <out_dir> [sf]     (default sf=1.0)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WORDS = (
    "batch part spark line column order small sort fast value scan vector "
    "query agg table hash the a big merge group stream filter customer key "
    "slow join shuffle broadcast window skew cache plan codegen arrow"
).split()
SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
CYRILLIC = "привет мир данные поток запрос таблица ключ значение".split()
CJK = "数据 查询 表格 分区 批处理 流式 键值 排序".split()

US = 1_000_000  # microseconds


def _ts(base: str, offsets_us: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base, "us").astype(np.int64)
    return pa.array(base_us + offsets_us, type=pa.timestamp("us"))


def _words(rng: np.ndarray, n_words: np.ndarray, vocab: list[str]) -> list[str]:
    v = np.array(vocab)
    out = []
    pos = 0
    for n in n_words:
        out.append(" ".join(v[rng[pos : pos + n]]))
        pos += n
    return out


def generate(out_dir: str, sf: float = 1.0, seed: int = 42) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    # reference row counts at sf0.1 (TESTDATA.md) scaled linearly
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, out / f"{name}.parquet")
        print(f"{name}: {table.num_rows} rows")

    # region / nation (fixed dims)
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
                "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
                "n_name": [f"NATION_{i:02d}" for i in range(25)],
                "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
            }
        ),
    )

    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust).astype(np.int32)
                ),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, n_cust), 2)
                ),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp).astype(np.int32)
                ),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, n_supp), 2)
                ),
            }
        ),
    )
    brands = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
    types = [f"{a} {b}" for a in ("STANDARD", "SMALL", "LARGE", "ECONOMY", "PROMO")
             for b in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")]
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": [f"part {WORDS[i % len(WORDS)]} {i}" for i in range(n_part)],
                "p_brand": pa.array(np.array(brands)[rng.integers(0, len(brands), n_part)]),
                "p_type": pa.array(np.array(types)[rng.integers(0, len(types), n_part)]),
                "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
                "p_retailprice": pa.array(
                    np.round(rng.uniform(900.0, 2000.0, n_part), 2)
                ),
            }
        ),
    )
    span_us = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(
        "timedelta64[D]"
    ).astype(np.int64)
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
                "o_orderstatus": pa.array(
                    np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)]
                ),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(800.0, 500_000.0, n_ord), 2)
                ),
                "o_orderdate": _ts(
                    "1995-01-01",
                    rng.integers(0, span_us, n_ord) * 86_400 * US,
                ),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
    )
    ship_span_days = int(span_us)
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(np.sort(rng.integers(0, n_ord, n_li))),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li)),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
                "l_linenumber": pa.array(
                    (rng.integers(1, 8, n_li)).astype(np.int32)
                ),
                "l_quantity": pa.array(
                    rng.integers(1, 51, n_li).astype(np.float64)
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900.0, 100_000.0, n_li), 2)
                ),
                "l_discount": pa.array(np.round(rng.uniform(0.0, 0.1, n_li), 2)),
                "l_tax": pa.array(np.round(rng.uniform(0.0, 0.08, n_li), 2)),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    np.array(["O", "F"])[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": _ts(
                    "1995-01-01",
                    rng.integers(0, ship_span_days, n_li) * 86_400 * US,
                ),
            }
        ),
    )
    month_us = 30 * 86_400 * US
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
                "ts": _ts("2024-01-01", np.sort(rng.integers(0, month_us, n_ev))),
                "user_id": pa.array(rng.integers(0, max(1, n_ev // 20), n_ev)),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
                ),
                "value": pa.array(np.round(rng.uniform(0.0, 100.0, n_ev), 4)),
                "props": [f'{{"k":{i % 7}}}' for i in range(n_ev)],
            }
        ),
    )

    # documents: word-salad texts; ~0.2% exact dups + a few near-dups for
    # the dedup family; a small cyrillic/cjk stratum for lang-id
    n_words = rng.integers(12, 60, n_doc)
    widx = rng.integers(0, len(WORDS), int(n_words.sum()))
    texts = _words(widx, n_words, WORDS)
    langs = np.full(n_doc, "en", dtype=object)
    for i in range(0, n_doc, 97):  # cyrillic stratum
        k = rng.integers(6, 14)
        texts[i] = " ".join(np.array(CYRILLIC)[rng.integers(0, len(CYRILLIC), k)])
        langs[i] = "ru"
    for i in range(3, n_doc, 131):  # cjk stratum
        k = rng.integers(6, 14)
        texts[i] = " ".join(np.array(CJK)[rng.integers(0, len(CJK), k)])
        langs[i] = "zh"
    for i in range(5, n_doc - 7, max(1, n_doc // max(1, int(8 * sf / 0.1)))):
        texts[i + 7] = texts[i]  # exact dup pair
    for i in range(11, n_doc - 13, max(1, n_doc // max(1, int(6 * sf / 0.1)))):
        toks = texts[i].split()
        if len(toks) > 4:
            toks[len(toks) // 2] = "nearDUP"
            texts[i + 13] = " ".join(toks)  # near dup pair
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
                "text": texts,
                "lang": pa.array(langs.tolist()),
                "source": [f"src{i % 20}" for i in range(n_doc)],
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype=np.int64)
                ),
            }
        ),
    )

    # embeddings: 10 cluster centers + noise; a few near-identical pairs
    dim, n_labels = 64, 10
    centers = rng.standard_normal((n_labels, dim))
    labels = rng.integers(0, n_labels, n_emb).astype(np.int32)
    vecs = centers[labels] + 0.35 * rng.standard_normal((n_emb, dim))
    for i in range(2, n_emb - 3, max(1, n_emb // max(1, int(40 * sf / 0.1)))):
        vecs[i + 3] = vecs[i] + 0.01 * rng.standard_normal(dim)  # cosine near-dup
        labels[i + 3] = labels[i]
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
                "embedding": pa.array(
                    list(vecs.astype(np.float32)), type=pa.list_(pa.float32())
                ),
                "label": pa.array(labels),
            }
        ),
    )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/osm_cut_sf1.0"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    generate(out, sf)
