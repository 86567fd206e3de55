"""Build a scaled sibling of a driver testdata dir by shard replication
(VERDICT r06 #1: empirical 10x-scale rehearsal of the slow tail).

The driver's generator (seed=42, TESTDATA.md) is not available to this
repo, so a larger fixture has to be derived from sf0.1 itself. Naive row
replication is WRONG for the dedup/similarity families: 10 verbatim
copies of every document turn each doc into a 10-clone near-dup clique
(pair count x100, not x10) and 10 copies of every vector into a
cosine-1.0 clique — that benchmarks a pathological corpus, not a bigger
one. Instead each replica is an INDEPENDENT SHARD, which is how a bigger
corpus actually behaves (statistically self-similar, cross-shard overlap
~ chance):

- TPC tables: per-replica key shifts (i * (max_key+1)) preserve
  referential integrity and per-key fan-outs within a shard; supplier /
  customer / part names get a replica suffix so name-grouped aggregates
  (Q21's GROUP BY s_name) don't merge across shards. region/nation are
  shared dimensions and stay as-is (as at any real scale).
- events: event_id/user_id shifted — 10x users at the same per-user
  rate, timestamps untouched, so streaming state per (user, bucket)
  stays bounded while traffic per bucket grows 10x (exactly the scale-up
  the bucketed interval join is designed for).
- documents: doc_id shifted; replica i>0 text gets a per-replica token
  prefix (r{i}x), destroying cross-shard shingle/MinHash/SimHash overlap
  so near-dup pair counts scale ~linearly (within-shard structure is
  preserved verbatim). A 1% slice (doc_id % 100 == 0) is left UNPREFIXED
  to plant realistic cross-shard exact-dup groups (size R) so exact
  dedup does real cross-shard work. Vocabulary grows ~R-fold (sharded
  corpora pay this; Heaps' law growth would be milder — documented
  trade, SCALE.md).
- embeddings: vec_id shifted; replica i>0 vectors multiplied by a
  seeded Rademacher +-1 sign vector per (replica, dim) — within-shard
  norms and cosines are preserved EXACTLY (|s_d|=1), cross-shard cosines
  collapse to ~N(0, 1/64) chance level, far below every 0.4+ threshold
  in the suite. Planted ANN probes (vec_id < 10) exist once, in shard 0,
  as at any corpus size.

Output layout matches TESTDATA.md ({out}/{table}.parquet), so every
registry query runs against it via SPARK_GRAFT_SF_DIR unchanged. Usage:

    python tools/make_scale_fixture.py [--src /root/testdata/sf0.1] \
        [--out .scale/sf1] [--factor 10]
"""

import argparse
import os

TPC_SHIFTS = {
    # table -> (key column -> shift domain root, name column or None)
    "customer": ({"c_custkey": "c_custkey"}, "c_name"),
    "supplier": ({"s_suppkey": "s_suppkey"}, "s_name"),
    "part": ({"p_partkey": "p_partkey"}, "p_name"),
    "orders": ({"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"}, None),
    "lineitem": (
        {
            "l_orderkey": "o_orderkey",
            "l_partkey": "p_partkey",
            "l_suppkey": "s_suppkey",
        },
        None,
    ),
    "events": ({"event_id": "event_id", "user_id": "user_id"}, None),
}

# which source table owns each key domain's max()
DOMAIN_TABLE = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "event_id": "events",
    "user_id": "events",
}


def build(src: str, out: str, factor: int, seed: int = 42) -> None:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def p(table: str, d: str = src) -> str:
        return os.path.join(d, f"{table}.parquet")

    # shared dimensions: verbatim copy
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{p(t)}') TO '{p(t, out)}' (FORMAT PARQUET)"
        )

    shift = {
        dom: con.execute(
            f"SELECT MAX({dom}) + 1 FROM '{p(tab)}'"
        ).fetchone()[0]
        for dom, tab in DOMAIN_TABLE.items()
    }
    # events.user_id and customer.c_custkey share one SUBJECT domain in
    # the base fixture (the privacy/erasure family joins tombstones from
    # events.user_id against c_custkey/o_custkey). Shifting them by
    # independent roots would break that linkage in every shard but the
    # first, under-exercising cross-shard purge work at scale — shift
    # both by the max over the union so subject u in events and customer
    # u land on the same shifted key in every replica (ADVICE r07).
    joint = max(shift["user_id"], shift["c_custkey"])
    shift["user_id"] = shift["c_custkey"] = joint

    for table, (keys, name_col) in TPC_SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{p(table)}'").fetchall()
        ]
        sel = []
        for c in cols:
            if c in keys:
                # CAST: + i*shift widens to HUGEINT in duckdb otherwise
                sel.append(f"CAST({c} + i * {shift[keys[c]]} AS BIGINT) AS {c}")
            elif c == name_col:
                sel.append(
                    f"CASE WHEN i = 0 THEN {c} ELSE {c} || '_r' || i END AS {c}"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{p(table)}' "
            f"CROSS JOIN (SELECT UNNEST(range({factor})) AS i) "
            f"ORDER BY i) TO '{p(table, out)}' (FORMAT PARQUET)"
        )

    doc_shift = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM '{p('documents')}'"
    ).fetchone()[0]
    con.execute(
        f"""COPY (
        SELECT CAST(doc_id + i * {doc_shift} AS BIGINT) AS doc_id,
               CASE WHEN i = 0 OR doc_id % 100 = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', 'r' || i || 'x\\1', 'g')
               END AS text,
               lang, source,
               CAST(length(CASE WHEN i = 0 OR doc_id % 100 = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', 'r' || i || 'x\\1', 'g')
               END) AS BIGINT) AS n_chars
        FROM '{p('documents')}'
        CROSS JOIN (SELECT UNNEST(range({factor})) AS i) ORDER BY i
        ) TO '{p('documents', out)}' (FORMAT PARQUET)"""
    )

    # embeddings: numpy sign flips (exact within-shard geometry)
    emb = pq.read_table(p("embeddings"))
    vec_ids = emb.column("vec_id").to_numpy()
    labels = emb.column("label").to_numpy()
    x = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    dim = x.shape[1]
    vec_shift = int(vec_ids.max()) + 1
    out_ids, out_labels, out_vecs = [], [], []
    for i in range(factor):
        rng = np.random.default_rng(seed + 1000 * i)
        signs = (
            np.ones(dim, dtype=np.float32)
            if i == 0
            else rng.choice(np.array([-1.0, 1.0], dtype=np.float32), dim)
        )
        out_ids.append(vec_ids + i * vec_shift)
        out_labels.append(labels)
        out_vecs.append(x * signs)
    table = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in np.vstack(out_vecs)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(out_labels), type=pa.int32()),
        }
    )
    pq.write_table(table, p("embeddings", out))

    for t in sorted(
        ("region", "nation", *TPC_SHIFTS, "documents", "embeddings")
    ):
        n = con.execute(f"SELECT COUNT(*) FROM '{p(t, out)}'").fetchone()[0]
        print(f"{t}: {n} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".scale/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    build(args.src, args.out, args.factor)


if __name__ == "__main__":
    main()
