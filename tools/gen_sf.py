"""Scale up a driver testdata dir by an integer factor, faithfully.

Usage: python tools/gen_sf.py SRC_DIR OUT_DIR FACTOR

Produces a dataset with FACTOR× the rows of SRC_DIR whose *per-copy*
statistics match the source exactly, so measured sf0.1 → sf1 scaling
reflects the engine, not artifacts of naive duplication:

* Star-schema tables get key offsets (copy i shifts every key by
  i × source cardinality) so join fan-outs stay 1:1 per copy; the
  fixed dims (region, nation) are not replicated.
* ``documents.text`` gets a per-copy AFFINE vocab map (the corpus is a
  closed 31-word vocabulary, 31 prime): copy i maps
  word_j → word_{(a_i·j + b_i) mod 31} with a_i = (i mod 30) + 1,
  b_i = 7i mod 31 — a bijection per copy, distinct for i < 930, and
  copy 0 is the identity. Token counts, doc lengths, global df shape,
  and within-copy duplicate structure are all preserved, while
  cross-copy shingle collisions drop to natural background rates —
  naive duplication would inflate LSH candidate pairs ~FACTOR² instead
  of FACTOR. (A plain rotation only supports factor ≤ 31 before copies
  repeat verbatim; the affine family extends honest scaling to
  factor ≈ 930, i.e. ~sf30.)
* ``embeddings.embedding`` gets a per-copy ORTHOGONAL transform
  (dimension rotation + deterministic sign flips): within-copy pairwise
  cosines are bit-preserved, cross-copy similarities randomized — again
  avoiding a FACTOR² near-dup explosion.
* ``events.ts`` is re-written as TIMESTAMP_NS to match the driver's
  parquet TIMESTAMP(NANOS) encoding that ``wikid_spark.catalog.table``
  expects (nanosAsLong read path).

Copy 0 is bit-identical to the source. Everything is deterministic —
no RNG, so re-runs produce identical files.
"""

from __future__ import annotations

import pathlib
import sys

import duckdb

N_VOCAB = 31  # closed vocabulary of the synthetic documents table
N_DIM = 64  # embedding dimensionality


def _union(con, n: int, select_for_copy) -> str:
    return " UNION ALL ".join(select_for_copy(i) for i in range(n))


def generate(src: str, out: str, factor: int) -> None:
    outp = pathlib.Path(out)
    outp.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    def rd(t):
        return f"read_parquet('{src}/{t}.parquet')"

    def copy_to(sql, t):
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0])

    # Fixed dims: not replicated (same 5 regions / 25 nations at any SF).
    for t in ("region", "nation"):
        copy_to(f"SELECT * FROM {rd(t)}", t)

    card = {
        t: con.execute(f"SELECT count(*) FROM {rd(t)}").fetchone()[0]
        for t in ("customer", "supplier", "part", "orders", "events", "documents", "embeddings")
    }

    def suffix(col, i):  # distinct entity names per copy, copy 0 untouched
        return col if i == 0 else f"{col} || '-{i}'"

    copy_to(
        _union(
            con,
            factor,
            lambda i: f"""SELECT c_custkey + {i * card['customer']} AS c_custkey,
                {suffix('c_name', i)} AS c_name, c_nationkey, c_acctbal, c_mktsegment
                FROM {rd('customer')}""",
        ),
        "customer",
    )
    copy_to(
        _union(
            con,
            factor,
            lambda i: f"""SELECT s_suppkey + {i * card['supplier']} AS s_suppkey,
                {suffix('s_name', i)} AS s_name, s_nationkey, s_acctbal
                FROM {rd('supplier')}""",
        ),
        "supplier",
    )
    copy_to(
        _union(
            con,
            factor,
            lambda i: f"""SELECT p_partkey + {i * card['part']} AS p_partkey,
                {suffix('p_name', i)} AS p_name, p_brand, p_type, p_size, p_retailprice
                FROM {rd('part')}""",
        ),
        "part",
    )
    copy_to(
        _union(
            con,
            factor,
            lambda i: f"""SELECT o_orderkey + {i * card['orders']} AS o_orderkey,
                o_custkey + {i * card['customer']} AS o_custkey,
                o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
                FROM {rd('orders')}""",
        ),
        "orders",
    )
    copy_to(
        _union(
            con,
            factor,
            lambda i: f"""SELECT l_orderkey + {i * card['orders']} AS l_orderkey,
                l_partkey + {i * card['part']} AS l_partkey,
                l_suppkey + {i * card['supplier']} AS l_suppkey,
                l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                l_returnflag, l_linestatus, l_shipdate
                FROM {rd('lineitem')}""",
        ),
        "lineitem",
    )

    # events: user population scales with the copy count; nanos encoding
    # preserved for the catalog's nanosAsLong read path.
    n_users = con.execute(f"SELECT max(user_id) + 1 FROM {rd('events')}").fetchone()[0]
    copy_to(
        _union(
            con,
            factor,
            lambda i: f"""SELECT event_id + {i * card['events']} AS event_id,
                ts::TIMESTAMP_NS AS ts, user_id + {i * n_users} AS user_id,
                event_type, value, props
                FROM {rd('events')}""",
        ),
        "events",
    )

    # documents: per-copy vocab rotation (see module docstring).
    vlist = (
        "["
        + ", ".join(
            f"'{w}'"
            for (w,) in con.execute(
                f"SELECT DISTINCT unnest(string_split(text, ' ')) w FROM {rd('documents')} ORDER BY w"
            ).fetchall()
        )
        + "]"
    )

    def doc_select(i):
        if i == 0:
            return f"SELECT * FROM {rd('documents')}"
        a = (i % (N_VOCAB - 1)) + 1
        b = (7 * i) % N_VOCAB
        expr = (
            f"({vlist})[1 + (({a} * (list_position({vlist}, w) - 1) + {b})"
            f" % {N_VOCAB})]"
        )
        return f"""SELECT doc_id + {i * card['documents']} AS doc_id,
            array_to_string(list_transform(string_split(text, ' '),
                w -> {expr}), ' ') AS text,
            lang, source,
            length(array_to_string(list_transform(string_split(text, ' '),
                w -> {expr}), ' ')) AS n_chars
            FROM {rd('documents')}"""

    copy_to(_union(con, factor, doc_select), "documents")

    # embeddings: per-copy orthogonal transform — dimension rotation by
    # 7i plus hash-derived sign flips (a signed permutation matrix), so
    # norms and within-copy pairwise cosines are exactly preserved.
    def emb_select(i):
        if i == 0:
            return f"SELECT * FROM {rd('embeddings')}"
        rot = (7 * i) % N_DIM
        # vec_id shifts by the DOCUMENTS stride, not the embeddings
        # one: the catalog contract is vec_id == doc_id of the
        # embedded document (embeddings ⊆ documents), and copy i of
        # document d gets doc_id d + i·|documents| — its embedding
        # must land on the same id or scaled joins pair vectors with
        # the wrong copies' text (round-8 ADVICE; regression-tested
        # in tests/test_catalog.py).
        return f"""SELECT vec_id + {i * card['documents']} AS vec_id,
            list_transform(range(0, {N_DIM}),
                j -> (CASE WHEN hash(j * 1000 + {i}) % 2 = 0 THEN 1.0 ELSE -1.0 END
                      * embedding[1 + ((j + {rot}) % {N_DIM})])::FLOAT)::FLOAT[] AS embedding,
            label
            FROM {rd('embeddings')}"""

    copy_to(_union(con, factor, emb_select), "embeddings")


if __name__ == "__main__":
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    generate(src, out, factor)
