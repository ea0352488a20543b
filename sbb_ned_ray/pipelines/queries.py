"""Named queries for the driver contract (``__ray_entry__``): each
function takes ``sf_dir`` and returns a Dataset / DataFrame / Table;
``ORACLE_SQL`` holds the DuckDB-equivalent SQL for the SQL-expressible
ones (column names match exactly; floats are scaled to integers with
``floor(x·10^k + 0.5)`` on BOTH sides so the driver's value-hash is
exact).

Covers the operator families of SURVEY.md §2 (maps, filters, joins,
aggregations, sorts/top-k, windows, set-ops/dedup) plus the
training-data operators (dedup, similarity search, text analysis) and
the NED pipeline itself (non-SQL → rows-only checks).
"""

from __future__ import annotations

import glob as _glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.fixtures.generator import pages_dir_for_sf


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _read_split(sf_dir: str, name: str, columns: list[str],
                nblocks: int = 32):
    """read_parquet + repartition: the sf test tables are single-file,
    single-row-group parquet, which Ray cannot split at the read — one
    task would run the whole downstream per-row compute.  Repartitioning
    the (small) table unlocks task parallelism; real corpora arrive as
    many files and skip this."""
    return rd.read_parquet(_t(sf_dir, name), columns=columns) \
        .repartition(nblocks)


def _e(x, scale: float):
    """floor(x*scale + 0.5) as int64 — FP-exact cross-engine encoding."""
    return pc.cast(pc.floor(pc.add(pc.multiply(x, scale), 0.5)), pa.int64())


# ---------------------------------------------------------------------------
# Relational operator coverage (groupby-agg / join / top-k / window /
# sessionize / distinct) — TPC-H-ish, oracle-checked.
# ---------------------------------------------------------------------------

def q1_pricing(sf_dir: str):
    """Grouped aggregation with pre-scaled integer sums (q1-style)."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_linestatus",
                                  "l_quantity", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(
            t["l_shipdate"],
            pa.scalar(np.datetime64("1998-09-02", "us"))))
        price_e2 = _e(t["l_extendedprice"], 100.0)
        disc_e2 = _e(t["l_discount"], 100.0)
        qty_e0 = _e(t["l_quantity"], 1.0)
        disc_price_e4 = pc.multiply(
            price_e2, pc.subtract(pa.scalar(100, pa.int64()), disc_e2))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty_e0": qty_e0,
            "price_e2": price_e2,
            "disc_price_e4": disc_price_e4,
        })

    out = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("qty_e0", alias_name="sum_qty_e0"),
                      Sum("price_e2", alias_name="sum_base_price_e2"),
                      Sum("disc_price_e4", alias_name="sum_disc_price_e4"),
                      Count(alias_name="count_order")))
    return out


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_e0,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_e2,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(sf_dir: str):
    """Broadcast-join + grouped agg + global top-k (q3-style).

    customer(BUILDING) is the small side → broadcast key set; lineitem
    revenue pre-scaled; top-10 by (revenue desc, orderkey asc)."""
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys = pa.array(
        sorted(cust.loc[cust.c_mktsegment == "BUILDING", "c_custkey"]),
        pa.int64())
    ckeys_ref = ray.put(keys)
    cutoff = pa.scalar(np.datetime64("1995-03-15", "us"))

    def sel_orders_fn(t: pa.Table) -> pa.Table:
        # distributed semi-join filter: orders is NOT the small side —
        # only the qualifying orderkey column ever reaches the driver
        ck = ray.get(ckeys_ref)
        mask = pc.and_(pc.is_in(t["o_custkey"], value_set=ck),
                       pc.less(t["o_orderdate"], cutoff))
        return t.filter(mask).select(["o_orderkey"])

    sel_keys = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(sel_orders_fn, batch_format="pyarrow").to_pandas()
    okeys_ref = ray.put(set(sel_keys.o_orderkey))

    class Revenue:
        def __init__(self, ref):
            keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.key_arr = pa.array(sorted(keys), pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pc.is_in(t["l_orderkey"], value_set=self.key_arr)
            t = t.filter(mask)
            price_e2 = _e(t["l_extendedprice"], 100.0)
            disc_e2 = _e(t["l_discount"], 100.0)
            rev = pc.multiply(price_e2,
                              pc.subtract(pa.scalar(100, pa.int64()), disc_e2))
            return pa.table({"l_orderkey": t["l_orderkey"],
                             "revenue_e4": rev})

    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])
    agg = (li.map_batches(Revenue, fn_constructor_args=(okeys_ref,),
                          batch_format="pyarrow", concurrency=(1, 4))
           .groupby("l_orderkey")
           .aggregate(Sum("revenue_e4", alias_name="revenue_e4"))
           .to_pandas())
    agg = agg.sort_values(["revenue_e4", "l_orderkey"],
                          ascending=[False, True]).head(10)
    return agg.reset_index(drop=True)


ORACLE_Q3 = """
SELECT l_orderkey,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT))) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15'
GROUP BY l_orderkey
ORDER BY revenue_e4 DESC, l_orderkey
LIMIT 10
"""


def orders_per_nation(sf_dir: str):
    """Two-hop broadcast join orders ⋈ customer ⋈ nation → counts."""
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    cust_nation = dict(zip(
        cust.c_custkey,
        cust.c_nationkey.map(dict(zip(nation.n_nationkey, nation.n_name)))))
    ref = ray.put(cust_nation)

    class Tag:
        def __init__(self, r):
            m = ray.get(r) if isinstance(r, ray.ObjectRef) else r
            self.m = pd.Series(m)   # vectorized lookup table

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["o_custkey"].to_numpy(zero_copy_only=False)
            names = self.m.reindex(keys)
            names = names.where(names.notna(), None).to_numpy()
            return pa.table({"n_name": pa.array(names, pa.string())})

    out = (rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])
           .map_batches(Tag, fn_constructor_args=(ref,),
                        batch_format="pyarrow", concurrency=(1, 4))
           .groupby("n_name").aggregate(Count(alias_name="n_orders")))
    return out


ORACLE_ORDERS_PER_NATION = """
SELECT n_name, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q5_region_revenue(sf_dir: str):
    """TPC-H Q5 shape: revenue per nation where the ordering customer
    and the supplying supplier share a nation, one region + one order
    year.  Dimension tables (region/nation/customer/supplier) are tiny
    → broadcast sorted-key lookup arrays; the LARGE-LARGE lineitem ⋈
    orders equi-join runs as Ray Data's native hash join (all other
    relational queries here use broadcast/semi-join shapes — this one
    exercises the generic shuffle join on purpose)."""
    nat = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    reg = rd.read_parquet(_t(sf_dir, "region")).to_pandas()
    eu_keys = set(reg.loc[reg.r_name == "EUROPE", "r_regionkey"])
    eu = nat[nat.n_regionkey.isin(eu_keys)]
    nk2name = dict(zip(eu.n_nationkey.astype(int), eu.n_name))

    def lookup_ref(table: str, key: str, val: str):
        df = rd.read_parquet(_t(sf_dir, table),
                             columns=[key, val]).to_pandas()
        df = df[df[val].isin(nk2name)].sort_values(key)
        return ray.put((df[key].to_numpy(np.int64),
                        df[val].to_numpy(np.int64)))

    c_ref = lookup_ref("customer", "c_custkey", "c_nationkey")
    s_ref = lookup_ref("supplier", "s_suppkey", "s_nationkey")
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def _probe(keys_sorted, vals, x):
        """sorted-array lookup: nation of each key in x, -1 on miss."""
        pos = np.searchsorted(keys_sorted, x)
        pos = np.clip(pos, 0, len(keys_sorted) - 1)
        hit = len(keys_sorted) > 0
        ok = keys_sorted[pos] == x if hit else np.zeros(len(x), bool)
        out = np.where(ok, vals[pos] if hit else -1, -1)
        return out

    def sel_orders(t: pa.Table) -> pa.Table:
        ck, cn = ray.get(c_ref)
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        nat_of = _probe(ck, cn, t["o_custkey"].to_numpy(zero_copy_only=False))
        keep = nat_of >= 0
        return pa.table({
            "o_orderkey": pc.array_filter(t["o_orderkey"],
                                          pa.array(keep)),
            "cust_nat": pa.array(nat_of[keep], pa.int64())})

    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(sel_orders, batch_format="pyarrow")
    li = _read_split(sf_dir, "lineitem",
                     ["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount"], nblocks=16)
    joined = li.join(orders, join_type="inner", num_partitions=8,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def revenue(t: pa.Table) -> pa.Table:
        sk, sn = ray.get(s_ref)
        s_nat = _probe(sk, sn, t["l_suppkey"].to_numpy(zero_copy_only=False))
        keep = pa.array(s_nat == t["cust_nat"].to_numpy(zero_copy_only=False))
        t = t.filter(keep)
        price_e2 = _e(t["l_extendedprice"], 100.0)
        disc_e2 = _e(t["l_discount"], 100.0)
        rev = pc.multiply(price_e2,
                          pc.subtract(pa.scalar(100, pa.int64()), disc_e2))
        return pa.table({"cust_nat": t["cust_nat"], "revenue_e4": rev})

    agg = joined.map_batches(revenue, batch_format="pyarrow") \
        .groupby("cust_nat") \
        .aggregate(Sum("revenue_e4", alias_name="revenue_e4")).to_pandas()
    agg["n_name"] = agg.cust_nat.map(nk2name)
    return agg[["n_name", "revenue_e4"]].sort_values("n_name") \
        .reset_index(drop=True)


ORACLE_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT))) AS BIGINT)
           AS revenue_e4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_nationkey = c_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY n_name
"""


def docs_blocklist_anti(sf_dir: str, num_buckets: int = 32):
    """Blocklist filtering — the training-data op of dropping EVERY
    copy of a blocklisted document (vs exact_dedup's keep-first).  The
    blocklist (content hashes occurring ≥2×) is computed distributed
    (per-batch partial counts → narrow groupby), then removed with a
    bucketed co-shuffle ANTI-JOIN: docs and blocklist rows hash into
    the same key buckets, and one vectorized ``isin`` per bucket drops
    the hits.  A small curated blocklist would instead broadcast into
    an ``is_in`` filter (the q3 pattern); the co-shuffle is the scale
    shape for blocklists that are themselves large (e.g. a full
    prior-crawl fingerprint set).  Size ``num_buckets`` so a bucket's
    docs fit one worker.  (Ray Data's native ``left_anti`` join is the
    obvious alternative, but sparse right sides leave empty hash
    partitions that crash the pyarrow join in this Ray version.)"""
    from sbb_ned_ray.stages.dedup import add_content_hash

    def hashed(t: pa.Table) -> pa.Table:
        return add_content_hash(t).select(["doc_id", "content_hash"])

    docs = rd.read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"]) \
        .map_batches(hashed, batch_format="pyarrow")

    def partial_counts(t: pa.Table) -> pa.Table:
        df = t.select(["content_hash"]).to_pandas()
        g = df.value_counts().reset_index()
        g.columns = ["content_hash", "n"]
        return pa.Table.from_pandas(g, preserve_index=False)

    def as_marker(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(np.full(len(t), -1, np.int64)),
            "content_hash": t["content_hash"]})

    blocklist = docs.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("content_hash").aggregate(Sum("n", alias_name="n")) \
        .filter(expr="n >= 2") \
        .map_batches(as_marker, batch_format="pyarrow")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (pd.util.hash_pandas_object(df["content_hash"],
                                               index=False)
                    .to_numpy() % num_buckets).astype(np.int32)
        return df

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": pd.array([], dtype="int64")})
        bl = df.loc[df.doc_id < 0, "content_hash"]
        keep = df[(df.doc_id >= 0) & ~df.content_hash.isin(set(bl))]
        return keep[["doc_id"]]

    kept = docs.union(blocklist) \
        .map_batches(add_bucket, batch_format="pandas") \
        .groupby("_b").map_groups(anti, batch_format="pandas")
    out = kept.to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


ORACLE_BLOCKLIST_ANTI = """
SELECT doc_id FROM documents
WHERE md5(text) IN (SELECT md5(text) FROM documents
                    GROUP BY md5(text) HAVING COUNT(*) = 1)
ORDER BY doc_id
"""


def pii_redact_docs(sf_dir: str):
    """PII redaction over the documents table (emails / phones / IPv4 →
    typed placeholders, with per-category match counts).  The synthetic
    corpus carries no PII, so deterministic PII is injected from doc_id
    by the SAME integer/string expression in Ray and the SQL oracle;
    the redaction regexes are shared RE2 strings, so pyarrow and DuckDB
    produce bit-identical output."""
    from sbb_ned_ray.stages.textprep import redact_batch

    def with_pii(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"]
        sid = i.astype(str)
        email = (" reach user" + sid + "@web.example.org") \
            .where(i % 3 < 2, "")
        phone = (" call 555-" + (1000 + i % 9000).astype(str)) \
            .where(i % 4 == 0, "")
        ip = (" from 192.168." + (i % 256).astype(str) + "."
              + ((i * 7) % 256).astype(str)).where(i % 5 == 0, "")
        return pd.DataFrame({"doc_id": i,
                             "text": df["text"] + email + phone + ip})

    return _read_split(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(with_pii, batch_format="pandas") \
        .map_batches(redact_batch, batch_format="pyarrow")


def _oracle_pii() -> str:
    from sbb_ned_ray.stages.textprep import EMAIL_RE, IPV4_RE, PHONE_RE
    return """
WITH pii AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 < 2
            THEN ' reach user' || doc_id || '@web.example.org'
            ELSE '' END
    || CASE WHEN doc_id % 4 = 0
            THEN ' call 555-' || (1000 + doc_id % 9000) ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' from 192.168.' || (doc_id % 256) || '.'
                 || ((doc_id * 7) % 256) ELSE '' END
    AS text
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(
      text, '{E}', '<EMAIL>', 'g'), '{I}', '<IP>', 'g'),
      '{P}', '<PHONE>', 'g') AS redacted,
  len(regexp_extract_all(text, '{E}')) AS n_email,
  len(regexp_extract_all(text, '{P}')) AS n_phone,
  len(regexp_extract_all(text, '{I}')) AS n_ip
FROM pii
""".replace("{E}", EMAIL_RE).replace("{P}", PHONE_RE).replace("{I}", IPV4_RE)


def doc_repetition(sf_dir: str):
    """Gopher-style repetition quality stats per document (duplicate-
    token / top-token / top-bigram fractions as exact e6 integers)."""
    from sbb_ned_ray.stages.textprep import repetition_batch
    return _read_split(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(repetition_batch, batch_format="pyarrow")


ORACLE_DOC_REPETITION = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
pos AS (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks))) AS i FROM w),
tok AS (SELECT doc_id, len(toks) AS n, toks[i] AS tok,
               CASE WHEN i < len(toks)
                    THEN toks[i] || ' ' || toks[i + 1] END AS bg
        FROM pos),
tc AS (SELECT doc_id, ANY_VALUE(n) AS n, tok, COUNT(*) AS cnt
       FROM tok GROUP BY doc_id, tok),
ta AS (SELECT doc_id, ANY_VALUE(n) AS n, COUNT(*) AS distinct_tokens,
              MAX(cnt) AS top
       FROM tc GROUP BY doc_id),
bc AS (SELECT doc_id, bg, COUNT(*) AS bcnt FROM tok
       WHERE bg IS NOT NULL GROUP BY doc_id, bg),
ba AS (SELECT doc_id, MAX(bcnt) AS topb FROM bc GROUP BY doc_id)
SELECT ta.doc_id, n AS n_tokens, distinct_tokens,
  CAST(FLOOR((1.0 - distinct_tokens / (n * 1.0)) * 1000000.0 + 0.5)
       AS BIGINT) AS dup_frac_e6,
  CAST(FLOOR(top * 1000000.0 / n + 0.5) AS BIGINT) AS top_token_frac_e6,
  CAST(FLOOR(COALESCE(topb, 0) * 1000000.0 / GREATEST(n - 1, 1) + 0.5)
       AS BIGINT) AS top_bigram_frac_e6
FROM ta LEFT JOIN ba USING (doc_id)
"""


def doc_chunks(sf_dir: str):
    """Fixed-window chunking with overlap (chunk_size=32, stride=24) —
    the pack-into-model-windows flat-map; rows out ≈ 4× rows in."""
    from sbb_ned_ray.stages.textprep import chunk_batch
    return _read_split(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(chunk_batch, batch_format="pyarrow")


ORACLE_DOC_CHUNKS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (SELECT doc_id, toks, len(toks) AS n,
             unnest(generate_series(0, len(toks) - 1, 24)) AS s FROM w)
SELECT doc_id, s // 24 AS chunk_no,
       LEAST(32, n - s) AS n_tokens,
       array_to_string(toks[s + 1 : s + 32], ' ') AS chunk_text
FROM c
"""


def docs_decontaminate(sf_dir: str):
    """Test-set decontamination: train docs (source <> 'src0') sharing
    any 13-token n-gram with the held-out source 'src0' docs — a
    bucketed co-shuffle semi-join on gram hashes (stages/textprep)."""
    from sbb_ned_ray.stages.textprep import decontaminate_ids
    docs = _read_split(sf_dir, "documents", ["doc_id", "text", "source"])
    train = docs.filter(expr="source != 'src0'")
    test = docs.filter(expr="source == 'src0'")
    return decontaminate_ids(train, test, n=13)


ORACLE_DOCS_DECONTAMINATE = """
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS toks
           FROM documents),
pos AS (SELECT doc_id, source, toks,
               unnest(generate_series(1, len(toks) - 12)) AS i FROM w),
g AS (SELECT doc_id, source,
             array_to_string(toks[i : i + 12], ' ') AS gram FROM pos)
SELECT DISTINCT doc_id FROM g
WHERE source <> 'src0'
  AND gram IN (SELECT gram FROM g WHERE source = 'src0')
ORDER BY doc_id
"""


def docs_bm25_topk(sf_dir: str, terms: tuple = ("hash", "join", "spark"),
                   k: int = 10):
    """Okapi BM25 top-k lexical retrieval (Lucene idf variant) over
    the documents table: corpus stats (N, avgdl, per-term df) from one
    narrow partial pass, broadcast idf, per-batch score + top-k
    combiner, driver merge — zero corpus shuffle.  Oracle-exact: the
    SQL twin computes the identical formula and both sides rank by
    the e6-quantized score."""
    from sbb_ned_ray.stages.analysis import bm25_topk
    docs = _read_split(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(docs, list(terms), k=k)


ORACLE_DOCS_BM25_TOPK = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
stats AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM w),
tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok FROM w),
tf AS (SELECT doc_id, ANY_VALUE(dl) AS dl, tok, COUNT(*) AS tf
       FROM tok WHERE tok IN ('hash', 'join', 'spark')
       GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
sc AS (SELECT doc_id,
              SUM(LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                  * tf * (1.2 + 1.0)
                  / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS s
       FROM tf JOIN df USING (tok) CROSS JOIN stats
       GROUP BY doc_id)
SELECT doc_id, CAST(FLOOR(s * 1000000.0 + 0.5) AS BIGINT) AS score_e6,
       ROW_NUMBER() OVER (
           ORDER BY CAST(FLOOR(s * 1000000.0 + 0.5) AS BIGINT) DESC,
                    doc_id) AS bm25_rank
FROM sc
ORDER BY bm25_rank
LIMIT 10
"""


def docs_dup_spans(sf_dir: str, n: int = 13):
    """Exact duplicate-substring spans (ExactSubstr, Lee et al. 2021):
    maximal per-doc token spans whose 13-grams each occur in >= 2
    distinct documents — gram-hash co-shuffle + per-doc island merge,
    oracle-checked against a DuckDB gaps-and-islands twin on the raw
    gram strings (so a Ray-side hash collision or off-by-one in the
    merge rule mismatches the hash)."""
    from sbb_ned_ray.stages.textprep import duplicate_spans
    docs = _read_split(sf_dir, "documents", ["doc_id", "text"])
    return duplicate_spans(docs, n=n)


ORACLE_DOCS_DUP_SPANS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents),
pos AS (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 12)) AS i FROM w),
g AS (SELECT doc_id, i,
             array_to_string(toks[i : i + 12], ' ') AS gram FROM pos),
dup AS (SELECT gram FROM g GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2),
hit AS (SELECT doc_id, i FROM g WHERE gram IN (SELECT gram FROM dup)),
isl AS (SELECT doc_id, i,
               CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i)
                         <= 13 THEN 0 ELSE 1 END AS brk
        FROM hit),
grp AS (SELECT doc_id, i,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY i) AS gid
        FROM isl)
SELECT doc_id,
       CAST(MIN(i) - 1 AS BIGINT)      AS span_start,
       CAST(MAX(i) - 1 + 13 AS BIGINT) AS span_end,
       CAST(COUNT(*) AS BIGINT)        AS n_grams
FROM grp
GROUP BY doc_id, gid
ORDER BY doc_id, span_start
"""


def distinct_segments(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, pa.string())})


ORACLE_DISTINCT_SEGMENTS = \
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"


def events_windowed(sf_dir: str):
    """Tumbling 1-hour windows per event_type (streaming-shaped op):
    per-batch partial aggregation, then a small groupby."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        epoch_s = pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000)
        win = pc.multiply(pc.divide(epoch_s, 3600), 3600)
        val_e6 = _e(t["value"], 1e6)
        df = pa.table({"event_type": t["event_type"],
                       "window_start": win,
                       "val_e6": val_e6}).to_pandas()
        g = df.groupby(["event_type", "window_start"], sort=False) \
            .agg(n_events=("val_e6", "size"), sum_value_e6=("val_e6", "sum")) \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["event_type", "window_start"])
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("sum_value_e6", alias_name="sum_value_e6")))
    return out


ORACLE_EVENTS_WINDOWED = """
SELECT event_type,
       (CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e6
FROM events
GROUP BY 1, 2
"""


def top_events_per_user(sf_dir: str):
    """Per-key top-k (rank within group): top-3 events per user by
    (value desc, event_id asc)."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_id", "value"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"],
                          ascending=[False, True]).head(3)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["user_id", "event_id", "rnk"]]

    return ds.groupby("user_id").map_groups(topk, batch_format="pandas")


ORACLE_TOP_EVENTS_PER_USER = """
SELECT user_id, event_id,
       ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY value DESC, event_id) AS rnk
FROM events
QUALIFY rnk <= 3
"""


def doc_top_tokens(sf_dir: str, k: int = 100):
    """Corpus vocabulary count (the wordcount of training-data prep):
    per-batch partial token counts (one numpy unique per batch — no
    per-row loop) → narrow (token, n) groupby sum → global top-k.
    The shuffle moves ONE row per distinct token per batch, not one
    per occurrence."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        toks = np.array(" ".join(texts).split(" ")) if texts \
            else np.array([], dtype=str)
        u, c = np.unique(toks, return_counts=True)
        return pa.table({"token": pa.array(u, pa.string()),
                         "n": pa.array(c, pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("n", alias_name="n")).to_pandas()
    agg = agg.sort_values(["n", "token"], ascending=[False, True]).head(k)
    return agg.reset_index(drop=True)


ORACLE_DOC_TOP_TOKENS = """
SELECT tok AS token, COUNT(*) AS n
FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
GROUP BY tok
ORDER BY n DESC, token
LIMIT 100
"""


def docs_sample_per_lang(sf_dir: str, k: int = 20):
    """Deterministic stratified downsample — the per-language budget
    cap of corpus curation: keep the k docs per lang with the smallest
    md5(doc_id) (a seedless, order-free 'random' draw both engines can
    compute).  Per-batch partial top-k first, so the groupby moves at
    most k rows per lang per batch."""
    import hashlib

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "lang"])

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["h"] = [hashlib.md5(str(i).encode()).hexdigest()
                   for i in df.doc_id]
        return df.sort_values(["h", "doc_id"]).groupby("lang").head(k)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"]).head(k)
        return g[["lang", "doc_id"]].sort_values("doc_id")

    return ds.map_batches(partial_topk, batch_format="pandas") \
        .groupby("lang").map_groups(final_topk, batch_format="pandas") \
        .to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)


ORACLE_DOCS_SAMPLE_PER_LANG = """
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
             AS rnk
  FROM documents) WHERE rnk <= 20
ORDER BY lang, doc_id
"""


def docs_len_quantiles(sf_dir: str):
    """Exact grouped quantiles (p50/p90 doc length per language) — the
    length-distribution probe of corpus curation.  Group cardinality is
    tiny (languages) while groups are huge, so the scale shape is
    per-batch partial HISTOGRAMS (value_counts over the narrow length
    column) → groupby-sum → quantile read-off from the merged
    histogram; no per-group sort, no full-column materialization."""
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["lang", "n_chars"])

    def partial_hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.value_counts(["lang", "n_chars"]).reset_index()
        g.columns = ["lang", "n_chars", "cnt"]
        return g

    hist = ds.map_batches(partial_hist, batch_format="pandas") \
        .groupby(["lang", "n_chars"]) \
        .aggregate(Sum("cnt", alias_name="cnt")).to_pandas()

    def q_disc(g: pd.DataFrame, q: float) -> int:
        # percentile_disc: smallest value with cum-count ≥ ceil(q*N)
        g = g.sort_values("n_chars")
        cum = g.cnt.cumsum()
        need = int(np.ceil(q * int(g.cnt.sum())))
        return int(g.n_chars.to_numpy()[np.searchsorted(cum.to_numpy(),
                                                        need)])

    rows = [{"lang": lang, "p50": q_disc(g, 0.5), "p90": q_disc(g, 0.9)}
            for lang, g in hist.groupby("lang")]
    out = pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)
    return out.astype({"p50": "int64", "p90": "int64"})


ORACLE_DOCS_LEN_QUANTILES = """
SELECT lang,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)
           AS p50,
       CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)
           AS p90
FROM documents GROUP BY lang ORDER BY lang
"""


def events_json_extract(sf_dir: str):
    """Semi-structured extraction: pull the ``k`` field out of the JSON
    ``props`` column and aggregate it per event type.  The parse is a
    single vectorized Arrow ``extract_regex`` kernel per batch — no
    Python-level json.loads loop — followed by a pre-aggregated narrow
    groupby (one partial row per type per batch)."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        df = pa.table({"event_type": t["event_type"], "k": k}).to_pandas()
        g = df.groupby("event_type", sort=False)["k"].agg(["sum", "count"])
        g = g.reset_index()
        g.columns = ["event_type", "sum_k", "n"]
        return pa.Table.from_pandas(g, preserve_index=False)

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .aggregate(Sum("sum_k", alias_name="sum_k"),
                   Sum("n", alias_name="n")).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True) \
        .astype({"sum_k": "int64", "n": "int64"})


ORACLE_EVENTS_JSON_EXTRACT = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_asof_join(sf_dir: str):
    """AS-OF join (custom operator — Ray Data has no native asof): for
    each 'click' event, the most recent strictly-earlier 'purchase' by
    the same user.  Partitioned by user via the coarse-bucket group
    helper; inside a group both sides sort once and numpy searchsorted
    does the per-click lookup.  The partitioning assumption: the join
    key (user_id) co-locates both streams — the same assumption any
    distributed asof needs."""
    import pyarrow.parquet  # noqa: F401  (driver env parity)

    from sbb_ned_ray.stages.dedup import bucketed_map_groups

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])

    def asof_group(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_id": pd.Series(dtype="int64"),
            "prev_purchase_id": pd.Series(dtype="int64"),
            "gap_us": pd.Series(dtype="int64")})
        if g.empty:
            return empty
        clicks = g[g.event_type == "click"].sort_values("ts")
        # tie-break: among purchases sharing a ts, the MAX event_id wins
        # (searchsorted side="left" − 1 lands on the last tied row) —
        # the oracle encodes the same rule explicitly
        buys = g[g.event_type == "purchase"].sort_values(["ts", "event_id"])
        if clicks.empty or buys.empty:
            return empty
        c_ts = clicks["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        b_ts = buys["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        idx = np.searchsorted(b_ts, c_ts, side="left") - 1
        keep = idx >= 0
        return pd.DataFrame({
            "event_id": clicks["event_id"].to_numpy()[keep],
            "prev_purchase_id": buys["event_id"].to_numpy()[idx[keep]],
            "gap_us": c_ts[keep] - b_ts[idx[keep]],
        })

    return bucketed_map_groups(ds, "user_id", asof_group,
                               skip_singletons=False)


ORACLE_EVENTS_ASOF = """
SELECT event_id, prev_purchase_id, gap_us FROM (
  SELECT a.event_id AS event_id, b.event_id AS prev_purchase_id,
         datediff('microseconds', b.ts, a.ts) AS gap_us,
         ROW_NUMBER() OVER (PARTITION BY a.event_id
                            ORDER BY b.ts DESC, b.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'click') a
  JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
    ON a.user_id = b.user_id AND b.ts < a.ts)
WHERE rn = 1
"""


def events_range_join(sf_dir: str, window_s: int = 3600):
    """RANGE join (custom operator): all 'error' events by the same user
    within ``window_s`` seconds BEFORE each 'purchase'.  Same
    user-partitioned sorted-merge shape as the asof join; interval
    bounds via two searchsorted calls per probe row."""
    from sbb_ned_ray.stages.dedup import bucketed_map_groups

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    win_us = window_s * 1_000_000

    def range_group(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "purchase_id": pd.Series(dtype="int64"),
            "error_id": pd.Series(dtype="int64"),
            "gap_us": pd.Series(dtype="int64")})
        if g.empty:
            return empty
        buys = g[g.event_type == "purchase"]
        errs = g[g.event_type == "error"].sort_values("ts")
        if buys.empty or errs.empty:
            return empty
        e_ts = errs["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        e_id = errs["event_id"].to_numpy()
        p_id = buys["event_id"].to_numpy()
        p_ts = buys["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        # interval bounds per probe row, then one vectorized expansion:
        # idx = concat(arange(lo_i, hi_i)) via repeat + running offset
        lo = np.searchsorted(e_ts, p_ts - win_us, side="left")
        hi = np.searchsorted(e_ts, p_ts, side="left")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        starts = np.repeat(lo, counts)
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts,
                                            counts)
        idx = starts + offs
        pid_rep = np.repeat(p_id, counts)
        pts_rep = np.repeat(p_ts, counts)
        return pd.DataFrame({"purchase_id": pid_rep,
                             "error_id": e_id[idx],
                             "gap_us": pts_rep - e_ts[idx]})

    return bucketed_map_groups(ds, "user_id", range_group,
                               skip_singletons=False)


ORACLE_EVENTS_RANGE = """
SELECT p.event_id AS purchase_id, e.event_id AS error_id,
       datediff('microseconds', e.ts, p.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND e.ts >= p.ts - INTERVAL 1 HOUR AND e.ts < p.ts
"""


def sessionize_users(sf_dir: str):
    """Session windows: 30-min inactivity gap per user → session count."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values().to_numpy()
        gaps = np.diff(ts.astype("datetime64[s]").astype(np.int64))
        n = 1 + int((gaps > 1800).sum())
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_sessions": [n]})

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


ORACLE_SESSIONIZE = """
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions FROM (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                   OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                      - CAST(FLOOR(epoch(prev_ts)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM (SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        FROM events))
GROUP BY user_id
"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str):
    """Pivot / conditional aggregation: per-user event counts spread
    into one column per event type.  Distributed shape: per-batch
    crosstab partials (the combiner — rows shrink from events to
    users×batches BEFORE the exchange), then one narrow groupby-sum."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        piv = pd.crosstab(df["user_id"], df["event_type"])
        for c in _EVENT_TYPES:
            if c not in piv.columns:
                piv[c] = 0
        piv = piv[list(_EVENT_TYPES)].reset_index()
        piv.columns = ["user_id"] + [f"n_{c}" for c in _EVENT_TYPES]
        return pa.Table.from_pandas(piv, preserve_index=False)

    agg = [Sum(f"n_{c}", alias_name=f"n_{c}") for c in _EVENT_TYPES]
    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(*agg)


ORACLE_EVENTS_PIVOT = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events GROUP BY user_id
"""


def cheapest_supplier_per_nation(sf_dir: str):
    """Per-group argmin WITH payload (the TPC-H Q2 kernel): the supplier
    with the minimum account balance per nation, deterministic tie-break
    on suppkey, carrying the winner's name through.  Distributed shape:
    per-batch argmin partials (one candidate row per nation per batch),
    a tiny groupby reduction, and a broadcast join for the 25-row
    nation names."""
    sup = rd.read_parquet(_t(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_name", "s_nationkey",
                                   "s_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["s_nationkey", "s_acctbal", "s_suppkey"])
        return df.groupby("s_nationkey", sort=False).head(1)

    best = sup.map_batches(partial, batch_format="pandas") \
        .groupby("s_nationkey") \
        .map_groups(partial, batch_format="pandas").to_pandas()
    nations = pd.read_parquet(_t(sf_dir, "nation"),
                              columns=["n_nationkey", "n_name"])
    out = best.merge(nations, left_on="s_nationkey",
                     right_on="n_nationkey")
    out["acctbal_e2"] = np.floor(
        out["s_acctbal"] * 100 + 0.5).astype(np.int64)
    return out[["n_name", "s_suppkey", "s_name", "acctbal_e2"]] \
        .sort_values("n_name").reset_index(drop=True)


ORACLE_CHEAPEST_SUPPLIER = """
WITH m AS (SELECT s_nationkey, MIN(s_acctbal) AS mn
           FROM supplier GROUP BY s_nationkey),
w AS (SELECT s.s_nationkey, MIN(s.s_suppkey) AS s_suppkey
      FROM supplier s
      JOIN m ON s.s_nationkey = m.s_nationkey AND s.s_acctbal = m.mn
      GROUP BY s.s_nationkey)
SELECT n.n_name, w.s_suppkey, s.s_name,
       CAST(FLOOR(s.s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_e2
FROM w
JOIN supplier s USING (s_suppkey)
JOIN nation n ON n.n_nationkey = w.s_nationkey
ORDER BY n.n_name
"""


def events_rolling_avg(sf_dir: str):
    """Rolling window FRAME per key (ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW): moving average of ``value`` per user in event order.
    The frame family is distinct from sessionize's LAG shape — it needs
    the ordered neighborhood, not just the previous row.  Distributed
    shape: shuffle on user_id, per-group vectorized sliding windows
    (``np.lib.stride_tricks``); the sum runs left-to-right over ≤4
    float64 exactly like the SQL frame AVG, so the e6 encoding is
    FP-exact."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_id", "ts", "value"])

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        v = g["value"].to_numpy(np.float64)
        pad = np.concatenate([np.full(3, np.nan), v])
        win = np.lib.stride_tricks.sliding_window_view(pad, 4)
        cnt = (~np.isnan(win)).sum(axis=1)
        s = np.where(np.isnan(win), 0.0, win).cumsum(axis=1)[:, -1]
        avg = s / cnt
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "avg4_e6": np.floor(avg * 1000000.0 + 0.5).astype(np.int64),
        })

    return ds.groupby("user_id").map_groups(roll, batch_format="pandas")


ORACLE_EVENTS_ROLLING = """
SELECT event_id, user_id,
       CAST(FLOOR(AVG(value) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) * 1000000.0 + 0.5)
            AS BIGINT) AS avg4_e6
FROM events
"""


def customer_order_counts(sf_dir: str, num_buckets: int = 16):
    """LEFT OUTER join preserving zero-count rows: every customer with
    their order count.  Distributed shape: orders pre-aggregate to a
    narrow (custkey, n) table FIRST (the combiner), then a bucketed
    co-shuffle left-merge against the customer keys fills absent
    customers with 0 — no row-level orders data crosses the join."""
    counts = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"]) \
        .groupby("o_custkey").aggregate(Count(alias_name="n_orders")) \
        .map_batches(lambda t: t.rename_columns(["c_custkey", "n_orders"]),
                     batch_format="pyarrow")
    custs = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if "n_orders" not in df.columns:
            df["n_orders"] = np.int64(-1)          # customer marker
        df["_b"] = (df["c_custkey"].to_numpy(np.uint64)
                    % np.uint64(num_buckets)).astype(np.int32)
        return df

    def left_merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"c_custkey": pd.array([], dtype="int64"),
                                 "n_orders": pd.array([], dtype="int64")})
        cust = df.loc[df.n_orders < 0, ["c_custkey"]]
        cnt = df.loc[df.n_orders >= 0, ["c_custkey", "n_orders"]]
        out = cust.merge(cnt, on="c_custkey", how="left")
        out["n_orders"] = out["n_orders"].fillna(0).astype(np.int64)
        return out

    return custs.union(counts) \
        .map_batches(add_bucket, batch_format="pandas") \
        .groupby("_b").map_groups(left_merge, batch_format="pandas")


ORACLE_CUSTOMER_ORDER_COUNTS = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def order_ship_calendar(sf_dir: str):
    """FULL OUTER join of two per-day aggregates (order counts vs ship
    counts) over the shared calendar — ship dates trail order dates,
    so days exist on either side alone and both null-fill directions
    are exercised.  Ray-Data-first shape: a full outer join of two
    key-unique aggregates IS union + groupby-sum — each side
    pre-aggregates per batch (the combiner), the union'd narrow
    partials make ONE groupby shuffle, and ``COALESCE(x, 0)`` falls
    out of summing the zero-filled columns.  No row-level data crosses
    the exchange."""
    def day_counts(col: str, side: str):
        def fn(t: pa.Table) -> pa.Table:
            vc = pc.value_counts(
                pc.strftime(t[col].combine_chunks(), format="%Y-%m-%d"))
            days = vc.field("values")
            counts = pc.cast(vc.field("counts"), pa.int64())
            zeros = pa.array(np.zeros(len(days), np.int64), pa.int64())
            return pa.table({
                "cal_date": days,
                "n_orders": counts if side == "orders" else zeros,
                "n_ships": counts if side == "ships" else zeros,
            })
        return fn

    o = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"]) \
        .map_batches(day_counts("o_orderdate", "orders"),
                     batch_format="pyarrow")
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_shipdate"]) \
        .map_batches(day_counts("l_shipdate", "ships"),
                     batch_format="pyarrow")
    return o.union(li).groupby("cal_date").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("n_ships", alias_name="n_ships"))


ORACLE_ORDER_SHIP_CALENDAR = """
SELECT COALESCE(o.d, l.d) AS cal_date,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(l.n_ships, 0) AS n_ships
FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
             COUNT(*) AS n_orders FROM orders GROUP BY 1) o
FULL OUTER JOIN
     (SELECT strftime(l_shipdate, '%Y-%m-%d') AS d,
             COUNT(*) AS n_ships FROM lineitem GROUP BY 1) l
ON o.d = l.d
"""


# ---------------------------------------------------------------------------
# Training-data operators over documents / embeddings
# ---------------------------------------------------------------------------

def doc_token_counts(sf_dir: str):
    from sbb_ned_ray.stages.analysis import token_count_batch
    return _read_split(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(token_count_batch, batch_format="pyarrow")


ORACLE_DOC_TOKEN_COUNTS = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
           AS n_ws_tokens,
       len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_bpe_tokens
FROM documents
"""


def doc_quality(sf_dir: str):
    from sbb_ned_ray.stages.analysis import quality_batch

    def as_ints(t: pa.Table) -> pa.Table:
        q = quality_batch(t)
        return pa.table({
            "doc_id": q["doc_id"],
            "n_chars": q["n_chars"],
            "n_tokens": q["n_tokens"],
            "punct_ratio_e6": _e(q["punct_ratio"], 1e6),
            "mean_token_len_e6": _e(q["mean_token_len"], 1e6),
            "quality_e6": _e(q["quality"], 1e6),
        })

    return rd.read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"]) \
        .map_batches(as_ints, batch_format="pyarrow")


ORACLE_DOC_QUALITY = """
WITH feat AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '\\s', '', 'g')) AS n_nonws
  FROM documents
), r AS (
  SELECT doc_id, n_chars, n_tokens,
         CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0 END AS punct_ratio,
         CASE WHEN n_tokens > 0 THEN CAST(n_nonws AS DOUBLE)/n_tokens ELSE 0 END AS mean_token_len
  FROM feat
)
SELECT doc_id, n_chars, n_tokens,
       CAST(FLOOR(punct_ratio*1000000 + 0.5) AS BIGINT) AS punct_ratio_e6,
       CAST(FLOOR(mean_token_len*1000000 + 0.5) AS BIGINT) AS mean_token_len_e6,
       CAST(FLOOR(
         ROUND(LEAST(CAST(n_tokens AS DOUBLE), 100.0)/100.0
               * GREATEST(0.0, 1.0 - 4.0*punct_ratio)
               * (CASE WHEN mean_token_len BETWEEN 3.0 AND 12.0
                       THEN 1.0 ELSE 0.5 END), 6) * 1000000 + 0.5)
         AS BIGINT) AS quality_e6
FROM r
"""


def lang_id(sf_dir: str):
    from sbb_ned_ray.stages.analysis import LangIdStage
    return _read_split(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(LangIdStage, batch_format="pyarrow",
                     concurrency=(1, 8))


def _sql_stoplist(lang: str) -> str:
    from sbb_ned_ray.functions.textstats import STOPWORDS
    return ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang]))


ORACLE_LANG_ID = f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(regexp_extract_all(lower(text), '\\w+')) AS ts
  FROM documents
)
SELECT doc_id,
       CASE WHEN de_hits >= en_hits THEN 'de' ELSE 'en' END AS pred_lang,
       de_hits, en_hits
FROM (
  SELECT doc_id,
         CAST(len(list_filter(ts, x -> x IN ({_sql_stoplist('de')}))) AS BIGINT) AS de_hits,
         CAST(len(list_filter(ts, x -> x IN ({_sql_stoplist('en')}))) AS BIGINT) AS en_hits
  FROM toks)
"""


def exact_dedup_docs(sf_dir: str):
    from sbb_ned_ray.stages.dedup import exact_dedup
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    out = exact_dedup(ds).to_pandas()
    return out[["keep_id", "n_dups"]].sort_values("keep_id") \
        .reset_index(drop=True)


ORACLE_EXACT_DEDUP = """
SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY md5(text) ORDER BY keep_id
"""


def knn_cosine(sf_dir: str, k: int = 10, n_queries: int = 5):
    from sbb_ned_ray.stages.similarity import brute_force_topk
    emb = rd.read_parquet(_t(sf_dir, "embeddings"),
                          columns=["vec_id", "embedding"])
    qdf = rd.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]) \
        .filter(lambda r: r["vec_id"] < n_queries).to_pandas() \
        .sort_values("vec_id")
    queries = np.array([np.asarray(v, dtype=np.float64)
                        for v in qdf.embedding])
    out = brute_force_topk(emb, queries, qdf.vec_id.tolist(), k=k)
    return out[["query_id", "vec_id", "knn_rank"]]


ORACLE_KNN = """
SELECT q.vec_id AS query_id, d.vec_id AS vec_id,
       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                          ORDER BY list_cosine_similarity(q.embedding, d.embedding) DESC,
                                   d.vec_id) AS knn_rank
FROM embeddings q, embeddings d
WHERE q.vec_id < 5
QUALIFY knn_rank <= 10
ORDER BY query_id, knn_rank
"""


_IVF_LAYOUT_CACHE: dict[tuple, str] = {}


def _ivf_layout_for(sf_dir: str, n_centroids: int = 16,
                    pq_m: int | None = None) -> str:
    """Build-once (fingerprint-cached) IVF partitioned layout for the
    sf embeddings table — the index-build half of the IVF split; every
    IVF query below serves from it.  ``pq_m`` adds the PQ code column
    (a distinct fingerprint → distinct layout dir).  The resolved path
    is memoized in-process so repeated serves skip the fingerprint
    sample scan."""
    import os as _os

    from sbb_ned_ray.stages.similarity import build_ivf_layout
    key = (_os.path.normpath(sf_dir), n_centroids, pq_m)
    hit = _IVF_LAYOUT_CACHE.get(key)
    if hit and _os.path.exists(_os.path.join(hit, "_IVF_LAYOUT_COMPLETE")):
        return hit
    emb = rd.read_parquet(_t(sf_dir, "embeddings"),
                          columns=["vec_id", "embedding"])
    art = _os.path.join(
        "/tmp/sbb_ned_ray_artifacts",
        "ivf_" + _os.path.basename(_os.path.normpath(sf_dir)))
    path = build_ivf_layout(emb, art, n_centroids=n_centroids, pq_m=pq_m)
    _IVF_LAYOUT_CACHE[key] = path
    return path


def _knn_queries(sf_dir: str, n_queries: int):
    qdf = rd.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]) \
        .map_batches(lambda t: t.filter(
            pc.less(t["vec_id"], pa.scalar(n_queries))),
            batch_format="pyarrow").to_pandas() \
        .sort_values("vec_id")
    queries = np.array([np.asarray(v, dtype=np.float64)
                        for v in qdf.embedding])
    return queries, qdf.vec_id.tolist()


def knn_cosine_ivf(sf_dir: str, k: int = 10, n_queries: int = 5):
    """IVF variant served from the persisted centroid-partitioned
    layout: reads ONLY the nprobe probed partitions (approximate;
    rows-only check — documented)."""
    from sbb_ned_ray.stages.similarity import ivf_topk_indexed
    layout = _ivf_layout_for(sf_dir)
    queries, qids = _knn_queries(sf_dir, n_queries)
    return ivf_topk_indexed(layout, queries, qids, k=k)


def ivf_scan_fraction(sf_dir: str, k: int = 10,
                      nprobes: tuple = (2, 4, 8, 16)):
    """SELF-CHECKING (I/O shape, no SQL twin): proves the IVF layout
    prunes DATA, not just FLOPs — per nprobe, the bytes actually read
    from the partitioned layout over the total layout size, for ONE
    query (so the probed-partition union is exactly nprobe lists).
    Asserts the scanned fraction is monotone in nprobe,
    ≈ nprobe/n_centroids (within 2× slack for bucket skew), and
    exactly 1.0 when every list is probed.  This is the check that the
    round-3 full-corpus-scan defect stays dead."""
    from sbb_ned_ray.stages.similarity import ivf_topk_indexed
    layout = _ivf_layout_for(sf_dir)
    queries, qids = _knn_queries(sf_dir, 1)
    n_centroids = 16
    rows = []
    for nprobe in nprobes:
        _, st = ivf_topk_indexed(layout, queries, qids, k=k,
                                 nprobe=nprobe, return_stats=True)
        frac = st["scanned_bytes"] / max(1, st["total_bytes"])
        rows.append((int(nprobe), st["n_parts_scanned"],
                     st["n_parts_total"], round(frac, 4)))
    out = pd.DataFrame(rows, columns=["nprobe", "parts_scanned",
                                      "parts_total", "scan_fraction"])
    f = out["scan_fraction"].to_numpy()
    assert (np.diff(f) >= -1e-9).all(), f"not monotone:\n{out}"
    assert f[-1] == 1.0, f"full probe must scan everything:\n{out}"
    for nprobe, scanned, frac in zip(out["nprobe"], out["parts_scanned"], f):
        assert scanned <= nprobe, f"probed more lists than nprobe:\n{out}"
        assert frac <= 2.0 * nprobe / n_centroids + 1e-9, \
            f"scanned bytes not ∝ nprobe/n_centroids:\n{out}"
    return out


def simhash_recall(sf_dir: str, sample_docs: int = 256,
                   max_hamming: int = 3):
    """Self-checking gate for the SimHash pigeonhole bucketing: recall
    of :func:`simhash_dedup_docs` pairs against EXACT all-pairs Hamming
    ≤ ``max_hamming`` on a bounded deterministic doc sample.  The 4×16-
    bit block scheme GUARANTEES any such pair shares a block, so absent
    a hit on the per-bucket skew cap the recall must be exactly 1.0 —
    the assert proves the pigeonhole, not just approximates it.  No SQL
    oracle; the assert IS the check."""
    import pandas as pd
    import pyarrow.compute as pc

    from sbb_ned_ray.functions.hashing import hamming64, simhash64
    from sbb_ned_ray.functions.textstats import tokenize_ws

    found = simhash_dedup_docs(sf_dir)
    found_pairs = set(zip(found["id_a"], found["id_b"]))
    docs = rd.read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"]) \
        .map_batches(lambda t: t.filter(
            pc.less(t["doc_id"], pa.scalar(sample_docs))),
            batch_format="pyarrow").to_pandas()
    hs = {int(d): simhash64(tokenize_ws(t.lower()))
          for d, t in zip(docs["doc_id"], docs["text"])}
    ids = sorted(hs)
    n_gt = n_found = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if hamming64(hs[a], hs[b]) <= max_hamming:
                n_gt += 1
                n_found += (a, b) in found_pairs
    recall = n_found / n_gt if n_gt else 1.0
    out = pd.DataFrame([(len(ids), n_gt, n_found, recall)],
                       columns=["n_sample_docs", "n_gt_pairs",
                                "n_found", "recall"])
    assert recall == 1.0, f"pigeonhole violated:\n{out}"
    return out


def embedding_srp_recall(sf_dir: str, cos_threshold: float = 0.45,
                         n_projections: int = 3, n_tables: int = 16):
    """Self-checking gate for the banded-SRP embedding near-dup path:
    pair recall/precision of :func:`sbb_ned_ray.stages.dedup.
    embedding_dedup` against the EXACT brute-force pairs
    (:func:`embedding_neardup`).  Bits/tables are calibrated to the
    synthetic target-cosine range (0.45-0.51 → per-plane collision
    p ≈ 0.65, recall 1-(1-p³)¹⁶ ≈ 0.99); a near-identical-dup corpus
    would use more bits and fewer tables (see embedding_pairs
    docstring).  Precision must be exactly 1.0 — in-bucket verify is
    the exact cosine at the same threshold.  No SQL oracle; the asserts
    ARE the check."""
    import pandas as pd

    from sbb_ned_ray.stages.dedup import embedding_dedup

    gt = embedding_neardup(sf_dir, cos_threshold)
    gt_pairs = set(zip(gt["id_a"], gt["id_b"]))
    emb = _read_split(sf_dir, "embeddings", ["vec_id", "embedding"],
                      nblocks=8)
    found = embedding_dedup(emb, cos_threshold=cos_threshold,
                            n_projections=n_projections,
                            n_tables=n_tables)
    f_pairs = set(zip(found["id_a"], found["id_b"]))
    n_hit = len(f_pairs & gt_pairs)
    recall = n_hit / len(gt_pairs) if gt_pairs else 1.0
    precision = n_hit / len(f_pairs) if f_pairs else 1.0
    out = pd.DataFrame([(len(gt_pairs), len(f_pairs), n_hit,
                         round(recall, 4), round(precision, 4))],
                       columns=["n_gt_pairs", "n_found", "n_hit",
                                "recall", "precision"])
    assert precision == 1.0, f"exact verify must not false-positive:\n{out}"
    assert recall >= 0.85, f"banded-SRP recall collapsed:\n{out}"
    return out


def knn_ivf_recall(sf_dir: str, k: int = 10, n_queries: int = 5,
                   nprobes: tuple = (2, 4, 8, 16)):
    """Self-checking quality gate for the IVF approximation: recall@k
    vs the exact brute-force top-k, swept over ``nprobe`` — the curve a
    real deployment tunes on (reference Annoy exposes the same trade-off
    through SEARCH_K).  Asserts recall is monotone in nprobe and exact
    at nprobe = n_centroids (probing every list IS brute force).  The
    synthetic embeddings are near-isotropic (little cluster structure),
    so mid-curve recall is intrinsically modest — the point of this
    query is that the trade-off is MEASURED, not guessed.  No SQL
    oracle: the quantity under test is the approximation itself."""
    import pandas as pd

    from sbb_ned_ray.stages.similarity import ivf_topk_indexed

    exact = knn_cosine(sf_dir, k=k, n_queries=n_queries)
    by_q = {int(q): set(g["vec_id"]) for q, g in exact.groupby("query_id")}

    layout = _ivf_layout_for(sf_dir)
    queries, qids = _knn_queries(sf_dir, n_queries)

    rows = []
    for nprobe in nprobes:
        approx = ivf_topk_indexed(layout, queries, qids, k=k,
                                  nprobe=nprobe)
        recs = [len(by_q[q] & set(g["vec_id"])) / max(1, len(by_q[q]))
                for q, g in approx.groupby("query_id")]
        rows.append((int(nprobe), k,
                     round(float(np.mean(recs)) if recs else 0.0, 4)))
    out = pd.DataFrame(rows, columns=["nprobe", "k", "mean_recall_at_k"])
    r = out["mean_recall_at_k"].to_numpy()
    assert (np.diff(r) >= -1e-9).all(), f"recall not monotone:\n{out}"
    assert r[-1] == 1.0, f"nprobe=n_centroids must be exact:\n{out}"
    return out


def knn_pq_recall(sf_dir: str, k: int = 10, n_queries: int = 5,
                  m: int = 8, ks: int = 256):
    """Self-checking quality gate for product-quantized ANN serving
    (Jégou et al. 2011): recall@k of the PQ ADC-shortlist + exact
    re-rank path vs brute force, plus the measured storage compression
    (m code bytes vs 4·d float bytes per vector — the reason PQ exists
    at 100 TB).  Asserts recall@k >= 0.9: the exact re-rank means loss
    can only come from a true neighbor missing its batch's ADC
    shortlist.  No SQL oracle: the quantity under test is the
    approximation itself."""
    import pandas as pd

    from sbb_ned_ray.stages.similarity import pq_topk

    exact = knn_cosine(sf_dir, k=k, n_queries=n_queries)
    by_q = {int(q): set(g["vec_id"]) for q, g in exact.groupby("query_id")}
    queries, qids = _knn_queries(sf_dir, n_queries)
    d = queries.shape[1]

    emb = _read_split(sf_dir, "embeddings",
                      ["vec_id", "embedding"], nblocks=8).materialize()
    approx = pq_topk(emb, queries, qids, k=k, m=m, ks=ks)
    recs = [len(by_q[q] & set(g["vec_id"])) / max(1, len(by_q[q]))
            for q, g in approx.groupby("query_id")]
    mean_rec = float(np.mean(recs)) if recs else 0.0
    assert mean_rec >= 0.9, f"PQ recall@{k} too low: {mean_rec}"
    return pd.DataFrame({
        "k": [k], "m": [m], "ks": [ks],
        "mean_recall_at_k_e4": [int(mean_rec * 1e4 + 0.5)],
        "code_bytes_per_vec": [m],
        "raw_bytes_per_vec": [4 * d],
        "compression_x_e2": [int(4 * d / m * 100 + 0.5)],
    })


def semantic_dedup_recall(sf_dir: str, eps: float = 0.45,
                          ks: tuple = (1, 4, 8)):
    """Self-checking gate for SemDeDup semantic dedup (Abbas et al.
    2023): the k-means-bucketed within-cluster pruning vs the EXACT
    all-pairs cosine baseline (``embedding_neardup``, itself
    oracle-checked).  At n_clusters=1 the operator IS the exact
    baseline, so its duplicate-group partition must EQUAL the
    connected components of the exact eps-pair graph — asserted
    exactly.  At k>1 the measured recall is the operator's cost/recall
    trade-off (clusters prune O(n²) → O(n²/k); cross-cluster pairs are
    invisible by design) — reported, not asserted, except that every
    multi-member group keeps exactly one representative.  No SQL
    oracle: the quantity under test is the approximation."""
    import pandas as pd

    from sbb_ned_ray.stages.dedup import semantic_dedup

    from sbb_ned_ray.stages.cluster import driver_union_find

    gt = embedding_neardup(sf_dir, eps)
    gt_pairs = set(zip(gt["id_a"], gt["id_b"]))
    gt_comp: dict[int, list] = {}
    for node, rep in driver_union_find(sorted(gt_pairs)).items():
        gt_comp.setdefault(rep, []).append(node)
    gt_partition = {frozenset(v) for v in gt_comp.values() if len(v) > 1}

    emb = _read_split(sf_dir, "embeddings",
                      ["vec_id", "embedding"], nblocks=8).materialize()
    n_rows = emb.count()
    rows = []
    for k in ks:
        # cap must clear the whole corpus: at k=1 EVERY row is one
        # cluster and a hit on the default skew cap would fail the
        # exact-partition assert spuriously
        out = semantic_dedup(emb, eps=eps, n_clusters=int(k),
                             max_cluster_rows=int(n_rows))
        groups = {g: sorted(s["vec_id"])
                  for g, s in out.groupby("dup_group") if len(s) > 1}
        for g, s in out.groupby("dup_group"):
            kept = int(s["keep"].sum())
            assert kept == 1, \
                f"group {g} kept {kept} of {len(s)} members (k={k})"
        found = {(a, b) for ids in groups.values()
                 for i, a in enumerate(ids) for b in ids[i + 1:]}
        hit = len(found & gt_pairs)
        recall = hit / len(gt_pairs) if gt_pairs else 1.0
        if k == 1:
            partition = {frozenset(v) for v in groups.values()}
            assert partition == gt_partition, \
                "k=1 must reproduce the exact eps-component partition"
            assert recall == 1.0
        rows.append((int(k), int(recall * 1e4 + 0.5),
                     int(out["keep"].sum()), len(out)))
    return pd.DataFrame(rows, columns=["n_clusters", "recall_e4",
                                       "n_kept", "n_rows"])


def knn_ivfpq_recall(sf_dir: str, k: int = 10, n_queries: int = 5,
                     m: int = 8, nprobes: tuple = (4, 8, 16)):
    """Self-checking quality gate for the combined IVFADC path
    (centroid-partitioned layout + PQ codes, Jégou et al. 2011):
    recall@k vs exact brute force swept over nprobe, PLUS the measured
    I/O split — the ADC pass reads only (id, list_id, pq_code) from
    the probed partitions, never the float vectors, and the assert
    checks the compressed bytes it scanned are strictly below the
    probed partitions' vector-column bytes.  Recall must be
    non-decreasing in nprobe and ≥ 0.9 at full probe (the exact
    re-rank means residual loss only comes from ADC-shortlist misses).
    No SQL oracle: the quantity under test is the approximation and
    the I/O shape."""
    import pandas as pd

    from sbb_ned_ray.stages.similarity import ivf_pq_topk_indexed

    exact = knn_cosine(sf_dir, k=k, n_queries=n_queries)
    by_q = {int(q): set(g["vec_id"]) for q, g in exact.groupby("query_id")}
    layout = _ivf_layout_for(sf_dir, pq_m=m)
    queries, qids = _knn_queries(sf_dir, n_queries)

    rows = []
    for nprobe in nprobes:
        approx, st = ivf_pq_topk_indexed(layout, queries, qids, k=k,
                                         nprobe=nprobe, return_stats=True)
        recs = [len(by_q[q] & set(g["vec_id"])) / max(1, len(by_q[q]))
                for q, g in approx.groupby("query_id")]
        assert st["adc_scanned_bytes"] < st["vec_probe_bytes"], \
            f"ADC pass must scan less than the probed vectors: {st}"
        rows.append((int(nprobe),
                     round(float(np.mean(recs)) if recs else 0.0, 4),
                     st["adc_scanned_bytes"], st["vec_probe_bytes"],
                     st["n_shortlist"]))
    out = pd.DataFrame(rows, columns=["nprobe", "mean_recall_at_k",
                                      "adc_bytes", "vec_probe_bytes",
                                      "n_shortlist"])
    r = out["mean_recall_at_k"].to_numpy()
    # near-monotone: a batch-boundary shift when more partitions enter
    # the read can re-split a list's per-batch ADC shortlist, so allow
    # a 2-point wiggle (the trend, not each step, is the contract)
    assert (np.diff(r) >= -0.02 - 1e-9).all(), \
        f"recall not monotone in nprobe:\n{out}"
    assert r[-1] >= 0.9, f"full-probe IVFADC recall too low:\n{out}"
    return out


def minhash_dedup_docs(sf_dir: str):
    from sbb_ned_ray.stages.dedup import minhash_lsh_dedup
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_dedup(ds, jaccard_threshold=0.7)


def minhash_lsh_recall(sf_dir: str, sample_docs: int = 256,
                       jaccard_threshold: float = 0.7, ngram: int = 5):
    """Self-checking quality gate for the banded-LSH dedup: pair-level
    recall against EXACT char-n-gram Jaccard ground truth on a bounded
    deterministic sample (all pairs among the first ``sample_docs``
    documents — O(1) per corpus, so the check costs the same at any
    scale).  A ground-truth pair counts as found when the LSH clusters
    co-assign its documents (transitive closure can only merge more).
    No SQL oracle; the assert IS the check."""
    import pandas as pd
    import pyarrow.compute as pc

    from sbb_ned_ray.functions.hashing import char_ngrams

    clusters = minhash_dedup_docs(sf_dir)
    cid = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    docs = rd.read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"]) \
        .map_batches(lambda t: t.filter(
            pc.less(t["doc_id"], pa.scalar(sample_docs))),
            batch_format="pyarrow").to_pandas()
    # same shingle definition as the signer (dedup.minhash_signatures)
    grams = {int(d): set(char_ngrams(t.lower(), ngram))
             for d, t in zip(docs["doc_id"], docs["text"])}
    ids = sorted(grams)
    n_gt = n_found = 0
    for i, a in enumerate(ids):
        ga = grams[a]
        for b in ids[i + 1:]:
            gb = grams[b]
            union = len(ga | gb)
            if union == 0 or len(ga & gb) / union < jaccard_threshold:
                continue
            n_gt += 1
            if a in cid and b in cid and cid[a] == cid[b]:
                n_found += 1
    recall = n_found / n_gt if n_gt else 1.0
    out = pd.DataFrame([(len(ids), n_gt, n_found, recall)],
                       columns=["n_sample_docs", "n_gt_pairs",
                                "n_found", "recall"])
    assert recall >= 0.9, f"LSH recall collapsed:\n{out}"
    return out


def minhash_incremental_dedup(sf_dir: str, delta_mod: int = 7,
                              jaccard_threshold: float = 0.7):
    """Self-checking INCREMENTAL dedup — the daily-crawl shape: the
    corpus index (full signatures + band rows partitioned by
    ``band_key % num_buckets``) is built once over docs with
    ``doc_id % delta_mod != 0``; the remaining docs arrive as the
    DELTA and dedup against the index WITHOUT re-signing or rescanning
    the corpus (band-bucket partition probe + id-pushdown signature
    fetch).  The gate: the incremental verified pair set must EQUAL
    the batch run's verified pairs restricted to pairs touching a
    delta doc (pair caps disabled on both paths so the comparison is
    exact).  The returned row carries the parity bit plus the I/O
    stats that evidence the ∝-delta cost (corpus signatures fetched ≪
    corpus size).  No SQL oracle; the assert IS the check."""
    from sbb_ned_ray.stages.dedup import (
        minhash_dedup_incremental,
        minhash_verified_pairs,
        save_minhash_index,
    )

    docs = _read_split(sf_dir, "documents", ["doc_id", "text"])

    def _side(keep_delta: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % delta_mod == 0) == keep_delta
            return t.filter(pa.array(m))
        return fn

    corpus = docs.map_batches(_side(False), batch_format="pyarrow")
    delta = docs.map_batches(_side(True), batch_format="pyarrow")
    n_corpus = corpus.count()

    big = 10 ** 9       # disable skew caps: exact parity needs them off
    idx = save_minhash_index(corpus, "/tmp/sbb_ned_ray_artifacts/mhidx")
    inc = minhash_dedup_incremental(idx, delta,
                                    jaccard_threshold=jaccard_threshold,
                                    max_pairs_per_bucket=big)
    full = minhash_verified_pairs(docs, jaccard_threshold=jaccard_threshold,
                                  max_pairs_per_bucket=big)
    touching = full[(full["id_a"] % delta_mod == 0)
                    | (full["id_b"] % delta_mod == 0)]
    ref_set = {tuple(sorted(p)) for p in
               zip(touching["id_a"], touching["id_b"])}
    inc_set = {tuple(sorted(p)) for p in
               zip(inc["pairs"]["id_a"], inc["pairs"]["id_b"])}
    assert inc_set == ref_set, (
        f"incremental != batch pairs touching delta: "
        f"only_inc={sorted(inc_set - ref_set)[:5]} "
        f"only_ref={sorted(ref_set - inc_set)[:5]}")
    st = inc["stats"]
    if n_corpus >= 100:
        # the pushdown fetch must touch a strict subset of the corpus
        assert st["corpus_sigs_fetched"] < n_corpus, st
    return pd.DataFrame([(
        n_corpus, st["n_delta"], st["n_pairs"], 1,
        st["buckets_read"], st["buckets_total"],
        st["corpus_sigs_fetched"], len(inc["clusters"]))],
        columns=["n_corpus", "n_delta", "n_pairs", "parity",
                 "buckets_read", "buckets_total", "corpus_sigs_fetched",
                 "n_cluster_rows"])


def minhash_dedup_ds_contract(sf_dir: str):
    """SELF-CHECKING 100-TB output contract for the Dataset-returning
    dedup variant: ``minhash_lsh_dedup_ds`` (distributed verify +
    label-propagation components end to end — nothing collects on the
    driver) is consumed the way a corpus job would, ``write_parquet``
    then read back, and must equal the driver-DataFrame wrapper's
    clusters exactly.  No SQL oracle; the assert IS the check."""
    import tempfile

    import pyarrow.parquet as pq

    from sbb_ned_ray.stages.dedup import minhash_lsh_dedup, \
        minhash_lsh_dedup_ds

    ds = _read_split(sf_dir, "documents", ["doc_id", "text"]) \
        .materialize()
    want = minhash_lsh_dedup(ds, jaccard_threshold=0.7) \
        .sort_values("doc_id").reset_index(drop=True)
    out_dir = tempfile.mkdtemp(prefix="mh_ds_contract_")
    minhash_lsh_dedup_ds(ds, jaccard_threshold=0.7).write_parquet(out_dir)
    got = pq.read_table(out_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "cluster_id": "int64"})
    assert len(got) == len(want) and len(want) > 0, (len(got), len(want))
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["cluster_id"].to_numpy()
            == want["cluster_id"].to_numpy()).all()
    return pd.DataFrame([(len(got), int(got["cluster_id"].nunique()), 1)],
                        columns=["n_rows", "n_clusters", "parity"])


def simhash_dedup_docs(sf_dir: str):
    from sbb_ned_ray.stages.dedup import simhash_dedup
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    return simhash_dedup(ds, max_hamming=3)


def docs_perplexity_buckets(sf_dir: str):
    """CCNet-style perplexity quality bucketing (Wenzek et al. 2020):
    train a bounded add-k bigram LM on the corpus (narrow count
    shuffles, capped broadcast tables), score every doc's mean bigram
    NLL, split each language into head/middle/tail by EXACT tercile
    cutoffs (distributed value-counts histogram, rank rule on the
    driver's per-group cumulative counts).  Output: per (lang, bucket)
    doc counts + mean NLL.  Self-checks (the gate, driver-verified
    while the corpus fits — bounded to ≤100k docs): the distributed
    cutoffs and assignment equal a driver recomputation from raw
    scores, and bucket mean NLL is monotone head ≤ middle ≤ tail per
    lang.  No SQL oracle (the LM fit is not SQL-expressible); the
    asserts ARE the check."""
    import math

    from sbb_ned_ray.stages.analysis import (
        perplexity_buckets,
        perplexity_tercile_cutoffs,
        score_perplexity,
        train_bigram_lm,
    )

    docs = _read_split(sf_dir, "documents", ["doc_id", "text", "lang"])
    lm = train_bigram_lm(docs)
    scored = score_perplexity(docs, lm).materialize()
    cuts = perplexity_tercile_cutoffs(scored)
    bucketed = perplexity_buckets(scored, cuts).materialize()

    summary = bucketed.groupby(["lang", "ppl_bucket"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("nll_e6", alias_name="sum_nll_e6")).to_pandas()
    summary["mean_nll_e6"] = (summary["sum_nll_e6"]
                              // summary["n_docs"]).astype("int64")
    summary = summary.drop(columns=["sum_nll_e6"]) \
        .sort_values(["lang", "ppl_bucket"]).reset_index(drop=True)

    n_total = int(summary["n_docs"].sum())
    if n_total <= 100_000:
        df = bucketed.to_pandas()
        for lang, sub in df.groupby("lang"):
            v = np.sort(sub["nll_e6"].to_numpy(np.int64))
            n = len(v)
            q1, q2 = int(v[math.ceil(n / 3) - 1]), \
                int(v[math.ceil(2 * n / 3) - 1])
            assert cuts[str(lang)] == (q1, q2), \
                (lang, cuts[str(lang)], (q1, q2))
            got = sub["ppl_bucket"].to_numpy()
            want = np.where(sub["nll_e6"] <= q1, "head",
                            np.where(sub["nll_e6"] <= q2, "middle",
                                     "tail"))
            assert (got == want).all(), f"bucket rule mismatch for {lang}"
            means = [sub.loc[got == b, "nll_e6"].mean()
                     for b in ("head", "middle", "tail")
                     if (got == b).any()]
            assert all(means[i] <= means[i + 1] + 1e-9
                       for i in range(len(means) - 1)), (lang, means)
    return summary


def doc_fingerprints(sf_dir: str):
    """Document fingerprinting; oracle compares the md5 twin column
    (blake2b content_hash and the winnowing fingerprint list are not
    DuckDB-expressible — both are unit-tested instead)."""
    from sbb_ned_ray.stages.analysis import fingerprint_batch
    return rd.read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"]) \
        .map_batches(fingerprint_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "content_md5"])


ORACLE_DOC_FINGERPRINTS = \
    "SELECT doc_id, md5(text) AS content_md5 FROM documents"


def embedding_neardup(sf_dir: str, cos_threshold: float = 0.45):
    """Embedding-cosine near-dup pairs, EXACT: blocked matmul of each
    batch against the broadcast full unit matrix (the brute-force
    baseline; the LSH-bucketed scale path is stages/dedup.embedding_dedup).
    Threshold calibrated to the synthetic embeddings (max off-diag
    cosine ≈ 0.51)."""
    emb = rd.read_parquet(_t(sf_dir, "embeddings"),
                          columns=["vec_id", "embedding"])
    full = emb.to_pandas().sort_values("vec_id")
    ids = full.vec_id.to_numpy()
    M = np.array([np.asarray(v, dtype=np.float64) for v in full.embedding])
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    ref = ray.put((ids, M))

    class Block:
        def __init__(self, r):
            self.ids, self.M = ray.get(r) if isinstance(r, ray.ObjectRef) \
                else r

        def __call__(self, t: pa.Table) -> pa.Table:
            bids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
            B = np.array([np.asarray(v, dtype=np.float64)
                          for v in t["embedding"].to_pylist()])
            B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-300)
            cos = B @ self.M.T
            ii, jj = np.nonzero(cos >= cos_threshold)
            keep = bids[ii] < self.ids[jj]     # upper triangle only
            ii, jj = ii[keep], jj[keep]
            return pa.table({
                "id_a": pa.array(bids[ii], pa.int64()),
                "id_b": pa.array(self.ids[jj], pa.int64()),
                "cos_e6": pa.array(
                    np.floor(cos[ii, jj] * 1e6 + 0.5).astype(np.int64),
                    pa.int64()),
            })

    out = emb.map_batches(Block, fn_constructor_args=(ref,),
                          batch_format="pyarrow",
                          concurrency=(1, 4)).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


ORACLE_EMBEDDING_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(FLOOR(list_cosine_similarity(
           a.embedding::DOUBLE[], b.embedding::DOUBLE[])*1000000 + 0.5)
           AS BIGINT) AS cos_e6
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= 0.45
ORDER BY id_a, id_b
"""


def ngram_jaccard_docs(sf_dir: str, n: int = 4, query_doc: int = 0):
    """char-n-gram Jaccard of every document against a query document
    (the dedup verify kernel as a first-class scoring op): query n-gram
    set broadcast once, per-batch set ops."""
    docs = rd.read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"])

    def grams(s: str) -> frozenset:
        # plain sliding n-grams, matching the SQL oracle exactly (the
        # MinHash stages use the padded variant in functions.hashing)
        s = s.lower()
        return frozenset(s[i:i + n] for i in range(max(0, len(s) - n + 1)))

    qtext = docs.filter(lambda r: r["doc_id"] == query_doc) \
        .to_pandas().text.iloc[0]
    qref = ray.put(grams(qtext))

    class Jac:
        def __init__(self, r):
            self.q = ray.get(r) if isinstance(r, ray.ObjectRef) else r

        def __call__(self, t: pa.Table) -> pa.Table:
            out = []
            for txt in t["text"].to_pylist():
                s = grams(txt)
                u = len(s | self.q)
                out.append(int(np.floor(1e6 * len(s & self.q) / u + 0.5))
                           if u else None)
            return pa.table({"doc_id": t["doc_id"],
                             "jaccard_e6": pa.array(out, pa.int64())})

    return docs.map_batches(Jac, fn_constructor_args=(qref,),
                            batch_format="pyarrow", concurrency=(1, 4))


ORACLE_NGRAM_JACCARD = """
WITH g AS (
  SELECT doc_id,
         list_distinct([substr(lower(text), i, 4)
                        FOR i IN range(1, greatest(1, length(text)-2))])
             AS ngrams
  FROM documents
), qd AS (SELECT ngrams AS qn FROM g WHERE doc_id = 0)
SELECT g.doc_id,
       CAST(FLOOR(1000000.0 * len(list_intersect(g.ngrams, qd.qn))
            / NULLIF(len(list_distinct(list_concat(g.ngrams, qd.qn))), 0)
            + 0.5) AS BIGINT) AS jaccard_e6
FROM g, qd
"""


def train_test_split_docs(sf_dir: str):
    """Deterministic md5-hash train/test split (reference
    ned-train-test-split, cli.py:748-773, made content-keyed)."""
    from sbb_ned_ray.stages.training import split_by_hash
    return rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"]) \
        .map_batches(split_by_hash, batch_format="pyarrow")


ORACLE_TRAIN_TEST_SPLIT = """
SELECT doc_id,
       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % 10 < 8
            THEN 'train' ELSE 'test' END AS split
FROM documents
"""


def ned_training_pairs(sf_dir: str):
    """Labeled good/bad training pairs (reference ned-pairing semantics;
    rows-only check — sampling is seeded per mention)."""
    from sbb_ned_ray.stages.training import training_pairs_ds
    pages_dir = pages_dir_for_sf(sf_dir)
    return training_pairs_ds(pages_dir, PipelineConfig()) \
        .select_columns(["mention_key", "candidate_title", "qid", "label",
                         "pair_no"])


def media_decode(sf_dir: str):
    """Multimodal plumbing: documents → synthetic binary media rows →
    decode/feature actor stage (deterministic fake decode; schema and
    batch sizing are the real thing).  The fake FEATURE vector (blake2b)
    stays unit-test-only, but the decode plumbing — id fan-through,
    media-type tagging, byte counting, and the content-addressable
    ``payload_md5`` fingerprint — is oracle-checked against DuckDB
    (md5 over the same UTF-8 payload bytes)."""
    from sbb_ned_ray.stages.multimodal import ImageDecodeStage

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = [txt.encode("utf-8") for txt in t["text"].to_pylist()]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(payloads, pa.binary()),
            "media_type": pa.array(
                ["image/png" if i % 2 == 0 else "audio/wav" for i in ids],
                pa.string()),
        })

    return rd.read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"]) \
        .map_batches(to_media, batch_format="pyarrow") \
        .map_batches(ImageDecodeStage, batch_format="pyarrow",
                     batch_size=32, concurrency=(1, 4)) \
        .select_columns(["media_id", "media_type", "n_bytes",
                         "payload_md5"])


ORACLE_MEDIA_DECODE = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END
           AS media_type,
       strlen(text) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""


def media_decode_ppm(sf_dir: str):
    """REAL image decode, oracle-checked on the pixels: deterministic
    P6/PPM images are synthesized from an arithmetic rule
    (pixel[y,x,c] = (id·31 + y·7 + x·3 + c·11) mod 256, size keyed off
    the id), ENCODED to real netpbm payloads, and the decode stage
    recovers width/height/mean brightness from the BYTES — while the
    oracle recomputes the same statistics from the rule in SQL.  A
    wrong header parse, stride, or channel order mismatches the hash."""
    from sbb_ned_ray.stages.multimodal import ImageDecodeStage, encode_ppm

    def to_ppm(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            w, h = 8 + i % 5, 6 + i % 3
            y, x, c = np.meshgrid(np.arange(h), np.arange(w),
                                  np.arange(3), indexing="ij")
            arr = ((i * 31 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint8)
            payloads.append(encode_ppm(arr))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/x-portable-pixmap"] * len(ids),
                                   pa.string()),
        })

    out = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"]) \
        .map_batches(to_ppm, batch_format="pyarrow") \
        .map_batches(ImageDecodeStage, batch_format="pyarrow",
                     batch_size=32, concurrency=(1, 4)) \
        .select_columns(["media_id", "meta_width", "meta_height",
                         "mean_px_e2"]).to_pandas()
    out.columns = ["media_id", "width", "height", "mean_px_e2"]
    out = out.astype({"width": "int64", "height": "int64"})
    return out.sort_values("media_id").reset_index(drop=True)


ORACLE_MEDIA_DECODE_PPM = """
SELECT d.doc_id AS media_id,
       CAST(8 + d.doc_id % 5 AS BIGINT) AS width,
       CAST(6 + d.doc_id % 3 AS BIGINT) AS height,
       CAST(FLOOR(AVG(CAST((d.doc_id*31 + y.y*7 + x.x*3 + c.c*11) % 256
                           AS DOUBLE))*100 + 0.5) AS BIGINT) AS mean_px_e2
FROM documents d
JOIN generate_series(0, 7) y(y) ON y.y < 6 + d.doc_id % 3
JOIN generate_series(0, 11) x(x) ON x.x < 8 + d.doc_id % 5
JOIN generate_series(0, 2) c(c) ON TRUE
GROUP BY d.doc_id
ORDER BY media_id
"""


def media_decode_png(sf_dir: str):
    """REAL PNG decode, oracle-checked on the pixels: the same
    arithmetic pixel rule as ``media_decode_ppm`` (so the SQL twin is
    shared shape), but ENCODED through the real PNG pipeline — zlib
    IDAT, CRC-verified chunks, and scanline filters cycling through
    all five types — and decoded back from the BYTES.  A wrong
    unfilter (Sub/Up/Average/Paeth), CRC walk, or stride mismatches
    the hash."""
    from sbb_ned_ray.stages.multimodal import ImageDecodeStage, encode_png

    def to_png(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            w, h = 8 + i % 5, 6 + i % 3
            y, x, c = np.meshgrid(np.arange(h), np.arange(w),
                                  np.arange(3), indexing="ij")
            arr = ((i * 31 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint8)
            payloads.append(encode_png(arr))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/png"] * len(ids), pa.string()),
        })

    out = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"]) \
        .map_batches(to_png, batch_format="pyarrow") \
        .map_batches(ImageDecodeStage, batch_format="pyarrow",
                     batch_size=32, concurrency=(1, 4)) \
        .select_columns(["media_id", "meta_width", "meta_height",
                         "mean_px_e2"]).to_pandas()
    out.columns = ["media_id", "width", "height", "mean_px_e2"]
    out = out.astype({"width": "int64", "height": "int64"})
    return out.sort_values("media_id").reset_index(drop=True)


def media_decode_wav(sf_dir: str):
    """REAL audio decode, oracle-checked on the samples: deterministic
    PCM waveforms (sample[t] = (id·13 + t·7) mod 2003 − 1001, length and
    rate keyed off the id) are ENCODED to real RIFF/WAVE payloads, and
    the decode stage recovers rate / sample count / duration / amplitude
    stats from the BYTES while the oracle recomputes them from the rule
    in SQL.  A wrong chunk walk, sample width, or endianness mismatches
    the hash."""
    from sbb_ned_ray.stages.multimodal import AudioDecodeStage, encode_wav

    def to_wav(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            n = 50 + i % 40
            rate = 8000 + (i % 3) * 4000
            tt = np.arange(n, dtype=np.int64)
            s = ((i * 13 + tt * 7) % 2003 - 1001).astype(np.int16)
            payloads.append(encode_wav(s, rate))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(payloads, pa.binary()),
        })

    out = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"]) \
        .map_batches(to_wav, batch_format="pyarrow") \
        .map_batches(AudioDecodeStage, batch_format="pyarrow",
                     batch_size=32, concurrency=(1, 4)).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


ORACLE_MEDIA_DECODE_WAV = """
SELECT d.doc_id AS media_id,
       CAST(8000 + (d.doc_id % 3) * 4000 AS BIGINT) AS rate,
       CAST(50 + d.doc_id % 40 AS BIGINT) AS n_samples,
       CAST((50 + d.doc_id % 40) * 1000
            // (8000 + (d.doc_id % 3) * 4000) AS BIGINT) AS duration_ms,
       CAST(FLOOR(AVG(CAST(ABS((d.doc_id*13 + t.t*7) % 2003 - 1001)
                           AS DOUBLE)) * 100 + 0.5) AS BIGINT)
           AS mean_abs_e2,
       CAST(MAX(ABS((d.doc_id*13 + t.t*7) % 2003 - 1001)) AS BIGINT)
           AS peak
FROM documents d
JOIN generate_series(0, 89) t(t) ON t.t < 50 + d.doc_id % 40
GROUP BY d.doc_id
ORDER BY media_id
"""


def media_phash_neardup(sf_dir: str, max_dist: int = 6):
    """SELF-CHECKING image near-duplicate detection over REAL decoded
    pixels: deterministic 32×32 block images are synthesized so that
    each group of 4 consecutive doc_ids shares a base 8×8 pattern
    (bits of splitmix64(group)) with variant v flipping v cells —
    planted near-dups at aHash Hamming ≤ 5 — while distinct groups are
    (assertedly) ≥ 2·max_dist+1 apart.  Half the payloads encode as
    PNG, half as PPM, so BOTH real decoders sit in the loop
    (:func:`sbb_ned_ray.stages.multimodal.phash_neardup_pairs`:
    actor-pool decode+hash, banded Hamming join, inline XOR verify).
    Asserts recall = 1.0 on the planted pairs and ZERO cross-group
    pairs; returns the one-row summary.  No DuckDB twin (pixel
    decoding is not SQL-expressible); the planted construction IS the
    ground truth."""
    from sbb_ned_ray.stages.multimodal import (encode_png, encode_ppm,
                                               phash_neardup_pairs)
    from sbb_ned_ray.stages.similarity import _splitmix64

    def group_bits(g: np.ndarray) -> np.ndarray:
        """(n_groups, 64) planted cell bits: splitmix64 per group,
        bit 0 forced 0 and bit 63 forced 1 so no pattern is uniform
        (a uniform image hashes to 0 regardless of bits)."""
        z = _splitmix64(g.astype(np.uint64))
        bits = ((z[:, None] >> np.arange(64, dtype=np.uint64)) &
                np.uint64(1)).astype(np.int64)
        bits[:, 0] = 0
        bits[:, 63] = 1
        return bits

    def flips(v: int) -> list:
        return [(v * 17 + j * 13) % 62 + 1 for j in range(v)]

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        bits = group_bits(np.array([i // 4 for i in ids], np.int64))
        payloads = []
        for row, i in enumerate(ids):
            b = bits[row].copy()
            for f in flips(i % 4):
                b[f] ^= 1
            cells = (b.reshape(8, 8) * 255).astype(np.uint8)
            img = np.repeat(np.repeat(cells, 4, axis=0), 4, axis=1)
            arr = np.stack([img, img, img], axis=2)
            payloads.append(encode_png(arr) if i % 2 == 0
                            else encode_ppm(arr))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(payloads, pa.binary())})

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    ids = sorted(docs.to_pandas()["doc_id"].astype(int))
    media = docs.map_batches(to_media, batch_format="pyarrow")
    pairs = phash_neardup_pairs(media, max_dist=max_dist) \
        .to_pandas()

    # ground truth from the construction
    from collections import defaultdict
    groups = defaultdict(list)
    for i in ids:
        groups[i // 4].append(i)
    planted = {(a, b) for g in groups.values()
               for ai, a in enumerate(g) for b in g[ai + 1:]}
    found = set(zip(pairs["id_a"].astype(int),
                    pairs["id_b"].astype(int)))

    # the construction's separation premise, checked not assumed:
    # min inter-group distance of the PLANTED VARIANT hashes must
    # exceed max_dist (n_groups² popcounts, driver-trivial)
    import itertools as _it
    variant_hashes = {}
    gb = group_bits(np.array(sorted(groups), np.int64))
    for gi, g in enumerate(sorted(groups)):
        for i in groups[g]:
            b = gb[gi].copy()
            for f in flips(i % 4):
                b[f] ^= 1
            variant_hashes[i] = int(np.sum(
                b.astype(np.uint64) << np.arange(64, dtype=np.uint64)))
    min_cross = 64
    hs = np.array([variant_hashes[i] for i in ids], np.uint64)
    gg = np.array([i // 4 for i in ids], np.int64)
    for a in range(len(ids)):
        x = hs[a] ^ hs[a + 1:]
        d = np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(axis=1)
        cross = gg[a + 1:] != gg[a]
        if cross.any():
            min_cross = min(min_cross, int(d[cross].min()))
    assert min_cross > max_dist, \
        f"fixture separation violated: min cross-group dist {min_cross}"
    assert planted <= found, \
        f"missed {len(planted - found)} planted near-dup pairs"
    cross_found = {p for p in found if p[0] // 4 != p[1] // 4}
    assert not cross_found, f"false cross-group pairs: {cross_found}"
    return pd.DataFrame([{
        "n_images": len(ids),
        "n_planted": len(planted),
        "n_found": len(found),
        "recall_e6": 1_000_000,
        "cross_group_pairs": 0,
        "min_cross_dist": int(min_cross)}])


def media_audio_neardup(sf_dir: str, max_dist: int = 6):
    """SELF-CHECKING audio near-duplicate detection over REAL decoded
    samples: deterministic PCM waveforms are synthesized so each group
    of 3 consecutive doc_ids shares a base signal with variant v
    zeroing v short in-frame spans — an energy-delta fingerprint flip
    bound of ≤ 2 bits per touched frame puts every within-group pair
    at Hamming ≤ 6 BY CONSTRUCTION — then encoded to real RIFF/WAVE
    and pushed through
    :func:`sbb_ned_ray.stages.multimodal.audio_neardup_pairs`
    (actor-pool decode + fingerprint, shared banded Hamming join).
    Asserts recall = 1.0 on planted pairs and zero cross-group pairs
    (the separation premise is CHECKED driver-side over the
    construction's fingerprints, not assumed).  No DuckDB twin (PCM
    container decode is not SQL-expressible)."""
    from sbb_ned_ray.stages.multimodal import (audio_fingerprint64,
                                               audio_neardup_pairs,
                                               encode_wav)

    from sbb_ned_ray.stages.similarity import _splitmix64

    def base_samples(g: int) -> np.ndarray:
        """390 samples = 65 equal 6-sample frames whose constant
        amplitudes follow a ±2 walk driven by splitmix64(g)'s bits —
        with equal frame lengths the energy comparisons E[i] > E[i+1]
        recover the walk direction EXACTLY, so the fingerprint equals
        the planted 64-bit pattern and group separation is the
        splitmix Hamming distance (asserted below, not assumed)."""
        z = int(_splitmix64(np.array([g], np.uint64))[0])
        bits = (z >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        steps = np.where(bits.astype(np.int64) == 1, -2, 2)
        amps = 164 + np.concatenate([[0], np.cumsum(steps)])
        return np.repeat(amps.astype(np.int64), 6)

    def variant(g: int, v: int) -> np.ndarray:
        s = base_samples(g).copy()
        for j in range(v):
            f = 10 * v + 3 + 7 * j         # distinct frames per variant
            s[f * 6:f * 6 + 3] = 0         # ≤ 2 bit flips per frame
        return s

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = [encode_wav(variant(i // 3, i % 3).astype(np.int16),
                               16000) for i in ids]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(payloads, pa.binary())})

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    ids = sorted(docs.to_pandas()["doc_id"].astype(int))
    media = docs.map_batches(to_media, batch_format="pyarrow")
    pairs = audio_neardup_pairs(media, max_dist=max_dist).to_pandas()
    found = set(zip(pairs["id_a"].astype(int),
                    pairs["id_b"].astype(int)))

    from collections import defaultdict
    groups = defaultdict(list)
    for i in ids:
        groups[i // 3].append(i)
    planted = {(a, b) for g in groups.values()
               for ai, a in enumerate(g) for b in g[ai + 1:]}

    fps = {i: audio_fingerprint64(variant(i // 3, i % 3)) for i in ids}
    hs = np.array([fps[i] for i in ids], np.uint64)
    gg = np.array([i // 3 for i in ids], np.int64)
    min_cross = 64
    for a in range(len(ids)):
        x = hs[a] ^ hs[a + 1:]
        d = np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(axis=1)
        cross = gg[a + 1:] != gg[a]
        if cross.any():
            min_cross = min(min_cross, int(d[cross].min()))
    assert min_cross > max_dist, \
        f"fixture separation violated: min cross-group dist {min_cross}"
    assert planted <= found, \
        f"missed {len(planted - found)} planted audio near-dup pairs"
    cross_found = {p for p in found if p[0] // 3 != p[1] // 3}
    assert not cross_found, f"false cross-group pairs: {cross_found}"
    return pd.DataFrame([{
        "n_clips": len(ids),
        "n_planted": len(planted),
        "n_found": len(found),
        "recall_e6": 1_000_000,
        "cross_group_pairs": 0,
        "min_cross_dist": int(min_cross)}])


def media_decode_jpeg(sf_dir: str):
    """REAL baseline-JPEG decode (pure-numpy T.81 codec): smooth
    deterministic RGB ramps (no mod-256 wrap, so the lossy error stays
    small) are ENCODED through the real pipeline — DCT, quantization,
    Huffman, with 4:2:0 subsampling and restart markers cycling by id
    — and the sniffing decode stage recovers the true geometry from
    the BYTES.  Dimensions are oracle-exact; the lossy pixel error is
    SELF-ASSERTED in-stage (mean abs ≤ 4, max ≤ 16 at q92) right
    after encode, so a broken Huffman table or IDCT fails loudly."""
    from sbb_ned_ray.stages.jpeg import decode_jpeg, encode_jpeg
    from sbb_ned_ray.stages.multimodal import ImageDecodeStage

    def to_jpeg(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            w, h = 16 + i % 9, 12 + i % 7
            y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            arr = np.stack([20 + i % 50 + y * 2 + x,
                            30 + i % 40 + x * 2 + y,
                            40 + i % 30 + y + x], -1).astype(np.uint8)
            p = encode_jpeg(arr, quality=92, subsample=bool(i % 2),
                            restart_interval=i % 3)
            got = decode_jpeg(p)
            err = np.abs(got.astype(np.int64) - arr.astype(np.int64))
            assert got.shape == arr.shape, (got.shape, arr.shape)
            assert err.mean() <= 4.0 and err.max() <= 16, \
                (i, err.mean(), err.max())
            payloads.append(p)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/jpeg"] * len(ids),
                                   pa.string()),
        })

    out = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"]) \
        .map_batches(to_jpeg, batch_format="pyarrow") \
        .map_batches(ImageDecodeStage, batch_format="pyarrow",
                     batch_size=32, concurrency=(1, 4)) \
        .select_columns(["media_id", "meta_width", "meta_height"]) \
        .to_pandas()
    out.columns = ["media_id", "width", "height"]
    out = out.astype({"width": "int64", "height": "int64"})
    assert (out["width"] > 0).all(), "JPEG sniff fell back to stub"
    return out.sort_values("media_id").reset_index(drop=True)


ORACLE_MEDIA_DECODE_JPEG = """
SELECT d.doc_id AS media_id,
       CAST(16 + d.doc_id % 9 AS BIGINT) AS width,
       CAST(12 + d.doc_id % 7 AS BIGINT) AS height
FROM documents d
ORDER BY media_id
"""


def parse_ner_mentions(sf_dir: str):
    """BIO-tag parsing of NER-tagged token streams (reference /parse,
    webapp/app.py:227-286) over a deterministic NER fixture derived from
    the gold mentions (rows-only check)."""
    import pyarrow.parquet as pq

    from sbb_ned_ray.stages.mentions import parse_ner_batch

    pages_dir = pages_dir_for_sf(sf_dir)
    gm = pq.read_table(f"{pages_dir}/mentions_gt.parquet").to_pandas()
    pages = rd.read_parquet(f"{pages_dir}/pages", columns=["url", "text"])
    spans = {}
    for r in gm.itertuples():
        spans.setdefault((r.url, r.sent_no), []).append(
            (r.tok_start, r.tok_end, r.type, r.qid))
    spans_ref = ray.put(spans)

    class ToNer:
        def __init__(self, ref):
            self.spans = ray.get(ref) if isinstance(ref, ray.ObjectRef) \
                else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            urls, sents, toks = [], [], []
            for url, text in zip(t["url"].to_pylist(),
                                 t["text"].to_pylist()):
                for sent_no, line in enumerate(text.split("\n")):
                    words = line.split(" ")
                    tags = ["O"] * len(words)
                    gts: list[str | None] = [None] * len(words)
                    for (a, b, etype, qid) in \
                            self.spans.get((url, sent_no), []):
                        for i in range(a, min(b, len(words))):
                            tags[i] = ("B-" if i == a else "I-") + etype
                            gts[i] = qid
                    urls.append(url)
                    sents.append(sent_no)
                    toks.append([{"word": w, "prediction": p, "gt": g}
                                 for w, p, g in zip(words, tags, gts)])
            return pa.table({
                "url": pa.array(urls, pa.string()),
                "sent_no": pa.array(sents, pa.int32()),
                "tokens": pa.array(toks),
            })

    return pages.map_batches(ToNer, fn_constructor_args=(spans_ref,),
                             batch_format="pyarrow",
                             concurrency=(1, 4)) \
        .map_batches(parse_ner_batch, batch_format="pyarrow") \
        .select_columns(["url", "mention_id", "sent_no", "tok_start",
                         "tok_end", "type"])


def _oracle_parse_ner(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """BIO round-trip oracle: the parse of tags synthesized from the gold
    spans must reproduce the gold spans exactly — the oracle reads the
    fixture's mentions_gt.parquet directly (normalized surface / span
    columns are not SQL-reconstructible and are excluded on both sides).
    The fixture path is deterministic (content-fingerprinted); callers of
    ``oracle_sql()`` materialize it first (see ``__ray_entry__``)."""
    import os as _os

    from sbb_ned_ray.fixtures.generator import spec_for_sf
    path = _os.path.join("/tmp/sbb_ned_ray_fixtures",
                         spec_for_sf(sf_dir).fingerprint(),
                         "mentions_gt.parquet")
    return (f"SELECT url, mention_id, sent_no, tok_start, tok_end, type "
            f"FROM read_parquet('{path}')")


# ---------------------------------------------------------------------------
# NED pipeline queries (synthetic pages scaled to the sf level;
# non-SQL-expressible → rows-only driver checks)
# ---------------------------------------------------------------------------

def clef_mentions(sf_dir: str):
    """CLEF-HIPE file-format loop (reference clef_hipe_2020/2022): the
    shared-task TSV is converted to the neat format (tag coarsening,
    control-char scrub, per-doc headers) and parsed into mention rows by
    the distributed BIO parser.  Oracle: the round trip must reproduce
    the gold mention spans exactly (same parquet oracle as
    parse_ner_mentions)."""
    import os

    from sbb_ned_ray.sources.clef import clef_to_neat, neat_tokens_table
    from sbb_ned_ray.stages.mentions import parse_ner_batch

    pages_dir = pages_dir_for_sf(sf_dir)
    neat = os.path.join("/tmp", "sbb_ned_ray_clef_neat_"
                        + os.path.basename(pages_dir) + ".tsv")
    clef_to_neat(os.path.join(pages_dir, "clef.tsv"), neat)
    toks = neat_tokens_table(neat)
    return rd.from_arrow(toks).repartition(16) \
        .map_batches(parse_ner_batch, batch_format="pyarrow") \
        .select_columns(["url", "mention_id", "sent_no", "tok_start",
                         "tok_end", "type"])


def ned_pair_features(sf_dir: str):
    """Sentence pairs → fixed-length cross-encoder input features
    (convert_examples_to_features semantics; rows-only check).  Runs the
    split-path pair builder over the synthetic pages then the CPU
    tokenizer stage."""
    from sbb_ned_ray.pipelines.ned import _pool_size
    from sbb_ned_ray.sources.pages import read_kb_table, read_pages
    from sbb_ned_ray.stages.candidates import generate_candidates
    from sbb_ned_ray.stages.extract import extracted_pages
    from sbb_ned_ray.stages.features import convert_pairs_to_features
    from sbb_ned_ray.stages.mentions import detect_mentions
    from sbb_ned_ray.stages.pairs import build_pairs
    from sbb_ned_ray.state.alias_index import build_alias_index

    cfg = PipelineConfig()
    pages_dir = pages_dir_for_sf(sf_dir)
    from sbb_ned_ray.sources.pages import read_redirects
    index_ref = ray.put(build_alias_index(
        read_kb_table(pages_dir), cfg,
        redirects=read_redirects(pages_dir)))
    conc = (1, 4)
    # bounded deterministic sample: the features are per-pair constant
    # work; 500 pages exercise the full stage chain without a 30s gate
    pages = extracted_pages(read_pages(pages_dir, columns=["url", "html"],
                                       override_num_blocks=16).limit(500))
    mentions = detect_mentions(pages, index_ref, concurrency=conc,
                               num_cpus=0.5)
    cands = generate_candidates(mentions, index_ref, cfg, concurrency=conc,
                                num_cpus=0.5)
    pairs = build_pairs(cands, index_ref, cfg, concurrency=conc,
                        num_cpus=0.5)
    feats = convert_pairs_to_features(pairs, cfg, concurrency=conc,
                                      num_cpus=0.5)
    return feats.select_columns(["url", "mention_id", "candidate_title",
                                 "qid", "pair_no"])


def ned_links_bert(sf_dir: str):
    """Flagship split-scorer path with the BERT cross-encoder adapter in
    the loop (numpy mini-model backend in this container — untrained, so
    rows-only: the check is that the model path runs end-to-end with the
    GPU-deployment wiring, not link quality).  Bounded input: the mini
    transformer is ~100× the stub's cost per pair."""
    import dataclasses

    from sbb_ned_ray.pipelines.ned import top_links
    from sbb_ned_ray.sources.pages import (
        read_kb_sentences,
        read_kb_table,
        read_pages,
        read_redirects,
    )
    from sbb_ned_ray.stages.bert_scorer import BertPairScorer
    from sbb_ned_ray.stages.candidates import generate_candidates
    from sbb_ned_ray.stages.decider import decide
    from sbb_ned_ray.stages.extract import extracted_pages
    from sbb_ned_ray.stages.mentions import detect_mentions
    from sbb_ned_ray.stages.pairs import build_pairs
    from sbb_ned_ray.stages.scorer import score_pairs
    from sbb_ned_ray.state.alias_index import build_alias_index

    cfg = dataclasses.replace(PipelineConfig(), max_seq_len=48)
    pages_dir = pages_dir_for_sf(sf_dir)
    index_ref = ray.put(build_alias_index(
        read_kb_table(pages_dir), cfg,
        sentences=read_kb_sentences(pages_dir),
        redirects=read_redirects(pages_dir)))
    conc = (1, 4)
    pages = extracted_pages(read_pages(
        pages_dir, columns=["url", "html"],
        override_num_blocks=16).limit(40))
    mentions = detect_mentions(pages, index_ref, concurrency=conc,
                               num_cpus=0.5)
    cands = generate_candidates(mentions, index_ref, cfg,
                                concurrency=conc, num_cpus=0.5)
    pairs = build_pairs(cands, index_ref, cfg, concurrency=conc,
                        num_cpus=0.5)
    scored = score_pairs(pairs, cfg, scorer_cls=BertPairScorer,
                         concurrency=(1, 8), num_cpus=0.5)
    links = top_links(decide(scored, cfg))
    return links.select_columns(["mention_key", "url", "mention_id",
                                 "surface", "candidate_title", "qid"])


_BERT_TRAINED_CACHE: dict = {}
_BERT_ART_CACHE: dict = {}


def _bert_trained_artifacts(train_dir: str, tspec):
    """Train-once cross-encoder artifacts shared by every
    trained-model scoreboard query (links, pairwise F1, ranked @k)."""
    from sbb_ned_ray.pipelines.train_bert import train_cross_encoder

    arts = _BERT_ART_CACHE.get((train_dir, tspec))
    if arts is None:
        arts = train_cross_encoder(train_dir, PipelineConfig(), tspec)
        _BERT_ART_CACHE[(train_dir, tspec)] = arts
    return arts


def _bert_trained_links(sf_dir: str):
    """Train (cached) + run the flagship with the TRAINED cross-encoder.

    Fixed training scale regardless of ``sf_dir``: the cross-encoder is
    a train-once artifact (the reference fine-tunes one model and serves
    every request with it, ``models/bert.py:342-480``); the scorecard
    fixture pair is the sf0.001 KB with page-seed-disjoint train/eval
    page streams, so no eval page or context is ever seen in training.
    Decode cost, not train cost, is what scales with corpus size."""
    import dataclasses

    from sbb_ned_ray.fixtures.generator import (
        materialize_fixture,
        spec_for_sf,
    )
    from sbb_ned_ray.pipelines.train_bert import (
        TrainSpec,
        run_ned_trained,
    )

    eval_spec = spec_for_sf("/root/testdata/sf0.001")
    train_dir = materialize_fixture(
        dataclasses.replace(eval_spec, page_seed=101))
    eval_dir = materialize_fixture(eval_spec)
    tspec = TrainSpec()
    cached = _BERT_TRAINED_CACHE.get((train_dir, eval_dir, tspec))
    if cached is not None:
        return cached, eval_dir
    arts = _bert_trained_artifacts(train_dir, tspec)
    links = run_ned_trained(eval_dir, arts, PipelineConfig(), tspec)
    # both scoreboard queries (links + f1) share one decode: the links
    # frame is small (one row per mention) and the fixture/spec key is
    # content-deterministic
    _BERT_TRAINED_CACHE[(train_dir, eval_dir, tspec)] = links
    return links, eval_dir


def ned_links_bert_trained(sf_dir: str):
    """Flagship links with the TRAINED numpy cross-encoder (stub scorer
    disabled; rows-only driver check — quality is asserted by
    ``ned_eval_f1_bert_trained``)."""
    links, _ = _bert_trained_links(sf_dir)
    return links[["mention_key", "url", "mention_id", "surface",
                  "candidate_title", "qid", "cluster_id"]]


def ned_eval_f1_bert_trained(sf_dir: str):
    """Pairwise-F1 scorecard row for the TRAINED-model path.
    SELF-CHECKING: asserts the VERDICT r2 quality gate — f1 >= 0.99
    with the model, not the stub, carrying the linking decision."""
    import pyarrow.parquet as pq

    from sbb_ned_ray.pipelines.ned import pairwise_f1

    links, eval_dir = _bert_trained_links(sf_dir)
    gt = pq.read_table(f"{eval_dir}/mention_pairs_gt.parquet")
    m = pairwise_f1(links, gt)
    assert m["f1"] >= 0.99, f"trained-model pairwise F1 {m['f1']} < 0.99"
    return pd.DataFrame([{
        "n_links": len(links), **{k: m[k] for k in
                                  ("tp", "fp", "fn", "tn")},
        "precision_e6": int(m["precision"] * 1e6 + 0.5),
        "recall_e6": int(m["recall"] * 1e6 + 0.5),
        "f1_e6": int(m["f1"] * 1e6 + 0.5),
    }])


def ned_eval_topk_bert_trained(sf_dir: str, ks: tuple = (1, 3, 5)):
    """SELF-CHECKING ranked @k metrics on the TRAINED-model path: the
    hipe-scorer micro/macro P/R/F1 @1/@3/@5 over the trained
    cross-encoder's FULL per-mention ranking (``ned_eval_topk`` is the
    stub-path twin; the reference's notebook grids consume exactly
    this regime, ``clef_hipe_2020.py:554-614``).  Asserts recall@k is
    monotone and @1 micro-F1 ≥ 0.95 — consistent with the ≥ 0.99
    pairwise gate the trained path already carries
    (``ned_eval_f1_bert_trained``)."""
    import dataclasses

    import pyarrow.parquet as pq

    from sbb_ned_ray.fixtures.generator import (
        materialize_fixture,
        spec_for_sf,
    )
    from sbb_ned_ray.pipelines.evalgrid import ranked_topk_metrics
    from sbb_ned_ray.pipelines.train_bert import (
        TrainSpec,
        run_ned_trained_ranked,
    )

    eval_spec = spec_for_sf("/root/testdata/sf0.001")
    train_dir = materialize_fixture(
        dataclasses.replace(eval_spec, page_seed=101))
    eval_dir = materialize_fixture(eval_spec)
    tspec = TrainSpec()
    arts = _bert_trained_artifacts(train_dir, tspec)
    ranked = run_ned_trained_ranked(eval_dir, arts, PipelineConfig(),
                                    tspec)
    gt = pq.read_table(f"{eval_dir}/mentions_gt.parquet").to_pandas()
    out = ranked_topk_metrics(ranked, gt, ks=ks)
    r = out["micro_r_e6"].to_numpy()
    assert (np.diff(r) >= 0).all(), f"recall@k not monotone:\n{out}"
    assert out["micro_f1_e6"].iloc[0] >= 950_000, \
        f"trained @1 micro-F1 inconsistent with the pairwise gate:\n{out}"
    return out


def ned_eval_grid(sf_dir: str):
    """Reference-style hyperparameter grid (Makefile.CLEF2022:224-258):
    pairwise F1 + ranked micro-F1 @1/@3 swept over max_dist x
    max_candidates x threshold on the sf0.001-scale fixture (rows-only;
    the grid SHAPE and determinism are the check — one decode per
    point, one shared broadcast index)."""
    from sbb_ned_ray.fixtures.generator import (
        materialize_fixture,
        spec_for_sf,
    )
    from sbb_ned_ray.pipelines.evalgrid import ned_eval_grid as grid_fn

    fixture = materialize_fixture(spec_for_sf("/root/testdata/sf0.001"))
    return grid_fn(fixture, PipelineConfig())


def ned_extract_pages(sf_dir: str):
    """html → text extraction (oracle-exact: byte-identical to the
    fixture's ``text`` column, the BASELINE.json input-hint invariant)."""
    from sbb_ned_ray.sources.pages import read_pages
    from sbb_ned_ray.stages.extract import extracted_pages
    pages_dir = pages_dir_for_sf(sf_dir)
    return extracted_pages(read_pages(
        pages_dir, columns=["url", "html"])).select_columns(["url", "text"])


def ned_mentions(sf_dir: str):
    """Gazetteer mention detection over extracted pages.  Oracle: the
    detected SPANS must equal the fixture's gold mentions exactly
    (url/mention_id/sent_no/tok_start/tok_end).  The ``type`` column is
    excluded from the oracle: ambiguity-family surfaces carry several
    entity types in the KB and the gazetteer reports the trie's type
    while the gold records the page-truth one."""
    from sbb_ned_ray.pipelines.ned import _pool_size
    from sbb_ned_ray.sources.pages import read_kb_table, read_pages
    from sbb_ned_ray.stages.extract import extracted_pages
    from sbb_ned_ray.stages.mentions import detect_mentions
    from sbb_ned_ray.state.alias_index import build_alias_index
    cfg = PipelineConfig()
    pages_dir = pages_dir_for_sf(sf_dir)
    from sbb_ned_ray.sources.pages import read_redirects
    index_ref = ray.put(build_alias_index(
        read_kb_table(pages_dir), cfg,
        redirects=read_redirects(pages_dir)))
    pages = extracted_pages(read_pages(pages_dir, columns=["url", "html"]))
    return detect_mentions(pages, index_ref, as_tasks=True) \
        .select_columns(["url", "mention_id", "sent_no", "tok_start",
                         "tok_end"])


def _oracle_ned_mentions(sf_dir: str = "/root/testdata/sf0.01") -> str:
    import os as _os

    from sbb_ned_ray.fixtures.generator import spec_for_sf
    path = _os.path.join("/tmp/sbb_ned_ray_fixtures",
                         spec_for_sf(sf_dir).fingerprint(),
                         "mentions_gt.parquet")
    return (f"SELECT url, mention_id, sent_no, tok_start, tok_end "
            f"FROM read_parquet('{path}')")


def _oracle_ned_extract_pages(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """The BASELINE.json byte-identical invariant as a DuckDB oracle:
    extract_text(html) must reproduce the fixture's ``text`` column
    exactly, so the oracle simply reads that column."""
    import os as _os

    from sbb_ned_ray.fixtures.generator import spec_for_sf
    path = _os.path.join("/tmp/sbb_ned_ray_fixtures",
                         spec_for_sf(sf_dir).fingerprint(),
                         "pages", "*.parquet")
    return f"SELECT url, text FROM read_parquet('{path}')"


def _oracle_ned_links(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Flagship end-to-end oracle: with the deterministic fixture every
    gold mention links to its gold qid (pairwise F1 = 1.0), the linked
    title is that qid's KB page, and ``cluster_id`` is the union-find
    representative ``'m:' + min(mention_key)`` over the qid's mention
    set (``cluster_links`` degree-1 fast path; mention_key =
    ``url + chr(31) + mention_id``)."""
    import os as _os

    from sbb_ned_ray.fixtures.generator import spec_for_sf
    d = _os.path.join("/tmp/sbb_ned_ray_fixtures",
                      spec_for_sf(sf_dir).fingerprint())
    return f"""
SELECT m.url, m.mention_id, m.surface,
       k.page_title AS candidate_title, m.qid,
       'm:' || MIN(m.url || chr(31) || m.mention_id)
           OVER (PARTITION BY m.qid) AS cluster_id
FROM read_parquet('{d}/mentions_gt.parquet') m
JOIN read_parquet('{d}/kb_entities.parquet') k USING (qid)
"""


def ned_links(sf_dir: str):
    """Flagship NED links (oracle-exact: every gold mention must link
    to its gold qid/KB title with the deterministic cluster_id — see
    :func:`_oracle_ned_links`)."""
    from sbb_ned_ray.pipelines.ned import run_ned
    pages_dir = pages_dir_for_sf(sf_dir)
    df = run_ned(pages_dir, PipelineConfig())
    return df[["url", "mention_id", "surface", "candidate_title", "qid",
               "cluster_id"]].sort_values(["url", "mention_id"]) \
        .reset_index(drop=True)


def ned_links_auto(sf_dir: str):
    """Flagship links through the SINGLE production entry point
    (:func:`run_ned_auto` — measures the KB footprint against the
    object store and dispatches broadcast vs co-shuffle blocking).
    Oracle-exact like ``ned_links``: the selection must not change the
    links.  Also asserts the selector itself picked broadcast here
    (the fixture KB fits) and flips to shuffle at a zero budget."""
    from sbb_ned_ray.pipelines.ned import run_ned_auto, select_ned_path
    pages_dir = pages_dir_for_sf(sf_dir)
    path, _ = select_ned_path(pages_dir)
    assert path == "broadcast", path
    forced, _ = select_ned_path(pages_dir, broadcast_fraction=0.0)
    assert forced == "shuffle", forced
    df = run_ned_auto(pages_dir, PipelineConfig())
    return df[["url", "mention_id", "surface", "candidate_title", "qid",
               "cluster_id"]].sort_values(["url", "mention_id"]) \
        .reset_index(drop=True)


def ned_links_shuffle_kb(sf_dir: str):
    """Flagship links via the LARGE-KB co-shuffle path (blocking-key
    hash joins + salted attach + co-shuffle sentence-KB evidence join —
    zero broadcast of KB-sized state).  Self-checking: asserts row-level
    equality with the broadcast flagship before returning (rows-only
    driver check; the equality assert is the real gate)."""
    from sbb_ned_ray.pipelines.ned import run_ned, run_ned_shuffle_kb

    pages_dir = pages_dir_for_sf(sf_dir)
    cfg = PipelineConfig()
    a = run_ned(pages_dir, cfg)
    b = run_ned_shuffle_kb(pages_dir, cfg, num_partitions=8,
                           evidence="shuffle")
    cols = ["url", "mention_id", "qid", "candidate_title"]
    aa = a[cols].sort_values(cols[:2]).reset_index(drop=True)
    bb = b[cols].sort_values(cols[:2]).reset_index(drop=True)
    assert aa.equals(bb), "shuffle-KB path diverged from broadcast"
    return bb


def ned_decider_cv(sf_dir: str):
    """Decider-model training job (reference models/decider.py:178-226):
    GroupKFold ROC-AUC per fold over the labeled candidate partials
    (rows-only — model training is not SQL-expressible)."""
    from sbb_ned_ray.stages.training import train_decider_job
    pages_dir = pages_dir_for_sf(sf_dir)
    _, scores, n_rows = train_decider_job(pages_dir, PipelineConfig())
    return pd.DataFrame({
        "fold": np.arange(len(scores), dtype=np.int64),
        "roc_auc_e6": [int(s * 1e6 + 0.5) for s in scores],
        "n_rows": np.int64(n_rows),
    })


def ned_eval_f1(sf_dir: str):
    """Pairwise-F1 scorecard row (rows-only; the e2e quality gate)."""
    import pyarrow.parquet as pq
    from sbb_ned_ray.pipelines.ned import pairwise_f1, run_ned
    pages_dir = pages_dir_for_sf(sf_dir)
    links = run_ned(pages_dir, PipelineConfig())
    gt = pq.read_table(f"{pages_dir}/mention_pairs_gt.parquet")
    m = pairwise_f1(links, gt)
    return pd.DataFrame([{
        "n_links": len(links), **{k: m[k] for k in
                                  ("tp", "fp", "fn", "tn")},
        "precision_e6": int(m["precision"] * 1e6 + 0.5),
        "recall_e6": int(m["recall"] * 1e6 + 0.5),
        "f1_e6": int(m["f1"] * 1e6 + 0.5),
    }])


def ned_eval_topk(sf_dir: str, ks: tuple = (1, 3, 5)):
    """SELF-CHECKING (rank-aware quality gate, no SQL twin): the
    hipe-scorer-style micro/macro P/R/F1 @1/@3/@5 over the pipeline's
    full per-mention ranking (``out_rank``) against the per-mention
    gold qids — the reference's actual scoring regime
    (``NEL-LIT-micro-fuzzy-@k``; pairwise F1 is the cluster-level
    view, this is the ranking-level view).  Asserts recall is
    monotone non-decreasing in k (a bigger cutoff can only add hits)
    and that @1 micro-F1 matches the pipeline's known top-1 quality
    (≥ 0.95 on the synthetic fixture, where pairwise F1 is 1.0)."""
    import pyarrow.parquet as pq

    from sbb_ned_ray.pipelines.evalgrid import ranked_topk_metrics
    from sbb_ned_ray.pipelines.ned import build_ned_links
    pages_dir = pages_dir_for_sf(sf_dir)
    links = build_ned_links(pages_dir, PipelineConfig()).to_pandas()
    gt = pq.read_table(f"{pages_dir}/mentions_gt.parquet").to_pandas()
    out = ranked_topk_metrics(links, gt, ks=ks)
    r = out["micro_r_e6"].to_numpy()
    assert (np.diff(r) >= 0).all(), f"recall@k not monotone:\n{out}"
    assert out["micro_f1_e6"].iloc[0] >= 950_000, \
        f"@1 micro-F1 collapsed:\n{out}"
    assert (out["macro_f1_e6"] <= 1_000_000).all()
    return out


# ---------------------------------------------------------------------------
# Sketches + semi-join prefilters + remaining relational shapes
# (round 3: HLL / Misra-Gries / Bloom — the O(blocks x sketch) answers
# a 100 TB corpus needs where exact shuffles are unaffordable — plus
# ROLLUP, EXCEPT, correlated-scalar-subquery and ordered string_agg.)
# ---------------------------------------------------------------------------


def distinct_users_per_type(sf_dir: str):
    """Exact COUNT(DISTINCT) per group, shuffle-lean: per-batch pair
    dedup -> narrow two-level groupby (`stages/sketches.py`)."""
    from sbb_ned_ray.stages.sketches import exact_count_distinct_per_group
    ds = _read_split(sf_dir, "events", ["event_type", "user_id"])
    return exact_count_distinct_per_group(ds, "event_type", "user_id")


ORACLE_DISTINCT_USERS_PER_TYPE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type
"""


def distinct_users_hll(sf_dir: str):
    """SELF-CHECKING (approximate, no SQL twin): HyperLogLog distinct
    user estimate vs the exact distributed count; asserts the estimate
    is within 5 sigma (sigma = 1.04/sqrt(2^p)).  Driver traffic is one
    4 KiB register array per block regardless of input size."""
    from sbb_ned_ray.stages.sketches import hll_count_distinct
    # materialized once: consumed by the sketch AND the exact baseline
    ds = _read_split(sf_dir, "events", ["user_id"]).materialize()
    out = hll_count_distinct(ds, "user_id", p=12)
    exact = len(ds.unique("user_id"))
    rel = abs(out["estimate"] - exact) / max(exact, 1)
    assert rel < 5 * 1.04 / np.sqrt(2 ** 12), (out["estimate"], exact)
    return pa.table({"exact": pa.array([exact], pa.int64()),
                     "hll_estimate": pa.array([int(round(out["estimate"]))],
                                              pa.int64()),
                     "rel_err_e6": pa.array([int(rel * 1e6 + 0.5)],
                                            pa.int64())})


def heavy_hitter_tokens(sf_dir: str, k: int = 64):
    """SELF-CHECKING (approximate, no SQL twin): Misra-Gries top-token
    sketch over the document corpus, verified against the exact
    distributed wordcount: every token with true frequency > n/(k+1)
    must be present and every estimate must satisfy
    est <= true <= est + max_undercount."""
    from sbb_ned_ray.stages.sketches import heavy_hitters
    ds = _read_split(sf_dir, "documents", ["text"])
    out = heavy_hitters(ds, "text", k=k, explode_tokens=True)

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        toks = np.array(" ".join(texts).split(" ")) if texts \
            else np.array([], dtype=str)
        u, c = np.unique(toks, return_counts=True)
        return pa.table({"token": pa.array(u, pa.string()),
                         "n": pa.array(c, pa.int64())})

    exact = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("n", alias_name="n")).to_pandas()
    true = dict(zip(exact["token"], exact["n"]))
    thresh = out["n"] / (k + 1)
    est = dict(zip(out["top"]["item"], out["top"]["est"]))
    for tok, cnt in true.items():
        if cnt > thresh:
            assert tok in est, (tok, cnt, thresh)
    for tok, e in est.items():
        t = int(true.get(tok, 0))
        assert e <= t <= e + out["max_undercount"], (tok, e, t)
    top = out["top"].rename(columns={"item": "token", "est": "est_count"})
    top["max_undercount"] = np.int64(out["max_undercount"])
    return top


def orders_bloom_semijoin(sf_dir: str):
    """Semi-join with a broadcast Bloom prefilter (exact result):
    orders of high-balance customers, aggregated per priority.  The
    Bloom stage drops ~90% of probe rows batch-side with NO shuffle of
    the big table; the survivors are re-checked exactly (sketches.py
    docstring covers the >memory build-side variant)."""
    from sbb_ned_ray.stages.sketches import bloom_semijoin
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_acctbal"])
    build = np.sort(np.concatenate(
        [t["c_custkey"].to_numpy()
         for t in cust.filter(expr="c_acctbal > 9000")
         .select_columns(["c_custkey"])
         .iter_batches(batch_format="pyarrow", batch_size=None)] or
        [np.zeros(0, np.int64)]))
    orders = _read_split(sf_dir, "orders",
                         ["o_custkey", "o_orderpriority", "o_totalprice"])
    kept = bloom_semijoin(orders, "o_custkey", build)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "price_e2": _e(t["o_totalprice"], 1e2),
            "one": pa.array(np.ones(t.num_rows, np.int64))})

    return kept.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderpriority") \
        .aggregate(Sum("one", alias_name="n_orders"),
                   Sum("price_e2", alias_name="sum_price_e2"))


ORACLE_ORDERS_BLOOM_SEMIJOIN = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_price_e2
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
GROUP BY o_orderpriority
"""


def orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP(priority, status): one narrow finest-level
    groupby does the only shuffle; the coarser levels are derived from
    that (tiny) result on the driver — the standard way to avoid
    re-scanning the fact table per grouping set.  Rolled-up columns
    carry the '*' marker (COALESCE'd identically in the SQL twin)."""
    orders = _read_split(sf_dir, "orders",
                         ["o_orderpriority", "o_orderstatus",
                          "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"priority": t["o_orderpriority"],
                       "status": t["o_orderstatus"],
                       "price_e2": _e(t["o_totalprice"], 1e2)}).to_pandas()
        g = df.groupby(["priority", "status"], sort=False) \
            .agg(n_orders=("price_e2", "size"),
                 sum_price_e2=("price_e2", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = orders.map_batches(partial, batch_format="pyarrow") \
        .groupby(["priority", "status"]) \
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("sum_price_e2", alias_name="sum_price_e2")) \
        .to_pandas()
    mid = fine.groupby("priority", as_index=False)[
        ["n_orders", "sum_price_e2"]].sum()
    mid["status"] = "*"
    top = pd.DataFrame([{"priority": "*", "status": "*",
                         "n_orders": fine["n_orders"].sum(),
                         "sum_price_e2": fine["sum_price_e2"].sum()}])
    out = pd.concat([fine, mid, top], ignore_index=True)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["sum_price_e2"] = out["sum_price_e2"].astype(np.int64)
    return out[["priority", "status", "n_orders", "sum_price_e2"]]


ORACLE_ORDERS_ROLLUP = """
SELECT COALESCE(o_orderpriority, '*') AS priority,
       COALESCE(o_orderstatus, '*') AS status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_price_e2
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def users_view_no_purchase(sf_dir: str):
    """Set difference (EXCEPT shape) without materializing either set:
    per-batch (user, flag) partials -> one narrow groupby taking Max of
    each flag -> filter view & !purchase (over high-value events so the
    difference is non-trivial on the fixture).  The shuffle moves at
    most one row per user per batch."""
    ds = _read_split(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["value"], 95.0))
        df = pa.table({"user_id": t["user_id"],
                       "is_view": pc.cast(
                           pc.equal(t["event_type"], "view"), pa.int64()),
                       "is_purchase": pc.cast(
                           pc.equal(t["event_type"], "purchase"),
                           pa.int64())}).to_pandas()
        g = df.groupby("user_id", sort=False).agg(
            is_view=("is_view", "max"),
            is_purchase=("is_purchase", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    flags = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id") \
        .aggregate(Max("is_view", alias_name="is_view"),
                   Max("is_purchase", alias_name="is_purchase"))
    return flags.filter(expr="is_view == 1 and is_purchase == 0") \
        .select_columns(["user_id"])


ORACLE_USERS_VIEW_NO_PURCHASE = """
SELECT user_id FROM events WHERE event_type = 'view' AND value > 95
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 95
"""


def q17_small_quantity_revenue(sf_dir: str):
    """Correlated scalar subquery (TPC-H Q17 kernel): lineitems whose
    quantity is below half their part's average quantity.  The per-part
    average is computed as a narrow (sum, count) groupby and compared
    in EXACT integer arithmetic (2*qty*cnt < sum, quantities pre-scaled
    e2) so both engines agree bit-for-bit; the per-part table is
    broadcast (2k parts here; at KB scale this becomes the bucketed
    co-shuffle join of `stages/blocking.py`)."""
    # materialized once: the narrow 3-column projection is consumed by
    # both the per-part stats pass and the final filter pass
    li = _read_split(sf_dir, "lineitem",
                     ["l_partkey", "l_quantity",
                      "l_extendedprice"]).materialize()

    def part_partial(t: pa.Table) -> pa.Table:
        df = pa.table({"l_partkey": t["l_partkey"],
                       "qty_e2": _e(t["l_quantity"], 1e2)}).to_pandas()
        g = df.groupby("l_partkey", sort=False).agg(
            sum_qty_e2=("qty_e2", "sum"),
            n=("qty_e2", "size")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = li.map_batches(part_partial, batch_format="pyarrow") \
        .groupby("l_partkey") \
        .aggregate(Sum("sum_qty_e2", alias_name="sum_qty_e2"),
                   Sum("n", alias_name="n")).to_pandas() \
        .sort_values("l_partkey")
    ref = ray.put((stats["l_partkey"].to_numpy(np.int64),
                   stats["sum_qty_e2"].to_numpy(np.int64),
                   stats["n"].to_numpy(np.int64)))

    def sel(t: pa.Table) -> pa.Table:
        keys, sums, cnts = ray.get(ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, pk)
        qty_e2 = _e(t["l_quantity"], 1e2).to_numpy(zero_copy_only=False)
        keep = 2 * qty_e2 * cnts[pos] < sums[pos]
        price_e2 = _e(t["l_extendedprice"], 1e2) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "sum_price_e2": pa.array([int(price_e2[keep].sum())],
                                     pa.int64()),
            "n_rows": pa.array([int(keep.sum())], pa.int64())})

    agg = li.map_batches(sel, batch_format="pyarrow") \
        .aggregate(Sum("sum_price_e2"), Sum("n_rows"))
    return pa.table({
        "sum_price_e2": pa.array([int(agg["sum(sum_price_e2)"])],
                                 pa.int64()),
        "n_rows": pa.array([int(agg["sum(n_rows)"])], pa.int64())})


ORACLE_Q17 = """
WITH s AS (SELECT l_partkey,
                  SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT))
                      AS sum_qty_e2,
                  COUNT(*) AS n
           FROM lineitem GROUP BY l_partkey)
SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice*100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_price_e2,
       COUNT(*) AS n_rows
FROM lineitem l JOIN s ON l.l_partkey = s.l_partkey
WHERE 2 * CAST(FLOOR(l.l_quantity*100 + 0.5) AS BIGINT) * s.n
      < s.sum_qty_e2
"""


def nation_top_customer_names(sf_dir: str):
    """Ordered string aggregation: per nation, the comma-joined names
    of its top-3 customers by (acctbal desc, name) — groupby.map_groups
    with a per-group sort, the list-agg shape SQL writes as
    string_agg(... ORDER BY ...)."""
    ds = _read_split(sf_dir, "customer",
                     ["c_nationkey", "c_name", "c_acctbal"], nblocks=8)

    def topnames(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_acctbal", "c_name"],
                          ascending=[False, True]).head(3)
        return pd.DataFrame([{
            "c_nationkey": int(g["c_nationkey"].iloc[0]),
            "top_names": ",".join(g["c_name"])}])

    return ds.groupby("c_nationkey").map_groups(
        topnames, batch_format="pandas")


ORACLE_NATION_TOP_CUSTOMER_NAMES = """
SELECT c_nationkey,
       STRING_AGG(c_name, ',' ORDER BY c_acctbal DESC, c_name)
           AS top_names
FROM (SELECT c_nationkey, c_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_name) AS rn
      FROM customer)
WHERE rn <= 3
GROUP BY c_nationkey
"""


def pages_per_host(sf_dir: str):
    """Web-corpus host profile: canonical host + registrable domain of
    every page URL, counted per host.  Host extraction over the batch
    is pure pyarrow kernels (split + lowercase — no Python loop); the
    full :func:`~sbb_ned_ray.functions.urltools.canonicalize_url`
    parser (escapes, dot-segments, tracking params) is unit-tested on
    golden vectors and applied where whole-URL keys are needed."""
    from sbb_ned_ray.functions.urltools import registrable_domain
    pages = pages_dir_for_sf(sf_dir)
    ds = rd.read_parquet(f"{pages}/pages", columns=["url"])

    def partial(t: pa.Table) -> pa.Table:
        auth = pc.list_element(pc.split_pattern(t["url"], "/"), 2)
        host = pc.utf8_lower(
            pc.list_element(pc.split_pattern(auth, ":"), 0))
        df = pa.table({"host": host}).to_pandas()
        g = df.groupby("host", sort=False).size() \
            .rename("n_pages").reset_index()
        g["domain"] = [registrable_domain(h) for h in g["host"]]
        return pa.Table.from_pandas(g[["host", "domain", "n_pages"]],
                                    preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["host", "domain"]) \
        .aggregate(Sum("n_pages", alias_name="n_pages"))


def _recrawl_path(sf_dir: str) -> str:
    """Deterministic RECRAWL fixture derived from the pages table:
    every url keeps its original snapshot; urls are assigned by an
    md5 draw to gain (a) one identical re-crawl 7 days later under a
    fragment variant, or (b) two drifted re-crawls (+3d content edit
    under a tracking-param variant, +9d under an uppercased url) —
    so canonicalization, latest-selection and drift counting all have
    work to do.  Cached next to the pages fixture; BOTH engines read
    this parquet."""
    import hashlib as _hl
    import os as _os
    pages = pages_dir_for_sf(sf_dir)
    out = _os.path.join(pages, "recrawl.parquet")
    if _os.path.exists(out):
        return out
    df = pd.concat([pd.read_parquet(p, columns=["url", "warc_ts",
                                                "text"])
                    for p in sorted(_glob.glob(
                        f"{pages}/pages/*.parquet"))],
                   ignore_index=True)
    day = pd.Timedelta(days=1)
    h = np.array([int(_hl.md5(u.encode()).hexdigest()[:8], 16) % 3
                  for u in df["url"]])
    extra = []
    a = df[h == 0]
    extra.append(pd.DataFrame({
        "url": a["url"] + "#top",
        "warc_ts": a["warc_ts"] + 7 * day,
        "text": a["text"]}))
    b = df[h == 1]
    extra.append(pd.DataFrame({
        "url": b["url"] + "?utm_source=feed",
        "warc_ts": b["warc_ts"] + 3 * day,
        "text": b["text"] + " [updated]"}))
    extra.append(pd.DataFrame({
        "url": b["url"].str.upper(),
        "warc_ts": b["warc_ts"] + 9 * day,
        "text": b["text"] + " [updated again]"}))
    rec = pd.concat([df] + extra, ignore_index=True)
    tmp = out + f".tmp-{os.getpid()}"
    rec.to_parquet(tmp, index=False)
    os.replace(tmp, out)
    return out


def pages_recrawl_latest(sf_dir: str):
    """Recrawl dedup over the snapshot table: aggressive URL
    canonicalization (strip fragment + query, rtrim '/', lowercase —
    mirrored verbatim in the twin), then per canonical url the
    snapshot count, first/latest capture (epoch micros), distinct
    text count (content drift), and the LATEST snapshot's text md5 —
    the keep-newest rule of crawl-corpus curation.  ONE groupby on
    the canonical key; canonicalization is vectorized pandas string
    kernels.  ORACLE-checked against a DuckDB window/group twin."""
    path = _recrawl_path(sf_dir)
    ds = rd.read_parquet(path)

    def canon_rows(df: pd.DataFrame) -> pa.Table:
        canon = df["url"].str.split("#").str[0] \
            .str.split("?").str[0].str.rstrip("/").str.lower()
        return pa.table({
            "canon_url": pa.array(canon.to_numpy(object)),
            "ts": pa.array(df["warc_ts"].to_numpy("datetime64[us]")
                           .view(np.int64), pa.int64()),
            "text": pa.array(df["text"].to_numpy(object))})

    def per_url(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib as _hl
        latest = df.loc[df["ts"].idxmax()]
        return pd.DataFrame([{
            "canon_url": df["canon_url"].iloc[0],
            "n_snapshots": np.int64(len(df)),
            "first_ts_us": np.int64(df["ts"].min()),
            "latest_ts_us": np.int64(df["ts"].max()),
            "n_texts": np.int64(df["text"].nunique()),
            "latest_md5": _hl.md5(
                str(latest["text"]).encode()).hexdigest()}])

    out = ds.map_batches(canon_rows, batch_format="pandas") \
        .groupby("canon_url").map_groups(per_url,
                                         batch_format="pandas") \
        .to_pandas()
    return out.sort_values("canon_url").reset_index(drop=True)


def _oracle_pages_recrawl(sf_dir: str = "/root/testdata/sf0.01") -> str:
    return f"""
WITH r AS (SELECT LOWER(rtrim(split_part(split_part(url, '#', 1),
                                         '?', 1), '/')) AS canon_url,
                  epoch_us(warc_ts) AS ts, text
           FROM read_parquet('{_recrawl_path(sf_dir)}')),
rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY canon_url
                                    ORDER BY ts DESC) AS rn FROM r),
agg AS (SELECT canon_url, count(*) AS n_snapshots,
               min(ts) AS first_ts_us, max(ts) AS latest_ts_us,
               count(DISTINCT text) AS n_texts
        FROM r GROUP BY 1)
SELECT a.canon_url, a.n_snapshots, a.first_ts_us, a.latest_ts_us,
       a.n_texts, md5(rk.text) AS latest_md5
FROM agg a JOIN rk ON rk.canon_url = a.canon_url AND rk.rn = 1
ORDER BY a.canon_url
"""


def _oracle_pages_per_host(sf_dir: str = "/root/testdata/sf0.01") -> str:
    import os as _os

    from sbb_ned_ray.fixtures.generator import spec_for_sf
    path = _os.path.join("/tmp/sbb_ned_ray_fixtures",
                         spec_for_sf(sf_dir).fingerprint(),
                         "pages", "*.parquet")
    # fixture hosts are single-label ('siteN.example'), so the eTLD+1
    # equals the host; the multi-label cases are unit-tested
    return f"""
SELECT LOWER(SPLIT_PART(SPLIT_PART(url, '/', 3), ':', 1)) AS host,
       LOWER(SPLIT_PART(SPLIT_PART(url, '/', 3), ':', 1)) AS domain,
       COUNT(*) AS n_pages
FROM read_parquet('{path}')
GROUP BY 1, 2
"""


def pages_split_by_host(sf_dir: str):
    """Leakage-safe train/val/test split: every page of a HOST lands in
    the same split (an eval page sharing a host with training pages
    leaks template/boilerplate signal — the grouped-split rule of
    web-corpus curation).  Assignment is a seedless md5 draw on the
    host (train < 0.8 ≤ val < 0.9 ≤ test, both engines compute it
    identically); output is per-(split, host) page counts, so the
    oracle ALSO proves no host straddles splits.  Scale shape:
    per-batch (host, count) partials → one narrow groupby; the split
    decision is a pure function of the host, no shuffle of page
    rows."""
    import hashlib

    pages = pages_dir_for_sf(sf_dir)
    ds = rd.read_parquet(f"{pages}/pages", columns=["url"])

    def partial(t: pa.Table) -> pa.Table:
        auth = pc.list_element(pc.split_pattern(t["url"], "/"), 2)
        host = pc.utf8_lower(
            pc.list_element(pc.split_pattern(auth, ":"), 0))
        df = pa.table({"host": host}).to_pandas()
        g = df.groupby("host", sort=False).size() \
            .rename("n_pages").reset_index()
        h4 = np.array([int(hashlib.md5(h.encode()).hexdigest()[:4], 16)
                       for h in g["host"]])
        g["split"] = np.where(h4 < 52428, "train",          # ⌊.8·2¹⁶⌋
                              np.where(h4 < 58982, "val", "test"))
        return pa.Table.from_pandas(g[["split", "host", "n_pages"]],
                                    preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["split", "host"]) \
        .aggregate(Sum("n_pages", alias_name="n_pages"))


def _oracle_pages_split_by_host(sf_dir: str = "/root/testdata/sf0.01"
                                ) -> str:
    import os as _os

    from sbb_ned_ray.fixtures.generator import spec_for_sf
    path = _os.path.join("/tmp/sbb_ned_ray_fixtures",
                         spec_for_sf(sf_dir).fingerprint(),
                         "pages", "*.parquet")
    return f"""
SELECT CASE WHEN h4 < 52428 THEN 'train'
            WHEN h4 < 58982 THEN 'val' ELSE 'test' END AS split,
       host, COUNT(*) AS n_pages
FROM (SELECT LOWER(SPLIT_PART(SPLIT_PART(url, '/', 3), ':', 1)) AS host,
             CAST('0x' || SUBSTRING(md5(LOWER(SPLIT_PART(
                  SPLIT_PART(url, '/', 3), ':', 1))), 1, 4) AS UBIGINT)
                 AS h4
      FROM read_parquet('{path}'))
GROUP BY 1, 2
"""


def events_value_quantiles_sketch(sf_dir: str):
    """SELF-CHECKING (approximate, no SQL twin): DDSketch-style
    relative-error quantiles over events.value — per-batch log-bucket
    histograms (constant size) merged by one narrow groupby; asserts
    every estimate is within the sketch's alpha=1% RELATIVE-error
    guarantee of the exact quantile."""
    from sbb_ned_ray.stages.sketches import dd_quantiles
    alpha = 0.01
    ds = _read_split(sf_dir, "events", ["value"])
    out = dd_quantiles(ds, "value", qs=(0.5, 0.9, 0.99), alpha=alpha)
    exact = np.sort(np.concatenate(
        [t["value"].to_numpy()
         for t in ds.iter_batches(batch_format="pyarrow",
                                  batch_size=None)]))
    rows = []
    for _, r in out.iterrows():
        true = exact[max(int(np.ceil(r["q"] * len(exact))), 1) - 1]
        rel = abs(r["estimate"] - true) / true if true else 0.0
        assert rel <= alpha + 1e-9, (r["q"], r["estimate"], true)
        rows.append({"q_e2": int(r["q"] * 100 + 0.5),
                     "estimate_e6": int(r["estimate"] * 1e6 + 0.5),
                     "exact_e6": int(true * 1e6 + 0.5),
                     "rel_err_e6": int(rel * 1e6 + 0.5)})
    return pd.DataFrame(rows)


def token_postings(sf_dir: str):
    """Inverted-index build (the IR shuffle workload): distinct
    (token, doc_id) pairs per batch -> narrow groupby token ->
    per-token sorted posting list, kept for mid-frequency tokens
    (document frequency in [1%, 80%] of the corpus, so the band is
    scale-invariant).  Postings are emitted as the comma-joined sorted
    doc-id string so the SQL twin (STRING_AGG ... ORDER BY) matches
    byte-for-byte."""
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    df_lo, df_hi = n_docs // 100, n_docs * 8 // 10

    def pairs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        toks = [s.split(" ") for s in texts]
        did = np.repeat(ids, [len(x) for x in toks])
        flat = np.array([w for x in toks for w in x], dtype=object)
        df = pd.DataFrame({"token": flat, "doc_id": did}) \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def postings(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()  # same pair can arrive from 2 batches
        n = len(g)
        if not (df_lo <= n <= df_hi):
            return pd.DataFrame({"token": pd.Series([], dtype=str),
                                 "df": pd.Series([], dtype=np.int64),
                                 "postings": pd.Series([], dtype=str)})
        ids = np.sort(g["doc_id"].to_numpy(np.int64))
        return pd.DataFrame([{
            "token": g["token"].iloc[0], "df": np.int64(n),
            "postings": ",".join(map(str, ids))}])

    return ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("token").map_groups(postings, batch_format="pandas")


ORACLE_TOKEN_POSTINGS = """
SELECT token, COUNT(*) AS df,
       STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS postings
FROM (SELECT DISTINCT doc_id, token
      FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
            FROM documents))
GROUP BY token
HAVING COUNT(*) BETWEEN (SELECT COUNT(*) FROM documents) // 100
                    AND (SELECT COUNT(*) FROM documents) * 8 // 10
"""


def docs_pack_windows(sf_dir: str, window: int = 2000):
    """Sequence packing for LLM training: assign each document to the
    fixed-token context window its text starts in — an EXCLUSIVE
    prefix sum of token counts over doc order (distributed two-pass
    scan, `stages/scan.py`), then pack_id = floor(prefix / window).
    Oracle-exact vs the SQL window frame."""
    from sbb_ned_ray.stages.scan import prefix_scan
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])

    def tok(t: pa.Table) -> pa.Table:
        counts = pc.list_value_length(pc.split_pattern(t["text"], " "))
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pc.cast(counts, pa.int64())})

    scanned = prefix_scan(ds.map_batches(tok, batch_format="pyarrow"),
                          "doc_id", "n_tokens", out_col="start_tok")

    def pack(t: pa.Table) -> pa.Table:
        start = t["start_tok"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"], "n_tokens": t["n_tokens"],
            "pack_id": pa.array(start // window, pa.int64())})

    return scanned.map_batches(pack, batch_format="pyarrow")


ORACLE_DOCS_PACK_WINDOWS = """
SELECT doc_id, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER
                (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) // 2000 AS BIGINT) AS pack_id
FROM (SELECT doc_id,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents)
"""


def docs_mix_sources(sf_dir: str):
    """Deterministic corpus mixing: per-source Bernoulli keep rates
    (the 'data mixture' step of training-corpus curation), decided by
    comparing an md5 prefix of the doc id against a per-source hex
    cutoff — a seedless draw both engines compute identically (same
    trick as docs_sample_per_lang).  Keep rate = (100 + 80*(src_num %
    10))/1000; returns per-source kept counts."""
    import hashlib

    ds = _read_split(sf_dir, "documents", ["doc_id", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        src_num = df["source"].str.slice(3).astype(int)
        thr = (100 + 80 * (src_num % 10)) * 65536 // 1000
        cut = np.array([format(t, "04x") for t in thr])
        h4 = np.array([hashlib.md5(str(i).encode()).hexdigest()[:4]
                       for i in df["doc_id"]])
        kept = df[h4 < cut]
        g = kept.groupby("source", sort=False).size() \
            .rename("n_kept").reset_index()
        return g

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("source").aggregate(Sum("n_kept", alias_name="n_kept"))


ORACLE_DOCS_MIX_SOURCES = """
SELECT source, COUNT(*) AS n_kept
FROM (SELECT source,
             SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h4,
             LPAD(FORMAT('{:x}',
                  (100 + 80*(CAST(SUBSTRING(source, 4) AS BIGINT) % 10))
                  * 65536 // 1000), 4, '0') AS cut
      FROM documents)
WHERE h4 < cut
GROUP BY source
"""


def docs_weighted_sample(sf_dir: str, k: int = 25):
    """Deterministic weighted sampling WITHOUT replacement per language
    (Efraimidis–Spirakis A-ES): keep the k docs with the largest
    ``u^(1/w)`` where ``w = n_chars`` and ``u`` is a seedless uniform
    both engines derive identically from an md5 prefix of the doc id —
    longer docs are proportionally likelier, reruns are bit-stable (the
    corpus-subsampling step of training-data curation, weighted by
    length/quality instead of uniform).  Scale shape: per-batch partial
    top-k per language (the combiner), then one narrow groupby — the
    shuffle carries ≤ k rows per (batch, lang), never the corpus."""
    import hashlib
    import math

    ds = _read_split(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        u = np.array([(int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                           16) + 1) / 2 ** 32
                      for i in df["doc_id"]])
        w = np.maximum(df["n_chars"].to_numpy(np.int64), 1)
        df = df.copy()
        df["_key"] = u ** (1.0 / w)
        # per-batch combiner: top-k per lang before the shuffle
        return df.sort_values(["lang", "_key", "doc_id"],
                              ascending=[True, False, True]) \
            .groupby("lang", sort=False).head(k)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(["_key", "doc_id"],
                            ascending=[False, True]).head(k)
        return out[["lang", "doc_id", "n_chars"]]

    return ds.map_batches(add_key, batch_format="pandas") \
        .groupby("lang").map_groups(final_topk, batch_format="pandas")


ORACLE_DOCS_WEIGHTED_SAMPLE = """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
           POWER((CAST('0x' ||
                       SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS UBIGINT) + 1) / 4294967296.0,
                 1.0 / GREATEST(n_chars, 1)) DESC, doc_id) AS rnk
  FROM documents) WHERE rnk <= 25
"""


def docs_group_kfold(sf_dir: str, k: int = 5):
    """Deterministic GROUP k-fold assignment: every doc of a SOURCE
    lands in the same fold (md5 of the source mod k — the leakage-safe
    cross-validation split; the decider trainer uses the same GroupKFold
    discipline over pages).  Output is per-(fold, source) doc counts so
    the oracle also proves no source straddles folds.  Pure per-batch
    map + one narrow groupby — the fold is a function of the group key,
    no row shuffle."""
    import hashlib

    ds = _read_split(sf_dir, "documents", ["doc_id", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False).size() \
            .rename("n_docs").reset_index()
        g["fold"] = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % k
                     for s in g["source"]]
        return g[["fold", "source", "n_docs"]]

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby(["fold", "source"]) \
        .aggregate(Sum("n_docs", alias_name="n_docs"))


ORACLE_DOCS_GROUP_KFOLD = """
SELECT CAST('0x' || SUBSTRING(md5(source), 1, 8) AS UBIGINT) % 5
           AS fold,
       source, COUNT(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


def docs_shard_shuffle(sf_dir: str):
    """Deterministic shuffle-then-shard for training output
    (stages/textprep.shard_shuffle): md5-keyed shard + within-shard
    rank, oracle-exact vs the SQL ROW_NUMBER twin — proves the shard
    layout is a pure function of ids (resumable, rerun-stable), with
    one narrow groupby as the only exchange."""
    from sbb_ned_ray.stages.textprep import shard_shuffle
    ds = _read_split(sf_dir, "documents", ["doc_id"])
    out = shard_shuffle(ds).to_pandas()
    return out.sort_values(["shard", "pos"]).reset_index(drop=True)


ORACLE_DOCS_SHARD_SHUFFLE = """
SELECT SUBSTRING(h, 1, 1) AS shard,
       doc_id,
       CAST(ROW_NUMBER() OVER (
            PARTITION BY SUBSTRING(h, 1, 1)
            ORDER BY SUBSTRING(h, 2, 8), doc_id) - 1 AS BIGINT) AS pos
FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
ORDER BY shard, pos
"""


def party_nation_counts(sf_dir: str):
    """UNION of two sources then grouped count — Ray's native
    ``Dataset.union`` feeding one aggregate (the multi-source ingest
    shape: N parquet lineages -> one logical stream)."""
    cust = _read_split(sf_dir, "customer", ["c_nationkey"], nblocks=4) \
        .map_batches(lambda t: pa.table({
            "nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            "kind": pa.array(["customer"] * t.num_rows)}),
            batch_format="pyarrow")
    supp = _read_split(sf_dir, "supplier", ["s_nationkey"], nblocks=4) \
        .map_batches(lambda t: pa.table({
            "nationkey": pc.cast(t["s_nationkey"], pa.int64()),
            "kind": pa.array(["supplier"] * t.num_rows)}),
            batch_format="pyarrow")
    return cust.union(supp).groupby(["nationkey", "kind"]) \
        .aggregate(Count(alias_name="n"))


ORACLE_PARTY_NATION_COUNTS = """
SELECT nationkey, kind, COUNT(*) AS n
FROM (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
             'customer' AS kind FROM customer
      UNION ALL
      SELECT CAST(s_nationkey AS BIGINT), 'supplier' FROM supplier)
GROUP BY nationkey, kind
"""


def events_ntile(sf_dir: str, tiles: int = 4):
    """NTILE window: quartile of each event within its event_type by
    (value, event_id) order — per-group sort + integer index math in
    map_groups (SQL's NTILE fill rule: first ``n % tiles`` tiles get
    the extra row)."""
    ds = _read_split(sf_dir, "events",
                     ["event_id", "event_type", "value"])

    def ntile(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"]).reset_index(drop=True)
        n = len(g)
        base, extra = divmod(n, tiles)
        sizes = np.full(tiles, base, np.int64)
        sizes[:extra] += 1
        g["tile"] = np.repeat(np.arange(1, tiles + 1, dtype=np.int64),
                              sizes)[:n]
        return g[["event_id", "event_type", "tile"]]

    return ds.groupby("event_type").map_groups(ntile,
                                               batch_format="pandas")


ORACLE_EVENTS_NTILE = """
SELECT event_id, event_type,
       CAST(NTILE(4) OVER (PARTITION BY event_type
                           ORDER BY value, event_id) AS BIGINT) AS tile
FROM events
"""


def events_lag_delta(sf_dir: str):
    """LAG window: per user, each event's value delta vs the previous
    event in (ts, event_id) order — per-group sort + shift.  First
    event per user keeps delta = 0 (COALESCE'd the same in SQL)."""
    ds = _read_split(sf_dir, "events",
                     ["event_id", "user_id", "ts", "value"])

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        v_e6 = np.floor(g["value"].to_numpy() * 1e6 + 0.5) \
            .astype(np.int64)
        prev = np.concatenate([[0], v_e6[:-1]])
        prev[0] = v_e6[0]  # delta 0 for the first row
        return pd.DataFrame({"event_id": g["event_id"],
                             "user_id": g["user_id"],
                             "delta_e6": v_e6 - prev})

    return ds.groupby("user_id").map_groups(lag, batch_format="pandas")


ORACLE_EVENTS_LAG_DELTA = """
SELECT event_id, user_id,
       CAST(FLOOR(value*1000000 + 0.5) AS BIGINT)
       - COALESCE(LAG(CAST(FLOOR(value*1000000 + 0.5) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id),
                  CAST(FLOOR(value*1000000 + 0.5) AS BIGINT)) AS delta_e6
FROM events
"""


def events_corr_moments(sf_dir: str):
    """Grouped second-order moments (the distributed building blocks
    of covariance/correlation/stddev): exact integer sums of x, y, xy,
    xx, yy per event_type with x = value (e2-scaled) and y = hour of
    day.  Kept integer-exact end-to-end — the float epilogue (corr =
    ...) is a driver-side one-liner both engines would agree on only
    modulo FP association, so the CHECKED artifact is the moments."""
    ds = _read_split(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        x = _e(t["value"], 1e2).to_numpy(zero_copy_only=False)
        epoch_s = pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000) \
            .to_numpy(zero_copy_only=False)
        y = (epoch_s // 3600) % 24
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "n": np.ones(len(x), np.int64),
                           "sum_x": x, "sum_y": y,
                           "sum_xy": x * y, "sum_xx": x * x,
                           "sum_yy": y * y})
        return pa.Table.from_pandas(
            df.groupby("event_type", sort=False).sum().reset_index(),
            preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_x", alias_name="sum_x"),
                   Sum("sum_y", alias_name="sum_y"),
                   Sum("sum_xy", alias_name="sum_xy"),
                   Sum("sum_xx", alias_name="sum_xx"),
                   Sum("sum_yy", alias_name="sum_yy"))


ORACLE_EVENTS_CORR_MOMENTS = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(x) AS BIGINT) AS sum_x,
       CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(SUM(x*y) AS BIGINT) AS sum_xy,
       CAST(SUM(x*x) AS BIGINT) AS sum_xx,
       CAST(SUM(y*y) AS BIGINT) AS sum_yy
FROM (SELECT event_type,
             CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS x,
             (CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600) % 24 AS y
      FROM events)
GROUP BY event_type
"""


def distinct_users_per_type_hll(sf_dir: str):
    """SELF-CHECKING (approximate, no SQL twin): per-group HyperLogLog
    distinct counts — one register row per group per batch, merged in
    map_groups, so shuffle volume is independent of key cardinality.
    Asserts every group's estimate is within 5 sigma of the exact
    per-group distinct count."""
    from sbb_ned_ray.stages.sketches import (
        exact_count_distinct_per_group, hll_distinct_per_group,
    )
    ds = _read_split(sf_dir, "events",
                     ["event_type", "user_id"]).materialize()
    est = hll_distinct_per_group(ds, "event_type", "user_id", p=12) \
        .set_index("event_type")["n_distinct_est"]
    exact = exact_count_distinct_per_group(ds, "event_type", "user_id") \
        .to_pandas().set_index("event_type")["n_distinct"]
    rows = []
    for g in sorted(exact.index):
        e, x = int(est[g]), int(exact[g])
        rel = abs(e - x) / max(x, 1)
        assert rel < 5 * 1.04 / np.sqrt(2 ** 12), (g, e, x)
        rows.append({"event_type": g, "exact": x, "hll_estimate": e,
                     "rel_err_e6": int(rel * 1e6 + 0.5)})
    return pd.DataFrame(rows)


def docs_pruned_read(sf_dir: str):
    """Prune AT THE READ: a pyarrow filter expression pushed into
    ``read_parquet`` (row groups that can't match never leave storage,
    the zone-map/predicate-pushdown discipline the 100 TB read path
    depends on) + column pruning, then one narrow aggregate."""
    import pyarrow.dataset as pds
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["lang", "n_chars"],
                         filter=((pds.field("lang") == "de")
                                 & (pds.field("n_chars") > 200)))

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "sum_chars": pa.array(
                [int(pc.sum(t["n_chars"]).as_py() or 0)], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("n_docs"), Sum("sum_chars"))
    return pa.table({
        "n_docs": pa.array([int(agg["sum(n_docs)"])], pa.int64()),
        "sum_chars": pa.array([int(agg["sum(sum_chars)"])], pa.int64())})


ORACLE_DOCS_PRUNED_READ = """
SELECT COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE lang = 'de' AND n_chars > 200
"""


def blocking_quality(sf_dir: str):
    """SELF-CHECKING: the record-linkage blocking scorecard — pair
    RECALL (every gold entity inside its mention's candidate set; the
    blocking must never lose the true match) and REDUCTION RATIO
    (candidate pairs vs the mentions x entities cross product the
    blocking avoids).  Reference parity: the ANN lookup + ranking cut
    of ``index.py:652-719`` is exactly a blocking stage; this is its
    standard evaluation.  Asserts recall == 1.0."""
    from sbb_ned_ray.sources.pages import read_kb_table, read_pages, \
        read_redirects
    from sbb_ned_ray.stages.candidates import CandidateGenerator
    from sbb_ned_ray.stages.extract import extracted_pages
    from sbb_ned_ray.stages.mentions import detect_mentions
    from sbb_ned_ray.state.alias_index import build_alias_index
    import pyarrow.parquet as pq

    cfg = PipelineConfig()
    pages_dir = pages_dir_for_sf(sf_dir)
    kb = read_kb_table(pages_dir)
    index_ref = ray.put(build_alias_index(
        kb, cfg, redirects=read_redirects(pages_dir)))
    pages = extracted_pages(read_pages(pages_dir, columns=["url", "html"]))
    # materialize ONCE: consumed by both the candidate pass and the
    # gold-alignment pass (Datasets re-execute per consumption)
    mentions = detect_mentions(pages, index_ref,
                               as_tasks=True).materialize()

    def gen(t: pa.Table) -> pa.Table:
        return CandidateGenerator(ray.get(index_ref), cfg)(t) \
            .select(["url", "mention_id", "qid"])

    cands = mentions.map_batches(gen, batch_format="pyarrow").to_pandas()
    found = mentions.select_columns(
        ["url", "mention_id", "sent_no", "tok_start"]).to_pandas()
    gt = pq.read_table(
        f"{pages_dir}/mentions_gt.parquet",
        columns=["url", "sent_no", "tok_start", "qid"]).to_pandas()
    gold = found.merge(gt, on=["url", "sent_no", "tok_start"])
    hit = gold.merge(cands.drop_duplicates(),
                     on=["url", "mention_id", "qid"], how="left",
                     indicator=True)
    recall = float((hit["_merge"] == "both").mean())
    assert recall == 1.0, f"blocking lost gold matches: recall={recall}"
    n_mentions = int(found[["url", "mention_id"]]
                     .drop_duplicates().shape[0])
    n_entities = int(kb.num_rows)
    n_pairs = int(len(cands))
    rr = 1.0 - n_pairs / (n_mentions * n_entities)
    return pd.DataFrame([{
        "n_mentions": n_mentions, "n_entities": n_entities,
        "n_candidate_pairs": n_pairs,
        "recall_e6": int(recall * 1e6 + 0.5),
        "reduction_ratio_e6": int(rr * 1e6 + 0.5)}])


def events_value_quantiles_per_type(sf_dir: str):
    """SELF-CHECKING (approximate, no SQL twin): per-group DDSketch
    quantiles — (group, bucket, n) histogram partials through ONE
    narrow groupby, shuffle volume independent of row count.  Asserts
    the alpha=1% relative-error guarantee per group against the exact
    quantiles."""
    from sbb_ned_ray.stages.sketches import dd_quantiles_per_group
    alpha = 0.01
    ds = _read_split(sf_dir, "events",
                     ["event_type", "value"]).materialize()
    out = dd_quantiles_per_group(ds, "event_type", "value",
                                 qs=(0.5, 0.99), alpha=alpha)
    exact = ds.to_pandas()
    rows = []
    for _, r in out.iterrows():
        vals = np.sort(
            exact.loc[exact["event_type"] == r["event_type"],
                      "value"].to_numpy())
        true = vals[max(int(np.ceil(r["q"] * len(vals))), 1) - 1]
        rel = abs(r["estimate"] - true) / true if true else 0.0
        assert rel <= alpha + 1e-9, (r["event_type"], r["q"],
                                     r["estimate"], true)
        rows.append({"event_type": r["event_type"],
                     "q_e2": int(r["q"] * 100 + 0.5),
                     "estimate_e6": int(r["estimate"] * 1e6 + 0.5),
                     "exact_e6": int(true * 1e6 + 0.5),
                     "rel_err_e6": int(rel * 1e6 + 0.5)})
    return pd.DataFrame(rows)


def embedding_kmeans(sf_dir: str, k: int = 8):
    """SELF-CHECKING (iterative, no SQL twin): full-corpus distributed
    Lloyd's k-means over the embeddings table — broadcast centroids,
    per-batch vectorized assignment, k partial (sum, count, inertia)
    rows per block.  Asserts the Lloyd invariants: inertia
    non-increasing across iterations and cluster counts summing to n.
    Deterministic (first-k init, float64 accumulation) so the driver's
    rows-only re-run check is stable."""
    from sbb_ned_ray.stages.similarity import kmeans_distributed
    ds = _read_split(sf_dir, "embeddings",
                     ["vec_id", "embedding"], nblocks=8).materialize()
    n = ds.count()
    cents, counts, trace = kmeans_distributed(ds, k=k, max_iters=8)
    assert all(b <= a + 1e-6 for a, b in zip(trace, trace[1:])), trace
    assert int(counts.sum()) == n, (counts.sum(), n)
    return pd.DataFrame({
        "cluster": np.arange(k, dtype=np.int64),
        "n_points": counts.astype(np.int64),
        "centroid_norm_e6": np.floor(
            np.linalg.norm(cents, axis=1) * 1e6 + 0.5).astype(np.int64),
        "final_inertia_e2": np.int64(int(trace[-1] * 100 + 0.5)),
        "n_iters": np.int64(len(trace)),
    })


def heavy_hitter_users_per_type(sf_dir: str, k: int = 24):
    """SELF-CHECKING (approximate, no SQL twin): per-group Misra-Gries
    — the heaviest users within each event_type, merged in map_groups
    with the same guarantee-preserving finalize as the global sketch.
    Asserts the per-group MG guarantee against exact counts."""
    from sbb_ned_ray.stages.sketches import heavy_hitters_per_group
    ds = _read_split(sf_dir, "events",
                     ["event_type", "user_id"]).materialize()
    out = heavy_hitters_per_group(ds, "event_type", "user_id", k=k)
    exact = ds.to_pandas()
    for g, sub in out.groupby("event_type"):
        true = exact.loc[exact["event_type"] == g, "user_id"] \
            .astype(str).value_counts()
        n_g = int(sub["n_group"].iloc[0])
        assert n_g == int(true.sum()), (g, n_g)
        est = dict(zip(sub["item"], sub["est"]))
        bound = int(sub["max_undercount"].iloc[0])
        for item, cnt in true.items():
            if cnt > n_g / (k + 1):
                assert item in est, (g, item, cnt)
        for item, e in est.items():
            t = int(true.get(item, 0))
            assert e <= t <= e + bound, (g, item, e, t)
    out = out.copy()
    out["item"] = out["item"].astype(str)
    return out.sort_values(["event_type", "est", "item"],
                           ascending=[True, False, True]) \
        .reset_index(drop=True)


ORACLE_CONTEXT_MATRIX = """
SELECT t.label,
       CAST(c.n_links AS BIGINT) AS n_links,
       t.dim,
       CAST(SUM(t.q) AS BIGINT)  AS sum_e6
FROM (
  SELECT label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1 AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS q
  FROM embeddings
) t
JOIN (SELECT label AS l2, CAST(COUNT(*) AS BIGINT) AS n_links
      FROM embeddings GROUP BY label) c ON c.l2 = t.label
GROUP BY t.label, c.n_links, t.dim
ORDER BY t.label, t.dim
"""


def entity_context_matrix(sf_dir: str):
    """Context-matrix accumulation (reference ``cli.py:226-238``): the
    per-entity SUM of context embedding vectors plus the link count,
    as per-batch combiner partials + one narrow groupby — the
    driver-side ``context_emb[idx] += vec`` loop made distributed.
    Long format ``(label, n_links, dim, sum_e6)`` for the oracle;
    elements quantized e6 on both sides so sums are order-exact."""
    from sbb_ned_ray.stages.similarity import context_matrix
    ds = _read_split(sf_dir, "embeddings", ["label", "embedding"],
                     nblocks=8)
    cm = context_matrix(ds, "label", "embedding", scale=1e6).to_pandas()
    rows = []
    for _, r in cm.iterrows():
        v = np.asarray(r["sum_vec"], dtype=np.int64)
        rows.append(pd.DataFrame({
            "label": np.full(len(v), r["label"]),
            "n_links": np.full(len(v), int(r["n_links"]), np.int64),
            "dim": np.arange(len(v), dtype=np.int64),
            "sum_e6": v,
        }))
    return pd.concat(rows, ignore_index=True) \
        .sort_values(["label", "dim"]).reset_index(drop=True)


def link_graph_pagerank(sf_dir: str):
    """SELF-CHECKING entity popularity prior: weighted PageRank over
    the host ↔ entity bipartite link graph (the global-structure
    version of the reference's link-count a-priori probability,
    ``qurator/sbb_ned/ground_truth/data_processor.py``; the same shape
    as Common Crawl's host-centrality rankings).  BOTH distributed
    paths — broadcast-ranks (edges never move, node vector ships per
    iteration) and co-shuffle (rank ⋈ edges → groupby(dst), for node
    sets too big to broadcast) — must match the dense numpy reference;
    total rank mass must be 1.  The asserts ARE the check (iterative —
    no SQL twin)."""
    from sbb_ned_ray.stages.graph import (bipartite_link_edges, pagerank,
                                          pagerank_np)
    pages_dir = pages_dir_for_sf(sf_dir)

    def add_host(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"host": df["url"].str.split("/").str[2],
                             "qid": df["qid"]})

    links = ray.data.read_parquet(
        f"{pages_dir}/mentions_gt.parquet",
        columns=["url", "qid"]).map_batches(add_host,
                                            batch_format="pandas")
    g = bipartite_link_edges(links, "host", "qid")
    iters = 15
    want = pagerank_np(*g["edges_np"], g["n_nodes"], iters=iters)
    got_b = pagerank(g["edges"], g["n_nodes"], iters=iters,
                     method="broadcast").to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    # the co-shuffle leg pays a fixed 3-exchange cost per iteration —
    # parity-check it at fewer iterations against its own reference
    # (the per-iteration recurrence is identical, so 5 green
    # iterations pin the same code path 15 would)
    it_s = 5
    want_s = pagerank_np(*g["edges_np"], g["n_nodes"], iters=it_s)
    got_s = pagerank(g["edges"], g["n_nodes"], iters=it_s,
                     method="shuffle", num_partitions=4).to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    assert len(got_b) == g["n_nodes"] == len(got_s)
    assert np.allclose(got_b["rank"].to_numpy(), want, rtol=0, atol=1e-12)
    assert np.allclose(got_s["rank"].to_numpy(), want_s, rtol=0, atol=1e-9)
    assert abs(float(want.sum()) - 1.0) < 1e-9
    # top entities by prior (right-side nodes), deterministic order
    n_left = g["n_left"]
    ent = got_b[got_b["node_id"] >= n_left].copy()
    ent["qid"] = [g["right_values"][int(i) - n_left]
                  for i in ent["node_id"]]
    ent["rank_e9"] = np.round(ent["rank"].to_numpy() * 1e9).astype(np.int64)
    return ent.sort_values(["rank_e9", "qid"],
                           ascending=[False, True]).head(20)[
        ["qid", "rank_e9"]].reset_index(drop=True)


def host_graph_harmonic(sf_dir: str):
    """SELF-CHECKING harmonic centrality over the host ↔ entity link
    graph via HyperBall (Boldi & Vigna 2013 — the Common-Crawl host
    ranking shape): one small HLL counter per node, one edge sweep per
    radius, no all-pairs BFS.  The check: exact BFS harmonic
    centrality on a deterministic sample of entity nodes must sit
    within HLL error of the estimates (median relative error well
    under the 1.04/sqrt(2**p) band), and the estimated top hubs must
    contain the exact top hubs.  The asserts ARE the check (iterative
    + approximate — no SQL twin)."""
    from sbb_ned_ray.stages.graph import (bipartite_link_edges,
                                          harmonic_centrality,
                                          harmonic_centrality_exact)
    pages_dir = pages_dir_for_sf(sf_dir)

    def add_host(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"host": df["url"].str.split("/").str[2],
                             "qid": df["qid"]})

    links = ray.data.read_parquet(
        f"{pages_dir}/mentions_gt.parquet",
        columns=["url", "qid"]).map_batches(add_host,
                                            batch_format="pandas")
    g = bipartite_link_edges(links, "host", "qid")
    n, n_left = g["n_nodes"], g["n_left"]
    est = harmonic_centrality(g["edges"], n, p=10, max_iters=32)

    src, dst, _ = g["edges_np"]
    ent_ids = np.arange(n_left, n, dtype=np.int64)
    targets = ent_ids[::max(1, len(ent_ids) // 40)][:40]
    want = harmonic_centrality_exact(src, dst, n, targets=targets)
    pos = want > 0
    rel = np.abs(est[targets][pos] - want[pos]) / want[pos]
    assert len(rel) and float(np.median(rel)) < 0.08, \
        float(np.median(rel))
    # the exact top-3 of the sampled targets must land in the
    # estimate's top-10 of the same sample (rank agreement)
    top_want = set(targets[np.argsort(-want)[:3]].tolist())
    top_est = set(targets[np.argsort(-est[targets])[:10]].tolist())
    assert top_want <= top_est, (top_want, top_est)
    ent = pd.DataFrame({"node_id": ent_ids,
                        "qid": g["right_values"],
                        "harmonic_e6": np.round(
                            est[ent_ids] * 1e6).astype(np.int64)})
    return ent.sort_values(["harmonic_e6", "qid"],
                           ascending=[False, True]).head(10)[
        ["qid", "harmonic_e6"]].reset_index(drop=True)


def _entity_links(sf_dir: str):
    """(url, qid) mention rows from the ground-truth fixture — the
    membership table behind the co-occurrence graph family."""
    pages_dir = pages_dir_for_sf(sf_dir)
    return ray.data.read_parquet(f"{pages_dir}/mentions_gt.parquet",
                                 columns=["url", "qid"])


_COOC_SQL_PREFIX = """
WITH hq AS (SELECT DISTINCT url, qid FROM read_parquet('{path}')),
gd AS (SELECT url, count(*) AS c FROM hq GROUP BY url),
hq2 AS (SELECT hq.* FROM hq JOIN gd USING(url) WHERE gd.c <= 64),
deg AS (SELECT qid, count(*) AS d FROM hq2 GROUP BY qid),
p AS (SELECT a.qid AS qa, b.qid AS qb, count(*) AS w
      FROM hq2 a JOIN hq2 b ON a.url = b.url AND a.qid < b.qid
      GROUP BY 1, 2)
"""


def _cooc_fixture_path(sf_dir: str) -> str:
    import os as _os

    from sbb_ned_ray.fixtures.generator import spec_for_sf
    return _os.path.join("/tmp/sbb_ned_ray_fixtures",
                         spec_for_sf(sf_dir).fingerprint(),
                         "mentions_gt.parquet")


def _oracle_entity_cooc(sf_dir: str = "/root/testdata/sf0.01") -> str:
    return _COOC_SQL_PREFIX.format(path=_cooc_fixture_path(sf_dir)) + """
SELECT qa AS qid_a, qb AS qid_b, w FROM p WHERE w >= 2
ORDER BY qid_a, qid_b
"""


def _oracle_entity_jaccard(sf_dir: str = "/root/testdata/sf0.01") -> str:
    return _COOC_SQL_PREFIX.format(path=_cooc_fixture_path(sf_dir)) + """
SELECT qa AS qid_a, qb AS qid_b, w AS inter, da.d + db.d - w AS uni
FROM p JOIN deg da ON da.qid = qa JOIN deg db ON db.qid = qb
WHERE w >= 2
ORDER BY qid_a, qid_b
"""


def _oracle_entity_triangles(sf_dir: str = "/root/testdata/sf0.01") -> str:
    return _COOC_SQL_PREFIX.format(path=_cooc_fixture_path(sf_dir)) + """
, e AS (SELECT qa, qb FROM p WHERE w >= 2)
SELECT (SELECT count(*) FROM (SELECT qa AS x FROM e UNION SELECT qb FROM e))
           AS n_nodes,
       (SELECT count(*) FROM e) AS n_edges,
       (SELECT count(*) FROM e e1
          JOIN e e2 ON e2.qa = e1.qa AND e2.qb > e1.qb
          JOIN e e3 ON e3.qa = e1.qb AND e3.qb = e2.qb) AS triangles
"""


def entity_cooc_graph(sf_dir: str):
    """Entity co-occurrence (co-mention) graph: qid pairs mentioned on
    ≥2 common pages, with the shared-page count as the edge weight —
    the Milne-Witten-style relatedness projection of the link graph
    (the global-structure sibling of the reference's link-count
    a-priori statistics, ``qurator/sbb_ned/ground_truth/
    data_processor.py``).  Oracle-checked (integer weights, exact)."""
    from sbb_ned_ray.stages.graph import cooccurrence_edges
    edges = cooccurrence_edges(_entity_links(sf_dir), "url", "qid",
                               min_weight=2).to_pandas()
    edges = edges.rename(columns={"node_a": "qid_a", "node_b": "qid_b"})
    return edges.sort_values(["qid_a", "qid_b"]).reset_index(drop=True)


def entity_jaccard_relatedness(sf_dir: str):
    """Neighbor-set Jaccard relatedness over page membership: for qid
    pairs sharing ≥2 pages, exact |pages(a) ∩ pages(b)| and
    |pages(a) ∪ pages(b)| (the relatedness score inter/uni is
    derivable; integers keep the oracle contract rounding-free).
    Oracle-checked."""
    from sbb_ned_ray.stages.graph import jaccard_relatedness
    rel = jaccard_relatedness(_entity_links(sf_dir), "url", "qid",
                              min_inter=2).to_pandas()
    rel = rel.rename(columns={"node_a": "qid_a", "node_b": "qid_b"})
    return rel.sort_values(["qid_a", "qid_b"]).reset_index(drop=True)


def _oracle_entity_components(sf_dir: str = "/root/testdata/sf0.01") -> str:
    # min-label walk with the lab < dst prune: complete for the
    # component MINIMUM because the global min's propagation path is
    # never pruned (every hop lands on a larger node id), while the
    # prune keeps the closure table linear-ish instead of
    # sum-of-component-size².
    prefix = _COOC_SQL_PREFIX.format(path=_cooc_fixture_path(sf_dir))
    return prefix.replace("WITH hq AS", "WITH RECURSIVE hq AS", 1) + """
, e AS (SELECT qa AS s, qb AS d FROM p WHERE w >= 2
        UNION ALL SELECT qb, qa FROM p WHERE w >= 2),
nodes AS (SELECT DISTINCT s AS node FROM e),
walk(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.d, walk.lab FROM walk JOIN e ON e.s = walk.node
  WHERE walk.lab < e.d
)
SELECT node AS qid, min(lab) AS comp FROM walk GROUP BY node
ORDER BY qid
"""


def entity_cooc_components(sf_dir: str):
    """Connected components of the co-occurrence graph via the
    DISTRIBUTED min-label propagation
    (:func:`sbb_ned_ray.stages.cluster.label_propagation_components` —
    per iteration one bucketed co-shuffle join + one groupby, only the
    changed-count scalar on the driver).  ORACLE-checked against a
    DuckDB recursive-CTE min-label walk — the label-propagation path's
    first hash-exact twin (its other users only parity-test it against
    driver union-find)."""
    from sbb_ned_ray.stages.cluster import label_propagation_components
    from sbb_ned_ray.stages.graph import cooccurrence_edges
    edges = cooccurrence_edges(_entity_links(sf_dir), "url", "qid",
                               min_weight=2)
    comp = label_propagation_components(edges, src="node_a",
                                        dst="node_b", max_iters=64)
    df = comp.to_pandas().rename(columns={"node": "qid",
                                          "component": "comp"})
    return df.sort_values("qid").reset_index(drop=True)


def entity_cooc_components_altstar(sf_dir: str):
    """Connected components of the co-occurrence graph via the
    ALTERNATING large-star/small-star algorithm
    (:func:`sbb_ned_ray.stages.cluster.alternating_components`,
    Kiveris et al. SoCC'14) — O(log² n) rounds independent of graph
    diameter, the scale path for chain-shaped duplicate graphs where
    min-label propagation needs O(diameter) iterations.  Same DuckDB
    recursive-CTE oracle as `entity_cooc_components`, so the two
    distributed algorithms are pinned hash-exact to one twin."""
    from sbb_ned_ray.stages.cluster import alternating_components
    from sbb_ned_ray.stages.graph import cooccurrence_edges
    edges = cooccurrence_edges(_entity_links(sf_dir), "url", "qid",
                               min_weight=2)
    comp = alternating_components(edges, src="node_a", dst="node_b")
    df = comp.to_pandas().rename(columns={"node": "qid",
                                          "component": "comp"})
    return df.sort_values("qid").reset_index(drop=True)


def entity_cooc_clustering(sf_dir: str):
    """Per-node triangle participation + graph degree over the entity
    co-occurrence graph — the exact-integer substrate of the local
    clustering coefficient ``2·tri/(deg·(deg−1))``
    (:func:`sbb_ned_ray.stages.graph.node_triangle_counts`: the
    wedge-closure exchange of `entity_cooc_triangles` with openers
    carried, so every closed triangle credits its three corners).
    ORACLE-checked against a DuckDB three-way edge self-join."""
    from sbb_ned_ray.stages.graph import (cooccurrence_edges,
                                          node_triangle_counts)
    edges = cooccurrence_edges(_entity_links(sf_dir), "url", "qid",
                               min_weight=2)
    out = node_triangle_counts(edges)
    return out.rename(columns={"node": "qid"})


def _oracle_entity_clustering(sf_dir: str = "/root/testdata/sf0.01"
                              ) -> str:
    return _COOC_SQL_PREFIX.format(path=_cooc_fixture_path(sf_dir)) + """
, e2 AS (SELECT qa AS u, qb AS v FROM p WHERE w >= 2),
und AS (SELECT u, v FROM e2 UNION ALL SELECT v, u FROM e2),
dg AS (SELECT u AS node, count(*) AS deg FROM und GROUP BY 1),
tr AS (SELECT e1.u AS x, e1.v AS y, eb.v AS z
       FROM e2 e1 JOIN e2 eb ON eb.u = e1.u AND e1.v < eb.v
       JOIN e2 e3 ON e3.u = e1.v AND e3.v = eb.v),
tn AS (SELECT x AS node FROM tr UNION ALL SELECT y FROM tr
       UNION ALL SELECT z FROM tr),
tc AS (SELECT node, count(*) AS tri FROM tn GROUP BY 1)
SELECT dg.node AS qid, coalesce(tc.tri, 0) AS tri, dg.deg
FROM dg LEFT JOIN tc USING (node) ORDER BY qid
"""


def entity_cooc_kcore(sf_dir: str, k: int = 3):
    """The ``k``-core of the entity co-occurrence graph (Seidman 1983)
    via distributed iterative peeling
    (:func:`sbb_ned_ray.stages.graph.kcore_nodes`) — the dense-seed
    extractor of community detection over the same graph the
    relatedness family reads.  ORACLE-checked against a DuckDB
    recursive CTE that carries the shrinking survivor set as a LIST
    column and peels until fixpoint."""
    from sbb_ned_ray.stages.graph import cooccurrence_edges, kcore_nodes
    edges = cooccurrence_edges(_entity_links(sf_dir), "url", "qid",
                               min_weight=2)
    out = kcore_nodes(edges, k)
    return out.rename(columns={"node": "qid"})


def _oracle_entity_kcore(sf_dir: str = "/root/testdata/sf0.01") -> str:
    prefix = _COOC_SQL_PREFIX.format(path=_cooc_fixture_path(sf_dir))
    return prefix.replace("WITH hq AS", "WITH RECURSIVE hq AS", 1) + """
, e AS (SELECT qa AS u, qb AS v FROM p WHERE w >= 2
        UNION ALL SELECT qb, qa FROM p WHERE w >= 2),
peel(i, nodes) AS (
  SELECT 0, list(DISTINCT u ORDER BY u) FROM e
  UNION ALL
  SELECT i + 1, nxt FROM (
    SELECT i, nodes,
           (SELECT coalesce(list(u ORDER BY u), [])
            FROM (SELECT u FROM e
                  WHERE list_contains(pl.nodes, u)
                    AND list_contains(pl.nodes, v)
                  GROUP BY u HAVING count(*) >= 3)) AS nxt
    FROM peel pl)
  WHERE nxt <> nodes
),
final AS (SELECT nodes FROM peel ORDER BY i DESC LIMIT 1),
core AS (SELECT unnest(nodes) AS qid FROM final)
SELECT c.qid, (SELECT count(*) FROM e
               WHERE e.u = c.qid
                 AND e.v IN (SELECT qid FROM core)) AS core_degree
FROM core c ORDER BY qid
"""


def _oracle_ned_contingency(sf_dir: str = "/root/testdata/sf0.01") -> str:
    # the deterministic fixture links every mention to its gold qid, so
    # the pred × gold contingency is exactly diagonal with the per-qid
    # mention counts — the Ray side must REPRODUCE that diagonal from
    # the real pipeline output joined back to the ground truth
    return f"""
SELECT qid AS pred_qid, qid AS gold_qid, count(*) AS n
FROM read_parquet('{_cooc_fixture_path(sf_dir)}')
GROUP BY qid
ORDER BY pred_qid
"""


def _gold_assignment(pages_dir: str) -> ray.data.Dataset:
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": df["url"].astype(str) + "\x1f"
            + df["mention_id"].astype(str),
            "label": df["qid"].astype(str)})
    return ray.data.read_parquet(
        f"{pages_dir}/mentions_gt.parquet",
        columns=["url", "mention_id", "qid"]) \
        .map_batches(fn, batch_format="pandas")


def ned_cluster_contingency(sf_dir: str):
    """Pred × gold contingency cells of the flagship links — the
    distributed substrate for every extrinsic clustering metric
    (B-cubed, ARI, purity): links stay a Dataset, the gold assignment
    co-shuffles against them on an int32 hash bucket, and only the
    vocabulary-sized cell table reaches the driver.  Oracle-exact
    (diagonal with per-qid mention counts on the deterministic
    fixture)."""
    from sbb_ned_ray.pipelines.ned import build_ned_links, top_links
    from sbb_ned_ray.stages.cluster import contingency_cells
    pages_dir = pages_dir_for_sf(sf_dir)
    links = top_links(build_ned_links(pages_dir, PipelineConfig()))
    pred = links.map_batches(
        lambda df: pd.DataFrame({"key": df["mention_key"],
                                 "label": df["qid"].astype(str)}),
        batch_format="pandas")
    cells = contingency_cells(pred, _gold_assignment(pages_dir)) \
        .to_pandas()
    cells = cells.rename(columns={"pred": "pred_qid", "gold": "gold_qid"})
    return cells.sort_values(["pred_qid", "gold_qid"]) \
        .reset_index(drop=True)


def _bcubed_reference(pred: np.ndarray, gold: np.ndarray) -> tuple:
    """Independent per-item B³ (Counter maps, item-order summation) —
    the self-check twin for the cells formula."""
    from collections import Counter
    pc: Counter = Counter(pred.tolist())
    gc: Counter = Counter(gold.tolist())
    cc: Counter = Counter(zip(pred.tolist(), gold.tolist()))
    n = len(pred)
    prec = sum(cc[(p, g)] / pc[p] for p, g in zip(pred, gold)) / n
    rec = sum(cc[(p, g)] / gc[g] for p, g in zip(pred, gold)) / n
    return prec, rec


def ned_cluster_quality(sf_dir: str):
    """SELF-CHECKING extrinsic cluster quality: (1) the flagship links
    must score EXACTLY B³ = ARI = 1.0 against the gold qid clustering;
    (2) on a deterministically corrupted assignment (~10 % of mentions
    split into satellite clusters) the distributed cells path must
    match an independent per-item driver reference to 1e-9 and score
    strictly below 1.  The asserts ARE the check (metrics are pure
    functions of the oracle-checked contingency — see
    ``ned_cluster_contingency``)."""
    from sbb_ned_ray.pipelines.ned import run_ned
    from sbb_ned_ray.stages.cluster import (adjusted_rand_from_cells,
                                            bcubed_from_cells,
                                            contingency_cells)
    pages_dir = pages_dir_for_sf(sf_dir)
    gt = pd.read_parquet(f"{pages_dir}/mentions_gt.parquet",
                         columns=["url", "mention_id", "qid"])
    key = gt["url"].astype(str) + "\x1f" + gt["mention_id"].astype(str)
    gold_lab = gt["qid"].astype(str)
    gold = ray.data.from_pandas(
        pd.DataFrame({"key": key, "label": gold_lab}))

    # corrupted assignment: stable-hash 10 % of mentions into per-qid
    # satellite clusters (precision AND recall both drop)
    h = pd.util.hash_pandas_object(key, index=False).to_numpy()
    pred_lab = gold_lab.copy()
    mask = (h % 10) == 0
    pred_lab[mask] = gold_lab[mask] + "!" \
        + pd.Series((h[mask] >> 4) % 3).astype(str).to_numpy()
    pred = ray.data.from_pandas(
        pd.DataFrame({"key": key, "label": pred_lab}))
    cells = contingency_cells(pred, gold).to_pandas()
    b = bcubed_from_cells(cells)
    ari = adjusted_rand_from_cells(cells)
    rp, rr = _bcubed_reference(pred_lab.to_numpy(), gold_lab.to_numpy())
    assert abs(b["precision"] - rp) < 1e-9, (b["precision"], rp)
    assert abs(b["recall"] - rr) < 1e-9, (b["recall"], rr)
    assert b["f1"] < 1.0 and ari < 1.0, (b, ari)

    # flagship: perfect clustering on the deterministic fixture
    links = run_ned(pages_dir, PipelineConfig())
    fl_pred = ray.data.from_pandas(
        pd.DataFrame({"key": links["mention_key"],
                      "label": links["qid"].astype(str)}))
    fl = contingency_cells(fl_pred, gold).to_pandas()
    fb = bcubed_from_cells(fl)
    fari = adjusted_rand_from_cells(fl)
    assert fb == {"precision": 1.0, "recall": 1.0, "f1": 1.0}, fb
    assert fari == 1.0, fari
    out = pd.DataFrame({
        "metric": ["flagship_bcubed_f1", "flagship_ari",
                   "corrupt_bcubed_precision", "corrupt_bcubed_recall",
                   "corrupt_ari"],
        "value_e9": np.round(np.array(
            [fb["f1"], fari, b["precision"], b["recall"], ari])
            * 1e9).astype(np.int64)})
    return out


def entity_cooc_triangles(sf_dir: str):
    """Global triangle census of the co-occurrence graph (clustering
    structure of the entity relatedness network).  Distributed
    node-iterator: wedges open at each edge's minimum vertex and close
    against the edge set in ONE co-grouped shuffle — only the final
    three scalars reach the driver.  Oracle-checked against a 3-way
    DuckDB self-join."""
    from sbb_ned_ray.stages.graph import cooccurrence_edges, triangle_stats
    stats = triangle_stats(
        cooccurrence_edges(_entity_links(sf_dir), "url", "qid",
                           min_weight=2))
    return pd.DataFrame([stats])[["n_nodes", "n_edges", "triangles"]]


def surface_edit_join(sf_dir: str):
    """All distinct mention-surface pairs within byte-level Levenshtein
    distance 2 — PassJoin segment-signature self-join
    (:mod:`sbb_ned_ray.stages.editjoin`), the exact-threshold variant
    of the reference's fuzzy surface matching (n-gram/anagram ANN
    probes, ``qurator/sbb_ned/embeddings/base.py`` consumers).
    ORACLE-checked against DuckDB's ``levenshtein()`` over the same
    fixture (byte semantics match; the pigeonhole guarantees no missed
    pair, so the check is exact, not recall-bounded)."""
    from sbb_ned_ray.stages.editjoin import edit_distance_pairs
    pages_dir = pages_dir_for_sf(sf_dir)
    surf = ray.data.read_parquet(f"{pages_dir}/mentions_gt.parquet",
                                 columns=["surface"])
    out = edit_distance_pairs(surf, "surface", k=2).to_pandas()
    return out.sort_values(["s_a", "s_b"]).reset_index(drop=True)


def _oracle_surface_editjoin(sf_dir: str = "/root/testdata/sf0.01") -> str:
    return f"""
WITH d AS (SELECT DISTINCT surface AS s
           FROM read_parquet('{_cooc_fixture_path(sf_dir)}'))
SELECT a.s AS s_a, b.s AS s_b, levenshtein(a.s, b.s) AS dist
FROM d a JOIN d b ON a.s < b.s
WHERE levenshtein(a.s, b.s) <= 2
ORDER BY s_a, s_b
"""


def customers_sorted_neighborhood(sf_dir: str, window: int = 5):
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD 1995)
    over customers ordered by ``(c_mktsegment, c_custkey)``: every
    record pairs with its ``window - 1`` rank successors.  The
    reference blocks candidates per surface via normalized-key lookups
    (``qurator/sbb_ned/embeddings/base.py`` consumers); SNM is the
    sort-based blocking family, here as one Ray sort + a two-pass rank
    scan + a tiny window-bucket exchange
    (:func:`sbb_ned_ray.stages.blockjoin.sorted_neighborhood_pairs`).
    ORACLE-checked against a ROW_NUMBER self-join."""
    from sbb_ned_ray.stages.blockjoin import sorted_neighborhood_pairs
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    out = sorted_neighborhood_pairs(cust, "c_mktsegment", "c_custkey",
                                    window).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


ORACLE_SORTED_NEIGHBORHOOD = """
WITH r AS (SELECT c_custkey AS id,
                  ROW_NUMBER() OVER (ORDER BY c_mktsegment, c_custkey)
                      AS rn
           FROM customer)
SELECT a.id AS id_a, b.id AS id_b, (b.rn - a.rn) AS rank_dist
FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 5
ORDER BY id_a, id_b
"""


def docs_shingle_jaccard(sf_dir: str, threshold: float = 0.5,
                         shingle_n: int = 3):
    """EXACT word-3-gram-shingle Jaccard ≥ 0.5 similarity self-join
    over documents via the prefix filter (Chaudhuri/Ganti/Kaushik
    ICDE 2006; PPJoin, Xiao et al. WWW 2008) — the exact-threshold
    counterpart of the MinHash-LSH estimate the reference's blocking
    role approximates
    (:func:`sbb_ned_ray.stages.blockjoin.shingle_jaccard_pairs`).
    ORACLE-checked against a DuckDB unnest + self-join recomputation
    (jaccard quantized to 1e-6 by the same integer round-half-up on
    both sides)."""
    from sbb_ned_ray.stages.blockjoin import shingle_jaccard_pairs
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    out = shingle_jaccard_pairs(docs, "text", "doc_id", threshold,
                                shingle_n).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _cosine_max_df(sf_dir: str) -> int:
    """df prune for the token-cosine join: 10% of the corpus (floor
    50) — a FRACTIONAL stop-token cap so the operator's pair recall is
    scale-invariant (an absolute cap silently empties the join as the
    corpus grows; both engines compute the same number from the
    parquet row count)."""
    import pyarrow.parquet as _pq
    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return max(50, n // 10)


def docs_token_cosine(sf_dir: str, threshold_e6: int = 800_000):
    """EXACT token-count cosine ≥ 0.8 similarity self-join over the
    documents table, restricted to tokens with document frequency
    ≤ max(50, 10% of corpus) — the stop-token prune of Bayardo et al.
    WWW 2007 (:func:`sbb_ned_ray.stages.blockjoin.token_cosine_pairs`).
    ORACLE-checked hash-exact: output columns are the integer dot and
    squared norms over the pruned vocabulary; both engines test the
    threshold by arbitrary-precision integer cross-multiplication
    (Python ints / HUGEINT)."""
    from sbb_ned_ray.stages.blockjoin import token_cosine_pairs
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    out = token_cosine_pairs(docs, "text", "doc_id", threshold_e6,
                             _cosine_max_df(sf_dir)).to_pandas()
    if out.empty:
        out = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                            ["id_a", "id_b", "dot", "na2", "nb2"]})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _oracle_docs_token_cosine(sf_dir: str = "/root/testdata/sf0.01"
                              ) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id AS id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  WHERE tok <> '' GROUP BY 1, 2),
df AS (SELECT tok, count(*) AS d FROM tok GROUP BY 1),
t AS (SELECT tok.id, tok.tok, tok.c
      FROM tok JOIN df USING (tok) WHERE d <= {_cosine_max_df(sf_dir)}),
n2 AS (SELECT id, SUM(c * c) AS s FROM t GROUP BY 1),
p AS (SELECT a.id AS ia, b.id AS ib, SUM(a.c * b.c) AS dot
      FROM t a JOIN t b ON a.tok = b.tok AND a.id < b.id
      GROUP BY 1, 2)
SELECT ia AS id_a, ib AS id_b, CAST(dot AS BIGINT) AS dot,
       CAST(na.s AS BIGINT) AS na2, CAST(nb.s AS BIGINT) AS nb2
FROM p JOIN n2 na ON na.id = ia JOIN n2 nb ON nb.id = ib
WHERE CAST(dot AS HUGEINT) * dot * 1000000000000
      >= CAST(800000 AS HUGEINT) * 800000 * na.s * nb.s
ORDER BY id_a, id_b
"""


def docs_shingle_containment(sf_dir: str,
                             threshold_e6: int = 700_000):
    """EXACT word-3-gram shingle CONTAINMENT ≥ 0.7 DIRECTIONAL
    self-join over documents, restricted to shingles with df
    ≤ max(50, 10% of corpus) (Broder SEQUENCES 1997; the
    quote-inside-a-wrapper case Jaccard misses —
    :func:`sbb_ned_ray.stages.blockjoin.shingle_containment_pairs`).
    ORACLE-checked hash-exact: integer intersection + retained-set
    size columns, round-half-up e6 quantization on both sides."""
    from sbb_ned_ray.stages.blockjoin import shingle_containment_pairs
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    out = shingle_containment_pairs(
        docs, "text", "doc_id", threshold_e6,
        max_df=_cosine_max_df(sf_dir)).to_pandas()
    if out.empty:
        out = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                            ["id_a", "id_b", "inter", "m_a",
                             "containment_e6"]})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _oracle_docs_containment(sf_dir: str = "/root/testdata/sf0.01"
                             ) -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
           FROM documents),
s AS (SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) t
      WHERE len(ws) >= 3),
df AS (SELECT sh, count(*) AS d FROM s GROUP BY 1),
sk AS (SELECT s.doc_id, s.sh FROM s JOIN df USING (sh)
       WHERE d <= {_cosine_max_df(sf_dir)}),
sz AS (SELECT doc_id, count(*) AS m FROM sk GROUP BY 1),
inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
          FROM sk a JOIN sk b ON a.sh = b.sh
          AND a.doc_id <> b.doc_id GROUP BY 1, 2)
SELECT ia AS id_a, ib AS id_b, c AS inter, sa.m AS m_a,
       (c * 2000000 + sa.m) // (2 * sa.m) AS containment_e6
FROM inter JOIN sz sa ON sa.doc_id = ia
WHERE c * 1000000 >= 700000 * sa.m
ORDER BY id_a, id_b
"""


def linkage_patterns(sf_dir: str):
    """Agreement-pattern counts over all within-nationkey-block pairs
    of the deterministic dirty-records table (customers + perturbed
    duplicates) — the distributed half of Fellegi–Sunter linkage
    (:mod:`sbb_ned_ray.stages.linkage`): one vectorized bincount per
    block, a ≤ 2^k-row groupby, no pair row ever materialized.
    ORACLE-checked against a DuckDB block self-join recomputing the
    same four binary comparisons."""
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            patterns_table)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))
    return patterns_table(recs)


def linkage_em_quality(sf_dir: str):
    """Unsupervised Fellegi–Sunter EM over the pattern table +
    classification quality vs the known entity ids (read off the
    (pattern, gt) contingency — never per-pair).  Self-checking:
    asserts the EM log-likelihood trace is monotone and that the
    UNSUPERVISED match/non-match split recovers the planted
    duplicates at precision ≥ 0.95 and recall ≥ 0.9.  The reference's
    decider (``qurator/sbb_ned/models/decider.py``) is the supervised
    counterpart of this scoring."""
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            linkage_quality)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))
    out = linkage_quality(recs)
    assert int(out["ll_monotone"].iloc[0]) == 1
    assert int(out["precision_e6"].iloc[0]) >= 950_000, \
        out["precision_e6"].iloc[0]
    assert int(out["recall_e6"].iloc[0]) >= 900_000, \
        out["recall_e6"].iloc[0]
    return out


def _oracle_linkage_patterns(sf_dir: str = "/root/testdata/sf0.01"
                             ) -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    return f"""
WITH r AS (SELECT * FROM read_parquet('{dirty_records_path(sf_dir)}')),
p AS (SELECT CAST(a.name = b.name AS BIGINT) AS name_exact,
             CAST(right(a.name, 4) = right(b.name, 4) AS BIGINT)
                 AS name_sfx4,
             CAST(a.segment = b.segment AS BIGINT) AS seg_exact,
             CAST(abs(a.acctbal - b.acctbal) < 0.05 AS BIGINT)
                 AS bal_close
      FROM r a JOIN r b
        ON a.nationkey = b.nationkey AND a.rec_id < b.rec_id)
SELECT name_exact, name_sfx4, seg_exact, bal_close,
       count(*) AS n_pairs
FROM p
GROUP BY 1, 2, 3, 4
ORDER BY name_exact, name_sfx4, seg_exact, bal_close
"""


def linkage_patterns_jw3(sf_dir: str):
    """Agreement patterns with Winkler's 3-LEVEL string comparator on
    the name field (JW ≥ 0.95 → 2, ≥ 0.85 → 1, else 0;
    :func:`sbb_ned_ray.stages.linkage.jw3_pattern_table`) over the
    within-nationkey-block pairs.  ORACLE-checked against DuckDB's
    ``jaro_winkler_similarity`` (the Python kernel is verified
    double-identical, so the level thresholds land identically)."""
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            jw3_pattern_table)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))
    return jw3_pattern_table(recs)


def _oracle_linkage_jw3(sf_dir: str = "/root/testdata/sf0.01") -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    return f"""
WITH r AS (SELECT * FROM read_parquet('{dirty_records_path(sf_dir)}')),
p AS (SELECT CASE
          WHEN jaro_winkler_similarity(a.name, b.name) >= 0.95 THEN 2
          WHEN jaro_winkler_similarity(a.name, b.name) >= 0.85 THEN 1
          ELSE 0 END AS name_jw_level,
             CAST(a.segment = b.segment AS BIGINT) AS seg_exact,
             CAST(abs(a.acctbal - b.acctbal) < 0.05 AS BIGINT)
                 AS bal_close
      FROM r a JOIN r b
        ON a.nationkey = b.nationkey AND a.rec_id < b.rec_id)
SELECT name_jw_level, seg_exact, bal_close, count(*) AS n_pairs
FROM p GROUP BY 1, 2, 3
ORDER BY name_jw_level, seg_exact, bal_close
"""


def linkage_patterns_3state(sf_dir: str):
    """NULL-AWARE agreement patterns (Splink / FastLink missing-data
    treatment: agree / disagree / either-side-missing per field) over
    the planted-missingness fixture variant
    (:func:`sbb_ned_ray.stages.linkage.pattern3_table`).
    ORACLE-checked against a DuckDB CASE recomputation."""
    from sbb_ned_ray.stages.linkage import (missing_records_path,
                                            pattern3_table)
    recs = ray.data.read_parquet(missing_records_path(sf_dir))
    return pattern3_table(recs)


def _oracle_linkage_3state(sf_dir: str = "/root/testdata/sf0.01"
                           ) -> str:
    from sbb_ned_ray.stages.linkage import missing_records_path
    return f"""
WITH r AS (SELECT *
           FROM read_parquet('{missing_records_path(sf_dir)}')),
p AS (SELECT
        CASE WHEN a.name IS NULL OR b.name IS NULL THEN 2
             WHEN right(a.name, 4) = right(b.name, 4) THEN 1
             ELSE 0 END AS name_state,
        CASE WHEN a.segment IS NULL OR b.segment IS NULL THEN 2
             WHEN a.segment = b.segment THEN 1
             ELSE 0 END AS seg_state,
        CASE WHEN a.acctbal IS NULL OR b.acctbal IS NULL THEN 2
             WHEN abs(a.acctbal - b.acctbal) < 0.05 THEN 1
             ELSE 0 END AS bal_state
      FROM r a JOIN r b
        ON a.nationkey = b.nationkey AND a.rec_id < b.rec_id)
SELECT name_state, seg_state, bal_state, count(*) AS n_pairs
FROM p GROUP BY 1, 2, 3
ORDER BY name_state, seg_state, bal_state
"""


def linkage_clerical_pairs(sf_dir: str):
    """The Fellegi–Sunter POSSIBLE-MATCH band (the 1969 three-way
    decision rule's clerical-review queue): within-block pairs whose
    likelihood ratio under the fixed rational priors lands in
    [1/4, 4] (:func:`sbb_ned_ray.stages.linkage.clerical_pairs`).
    All-integer output ``(rec_a, rec_b, w_num, w_den)``;
    ORACLE-checked by exact integer cross-multiplication in DuckDB."""
    from sbb_ned_ray.stages.linkage import (clerical_pairs,
                                            dirty_records_path)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))
    out = clerical_pairs(recs).to_pandas()
    if out.empty:
        out = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                            ["rec_a", "rec_b", "w_num", "w_den"]})
    return out.sort_values(["rec_a", "rec_b"]).reset_index(drop=True)


def _oracle_linkage_clerical(sf_dir: str = "/root/testdata/sf0.01"
                             ) -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    return f"""
WITH r AS (SELECT * FROM read_parquet('{dirty_records_path(sf_dir)}')),
p AS (SELECT least(a.rec_id, b.rec_id) AS rec_a,
             greatest(a.rec_id, b.rec_id) AS rec_b,
             (CASE WHEN a.name = b.name THEN 9 ELSE 1 END) *
             (CASE WHEN right(a.name, 4) = right(b.name, 4)
                   THEN 9 ELSE 1 END) *
             (CASE WHEN a.segment = b.segment THEN 8 ELSE 2 END) *
             (CASE WHEN abs(a.acctbal - b.acctbal) < 0.05
                   THEN 7 ELSE 3 END) AS w_num,
             (CASE WHEN a.name = b.name THEN 1 ELSE 9 END) *
             (CASE WHEN right(a.name, 4) = right(b.name, 4)
                   THEN 4 ELSE 6 END) *
             5 *
             (CASE WHEN abs(a.acctbal - b.acctbal) < 0.05
                   THEN 6 ELSE 4 END) AS w_den
      FROM r a JOIN r b
        ON a.nationkey = b.nationkey AND a.rec_id < b.rec_id)
SELECT rec_a, rec_b, w_num, w_den
FROM p
WHERE w_num <= 4 * w_den AND w_den <= 4 * w_num
ORDER BY rec_a, rec_b
"""


_PR_THRESHOLDS = [(1, 16), (1, 4), (1, 1), (4, 1), (16, 1)]


def linkage_pr_curve(sf_dir: str):
    """Precision/recall curve of the Fellegi–Sunter decision rule
    ``W > c`` over the fixed rational priors, swept across five
    thresholds — computed ENTIRELY from the (pattern, gt) contingency
    (≤ 2^k·2 rows; the Splink scale contract — no pair row exists
    anywhere), with exact integer threshold tests and round-half-up
    e6 metrics.  ORACLE-checked against a DuckDB contingency +
    threshold cross-join twin."""
    from sbb_ned_ray.stages.linkage import (CLERICAL_M10, CLERICAL_U10,
                                            dirty_records_path,
                                            pattern_contingency)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))
    cont = pattern_contingency(recs)
    k = len(CLERICAL_M10)
    pats = cont["pattern"].to_numpy(np.int64)
    bits = (pats[:, None] >> np.arange(k)) & 1
    m10 = np.array(CLERICAL_M10, np.int64)
    u10 = np.array(CLERICAL_U10, np.int64)
    wn = np.prod(np.where(bits == 1, m10, 10 - m10), axis=1)
    wd = np.prod(np.where(bits == 1, u10, 10 - u10), axis=1)
    gt = cont["gt_match"].to_numpy(np.int64)
    n = cont["n_pairs"].to_numpy(np.int64)
    rows = []
    for cn, cd in _PR_THRESHOLDS:
        pred = wn * cd > cn * wd
        tp = int(n[pred & (gt == 1)].sum())
        fp = int(n[pred & (gt == 0)].sum())
        fn = int(n[~pred & (gt == 1)].sum())
        prec = (tp * 2_000_000 + (tp + fp)) // (2 * (tp + fp)) \
            if tp + fp else 0
        rec = (tp * 2_000_000 + (tp + fn)) // (2 * (tp + fn)) \
            if tp + fn else 0
        rows.append((cn, cd, tp, fp, fn, prec, rec))
    return pd.DataFrame(rows, columns=[
        "thr_num", "thr_den", "tp", "fp", "fn",
        "precision_e6", "recall_e6"])


def _oracle_linkage_pr(sf_dir: str = "/root/testdata/sf0.01") -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    vals = ", ".join(f"({cn}, {cd})" for cn, cd in _PR_THRESHOLDS)
    return f"""
WITH r AS (SELECT * FROM read_parquet('{dirty_records_path(sf_dir)}')),
p AS (SELECT (CASE WHEN a.name = b.name THEN 9 ELSE 1 END) *
             (CASE WHEN right(a.name, 4) = right(b.name, 4)
                   THEN 9 ELSE 1 END) *
             (CASE WHEN a.segment = b.segment THEN 8 ELSE 2 END) *
             (CASE WHEN abs(a.acctbal - b.acctbal) < 0.05
                   THEN 7 ELSE 3 END) AS wn,
             (CASE WHEN a.name = b.name THEN 1 ELSE 9 END) *
             (CASE WHEN right(a.name, 4) = right(b.name, 4)
                   THEN 4 ELSE 6 END) *
             5 *
             (CASE WHEN abs(a.acctbal - b.acctbal) < 0.05
                   THEN 6 ELSE 4 END) AS wd,
             CAST(a.entity_id = b.entity_id AS BIGINT) AS gt
      FROM r a JOIN r b
        ON a.nationkey = b.nationkey AND a.rec_id < b.rec_id),
t(cn, cd) AS (VALUES {vals}),
agg AS (SELECT cn AS thr_num, cd AS thr_den,
               SUM(CASE WHEN wn * cd > cn * wd AND gt = 1
                        THEN 1 ELSE 0 END) AS tp,
               SUM(CASE WHEN wn * cd > cn * wd AND gt = 0
                        THEN 1 ELSE 0 END) AS fp,
               SUM(CASE WHEN NOT (wn * cd > cn * wd) AND gt = 1
                        THEN 1 ELSE 0 END) AS fn
        FROM p CROSS JOIN t GROUP BY 1, 2)
SELECT thr_num, thr_den, CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
       CAST(CASE WHEN tp + fp = 0 THEN 0
            ELSE (tp * 2000000 + (tp + fp)) // (2 * (tp + fp)) END
           AS BIGINT) AS precision_e6,
       CAST(CASE WHEN tp + fn = 0 THEN 0
            ELSE (tp * 2000000 + (tp + fn)) // (2 * (tp + fn)) END
           AS BIGINT) AS recall_e6
FROM agg
ORDER BY thr_num * 1000000 // thr_den
"""


def linkage_group_match(sf_dir: str):
    """GROUP LINKAGE (On et al., ICDE 2007) between the fixture's two
    sources (base records vs planted duplicates), groups = nations,
    record match = name suffix-4 equality, group similarity = the
    deterministic coverage variant
    (:func:`sbb_ned_ray.stages.linkage.group_linkage`).
    ORACLE-checked against a DuckDB COUNT(DISTINCT) twin."""
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            group_linkage)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))
    return group_linkage(recs)


def _oracle_linkage_group(sf_dir: str = "/root/testdata/sf0.01"
                          ) -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    return f"""
WITH r AS (SELECT * FROM read_parquet('{dirty_records_path(sf_dir)}')),
a AS (SELECT rec_id, nationkey, right(name, 4) AS sfx FROM r
      WHERE rec_id % 2 = 0),
b AS (SELECT rec_id, nationkey, right(name, 4) AS sfx FROM r
      WHERE rec_id % 2 = 1),
m AS (SELECT a.nationkey AS na, b.nationkey AS nb,
             count(DISTINCT a.rec_id) AS matched_a,
             count(DISTINCT b.rec_id) AS matched_b
      FROM a JOIN b ON a.sfx = b.sfx GROUP BY 1, 2),
sa AS (SELECT nationkey, count(*) AS s FROM a GROUP BY 1),
sb AS (SELECT nationkey, count(*) AS s FROM b GROUP BY 1)
SELECT na AS nation_a, nb AS nation_b, matched_a, matched_b,
       sa.s AS size_a, sb.s AS size_b,
       ((matched_a + matched_b) * 2000000 + (sa.s + sb.s))
           // (2 * (sa.s + sb.s)) AS sim_e6
FROM m JOIN sa ON sa.nationkey = na JOIN sb ON sb.nationkey = nb
WHERE (matched_a + matched_b) * 1000000 >= 100000 * (sa.s + sb.s)
ORDER BY nation_a, nation_b
"""


def linkage_golden_records(sf_dir: str):
    """Golden-record survivorship over the dirty-records clusters
    (:func:`sbb_ned_ray.stages.linkage.survivorship`): per entity,
    mode-merge name/segment (lexicographic tiebreak), max balance,
    min nationkey, member count — one bucketed exchange on the
    cluster key.  ORACLE-checked against DuckDB window/group
    aggregates."""
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            survivorship)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))
    out = survivorship(recs, "entity_id", mode_cols=["name", "segment"],
                       max_cols=["acctbal"], min_cols=["nationkey"]) \
        .to_pandas()
    out["nationkey_min"] = out["nationkey_min"].astype("int64")
    return out.sort_values("entity_id").reset_index(drop=True)


def _oracle_linkage_golden(sf_dir: str = "/root/testdata/sf0.01") -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    return f"""
WITH r AS (SELECT * FROM read_parquet('{dirty_records_path(sf_dir)}')),
nm AS (SELECT entity_id, name,
              ROW_NUMBER() OVER (PARTITION BY entity_id
                                 ORDER BY count(*) DESC, name ASC) AS rn
       FROM r GROUP BY entity_id, name),
sg AS (SELECT entity_id, segment,
              ROW_NUMBER() OVER (PARTITION BY entity_id
                                 ORDER BY count(*) DESC, segment ASC)
                  AS rn
       FROM r GROUP BY entity_id, segment),
agg AS (SELECT entity_id, max(acctbal) AS acctbal_max,
               CAST(min(nationkey) AS BIGINT) AS nationkey_min,
               count(*) AS n_records
        FROM r GROUP BY entity_id)
SELECT a.entity_id, nm.name AS name_mode, sg.segment AS segment_mode,
       a.acctbal_max, a.nationkey_min, a.n_records
FROM agg a
JOIN nm ON nm.entity_id = a.entity_id AND nm.rn = 1
JOIN sg ON sg.entity_id = a.entity_id AND sg.rn = 1
ORDER BY a.entity_id
"""


def surface_edit_clusters(sf_dir: str):
    """Connected components of the PassJoin edit-distance-≤2 surface
    graph via distributed min-label propagation
    (:func:`sbb_ned_ray.stages.cluster.label_propagation_components`),
    i.e. fuzzy surface-form canonicalization: every clustered surface
    mapped to its component's lexicographically smallest member.
    ORACLE-checked against a DuckDB recursive-CTE min-label walk over
    ``levenshtein() <= 2`` pairs."""
    from sbb_ned_ray.stages.cluster import label_propagation_components
    from sbb_ned_ray.stages.editjoin import edit_distance_pairs
    pages_dir = pages_dir_for_sf(sf_dir)
    surf = ray.data.read_parquet(f"{pages_dir}/mentions_gt.parquet",
                                 columns=["surface"])
    pairs = edit_distance_pairs(surf, "surface", k=2)
    comp = label_propagation_components(pairs, src="s_a", dst="s_b",
                                        max_iters=64)
    df = comp.to_pandas().rename(columns={"node": "surface",
                                          "component": "canonical"})
    return df.sort_values("surface").reset_index(drop=True)


def _oracle_surface_clusters(sf_dir: str = "/root/testdata/sf0.01"
                             ) -> str:
    return f"""
WITH RECURSIVE d AS (SELECT DISTINCT surface AS s
                     FROM read_parquet('{_cooc_fixture_path(sf_dir)}')),
p AS (SELECT a.s AS sa, b.s AS sb
      FROM d a JOIN d b ON a.s < b.s
      WHERE levenshtein(a.s, b.s) <= 2),
e AS (SELECT sa AS s, sb AS t FROM p UNION ALL SELECT sb, sa FROM p),
nodes AS (SELECT DISTINCT s AS node FROM e),
walk(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.t, walk.lab FROM walk JOIN e ON e.s = walk.node
  WHERE walk.lab < e.t
)
SELECT node AS surface, min(lab) AS canonical FROM walk GROUP BY node
ORDER BY surface
"""


def meta_blocking_cnp(sf_dir: str):
    """Meta-blocking over the dirty-records table: name-trigram token
    blocking → block purging → CBS edge weights → cardinality node
    pruning (top-5 neighbors per record, OR semantics)
    (:func:`sbb_ned_ray.stages.blockjoin.meta_blocking_cnp`) — the
    web-scale comparison-pruning step between blocking and pairwise
    scoring (Papadakis et al., TKDE 2014).  ORACLE-checked against a
    DuckDB trigram-unnest + window-rank recomputation."""
    from sbb_ned_ray.stages.blockjoin import meta_blocking_cnp as cnp
    from sbb_ned_ray.stages.linkage import dirty_records_path
    recs = ray.data.read_parquet(dirty_records_path(sf_dir),
                                 columns=["rec_id", "name"])
    out = cnp(recs, "rec_id", "name", k_neighbors=5, max_block=64,
              min_weight=2).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _oracle_meta_blocking(sf_dir: str = "/root/testdata/sf0.01") -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    return f"""
WITH r AS (SELECT rec_id, name
           FROM read_parquet('{dirty_records_path(sf_dir)}')),
tok AS (SELECT DISTINCT rec_id, substr(name, i, 3) AS tg
        FROM r, LATERAL (SELECT unnest(range(1, len(name) - 1)) AS i)
            t),
bl AS (SELECT tg FROM tok GROUP BY tg HAVING count(*) <= 64),
m AS (SELECT tok.rec_id, tok.tg FROM tok JOIN bl USING (tg)),
e AS (SELECT a.rec_id AS na, b.rec_id AS nb, count(*) AS w
      FROM m a JOIN m b ON a.tg = b.tg AND a.rec_id < b.rec_id
      GROUP BY 1, 2
      HAVING count(*) >= 2),
dir AS (SELECT na AS s, nb AS d, w FROM e
        UNION ALL SELECT nb, na, w FROM e),
topk AS (SELECT s, d, w,
                ROW_NUMBER() OVER (PARTITION BY s
                                   ORDER BY w DESC, d ASC) AS rn
         FROM dir)
SELECT DISTINCT LEAST(s, d) AS id_a, GREATEST(s, d) AS id_b, w
FROM topk WHERE rn <= 5
ORDER BY id_a, id_b
"""


def linkage_fuzzy_match(sf_dir: str):
    """For every planted duplicate record, its Jaro–Winkler best-match
    original within the nationkey block
    (:func:`sbb_ned_ray.stages.linkage.fuzzy_best_match`).
    ORACLE-checked against DuckDB's ``jaro_winkler_similarity`` +
    window rank (the Python JW is double-identical to DuckDB's —
    see the stage docstring)."""
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            fuzzy_best_match)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))

    def add_side(t):
        import pyarrow.compute as pc
        side = pc.cast(pc.bit_wise_and(t["rec_id"], 1), "int32")
        return t.append_column("side", side)

    recs = recs.map_batches(add_side, batch_format="pyarrow")
    out = fuzzy_best_match(recs, "nationkey", "rec_id", "name",
                           "side").to_pandas()
    return out.sort_values("rec_id").reset_index(drop=True)


def _oracle_linkage_fuzzy(sf_dir: str = "/root/testdata/sf0.01") -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    return f"""
WITH r AS (SELECT * FROM read_parquet('{dirty_records_path(sf_dir)}')),
p AS (SELECT a.rec_id AS rid, b.rec_id AS cand,
             jaro_winkler_similarity(a.name, b.name) AS jw
      FROM r a JOIN r b ON a.nationkey = b.nationkey
      WHERE a.rec_id % 2 = 1 AND b.rec_id % 2 = 0),
rk AS (SELECT rid, cand, jw,
              ROW_NUMBER() OVER (PARTITION BY rid
                                 ORDER BY jw DESC, cand ASC) AS rn
       FROM p)
SELECT rid AS rec_id, cand AS match_id,
       CAST(floor(jw * 1000000 + 0.5) AS BIGINT) AS jw_e6
FROM rk WHERE rn = 1
ORDER BY rec_id
"""


def linkage_monge_elkan(sf_dir: str):
    """Monge–Elkan token-level best match per planted duplicate
    (:func:`sbb_ned_ray.stages.linkage.monge_elkan_best_match`):
    mean-of-best Jaro–Winkler over the probe's name tokens, the
    standard kernel for multi-word names where token order breaks
    whole-string JW.  ORACLE-checked integer-exact: each per-token max
    is e6-quantized before summation on both sides, so the DuckDB twin
    (unnest tokens → per-token max JW → weighted integer sum → window
    rank) hashes identically."""
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            monge_elkan_best_match)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))

    def add_side(t):
        import pyarrow.compute as pc
        side = pc.cast(pc.bit_wise_and(t["rec_id"], 1), "int32")
        return t.append_column("side", side)

    recs = recs.map_batches(add_side, batch_format="pyarrow")
    out = monge_elkan_best_match(recs, "nationkey", "rec_id", "name",
                                 "side").to_pandas()
    return out.sort_values("rec_id").reset_index(drop=True)


def _oracle_linkage_monge_elkan(sf_dir: str = "/root/testdata/sf0.01"
                                ) -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    # a carries per-(probe, token) multiplicity k so duplicate tokens
    # count per instance (the ME definition); b is DISTINCT because a
    # max over candidate tokens ignores duplicates
    return f"""
WITH r AS (SELECT * FROM read_parquet('{dirty_records_path(sf_dir)}')),
a AS (SELECT rec_id, nationkey, tok, count(*) AS k
      FROM (SELECT rec_id, nationkey,
                   unnest(string_split(name, ' ')) AS tok
            FROM r WHERE rec_id % 2 = 1)
      WHERE tok <> '' GROUP BY 1, 2, 3),
b AS (SELECT DISTINCT rec_id, nationkey, tok
      FROM (SELECT rec_id, nationkey,
                   unnest(string_split(name, ' ')) AS tok
            FROM r WHERE rec_id % 2 = 0)
      WHERE tok <> ''),
m AS (SELECT a.rec_id AS rid, b.rec_id AS cand, a.tok, a.k,
             max(jaro_winkler_similarity(a.tok, b.tok)) AS mx
      FROM a JOIN b ON a.nationkey = b.nationkey
      GROUP BY 1, 2, 3, 4),
s AS (SELECT rid, cand,
             SUM(k * CAST(floor(mx * 1000000 + 0.5) AS BIGINT))
                 AS me_sum_e6,
             SUM(k) AS n_tok
      FROM m GROUP BY rid, cand),
rk AS (SELECT rid, cand, me_sum_e6, n_tok,
              ROW_NUMBER() OVER (PARTITION BY rid
                                 ORDER BY me_sum_e6 DESC, cand ASC)
                  AS rn
       FROM s)
SELECT rid AS rec_id, cand AS match_id,
       CAST(me_sum_e6 AS BIGINT) AS me_sum_e6,
       CAST(n_tok AS BIGINT) AS n_tok
FROM rk WHERE rn = 1
ORDER BY rec_id
"""


def linkage_reciprocal_match(sf_dir: str):
    """One-to-one Jaro–Winkler matching: keep a (duplicate, original)
    pair only when each is the other's best match within the block
    (:func:`sbb_ned_ray.stages.linkage.reciprocal_best_match`).
    ORACLE-checked against a DuckDB twin with one window rank per
    direction joined on reciprocity."""
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            reciprocal_best_match)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))

    def add_side(t):
        import pyarrow.compute as pc
        side = pc.cast(pc.bit_wise_and(t["rec_id"], 1), "int32")
        return t.append_column("side", side)

    recs = recs.map_batches(add_side, batch_format="pyarrow")
    out = reciprocal_best_match(recs, "nationkey", "rec_id", "name",
                                "side").to_pandas()
    return out.sort_values("rec_id").reset_index(drop=True)


def _oracle_linkage_reciprocal(sf_dir: str = "/root/testdata/sf0.01"
                               ) -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    path = dirty_records_path(sf_dir)
    return f"""
WITH r AS (SELECT * FROM read_parquet('{path}')),
p AS (SELECT a.rec_id AS rid, b.rec_id AS cand,
             jaro_winkler_similarity(a.name, b.name) AS jw
      FROM r a JOIN r b ON a.nationkey = b.nationkey
      WHERE a.rec_id % 2 = 1 AND b.rec_id % 2 = 0),
f AS (SELECT rid, cand, jw,
             ROW_NUMBER() OVER (PARTITION BY rid
                                ORDER BY jw DESC, cand ASC) AS rn
      FROM p),
q AS (SELECT b.rec_id AS rid, a.rec_id AS cand,
             jaro_winkler_similarity(a.name, b.name) AS jw
      FROM r a JOIN r b ON a.nationkey = b.nationkey
      WHERE a.rec_id % 2 = 1 AND b.rec_id % 2 = 0),
g AS (SELECT rid, cand, jw,
             ROW_NUMBER() OVER (PARTITION BY rid
                                ORDER BY jw DESC, cand ASC) AS rn
      FROM q)
SELECT f.rid AS rec_id, f.cand AS match_id,
       CAST(floor(f.jw * 1000000 + 0.5) AS BIGINT) AS jw_e6
FROM f JOIN g ON g.rid = f.cand AND g.cand = f.rid
               AND g.rn = 1 AND f.rn = 1
ORDER BY rec_id
"""


def er_pivot_clusters(sf_dir: str):
    """PIVOT correlation clustering over the reciprocal-match pair
    graph (:func:`sbb_ned_ray.stages.cluster.
    pivot_correlation_clusters`, Ailon-Charikar-Newman pivot /
    KDD'14 parallel rounds): the conservative alternative to
    transitive closure — every cluster is a STAR in the pair graph,
    so one spurious bridge pair cannot glue two entities together.
    SELF-CHECKED in-query: the distributed rounds must reproduce the
    exact sequential reference (same seeded ranks) on the full pair
    set, and every member must be adjacent to its pivot."""
    import pyarrow.compute as pc

    from sbb_ned_ray.stages.cluster import (driver_pivot_clusters,
                                            pivot_correlation_clusters)
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            reciprocal_best_match)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))
    sided = recs.map_batches(
        lambda t: t.append_column("side", pc.cast(
            pc.bit_wise_and(t["rec_id"], 1), "int32")),
        batch_format="pyarrow")
    matches = reciprocal_best_match(sided, "nationkey", "rec_id",
                                    "name", "side") \
        .select_columns(["rec_id", "match_id"]).materialize()
    out = pivot_correlation_clusters(matches, id_a="rec_id",
                                     id_b="match_id").to_pandas()
    got = dict(zip(out["node"], out["cluster_id"]))
    # self-check 1: exact parity with the sequential reference
    # (check-only collect; the pair set is one row per accepted match)
    pairs = [tuple(r) for r in
             matches.to_pandas().itertuples(index=False)]
    want = driver_pivot_clusters(pairs)
    assert got == want, "distributed pivot != sequential reference"
    # self-check 2: star property — every member adjacent to its pivot
    adj = set()
    for a, b in pairs:
        adj.add((a, b))
        adj.add((b, a))
    assert all(n == c or (n, c) in adj for n, c in got.items())
    return out.sort_values("node").reset_index(drop=True)


def er_dedupe_golden(sf_dir: str):
    """END-TO-END entity resolution over the dirty-records table, the
    full classical chain in one composition: reciprocal Jaro–Winkler
    matching → distributed min-label connected components (singletons
    keep their own id) → golden-record survivorship per cluster.
    Every stage is the already-oracle-checked operator; the chain
    itself is ORACLE-checked against one DuckDB query (window-rank
    reciprocity → recursive-CTE components → window/group
    survivorship)."""
    import pyarrow.compute as pc

    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            golden_records,
                                            reciprocal_best_match)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))
    sided = recs.map_batches(
        lambda t: t.append_column("side", pc.cast(
            pc.bit_wise_and(t["rec_id"], 1), "int32")),
        batch_format="pyarrow")
    matches = reciprocal_best_match(sided, "nationkey", "rec_id",
                                    "name", "side")
    return golden_records(recs, matches)


def _oracle_er_dedupe(sf_dir: str = "/root/testdata/sf0.01") -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    path = dirty_records_path(sf_dir)
    return f"""
WITH RECURSIVE r AS (SELECT * FROM read_parquet('{path}')),
p AS (SELECT a.rec_id AS rid, b.rec_id AS cand,
             jaro_winkler_similarity(a.name, b.name) AS jw
      FROM r a JOIN r b ON a.nationkey = b.nationkey
      WHERE a.rec_id % 2 = 1 AND b.rec_id % 2 = 0),
f AS (SELECT rid, cand,
             ROW_NUMBER() OVER (PARTITION BY rid
                                ORDER BY jw DESC, cand ASC) AS rn
      FROM p),
g AS (SELECT cand AS rid, rid AS cand,
             ROW_NUMBER() OVER (PARTITION BY cand
                                ORDER BY jw DESC, rid ASC) AS rn
      FROM p),
mt AS (SELECT f.rid AS ra, f.cand AS rb
       FROM f JOIN g ON g.rid = f.cand AND g.cand = f.rid
                     AND f.rn = 1 AND g.rn = 1),
e AS (SELECT ra AS s, rb AS t FROM mt UNION ALL SELECT rb, ra FROM mt),
nodes AS (SELECT rec_id AS node FROM r),
walk(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.t, walk.lab FROM walk JOIN e ON e.s = walk.node
  WHERE walk.lab < e.t
),
cl AS (SELECT node, min(lab) AS cluster FROM walk GROUP BY node),
rc AS (SELECT r.*, cl.cluster FROM r JOIN cl ON cl.node = r.rec_id),
nm AS (SELECT cluster, name,
              ROW_NUMBER() OVER (PARTITION BY cluster
                                 ORDER BY count(*) DESC, name ASC)
                  AS rn
       FROM rc GROUP BY cluster, name),
sg AS (SELECT cluster, segment,
              ROW_NUMBER() OVER (PARTITION BY cluster
                                 ORDER BY count(*) DESC, segment ASC)
                  AS rn
       FROM rc GROUP BY cluster, segment),
agg AS (SELECT cluster, max(acctbal) AS acctbal_max,
               CAST(min(nationkey) AS BIGINT) AS nationkey_min,
               count(*) AS n_records
        FROM rc GROUP BY cluster)
SELECT a.cluster, nm.name AS name_mode, sg.segment AS segment_mode,
       a.acctbal_max, a.nationkey_min, a.n_records
FROM agg a
JOIN nm ON nm.cluster = a.cluster AND nm.rn = 1
JOIN sg ON sg.cluster = a.cluster AND sg.rn = 1
ORDER BY a.cluster
"""


def linkage_tf_table(sf_dir: str):
    """Splink-style term-frequency adjustment table for the segment
    comparison (:func:`sbb_ned_ray.stages.linkage.segment_tf_table`):
    per value — record count, e6 term frequency, the TF Bayes factor
    ``N/n_v`` that replaces ``m/u`` on agreement, and the number of
    within-block agreeing pairs (computed as ``Σ C(n_{b,v},2)`` — NO
    pair enumeration).  ORACLE-checked with pure-integer arithmetic on
    both sides."""
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            segment_tf_table)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))
    return segment_tf_table(recs)


def _oracle_linkage_tf(sf_dir: str = "/root/testdata/sf0.01") -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    return f"""
WITH r AS (SELECT * FROM read_parquet('{dirty_records_path(sf_dir)}')),
c AS (SELECT nationkey, segment, count(*) AS n FROM r GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c),
v AS (SELECT segment, CAST(sum(n) AS BIGINT) AS n_recs,
             CAST(sum(n * (n - 1) // 2) AS BIGINT) AS n_agree_pairs
      FROM c GROUP BY segment)
SELECT v.segment, v.n_recs,
       CAST((v.n_recs * 2000000 + tot.nt) // (2 * tot.nt) AS BIGINT)
           AS tf_e6,
       CAST((tot.nt * 2000000 + v.n_recs) // (2 * v.n_recs) AS BIGINT)
           AS tf_bf_e6,
       v.n_agree_pairs
FROM v, tot
ORDER BY v.segment
"""


def linkage_em_tf_quality(sf_dir: str):
    """SELF-CHECKING: Fellegi–Sunter EM + Splink-style TF-adjusted
    posteriors per (pattern, segment value)
    (:func:`sbb_ned_ray.stages.linkage.tf_adjusted_posteriors`).
    In-function asserts: EM log-likelihood monotone, and within every
    seg-agreeing pattern the adjusted posterior is monotone
    non-increasing in the value's term frequency (rare-value agreement
    is never weaker evidence).  Deterministic and partitioning-
    independent (integer contingency + integer TF in, fixed-iteration
    EM out)."""
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            tf_adjusted_posteriors)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))
    return tf_adjusted_posteriors(recs)


def er_resumable_golden(sf_dir: str):
    """The RESUMABLE ER pipeline (:func:`sbb_ned_ray.pipelines.er.
    run_er_resumable`): reciprocal matching per block-group partition
    written atomically with lineage manifests, components + golden
    records over the union.  Runs the pipeline, then RE-runs it and
    asserts every partition is skipped with an identical result (the
    checkpoint contract) — and the output is ORACLE-checked against
    the same DuckDB twin as ``er_dedupe_golden`` (the resumable
    composition must equal the single-pass chain)."""
    import os
    import shutil

    from sbb_ned_ray.pipelines.er import run_er_resumable
    from sbb_ned_ray.stages.linkage import dirty_records_path
    path = dirty_records_path(sf_dir)
    out_dir = os.path.join(
        "/tmp/sbb_ned_ray_artifacts",
        f"er_resume-{os.path.basename(os.path.dirname(path))}")
    shutil.rmtree(out_dir, ignore_errors=True)
    golden, s1 = run_er_resumable(path, out_dir, n_parts=4)
    assert len(s1["completed"]) == 4, s1
    golden2, s2 = run_er_resumable(path, out_dir, n_parts=4)
    assert len(s2["skipped"]) == 4 and not s2["completed"], s2
    pd.testing.assert_frame_equal(golden2, golden)
    return golden


def er_incremental_golden(sf_dir: str):
    """INCREMENTAL ER MAINTENANCE: a base state is built over the
    corpus (dirty records minus the every-third-nation duplicates),
    then the delta arrives and the SAME resumable runner
    (:func:`sbb_ned_ray.pipelines.er.run_er_resumable` with
    ``delta_path``) recomputes ONLY the block groups the delta
    touches — matching is block-local, so clusters never span groups
    and the untouched manifests stay valid.  Self-asserts the pruning
    (some groups skipped on the delta run) and is ORACLE-checked: the
    result must equal the batch chain over corpus ∪ delta, i.e. the
    very same DuckDB twin as ``er_dedupe_golden`` on the full table."""
    import os
    import shutil

    from sbb_ned_ray.pipelines.er import run_er_resumable
    from sbb_ned_ray.stages.linkage import dirty_split_paths
    corpus, delta = dirty_split_paths(sf_dir)
    out_dir = os.path.join(
        "/tmp/sbb_ned_ray_artifacts",
        f"er_incr-{os.path.basename(os.path.dirname(corpus))}")
    shutil.rmtree(out_dir, ignore_errors=True)
    n_parts = 8
    _, s1 = run_er_resumable(corpus, out_dir, n_parts=n_parts)
    assert len(s1["completed"]) == n_parts, s1
    golden, s2 = run_er_resumable(corpus, out_dir, n_parts=n_parts,
                                  delta_path=delta)
    assert s2["skipped"], s2          # pruning is real …
    assert s2["completed"], s2        # … and the delta did touch work
    assert len(s2["skipped"]) + len(s2["completed"]) == n_parts
    return golden


def linkage_patterns_cc(sf_dir: str):
    """CLEAN-CLEAN (two-source) agreement-pattern counts: originals as
    source 0, planted duplicates as source 1; only cross-source
    within-block pairs are compared (Splink ``link_only``).
    ORACLE-checked like :func:`linkage_patterns` with the side
    predicate in the join."""
    import pyarrow.compute as pc

    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            patterns_table,
                                            pattern_contingency)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir)) \
        .map_batches(lambda t: t.append_column(
            "side", pc.cast(pc.bit_wise_and(t["rec_id"], 1), "int32")),
            batch_format="pyarrow")
    from sbb_ned_ray.stages.linkage import COMPARISONS
    c = pattern_contingency(recs, side_col="side")
    agg = c.groupby("pattern", sort=True)["n_pairs"].sum().reset_index()
    out = pd.DataFrame({
        name: ((agg["pattern"].to_numpy() >> i) & 1).astype("int64")
        for i, name in enumerate(COMPARISONS)})
    out["n_pairs"] = agg["n_pairs"].to_numpy()
    return out.sort_values(COMPARISONS).reset_index(drop=True)


def _oracle_linkage_patterns_cc(sf_dir: str = "/root/testdata/sf0.01"
                                ) -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    return f"""
WITH r AS (SELECT * FROM read_parquet('{dirty_records_path(sf_dir)}')),
p AS (SELECT CAST(a.name = b.name AS BIGINT) AS name_exact,
             CAST(right(a.name, 4) = right(b.name, 4) AS BIGINT)
                 AS name_sfx4,
             CAST(a.segment = b.segment AS BIGINT) AS seg_exact,
             CAST(abs(a.acctbal - b.acctbal) < 0.05 AS BIGINT)
                 AS bal_close
      FROM r a JOIN r b
        ON a.nationkey = b.nationkey AND a.rec_id < b.rec_id
       AND (a.rec_id % 2) <> (b.rec_id % 2))
SELECT name_exact, name_sfx4, seg_exact, bal_close,
       count(*) AS n_pairs
FROM p
GROUP BY 1, 2, 3, 4
ORDER BY name_exact, name_sfx4, seg_exact, bal_close
"""


def linkage_incremental_match(sf_dir: str):
    """INCREMENTAL linkage serving: the clean master (the original
    records) is persisted ONCE as a content-addressed index
    hive-partitioned by block bucket
    (:func:`sbb_ned_ray.stages.linkage.save_linkage_index`); a delta
    of new records (the planted duplicates from every third nation)
    is then matched WITHOUT rescanning the master — only the partition
    buckets the delta's block keys hash to are read
    (:func:`sbb_ned_ray.stages.linkage.linkage_match_incremental`).
    Self-asserts the pruning is real (scanned buckets/bytes strictly
    below totals) AND ORACLE-checked: the DuckDB Jaro–Winkler
    window-rank twin of ``linkage_fuzzy_match`` restricted to the
    delta probes — incremental == batch is the serving contract."""
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            linkage_match_incremental,
                                            save_linkage_index)
    recs = ray.data.read_parquet(dirty_records_path(sf_dir))

    def flt(mask_fn):
        def fn(t):
            import pyarrow as _pa
            return t.filter(_pa.array(mask_fn(t)))
        return fn

    corpus = recs.map_batches(flt(
        lambda t: t["rec_id"].to_numpy(zero_copy_only=False) % 2 == 0),
        batch_format="pyarrow")

    def delta_mask(t):
        rid = t["rec_id"].to_numpy(zero_copy_only=False)
        nk = t["nationkey"].to_numpy(zero_copy_only=False)
        return (rid % 2 == 1) & (nk % 3 == 0)

    delta = recs.map_batches(flt(delta_mask), batch_format="pyarrow")
    idx = save_linkage_index(corpus, "/tmp/sbb_ned_ray_artifacts/lkidx",
                             block_col="nationkey", id_col="rec_id",
                             name_col="name")
    out, stats = linkage_match_incremental(idx, delta,
                                           return_stats=True)
    assert stats["buckets_scanned"] < stats["buckets_total"], stats
    assert stats["bytes_scanned"] < stats["bytes_total"], stats
    return out.to_pandas().sort_values("rec_id").reset_index(drop=True)


def _oracle_linkage_incremental(sf_dir: str = "/root/testdata/sf0.01"
                                ) -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    return f"""
WITH r AS (SELECT * FROM read_parquet('{dirty_records_path(sf_dir)}')),
p AS (SELECT a.rec_id AS rid, b.rec_id AS cand,
             jaro_winkler_similarity(a.name, b.name) AS jw
      FROM r a JOIN r b ON a.nationkey = b.nationkey
      WHERE a.rec_id % 2 = 1 AND a.nationkey % 3 = 0
        AND b.rec_id % 2 = 0),
rk AS (SELECT rid, cand, jw,
              ROW_NUMBER() OVER (PARTITION BY rid
                                 ORDER BY jw DESC, cand ASC) AS rn
       FROM p)
SELECT rid AS rec_id, cand AS match_id,
       CAST(floor(jw * 1000000 + 0.5) AS BIGINT) AS jw_e6
FROM rk WHERE rn = 1
ORDER BY rec_id
"""


def _rhu_e6(num: int, den: int) -> int:
    """Integer round-half-up of num/den at 1e-6 — matches the SQL
    ``(num*2000000 + den) // (2*den)``."""
    return (num * 2_000_000 + den) // (2 * den) if den else 0


def blocking_workload_metrics(sf_dir: str):
    """Reduction ratio + pair completeness of the two round-5 blockers
    over the dirty-records table, against the planted duplicate pairs:
    sorted-neighborhood (window 5 on name) vs meta-blocking CNP.
    The standard blocking-evaluation pair (Christen, "Data Matching",
    2012) — counts stay distributed (gt membership rides a broadcast
    set, evaluation-sized), only three integers per method reach the
    driver.  ORACLE-checked: DuckDB recomputes both candidate sets and
    the same integer-quantized ratios."""
    import numpy as np

    from sbb_ned_ray.stages.blockjoin import (meta_blocking_cnp as cnp,
                                              sorted_neighborhood_pairs)
    from sbb_ned_ray.stages.linkage import dirty_records_path
    path = dirty_records_path(sf_dir)
    recs = ray.data.read_parquet(path)
    n = recs.count()
    total = n * (n - 1) // 2
    gt_ids = ray.data.read_parquet(path, columns=["rec_id", "entity_id"]) \
        .map_batches(lambda t: t.filter(
            __import__("pyarrow").compute.equal(
                __import__("pyarrow").compute.bit_wise_and(
                    t["rec_id"], 1), 1)), batch_format="pyarrow") \
        .to_pandas()
    gt = {(2 * int(e), 2 * int(e) + 1) for e in gt_ids["entity_id"]}
    gt_ref = ray.put(gt)

    def _metrics(cand: ray.data.Dataset) -> tuple:
        def hit_count(df):
            g = ray.get(gt_ref)
            hits = sum((int(a), int(b)) in g
                       for a, b in zip(df["id_a"], df["id_b"]))
            return pd.DataFrame({"n": [len(df)], "hits": [hits]})

        agg = cand.map_batches(hit_count,
                               batch_format="pandas").to_pandas()
        return int(agg["n"].sum()), int(agg["hits"].sum())

    snm_pairs = sorted_neighborhood_pairs(
        recs.select_columns(["rec_id", "name"]), "name", "rec_id", 5)

    def canon(t):
        import pyarrow.compute as pc
        lo = pc.min_element_wise(t["id_a"], t["id_b"])
        hi = pc.max_element_wise(t["id_a"], t["id_b"])
        return pa.table({"id_a": lo, "id_b": hi})

    snm_n, snm_hits = _metrics(
        snm_pairs.map_batches(canon, batch_format="pyarrow"))
    mb_n, mb_hits = _metrics(cnp(
        recs.select_columns(["rec_id", "name"]), "rec_id", "name",
        k_neighbors=5, max_block=64, min_weight=2))
    rows = []
    for method, c, hits in (("meta_blocking", mb_n, mb_hits),
                            ("snm", snm_n, snm_hits)):
        rows.append({"method": method, "n_candidates": c,
                     "reduction_ratio_e6": _rhu_e6(total - c, total),
                     "pair_completeness_e6": _rhu_e6(hits, len(gt))})
    return pd.DataFrame(rows).sort_values("method").reset_index(drop=True)


def _oracle_blocking_metrics(sf_dir: str = "/root/testdata/sf0.01"
                             ) -> str:
    from sbb_ned_ray.stages.linkage import dirty_records_path
    path = dirty_records_path(sf_dir)
    return f"""
WITH r AS (SELECT rec_id, entity_id, name
           FROM read_parquet('{path}')),
tot AS (SELECT count(*) * (count(*) - 1) // 2 AS t FROM r),
gt AS (SELECT 2 * entity_id AS a, 2 * entity_id + 1 AS b
       FROM r WHERE rec_id % 2 = 1),
rk AS (SELECT rec_id,
              ROW_NUMBER() OVER (ORDER BY name, rec_id) AS rn FROM r),
snm AS (SELECT LEAST(x.rec_id, y.rec_id) AS id_a,
               GREATEST(x.rec_id, y.rec_id) AS id_b
        FROM rk x JOIN rk y ON y.rn > x.rn AND y.rn - x.rn < 5),
tok AS (SELECT DISTINCT rec_id, substr(name, i, 3) AS tg
        FROM r, LATERAL (SELECT unnest(range(1, len(name) - 1)) AS i)
            t),
bl AS (SELECT tg FROM tok GROUP BY tg HAVING count(*) <= 64),
m AS (SELECT tok.rec_id, tok.tg FROM tok JOIN bl USING (tg)),
e AS (SELECT a.rec_id AS na, b.rec_id AS nb, count(*) AS w
      FROM m a JOIN m b ON a.tg = b.tg AND a.rec_id < b.rec_id
      GROUP BY 1, 2 HAVING count(*) >= 2),
dir AS (SELECT na AS s, nb AS d, w FROM e
        UNION ALL SELECT nb, na, w FROM e),
tk AS (SELECT s, d, ROW_NUMBER() OVER (PARTITION BY s
                                       ORDER BY w DESC, d ASC) AS rn
       FROM dir),
mb AS (SELECT DISTINCT LEAST(s, d) AS id_a, GREATEST(s, d) AS id_b
       FROM tk WHERE rn <= 5),
stats AS (
  SELECT 'snm' AS method,
         (SELECT count(*) FROM snm) AS n_candidates,
         (SELECT count(*) FROM snm JOIN gt
            ON snm.id_a = gt.a AND snm.id_b = gt.b) AS hits
  UNION ALL
  SELECT 'meta_blocking',
         (SELECT count(*) FROM mb),
         (SELECT count(*) FROM mb JOIN gt
            ON mb.id_a = gt.a AND mb.id_b = gt.b))
SELECT method, n_candidates,
       (((SELECT t FROM tot) - n_candidates) * 2000000
        + (SELECT t FROM tot))
           // (2 * (SELECT t FROM tot)) AS reduction_ratio_e6,
       CASE WHEN (SELECT count(*) FROM gt) = 0 THEN 0
            ELSE (hits * 2000000 + (SELECT count(*) FROM gt))
                 // (2 * (SELECT count(*) FROM gt)) END
           AS pair_completeness_e6
FROM stats
ORDER BY method
"""


ORACLE_SHINGLE_JACCARD = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
s AS (SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) t
      WHERE len(ws) >= 3),
sz AS (SELECT doc_id, count(*) AS m FROM s GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT id_a, id_b,
       (c * 2000000 + (sa.m + sb.m - c)) // (2 * (sa.m + sb.m - c))
           AS jaccard_e6
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE c * 1000000 >= 500000 * (sa.m + sb.m - c)
ORDER BY id_a, id_b
"""


def linkage_soundex_keys(sf_dir: str):
    """American Soundex blocking keys over the phonetic-names fixture
    (:func:`sbb_ned_ray.functions.phonetic.soundex_col`, vectorized
    factorize-unique per batch).  ORACLE-checked against a pure-SQL
    DuckDB twin implementing the same published spec (h/w-transparent
    variant) via ``translate`` + chained ``regexp_replace`` — two
    independent implementations of the algorithm, hash-compared."""
    from sbb_ned_ray.stages.linkage import (add_soundex,
                                            phonetic_records_path)
    recs = ray.data.read_parquet(phonetic_records_path(sf_dir),
                                 columns=["rec_id", "surname"])
    out = add_soundex(recs, "surname").to_pandas()
    return out.sort_values("rec_id").reset_index(drop=True)


def linkage_soundex_match(sf_dir: str):
    """Phonetic-blocked fuzzy matching: block on ``soundex(surname)``
    (the classical record-linkage blocking key — invariant to the
    fixture's planted misspellings by construction, so
    pair-completeness is 1.0 where exact-surname blocking misses
    every perturbed duplicate), then Jaro–Winkler best-match within
    the block (:func:`sbb_ned_ray.stages.linkage.fuzzy_best_match`).
    ORACLE: DuckDB computes the SAME soundex via the SQL chain and
    ranks with ``jaro_winkler_similarity`` window rank."""
    from sbb_ned_ray.stages.linkage import (add_soundex,
                                            fuzzy_best_match,
                                            phonetic_records_path)
    recs = ray.data.read_parquet(phonetic_records_path(sf_dir))
    recs = add_soundex(recs, "surname")

    def add_side(t):
        import pyarrow.compute as pc
        side = pc.cast(pc.bit_wise_and(t["rec_id"], 1), "int32")
        return t.append_column("side", side)

    recs = recs.map_batches(add_side, batch_format="pyarrow")
    out = fuzzy_best_match(recs, "sdx", "rec_id", "name",
                           "side").to_pandas()
    return out.sort_values("rec_id").reset_index(drop=True)


def _sdx_sql_cte(path: str, cols: str = "rec_id, surname") -> str:
    """CTE chain computing ``sdx`` = American Soundex (h/w-transparent)
    of ``surname`` in pure DuckDB SQL: H/W deleted up front (DuckDB's
    ``translate`` maps surplus chars instead of deleting), letters
    coded, runs of equal digits 1-6 collapsed, first letter restored,
    vowel zeros removed, zero-padded to 4."""
    return f"""
rr AS (SELECT {cols} FROM read_parquet('{path}')),
ss AS (SELECT *, upper(regexp_replace(surname,'[^A-Za-z]','','g')) u
       FROM rr),
cc AS (SELECT *, translate(replace(replace(u,'H',''),'W',''),
         'BFPVCGJKQSXZDTLMNRAEIOUY','111122222222334556000000') coded
       FROM ss),
ll AS (SELECT *,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    regexp_replace(regexp_replace(coded,
    '1{{2,}}','1','g'),'2{{2,}}','2','g'),'3{{2,}}','3','g'),
    '4{{2,}}','4','g'),'5{{2,}}','5','g'),'6{{2,}}','6','g') clp
       FROM cc),
sx AS (SELECT *, CASE WHEN u = '' THEN '' ELSE
         substr(u,1,1) || substr(replace(
           CASE WHEN substr(u,1,1) IN ('H','W') THEN clp
                ELSE substr(clp,2) END, '0','') || '000', 1, 3)
       END AS sdx
       FROM ll)"""


def _oracle_soundex_keys(sf_dir: str = "/root/testdata/sf0.01") -> str:
    from sbb_ned_ray.stages.linkage import phonetic_records_path
    return f"""
WITH {_sdx_sql_cte(phonetic_records_path(sf_dir))}
SELECT rec_id, surname, sdx FROM sx ORDER BY rec_id
"""


def _oracle_soundex_match(sf_dir: str = "/root/testdata/sf0.01"
                          ) -> str:
    from sbb_ned_ray.stages.linkage import phonetic_records_path
    path = phonetic_records_path(sf_dir)
    return f"""
WITH {_sdx_sql_cte(path, cols="rec_id, surname, name")},
p AS (SELECT a.rec_id AS rid, b.rec_id AS cand,
             jaro_winkler_similarity(a.name, b.name) AS jw
      FROM sx a JOIN sx b ON a.sdx = b.sdx
      WHERE a.rec_id % 2 = 1 AND b.rec_id % 2 = 0),
rk AS (SELECT rid, cand, jw,
              ROW_NUMBER() OVER (PARTITION BY rid
                                 ORDER BY jw DESC, cand ASC) AS rn
       FROM p)
SELECT rid AS rec_id, cand AS match_id,
       CAST(floor(jw * 1000000 + 0.5) AS BIGINT) AS jw_e6
FROM rk WHERE rn = 1
ORDER BY rec_id
"""


def blocking_soundex_metrics(sf_dir: str):
    """Blocking-key evaluation (Christen, "Data Matching", 2012) over
    the phonetic fixture: reduction ratio + pair completeness for
    three keys — exact surname, soundex(surname), surname initial.
    Quantifies the phonetic tradeoff: soundex keeps pair completeness
    1.0 on the planted misspellings at a slightly lower reduction
    ratio, the initial key over-blocks, the exact key under-recalls.

    All reductions stay distributed: the long (method, key) table
    feeds one narrow groupby for block sizes -> per-method candidate
    counts, and one (method, entity) groupby whose min==max key test
    gives the hit count; only 3 rows/ints reach the driver.  ORACLE:
    DuckDB recomputes keys via the soundex SQL chain and the same
    integer-quantized ratios."""
    from ray.data.aggregate import Count, Max, Min

    from sbb_ned_ray.functions.phonetic import soundex_col
    from sbb_ned_ray.stages.linkage import phonetic_records_path
    path = phonetic_records_path(sf_dir)
    recs = ray.data.read_parquet(
        path, columns=["rec_id", "entity_id", "surname"])
    n = recs.count()
    total = n * (n - 1) // 2

    def long_batch(t: pa.Table) -> pa.Table:
        surn = t["surname"].to_pylist()
        sdx = list(soundex_col(surn))
        init = [s[:1] for s in surn]
        k = len(surn)
        rid = t["rec_id"].to_pylist() * 3
        ent = t["entity_id"].to_pylist() * 3
        return pa.table({
            "method": pa.array(["surname_exact"] * k
                               + ["soundex"] * k + ["initial"] * k),
            "key": pa.array(surn + sdx + init, pa.string()),
            "rec_id": pa.array(rid, pa.int64()),
            "entity_id": pa.array(ent, pa.int64())})

    long = recs.map_batches(long_batch, batch_format="pyarrow")

    def cand_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df["count()"].to_numpy(np.int64)
        return pd.DataFrame({"method": df["method"],
                             "c": m * (m - 1) // 2})

    cand = long.groupby(["method", "key"]).count() \
        .map_batches(cand_partial, batch_format="pandas") \
        .groupby("method").sum("c").to_pandas() \
        .set_index("method")["sum(c)"]

    def hit_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = ((df["count()"] == 2) & (df["kmin"] == df["kmax"]))
        return pd.DataFrame({"method": df["method"],
                             "h": h.astype(np.int64)})

    hits = long.groupby(["method", "entity_id"]) \
        .aggregate(Count(), Min("key", alias_name="kmin"),
                   Max("key", alias_name="kmax")) \
        .map_batches(hit_partial, batch_format="pandas") \
        .groupby("method").sum("h").to_pandas() \
        .set_index("method")["sum(h)"]

    # number of planted duplicates (odd rec ids)
    n_gt = recs.map_batches(
        lambda t: t.filter(__import__("pyarrow").compute.equal(
            __import__("pyarrow").compute.bit_wise_and(
                t["rec_id"], 1), 1)),
        batch_format="pyarrow").count()

    rows = []
    for method in sorted(cand.index):
        c, h = int(cand[method]), int(hits[method])
        rows.append({
            "method": method, "n_candidates": c, "hits": h,
            "rr_e6": (total - c) * 1_000_000 // total,
            "pc_e6": h * 1_000_000 // n_gt})
    out = pd.DataFrame(rows)
    for col in out.columns[1:]:
        out[col] = out[col].astype(np.int64)
    return out.sort_values("method").reset_index(drop=True)


def _oracle_blocking_soundex(sf_dir: str = "/root/testdata/sf0.01"
                             ) -> str:
    from sbb_ned_ray.stages.linkage import phonetic_records_path
    path = phonetic_records_path(sf_dir)
    return f"""
WITH {_sdx_sql_cte(path, cols="rec_id, entity_id, surname")},
k AS (SELECT rec_id, entity_id, surname AS key,
             'surname_exact' AS method FROM sx
      UNION ALL SELECT rec_id, entity_id, sdx, 'soundex' FROM sx
      UNION ALL SELECT rec_id, entity_id, substr(surname, 1, 1),
                       'initial' FROM sx),
sz AS (SELECT method, key, count(*) AS m FROM k GROUP BY 1, 2),
cand AS (SELECT method,
                CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS n_candidates
         FROM sz GROUP BY 1),
gt AS (SELECT a.method, CAST(count(*) AS BIGINT) AS hits
       FROM k a JOIN k b
         ON a.method = b.method AND a.entity_id = b.entity_id
        AND a.key = b.key
       WHERE a.rec_id % 2 = 0 AND b.rec_id % 2 = 1
       GROUP BY 1),
tot AS (SELECT count(*) AS n,
               (SELECT count(*) FROM sx WHERE rec_id % 2 = 1) AS ngt
        FROM sx)
SELECT method, n_candidates, hits,
       CAST((n * (n - 1) // 2 - n_candidates) * 1000000
            // (n * (n - 1) // 2) AS BIGINT) AS rr_e6,
       CAST(hits * 1000000 // ngt AS BIGINT) AS pc_e6
FROM cand JOIN gt USING (method), tot
ORDER BY method
"""


def er_swoosh_golden(sf_dir: str):
    """Merge-based ER via R-Swoosh (Benjelloun et al. VLDB J. 2009)
    inside soundex blocks (:func:`sbb_ned_ray.stages.linkage.r_swoosh`
    — the D-Swoosh parallelization: sequential buffer algorithm per
    block, blocks resolved independently).  ORACLE: the published
    ICAR equivalence — under an idempotent/commutative/associative/
    representative match-merge pair the Swoosh fixpoint equals the
    connected components of the pairwise match graph, each fully
    merged — expressed as a DuckDB recursive-CTE min-label walk over
    e6-int-thresholded Jaro–Winkler edges + per-component
    aggregates."""
    from sbb_ned_ray.stages.linkage import (add_soundex,
                                            phonetic_records_path,
                                            r_swoosh)
    recs = ray.data.read_parquet(phonetic_records_path(sf_dir))
    recs = add_soundex(recs, "surname")
    out = r_swoosh(recs, "sdx", "rec_id", "name").to_pandas()
    return out.sort_values("canon_id").reset_index(drop=True)


def _oracle_er_swoosh(sf_dir: str = "/root/testdata/sf0.01") -> str:
    from sbb_ned_ray.stages.linkage import phonetic_records_path
    path = phonetic_records_path(sf_dir)
    return f"""
WITH RECURSIVE {_sdx_sql_cte(path, cols="rec_id, surname, name")},
e AS (SELECT a.rec_id AS s, b.rec_id AS d
      FROM sx a JOIN sx b
        ON a.sdx = b.sdx AND a.rec_id <> b.rec_id
      WHERE CAST(floor(jaro_winkler_similarity(a.name, b.name)
                       * 1000000 + 0.5) AS BIGINT) >= 900000),
nodes AS (SELECT rec_id AS node FROM sx),
walk(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.d, walk.lab FROM walk JOIN e ON e.s = walk.node
  WHERE walk.lab < e.d
),
comp AS (SELECT node, min(lab) AS lab FROM walk GROUP BY node),
j AS (SELECT c.lab, r.rec_id, r.name
      FROM comp c JOIN sx r ON r.rec_id = c.node)
SELECT lab AS canon_id, count(*) AS n_members,
       string_agg(rec_id::VARCHAR, ',' ORDER BY rec_id) AS members,
       string_agg(DISTINCT name, '|' ORDER BY name) AS names
FROM j GROUP BY lab ORDER BY canon_id
"""


# Full name -> callable map.  The public QUERIES dict is built AFTER
# ORACLE_SQL below, ordered oracle-backed-first (flagship block at the
# top) so a harness that snapshots only the first N entries always sees
# the hash-checked queries (the driver's correctness gate takes 50).
_QUERY_FNS = {
    "q1_pricing": q1_pricing,
    "q3_top_orders": q3_top_orders,
    "orders_per_nation": orders_per_nation,
    "q5_region_revenue": q5_region_revenue,
    "docs_blocklist_anti": docs_blocklist_anti,
    "pii_redact_docs": pii_redact_docs,
    "doc_repetition": doc_repetition,
    "doc_chunks": doc_chunks,
    "docs_decontaminate": docs_decontaminate,
    "docs_dup_spans": docs_dup_spans,
    "docs_bm25_topk": docs_bm25_topk,
    "doc_top_tokens": doc_top_tokens,
    "docs_sample_per_lang": docs_sample_per_lang,
    "docs_len_quantiles": docs_len_quantiles,
    "events_json_extract": events_json_extract,
    "distinct_segments": distinct_segments,
    "events_windowed": events_windowed,
    "top_events_per_user": top_events_per_user,
    "events_asof_join": events_asof_join,
    "events_range_join": events_range_join,
    "sessionize_users": sessionize_users,
    "events_rolling_avg": events_rolling_avg,
    "customer_order_counts": customer_order_counts,
    "order_ship_calendar": order_ship_calendar,
    "events_pivot": events_pivot,
    "cheapest_supplier_per_nation": cheapest_supplier_per_nation,
    "doc_token_counts": doc_token_counts,
    "doc_quality": doc_quality,
    "lang_id": lang_id,
    "exact_dedup_docs": exact_dedup_docs,
    "knn_cosine": knn_cosine,
    "knn_cosine_ivf": knn_cosine_ivf,
    "knn_ivf_recall": knn_ivf_recall,
    "knn_pq_recall": knn_pq_recall,
    "knn_ivfpq_recall": knn_ivfpq_recall,
    "semantic_dedup_recall": semantic_dedup_recall,
    "ivf_scan_fraction": ivf_scan_fraction,
    "minhash_dedup_docs": minhash_dedup_docs,
    "minhash_lsh_recall": minhash_lsh_recall,
    "minhash_incremental_dedup": minhash_incremental_dedup,
    "minhash_dedup_ds_contract": minhash_dedup_ds_contract,
    "simhash_dedup_docs": simhash_dedup_docs,
    "simhash_recall": simhash_recall,
    "doc_fingerprints": doc_fingerprints,
    "docs_perplexity_buckets": docs_perplexity_buckets,
    "embedding_neardup": embedding_neardup,
    "embedding_srp_recall": embedding_srp_recall,
    "ngram_jaccard_docs": ngram_jaccard_docs,
    "train_test_split_docs": train_test_split_docs,
    "ned_training_pairs": ned_training_pairs,
    "media_decode": media_decode,
    "media_decode_ppm": media_decode_ppm,
    "media_decode_png": media_decode_png,
    "media_decode_jpeg": media_decode_jpeg,
    "media_decode_wav": media_decode_wav,
    "media_phash_neardup": media_phash_neardup,
    "media_audio_neardup": media_audio_neardup,
    "parse_ner_mentions": parse_ner_mentions,
    "clef_mentions": clef_mentions,
    "ned_pair_features": ned_pair_features,
    "ned_links_bert": ned_links_bert,
    "ned_links_bert_trained": ned_links_bert_trained,
    "ned_eval_f1_bert_trained": ned_eval_f1_bert_trained,
    "ned_eval_topk_bert_trained": ned_eval_topk_bert_trained,
    "ned_extract_pages": ned_extract_pages,
    "ned_mentions": ned_mentions,
    "ned_links": ned_links,
    "ned_links_auto": ned_links_auto,
    "ned_links_shuffle_kb": ned_links_shuffle_kb,
    "ned_decider_cv": ned_decider_cv,
    "ned_eval_f1": ned_eval_f1,
    "ned_eval_topk": ned_eval_topk,
    "ned_eval_grid": ned_eval_grid,
    "distinct_users_per_type": distinct_users_per_type,
    "distinct_users_hll": distinct_users_hll,
    "heavy_hitter_tokens": heavy_hitter_tokens,
    "orders_bloom_semijoin": orders_bloom_semijoin,
    "orders_rollup": orders_rollup,
    "users_view_no_purchase": users_view_no_purchase,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "nation_top_customer_names": nation_top_customer_names,
    "pages_per_host": pages_per_host,
    "pages_recrawl_latest": pages_recrawl_latest,
    "pages_split_by_host": pages_split_by_host,
    "events_value_quantiles_sketch": events_value_quantiles_sketch,
    "token_postings": token_postings,
    "docs_pack_windows": docs_pack_windows,
    "docs_mix_sources": docs_mix_sources,
    "docs_weighted_sample": docs_weighted_sample,
    "docs_group_kfold": docs_group_kfold,
    "docs_shard_shuffle": docs_shard_shuffle,
    "party_nation_counts": party_nation_counts,
    "events_ntile": events_ntile,
    "events_lag_delta": events_lag_delta,
    "events_corr_moments": events_corr_moments,
    "distinct_users_per_type_hll": distinct_users_per_type_hll,
    "docs_pruned_read": docs_pruned_read,
    "blocking_quality": blocking_quality,
    "events_value_quantiles_per_type": events_value_quantiles_per_type,
    "embedding_kmeans": embedding_kmeans,
    "heavy_hitter_users_per_type": heavy_hitter_users_per_type,
    "entity_context_matrix": entity_context_matrix,
    "link_graph_pagerank": link_graph_pagerank,
    "host_graph_harmonic": host_graph_harmonic,
    "entity_cooc_graph": entity_cooc_graph,
    "entity_jaccard_relatedness": entity_jaccard_relatedness,
    "entity_cooc_triangles": entity_cooc_triangles,
    "entity_cooc_components": entity_cooc_components,
    "entity_cooc_components_altstar": entity_cooc_components_altstar,
    "entity_cooc_clustering": entity_cooc_clustering,
    "entity_cooc_kcore": entity_cooc_kcore,
    "ned_cluster_contingency": ned_cluster_contingency,
    "ned_cluster_quality": ned_cluster_quality,
    "surface_edit_join": surface_edit_join,
    "customers_sorted_neighborhood": customers_sorted_neighborhood,
    "docs_shingle_jaccard": docs_shingle_jaccard,
    "docs_token_cosine": docs_token_cosine,
    "docs_shingle_containment": docs_shingle_containment,
    "linkage_patterns": linkage_patterns,
    "linkage_patterns_jw3": linkage_patterns_jw3,
    "linkage_patterns_3state": linkage_patterns_3state,
    "linkage_clerical_pairs": linkage_clerical_pairs,
    "linkage_group_match": linkage_group_match,
    "linkage_pr_curve": linkage_pr_curve,
    "linkage_em_quality": linkage_em_quality,
    "linkage_golden_records": linkage_golden_records,
    "surface_edit_clusters": surface_edit_clusters,
    "meta_blocking_cnp": meta_blocking_cnp,
    "linkage_fuzzy_match": linkage_fuzzy_match,
    "linkage_monge_elkan": linkage_monge_elkan,
    "blocking_workload_metrics": blocking_workload_metrics,
    "linkage_reciprocal_match": linkage_reciprocal_match,
    "er_dedupe_golden": er_dedupe_golden,
    "er_pivot_clusters": er_pivot_clusters,
    "linkage_patterns_cc": linkage_patterns_cc,
    "linkage_incremental_match": linkage_incremental_match,
    "er_resumable_golden": er_resumable_golden,
    "linkage_tf_table": linkage_tf_table,
    "linkage_soundex_keys": linkage_soundex_keys,
    "linkage_soundex_match": linkage_soundex_match,
    "er_swoosh_golden": er_swoosh_golden,
    "blocking_soundex_metrics": blocking_soundex_metrics,
    "linkage_em_tf_quality": linkage_em_tf_quality,
    "er_incremental_golden": er_incremental_golden,
}

ORACLE_SQL = {
    "q1_pricing": ORACLE_Q1,
    "q3_top_orders": ORACLE_Q3,
    "orders_per_nation": ORACLE_ORDERS_PER_NATION,
    "q5_region_revenue": ORACLE_Q5,
    "docs_blocklist_anti": ORACLE_BLOCKLIST_ANTI,
    "pii_redact_docs": _oracle_pii(),
    "doc_repetition": ORACLE_DOC_REPETITION,
    "doc_chunks": ORACLE_DOC_CHUNKS,
    "docs_decontaminate": ORACLE_DOCS_DECONTAMINATE,
    "docs_dup_spans": ORACLE_DOCS_DUP_SPANS,
    "docs_bm25_topk": ORACLE_DOCS_BM25_TOPK,
    "doc_top_tokens": ORACLE_DOC_TOP_TOKENS,
    "docs_sample_per_lang": ORACLE_DOCS_SAMPLE_PER_LANG,
    "docs_len_quantiles": ORACLE_DOCS_LEN_QUANTILES,
    "events_json_extract": ORACLE_EVENTS_JSON_EXTRACT,
    "distinct_segments": ORACLE_DISTINCT_SEGMENTS,
    "events_windowed": ORACLE_EVENTS_WINDOWED,
    "top_events_per_user": ORACLE_TOP_EVENTS_PER_USER,
    "events_asof_join": ORACLE_EVENTS_ASOF,
    "events_range_join": ORACLE_EVENTS_RANGE,
    "sessionize_users": ORACLE_SESSIONIZE,
    "events_rolling_avg": ORACLE_EVENTS_ROLLING,
    "customer_order_counts": ORACLE_CUSTOMER_ORDER_COUNTS,
    "order_ship_calendar": ORACLE_ORDER_SHIP_CALENDAR,
    "events_pivot": ORACLE_EVENTS_PIVOT,
    "cheapest_supplier_per_nation": ORACLE_CHEAPEST_SUPPLIER,
    "doc_token_counts": ORACLE_DOC_TOKEN_COUNTS,
    "doc_quality": ORACLE_DOC_QUALITY,
    "lang_id": ORACLE_LANG_ID,
    "exact_dedup_docs": ORACLE_EXACT_DEDUP,
    "doc_fingerprints": ORACLE_DOC_FINGERPRINTS,
    "media_decode": ORACLE_MEDIA_DECODE,
    "media_decode_ppm": ORACLE_MEDIA_DECODE_PPM,
    "media_decode_png": ORACLE_MEDIA_DECODE_PPM,
    "media_decode_jpeg": ORACLE_MEDIA_DECODE_JPEG,
    "media_decode_wav": ORACLE_MEDIA_DECODE_WAV,
    "parse_ner_mentions": _oracle_parse_ner(),
    "clef_mentions": _oracle_parse_ner(),
    "ned_mentions": _oracle_ned_mentions(),
    "ned_extract_pages": _oracle_ned_extract_pages(),
    "ned_links": _oracle_ned_links(),
    "ned_links_auto": _oracle_ned_links(),
    "knn_cosine": ORACLE_KNN,
    "embedding_neardup": ORACLE_EMBEDDING_NEARDUP,
    "ngram_jaccard_docs": ORACLE_NGRAM_JACCARD,
    "train_test_split_docs": ORACLE_TRAIN_TEST_SPLIT,
    "distinct_users_per_type": ORACLE_DISTINCT_USERS_PER_TYPE,
    "orders_bloom_semijoin": ORACLE_ORDERS_BLOOM_SEMIJOIN,
    "orders_rollup": ORACLE_ORDERS_ROLLUP,
    "users_view_no_purchase": ORACLE_USERS_VIEW_NO_PURCHASE,
    "q17_small_quantity_revenue": ORACLE_Q17,
    "nation_top_customer_names": ORACLE_NATION_TOP_CUSTOMER_NAMES,
    "pages_per_host": _oracle_pages_per_host(),
    "pages_recrawl_latest": _oracle_pages_recrawl(),
    "pages_split_by_host": _oracle_pages_split_by_host(),
    "token_postings": ORACLE_TOKEN_POSTINGS,
    "docs_pack_windows": ORACLE_DOCS_PACK_WINDOWS,
    "docs_mix_sources": ORACLE_DOCS_MIX_SOURCES,
    "docs_weighted_sample": ORACLE_DOCS_WEIGHTED_SAMPLE,
    "docs_group_kfold": ORACLE_DOCS_GROUP_KFOLD,
    "docs_shard_shuffle": ORACLE_DOCS_SHARD_SHUFFLE,
    "party_nation_counts": ORACLE_PARTY_NATION_COUNTS,
    "events_ntile": ORACLE_EVENTS_NTILE,
    "events_lag_delta": ORACLE_EVENTS_LAG_DELTA,
    "events_corr_moments": ORACLE_EVENTS_CORR_MOMENTS,
    "docs_pruned_read": ORACLE_DOCS_PRUNED_READ,
    "entity_context_matrix": ORACLE_CONTEXT_MATRIX,
    "entity_cooc_graph": _oracle_entity_cooc(),
    "entity_jaccard_relatedness": _oracle_entity_jaccard(),
    "entity_cooc_triangles": _oracle_entity_triangles(),
    "entity_cooc_components": _oracle_entity_components(),
    "entity_cooc_components_altstar": _oracle_entity_components(),
    "entity_cooc_clustering": _oracle_entity_clustering(),
    "entity_cooc_kcore": _oracle_entity_kcore(),
    "ned_cluster_contingency": _oracle_ned_contingency(),
    "surface_edit_join": _oracle_surface_editjoin(),
    "customers_sorted_neighborhood": ORACLE_SORTED_NEIGHBORHOOD,
    "docs_shingle_jaccard": ORACLE_SHINGLE_JACCARD,
    "docs_token_cosine": _oracle_docs_token_cosine(),
    "docs_shingle_containment": _oracle_docs_containment(),
    "linkage_patterns": _oracle_linkage_patterns(),
    "linkage_patterns_jw3": _oracle_linkage_jw3(),
    "linkage_patterns_3state": _oracle_linkage_3state(),
    "linkage_clerical_pairs": _oracle_linkage_clerical(),
    "linkage_group_match": _oracle_linkage_group(),
    "linkage_pr_curve": _oracle_linkage_pr(),
    "linkage_golden_records": _oracle_linkage_golden(),
    "surface_edit_clusters": _oracle_surface_clusters(),
    "meta_blocking_cnp": _oracle_meta_blocking(),
    "linkage_fuzzy_match": _oracle_linkage_fuzzy(),
    "linkage_monge_elkan": _oracle_linkage_monge_elkan(),
    "blocking_workload_metrics": _oracle_blocking_metrics(),
    "linkage_reciprocal_match": _oracle_linkage_reciprocal(),
    "er_dedupe_golden": _oracle_er_dedupe(),
    "linkage_patterns_cc": _oracle_linkage_patterns_cc(),
    "linkage_incremental_match": _oracle_linkage_incremental(),
    "er_resumable_golden": _oracle_er_dedupe(),
    "linkage_tf_table": _oracle_linkage_tf(),
    "er_incremental_golden": _oracle_er_dedupe(),
    "linkage_soundex_keys": _oracle_soundex_keys(),
    "linkage_soundex_match": _oracle_soundex_match(),
    "er_swoosh_golden": _oracle_er_swoosh(),
    "blocking_soundex_metrics": _oracle_blocking_soundex(),
}

# sf-dependent oracles (fixture-path readers): ORACLE_SQL above bakes
# the driver-contract default (sf0.01).  Harnesses that sweep other
# scale factors (tools/check_oracles.py) rebuild these per sf so the
# SQL reads the SAME fixture the Ray query processes.
_SF_ORACLES = {
    "parse_ner_mentions": _oracle_parse_ner,
    "clef_mentions": _oracle_parse_ner,
    "ned_mentions": _oracle_ned_mentions,
    "ned_extract_pages": _oracle_ned_extract_pages,
    "ned_links": _oracle_ned_links,
    "ned_links_auto": _oracle_ned_links,
    "pages_per_host": _oracle_pages_per_host,
    "pages_recrawl_latest": _oracle_pages_recrawl,
    "pages_split_by_host": _oracle_pages_split_by_host,
    "entity_cooc_graph": _oracle_entity_cooc,
    "entity_jaccard_relatedness": _oracle_entity_jaccard,
    "entity_cooc_triangles": _oracle_entity_triangles,
    "entity_cooc_components": _oracle_entity_components,
    "entity_cooc_components_altstar": _oracle_entity_components,
    "entity_cooc_clustering": _oracle_entity_clustering,
    "entity_cooc_kcore": _oracle_entity_kcore,
    "ned_cluster_contingency": _oracle_ned_contingency,
    "surface_edit_join": _oracle_surface_editjoin,
    "docs_token_cosine": _oracle_docs_token_cosine,
    "docs_shingle_containment": _oracle_docs_containment,
    "linkage_patterns": _oracle_linkage_patterns,
    "linkage_patterns_jw3": _oracle_linkage_jw3,
    "linkage_patterns_3state": _oracle_linkage_3state,
    "linkage_clerical_pairs": _oracle_linkage_clerical,
    "linkage_group_match": _oracle_linkage_group,
    "linkage_pr_curve": _oracle_linkage_pr,
    "linkage_golden_records": _oracle_linkage_golden,
    "surface_edit_clusters": _oracle_surface_clusters,
    "meta_blocking_cnp": _oracle_meta_blocking,
    "linkage_fuzzy_match": _oracle_linkage_fuzzy,
    "linkage_monge_elkan": _oracle_linkage_monge_elkan,
    "blocking_workload_metrics": _oracle_blocking_metrics,
    "linkage_reciprocal_match": _oracle_linkage_reciprocal,
    "er_dedupe_golden": _oracle_er_dedupe,
    "linkage_patterns_cc": _oracle_linkage_patterns_cc,
    "linkage_incremental_match": _oracle_linkage_incremental,
    "er_resumable_golden": _oracle_er_dedupe,
    "linkage_tf_table": _oracle_linkage_tf,
    "er_incremental_golden": _oracle_er_dedupe,
    "linkage_soundex_keys": _oracle_soundex_keys,
    "linkage_soundex_match": _oracle_soundex_match,
    "er_swoosh_golden": _oracle_er_swoosh,
    "blocking_soundex_metrics": _oracle_blocking_soundex,
}


def oracle_sql_for(sf_dir: str) -> dict:
    """ORACLE_SQL with the fixture-path oracles re-pointed at
    ``sf_dir``'s fixture (materializing it if needed)."""
    pages_dir_for_sf(sf_dir)
    out = dict(ORACLE_SQL)
    for name, fn in _SF_ORACLES.items():
        out[name] = fn(sf_dir)
    return out


# The flagship NED chain leads so the driver's windowed gate always
# covers it; every other oracle-backed query follows in registration
# order; the self-checking (no-DuckDB-twin) queries come last.
_FLAGSHIP_FIRST = [
    "ned_links",
    "ned_links_auto",
    "ned_extract_pages",
    "ned_mentions",
    "clef_mentions",
    "parse_ner_mentions",
    "media_decode",
    "media_decode_ppm",
    "media_decode_png",
    "media_decode_jpeg",
    "media_decode_wav",
]


def _ordered_queries() -> dict:
    order = [k for k in _FLAGSHIP_FIRST if k in _QUERY_FNS]
    order += [k for k in _QUERY_FNS if k in ORACLE_SQL and k not in order]
    order += [k for k in _QUERY_FNS if k not in order]
    return {k: _QUERY_FNS[k] for k in order}


QUERIES = _ordered_queries()
