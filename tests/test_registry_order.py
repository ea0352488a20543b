"""The driver's correctness gate snapshots the FIRST 50 entries of
``queries()`` in dict order — keep every one of those slots
oracle-backed (hash-checked vs DuckDB) with the flagship NED chain in
the window, and the self-checking no-oracle queries behind them."""

from sbb_ned_ray.pipelines.queries import ORACLE_SQL, QUERIES, _QUERY_FNS

DRIVER_WINDOW = 50

FLAGSHIP = [
    "ned_links",
    "ned_links_auto",
    "ned_extract_pages",
    "ned_mentions",
    "clef_mentions",
    "parse_ner_mentions",
]


def test_driver_window_is_all_oracle_backed():
    first = list(QUERIES)[:DRIVER_WINDOW]
    missing = [k for k in first if k not in ORACLE_SQL]
    assert not missing, f"no-oracle queries inside the driver window: {missing}"


def test_flagship_chain_leads_the_registry():
    first = list(QUERIES)[:DRIVER_WINDOW]
    out = [k for k in FLAGSHIP if k not in first]
    assert not out, f"flagship queries outside the driver window: {out}"
    assert list(QUERIES)[0] == "ned_links"


def test_reordering_loses_nothing():
    assert set(QUERIES) == set(_QUERY_FNS)
    assert len(QUERIES) == len(_QUERY_FNS)
    # every oracle key still resolves to a registered query
    assert set(ORACLE_SQL) <= set(QUERIES)
