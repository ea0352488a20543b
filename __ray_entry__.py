"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship NED pipeline (pages → mentions →
candidates → pair scoring → decision → transitive clusters) on the
deterministic synthetic pages table scaled to sf0.001;
``queries()``/``oracle_sql()`` expose the operator inventory
(SURVEY.md §2 + training-data operators) for the DuckDB correctness
gate.  Ray is initialised by the driver — nothing here calls
``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on the sf0.001-scaled synthetic pages table."""
    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.fixtures.generator import pages_dir_for_sf
    from sbb_ned_ray.pipelines.ned import run_ned

    pages_dir = pages_dir_for_sf("/root/testdata/sf0.001")
    return run_ned(pages_dir, PipelineConfig())


def queries() -> dict[str, Callable[[str], Any]]:
    from sbb_ned_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sbb_ned_ray.fixtures.generator import pages_dir_for_sf
    from sbb_ned_ray.pipelines.queries import ORACLE_SQL

    # a few oracles read fixture parquet by literal path (BIO round-trip,
    # CLEF TSV) — materialize the sf0.01 fixture so the paths exist even
    # when the driver runs the SQL before the Ray query
    pages_dir_for_sf("/root/testdata/sf0.01")
    return dict(ORACLE_SQL)
