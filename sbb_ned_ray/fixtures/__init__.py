from sbb_ned_ray.fixtures.generator import (
    FixtureSpec,
    generate_fixture,
    materialize_fixture,
    pages_dir_for_sf,
)

__all__ = [
    "FixtureSpec",
    "generate_fixture",
    "materialize_fixture",
    "pages_dir_for_sf",
]
