"""Hyperparameter evaluation grid: full sweep shape, shared index, and
the deployment knobs landing at the top."""


def test_ned_eval_grid(ray_session, tiny_fixture_dir):
    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.pipelines.evalgrid import ned_eval_grid

    grid = {"max_dist": (0.1, 0.25), "max_candidates": (5, 25),
            "threshold": (0.1, 0.5)}
    out = ned_eval_grid(tiny_fixture_dir, PipelineConfig(), grid)
    assert len(out) == 8
    # sorted best-first and the deployment defaults reach F1 = 1.0 on
    # the fixture (the flagship e2e gate, via the grid path)
    assert out.loc[0, "f1_e6"] == 1_000_000
    best = out[(out.max_dist == 0.25) & (out.max_candidates == 25)
               & (out.threshold == 0.1)]
    assert int(best["f1_e6"].iloc[0]) == 1_000_000
    # a degenerate threshold must not outrank the calibrated one
    assert out["f1_e6"].is_monotonic_decreasing
