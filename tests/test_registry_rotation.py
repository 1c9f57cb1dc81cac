"""Staleness-aware showcase rotation (registry.showcase_order).

The driver's correctness gate samples a 50-query prefix of `queries()`;
these tests pin the invariant that any query whose implementation changed
since its last driver-green row sorts inside that window.
"""

import json

from reddit_sentiment_spark_streaming_pipeline_spark import registry

WINDOW = 50


def test_stale_queries_sort_inside_driver_window():
    """Any query modified since its last green row is in the first 50."""
    specs = registry.load_all()
    order = list(specs)
    greens = registry.last_green_rounds()
    try:
        with open(registry._FINGERPRINTS_PATH) as f:
            fps = json.load(f)
    except OSError:
        fps = {}
    shas = {}
    for name, spec in specs.items():
        if spec.module not in shas:
            shas[spec.module] = registry.module_sha(spec.module)
    for name, spec in specs.items():
        rnd = greens.get(name)
        fp = fps.get(name)
        stale = rnd is None or fp is None or fp.get("sha256") != shas[spec.module]
        if stale:
            assert order.index(name) < WINDOW, (
                f"{name} is stale (module {spec.module} changed since its "
                f"last green round {rnd}) but sorts at {order.index(name)}, "
                f"outside the driver's {WINDOW}-query window"
            )


def test_tampered_fingerprint_rotates_query_forward():
    """Synthetic module change: blanking a fresh query's fingerprint must
    move it ahead of every fresh query."""
    registry.load_all()
    greens = registry.last_green_rounds()
    baseline = registry.showcase_order()
    # pick the last query in the baseline order that has a green row — by
    # construction the most-proven, freshest-sorted one
    victim = next(n for n in reversed(baseline) if n in greens)
    with open(registry._FINGERPRINTS_PATH) as f:
        fps = json.load(f)
    fps_tampered = dict(fps)
    fps_tampered[victim] = {**fps_tampered[victim], "sha256": "0" * 64}
    reordered = registry.showcase_order(fingerprints=fps_tampered)
    assert reordered.index(victim) < baseline.index(victim)
    assert reordered.index(victim) < WINDOW


def test_order_is_deterministic_and_complete():
    a = registry.showcase_order()
    b = registry.showcase_order()
    assert a == b
    assert sorted(a) == sorted(registry._REGISTRY)


def test_never_verified_sorts_before_stale_and_fresh():
    registry.load_all()
    greens = dict(registry.last_green_rounds())
    baseline = registry.showcase_order()
    victim = next(n for n in reversed(baseline) if n in greens)
    greens.pop(victim)
    reordered = registry.showcase_order(greens=greens)
    assert reordered.index(victim) == 0 or all(
        registry.last_green_rounds().get(n) is None
        or n == victim
        for n in reordered[: reordered.index(victim) + 1]
    )
