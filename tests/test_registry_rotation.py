"""Staleness-aware showcase rotation (registry.showcase_order).

The driver's correctness gate samples a 50-query prefix of `queries()`;
these tests pin the invariant that any query whose implementation changed
since its last driver-green row sorts inside that window.
"""

import json

from reddit_sentiment_spark_streaming_pipeline_spark import registry

WINDOW = 50


def test_driver_window_holds_highest_priority_queries():
    """The 50-query window must hold exactly the queries most in need of
    verification: every never-verified query sorts inside it (as long as
    there are fewer than 50), and no fresh (proven-on-current-code) query
    may occupy a window slot while a stale one sits outside. When the
    stale set itself exceeds the window, the ones left out must be the
    most recently verified — the lowest-risk tail."""
    specs = registry.load_all()
    order = list(specs)
    greens = registry.last_green_rounds()
    try:
        with open(registry._FINGERPRINTS_PATH) as f:
            fps = json.load(f)
    except OSError:
        fps = {}
    def status(name):
        rnd = greens.get(name)
        if rnd is None:
            return "never"
        fp = fps.get(name)
        cur = registry.query_fingerprint(specs[name])
        if fp is None or cur is None or fp.get("sha256") != cur:
            return "stale"
        return "fresh"

    st = {name: status(name) for name in order}
    never = [n for n in order if st[n] == "never"]
    if len(never) <= WINDOW:
        for n in never:
            assert order.index(n) < WINDOW, f"never-verified {n} outside window"
    inside, outside = order[:WINDOW], order[WINDOW:]
    if any(st[n] != "fresh" for n in outside):
        assert all(st[n] != "fresh" for n in inside), (
            "fresh queries hold window slots while unverified ones sit "
            f"outside: inside-fresh={[n for n in inside if st[n] == 'fresh']}, "
            f"outside-unverified={[n for n in outside if st[n] != 'fresh']}"
        )
    # stale queries whose OWN block changed since their green row are the
    # highest-risk unverified class: none may sit outside while any
    # helper-only stale occupies a window slot
    def block_changed(name):
        fp = fps.get(name) or {}
        cur = registry.query_block_sha(specs[name])
        return not (
            fp.get("block_sha") is not None
            and cur is not None
            and fp["block_sha"] == cur
        )

    helper_in = [n for n in inside if st[n] == "stale" and not block_changed(n)]
    block_out = [n for n in outside if st[n] == "stale" and block_changed(n)]
    assert not (helper_in and block_out), (
        f"block-changed stales outside the window while helper-only "
        f"stales hold slots: {block_out}"
    )
    # within each subclass, the most recently verified (lowest-risk) tail
    # is what falls out
    for changed in (True, False):
        stale_out = [greens[n] for n in outside
                     if st[n] == "stale" and block_changed(n) == changed]
        stale_in = [greens[n] for n in inside
                    if st[n] == "stale" and block_changed(n) == changed]
        if stale_out and stale_in:
            assert max(stale_in) <= min(stale_out), (
                f"subclass block_changed={changed}: round {min(stale_out)} "
                f"fell outside while round {max(stale_in)} stayed in"
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
    # it must now outrank every query still proven on current code
    specs = registry.load_all()
    fresh = [
        n
        for n in reordered
        if n != victim
        and n in greens
        and fps_tampered.get(n, {}).get("sha256")
        == registry.query_fingerprint(specs[n])
    ]
    if fresh:
        assert reordered.index(victim) < min(reordered.index(n) for n in fresh)


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
