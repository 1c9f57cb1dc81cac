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
    there are fewer than 50), no block-changed stale query (directly
    edited code) may sit outside while anything driver-verified holds a
    slot, and the rest must drain by driver-row age — a query whose
    newest driver row is older may never sit outside the window while a
    newer-round query occupies a slot (helper-only stale outranks fresh
    only within the same round)."""
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

    def block_changed(name):
        fp = fps.get(name) or {}
        cur = registry.query_block_sha(specs[name])
        return not (
            fp.get("block_sha") is not None
            and cur is not None
            and fp["block_sha"] == cur
        )

    # block-changed stales (directly edited code) are the highest-risk
    # unverified class: none may sit outside while any driver-verified
    # query (helper-only stale or fresh) occupies a window slot
    verified_in = [n for n in inside
                   if st[n] != "never" and not (st[n] == "stale" and block_changed(n))]
    block_out = [n for n in outside if st[n] == "stale" and block_changed(n)]
    assert not (verified_in and block_out), (
        f"block-changed stales outside the window while verified queries "
        f"hold slots: {block_out}"
    )
    # within block-changed stales, oldest driver rows stay in
    bc_in = [greens[n] for n in inside if st[n] == "stale" and block_changed(n)]
    bc_out = [greens[n] for n in outside if st[n] == "stale" and block_changed(n)]
    if bc_in and bc_out:
        assert max(bc_in) <= min(bc_out)
    # the rest drain by driver-row age: no older-round query may sit
    # outside while a newer-round one holds a slot
    rest_in = [n for n in verified_in]
    rest_out = [n for n in outside
                if st[n] != "never" and not (st[n] == "stale" and block_changed(n))]
    if rest_in and rest_out:
        assert max(greens[n] for n in rest_in) <= min(greens[n] for n in rest_out), (
            "round-recency drain violated: newer-round query inside the "
            "window while an older-round one sits outside"
        )
        # within the boundary round, helper-only stale outranks fresh
        boundary = min(greens[n] for n in rest_out)
        fresh_in_boundary = [n for n in rest_in
                             if greens[n] == boundary and st[n] == "fresh"]
        stale_out_boundary = [n for n in rest_out
                              if greens[n] == boundary and st[n] == "stale"]
        assert not (fresh_in_boundary and stale_out_boundary), (
            f"round-{boundary} fresh queries hold slots while same-round "
            f"helper-only stales sit outside: {stale_out_boundary}"
        )


def test_tampered_fingerprint_rotates_query_forward():
    """Synthetic module change: blanking a fresh query's fingerprint must
    move it ahead of every fresh query of the same or newer round (helper-
    only staleness folds into the round-recency drain); blanking its
    block_sha too (a direct edit) must move it ahead of every verified
    query regardless of round."""
    registry.load_all()
    greens = registry.last_green_rounds()
    baseline = registry.showcase_order()
    # pick the last query in the baseline order that has a green row — by
    # construction the most-proven, freshest-sorted one
    victim = next(n for n in reversed(baseline) if n in greens)
    with open(registry._FINGERPRINTS_PATH) as f:
        fps = json.load(f)
    specs = registry.load_all()
    fresh = [
        n
        for n in baseline
        if n != victim
        and n in greens
        and fps.get(n, {}).get("sha256") == registry.query_fingerprint(specs[n])
    ]
    # helper-only tamper: sha mismatch, block intact
    fps_tampered = dict(fps)
    fps_tampered[victim] = {**fps_tampered[victim], "sha256": "0" * 64}
    reordered = registry.showcase_order(fingerprints=fps_tampered)
    assert reordered.index(victim) < baseline.index(victim)
    same_or_newer = [n for n in fresh if greens[n] >= greens[victim]]
    if same_or_newer:
        assert reordered.index(victim) < min(
            reordered.index(n) for n in same_or_newer
        )
    # block tamper (direct edit): outranks every verified query that is
    # not itself block-changed stale (within the block-changed class the
    # oldest driver rows still front)
    fps_block = dict(fps)
    fps_block[victim] = {
        **fps_block[victim], "sha256": "0" * 64, "block_sha": "0" * 64
    }
    reordered = registry.showcase_order(fingerprints=fps_block)

    def block_changed(name):
        fp = fps_block.get(name) or {}
        cur = registry.query_block_sha(specs[name])
        return not (
            fp.get("block_sha") is not None
            and cur is not None
            and fp["block_sha"] == cur
        )

    verified = [
        n for n in reordered
        if n != victim and n in greens and not block_changed(n)
    ]
    if verified:
        assert reordered.index(victim) < min(
            reordered.index(n) for n in verified
        )


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
