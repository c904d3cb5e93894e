"""U-shaped multi-touch attribution: the credit-conservation audit —
every attributed purchase's credits sum to exactly 1000 milli-units,
positions are consistent with the touch count, and the attributed
purchase set equals last-touch attribution's (same lookback rule)."""

from __future__ import annotations

from demo_segmenter_spark.registry import REGISTRY, load_all_operators
from tests.conftest import SF_SMOKE

load_all_operators()


def test_ushape_credits_conserve_and_positions_consistent(spark):
    rows = REGISTRY["a_attribution_ushape"].fn(spark, SF_SMOKE).collect()
    assert rows
    by_p: dict = {}
    for r in rows:
        by_p.setdefault(r.event_id, []).append(r)
    for pid, touches in by_p.items():
        assert sum(t.credit_milli for t in touches) == 1000, pid
        poss = sorted(t.pos for t in touches)
        k = len(touches)
        if k == 1:
            assert poss == ["only"]
        else:
            assert poss.count("first") == 1 and poss.count("last") == 1
            assert poss.count("middle") == k - 2
            for t in touches:
                if t.pos in ("first", "last"):
                    assert t.credit_milli == (500 if k == 2 else 400)
    # same attributed-purchase universe as last-touch
    lt = {
        r.event_id
        for r in REGISTRY["a_attribution"].fn(spark, SF_SMOKE).collect()
    }
    assert set(by_p) == lt
