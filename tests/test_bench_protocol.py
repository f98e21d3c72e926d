"""bench.py pair-selection protocol (pure logic, no Spark).

The crawl scaling bench reports the time-adjacent (8-core, 2-core)
pair from the least-throttled window; when even the best pair reads
below the clean-window efficiency floor it spends exactly one extra
pair. These tests pin the selection rule so a refactor can't silently
change what the driver's BENCH artifact measures."""

import sys

sys.path.insert(0, "/root/repo")

from bench import select_best_pair  # noqa: E402


def _pair(steady8, steady2):
    return ({"steady_pages_per_sec": steady8}, {"steady_pages_per_sec": steady2})


def test_selects_fastest_8core_pair_not_highest_ratio():
    # pair A: slower 8-core but flattering ratio (throttled 2-core);
    # pair B: fastest 8-core with an honest ratio — B must win.
    a = _pair(2000.0, 480.0)   # eff 1.04 but throttled window
    b = _pair(3400.0, 950.0)   # eff 0.895, least-throttled
    assert select_best_pair([a, b]) is b


def test_no_extra_pair_above_floor():
    calls = []

    def extra():
        calls.append(1)
        return _pair(9999.0, 9999.0)

    good = _pair(3400.0, 950.0)  # eff 0.895 >= 0.85
    assert select_best_pair([good], run_pair=extra) is good
    assert not calls


def test_one_extra_pair_below_floor():
    calls = []
    clean = _pair(3400.0, 950.0)

    def extra():
        calls.append(1)
        return clean

    degraded = _pair(2660.0, 806.0)  # eff 0.825 < 0.85
    assert select_best_pair([degraded], run_pair=extra) is clean
    assert calls == [1]


def test_extra_pair_kept_only_if_faster():
    calls = []
    worse = _pair(2000.0, 700.0)

    def extra():
        calls.append(1)
        return worse

    degraded = _pair(2660.0, 806.0)
    # still below floor after the retry → keep the original best
    assert select_best_pair([degraded], run_pair=extra) is degraded
    assert calls == [1]


def test_no_retry_hook_is_safe():
    degraded = _pair(2660.0, 806.0)
    assert select_best_pair([degraded]) is degraded


def test_one_extra_pair_above_ceiling():
    """Implausibly HIGH efficiency (throttled 2-core half flattering
    the ratio) triggers the same single retry as a below-floor read —
    the retry protocol is symmetric (ADVICE r03). Selection stays
    fastest-8: the clean pair wins because its 8-core run is faster."""
    calls = []
    clean = _pair(3400.0, 950.0)  # eff 0.895

    def extra():
        calls.append(1)
        return clean

    flattered = _pair(3000.0, 650.0)  # eff 1.15 > 1.02 ceiling
    assert select_best_pair([flattered], run_pair=extra) is clean
    assert calls == [1]


def _pair_e2e(steady8, steady2, e8, e2):
    return (
        {"steady_pages_per_sec": steady8, "pages_per_sec": e8},
        {"steady_pages_per_sec": steady2, "pages_per_sec": e2},
    )


def test_one_extra_pair_on_bad_e2e_even_when_steady_clean():
    """An episode tail that only hits the short startup/drain rounds
    wrecks e2e while steady reads clean (measured 2026-08-21: steady
    0.897 / e2e 0.618) — the e2e floor triggers the same single retry."""
    calls = []
    clean = _pair_e2e(3400.0, 950.0, 2100.0, 660.0)  # e2e 0.795

    def extra():
        calls.append(1)
        return clean

    episode = _pair_e2e(2690.0, 750.0, 1436.0, 581.0)  # steady .897, e2e .618
    assert select_best_pair([episode], run_pair=extra) is clean
    assert calls == [1]


def test_bad_e2e_retry_cannot_flatter():
    """Selection stays fastest-8 steady: a retry pair with a BETTER
    e2e ratio but a slower 8-core steady run does not replace the
    original — the e2e trigger spends a pair, it never shops ratios."""
    episode = _pair_e2e(2690.0, 750.0, 1436.0, 581.0)
    better_ratio = _pair_e2e(2000.0, 700.0, 1800.0, 520.0)  # e2e 0.865
    assert select_best_pair([episode], run_pair=lambda: better_ratio) is episode


def test_pairs_without_e2e_fields_skip_the_e2e_trigger():
    good = _pair(3400.0, 950.0)  # steady 0.895, no pages_per_sec keys
    calls = []

    def extra():
        calls.append(1)
        return good

    assert select_best_pair([good], run_pair=extra) is good
    assert not calls


def test_above_ceiling_retry_cannot_flatter():
    """If the retry pair is slower on the 8-core side, the original
    (implausible) pair is still reported — selection by fastest-8 means
    the ceiling retry can only REPLACE a suspect window with a faster
    (less throttled) one, never shop for a better ratio."""
    flattered = _pair(3000.0, 650.0)  # eff 1.15
    slower = _pair(2500.0, 700.0)
    assert select_best_pair([flattered], run_pair=lambda: slower) is flattered
