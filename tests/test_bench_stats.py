"""Unit tests for bench.robust_slope_stats — the MAD burst-rejection
contract behind every published timing spread (r4 verdict task 3: driver
captures on a non-quiet host must still meet the <=10% spread budget)."""
import pytest

from bench import robust_slope_stats


def test_clean_set_passes_through():
    slopes = [1.00, 1.01, 0.99, 1.02, 0.98, 1.00, 1.01]
    p50, spread, rej = robust_slope_stats(slopes)
    assert p50 == pytest.approx(1.00)
    assert rej == 0
    assert spread == pytest.approx(0.04, abs=0.005)


def test_burst_outliers_rejected():
    # two multi-ms host bursts among tight estimates: rejected, and the
    # published spread reflects only the surviving set
    slopes = [1.00, 1.01, 0.99, 3.50, 1.02, 5.00, 1.00]
    p50, spread, rej = robust_slope_stats(slopes)
    assert rej == 2
    assert p50 == pytest.approx(1.005, abs=0.01)
    assert spread < 0.05


def test_five_percent_floor_keeps_legit_scatter():
    # 3% scatter with a very tight core: the 5%-of-median floor stops the
    # MAD bound from trimming real few-percent noise into a fake spread
    slopes = [1.000, 1.0001, 0.9999, 1.0, 1.03, 0.97, 1.0]
    p50, spread, rej = robust_slope_stats(slopes)
    assert rej == 0                    # within the 5% floor: all kept
    assert spread == pytest.approx(0.06, abs=0.01)


def test_degenerate_zero_mad_drops_extremes():
    # duplicate-heavy set -> MAD is zero, the 5% floor rejects everything
    # but the duplicates, leaving <3: fall back to dropping min and max
    # rather than reporting from a 2-element set
    slopes = [1.0, 1.0, 5.0]
    p50, spread, rej = robust_slope_stats(slopes)
    assert rej == 2
    assert p50 == pytest.approx(1.0)


def test_even_bimodal_kept_with_honest_spread():
    # an even bimodal split has a LARGE MAD - nothing is rejected and the
    # published spread honestly shows the disagreement instead of picking
    # a mode
    slopes = [1.0, 1.0, 2.0, 2.0]
    p50, spread, rej = robust_slope_stats(slopes)
    assert rej == 0
    assert spread > 0.5


def test_suspect_captures_say_so():
    # a capture dominated by bursts reports a LARGE n_rejected — the
    # honesty channel the artifact carries (Timing.ms_dict)
    slopes = [1.0, 9.0, 11.0, 10.0, 10.5, 9.5, 10.2]
    _, _, rej = robust_slope_stats(slopes)
    assert rej >= 1
