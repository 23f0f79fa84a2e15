"""Guard against non-physical slope-timing samples (VERDICT r4 weak #4:
DW_SEAM_RACE_r04.json committed a -134.373 ms "measurement"). The filter and
the resampling loop are pure host logic — no device needed."""

import pytest

from ofa_sr_tpu.search.latency import filter_slope_samples, sample_slopes


class TestFilterSlopeSamples:
    def test_clean_samples_pass(self):
        kept, rejected = filter_slope_samples([19.1, 19.6, 18.4])
        assert kept == [18.4, 19.1, 19.6]
        assert rejected == []

    def test_negative_sample_rejected(self):
        # the literal r4 artifact values
        kept, rejected = filter_slope_samples([-134.373, 19.081, 19.583])
        assert kept == [19.081, 19.583]
        assert rejected == [-134.373]

    def test_zero_rejected(self):
        kept, rejected = filter_slope_samples([0.0, 5.0])
        assert kept == [5.0]
        assert rejected == [0.0]

    def test_spread_outlier_rejected(self):
        # 80 is >3x the median (19.5) of the positive samples
        kept, rejected = filter_slope_samples([19.0, 20.0, 80.0])
        assert kept == [19.0, 20.0]
        assert rejected == [80.0]

    def test_low_outlier_rejected(self):
        kept, rejected = filter_slope_samples([19.0, 20.0, 21.0, 1.0])
        assert 1.0 in rejected
        assert kept == [19.0, 20.0, 21.0]

    def test_all_garbage(self):
        kept, rejected = filter_slope_samples([-1.0, -2.0, 0.0])
        assert kept == []
        assert len(rejected) == 3


class TestSampleSlopes:
    def test_resamples_past_garbage(self):
        # window pairs: first pair yields a negative slope (big window
        # "finished" before the small one — a relay stall), then clean ones
        walls = iter([100.0, 50.0,    # slope (50-100)/4 = -12.5  -> reject
                      10.0, 90.0,     # slope 20
                      10.0, 86.0,     # slope 19
                      10.0, 94.0])    # slope 21
        fn = lambda k: next(walls)
        kept, rejected = sample_slopes(fn, n_small=2, n_big=6, reps=3)
        assert kept == [19.0, 20.0, 21.0]
        assert rejected == [-12.5]

    def test_raises_when_nothing_survives(self):
        fn = lambda k: 0.0  # every slope is exactly 0 -> non-physical
        with pytest.raises(RuntimeError, match="non-physical"):
            sample_slopes(fn, n_small=2, n_big=6, reps=3)

    def test_bounded_attempts(self):
        calls = []

        def fn(k):
            calls.append(k)
            return 0.0

        with pytest.raises(RuntimeError):
            sample_slopes(fn, n_small=2, n_big=6, reps=3)
        # max_attempts = 2*3+2 = 8 pairs -> 16 window calls
        assert len(calls) == 16

    def test_stops_at_reps(self):
        walls = iter([10.0, 90.0, 10.0, 90.0, 10.0, 90.0, 10.0, 90.0])
        calls = []

        def fn(k):
            calls.append(k)
            return next(walls)

        kept, _ = sample_slopes(fn, n_small=2, n_big=6, reps=3)
        assert len(kept) == 3
        assert len(calls) == 6  # exactly 3 pairs


class TestSelectSlopeVsWall:
    def test_clean_slope_wins(self):
        from ofa_sr_tpu.search.latency import select_slope_vs_wall
        best, ok, rej = select_slope_vs_wall([19.0, 20.1, 21.3],
                                             [24.8, 25.1, 24.9])
        assert best == 19.0
        assert rej == []

    def test_r5_garbage_slope_rejected(self):
        # the literal r5 cls values: a 5.224 ms "step" cannot coexist with
        # 24.8 ms scan-amortized walls
        from ofa_sr_tpu.search.latency import select_slope_vs_wall
        best, ok, rej = select_slope_vs_wall([5.224, 22.9, 23.4],
                                             [24.806, 25.132])
        assert rej == [5.224]
        assert best == 22.9

    def test_all_rejected_falls_back_to_wall(self):
        # every slope below the bound -> the smallest wall is the honest
        # (conservative) answer, never the garbage slope
        from ofa_sr_tpu.search.latency import select_slope_vs_wall
        best, ok, rej = select_slope_vs_wall([1.0, 2.0], [24.8, 25.0])
        assert ok == []
        assert best == 24.8
