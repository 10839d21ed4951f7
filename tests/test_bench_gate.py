"""The bench quiet-gate decision logic (VERDICT r11 item 1 — the third
iteration of the gate). Pure-predicate tests pin the observed capture
epochs: every genuinely quiet close ACCEPTED, every capture the judge
had to arbitrate as inflated REJECTED. No Spark session involved.

The real-world samples below are the recorded host stamps from the
BENCH_r09-r11 artifacts and the r10/r11 quiet re-runs (BENCH_NOISE.md /
verify notes); the gate exists because load1-only + a 1.15x calib band
stamped three of them "quiet" while their totals read 30-67% inflated.
"""

import bench


REF = bench._QUIET_CALIB_REF_MS  # 108.0 on this host


def _host(load1, load5, calib):
    return {"load1": load1, "load5": load5, "calib_spin_ms": calib}


def test_genuinely_quiet_epochs_pass():
    # the r11 builder close (13.264 s total, calib 107.4) and the
    # r7-r10 quiet closes (calib 106-110)
    assert bench._epoch_is_quiet(_host(0.05, 0.10, 107.4), REF)
    assert bench._epoch_is_quiet(_host(0.30, 0.45, 106.4), REF)
    assert bench._epoch_is_quiet(_host(0.0, 0.0, 110.0), REF)
    # exactly at the band edge: 1.08 * 108 = 116.64
    assert bench._epoch_is_quiet(_host(0.1, 0.1, 116.6), REF)


def test_r11_artifact_of_record_epoch_rejected():
    """BENCH_r11.json shipped 22.151 s stamped "quiet": load1 0.18 but
    load5 3.08 (settling host) and calib 120.3 (1.114x — inside the old
    1.15x band, outside the new 1.08x). BOTH new checks reject it
    independently."""
    assert not bench._epoch_is_quiet(_host(0.18, 3.08, 120.3), REF)
    # even with loads faked quiet, the calib alone rejects
    assert not bench._epoch_is_quiet(_host(0.1, 0.1, 120.3), REF)
    # even with calib faked quiet, load5 alone rejects
    assert not bench._epoch_is_quiet(_host(0.18, 3.08, 107.0), REF)


def test_r9_and_r10_settling_epochs_rejected():
    # r9 artifact (18.116 s): load1 2.11, load5 3.06, calib 118.5
    assert not bench._epoch_is_quiet(_host(2.11, 3.06, 118.5), REF)
    # r10 close hazard (load1 0.21 "quiet" right after a 25-min suite,
    # calib 125-139)
    assert not bench._epoch_is_quiet(_host(0.21, 2.51, 125.0), REF)


def test_unprobeable_platform_falls_back_to_calib_only():
    assert bench._epoch_is_quiet(_host(None, None, 110.0), REF)
    assert not bench._epoch_is_quiet(_host(None, None, 120.3), REF)


def test_sentinel_band_separates_quiet_from_inflated_q01():
    """The sentinel thresholds are data, not code — pin that the stored
    reference and band separate the recorded quiet q01 warm-mins
    (1.19-1.41 s: r7 close 1.41, BENCH_NOISE quiet samples 1.19-1.26)
    from the arbitrated-inflated captures (r9 1.752, r11 2.441)."""
    cut = bench._SENTINEL_BAND * bench._QUIET_SENTINEL_REF_S
    for quiet in (1.193, 1.247, 1.262, 1.364, 1.41, 1.581):
        assert quiet <= cut, quiet
    for inflated in (1.752, 2.441):
        assert inflated > cut, inflated
