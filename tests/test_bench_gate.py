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
    (1.19-1.41 s: r7 close 1.41, r12 close 1.197, BENCH_NOISE quiet
    samples 1.19-1.26) from the inflated captures. Gate v4 (VERDICT r12
    item 1a) tightened the band from 1.25x to 1.08x: the old cut
    (1.6875) admitted the settling gap above the quiet evidence — the
    r12 artifact's sentinel read 1.648 s inside it and stamped
    `unreliable: false` on a 32.7 s total 2.7x the same-code quiet
    close, and the judge's r12 runs reproduced 1.596/1.679 s "quiet"
    sentinels on visibly degraded epochs."""
    cut = bench._SENTINEL_BAND * bench._QUIET_SENTINEL_REF_S
    assert cut <= 1.46  # ~1.08x: quiet evidence tops at 1.41
    for quiet in (1.193, 1.197, 1.247, 1.262, 1.364, 1.41):
        assert quiet <= cut, quiet
    # r9 1.752, r11 2.441, and the three r12-era settling-gap readings
    # (artifact 1.648; judge repro 1.596/1.679) the 1.25x band admitted
    for inflated in (1.596, 1.648, 1.679, 1.752, 2.441):
        assert inflated > cut, inflated


def test_r12_artifact_of_record_flagged_by_gate_v4():
    """BENCH_r12.json — the fourth consecutive epoch-inflated artifact
    of record (~32.7 s warm vs the 12.033 s same-code quiet close):
    pre-gate honestly recorded "gave up still degraded" (load ok after
    871 s wait but calib 134.1), then the 1.25x sentinel (1.648 s)
    single-handedly overrode it to `unreliable: false`. Under v4 the
    capture is flagged THREE independent ways: the sentinel band
    rejects 1.648; even with a quiet sentinel the in-window calib
    (134.1) blocks exoneration of a degraded pre-gate; and the mid-run
    bursts (q03 8.529 vs ref ~1.8, t04 4.618 vs 1.35, d02 2.839 vs
    0.75) trip the >= 3-contaminated-queries rule."""
    # as captured: pre-gate degraded, sentinel 1.648 (assume the post
    # sentinel would have read quiet — flagged regardless)
    assert bench._artifact_unreliable(False, 1.648, 1.3, 134.1)
    # even a clean pre+post sentinel cannot exonerate with the
    # in-window calib probe outside the quiet band (ADVICE r12)
    assert bench._artifact_unreliable(False, 1.3, 1.3, 134.1)
    # a quiet in-window calib plus both sentinels quiet DOES exonerate
    # a pre-gate give-up (the observed calib-218-ms-transient case)
    assert not bench._artifact_unreliable(False, 1.3, 1.3, 110.0)
    # mid-run contamination: a quiet pre-gate epoch is still flagged
    # when the POST sentinel reads degraded
    assert bench._artifact_unreliable(True, 1.25, 1.648, 108.0)
    # and the genuinely quiet close (r12: sentinel 1.197, calib 108.3)
    assert not bench._artifact_unreliable(True, 1.197, 1.25, 108.3)


def test_r12_midrun_bursts_trip_contamination_refs():
    """The r12 artifact's localized mid-run bursts vs the per-query
    quiet references (VERDICT r12 item 3): q03/t04/d02 read 3-5x their
    quiet bands while q01/q18/s01 in the SAME capture were at or below
    r11 values — exactly the bimodal signature the per-query check
    exists to catch. Three queries past the 1.5x band flag the
    artifact."""
    r12 = {
        "q03_region_revenue": 8.529,
        "t04_simhash": 4.618,
        "d02_minhash_signatures": 2.839,
        # clean-in-the-same-capture readings must NOT flag
        "q01_pricing_summary": 1.648,
        "q18_first_event_dedup": 0.433,
        "s01_cosine_topk": 0.783,
    }
    flagged = [
        n
        for n, v in r12.items()
        if v > bench._QUERY_CONTAM_BAND * bench._QUIET_QUERY_REF_S[n]
    ]
    assert flagged == [
        "q03_region_revenue",
        "t04_simhash",
        "d02_minhash_signatures",
    ]
    assert len(flagged) >= 3  # trips the systemic-burst rule


def test_query_refs_cover_headline_and_tracked_extras():
    """Every headline query has a quiet reference (the contamination
    self-report must cover the whole headline total), and every
    reference names a real registered query."""
    from liq_stream_spark.plans import REGISTRY

    for name in bench.HEADLINE:
        assert name in bench._QUIET_QUERY_REF_S, name
    for name in bench._QUIET_QUERY_REF_S:
        assert name in REGISTRY, name
