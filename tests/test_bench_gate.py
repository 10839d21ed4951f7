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


def test_clock_factor_scales_only_inside_the_calib_band():
    """References are canonical-clock (calib 108) values; a quiet epoch
    whose spin runs slower scales expectations up proportionally, but
    never below canonical (fast clocks: single-thread spin and 32-core
    Spark throughput correlate imperfectly) and never past the calib
    quiet band (a worse clock already fails the pre-gate)."""
    # the r13 close's fast clock (calib 87-95) clamps to canonical
    assert bench._clock_factor(95.3, REF) == 1.0
    assert bench._clock_factor(87.0, REF) == 1.0
    # the r7-r12 canonical clock is ~1.0x
    assert abs(bench._clock_factor(108.3, REF) - 1.003) < 0.01
    # band edge: 116.6/108 = 1.0796 — scaled, not clamped
    assert abs(bench._clock_factor(116.6, REF) - 1.0796) < 0.001
    # a degraded clock (r12's 134.1) clamps AT the band — refs never
    # loosen to exonerate an epoch the calib gate rejects
    assert bench._clock_factor(134.1, REF) == bench._QUIET_CALIB_BAND
    assert bench._clock_factor(None, REF) == 1.0


def test_sentinel_band_separates_quiet_from_inflated_q01():
    """The sentinel thresholds are data, not code — pin that the stored
    reference and band separate the recorded quiet q01 warm-mins ON THE
    CURRENT PLAN (r13 quiet close: 0.879 pre / 0.713 post at calib
    95.3; the r13 compute-spread change made q01 ~35% faster than the
    1.19-1.41 s r7-r12 evidence, so the reference was refreshed to
    1.0 s canonical-clock at the r13 close) from the inflated captures
    (r9 1.752, r11 2.441, r12 1.648/1.596/1.679 — old-plan readings
    that exceed even the old-plan quiet band, and a fortiori today's)."""
    cut = bench._SENTINEL_BAND * bench._QUIET_SENTINEL_REF_S
    assert cut <= 1.09  # ~1.08x of the 1.0 s canonical reference
    for quiet in (0.676, 0.713, 0.805, 0.879, 1.014):
        assert quiet <= cut, quiet
    # at the slowest quiet clock the calib band admits, the scaled cut
    # still accepts a canonical-clock quiet reading
    assert 1.0 <= cut * bench._clock_factor(116.6, REF)
    for inflated in (1.596, 1.648, 1.679, 1.752, 2.441):
        assert inflated > cut * bench._QUIET_CALIB_BAND, inflated


def test_r12_artifact_of_record_flagged_by_gate_v4():
    """BENCH_r12.json — the fourth consecutive epoch-inflated artifact
    of record (~32.7 s warm vs the 12.033 s same-code quiet close):
    pre-gate honestly recorded "gave up still degraded" (load ok after
    871 s wait but calib 134.1), then the 1.25x sentinel (1.648 s)
    single-handedly overrode it to `unreliable: false`. Under v4 the
    capture is flagged THREE independent ways: the sentinel band
    rejects 1.648 (even clock-scaled to the band edge); even with a
    quiet sentinel the in-window calib (134.1) blocks exoneration of a
    degraded pre-gate; and the mid-run bursts trip the >=
    3-contaminated-queries rule (next test)."""
    # as captured: pre-gate degraded, sentinel 1.648 (assume the post
    # sentinel would have read quiet — flagged regardless); clock
    # clamps at the band for the degraded 134.1 calib
    clk = bench._clock_factor(134.1, REF)
    assert bench._artifact_unreliable(False, 1.648, 0.9, 134.1, clock=clk)
    # even a clean pre+post sentinel cannot exonerate with the
    # in-window calib probe outside the quiet band (ADVICE r12)
    assert bench._artifact_unreliable(False, 0.9, 0.9, 134.1, clock=clk)
    # a quiet in-window calib plus both sentinels quiet DOES exonerate
    # a pre-gate give-up (the observed calib-218-ms-transient case)
    assert not bench._artifact_unreliable(False, 0.9, 0.9, 110.0)
    # mid-run contamination: a quiet pre-gate epoch is still flagged
    # when the POST sentinel reads degraded (r12's burst arrived after
    # a clean pre-sentinel)
    assert bench._artifact_unreliable(True, 0.9, 1.648, 108.0)
    # and the r13 genuinely quiet close (sentinel 0.879 pre / 0.713
    # post, in-window calib 87.0) is accepted
    assert not bench._artifact_unreliable(True, 0.879, 0.713, 87.0)


def test_r13_artifact_of_record_exonerated_by_gate_v5():
    """BENCH_r13.json — the fifth consecutive artifact of record that
    needed judge arbitration, this time in the EXONERATING direction
    (VERDICT r13 items: 'What's wrong' #1, 'Next round' #2): pre-gate
    'gave up still degraded' purely on the calib clock band (119.2 then
    128.3 in-window vs the 116.6 cut) at ZERO load (0.01/0.38), both
    sentinels quiet (0.82 pre / 0.476 post), epoch_factor 0.76, zero
    contaminated queries, best total ever recorded (10.848 s) — and
    still stamped `unreliable: true`. Under gate v5 the per-query
    evidence (quiet load + both sentinels + epoch_factor <= 1.1 + zero
    contaminated) exonerates a calib-only pre-gate failure."""
    clk = bench._clock_factor(119.2, REF)
    assert not bench._artifact_unreliable(
        False, 0.82, 0.476, 128.3, clock=clk,
        load_quiet=True, epoch_factor=0.76, n_contaminated=0,
    )
    # every leg of the v5 evidence is REQUIRED — drop any one and the
    # artifact stays flagged:
    assert bench._artifact_unreliable(  # load was not quiet
        False, 0.82, 0.476, 128.3, clock=clk,
        load_quiet=False, epoch_factor=0.76, n_contaminated=0,
    )
    assert bench._artifact_unreliable(  # epoch_factor past the ceiling
        False, 0.82, 0.476, 128.3, clock=clk,
        load_quiet=True, epoch_factor=1.2, n_contaminated=0,
    )
    assert bench._artifact_unreliable(  # any contaminated query blocks
        False, 0.82, 0.476, 128.3, clock=clk,
        load_quiet=True, epoch_factor=0.76, n_contaminated=1,
    )
    assert bench._artifact_unreliable(  # no self-report available
        False, 0.82, 0.476, 128.3, clock=clk,
        load_quiet=True, epoch_factor=None, n_contaminated=0,
    )
    assert bench._artifact_unreliable(  # a degraded sentinel blocks
        False, 1.648, 0.476, 128.3, clock=clk,
        load_quiet=True, epoch_factor=0.76, n_contaminated=0,
    )
    # and the v5 arm cannot loosen gate v4's verdicts: the r12 capture
    # (calib 134.1, epoch_factor ~2.7, 3+ contaminated) stays flagged
    clk12 = bench._clock_factor(134.1, REF)
    assert bench._artifact_unreliable(
        False, 1.648, 0.9, 134.1, clock=clk12,
        load_quiet=True, epoch_factor=2.7, n_contaminated=4,
    )


def test_r12_midrun_bursts_trip_contamination_refs():
    """The r12 artifact's localized mid-run bursts vs the per-query
    quiet references (VERDICT r12 item 3): q03/t04/d02 read 3-5x their
    quiet bands while q18/s01 in the SAME capture were at or below r11
    values — exactly the bimodal signature the per-query check exists
    to catch. Three queries past the 1.5x band flag the artifact.
    (Against the refreshed r13 references the capture's q01 1.648 now
    ALSO reads contaminated — correct: the r13 plan is ~35% faster, so
    an old-plan reading is no longer inside the current quiet band.)"""
    r12 = {
        "q03_region_revenue": 8.529,
        "t04_simhash": 4.618,
        "d02_minhash_signatures": 2.839,
        # clean-in-the-same-capture readings must NOT flag
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


def test_r13_run1_residual_epoch_trips_contamination_refs():
    """The r13 round-close's FIRST invocation (the documented
    first-after-heavy-work residual mode): pre-gate read quiet (load
    0.15/0.13, calib 95.2) and both sentinels passed (1.014/0.676),
    but d14/q09/q13 read 1.8-2.9x their quiet references mid-run — the
    >= 3 rule flagged the artifact with no human in the loop, and the
    second invocation (10.312 s, zero contaminated) became the close."""
    run1 = {
        "d14_verified_dedup_clusters": 17.258,
        "q09_distinct_stats": 3.412,
        "q13_supplier_part_stats": 1.496,
        "q01_pricing_summary": 0.805,  # clean in the same capture
        "s01_cosine_topk": 1.091,
    }
    clk = bench._clock_factor(95.2, REF)  # 1.0 — fast clock clamps
    flagged = [
        n
        for n, v in run1.items()
        if v > bench._QUERY_CONTAM_BAND * bench._QUIET_QUERY_REF_S[n] * clk
    ]
    assert len(flagged) >= 3
    assert "q01_pricing_summary" not in flagged


def test_query_refs_cover_headline_and_tracked_extras():
    """Every headline query has a quiet reference (the contamination
    self-report must cover the whole headline total), and every
    reference names a real registered query."""
    from liq_stream_spark.plans import REGISTRY

    for name in bench.HEADLINE:
        assert name in bench._QUIET_QUERY_REF_S, name
    for name in bench._QUIET_QUERY_REF_S:
        assert name in REGISTRY, name
