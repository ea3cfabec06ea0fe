"""The per-stage timing harness (reference DBGR_CHRONO study,
lib/dbugr.hpp:99-165 -> examples/lora-timings/timing-results.txt) must
run every stage and produce sane positive per-unit times."""

from lora_tpu.profiling import stage_timings, timing_table


def test_stage_timings_all_stages():
    t = stage_timings(sf=7, method="fft", batch_windows=64,
                      batch_symbols=16, batch_frames=4, iters=1)
    for stage in ("detect", "sync", "sfd", "demod", "decode"):
        assert t[stage] > 0.0
    assert t["samples_per_symbol"] == 1024


def test_timing_table_format():
    table = timing_table(sfs=(7,), methods=("fft",), iters=1)
    assert "| SF | method | stage |" in table
    assert "| 7 | fft | demod | symbol |" in table
