#!/bin/bash
# Regenerate every committed accuracy report (docs/test-results/*.md).
#
# Suites are hermetic (tx modulator, fixed seeds) so regeneration is
# deterministic up to the report timestamp. Run from the repo root:
#   bash tools/regen_reports.sh [suites_dir]
# Engines: golden (numpy host), dense + parity (jitted; run on whatever
# device JAX provides — the real TPU in CI). The full matrix is
# 13 suites x 3 engines; the index (README.md) records the backend.
set -u
SUITES=${1:-/tmp/r4suites}
mkdir -p "$SUITES"
G() { python -m lora_tpu.cli gen-suite "$SUITES" "$@"; }
R() { python -m lora_tpu.cli testsuite "$SUITES" "$@" --reports docs/test-results; }

ALL="short_sim decode_long_sim short_sim_cfo500 short_sim_conj \
short_sim_drift short_sim_drift10 short_sim_implicit short_sim_sf13 \
short_sim_sf6_implicit short_sim_snr10 short_sim_sync12 short_sim_sdr \
short_sim_alt"

# ---- generation (skip suites that already exist in $SUITES) ----
gen() { # gen <suite> [args...]
  local s=$1; shift
  [ -d "$SUITES/$s" ] || G --suite "$s" "$@"
}
gen short_sim
gen decode_long_sim --suite decode_long_sim
gen short_sim_cfo500 --cfo 500
gen short_sim_conj
gen short_sim_drift
gen short_sim_drift10 --drift-ppm 10
gen short_sim_implicit
gen short_sim_sf13 --sfs 13
gen short_sim_sf6_implicit --sfs 6
gen short_sim_snr10 --snr 10
gen short_sim_sync12
gen short_sim_sdr
gen short_sim_alt

# ---- full matrix: every suite through every engine ----
R $ALL --engine golden
R $ALL --engine dense
R $ALL --engine parity

# ---- regenerate the index with the backend stamp ----
python tools/gen_report_index.py

echo "=== regen complete ==="
grep -H "Total payloads passed" docs/test-results/*.md | sed 's/docs\/test-results\///'
