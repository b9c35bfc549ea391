#!/bin/bash
# Unattended device-session sequence for when the axon tunnel returns.
# Runs the round-4 tunnel-gated measurements ONE AT A TIME (never two
# probes on the chip concurrently — docs/performance.md) with generous
# timeouts for remote compiles (~1-25 min per new graph, cached after).
#
# Usage: bash tools/device_session.sh [outdir]   (default /tmp/devsess)
set -u
cd /root/repo
OUT=${1:-/tmp/devsess}
mkdir -p "$OUT"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)" \
    | tee -a "$OUT/session.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name exit=$? $(date -u +%H:%M:%S)" | tee -a "$OUT/session.log"
}

# 1. headline bench first: warms the compile cache the driver's
#    round-end run will hit, and captures a baseline JSON
run bench 7200 python bench.py

# 2. same-process variant A/B: s2d stem, approx top-k, both, resident1
run ab_variants 10800 python tools/ab_variants.py 3

# 3. int8 conv-chain probe (VERDICT item 4 diagnosis)
run int8_mxu 3600 python tools/probe_int8_mxu.py

# 4. product scale with the model in the loop (VERDICT item 1)
run product_512 7200 python tools/probe_product_scale.py 512 2400

# 5. per-primitive roofline table of the block dispatch (VERDICT weak #2)
run roofline 3600 python tools/probe_roofline.py

# 6. the 1k^3 point with the model in the loop (long; fine to lose to
#    a tunnel drop — everything above is already captured)
run product_1024 21600 python tools/probe_product_scale.py 1024 10000

echo "=== device session complete $(date -u +%H:%M:%S)" \
  | tee -a "$OUT/session.log"
