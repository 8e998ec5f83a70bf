#!/bin/bash
# On-chip validation sequence for after a relay outage: run the tests whose
# semantics depend on real-hardware FMA/Mosaic behavior, then refresh the
# bench. Run from the repo root with the relay up. Usage:
#   bash perf/onchip_validate.sh [quick|full]
set -u
cd "$(dirname "$0")/.."
MODE="${1:-quick}"

echo "== 1. packet-vs-brute borderline certification (hardware FMA) =="
timeout 3600 python -m pytest tests/test_pallas_trace.py::test_packet_matches_brute -x -q || exit 1

echo "== 2. kernel variants vs oracle =="
timeout 3600 python -m pytest tests/test_pallas_trace.py::test_packet_kernel_variants_match_brute -q || exit 1

echo "== 3. partitioned-instanced suite on chip =="
timeout 3600 python -m pytest tests/test_tlas.py -q || exit 1

echo "== 3b. goldens + furnaces on chip (CPU-blessed; if RMSE is marginal =="
echo "==     on hardware, re-bless with perf/bless_goldens.py ON-CHIP)    =="
timeout 3600 python -m pytest tests/test_golden.py tests/test_bsdf.py -q || exit 1

if [ "$MODE" = "full" ]; then
  echo "== 4. full suite =="
  timeout 7200 python -m pytest tests/ -q || exit 1
fi

echo "== 3c. streamed leaf blocks on chip (DMA kernel + A/B) =="
timeout 3600 python -m pytest tests/test_stream.py -q || exit 1
timeout 3600 python perf/bench_stream.py quick || exit 1

echo "== 3d. MT-precision speed/RMSE A/B =="
timeout 3600 python perf/bench_precision.py quick || exit 1

echo "== 4b. mixture-pdf e2e cost A/B (COVERAGE round-4 queue item) =="
timeout 3600 python perf/bench_mixture.py || exit 1

echo "== 4c. measured compaction schedules (autoplan) =="
timeout 3600 python -m pytest tests/test_autoplan.py -q || exit 1

echo "== 5. bench refresh =="
timeout 5400 python bench.py || exit 1
echo "ALL ON-CHIP VALIDATION GREEN"
