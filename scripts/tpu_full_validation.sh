#!/bin/bash
# One-shot post-recovery TPU validation: run everything that needs the real
# chip, raw output to logs (grep-in-pipe after a timeout-kill loses output).
# Usage: bash scripts/tpu_full_validation.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_validation}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* (log: $OUT/$name.log)"
  timeout 570 "$@" > "$OUT/$name.log" 2>&1
  echo "    exit=$? $(tail -1 "$OUT/$name.log" | head -c 200)"
}

run selftest     python scripts/tpu_selftest.py --quick
run families     python scripts/tpu_families_smoke.py
run bench_b8     python bench.py --batch 8
run bench_b1     python bench.py --batch 1
run bench_b32    python bench.py --batch 32 --max-seq 512
run bench_ctx1k  python bench.py --batch 8 --context 1024 --max-seq 2048
run bench_ctx2k  python bench.py --batch 8 --context 2048 --max-seq 4096
run prefill_4k   python bench.py --prefill 4096 --runtime-cache int8
run prefill_int4 python bench.py --prefill 4096
run speculative  python scripts/verify_speculative.py
run scaling      python scripts/scaling_probe.py --mode tpu

echo "=== summary"
for f in "$OUT"/*.log; do
  echo "--- $f"; grep -E '"metric"|passed|FAIL|ok=|tok/s' "$f" | tail -3
done
