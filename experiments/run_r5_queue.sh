#!/bin/bash
# Round-5 chip-measurement queue (VERDICT r4 asks #2, #3, #5).
# Same contract as run_r4_queue.sh: sequential, ONE TPU process at a
# time, per-step timeout, logs to r5_measurements/<step>.log, DONE
# markers make it resumable.
set -u
cd /root/repo
OUT=r5_measurements
mkdir -p "$OUT"

run_step() {
  local name="$1" tmo="$2"; shift 2
  local log="$OUT/$name.log" marker="$OUT/$name.DONE"
  if [ -f "$marker" ]; then echo "[skip] $name (already DONE)"; return 0; fi
  echo "[run ] $name: $* (timeout ${tmo}s) $(date +%H:%M:%S)"
  if timeout "$tmo" "$@" > "$log" 2>&1; then
    touch "$marker"; echo "[ OK ] $name $(date +%H:%M:%S)"
  else
    echo "[FAIL] $name rc=$? — see $log $(date +%H:%M:%S)"
  fi
}

# 1. Headline with the new MFU fields (ask #5)
run_step headline_mfu    2400 python bench.py
# 2. Per-op trace at b256 (+ aggregate), the bucket-attack evidence
run_step trace_b256      1800 python experiments/trace_probe.py 256
run_step parse_b256      900  python experiments/parse_trace.py
# 3. Batch amortization past b256 (b512/b1024)
run_step batch_probe     2400 python experiments/batch_probe.py 256 512 1024
# 4. ONE attack on the worst conv bucket: fire expand pair as one conv
run_step fire_fuse       2400 python experiments/fire_fuse_probe.py 256
# 5. Draft-MODEL speculative serving: host rounds vs device rounds
#    (ask #2's chip row; draft-same = acceptance~1 upper bound,
#     draft-2L = acceptance~0 lower bound)
run_step spec_same_host  2400 python benchmarks/spec_serving.py --draft-same
run_step spec_same_dev   2400 python benchmarks/spec_serving.py --draft-same --multi-step 4
run_step spec_2l_host    2400 python benchmarks/spec_serving.py --draft-layers 2
run_step spec_2l_dev     2400 python benchmarks/spec_serving.py --draft-layers 2 --multi-step 4
# 6. SERVED capacity models (ask #3): K sweep at production scale
run_step big_serve_xl    3600 python benchmarks/big_serve.py --model gpt2-xl --loops 0,8,24,96
run_step big_serve_7b    3600 python benchmarks/big_serve.py --model llama-7b --loops 0,8,24,96

echo "=== queue complete $(date) ==="
ls "$OUT"/*.DONE 2>/dev/null | sed 's/.*\//  done: /; s/\.DONE//'
