#!/bin/bash
# Round-4 chip-measurement queue (PERF.md "Round 4: measurement queue").
# Runs every owed measurement sequentially — ONE TPU process at a time
# (CLAUDE.md rule), each under its own timeout so a hang can't eat the
# queue. Logs to r4_measurements/<step>.log; prints a one-line status per
# step and a final summary. Safe to re-run: steps that already produced a
# DONE marker are skipped.
set -u
cd /root/repo
OUT=r4_measurements
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

# 0. Golden E2E on chip (verify skill: expect "golden: MATCH")
run_step golden_mnist    1500 python -m onnx_rusty_inference_engine_tpu.cli run \
  --model /root/reference/models/mnist-8.onnx \
  --input /root/reference/mnist_data_0.pb \
  --golden /root/reference/mnist_output_0.pb
# 1. Headline (bench.py has its own supervisor/retries; give it headroom)
run_step headline        2400 python bench.py
# 2. INT4 weights / INT4 KV decode rows
run_step gpt2_decode     1800 python benchmarks/gpt2_decode.py
run_step llama_decode    1800 python benchmarks/llama_decode.py
# 3. Device-loop served throughput per family + levers
run_step serve_gpt2      1800 python benchmarks/serve_latency.py
run_step serve_llama     1800 python benchmarks/serve_latency.py --family llama
run_step serve_moe       1800 python benchmarks/serve_latency.py --family moe
run_step serve_lora      1800 python benchmarks/serve_latency.py --adapters 3
run_step serve_sampled   1800 python benchmarks/serve_latency.py --temperature 0.8
# 4. Beam: host loop vs device scan
run_step beam_decode     1800 python benchmarks/beam_decode.py
# 5. Prompt-lookup speculative serving (host rounds, then device rounds)
run_step spec_serving    1800 python benchmarks/spec_serving.py
run_step spec_multistep  1800 python benchmarks/spec_serving.py --multi-step 4
# 6. KV-length economics curve
run_step kv_len_probe    2400 python experiments/kv_len_probe.py

echo "=== queue complete $(date) ==="
ls "$OUT"/*.DONE 2>/dev/null | sed 's/.*\//  done: /; s/\.DONE//'
