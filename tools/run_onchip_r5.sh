#!/bin/bash
# Round-5 serialized on-chip measurement queue (VERDICT r4 item 1).
# ONE TPU client at a time (CLAUDE.md): every item runs to completion
# before the next starts; each gets its own log under $OUT.
# Priority order: items at the top are the ones the round cannot ship
# without, so an early backend outage still captures them.
set -u
cd /root/repo
# keep the axon plugin registered AND the repo importable for tools/
export PYTHONPATH=/root/.axon_site:/root/repo
OUT=${OUT:-/tmp/onchip_r5}
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  if [ -e "$OUT/$name.ok" ]; then echo "== $name: cached, skip"; return; fi
  echo "== $name: start $(date +%T)"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "== $name: rc=$rc $(date +%T)"
  [ $rc -eq 0 ] && touch "$OUT/$name.ok"
  echo "$rc" > "$OUT/$name.rc"
}

# (a) headline re-capture
run reconet-512        2400 python bench.py --path reconet-512 --no-retry
# (c) fused res-block kernel A/B: e2e gate + isolated stack
run reconet-512-fusedres 2400 python bench.py --path reconet-512-fusedres --no-retry
run res-block-iso      2400 python tools/bench_res_block.py
# (b) post-packed-warp ReCoNet train step, two rounds stale
run reconet-train-bf16 3000 python bench.py --path reconet-train-bf16 --no-retry
run reconet-train-f32  3000 python bench.py --path reconet-train-f32 --no-retry
# (d) softmax 512²: exp2 + block sweep, then e2e with the routed default
run softmax-sweep      3600 python tools/bench_adaattn_softmax.py --levels relu3_1 relu4_1 relu5_1
run softmax-sweep-exp2 3600 python tools/bench_adaattn_softmax.py --exp2 --levels relu3_1 relu4_1 relu5_1
run adaattn-softmax-512 2400 python bench.py --path adaattn-softmax-512 --no-retry
# (e) I420 streaming e2e + the renamed link ceiling
run tunnel-link        1200 python bench.py --path tunnel-link --no-retry
run pipeline-stream    2400 python bench.py --path pipeline-stream --no-retry
run pipeline-stream-240 2400 python bench.py --path pipeline-stream-240 --no-retry
# (f) remat HBM deltas
run remat              2400 python tools/measure_remat.py
# batch-scaling A/B shipped round 5 without numbers
run reconet-512-b16    1800 python bench.py --path reconet-512-b16 --no-retry
run reconet-512-b32    1800 python bench.py --path reconet-512-b32 --no-retry
# regression sentinels for the rest of the serving table
run sd1-512            1800 python bench.py --path sd1-512 --no-retry
run sd2-512            1800 python bench.py --path sd2-512 --no-retry
run adaattn-video-512-cached 2400 python bench.py --path adaattn-video-512-cached --no-retry

echo "== queue drained $(date +%T)"
