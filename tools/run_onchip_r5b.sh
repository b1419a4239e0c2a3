#!/bin/bash
# Round-5 tail measurements: items the first queue missed (script was
# edited while bash was executing it — lazy re-read skipped lines) plus
# the e2e re-measure after the softmax block re-route.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
OUT=/tmp/onchip_r5b
mkdir -p "$OUT"

run() {
  local name=$1 to=$2; shift 2
  if [ -e "$OUT/$name.ok" ]; then echo "== $name: cached, skip"; return; fi
  echo "== $name: start $(date +%T)"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "== $name: rc=$rc $(date +%T)"
  [ $rc -eq 0 ] && touch "$OUT/$name.ok"
}

run adaattn-softmax-512-routed 2400 python bench.py --path adaattn-softmax-512 --no-retry
run pipeline-stream-240 2400 python bench.py --path pipeline-stream-240 --no-retry
run remat 2400 python tools/measure_remat.py
run res-block-iso 2400 python tools/bench_res_block.py
echo "== tail drained $(date +%T)"
