#!/bin/bash
cd /root/repo
exec 2>&1
wait_tunnel() {
  for i in $(seq 1 12); do
    if timeout 280 python tools/tpu_canary.py > /dev/null 2>&1; then
      echo "tunnel ok after $i canary attempt(s) $(date)"; return 0
    fi
    echo "canary attempt $i failed/hung, sleeping 300 s $(date)"
    sleep 300
  done
  echo "tunnel never recovered"; return 1
}
echo "=== final full bench $(date) ==="
wait_tunnel || exit 1
timeout 3600 python bench.py > /tmp/r4_bench_final2.json 2> /tmp/r4_bench_final2.log
echo "rc=$? : $(cat /tmp/r4_bench_final2.json 2>/dev/null)"
echo "=== done $(date) ==="
