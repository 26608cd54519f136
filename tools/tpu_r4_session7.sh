#!/bin/bash
# Round-4 TPU session 7: final full bench (flagship + pilot + tracking).
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
run_step() {
  echo "=== $1 $(date) ==="
  wait_tunnel || return 1
  timeout "$5" $2 > "$3" 2> "$4"
  echo "rc=$? $1: $(cat "$3" 2>/dev/null)"
  sleep 60
}
run_step "full bench final" "python bench.py" /tmp/r4_bench_final.json /tmp/r4_bench_final.log 3600
run_step "genbench ps revalidate" "python tools/genbench.py ps" /tmp/r4_genps.json /tmp/r4_genps.log 2400
run_step "qam32 revalidate" "python tools/qam32_bench.py" /tmp/r4_qam32.json /tmp/r4_qam32.log 2400
echo "=== session done $(date) ==="
