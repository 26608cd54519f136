#!/bin/bash
# Round-3 TPU session 2: canary-gated sequential benches.
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

run_step() {  # name cmd out log tmo
  echo "=== $1 $(date) ==="
  wait_tunnel || return 1
  timeout "$5" $2 > "$3" 2> "$4"
  echo "rc=$? $1: $(cat "$3" 2>/dev/null)"
  sleep 60
}

run_step "genbench warp64" "python tools/genbench.py 64" /tmp/gen64.json /tmp/gen64.log 2400
run_step "genbench ps"     "python tools/genbench.py ps" /tmp/genps.json /tmp/genps.log 2400
run_step "genbench warp256" "python tools/genbench.py 256" /tmp/gen256.json /tmp/gen256.log 2400
run_step "bench flagship"  "python bench.py" /tmp/bench_r3a.json /tmp/bench_r3a.log 3000
echo "=== session done $(date) ==="
